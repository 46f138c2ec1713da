"""Scale probe for the event-stream window operators (moving_window_sum,
hopping_window_stats, funnel/sessionization shapes): generate a
deterministic events table N× the sf0.1 size in chunked parquet files,
run the operators at two sizes, and report per-row throughput linearity.

Usage:
    python tools/events_scale_probe.py [n_rows] [n_rows_2] [out_root]

Defaults: 12.5M and 50M rows (4× apart) under /tmp/events_scale.
The schema matches the driver testdata events table exactly
(event_id int64, ts timestamp[us], user_id int64, event_type string,
value double 2-decimal, props string).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EVENT_TYPES = np.array(
    ["view", "click", "cart", "purchase", "search", "login", "logout",
     "scroll", "hover", "share"], dtype=object)
CHUNK = 2_000_000


def generate(out_dir: str, n_rows: int, n_users: int) -> None:
    """Deterministic chunked generation — each chunk seeds its own RNG so
    any prefix of chunks is reproducible without holding the table."""
    os.makedirs(out_dir, exist_ok=True)
    base_us = np.int64(1_700_000_000_000_000)  # fixed epoch start
    for ci, start in enumerate(range(0, n_rows, CHUNK)):
        path = os.path.join(out_dir, f"part-{ci:05d}.parquet")
        if os.path.exists(path):
            continue
        n = min(CHUNK, n_rows - start)
        rng = np.random.default_rng(1234 + ci)
        eid = np.arange(start, start + n, dtype=np.int64)
        ts = base_us + eid * np.int64(1_000) + rng.integers(
            0, 1_000, n, dtype=np.int64)
        tbl = pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, n,
                                             dtype=np.int64), pa.int64()),
            "event_type": pa.array(
                EVENT_TYPES[rng.integers(0, len(EVENT_TYPES), n)],
                pa.string()),
            "value": pa.array(
                rng.integers(0, 10_000, n).astype(np.float64) / 100.0,
                pa.float64()),
            "props": pa.array(np.full(n, "{}", dtype=object), pa.string()),
        })
        pq.write_table(tbl, path, row_group_size=262_144)


def run_ops(sf_dir: str) -> dict:
    from prosearch_ray.pipelines.relational import (hopping_window_stats,
                                                    moving_window_sum)
    out = {}
    t0 = time.monotonic()
    n = moving_window_sum(sf_dir).count()
    out["moving_window_sum_sec"] = round(time.monotonic() - t0, 2)
    out["moving_window_sum_rows"] = n
    t0 = time.monotonic()
    m = hopping_window_stats(sf_dir).count()
    out["hopping_window_stats_sec"] = round(time.monotonic() - t0, 2)
    out["hopping_window_stats_rows"] = m
    return out


def main() -> None:
    import ray

    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 12_500_000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
    root = sys.argv[3] if len(sys.argv) > 3 else "/tmp/events_scale"

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    results = {}
    for n in (n1, n2):
        d = os.path.join(root, f"n{n}")
        # the operators read "<sf_dir>/events.parquet"; point a dir at it
        ev_dir = os.path.join(d, "events.parquet")
        t0 = time.monotonic()
        generate(ev_dir, n, n_users=max(1000, n // 100))
        gen_s = round(time.monotonic() - t0, 2)
        r = run_ops(d)
        r["gen_sec"] = gen_s
        r["n_rows"] = n
        results[f"n{n}"] = r
        print(json.dumps(r), flush=True)

    r1, r2 = results[f"n{n1}"], results[f"n{n2}"]
    for op in ("moving_window_sum", "hopping_window_stats"):
        ratio = (r2[f"{op}_sec"] / r1[f"{op}_sec"]) / (n2 / n1)
        print(f"{op}: {n1}->{n2} rows, time x{r2[f'{op}_sec']/r1[f'{op}_sec']:.2f} "
              f"(per-row ratio {ratio:.2f}; <=1.0 is linear-or-better)")
    ray.shutdown()


if __name__ == "__main__":
    main()
