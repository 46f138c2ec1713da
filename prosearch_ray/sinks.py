"""Resumable partitioned Parquet sink.

A 100 TB pipeline run dies sometimes; its output must be written so a rerun
skips finished work instead of recomputing everything.  The index build
already does this per bucket (temp+rename + per-bucket manifests,
index/build.py); this is the same contract for generic pipeline results:

- output is hive-partitioned by a key column (``part=<value>/``), one
  directory per partition — never one giant file;
- a partition directory is COMMITTED by a ``_SUCCESS`` marker written only
  after the whole write finished;
- a rerun prunes committed partitions AT THE READ (a filter on the
  partition column before any downstream work), recomputes only the missing
  ones, and sweeps stale uncommitted files first so half-written output
  never mixes with the rerun's.

The partition column must be derivable from the input row (e.g. a key
range, an input shard id, a date) so pruning can happen before the
transform instead of after it.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional
from urllib.parse import unquote

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

SUCCESS = "_SUCCESS"


def committed_partitions(out_dir: str, partition_col: str) -> List[str]:
    """Partition values (as strings) whose directories carry a _SUCCESS
    marker."""
    done = []
    prefix = f"{partition_col}="
    if not os.path.isdir(out_dir):
        return done
    for name in sorted(os.listdir(out_dir)):
        if name.startswith(prefix) and os.path.exists(
                os.path.join(out_dir, name, SUCCESS)):
            # hive dir names percent-encode special chars — decode so the
            # resume prune compares against the RAW column values
            done.append(unquote(name[len(prefix):]))
    return done


def write_partitioned(ds: "rd.Dataset", out_dir: str, partition_col: str,
                      transform: Optional[Callable[["rd.Dataset"],
                                                   "rd.Dataset"]] = None
                      ) -> dict:
    """Write ``transform(ds)`` (or ``ds``) hive-partitioned by
    ``partition_col`` with per-partition commit markers; reruns skip
    committed partitions BEFORE the transform runs.

    Single streaming pass: prune committed partitions, sweep uncommitted
    leftovers of a dead run, write, then commit exactly the partition
    directories this run produced (the ones without a marker).

    Returns ``{"written": [values...], "skipped": [values...]}``.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = committed_partitions(out_dir, partition_col)
    prefix = f"{partition_col}="

    if done:
        done_set = pa.array(sorted(set(done)))

        def prune(t: pa.Table) -> pa.Table:
            vals = pc.cast(t.column(partition_col), pa.string())
            return t.filter(pc.invert(pc.is_in(vals, value_set=done_set)))

        ds = ds.map_batches(prune, batch_format="pyarrow")

    # sweep uncommitted leftovers from a dead run — the rerun re-derives
    # those partitions from scratch
    for name in os.listdir(out_dir):
        d = os.path.join(out_dir, name)
        if (name.startswith(prefix) and os.path.isdir(d)
                and not os.path.exists(os.path.join(d, SUCCESS))):
            for f in os.listdir(d):
                os.remove(os.path.join(d, f))
            os.rmdir(d)

    if transform is not None:
        ds = transform(ds)

    ds.write_parquet(out_dir, partition_cols=[partition_col])

    # every partition dir without a marker was produced by THIS run (stale
    # ones were swept above) — commit them now that the write finished
    written = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if (name.startswith(prefix) and os.path.isdir(d)
                and not os.path.exists(os.path.join(d, SUCCESS))):
            with open(os.path.join(d, SUCCESS), "w") as f:
                f.write("ok")
            written.append(unquote(name[len(prefix):]))
    return {"written": written, "skipped": sorted(set(done))}
