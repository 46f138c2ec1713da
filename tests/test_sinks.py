"""Resumable partitioned sink: commit markers, skip-finished pruning,
stale-output sweeping."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(autouse=True)
def _ray(ray_session):
    return ray_session


def _input():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "shard": ["a"] * 4 + ["b"] * 4 + ["c"] * 4,
        "x": list(range(12)),
    }))


def _read_all(out):
    import pyarrow.dataset as pads

    return pads.dataset(out, format="parquet",
                        partitioning="hive").to_table()


def test_write_then_resume_skips_committed(tmp_path):
    from prosearch_ray.sinks import write_partitioned

    out = str(tmp_path / "out")
    calls = []

    def transform(ds):
        def bump(t: pa.Table) -> pa.Table:
            calls.append(sorted(set(t.column("shard").to_pylist())))
            return t.append_column(
                "y", pa.array([v * 2 for v in t.column("x").to_pylist()],
                              pa.int64()))
        return ds.map_batches(bump, batch_format="pyarrow")

    rep = write_partitioned(_input(), out, "shard", transform)
    assert sorted(rep["written"]) == ["a", "b", "c"] and rep["skipped"] == []
    t = _read_all(out)
    assert t.num_rows == 12
    assert sorted(os.listdir(out)) == ["shard=a", "shard=b", "shard=c"]
    for d in os.listdir(out):
        assert os.path.exists(os.path.join(out, d, "_SUCCESS"))

    # full rerun: everything committed -> nothing recomputed, no rows move
    rep2 = write_partitioned(_input(), out, "shard", transform)
    assert rep2["written"] == [] and sorted(rep2["skipped"]) == ["a", "b", "c"]
    assert _read_all(out).num_rows == 12


def test_dead_run_partition_is_recomputed(tmp_path):
    from prosearch_ray.sinks import write_partitioned

    out = str(tmp_path / "out")
    write_partitioned(_input(), out, "shard")
    # simulate a dead run on shard=b: marker gone, half-written garbage left
    bdir = os.path.join(out, "shard=b")
    os.remove(os.path.join(bdir, "_SUCCESS"))
    with open(os.path.join(bdir, "garbage.parquet"), "w") as f:
        f.write("not parquet")

    rep = write_partitioned(_input(), out, "shard")
    assert rep["written"] == ["b"] and sorted(rep["skipped"]) == ["a", "c"]
    assert not os.path.exists(os.path.join(bdir, "garbage.parquet"))
    t = _read_all(out)
    assert t.num_rows == 12
    b = t.filter(pa.compute.equal(t.column("shard"), "b"))
    assert sorted(b.column("x").to_pylist()) == [4, 5, 6, 7]
