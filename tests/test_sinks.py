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


def test_atomic_write_table_codec_knob(tmp_path, monkeypatch):
    """Archive-target writer knob (GRAFT_PARQUET_COMPRESSION /
    GRAFT_ROW_GROUP_SIZE): the codec changes the file bytes, never the
    logical content — any reader sees identical rows."""
    from prosearch_ray.index import build

    t = pa.table({"term": [f"t{i:04d}" for i in range(5000)],
                  "df": pa.array(range(5000), pa.int64())})
    p_snappy = str(tmp_path / "snappy.parquet")
    p_zstd = str(tmp_path / "zstd.parquet")
    build._atomic_write_table(t, p_snappy)
    monkeypatch.setattr(build, "_PQ_COMPRESSION", "zstd")
    monkeypatch.setattr(build, "_PQ_ROW_GROUP", 2048)
    build._atomic_write_table(t, p_zstd)

    meta = pq.ParquetFile(p_zstd).metadata
    assert meta.row_group(0).column(0).compression == "ZSTD"
    assert meta.row_group(0).num_rows == 2048
    assert pq.ParquetFile(p_snappy).metadata.row_group(0).column(
        0).compression == "SNAPPY"
    # logical equality — the decision is bytes-vs-CPU only
    assert pq.read_table(p_zstd).equals(pq.read_table(p_snappy))
    # zstd is the archive-target recommendation because it writes less
    assert os.path.getsize(p_zstd) < os.path.getsize(p_snappy)
