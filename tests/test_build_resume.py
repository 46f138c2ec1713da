"""Checkpoint/resume semantics (north rule): a killed build resumes without
re-tokenizing completed buckets; attempt counters track re-runs; re-built
output is identical."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest


def _manifests(index_dir):
    mdir = os.path.join(index_dir, "manifest")
    return {
        json.load(open(os.path.join(mdir, f)))["bucket"]: json.load(open(os.path.join(mdir, f)))
        for f in sorted(os.listdir(mdir)) if f.endswith(".json")
    }


def _postings_fingerprint(index_dir):
    out = {}
    pdir = os.path.join(index_dir, "postings")
    for f in sorted(os.listdir(pdir)):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(pdir, f))
            out[f] = (t.num_rows, t.column("term").to_pylist()[:5],
                      t.column("doc_ids").to_pylist()[:3])
    return out


@pytest.fixture()
def built(ray_session, tiny_corpus, tmp_path):
    import ray.data as rd

    from prosearch_ray.index.build import build_index

    index_dir = str(tmp_path / "idx")
    report = build_index(rd.from_arrow(tiny_corpus), index_dir, docs_per_bucket=64)
    return index_dir, report


def test_full_resume_skips_everything(built, tiny_corpus):
    import ray.data as rd

    from prosearch_ray.index.build import build_index

    index_dir, report1 = built
    report2 = build_index(rd.from_arrow(tiny_corpus), index_dir, docs_per_bucket=64)
    assert report2["built_buckets"] == 0
    assert report2["skipped_buckets"] == report1["built_buckets"]
    assert not report2["staged_fresh"]
    assert all(m["attempt"] == 1 for m in _manifests(index_dir).values())


def test_partial_resume_rebuilds_only_missing(built, tiny_corpus):
    import ray.data as rd

    from prosearch_ray.index.build import build_index

    index_dir, _ = built
    before = _postings_fingerprint(index_dir)
    manifests_before = _manifests(index_dir)

    # simulate a kill after some buckets: destroy one bucket's outputs
    victim = sorted(manifests_before)[0]
    name = f"bucket={victim:08d}"
    os.remove(os.path.join(index_dir, "segments", name + ".parquet"))
    os.remove(os.path.join(index_dir, "manifest", name + ".json"))

    report = build_index(rd.from_arrow(tiny_corpus), index_dir, docs_per_bucket=64)
    assert report["built_buckets"] == 1
    assert report["skipped_buckets"] == len(manifests_before) - 1

    after = _postings_fingerprint(index_dir)
    assert before == after  # rebuilt bucket byte-equivalent, others untouched
    # untouched buckets keep attempt==1 (never re-tokenized)
    for b, m in _manifests(index_dir).items():
        assert m["attempt"] == 1


def test_stale_manifest_bumps_attempt(built, tiny_corpus):
    import ray.data as rd

    from prosearch_ray.index.build import build_index

    index_dir, _ = built
    victim = sorted(_manifests(index_dir))[0]
    mpath = os.path.join(index_dir, "manifest", f"bucket={victim:08d}.json")
    m = json.load(open(mpath))
    m["fingerprint"] = "stale"
    json.dump(m, open(mpath, "w"))

    report = build_index(rd.from_arrow(tiny_corpus), index_dir, docs_per_bucket=64)
    assert report["built_buckets"] == 1
    assert _manifests(index_dir)[victim]["attempt"] == m["attempt"] + 1


def test_fresh_rebuild_is_deterministic(built, tiny_corpus, tmp_path):
    import ray.data as rd

    from prosearch_ray.index.build import build_index

    index_dir, _ = built
    other = str(tmp_path / "idx2")
    build_index(rd.from_arrow(tiny_corpus), other, docs_per_bucket=64)
    assert _postings_fingerprint(index_dir) == _postings_fingerprint(other)
    s1 = json.load(open(os.path.join(index_dir, "stats.json")))
    s2 = json.load(open(os.path.join(other, "stats.json")))
    assert s1 == s2


def test_positions_merge_resumes_independently(built, tiny_corpus):
    """A kill between the scoring merge and the positions merge leaves
    _merge.json without pos_fp — resume must re-run ONLY the positions
    exchange (no bucket rebuilds, no scoring re-merge) and reproduce the
    positions parts byte-identically."""
    import json

    import ray.data as rd

    from prosearch_ray.index.build import build_index

    index_dir, _ = built
    pos_dir = os.path.join(index_dir, "positions")
    before = {f: open(os.path.join(pos_dir, f), "rb").read()
              for f in sorted(os.listdir(pos_dir)) if f.endswith(".parquet")}
    assert before, "build must produce positions parts"

    # emulate the kill: positions state gone, scoring state intact
    mp = os.path.join(index_dir, "_merge.json")
    ms = json.load(open(mp))
    ms.pop("pos_fp")
    with open(mp, "w") as f:
        json.dump(ms, f)
    for f in before:
        os.remove(os.path.join(pos_dir, f))

    report = build_index(rd.from_arrow(tiny_corpus), index_dir,
                         docs_per_bucket=64)
    assert report["built_buckets"] == 0          # no segment rebuilds
    assert not report["merged"]                  # no scoring re-merge
    assert report["phases"]["merge_positions"] > 0
    after = {f: open(os.path.join(pos_dir, f), "rb").read()
             for f in sorted(os.listdir(pos_dir)) if f.endswith(".parquet")}
    assert after == before
    assert json.load(open(mp)).get("pos_fp") == ms["fingerprint"]
