"""Stage-A spill-file exchange: parquet-path sources run a deterministic,
resumable map/reduce over spill files instead of Ray's in-memory shuffle.
Pins (a) byte-equivalence with the groupby path and (b) mid-stage-A resume
skipping finished map items."""

import json
import os

import pyarrow.parquet as pq


def _postings_bytes(index_dir):
    out = {}
    for sub in ("postings", "positions", "dict", "staged"):
        d = os.path.join(index_dir, sub)
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                out[f"{sub}/{f}"] = open(os.path.join(d, f), "rb").read()
    return out


def test_spill_path_matches_groupby_path(ray_session, tmp_path):
    import ray.data as rd

    from prosearch_ray.fixtures.gen import generate_corpus
    from prosearch_ray.index.build import build_index

    corpus = generate_corpus(300)
    src = str(tmp_path / "src")
    os.makedirs(src)
    # several files + small row groups so the plan has multiple items
    per = -(-corpus.num_rows // 3)
    for i in range(3):
        pq.write_table(corpus.slice(i * per, per),
                       os.path.join(src, f"part{i}.parquet"), row_group_size=40)

    idx_a = str(tmp_path / "idx_path")
    idx_b = str(tmp_path / "idx_ds")
    rep_a = build_index(src, idx_a, docs_per_bucket=64)
    rep_b = build_index(rd.from_arrow(corpus), idx_b, docs_per_bucket=64,
                        n_input_estimate=corpus.num_rows)
    assert rep_a["n_docs"] == rep_b["n_docs"]
    assert _postings_bytes(idx_a) == _postings_bytes(idx_b)
    # spill dir cleaned up once offsets are durable
    assert not os.path.exists(os.path.join(idx_a, "spill"))


def test_spill_resume_skips_finished_items(ray_session, tmp_path):
    import ray.data

    from prosearch_ray.fixtures.gen import generate_corpus
    from prosearch_ray.index.build import (_plan_spill_items, _spill_map_fn,
                                           _stage_a_spill_exchange,
                                           build_index, DEFAULT_LANGS)
    from prosearch_ray.index import docid

    corpus = generate_corpus(300)
    src = str(tmp_path / "src")
    os.makedirs(src)
    per = -(-corpus.num_rows // 3)
    for i in range(3):
        pq.write_table(corpus.slice(i * per, per),
                       os.path.join(src, f"part{i}.parquet"), row_group_size=40)

    idx = str(tmp_path / "idx")
    os.makedirs(os.path.join(idx, "staged"))
    # must match what build_index derives (n_est = real row count of src)
    num_buckets = docid.num_buckets_for(corpus.num_rows, 64)

    # simulate a build killed mid-stage-A: run the map phase for HALF the
    # planned items (config written by a first exchange attempt), then kill
    ncpu = 4
    items = _plan_spill_items(src, target_items=4 * ncpu)
    assert len(items) >= 4
    spill_dir = os.path.join(idx, "spill")
    os.makedirs(os.path.join(spill_dir, "_done"))
    n_groups = int(max(1, min(num_buckets, 4 * ncpu)))
    from prosearch_ray.index.build import _spill_fingerprint, _atomic_write_json
    _atomic_write_json({"num_buckets": num_buckets, "n_groups": n_groups,
                        "langs": sorted(DEFAULT_LANGS),
                        "plan": [_spill_fingerprint(it) for it in items]},
                       os.path.join(spill_dir, "_config.json"))
    map_fn = _spill_map_fn(spill_dir, DEFAULT_LANGS, num_buckets, n_groups)
    done = [map_fn(it) for it in items[: len(items) // 2]]
    assert all(not d["skipped"] for d in done)
    markers = {d["item"]: os.path.getmtime(os.path.join(
        spill_dir, "_done", f"item={d['item']:06d}.json")) for d in done}

    # resume: the full build must reuse the finished items' spill untouched
    rep = build_index(src, idx, docs_per_bucket=64)
    assert rep["n_docs"] > 0
    # markers of pre-completed items were honored, not rewritten
    # (spill dir is removed after offsets: check against a fresh reference
    # build for output equality instead)
    ref = str(tmp_path / "ref")
    rep2 = build_index(src, ref, docs_per_bucket=64)
    assert rep["n_docs"] == rep2["n_docs"]
    assert _postings_bytes(idx) == _postings_bytes(ref)


def test_spill_map_item_skip_marker(ray_session, tmp_path):
    """A completed item's marker short-circuits its rerun."""
    from prosearch_ray.fixtures.gen import generate_corpus
    from prosearch_ray.index.build import (_plan_spill_items, _spill_map_fn,
                                           DEFAULT_LANGS)
    from prosearch_ray.index import docid

    corpus = generate_corpus(100)
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(corpus, os.path.join(src, "part0.parquet"),
                   row_group_size=25)
    spill_dir = str(tmp_path / "spill")
    os.makedirs(os.path.join(spill_dir, "_done"))
    items = _plan_spill_items(src, target_items=4)
    fn = _spill_map_fn(spill_dir, DEFAULT_LANGS, 8, 4)
    assert fn(items[0])["skipped"] is False
    assert fn(items[0])["skipped"] is True
