"""Deletes + delta builds (delete-then-reinsert upsert semantics,
TantivyCommitter.java:48-82) and compaction."""

import pyarrow as pa
import pytest


@pytest.fixture()
def small_index(ray_session, tmp_path):
    import ray.data as rd

    from prosearch_ray.fixtures.gen import generate_corpus
    from prosearch_ray.index.build import build_index

    corpus = generate_corpus(200)
    index_dir = str(tmp_path / "idx")
    report = build_index(rd.from_arrow(corpus), index_dir, docs_per_bucket=64)
    return index_dir, report, corpus


def _hit_keys(index_dir, query, k=1000):
    from prosearch_ray.query.searcher import IndexSearcher

    s = IndexSearcher(index_dir)
    ids, _ = s.search(query, k)
    return [str(s.doc_keys[int(d)]) for d in ids]


def test_delete_removes_from_results(small_index):
    from prosearch_ray.index.delta import delete_docs, load_tombstones

    index_dir, _, _ = small_index
    before = _hit_keys(index_dir, "the")
    assert before
    victim = before[0]
    assert delete_docs(index_dir, [victim]) == 1
    after = _hit_keys(index_dir, "the")
    assert victim not in after
    assert set(after) <= set(before)
    # idempotent
    assert delete_docs(index_dir, [victim]) == 1
    assert load_tombstones(index_dir).num_rows == 1


def test_add_documents_upserts(small_index):
    import numpy as np

    from prosearch_ray.index.delta import add_documents
    from prosearch_ray.query.searcher import IndexSearcher

    index_dir, report, _ = small_index
    delta = pa.table({
        "repo": ["deltaorg/deltarepo"] * 2,
        "path": ["src/new_doc.py", "src/other_doc.py"],
        "commit": ["f" * 40] * 2,
        "lang": ["py", "py"],
        "content": ["zzbrandnew token stream merge", "zzbrandnew other content"],
    })
    res = add_documents(index_dir, __import__("ray").data.from_arrow(delta))
    assert res["added"] == 2

    s = IndexSearcher(index_dir)
    assert s.n_docs == report["n_docs"] + 2
    ids, scores = s.search("zzbrandnew", 10)
    keys = {str(s.doc_keys[int(d)]) for d in ids}
    assert keys == {"deltaorg/deltarepo/src/new_doc.py",
                    "deltaorg/deltarepo/src/other_doc.py"}

    # re-add one doc with new content: old version must stop matching
    delta2 = pa.table({
        "repo": ["deltaorg/deltarepo"],
        "path": ["src/new_doc.py"],
        "commit": ["f" * 40],
        "lang": ["py"],
        "content": ["replacement body qqreplaced"],
    })
    add_documents(index_dir, __import__("ray").data.from_arrow(delta2))
    s2 = IndexSearcher(index_dir)
    ids2, _ = s2.search("zzbrandnew", 10)
    keys2 = {str(s2.doc_keys[int(d)]) for d in ids2}
    assert keys2 == {"deltaorg/deltarepo/src/other_doc.py"}
    ids3, _ = s2.search("qqreplaced", 10)
    assert {str(s2.doc_keys[int(d)]) for d in ids3} == {
        "deltaorg/deltarepo/src/new_doc.py"}


def test_compact_after_upsert_keeps_new_version(small_index, tmp_path):
    """Regression: compact() must filter by tombstoned doc_id, not doc_key —
    an upserted doc tombstones its OLD doc_id while the key stays live, so a
    key-based filter silently drops BOTH versions."""
    import ray.data as rd

    from prosearch_ray.index.delta import add_documents, compact, delete_docs
    from prosearch_ray.query.searcher import IndexSearcher

    index_dir, report, _ = small_index
    delta = pa.table({
        "repo": ["deltaorg/deltarepo"] * 2,
        "path": ["src/kept.py", "src/doomed.py"],
        "commit": ["f" * 40] * 2,
        "lang": ["py", "py"],
        "content": ["first version aafirst", "doomed doc aadoomed"],
    })
    add_documents(index_dir, rd.from_arrow(delta))
    # upsert kept.py (tombstones its old doc_id, key stays live)
    delta2 = pa.table({
        "repo": ["deltaorg/deltarepo"],
        "path": ["src/kept.py"],
        "commit": ["f" * 40],
        "lang": ["py"],
        "content": ["second version aasecond"],
    })
    add_documents(index_dir, rd.from_arrow(delta2))
    # and a pure delete of the other delta doc
    delete_docs(index_dir, ["deltaorg/deltarepo/src/doomed.py"])

    out = str(tmp_path / "compacted_upsert")
    rep = compact(index_dir, out)
    # base docs + kept.py (one live version); doomed.py gone
    assert rep["n_docs"] == report["n_docs"] + 1
    s = IndexSearcher(out)
    ids, _ = s.search("aasecond", 10)
    assert {str(s.doc_keys[int(d)]) for d in ids} == {
        "deltaorg/deltarepo/src/kept.py"}
    for dead in ("aafirst", "aadoomed"):
        ids, _ = s.search(dead, 10)
        assert len(ids) == 0


def test_build_resume_after_delta_counts(small_index):
    """Regression: add_documents must record real delta counts in
    _offsets.json so a later build_index(resume=True) reproduces every
    base_doc_id and the true n_docs (was: counts 0 → corrupt avgdl/norms)."""
    import json
    import os

    import ray.data as rd

    from prosearch_ray.index.build import build_index
    from prosearch_ray.index.delta import add_documents
    from prosearch_ray.query.searcher import IndexSearcher

    index_dir, report, corpus = small_index
    delta = pa.table({
        "repo": ["deltaorg/deltarepo"],
        "path": ["src/resumed.py"],
        "commit": ["f" * 40],
        "lang": ["py"],
        "content": ["resume survives deltas qqresumed"],
    })
    add_documents(index_dir, rd.from_arrow(delta))
    off = json.load(open(os.path.join(index_dir, "staged", "_offsets.json")))
    assert sum(off["counts"].values()) == report["n_docs"] + 1

    # same n_input_estimate as the original build so num_buckets matches
    rep2 = build_index(None, index_dir, docs_per_bucket=64, resume=True,
                       n_input_estimate=corpus.num_rows)
    assert rep2["n_docs"] == report["n_docs"] + 1
    s = IndexSearcher(index_dir)
    assert s.n_docs == report["n_docs"] + 1
    ids, _ = s.search("qqresumed", 10)
    assert {str(s.doc_keys[int(d)]) for d in ids} == {
        "deltaorg/deltarepo/src/resumed.py"}


def test_compact_drops_tombstones(small_index, tmp_path):
    from prosearch_ray.index.delta import compact, delete_docs, load_tombstones
    from prosearch_ray.query.searcher import IndexSearcher

    index_dir, report, _ = small_index
    victims = _hit_keys(index_dir, "the")[:3]
    delete_docs(index_dir, victims)
    out = str(tmp_path / "compacted")
    rep = compact(index_dir, out)
    assert rep["n_docs"] == report["n_docs"] - 3
    s = IndexSearcher(out)
    assert len(s.tombstones) == 0
    hits = _hit_keys(out, "the")
    assert not (set(victims) & set(hits))


def test_delta_merge_is_incremental(small_index):
    """A small delta must rewrite only the postings parts its terms hash to —
    unaffected part files stay byte-untouched (tiered merge, not a full
    re-merge)."""
    import json
    import os

    import ray.data as rd

    from prosearch_ray.index.delta import add_documents

    index_dir, report, _ = small_index
    pdir = os.path.join(index_dir, "postings")
    before = {f: os.path.getmtime(os.path.join(pdir, f))
              for f in os.listdir(pdir) if f.endswith(".parquet")}
    assert len(before) > 4, "need several parts to make the test meaningful"

    delta = pa.table({
        "repo": ["deltaorg/deltarepo"],
        "path": ["src/tiny.py"],
        "commit": ["f" * 40],
        "lang": ["py"],
        "content": ["qqincremental merge probe"],
    })
    res = add_documents(index_dir, rd.from_arrow(delta))
    assert res["added"] == 1

    after = {f: os.path.getmtime(os.path.join(pdir, f))
             for f in os.listdir(pdir) if f.endswith(".parquet")}
    changed = {f for f in before if after.get(f) != before[f]}
    # the delta has ~5 distinct terms -> at most a handful of parts touched
    assert changed, "delta must rewrite the parts its terms hash to"
    assert len(changed) < len(before), \
        f"full re-merge detected: all {len(before)} parts rewritten"
    # merge bookkeeping stays consistent
    ms = json.load(open(os.path.join(index_dir, "_merge.json")))
    assert ms["n_terms"] == sum(ms["parts"].values())
