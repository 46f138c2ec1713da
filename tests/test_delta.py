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
