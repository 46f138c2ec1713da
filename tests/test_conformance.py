"""Ranking conformance: the Ray-built index must be rank-identical (scores to
1e-5) to the brute-force oracle over the full fixture query set, and the
per-row sha256(content) invariant must hold through every stage boundary
(BASELINE.md targets; north rule)."""

import hashlib
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from prosearch_ray.fixtures.gen import generate_queries
from prosearch_ray.query.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher(tiny_index):
    index_dir, _ = tiny_index
    return IndexSearcher(index_dir)


def test_doc_count_matches_oracle(tiny_index, tiny_oracle):
    _, report = tiny_index
    assert report["n_docs"] == tiny_oracle.n


def test_doc_ids_match_oracle(tiny_index, tiny_oracle):
    index_dir, _ = tiny_index
    meta_dir = os.path.join(index_dir, "docmeta")
    rows = []
    for f in sorted(os.listdir(meta_dir)):
        if f.endswith(".parquet"):
            rows.extend(pq.read_table(f"{meta_dir}/{f}",
                                      columns=["doc_id", "doc_key"]).to_pylist())
    engine = {r["doc_id"]: r["doc_key"] for r in rows}
    oracle = {d["doc_id"]: d["doc_key"] for d in tiny_oracle.docs}
    assert engine == oracle


def test_rank_identical_all_queries(searcher, tiny_oracle):
    queries = generate_queries()
    n_nonempty = 0
    for row in queries.to_pylist():
        want = tiny_oracle.search(row["query"], row["k"])
        ids, scores = searcher.search(row["query"], row["k"])
        assert [int(i) for i in ids] == [d for d, _, _ in want], row["query"]
        got = np.asarray(scores)
        exp = np.asarray([s for _, _, s in want])
        assert np.allclose(got, exp, atol=1e-5), row["query"]
        n_nonempty += bool(len(ids))
    assert n_nonempty >= 30  # the fixture query set must actually hit


def test_zero_hit_and_empty_queries(searcher):
    for q in ("zzznothing", "zzznothing merge", "", "   ", "..."):
        ids, scores = searcher.search(q, 10)
        assert len(ids) == 0 and len(scores) == 0


def test_k_variants(searcher, tiny_oracle):
    for k in (1, 3, 100):
        want = tiny_oracle.search("the", k)
        ids, _ = searcher.search("the", k)
        assert [int(i) for i in ids] == [d for d, _, _ in want]
        assert len(ids) <= k


def test_sha256_invariant_through_all_stages(tiny_index, tiny_oracle):
    """sha256(content) computed at generation == docmeta sha256 == staged docs
    recomputed sha (the per-row invariant of BASELINE.json input_hint)."""
    index_dir, _ = tiny_index
    expected = {d["doc_key"]: d["sha256"] for d in tiny_oracle.docs}

    meta_rows = []
    for f in sorted(os.listdir(f"{index_dir}/docmeta")):
        if f.endswith(".parquet"):
            meta_rows.extend(
                pq.read_table(f"{index_dir}/docmeta/{f}",
                              columns=["doc_key", "sha256"]).to_pylist())
    assert {r["doc_key"]: r["sha256"] for r in meta_rows} == expected

    staged_rows = []
    for f in sorted(os.listdir(f"{index_dir}/staged")):
        if f.endswith(".parquet") and f.startswith("bucket="):
            staged_rows.extend(
                pq.read_table(f"{index_dir}/staged/{f}",
                              columns=["doc_key", "content", "sha256"]).to_pylist())
    for r in staged_rows:
        recomputed = hashlib.sha256(r["content"].encode("utf-8")).digest()
        assert recomputed == r["sha256"] == expected[r["doc_key"]]


def test_tie_break_ascending_doc_id():
    """Hand-built 3-doc tie table (FIXTURES.md §1): identical docs under
    different keys can't survive dedup, so craft distinct contents with equal
    token stats -> equal BM25 scores; ranks must come back doc_id-ascending."""
    import pyarrow as pa

    from prosearch_ray.index import docid
    from prosearch_ray.oracle.bm25_oracle import BM25Oracle

    corpus = pa.table({
        "repo": ["r/a"] * 3,
        "path": ["x/f1.py", "x/f2.py", "x/f3.py"],
        "commit": ["c" * 40] * 3,
        "lang": ["py"] * 3,
        # same length, same tf for "needle", different filler tokens
        "content": ["needle alpha", "needle bravo", "needle circa"],
    })
    oracle = BM25Oracle(corpus, num_buckets=1)
    hits = oracle.search("needle", 3)
    assert [h[0] for h in hits] == [0, 1, 2]
    assert len({round(h[2], 9) for h in hits}) == 1
