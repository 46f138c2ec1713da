"""Adversarially skewed inputs (SURVEY.md §7.4): a stopword-grade term in
EVERY doc and one repo holding ~90% of all docs must neither break
correctness nor create unbounded shuffle groups."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def skew_setup(ray_session, tmp_path_factory):
    import ray.data as rd

    from prosearch_ray.index import docid
    from prosearch_ray.index.build import build_index
    from prosearch_ray.oracle.bm25_oracle import BM25Oracle

    rng = np.random.default_rng(77)
    n = 1500
    repos, paths, contents = [], [], []
    fillers = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for i in range(n):
        # 90% of docs live in ONE repo (hot-key skew on the repo dimension)
        repos.append("hot/repo" if i % 10 else f"cold/repo{i}")
        paths.append(f"src/f{i}.py")
        body = ["omnipresent"] * 5  # Zipf-extreme: df == N
        body += [fillers[int(rng.integers(0, len(fillers)))]
                 for _ in range(int(rng.integers(5, 30)))]
        if i % 7 == 0:
            body.append("sevenly")
        contents.append(" ".join(body))
    corpus = pa.table({
        "repo": pa.array(repos), "path": pa.array(paths),
        "commit": pa.array(["c" * 40] * n), "lang": pa.array(["py"] * n),
        "content": pa.array(contents),
    })
    idx = str(tmp_path_factory.mktemp("skew") / "idx")
    report = build_index(rd.from_arrow(corpus), idx, docs_per_bucket=128,
                         n_input_estimate=n)
    oracle = BM25Oracle(corpus,
                        num_buckets=docid.num_buckets_for(n, 128))
    return idx, report, oracle


def test_bucket_sizes_stay_bounded_under_repo_skew(skew_setup):
    idx, report, _ = skew_setup
    sizes = []
    for f in os.listdir(os.path.join(idx, "staged")):
        if f.startswith("bucket=") and f.endswith(".parquet"):
            sizes.append(pq.read_metadata(
                os.path.join(idx, "staged", f)).num_rows)
    # md5 bucketing keeps groups near-uniform despite 90% of docs sharing a
    # repo: no bucket more than ~2x the target
    assert max(sizes) <= 2 * 128
    assert len(sizes) == report["num_buckets"]


def test_every_doc_term_is_rank_identical(skew_setup):
    from prosearch_ray.query.searcher import IndexSearcher

    idx, report, oracle = skew_setup
    s = IndexSearcher(idx)
    for q, k in [("omnipresent", 10), ("omnipresent sevenly", 20),
                 ("sevenly", 1000), ("omnipresent alpha beta", 10)]:
        want = oracle.search(q, k)
        ids, scores = s.search(q, k)
        assert [int(i) for i in ids] == [d for d, _, _ in want], q
        assert np.allclose(scores, [sc for _, _, sc in want], atol=1e-5), q


def test_df_equals_n_for_omnipresent_term(skew_setup):
    from prosearch_ray.index.inspect import index_stats

    idx, report, _ = skew_setup
    st = index_stats(idx, top_terms=10)
    # title terms (src, py, f...) also reach df == N; omnipresent must be in
    # the df == N tie group
    by_term = {t["term"]: t["df"] for t in st["top_terms"]}
    assert by_term.get("omnipresent") == report["n_docs"]
