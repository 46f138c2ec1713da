"""Phrase queries over body positions (record: position analog)."""

import numpy as np
import pyarrow as pa
import pytest

from prosearch_ray.fixtures.gen import STOPWORDISH, WORD_POOL


@pytest.fixture(scope="module")
def phrase_setup(ray_session, tmp_path_factory):
    import ray.data as rd

    from prosearch_ray.index.build import build_index
    from prosearch_ray.oracle.bm25_oracle import BM25Oracle
    from prosearch_ray.query.searcher import IndexSearcher

    corpus = pa.table({
        "repo": ["r/a"] * 5,
        "path": [f"f{i}.py" for i in range(5)],
        "commit": ["c" * 40] * 5,
        "lang": ["py"] * 5,
        "content": [
            "alpha beta gamma delta",          # has "beta gamma"
            "gamma beta alpha",                # reversed: no "beta gamma"
            "beta gamma beta gamma",           # two occurrences
            "beta x gamma",                    # gap: no match
            "prefix beta gamma suffix beta",   # one occurrence
        ],
    })
    idx = str(tmp_path_factory.mktemp("phrase") / "idx")
    build_index(rd.from_arrow(corpus), idx, docs_per_bucket=8,
                n_input_estimate=5)
    return IndexSearcher(idx), BM25Oracle(corpus, num_buckets=1), corpus


def test_phrase_adjacency(phrase_setup):
    s, oracle, _ = phrase_setup
    ids, scores = s.search_phrase("beta gamma", 10)
    keys = {str(s.doc_keys[int(d)]) for d in ids}
    assert keys == {"r/a/f0.py", "r/a/f2.py", "r/a/f4.py"}
    # doc with two occurrences scores the highest tf
    best = str(s.doc_keys[int(ids[0])])
    assert best == "r/a/f2.py"


def test_phrase_engine_matches_oracle(phrase_setup):
    s, oracle, _ = phrase_setup
    # NOTE: engine and oracle bucket layouts differ here (num_buckets), so
    # compare by doc_key + score value, not doc_id
    for q in ["beta gamma", "alpha beta gamma", "gamma", "beta x gamma",
              "missing phrase", ""]:
        ids, scores = s.search_phrase(q, 10)
        want = oracle.search_phrase(q, 10)
        got_keys = [str(s.doc_keys[int(d)]) for d in ids]
        want_keys = [k for _, k, _ in want]
        assert sorted(got_keys) == sorted(want_keys), q
        assert np.allclose(sorted(scores), sorted([sc for _, _, sc in want]),
                           atol=1e-9), q


def test_phrase_on_fixture_corpus(ray_session, tiny_index, tiny_oracle):
    from prosearch_ray.query.searcher import IndexSearcher

    s = IndexSearcher(tiny_index[0])
    queries = [
        " ".join([STOPWORDISH[0], STOPWORDISH[1]]),
        " ".join([WORD_POOL[0], WORD_POOL[1]]),
        "merge hash", "return value", "zzznothing phrase",
    ]
    n_hit = 0
    for q in queries:
        ids, scores = s.search_phrase(q, 10)
        want = tiny_oracle.search_phrase(q, 10)
        assert [int(i) for i in ids] == [d for d, _, _ in want], q
        assert np.allclose(scores, [sc for _, _, sc in want], atol=1e-5), q
        n_hit += bool(len(ids))
    assert n_hit >= 1  # at least one phrase actually matches the corpus
