import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    from prosearch_ray.fixtures.gen import generate_corpus

    return generate_corpus(300)


@pytest.fixture(scope="session")
def tiny_index(ray_session, tiny_corpus, tmp_path_factory):
    """Build the tiny index once per test session; yields (index_dir, report)."""
    import ray.data as rd

    from prosearch_ray.index.build import build_index

    index_dir = str(tmp_path_factory.mktemp("idx") / "tiny")
    report = build_index(rd.from_arrow(tiny_corpus), index_dir, docs_per_bucket=64)
    return index_dir, report


@pytest.fixture(scope="session")
def tiny_oracle(tiny_corpus):
    from prosearch_ray.index import docid
    from prosearch_ray.oracle.bm25_oracle import BM25Oracle

    return BM25Oracle(
        tiny_corpus, num_buckets=docid.num_buckets_for(tiny_corpus.num_rows, 64))
