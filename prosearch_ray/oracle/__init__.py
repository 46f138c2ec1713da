from prosearch_ray.oracle.bm25_oracle import BM25Oracle, canonicalize  # noqa: F401
