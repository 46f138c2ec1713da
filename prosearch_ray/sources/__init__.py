from prosearch_ray.sources.corpus import read_corpus  # noqa: F401
