from prosearch_ray.fixtures.gen import (  # noqa: F401
    generate_corpus,
    generate_queries,
    write_corpus,
)
