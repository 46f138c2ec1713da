from prosearch_ray.functions.scalar import pretty_size, remove_scheme  # noqa: F401
