from prosearch_ray.state.broadcast import bput, bget  # noqa: F401
