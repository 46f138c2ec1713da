from prosearch_ray.query.searcher import IndexSearcher  # noqa: F401
from prosearch_ray.query.actor import QueryStage, search_dataset  # noqa: F401
