from prosearch_ray.stages.pipeline import Stage, StagePipeline  # noqa: F401
