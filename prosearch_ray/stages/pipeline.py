"""User-extension surface: an explicit, ordered list of named stages
(SURVEY.md §2.11).

The reference's plugin model is Norconex's ``IPipelineStage`` chain with
stage injection — the Manager is prepended as the first importer stage
(/root/reference/src/main/java/com/milindmantri/ProCrawler.java:32-47) and
``FastQueuePipeline`` swaps the sitemap stage
(FastQueuePipeline.java:34-48).  The Ray-native equivalent: a pipeline is a
list of ``Stage(name, fn, kind)`` applied in order to a Dataset; user hooks
are ``insert_before`` / ``insert_after`` / ``replace`` / ``remove``.

kind:
- "batches"  fn is a per-batch callable (function OR callable class) run via
             ``map_batches(batch_format="pyarrow")``; classes become actor
             pools (pass ``concurrency`` in opts).
- "dataset"  fn is Dataset -> Dataset (for groupby/sort/union/... steps).
"""

from __future__ import annotations

import inspect as _inspect
from dataclasses import dataclass, field
from typing import Any, Dict, List

import ray.data as rd


@dataclass
class Stage:
    name: str
    fn: Any
    kind: str = "batches"  # "batches" | "dataset"
    opts: Dict[str, Any] = field(default_factory=dict)

    def apply(self, ds: "rd.Dataset") -> "rd.Dataset":
        if self.kind == "dataset":
            return self.fn(ds)
        opts = {"batch_format": "pyarrow", **self.opts}
        if _inspect.isclass(self.fn):
            opts.setdefault("concurrency", 2)
        return ds.map_batches(self.fn, **opts)


class StagePipeline:
    def __init__(self, stages: List[Stage]):
        self.stages: List[Stage] = list(stages)

    def _index_of(self, name: str) -> int:
        for i, s in enumerate(self.stages):
            if s.name == name:
                return i
        raise KeyError(f"no stage named {name!r}; have "
                       f"{[s.name for s in self.stages]}")

    def insert_before(self, name: str, stage: Stage) -> "StagePipeline":
        self.stages.insert(self._index_of(name), stage)
        return self

    def insert_after(self, name: str, stage: Stage) -> "StagePipeline":
        self.stages.insert(self._index_of(name) + 1, stage)
        return self

    def replace(self, name: str, stage: Stage) -> "StagePipeline":
        self.stages[self._index_of(name)] = stage
        return self

    def remove(self, name: str) -> "StagePipeline":
        del self.stages[self._index_of(name)]
        return self

    def apply(self, ds: "rd.Dataset") -> "rd.Dataset":
        for stage in self.stages:
            ds = stage.apply(ds)
        return ds

    def names(self) -> List[str]:
        return [s.name for s in self.stages]
