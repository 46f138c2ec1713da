"""Broadcast small lookup sides: ``ray.put`` once on the driver, fetch + cache
once per worker process inside ``map_batches`` tasks.

This is the engine's replacement for every small-side join in the reference
(boost-term set serve.rs:362-369, seed-host membership Manager.java:107-115,
tombstone sets) — the small side never rides the shuffle; each worker
deserializes it at most once regardless of how many batches it processes.
"""

from __future__ import annotations

from typing import Any, Dict

import ray

_CACHE: Dict[str, Any] = {}


def bput(obj: Any) -> "ray.ObjectRef":
    return ray.put(obj)


def bget(ref: "ray.ObjectRef") -> Any:
    key = ref.hex()
    if key not in _CACHE:
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
