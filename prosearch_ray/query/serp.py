"""SERP assembly — the reference's JSON wire shape
(``Serp { q, hits: [{doc, snip}], timings }``,
/root/reference/tantivy-cli/src/commands/serve.rs:301-312,561-597), with the
body dropped from each stored doc before returning (M13, serve.rs:379-386).
"""

from __future__ import annotations

import time

from prosearch_ray.index import scoring


def serp(searcher, q: str, nhits: int = scoring.DEFAULT_K,
         filter=None) -> dict:
    """``searcher`` is any object with the ``search_with_snippets`` +
    ``last_count`` contract — ``IndexSearcher`` or the scatter-gather
    ``ShardedSearcher`` (sharded SERPs are merged-top-k identical to the
    unsharded surface).  ``filter``: optional typed fast-field predicates
    (index/fastfields.py) ANDed with the query."""
    t0 = time.perf_counter()
    hits = searcher.search_with_snippets(q, nhits, filter=filter)
    dt_us = int((time.perf_counter() - t0) * 1e6)
    return serp_shell(q, [
        {"doc": {"title": [h["title"]], "url": [h["doc_key"]]},
         "snip": h["snip"],
         "score": h["score"]}
        for h in hits
    ], searcher.last_count, dt_us)


def serp_shell(q: str, hits: list, count: int, dt_us: int) -> dict:
    """The reference SERP envelope (serve.rs JSON shape) — ONE place owns
    the field layout so alternate hit producers (the constant-score
    regex/fuzzy routes) cannot drift from the scored path."""
    return {
        "q": q,
        "count": int(count),
        "hits": hits,
        "timings": {"timings": [{"name": "search", "duration": dt_us}]},
    }
