"""Generic aggregation-on-query evaluation — the tantivy aggregation
passthrough analog (/root/reference/tantivy-cli/src/commands/search.rs:47-61
deserializes an elasticsearch-style ``Aggregations`` JSON request and runs
an ``AggregationCollector`` over the query's match set).  Here the match
set comes from the engine's candidate evaluation (AND query + tombstones +
optional typed filter) and every aggregation runs vectorized over the typed
fast-field sidecar (index/fastfields.py).

Three-phase contract so the SAME kernels serve both the unsharded searcher
and the sharded scatter-gather path:

  ``agg_partial(ff, cand, aggs)``  per shard: numpy over the local match
      set -> a MERGEABLE partial (metrics keep (count, sum, min, max);
      bucket aggs keep full per-key counts — no early truncation, so the
      sharded merge is exact);
  ``agg_merge(a, b)``              associative partial merge (doc shards
      partition the corpus, so counts/sums are additive and min/max
      combine);
  ``agg_finalize(aggs, partial)``  -> the response shape (terms size
      truncation + sum_other_doc_count, histogram gap-filling between the
      global min and max keys, avg = sum/count).

Supported aggregation types (the subset of tantivy's agg_req that a typed
columnar sidecar can answer): ``terms``, ``histogram``, ``date_histogram``
(``fixed_interval`` over a timestamp fast field; bucket keys are exact
int64 epoch-micro floors, reported as ES-style epoch-milli ``key`` +
``key_as_string``), ``range``, ``stats``, ``avg``, ``min``, ``max``,
``sum``, ``value_count`` — each bucket agg accepts nested ``aggs``
recursively, exactly the request JSON shape tantivy accepts.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_METRICS = ("stats", "avg", "min", "max", "sum", "value_count")
_BUCKETS = ("terms", "histogram", "range", "date_histogram")

_INTERVAL_US = {"ms": 1000, "s": 10 ** 6, "m": 60 * 10 ** 6,
                "h": 3600 * 10 ** 6, "d": 86400 * 10 ** 6}


def _fixed_interval_us(s) -> int:
    """Parse an elasticsearch/tantivy ``fixed_interval`` ("30s", "1d", …)
    to microseconds (the sidecar's timestamp unit)."""
    import re

    m = re.fullmatch(r"(\d+)(ms|s|m|h|d)", str(s))
    if not m or int(m.group(1)) == 0:
        raise ValueError(
            f"bad fixed_interval {s!r}: expected <N>(ms|s|m|h|d)")
    return int(m.group(1)) * _INTERVAL_US[m.group(2)]


def _parse_one(name: str, spec: dict) -> Tuple[str, dict, Optional[dict]]:
    """-> (agg_type, body, sub_aggs).  Raises on malformed requests."""
    if not isinstance(spec, dict):
        raise ValueError(f"aggregation {name!r}: spec must be an object")
    sub = spec.get("aggs") or spec.get("aggregations")
    types = [k for k in spec if k not in ("aggs", "aggregations")]
    if len(types) != 1:
        raise ValueError(
            f"aggregation {name!r}: exactly one agg type required, "
            f"got {types}")
    typ = types[0]
    if typ not in _METRICS + _BUCKETS:
        raise ValueError(f"aggregation {name!r}: unsupported type {typ!r}")
    body = spec[typ]
    if not isinstance(body, dict) or "field" not in body:
        raise ValueError(f"aggregation {name!r}: missing 'field'")
    if sub is not None and typ in _METRICS:
        raise ValueError(f"aggregation {name!r}: metric aggs take no sub-aggs")
    if typ == "histogram" and not float(body.get("interval", 0)) > 0:
        raise ValueError(f"aggregation {name!r}: histogram needs interval>0")
    if typ == "date_histogram":
        _fixed_interval_us(body.get("fixed_interval", ""))  # validate early
    if typ == "range" and not body.get("ranges"):
        raise ValueError(f"aggregation {name!r}: range needs 'ranges'")
    return typ, body, sub


def _field(ff: Dict[str, np.ndarray], col: str) -> np.ndarray:
    if col not in ff or col == "_valid":
        raise KeyError(f"no fast field {col!r}")
    return ff[col]


def _pyval(v):
    return v.item() if hasattr(v, "item") else v


def _metric_partial(vals: np.ndarray) -> dict:
    if vals.dtype.kind not in "iufM":
        raise ValueError("metric aggregation over a non-numeric fast field")
    if len(vals) == 0:
        return {"count": 0, "sum": None, "min": None, "max": None}
    if vals.dtype.kind == "M":  # dates: min/max only (no datetime sum)
        s = None
    elif vals.dtype.kind in "iu":
        s = int(vals.sum())  # integer inputs keep exact sums through merge
    else:
        s = float(vals.sum())
    return {"count": int(len(vals)), "sum": s,
            "min": _pyval(vals.min()), "max": _pyval(vals.max())}


def _bucket_segments(cand: np.ndarray, keys: np.ndarray):
    """Group candidate doc_ids by bucket key -> [(key, sub_cand)] without a
    per-row Python loop: one argsort + boundary scan; the loop below is per
    DISTINCT key (result-sized)."""
    uniq, inv = np.unique(keys, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
    return [(uniq[i], cand[order[bounds[i]:bounds[i + 1]]])
            for i in range(len(uniq))]


def agg_partial(ff: Dict[str, np.ndarray], cand: np.ndarray,
                aggs: dict) -> dict:
    out = {}
    for name, spec in aggs.items():
        typ, body, sub = _parse_one(name, spec)
        if typ == "value_count":  # counts docs with a value: any field type
            out[name] = {"count": int(len(cand)), "sum": None,
                         "min": None, "max": None}
            _field(ff, body["field"])  # still validate the field exists
            continue
        if typ in _METRICS:
            vals = _field(ff, body["field"])
            if typ in ("sum", "avg") and vals.dtype.kind == "M":
                raise ValueError(
                    f"aggregation {name!r}: no {typ} over a date field "
                    "(min/max/value_count apply; cast to epoch for sums)")
            out[name] = _metric_partial(vals[cand])
            continue
        vals = _field(ff, body["field"])[cand]
        buckets: dict = {}
        if typ == "terms":
            segs = _bucket_segments(cand, vals)
        elif typ == "histogram":
            interval = float(body["interval"])
            offset = float(body.get("offset", 0.0))
            keys = (np.floor((vals.astype(np.float64) - offset) / interval)
                    * interval + offset)
            segs = _bucket_segments(cand, keys)
        elif typ == "date_histogram":
            if vals.dtype.kind != "M":
                raise ValueError(
                    f"aggregation {name!r}: date_histogram needs a "
                    "date/timestamp fast field")
            iv = _fixed_interval_us(body["fixed_interval"])
            epoch = vals.astype("datetime64[us]").astype(np.int64)
            # int64 floor division: exact bucket keys (epoch micros),
            # floors toward -inf for pre-1970 stamps like ES
            keys = (epoch // iv) * iv
            segs = _bucket_segments(cand, keys)
        else:  # range: buckets keyed by range index (request order)
            v = vals.astype(np.float64)
            segs = []
            for i, r in enumerate(body["ranges"]):
                m = np.ones(len(v), bool)
                if "from" in r:
                    m &= v >= float(r["from"])
                if "to" in r:
                    m &= v < float(r["to"])
                segs.append((i, cand[m]))
        for key, seg in segs:
            b = {"doc_count": int(len(seg))}
            if sub:
                b["aggs"] = agg_partial(ff, seg, sub)
            buckets[_pyval(key)] = b
        out[name] = {"buckets": buckets}
    return out


def _merge_metric(a: dict, b: dict) -> dict:
    lo = [x for x in (a["min"], b["min"]) if x is not None]
    hi = [x for x in (a["max"], b["max"]) if x is not None]
    ss = [x for x in (a["sum"], b["sum"]) if x is not None]
    return {"count": a["count"] + b["count"],
            "sum": sum(ss) if ss else None,
            "min": min(lo) if lo else None, "max": max(hi) if hi else None}


def agg_merge(a: dict, b: dict) -> dict:
    out = dict(a)
    for name, pb in b.items():
        pa_ = out.get(name)
        if pa_ is None:
            out[name] = pb
        elif "buckets" in pb:
            buckets = dict(pa_["buckets"])
            for key, bb in pb["buckets"].items():
                ba = buckets.get(key)
                if ba is None:
                    buckets[key] = bb
                else:
                    m = {"doc_count": ba["doc_count"] + bb["doc_count"]}
                    if "aggs" in ba or "aggs" in bb:
                        m["aggs"] = agg_merge(ba.get("aggs", {}),
                                              bb.get("aggs", {}))
                    buckets[key] = m
            out[name] = {"buckets": buckets}
        else:
            out[name] = _merge_metric(pa_, pb)
    return out


_EMPTY_METRIC = {"count": 0, "sum": None, "min": None, "max": None}


def agg_finalize(aggs: dict, partial: dict) -> dict:
    out = {}
    for name, spec in aggs.items():
        typ, body, sub = _parse_one(name, spec)
        part = partial.get(name)
        if typ in _METRICS:
            p = part or _EMPTY_METRIC
            sum_ = p["sum"] if p["sum"] is not None else 0
            avg = ((p["sum"] / p["count"])
                   if p["count"] and p["sum"] is not None else None)
            if typ == "stats":
                out[name] = {"count": p["count"], "min": p["min"],
                             "max": p["max"], "sum": sum_, "avg": avg}
            elif typ == "value_count":
                out[name] = {"value": p["count"]}
            elif typ == "avg":
                out[name] = {"value": avg}
            elif typ == "sum":
                out[name] = {"value": sum_}
            else:
                out[name] = {"value": p[typ]}
            continue
        buckets = (part or {"buckets": {}})["buckets"]

        def _bucket_out(key_field: dict, b: dict) -> dict:
            row = dict(key_field)
            row["doc_count"] = b["doc_count"]
            if sub:
                row.update(agg_finalize(sub, b.get("aggs", {})))
            return row

        if typ == "terms":
            size = int(body.get("size", 10))
            items = sorted(buckets.items(),
                           key=lambda kv: (-kv[1]["doc_count"], kv[0]))
            kept, other = items[:size], items[size:]
            out[name] = {
                "buckets": [_bucket_out({"key": k}, b) for k, b in kept],
                "sum_other_doc_count": sum(
                    b["doc_count"] for _, b in other),
            }
        elif typ == "date_histogram":
            iv = _fixed_interval_us(body["fixed_interval"])
            rows = []
            if buckets:
                lo, hi = int(min(buckets)), int(max(buckets))
                for k in range(lo, hi + 1, iv):  # gap-fill, exact int keys
                    b = buckets.get(k, {"doc_count": 0})
                    rows.append(_bucket_out(
                        {"key": k // 1000,  # epoch millis, the ES wire unit
                         "key_as_string": str(np.datetime64(k, "us"))}, b))
            out[name] = {"buckets": rows}
        elif typ == "histogram":
            interval = float(body["interval"])
            rows = []
            if buckets:
                lo, hi = min(buckets), max(buckets)
                # index-normalized lookup: float keys from lo + i*interval
                # must hit the stored floor(...)-derived keys exactly
                byidx = {int(round((k - lo) / interval)): b
                         for k, b in buckets.items()}
                n = int(round((hi - lo) / interval)) + 1
                for i in range(n):  # gap-fill between global min and max
                    b = byidx.get(i, {"doc_count": 0})
                    rows.append(_bucket_out({"key": lo + i * interval}, b))
            out[name] = {"buckets": rows}
        else:  # range: request order, es-style key naming
            rows = []
            for i, r in enumerate(body["ranges"]):
                frm, to = r.get("from"), r.get("to")
                key = r.get("key", f"{frm if frm is not None else '*'}-"
                                   f"{to if to is not None else '*'}")
                field = {"key": key}
                if frm is not None:
                    field["from"] = float(frm)
                if to is not None:
                    field["to"] = float(to)
                rows.append(_bucket_out(
                    field, buckets.get(i, {"doc_count": 0})))
            out[name] = {"buckets": rows}
    return out
