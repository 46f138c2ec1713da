"""Generic aggregation-on-query surface (tantivy --aggregation passthrough,
search.rs:47-61): elasticsearch-style requests over the conjunctive match
set, evaluated on the typed fast-field sidecar — brute-force parity on the
unsharded searcher, exact partial-merge parity on the sharded path."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def agg_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from prosearch_ray.fixtures import write_corpus
    from prosearch_ray.index.build import build_index
    from prosearch_ray.index.fastfields import build_fast_fields

    base = tmp_path_factory.mktemp("aggs")
    d = write_corpus(str(base / "corpus"), n_docs=400)
    index_dir = str(base / "idx")
    build_index(d + "/corpus", index_dir, docs_per_bucket=64)

    def add_typed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.append_column(
            "n_chars", pc.cast(pc.utf8_length(t.column("content")),
                               pa.int64()))

    src = rd.read_parquet(d + "/corpus").map_batches(
        add_typed, batch_format="pyarrow")
    build_fast_fields(index_dir, src, columns=["lang", "n_chars"])
    return d, index_dir


def _brute(s, query):
    """Match set + loaded fast fields the way the agg path defines it."""
    from prosearch_ray.index.fastfields import load_fast_fields

    ff = load_fast_fields(s.index_dir, s.n_docs)
    ids, _ = s.search(query, 10 ** 6)
    ids = ids[ff["_valid"][ids]]
    return ff, ids


def test_metric_aggs_match_brute(agg_index):
    from prosearch_ray.query.searcher import IndexSearcher

    _, index_dir = agg_index
    s = IndexSearcher(index_dir)
    ff, ids = _brute(s, "merge hash")
    vals = ff["n_chars"][ids]
    res = s.aggregate("merge hash", {
        "st": {"stats": {"field": "n_chars"}},
        "a": {"avg": {"field": "n_chars"}},
        "lo": {"min": {"field": "n_chars"}},
        "hi": {"max": {"field": "n_chars"}},
        "tot": {"sum": {"field": "n_chars"}},
        "n": {"value_count": {"field": "n_chars"}},
    })
    assert res["st"] == {"count": len(vals), "min": int(vals.min()),
                         "max": int(vals.max()), "sum": int(vals.sum()),
                         "avg": int(vals.sum()) / len(vals)}
    assert res["a"]["value"] == res["st"]["avg"]
    assert res["lo"]["value"] == int(vals.min())
    assert res["hi"]["value"] == int(vals.max())
    assert res["tot"]["value"] == int(vals.sum())
    assert res["n"]["value"] == len(vals)
    # integer sums stay exact integers through the pipeline
    assert isinstance(res["tot"]["value"], int)


def test_terms_with_nested_stats(agg_index):
    from prosearch_ray.query.searcher import IndexSearcher

    _, index_dir = agg_index
    s = IndexSearcher(index_dir)
    ff, ids = _brute(s, "merge hash")
    res = s.aggregate("merge hash", {
        "langs": {"terms": {"field": "lang", "size": 2},
                  "aggs": {"chars": {"sum": {"field": "n_chars"}}}}})
    langs = ff["lang"][ids]
    want = {}
    for lg in set(langs.tolist()):
        m = langs == lg
        want[lg] = (int(m.sum()), int(ff["n_chars"][ids][m].sum()))
    ranked = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))
    got = res["langs"]["buckets"]
    assert len(got) == 2  # size honored
    for b, (lg, (n, tot)) in zip(got, ranked[:2]):
        assert b["key"] == lg and b["doc_count"] == n
        assert b["chars"]["value"] == tot
    assert res["langs"]["sum_other_doc_count"] == sum(
        n for _, (n, _) in ranked[2:])
    # facet parity: terms with a big size == facet_counts
    full = s.aggregate("merge hash",
                       {"l": {"terms": {"field": "lang", "size": 100}}})
    assert ([(b["key"], b["doc_count"]) for b in full["l"]["buckets"]]
            == s.facet_counts("merge hash", "lang"))


def test_histogram_gap_fill_and_range(agg_index):
    from prosearch_ray.query.searcher import IndexSearcher

    _, index_dir = agg_index
    s = IndexSearcher(index_dir)
    ff, ids = _brute(s, "merge hash")
    vals = ff["n_chars"][ids].astype(np.float64)
    res = s.aggregate("merge hash", {
        "h": {"histogram": {"field": "n_chars", "interval": 100}},
        "r": {"range": {"field": "n_chars",
                        "ranges": [{"to": 300}, {"from": 300, "to": 600},
                                   {"from": 600}]}}})
    keys = np.floor(vals / 100) * 100
    lo, hi = keys.min(), keys.max()
    buckets = res["h"]["buckets"]
    assert [b["key"] for b in buckets] == list(
        np.arange(lo, hi + 100, 100))  # contiguous, gap-filled
    for b in buckets:
        assert b["doc_count"] == int((keys == b["key"]).sum())
    assert sum(b["doc_count"] for b in buckets) == len(ids)
    rb = res["r"]["buckets"]
    assert [b["key"] for b in rb] == ["*-300", "300-600", "600-*"]
    assert rb[0]["doc_count"] == int((vals < 300).sum())
    assert rb[1]["doc_count"] == int(((vals >= 300) & (vals < 600)).sum())
    assert rb[2]["doc_count"] == int((vals >= 600).sum())
    assert "from" not in rb[0] and rb[1]["from"] == 300.0


def test_agg_filter_composes_and_errors(agg_index):
    from prosearch_ray.query.searcher import IndexSearcher

    _, index_dir = agg_index
    s = IndexSearcher(index_dir)
    ff, ids = _brute(s, "merge hash")
    m = (ff["lang"][ids] == "py")
    res = s.aggregate("merge hash", {"n": {"value_count": {"field": "lang"}}},
                      filter=[("lang", "==", "py")])
    # value_count over a string field counts docs, no numeric cast needed
    assert res["n"]["value"] == int(m.sum()) == s.last_count
    with pytest.raises(ValueError):
        s.aggregate("merge hash", {"x": {"bogus": {"field": "lang"}}})
    with pytest.raises(ValueError):
        s.aggregate("merge hash", {"x": {"avg": {"field": "lang"}}})
    with pytest.raises(KeyError):
        s.aggregate("merge hash", {"x": {"avg": {"field": "nope"}}})
    with pytest.raises(ValueError):
        s.aggregate("merge hash",
                    {"x": {"avg": {"field": "n_chars"},
                           "aggs": {"y": {"sum": {"field": "n_chars"}}}}})
    # unmatched query -> empty, well-formed response
    empty = s.aggregate("zzznosuchterm", {
        "st": {"stats": {"field": "n_chars"}},
        "t": {"terms": {"field": "lang"}}})
    assert empty["st"]["count"] == 0 and empty["t"]["buckets"] == []


def test_sharded_aggregate_matches_unsharded(agg_index, tmp_path):
    """Partial-merge exactness: the scatter-gather aggregate over a 3-shard
    root equals the unsharded response bit-for-bit (counts/sums additive,
    min/max combine, terms truncation happens only after the merge)."""
    import ray.data as rd

    from prosearch_ray.index.fastfields import build_fast_fields_sharded
    from prosearch_ray.index.sharded import build_sharded_index
    from prosearch_ray.query.searcher import IndexSearcher
    from prosearch_ray.query.sharded import ShardedSearcher

    d, index_dir = agg_index
    root = str(tmp_path / "shards")
    build_sharded_index(d + "/corpus", root, num_shards=3,
                        docs_per_bucket=64)

    def add_typed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.append_column(
            "n_chars", pc.cast(pc.utf8_length(t.column("content")),
                               pa.int64()))

    src = rd.read_parquet(d + "/corpus").map_batches(
        add_typed, batch_format="pyarrow")
    build_fast_fields_sharded(root, src, columns=["lang", "n_chars"])
    req = {
        "langs": {"terms": {"field": "lang", "size": 2},
                  "aggs": {"st": {"stats": {"field": "n_chars"}}}},
        "h": {"histogram": {"field": "n_chars", "interval": 150}},
        "tot": {"sum": {"field": "n_chars"}},
    }
    s = IndexSearcher(index_dir)
    m = ShardedSearcher(root)
    try:
        for q in ("merge hash", "the", "scan"):
            assert m.aggregate(q, req) == s.aggregate(q, req)
    finally:
        m.shutdown()


def test_date_field_aggregations(agg_index):
    """Aggregations over a timestamp fast field (new.rs date-field analog):
    min/max/value_count work (datetime64 kind), sum/avg raise (no datetime
    sum), terms buckets on coarse date keys count correctly."""
    import pyarrow.compute as pc

    import ray.data as rd

    from prosearch_ray.index.fastfields import build_fast_fields
    from prosearch_ray.query.searcher import IndexSearcher

    d, index_dir = agg_index

    def add_ts(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t.column("content")).to_numpy(
            zero_copy_only=False).astype("int64")
        day = (np.datetime64("2026-02-01", "us")
               + (n % 7) * np.timedelta64(86400, "s"))
        return t.append_column("day", pa.array(day, pa.timestamp("us")))

    src = rd.read_parquet(d + "/corpus").map_batches(
        add_ts, batch_format="pyarrow")
    build_fast_fields(index_dir, src, columns=["day"])
    s = IndexSearcher(index_dir)
    from prosearch_ray.index.fastfields import load_fast_fields
    ff = load_fast_fields(s.index_dir, s.n_docs)
    ids, _ = s.search("merge hash", 10 ** 6)
    ids = ids[ff["_valid"][ids]]
    days = ff["day"][ids]
    res = s.aggregate("merge hash", {
        "lo": {"min": {"field": "day"}},
        "hi": {"max": {"field": "day"}},
        "n": {"value_count": {"field": "day"}},
        "by_day": {"terms": {"field": "day", "size": 7}},
    })
    assert res["lo"]["value"] == days.min()
    assert res["hi"]["value"] == days.max()
    assert res["n"]["value"] == len(ids)
    got = {b["key"]: b["doc_count"] for b in res["by_day"]["buckets"]}
    uniq, counts = np.unique(days, return_counts=True)
    # bucket keys arrive as python datetimes (np .item() conversion)
    assert got == {k.item(): int(c) for k, c in zip(uniq, counts)}
    with pytest.raises(ValueError):
        s.aggregate("merge hash", {"x": {"sum": {"field": "day"}}})
    with pytest.raises(ValueError):
        s.aggregate("merge hash", {"x": {"avg": {"field": "day"}}})

    # date_histogram (fixed_interval over the timestamp field): exact
    # int64 epoch-micro bucket floors, ES-style epoch-milli keys,
    # gap-filled between min and max, nested sub-aggs work
    res = s.aggregate("merge hash", {
        "per_2d": {"date_histogram": {"field": "day",
                                      "fixed_interval": "2d"},
                   "aggs": {"n": {"value_count": {"field": "day"}}}},
    })
    iv = 2 * 86400 * 10 ** 6
    epoch = days.astype("datetime64[us]").astype(np.int64)
    bkeys = (epoch // iv) * iv
    uniq_b, counts_b = np.unique(bkeys, return_counts=True)
    want = {int(k) // 1000: int(c) for k, c in zip(uniq_b, counts_b)}
    got_rows = res["per_2d"]["buckets"]
    got = {b["key"]: b["doc_count"] for b in got_rows}
    assert {k: v for k, v in got.items() if v} == want
    # gap-fill: keys advance by exactly the interval, zero-count gaps kept
    keys_ms = [b["key"] for b in got_rows]
    assert keys_ms == list(range(keys_ms[0], keys_ms[-1] + 1,
                                 iv // 1000))
    # nested metric equals the bucket count; key_as_string is the bucket
    # start in ISO form
    for b in got_rows:
        assert b["n"]["value"] == b["doc_count"]
        assert b["key_as_string"].startswith("2026-")
    # non-date fields and bad intervals are rejected (the day-only sidecar
    # rebuilt above no longer carries n_chars, so probe the kernel direct)
    from prosearch_ray.query.aggs import agg_partial
    with pytest.raises(ValueError, match="date/timestamp"):
        agg_partial({"num": np.arange(5), "_valid": np.ones(5, bool)},
                    np.arange(5),
                    {"x": {"date_histogram": {"field": "num",
                                              "fixed_interval": "1d"}}})
    with pytest.raises(ValueError):
        s.aggregate("merge hash", {"x": {"date_histogram": {
            "field": "day", "fixed_interval": "0d"}}})
