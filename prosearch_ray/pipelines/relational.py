"""Relational pipelines over the driver testdata — the reference's crawl-state
queries (SURVEY.md §2.5-2.8) re-expressed as Ray Data transforms over the
TPC-H-ish tables, each with a DuckDB oracle in __ray_entry__.oracle_sql().

Every function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
column names AND value rounding match the oracle SQL exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from prosearch_ray.pipelines.common import read, sql_round
from prosearch_ray.state.broadcast import bget, bput

# Seeds for the zero-crawl backfill (J6 analog — the reference left-extends
# stats with seed hosts that have no crawled pages,
# StatisticsHttpHandler.java:97-114). src90/src91 never occur in testdata.
SEED_SOURCES = [f"src{i}" for i in range(20)] + ["src90", "src91"]


def stats_rollup(sf_dir: str) -> "rd.Dataset":
    """Per-source page count + total bytes, ordered desc — the /stats/ page
    rollup (A2; StatisticsHttpHandler.java:33-45)."""
    docs = read(sf_dir, "documents", columns=["source", "n_chars"])
    agg = docs.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="total_chars"),
    ).sort(key=["n_docs", "source"], descending=[True, False])
    return agg.map_batches(
        lambda t: pa.table({
            "source": t.column("source"),
            "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
            "total_chars": pc.cast(t.column("total_chars"), pa.int64()),
        }),
        batch_format="pyarrow")


def per_lang_count(sf_dir: str) -> "rd.Dataset":
    """Content-type gate analog (M3; Manager.java:319-330): accept only a
    fixed lang set, count per lang (A1)."""
    accepted = pa.array(["en", "de", "fr"])
    docs = read(sf_dir, "documents", columns=["lang"])
    docs = docs.map_batches(
        lambda t: t.filter(pc.is_in(t.column("lang"), value_set=accepted)),
        batch_format="pyarrow")
    return docs.groupby("lang").aggregate(Count(alias_name="n_docs"))


def distinct_sources(sf_dir: str) -> pa.Table:
    """Distinct queued hosts analog (A3; JdbcStoreEngine.java:343-353)."""
    vals = sorted(read(sf_dir, "documents", columns=["source"]).unique("source"))
    return pa.table({"source": pa.array(vals, pa.string())})


def seed_backfill(sf_dir: str) -> pa.Table:
    """LEFT-extend per-source stats with seed sources having zero docs (J6).
    Small-side broadcast instead of a shuffle join."""
    counts = read(sf_dir, "documents", columns=["source"]).groupby(
        "source").aggregate(Count(alias_name="n_docs"))
    got = {r["source"]: r["n_docs"] for r in counts.take_all()}
    return pa.table({
        "source": pa.array(SEED_SOURCES, pa.string()),
        "n_docs": pa.array([int(got.get(s, 0)) for s in SEED_SOURCES], pa.int64()),
    })


def upsert_last_wins(sf_dir: str, n_buckets: int = 256) -> "rd.Dataset":
    """Last-write-wins per key (D3; TantivyCommitter delete-then-insert):
    per customer keep the latest order by (o_orderdate, o_orderkey).

    Scale shape: map-side per-batch winners first (one candidate row per
    key per batch), then a BOUNDED ``hash(key) % n_buckets`` exchange with
    one vectorized last-per-key pass per bucket — never a Python UDF call
    per key (key count is unbounded; bucket count is not)."""
    from prosearch_ray.pipelines.dedup import _mix64

    orders = read(sf_dir, "orders",
                  columns=["o_custkey", "o_orderkey", "o_orderdate"])
    nb = np.uint64(n_buckets)

    def _last_per_key(t: pa.Table) -> pa.Table:
        cust = t.column("o_custkey").to_numpy()
        dates = t.column("o_orderdate").to_numpy()
        keys = t.column("o_orderkey").to_numpy()
        order = np.lexsort((keys, dates, cust))
        c_s = cust[order]
        last = np.concatenate((c_s[1:] != c_s[:-1], [True]))
        idx = order[last]
        return pa.table({
            "o_custkey": pa.array(cust[idx]),
            "o_orderkey": pa.array(keys[idx]),
            "o_orderdate": pa.array(dates[idx]),
        })

    def combine(t: pa.Table) -> pa.Table:
        t = _last_per_key(t)
        return t.append_column(
            "bkt", pa.array((_mix64(
                t.column("o_custkey").to_numpy().astype(np.int64)) % nb
            ).astype(np.int64), pa.int64()))

    def bucket_last(g: pa.Table) -> pa.Table:
        return _last_per_key(g).select(["o_custkey", "o_orderkey"])

    return orders.map_batches(combine, batch_format="pyarrow").groupby(
        "bkt").map_groups(bucket_last, batch_format="pyarrow")


def tpch_q1(sf_dir: str) -> "rd.Dataset":
    """Pricing-summary aggregate over lineitem (the classic groupby shape;
    exercises partial->final aggregation and multi-key sort)."""
    li = read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_linestatus", "l_quantity",
                       "l_extendedprice", "l_discount", "l_shipdate"])

    def prep_partial(t: pa.Table) -> pa.Table:
        """Map-side combiner: filter + derive, then collapse the batch to at
        most one row per (returnflag, linestatus) — only tiny partials reach
        the shuffle, and Mean decomposes into (sum, count).

        Money is summed in INTEGER CENTS: the source columns are 2-decimal
        fixed-point stored as doubles, and a double summation of ~1e9
        magnitudes over 1e6+ rows accumulates more than a cent of
        order-dependent error — `round(sum, 2)` then depends on which
        engine summed in which order (observed as a real sf0.1 mismatch vs
        DuckDB).  Integer sums are associative, so any partial/shuffle
        order and any scale give THE answer; `disc_price` uses cents ×
        (100 - discount_cents), exact with denominator 10^4."""
        t = t.filter(pc.less(t.column("l_shipdate"),
                             pa.scalar(np.datetime64("1998-09-03", "us"))))
        i64 = pa.int64()
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), pa.scalar(100.0))), i64)
        disc_c = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), pa.scalar(100.0))), i64)
        qty_c = pc.cast(pc.round(t.column("l_quantity")), i64)
        disc_price_e4 = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, type=i64), disc_c))
        flat = pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "l_quantity": qty_c,
            "l_extendedprice": price_c,
            "disc_price": disc_price_e4,
            "l_discount": disc_c,
        })
        part = pa.TableGroupBy(
            flat, ["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_discount", "sum"),
             ("l_discount", "count")])
        return part.rename_columns(
            ["l_returnflag", "l_linestatus", "qty_p", "base_p", "disc_p",
             "discount_p", "n_p"])

    # partials are a handful of rows per batch: a single-partition final
    # groupby is free and keeps Ray's aggregate from emitting the empty
    # schema-less blocks that trip the executor's schema-mismatch warning
    agg = li.map_batches(prep_partial, batch_format="pyarrow").repartition(
        1).groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_p", alias_name="sum_qty"),
        Sum("base_p", alias_name="sum_base_price"),
        Sum("disc_p", alias_name="sum_disc_price"),
        Sum("discount_p", alias_name="sum_discount"),
        Sum("n_p", alias_name="count_order"),
    )

    def round_cols(t: pa.Table) -> pa.Table:
        """Finalize: exact integer sums -> decimal output.  Each division is
        a SINGLE double op on an exactly-represented integer, mirrored
        verbatim in the SQL oracle, so both sides produce bit-identical
        doubles at any scale."""
        n = t.column("count_order").to_numpy().astype(np.float64)
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "sum_qty": pa.array(sql_round(
                t.column("sum_qty").to_numpy().astype(np.float64), 2)),
            "sum_base_price": pa.array(sql_round(
                t.column("sum_base_price").to_numpy() / 100.0, 2)),
            "sum_disc_price": pa.array(sql_round(
                t.column("sum_disc_price").to_numpy() / 10000.0, 2)),
            "avg_disc": pa.array(sql_round(
                (t.column("sum_discount").to_numpy() / 100.0) / n, 4)),
            "count_order": pc.cast(t.column("count_order"), pa.int64()),
        })

    return agg.map_batches(round_cols, batch_format="pyarrow")


def union_counts(sf_dir: str) -> "rd.Dataset":
    """Union of two keyed sources then group-count (J4/D5 analog —
    queued ∪ domain_stats count restore, Manager.java:209-229)."""
    cust = read(sf_dir, "customer", columns=["c_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": pc.cast(t.column("c_nationkey"), pa.int64())}),
        batch_format="pyarrow")
    supp = read(sf_dir, "supplier", columns=["s_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": pc.cast(t.column("s_nationkey"), pa.int64())}),
        batch_format="pyarrow")
    return cust.union(supp).groupby("nationkey").aggregate(
        Count(alias_name="n_members"))


def topk_orders(sf_dir: str) -> pa.Table:
    """Global top-k by value with deterministic tie-break (T1/T3 shape):
    per-batch local prune -> tiny global sort (never a full global sort)."""
    k = 10
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def local_topk(t: pa.Table) -> pa.Table:
        price = t.column("o_totalprice").to_numpy()
        keys = t.column("o_orderkey").to_numpy()
        order = np.lexsort((keys, -price))[:k]
        return pa.table({"o_orderkey": pa.array(keys[order]),
                         "o_totalprice": pa.array(price[order])})

    cand = orders.map_batches(local_topk, batch_format="pyarrow").take_all()
    keys = np.array([r["o_orderkey"] for r in cand])
    price = np.array([r["o_totalprice"] for r in cand])
    order = np.lexsort((keys, -price))[:k]
    return pa.table({
        "o_orderkey": pa.array(keys[order], pa.int64()),
        "o_totalprice": pa.array(sql_round(price[order], 2), pa.float64()),
    })


def doc_length_measure(sf_dir: str) -> "rd.Dataset":
    """Indexed-length measure (M6; serve.rs:495-501): recompute utf8 length
    per doc and keep docs where it matches the stored n_chars."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        ln = pc.cast(pc.utf8_length(t.column("text")), pa.int64())
        return pa.table({
            "doc_id": t.column("doc_id"),
            "len_text": ln,
            "matches_stored": pc.equal(ln, t.column("n_chars")),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


# broadcast the dimension side of a hash join while it is this many rows;
# above it the join runs as a bounded-bucket co-group shuffle (a corpus-scale
# "dimension" re-broadcast per worker is the classic scale failure)
JOIN_BCAST_MAX_DIM_ROWS = 5_000_000


def join_orders_customers(sf_dir: str,
                          bcast_max: int = JOIN_BCAST_MAX_DIM_ROWS,
                          n_buckets: int = 64) -> "rd.Dataset":
    """Dimension join: order count + revenue per customer market segment.

    Below ``bcast_max`` dimension rows: broadcast hash join (dimension side
    shipped once via ray.put, vectorized index_in probe per batch — never a
    shuffle).  Above it: ONE bounded-bucket co-group exchange on
    hash(custkey) % n_buckets with per-bucket PARTIAL per-segment
    aggregation, so the exchange emits segment-count rows, not order rows."""
    cust_ds = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    if cust_ds.count() <= bcast_max:
        cust = cust_ds.take_all()
        keys_pa = pa.array([r["c_custkey"] for r in cust], pa.int64())
        segs_pa = pa.array([r["c_mktsegment"] for r in cust], pa.string())
        ref = bput((keys_pa, segs_pa))

        def attach(t: pa.Table) -> pa.Table:
            keys, segs = bget(ref)
            # vectorized probe: index_in yields null positions for misses,
            # which take() propagates to null segments — no per-row Python
            pos = pc.index_in(t.column("o_custkey"), value_set=keys)
            out = pa.table({
                "segment": segs.take(pos),
                "o_totalprice": t.column("o_totalprice"),
            })
            return out.filter(pc.is_valid(out.column("segment")))

        probed = orders.map_batches(attach, batch_format="pyarrow")
        agg = probed.groupby("segment").aggregate(
            Count(alias_name="n_orders"),
            Sum("o_totalprice", alias_name="revenue"))
    else:
        from prosearch_ray.pipelines.dedup import _mix64

        nb = np.uint64(n_buckets)

        def order_rows(t: pa.Table) -> pa.Table:
            k = pc.cast(t.column("o_custkey"), pa.int64()).to_numpy()
            return pa.table({
                "bkt": pa.array((_mix64(k) % nb).astype(np.int64), pa.int64()),
                "kind": pa.array(np.ones(len(k), np.int8), pa.int8()),
                "key": pa.array(k, pa.int64()),
                "price": pc.cast(t.column("o_totalprice"), pa.float64()),
                "segment": pa.array([None] * len(k), pa.string()),
            })

        def cust_rows(t: pa.Table) -> pa.Table:
            k = pc.cast(t.column("c_custkey"), pa.int64()).to_numpy()
            return pa.table({
                "bkt": pa.array((_mix64(k) % nb).astype(np.int64), pa.int64()),
                "kind": pa.array(np.zeros(len(k), np.int8), pa.int8()),
                "key": pa.array(k, pa.int64()),
                "price": pa.array(np.zeros(len(k)), pa.float64()),
                "segment": pc.cast(t.column("c_mktsegment"), pa.string()),
            })

        def join_bucket(g: pa.Table) -> pa.Table:
            """searchsorted dimension probe + per-segment partials — the
            bucket emits one row per segment, never per order."""
            kind = g.column("kind").to_numpy()
            key = g.column("key").to_numpy()
            dm = kind == 0
            dk = key[dm]
            seg = g.column("segment").combine_chunks()
            dseg = seg.filter(pa.array(dm)).dictionary_encode()
            order = np.argsort(dk)
            dk_s = dk[order]
            code_s = dseg.indices.to_numpy().astype(np.int64)[order]
            ok = key[~dm]
            price = g.column("price").to_numpy()[~dm]
            if not len(dk_s) or not len(ok):
                return pa.table({"segment": pa.array([], pa.string()),
                                 "n_part": pa.array([], pa.int64()),
                                 "rev_part": pa.array([], pa.float64())})
            pos = np.searchsorted(dk_s, ok)
            pos_c = np.minimum(pos, len(dk_s) - 1)
            hit = dk_s[pos_c] == ok
            codes = code_s[pos_c[hit]]
            nseg = len(dseg.dictionary)
            n_part = np.bincount(codes, minlength=nseg)
            rev_part = np.bincount(codes, weights=price[hit], minlength=nseg)
            nz = n_part > 0
            return pa.table({
                "segment": dseg.dictionary.take(
                    pa.array(np.flatnonzero(nz), pa.int64())),
                "n_part": pa.array(n_part[nz], pa.int64()),
                "rev_part": pa.array(rev_part[nz], pa.float64()),
            })

        parts = orders.map_batches(order_rows, batch_format="pyarrow").union(
            cust_ds.map_batches(cust_rows, batch_format="pyarrow")).groupby(
            "bkt").map_groups(join_bucket, batch_format="pyarrow")
        agg = parts.groupby("segment").aggregate(
            Sum("n_part", alias_name="n_orders"),
            Sum("rev_part", alias_name="revenue"))

    def round_rev(t: pa.Table) -> pa.Table:
        return pa.table({
            "segment": t.column("segment"),
            "n_orders": pc.cast(t.column("n_orders"), pa.int64()),
            "revenue": pa.array(sql_round(t.column("revenue").to_numpy(), 2)),
        })

    return agg.map_batches(round_rev, batch_format="pyarrow")


def tpch_q5(sf_dir: str, region_name: str = "ASIA",
            date_lo: str = "1996-01-01", date_hi: str = "1997-01-01",
            bcast_max: int = JOIN_BCAST_MAX_DIM_ROWS,
            n_buckets: int = 64) -> "rd.Dataset":
    """TPC-H Q5 analog: revenue per nation for one region + order-date year,
    requiring supplier nation == customer nation — the multi-join rollup
    shape (A6 family; the reference's crawl-state queries never exceed two
    tables, so this is the engine's big-join showcase).

    Scale plan (100 TB): nation/region are constant-size -> driver dicts;
    supplier -> broadcast (suppkey, nationkey) arrays via ray.put (TPC-H
    supplier is 10k rows/SF — at sizes beyond ``bcast_max`` it would take
    the same bucketed fallback customer uses); customer⋈orders follows
    ``join_orders_customers``'s dual path (broadcast below ``bcast_max``,
    else ONE bounded-bucket co-group on hash(custkey)); the only
    unavoidably big-big exchange — lineitem⋈orders — is ONE co-group on
    hash(orderkey) % n_buckets whose buckets emit per-nation PARTIAL
    revenue rows (never joined line rows).  Money is exact integer 1e-4
    dollars end-to-end (see tpch_q1's rationale); partial sums use int64
    np.add.at, immune to float order-dependence at any scale."""
    from prosearch_ray.pipelines.dedup import _mix64

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    nation = read(sf_dir, "nation").take_all()
    region = read(sf_dir, "region").take_all()
    rkeys = {r["r_regionkey"] for r in region if r["r_name"] == region_name}
    nat_name = {int(r["n_nationkey"]): r["n_name"] for r in nation
                if r["n_regionkey"] in rkeys}
    in_region = pa.array(sorted(nat_name), pa.int64())

    supp = read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).take_all()
    sk = pa.array([int(r["s_suppkey"]) for r in supp], pa.int64())
    sn = pa.array([int(r["s_nationkey"]) for r in supp], pa.int64())
    supp_ref = bput((sk, sn, in_region))

    nb = np.uint64(n_buckets)
    orders = read(sf_dir, "orders",
                  columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cust_ds = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    # ---- phase 1: orders (date-filtered) -> (o_orderkey, cust nationkey),
    # customers restricted to the region ----
    if cust_ds.count() <= bcast_max:
        cust = cust_ds.take_all()
        ck = pa.array([int(r["c_custkey"]) for r in cust], pa.int64())
        cn = pa.array([int(r["c_nationkey"]) for r in cust], pa.int64())
        cust_ref = bput((ck, cn, in_region))

        def order_nat(t: pa.Table) -> pa.Table:
            ckeys, cnats, reg = bget(cust_ref)
            d = t.column("o_orderdate")
            t = t.filter(pc.and_(pc.greater_equal(d, pa.scalar(lo)),
                                 pc.less(d, pa.scalar(hi))))
            pos = pc.index_in(pc.cast(t.column("o_custkey"), pa.int64()),
                              value_set=ckeys)
            nat = cnats.take(pos)
            keep = pc.and_(pc.is_valid(nat), pc.is_in(nat, value_set=reg))
            return pa.table({
                "okey": pc.cast(t.column("o_orderkey"),
                                pa.int64()).filter(keep),
                "nat": nat.filter(keep)})

        onat = orders.map_batches(order_nat, batch_format="pyarrow")
    else:
        def o_rows(t: pa.Table) -> pa.Table:
            d = t.column("o_orderdate")
            t = t.filter(pc.and_(pc.greater_equal(d, pa.scalar(lo)),
                                 pc.less(d, pa.scalar(hi))))
            k = pc.cast(t.column("o_custkey"), pa.int64()).to_numpy()
            return pa.table({
                "bkt": pa.array((_mix64(k) % nb).astype(np.int64), pa.int64()),
                "kind": pa.array(np.ones(len(k), np.int8), pa.int8()),
                "key": pa.array(k, pa.int64()),
                "val": pc.cast(t.column("o_orderkey"), pa.int64())})

        reg_set = in_region

        def c_rows(t: pa.Table) -> pa.Table:
            nat = pc.cast(t.column("c_nationkey"), pa.int64())
            keep = pc.is_in(nat, value_set=reg_set)
            t = t.filter(keep)
            k = pc.cast(t.column("c_custkey"), pa.int64()).to_numpy()
            return pa.table({
                "bkt": pa.array((_mix64(k) % nb).astype(np.int64), pa.int64()),
                "kind": pa.array(np.zeros(len(k), np.int8), pa.int8()),
                "key": pa.array(k, pa.int64()),
                "val": pc.cast(t.column("c_nationkey"), pa.int64())})

        def cust_bucket(g: pa.Table) -> pa.Table:
            kind = g.column("kind").to_numpy()
            key = g.column("key").to_numpy()
            val = g.column("val").to_numpy()
            dm = kind == 0
            dk, dn = key[dm], val[dm]
            order = np.argsort(dk)
            dk_s, dn_s = dk[order], dn[order]
            ok, okey = key[~dm], val[~dm]
            if not len(dk_s) or not len(ok):
                return pa.table({"okey": pa.array([], pa.int64()),
                                 "nat": pa.array([], pa.int64())})
            pos = np.searchsorted(dk_s, ok)
            pos_c = np.minimum(pos, len(dk_s) - 1)
            hit = dk_s[pos_c] == ok
            return pa.table({
                "okey": pa.array(okey[hit], pa.int64()),
                "nat": pa.array(dn_s[pos_c[hit]], pa.int64())})

        onat = orders.map_batches(o_rows, batch_format="pyarrow").union(
            cust_ds.map_batches(c_rows, batch_format="pyarrow")).groupby(
            "bkt").map_groups(cust_bucket, batch_format="pyarrow")

    # ---- phase 2: the big-big co-group on hash(orderkey) ----
    def li_rows(t: pa.Table) -> pa.Table:
        skeys, snats, reg = bget(supp_ref)
        pos = pc.index_in(pc.cast(t.column("l_suppkey"), pa.int64()),
                          value_set=skeys)
        nat = snats.take(pos)
        keep = pc.and_(pc.is_valid(nat), pc.is_in(nat, value_set=reg))
        t = t.filter(keep)
        nat = nat.filter(keep)
        i64 = pa.int64()
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), pa.scalar(100.0))), i64)
        disc_c = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), pa.scalar(100.0))), i64)
        rev_e4 = pc.multiply(price_c,
                             pc.subtract(pa.scalar(100, type=i64), disc_c))
        k = pc.cast(t.column("l_orderkey"), pa.int64()).to_numpy()
        return pa.table({
            "bkt": pa.array((_mix64(k) % nb).astype(np.int64), pa.int64()),
            "kind": pa.array(np.ones(len(k), np.int8), pa.int8()),
            "key": pa.array(k, pa.int64()),
            "nat": nat,
            "rev": rev_e4})

    def onat_rows(t: pa.Table) -> pa.Table:
        k = t.column("okey").to_numpy()
        return pa.table({
            "bkt": pa.array((_mix64(k.astype(np.int64)) % nb
                             ).astype(np.int64), pa.int64()),
            "kind": pa.array(np.zeros(len(k), np.int8), pa.int8()),
            "key": pa.array(k, pa.int64()),
            "nat": t.column("nat"),
            "rev": pa.array(np.zeros(len(k), np.int64), pa.int64())})

    def rev_bucket(g: pa.Table) -> pa.Table:
        """Per-nation int64 revenue partials — one row per nation per
        bucket, never a joined line row."""
        kind = g.column("kind").to_numpy()
        key = g.column("key").to_numpy()
        nat = g.column("nat").to_numpy()
        om = kind == 0
        ok, onatv = key[om], nat[om]
        lk, lnat = key[~om], nat[~om]
        lrev = g.column("rev").to_numpy()[~om]
        if not len(ok) or not len(lk):
            return pa.table({"nationkey": pa.array([], pa.int64()),
                             "rev_p": pa.array([], pa.int64())})
        order = np.argsort(ok)
        ok_s, onat_s = ok[order], onatv[order]
        pos = np.searchsorted(ok_s, lk)
        pos_c = np.minimum(pos, len(ok_s) - 1)
        hit = (ok_s[pos_c] == lk) & (onat_s[pos_c] == lnat)
        nk = lnat[hit]
        un, inv = np.unique(nk, return_inverse=True)
        sums = np.zeros(len(un), np.int64)
        np.add.at(sums, inv, lrev[hit])
        return pa.table({"nationkey": pa.array(un, pa.int64()),
                         "rev_p": pa.array(sums, pa.int64())})

    li = read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                       "l_discount"])
    parts = li.map_batches(li_rows, batch_format="pyarrow").union(
        onat.map_batches(onat_rows, batch_format="pyarrow")).groupby(
        "bkt").map_groups(rev_bucket, batch_format="pyarrow")
    agg = parts.groupby("nationkey").aggregate(
        Sum("rev_p", alias_name="rev_e4"))

    def fin(t: pa.Table) -> pa.Table:
        keys = t.column("nationkey").to_pylist()  # <= 25 rows
        return pa.table({
            "n_name": pa.array([nat_name[int(k)] for k in keys], pa.string()),
            "revenue": pa.array(sql_round(
                t.column("rev_e4").to_numpy() / 10000.0, 2), pa.float64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def _finest_flag_status(sf_dir: str) -> pa.Table:
    """Shared grouping-sets kernel: the FINEST-level (l_returnflag,
    l_linestatus) aggregate over lineitem in ONE corpus pass — map-side
    partials (a handful of rows per batch), one tiny shuffle.  Every
    coarser grouping level of ROLLUP/CUBE is DERIVED from this table,
    never a second fact-table scan per level (the naive multi-level plan
    reads the fact table once per grouping set; at 100 TB that is L extra
    scans).  Quantity sums in exact int64."""
    li = read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        flat = pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty": pc.cast(pc.round(t.column("l_quantity")), pa.int64()),
        })
        part = pa.TableGroupBy(
            flat, ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("qty", "count")])
        return part.rename_columns(
            ["l_returnflag", "l_linestatus", "qty_p", "n_p"])

    finest = li.map_batches(partial, batch_format="pyarrow").repartition(
        1).groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_p", alias_name="sum_qty"),
        Sum("n_p", alias_name="n_rows"))
    f = pa.concat_tables(list(finest.iter_batches(
        batch_format="pyarrow")))  # grouping-domain-sized: a few rows
    return pa.table({"l_returnflag": pc.cast(f.column("l_returnflag"),
                                             pa.string()),
                     "l_linestatus": pc.cast(f.column("l_linestatus"),
                                             pa.string()),
                     "sum_qty": pc.cast(f.column("sum_qty"), pa.int64()),
                     "n_rows": pc.cast(f.column("n_rows"), pa.int64())})


def _coarsen(f: pa.Table, keep_key: str | None) -> pa.Table:
    """Derive one coarser grouping level from the finest aggregate: group
    by ``keep_key`` (or nothing, for the grand total); rolled-up key
    positions emit 'ALL' (mirrored by coalesce in the oracles)."""
    cols = ["l_returnflag", "l_linestatus"]
    if keep_key is None:
        return pa.table({
            "l_returnflag": pa.array(["ALL"], pa.string()),
            "l_linestatus": pa.array(["ALL"], pa.string()),
            "sum_qty": pa.array([pc.sum(f.column("sum_qty")).as_py()],
                                pa.int64()),
            "n_rows": pa.array([pc.sum(f.column("n_rows")).as_py()],
                               pa.int64())})
    g = pa.TableGroupBy(f, keep_key).aggregate(
        [("sum_qty", "sum"), ("n_rows", "sum")]).rename_columns(
        [keep_key, "sum_qty", "n_rows"])
    out = {}
    for c in cols:
        out[c] = (g.column(keep_key) if c == keep_key
                  else pa.array(["ALL"] * g.num_rows, pa.string()))
    out["sum_qty"] = pc.cast(g.column("sum_qty"), pa.int64())
    out["n_rows"] = pc.cast(g.column("n_rows"), pa.int64())
    return pa.table(out)


def rollup_aggregate(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): grouping sets
    {(flag,status), (flag), ()}, all derived from ONE finest-level corpus
    pass (see _finest_flag_status)."""
    f = _finest_flag_status(sf_dir)
    return pa.concat_tables(
        [f, _coarsen(f, "l_returnflag"), _coarsen(f, None)]).sort_by(
        [("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


def cube_aggregate(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE(l_returnflag, l_linestatus): all four grouping sets
    {(flag,status), (flag), (status), ()}, derived from the SAME single
    finest-level pass — the one-scan grouping-sets plan at any scale."""
    f = _finest_flag_status(sf_dir)
    return pa.concat_tables(
        [f, _coarsen(f, "l_returnflag"), _coarsen(f, "l_linestatus"),
         _coarsen(f, None)]).sort_by(
        [("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


def moving_window_sum(sf_dir: str, frame: int = 3, n_buckets: int = 256
                      ) -> "rd.Dataset":
    """Frame-based moving window per user over the events stream —
    ``SUM(value) OVER (PARTITION BY user ORDER BY ts ROWS BETWEEN
    frame PRECEDING AND CURRENT ROW)``, the rolling-metric shape every
    event pipeline needs (the windowed-RANK analog `topk_per_group`
    covers ranking; this covers sliding frames).

    Scale plan: ONE bounded ``hash(user) % n_buckets`` exchange (never a
    group per user); inside each bucket the frame sum is vectorized
    shifted adds over the lexsorted segment layout — no per-row Python,
    no full sort of the stream.  Sums are exact integer cents (value is
    2-decimal fixed-point; see tpch_q1's rationale), so the result is
    order-independent and hash-comparable at any scale."""
    from prosearch_ray.pipelines.dedup import _mix64

    ev = read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "value"])
    nb = np.uint64(n_buckets)

    def tag(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        return t.append_column(
            "bkt", pa.array((_mix64(u.astype(np.int64)) % nb
                             ).astype(np.int64), pa.int64()))

    def bucket(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy()
        ts = g.column("ts").to_numpy().astype("datetime64[us]"
                                              ).astype(np.int64)
        eid = g.column("event_id").to_numpy()
        v = np.round(g.column("value").to_numpy() * 100.0).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        us, vs, es = u[order], v[order], eid[order]
        starts = np.flatnonzero(np.concatenate(([True], us[1:] != us[:-1])))
        sizes = np.diff(np.append(starts, len(us)))
        rel = np.arange(len(us)) - np.repeat(starts, sizes)
        s = vs.copy()
        for k in range(1, frame + 1):
            m = rel >= k  # i-k stays inside i's user segment
            s[m] += vs[np.flatnonzero(m) - k]
        return pa.table({
            "event_id": pa.array(es, pa.int64()),
            "user_id": pa.array(us, pa.int64()),
            "mov_sum_cents": pa.array(s, pa.int64()),
            "n_window": pa.array(np.minimum(rel + 1, frame + 1), pa.int64()),
        })

    return ev.map_batches(tag, batch_format="pyarrow").groupby(
        "bkt").map_groups(bucket, batch_format="pyarrow")


def small_qty_revenue(sf_dir: str,
                      bcast_max: int = JOIN_BCAST_MAX_DIM_ROWS,
                      n_buckets: int = 64) -> "rd.Dataset":
    """TPC-H Q17 analog: per-brand revenue from lineitems whose quantity
    is below 20% of that PART's average quantity — the aggregate-then-
    rejoin-the-fact-table shape (a correlated subquery in SQL).

    Scale plan (100 TB): pass 1 computes per-part (sum_qty, cnt) via
    map-side partials + one part-domain groupby; the 0.2×avg comparison
    is EXACT integer math (qty·5·cnt < sum_qty — l_quantity is integral),
    so no float threshold is ever materialized.  Pass 2 re-probes
    lineitem: below ``bcast_max`` parts the threshold+brand arrays are
    broadcast once via ray.put; above it the probe is ONE bounded-bucket
    co-group on hash(partkey) % n_buckets over three tagged streams
    (thresholds ∪ part brands ∪ lineitem rows) whose buckets emit
    per-brand int64-cents PARTIALS, never joined line rows.  Both paths
    are pytest-pinned equal."""
    from prosearch_ray.pipelines.dedup import _mix64

    li = read(sf_dir, "lineitem",
              columns=["l_partkey", "l_quantity", "l_extendedprice"])
    part_ds = read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def thr_partial(t: pa.Table) -> pa.Table:
        flat = pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "qty": pc.cast(pc.round(t.column("l_quantity")), pa.int64()),
        })
        g = pa.TableGroupBy(flat, "l_partkey").aggregate(
            [("qty", "sum"), ("qty", "count")])
        return g.rename_columns(["l_partkey", "sq_p", "c_p"])

    thr = li.map_batches(thr_partial, batch_format="pyarrow").groupby(
        "l_partkey").aggregate(Sum("sq_p", alias_name="sq"),
                               Sum("c_p", alias_name="c"))

    def li_cols(t: pa.Table):
        k = pc.cast(t.column("l_partkey"), pa.int64()).to_numpy()
        q = pc.cast(pc.round(t.column("l_quantity")), pa.int64()).to_numpy()
        p = np.round(t.column("l_extendedprice").to_numpy() * 100.0
                     ).astype(np.int64)
        return k, q, p

    if part_ds.count() <= bcast_max:
        # broadcast path: sorted partkey -> (sq, c, brand) arrays, ONE
        # ray.put, probed by searchsorted in every lineitem batch
        tt = pa.concat_tables(list(thr.iter_batches(batch_format="pyarrow")))
        tt = tt.sort_by([("l_partkey", "ascending")])
        pt = pa.concat_tables(list(
            part_ds.iter_batches(batch_format="pyarrow")))
        pt = pt.sort_by([("p_partkey", "ascending")])
        ref = bput((tt.column("l_partkey").to_numpy(),
                    tt.column("sq").to_numpy().astype(np.int64),
                    tt.column("c").to_numpy().astype(np.int64),
                    pt.column("p_partkey").to_numpy(),
                    pt.column("p_brand").to_numpy(zero_copy_only=False)))

        def probe(t: pa.Table) -> pa.Table:
            tk, sq, c, pk, br = bget(ref)
            k, q, p = li_cols(t)
            pos = np.searchsorted(tk, k)  # every partkey exists in thr
            keep = q * 5 * c[pos] < sq[pos]
            k, p = k[keep], p[keep]
            bpos = np.searchsorted(pk, k)
            hit = (bpos < len(pk)) & (pk[np.minimum(bpos, len(pk) - 1)] == k)
            brand = br[np.minimum(bpos, len(pk) - 1)][hit]
            un, inv = np.unique(brand, return_inverse=True)
            rev = np.zeros(len(un), np.int64)
            np.add.at(rev, inv, p[hit])
            n = np.bincount(inv, minlength=len(un)).astype(np.int64)
            return pa.table({"p_brand": pa.array(un, pa.string()),
                             "rev_p": pa.array(rev, pa.int64()),
                             "n_p": pa.array(n, pa.int64())})

        parts = li.map_batches(probe, batch_format="pyarrow")
    else:
        nb = np.uint64(n_buckets)

        def _bkt(k: np.ndarray) -> pa.Array:
            return pa.array((_mix64(k.astype(np.int64)) % nb
                             ).astype(np.int64), pa.int64())

        def thr_rows(t: pa.Table) -> pa.Table:
            k = pc.cast(t.column("l_partkey"), pa.int64()).to_numpy()
            return pa.table({
                "bkt": _bkt(k), "kind": pa.array(
                    np.zeros(len(k), np.int8), pa.int8()),
                "key": pa.array(k, pa.int64()),
                "a": pc.cast(t.column("sq"), pa.int64()),
                "b": pc.cast(t.column("c"), pa.int64()),
                "brand": pa.array([None] * len(k), pa.string())})

        def part_rows(t: pa.Table) -> pa.Table:
            k = pc.cast(t.column("p_partkey"), pa.int64()).to_numpy()
            z = pa.array(np.zeros(len(k), np.int64), pa.int64())
            return pa.table({
                "bkt": _bkt(k), "kind": pa.array(
                    np.ones(len(k), np.int8), pa.int8()),
                "key": pa.array(k, pa.int64()), "a": z, "b": z,
                "brand": pc.cast(t.column("p_brand"), pa.string())})

        def li_rows(t: pa.Table) -> pa.Table:
            k, q, p = li_cols(t)
            return pa.table({
                "bkt": _bkt(k), "kind": pa.array(
                    np.full(len(k), 2, np.int8), pa.int8()),
                "key": pa.array(k, pa.int64()),
                "a": pa.array(q, pa.int64()), "b": pa.array(p, pa.int64()),
                "brand": pa.array([None] * len(k), pa.string())})

        def probe_bucket(g: pa.Table) -> pa.Table:
            kind = g.column("kind").to_numpy()
            key = g.column("key").to_numpy()
            a = g.column("a").to_numpy()
            b = g.column("b").to_numpy()
            tm, pm, lm = kind == 0, kind == 1, kind == 2
            if not lm.any() or not tm.any():
                return pa.table({"p_brand": pa.array([], pa.string()),
                                 "rev_p": pa.array([], pa.int64()),
                                 "n_p": pa.array([], pa.int64())})
            to = np.argsort(key[tm])
            tk, sq, c = key[tm][to], a[tm][to], b[tm][to]
            po = np.argsort(key[pm])
            pk = key[pm][po]
            br = g.column("brand").to_numpy(zero_copy_only=False)[pm][po]
            k, q, p = key[lm], a[lm], b[lm]
            pos = np.minimum(np.searchsorted(tk, k), len(tk) - 1)
            keep = (tk[pos] == k) & (q * 5 * c[pos] < sq[pos])
            k, p = k[keep], p[keep]
            if len(pk):
                bpos = np.minimum(np.searchsorted(pk, k), len(pk) - 1)
                hit = pk[bpos] == k
            else:
                bpos = np.zeros(len(k), np.int64)
                hit = np.zeros(len(k), bool)
            brand = br[bpos][hit]
            un, inv = np.unique(brand, return_inverse=True)
            rev = np.zeros(len(un), np.int64)
            np.add.at(rev, inv, p[hit])
            n = np.bincount(inv, minlength=len(un)).astype(np.int64)
            return pa.table({"p_brand": pa.array(un, pa.string()),
                             "rev_p": pa.array(rev, pa.int64()),
                             "n_p": pa.array(n, pa.int64())})

        parts = thr.map_batches(thr_rows, batch_format="pyarrow").union(
            part_ds.map_batches(part_rows, batch_format="pyarrow"),
            li.map_batches(li_rows, batch_format="pyarrow")).groupby(
            "bkt").map_groups(probe_bucket, batch_format="pyarrow")

    agg = parts.groupby("p_brand").aggregate(
        Sum("rev_p", alias_name="rev_c"), Sum("n_p", alias_name="n_items"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": t.column("p_brand"),
            "revenue": pa.array(sql_round(
                t.column("rev_c").to_numpy() / 100.0, 2), pa.float64()),
            "n_items": pc.cast(t.column("n_items"), pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def events_window_stats(sf_dir: str) -> "rd.Dataset":
    """Tumbling-window aggregate over the events stream table (streaming
    analog per guide: groupby key, window = floor(ts/1h)): per (event_type,
    hour) count + mean value."""
    ev = read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy()  # datetime64[us]
        hour = (ts.astype("datetime64[h]").astype("int64")).astype(np.int64)
        return pa.table({
            "event_type": t.column("event_type"),
            "hour_bucket": pa.array(hour, pa.int64()),
            "value": t.column("value"),
        })

    agg = ev.map_batches(add_window, batch_format="pyarrow").groupby(
        ["event_type", "hour_bucket"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "hour_bucket": t.column("hour_bucket"),
            "n_events": pc.cast(t.column("n_events"), pa.int64()),
            "sum_value": pa.array(sql_round(t.column("sum_value").to_numpy(), 4)),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def hopping_window_stats(sf_dir: str, size_hours: int = 2,
                         hop_hours: int = 1) -> "rd.Dataset":
    """Hopping (overlapping) window aggregate over the events stream —
    the last streaming window shape the suite needed (tumbling =
    events_window_stats, session = user_sessions, row frame =
    moving_window_sum): per (event_type, window_start) count + sum over
    windows of ``size_hours`` advancing every ``hop_hours``.

    Scale plan: each event replicates into its size/hop covering windows
    INSIDE the batch kernel and immediately collapses into per-batch
    (type, window) partials, so the only exchange carries
    grouping-domain-sized partial rows — never the replicated stream.
    Sums in exact integer cents (order-independent at any scale)."""
    if size_hours % hop_hours:
        raise ValueError("size_hours must be a multiple of hop_hours")
    k = size_hours // hop_hours
    ev = read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        eh = t.column("ts").to_numpy().astype("datetime64[h]"
                                              ).astype(np.int64)
        hop_idx = np.floor_divide(eh, hop_hours)
        cents = np.round(t.column("value").to_numpy() * 100.0
                         ).astype(np.int64)
        et = t.column("event_type")
        reps = [pa.table({
            "event_type": et,
            "window_start_hour": pa.array((hop_idx - i) * hop_hours,
                                          pa.int64()),
            "cents": pa.array(cents, pa.int64())}) for i in range(k)]
        g = pa.TableGroupBy(
            pa.concat_tables(reps),
            ["event_type", "window_start_hour"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return g.rename_columns(
            ["event_type", "window_start_hour", "c_p", "n_p"])

    agg = ev.map_batches(partial, batch_format="pyarrow").groupby(
        ["event_type", "window_start_hour"]).aggregate(
        Sum("c_p", alias_name="sum_cents"),
        Sum("n_p", alias_name="n_events"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "window_start_hour": pc.cast(t.column("window_start_hour"),
                                         pa.int64()),
            "n_events": pc.cast(t.column("n_events"), pa.int64()),
            "sum_cents": pc.cast(t.column("sum_cents"), pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def quota_filter(sf_dir: str, limit: int = 20) -> "rd.Dataset":
    """Per-key quota gate — the reference's per-host crawl limit
    (``per-host-crawling-limit`` default 10000; fast-reject M10/M11,
    Manager.java:151-160,336-345): keep only the first ``limit`` docs per
    source, ordered by doc_id.

    Scale pattern: per-batch LOCAL prune to ``limit`` per key first (so no
    group ever carries more than limit × n_batches rows into the shuffle —
    the combiner analog), then the exact per-group head after the groupby."""
    docs = read(sf_dir, "documents", columns=["source", "doc_id"])

    def local_prune(t: pa.Table) -> pa.Table:
        # Arrow/numpy per-key head: sort by (source, doc_id), then keep rows
        # whose rank within their source run is < limit
        t = t.sort_by([("source", "ascending"), ("doc_id", "ascending")])
        n = t.num_rows
        if not n:
            return t
        src = t.column("source").combine_chunks()
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = ~pc.equal(src.slice(1), src.slice(0, n - 1)).to_numpy(
            zero_copy_only=False)
        starts = np.flatnonzero(new_run)
        rank = np.arange(n) - starts[np.cumsum(new_run) - 1]
        return t.filter(pa.array(rank < limit))

    def head_per_group(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_id", "ascending")])
        return g.slice(0, limit)

    return docs.map_batches(local_prune, batch_format="pyarrow").groupby(
        "source").map_groups(head_per_group, batch_format="pyarrow")


def user_sessions(sf_dir: str, gap_minutes: int = 30,
                  n_buckets: int = 256) -> "rd.Dataset":
    """Sessionization over the events stream table (the streaming-shaped
    workload pattern: partition by key, sort by ts within the group, derive
    sessions from gaps > ``gap_minutes``): per user, number of sessions and
    events.

    Scale shape: the shuffle key is ``hash(user) % n_buckets`` — a BOUNDED
    group count — not the user id itself (per-user groups mean one Python
    UDF call per user: millions of calls at event-stream scale, the
    cross-shard-dedup lesson).  Each bucket resolves every contained user
    vectorized: one lexsort over (user, ts), session starts where the user
    changes or the gap exceeds the threshold, per-user rollup by
    ``reduceat``."""
    from prosearch_ray.pipelines.dedup import _mix64

    ev = read(sf_dir, "events", columns=["user_id", "ts"])
    gap_us = gap_minutes * 60 * 1_000_000
    nb = np.uint64(n_buckets)

    def tag(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        return t.append_column(
            "bkt", pa.array((_mix64(uid) % nb).astype(np.int64), pa.int64()))

    def bucket_sessions(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        if not len(uid):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        ts = g.column("ts").to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, uid))
        u, t2 = uid[order], ts[order]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gap = np.concatenate(([True], (t2[1:] - t2[:-1]) > gap_us))
        starts = np.flatnonzero(new_user)
        n_events = np.diff(np.append(starts, len(u)))
        n_sessions = np.add.reduceat(
            (new_user | gap).astype(np.int64), starts)
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "n_sessions": pa.array(n_sessions, pa.int64()),
            "n_events": pa.array(n_events, pa.int64()),
        })

    return ev.map_batches(tag, batch_format="pyarrow").groupby(
        "bkt").map_groups(bucket_sessions, batch_format="pyarrow")


def asof_last_event(sf_dir: str) -> "rd.Dataset":
    """As-of join — a custom operator Ray Data lacks natively: for every
    order, the latest event of that customer with ts <= o_orderdate
    (ties on ts broken by max event_id; -1 when no prior event).

    Pattern (per the guide): tag both sides, ONE co-grouping shuffle on
    ``hash(key) % n_buckets`` — a BOUNDED group count (per-key groups mean
    one Python UDF call per key at corpus scale) — then per-key segments
    resolve inside each bucket with the sorted searchsorted lookup."""
    from prosearch_ray.pipelines.dedup import _mix64

    orders = read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])
    events = read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    nb = np.uint64(256)

    def tag_orders(t: pa.Table) -> pa.Table:
        key = pc.cast(t.column("o_custkey"), pa.int64())
        return pa.table({
            "bkt": pa.array((_mix64(key.to_numpy()) % nb).astype(np.int64),
                            pa.int64()),
            "key": key,
            "kind": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
            "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
            "ts": pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
            "event_id": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
        })

    def tag_events(t: pa.Table) -> pa.Table:
        key = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "bkt": pa.array((_mix64(key.to_numpy()) % nb).astype(np.int64),
                            pa.int64()),
            "key": key,
            "kind": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
            "o_orderkey": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
            "ts": pc.cast(t.column("ts"), pa.timestamp("us")),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
        })

    both = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        events.map_batches(tag_events, batch_format="pyarrow"))

    def asof_bucket(g: pa.Table) -> pa.Table:
        """ONE vectorized pass over the whole bucket — no per-key Python
        loop: merge-sort both sides by (key, ts, events-first, event_id),
        then a grouped cummax of event row positions; stale positions from
        a previous key are detected against the key's segment start."""
        key = g.column("key").to_numpy()
        kind = g.column("kind").to_numpy()
        ts = g.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        okey = g.column("o_orderkey").to_numpy()
        evid = g.column("event_id").to_numpy()
        n = len(key)
        # events sort BEFORE orders at equal ts (ts <= o_orderdate is
        # inclusive); ascending event_id makes the nearest preceding event
        # row the max-id tiebreak winner
        order = np.lexsort((evid, 1 - kind, ts, key))
        key, kind, ts, okey, evid = (key[order], kind[order], ts[order],
                                     okey[order], evid[order])
        is_ev = kind == 1
        ev_pos = np.where(is_ev, np.arange(n), -1)
        last_pos = np.maximum.accumulate(ev_pos) if n else ev_pos
        new_key = np.concatenate(([True], key[1:] != key[:-1])) \
            if n else np.array([], bool)
        seg_start = np.flatnonzero(new_key)[np.cumsum(new_key) - 1] \
            if n else np.array([], np.int64)
        valid = last_pos >= seg_start  # cummax from an earlier key is stale
        last = np.where(valid, evid[np.clip(last_pos, 0, None)], -1)
        om = ~is_ev
        return pa.table({
            "o_orderkey": pa.array(okey[om], pa.int64()),
            "o_custkey": pa.array(key[om], pa.int64()),
            "last_event_id": pa.array(last[om], pa.int64()),
        })

    return both.groupby("bkt").map_groups(asof_bucket, batch_format="pyarrow")


def range_join_events(sf_dir: str, window_days: int = 7) -> "rd.Dataset":
    """Interval/range join — for every order, count and value-sum of that
    customer's events with ts in [o_orderdate, o_orderdate + window).

    Same bucketed shape as ``asof_last_event``: tag both sides, ONE
    co-grouping shuffle on ``hash(key) % n_buckets`` (bounded group count),
    per-key segments inside each bucket with two searchsorted probes per
    segment; sums come from one cumsum.  No all-pairs expansion, no
    driver-side materialization."""
    from prosearch_ray.pipelines.dedup import _mix64

    orders = read(sf_dir, "orders", columns=["o_custkey", "o_orderkey",
                                             "o_orderdate"])
    events = read(sf_dir, "events", columns=["user_id", "ts", "value"])
    window_us = np.int64(window_days) * 86_400_000_000
    nb = np.uint64(256)

    def tag_orders(t: pa.Table) -> pa.Table:
        key = pc.cast(t.column("o_custkey"), pa.int64())
        return pa.table({
            "bkt": pa.array((_mix64(key.to_numpy()) % nb).astype(np.int64),
                            pa.int64()),
            "key": key,
            "kind": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
            "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
            "ts": pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
            "value": pa.array(np.zeros(t.num_rows, np.float64), pa.float64()),
        })

    def tag_events(t: pa.Table) -> pa.Table:
        key = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "bkt": pa.array((_mix64(key.to_numpy()) % nb).astype(np.int64),
                            pa.int64()),
            "key": key,
            "kind": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
            "o_orderkey": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
            "ts": pc.cast(t.column("ts"), pa.timestamp("us")),
            "value": pc.cast(t.column("value"), pa.float64()),
        })

    both = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        events.map_batches(tag_events, batch_format="pyarrow"))

    def range_bucket(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy()
        kind = g.column("kind").to_numpy()
        ts = g.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        okey = g.column("o_orderkey").to_numpy()
        val = g.column("value").to_numpy()
        order = np.argsort(key, kind="stable")
        key, kind, ts, okey, val = (key[order], kind[order], ts[order],
                                    okey[order], val[order])
        starts = np.flatnonzero(
            np.concatenate(([True], key[1:] != key[:-1])))
        ends = np.append(starts[1:], len(key))
        out_ok, out_n, out_v = [], [], []
        for s, e in zip(starts, ends):  # per-key segments, numpy inside
            km = kind[s:e] == 1
            odates = ts[s:e][~km]
            if not len(odates):
                continue
            ev_ts, ev_val = ts[s:e][km], val[s:e][km]
            oe = np.argsort(ev_ts, kind="stable")
            ev_ts, ev_val = ev_ts[oe], ev_val[oe]
            lo = np.searchsorted(ev_ts, odates, side="left")
            hi = np.searchsorted(ev_ts, odates + window_us, side="left")
            cs = np.concatenate(([0.0], np.cumsum(ev_val)))
            out_ok.append(okey[s:e][~km])
            out_n.append(hi - lo)
            out_v.append(cs[hi] - cs[lo])
        if not out_ok:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "n_events_7d": pa.array([], pa.int64()),
                             "value_sum_7d": pa.array([], pa.float64())})
        return pa.table({
            "o_orderkey": pa.array(np.concatenate(out_ok), pa.int64()),
            "n_events_7d": pa.array(np.concatenate(out_n), pa.int64()),
            "value_sum_7d": pa.array(
                sql_round(np.concatenate(out_v), 4), pa.float64()),
        })

    return both.groupby("bkt").map_groups(range_bucket, batch_format="pyarrow")


def topk_per_group(sf_dir: str, k: int = 3, n_buckets: int = 256
                   ) -> "rd.Dataset":
    """Windowed rank — top-k orders by price per customer (the per-group
    head that quota/fairness surfaces need).  One BOUNDED
    ``hash(key) % n_buckets`` shuffle (never a group per key), then the
    rank-within-key is one vectorized lexsort + segment-relative arange
    per bucket."""
    from prosearch_ray.pipelines.dedup import _mix64

    orders = read(sf_dir, "orders",
                  columns=["o_custkey", "o_orderkey", "o_totalprice"])
    nb = np.uint64(n_buckets)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bkt", pa.array((_mix64(
                t.column("o_custkey").to_numpy().astype(np.int64)) % nb
            ).astype(np.int64), pa.int64()))

    def head_bucket(g: pa.Table) -> pa.Table:
        cust = g.column("o_custkey").to_numpy()
        okey = g.column("o_orderkey").to_numpy()
        price = g.column("o_totalprice").to_numpy()
        order = np.lexsort((okey, -price, cust))
        c_s = cust[order]
        starts = np.flatnonzero(
            np.concatenate(([True], c_s[1:] != c_s[:-1])))
        sizes = np.diff(np.append(starts, len(c_s)))
        rnk = np.arange(len(c_s)) - np.repeat(starts, sizes) + 1
        keep = rnk <= k
        idx = order[keep]
        return pa.table({
            "o_custkey": pa.array(cust[idx]),
            "o_orderkey": pa.array(okey[idx]),
            "o_totalprice": pa.array(price[idx]),
            "rnk": pa.array(rnk[keep], pa.int64()),
        })

    return orders.map_batches(tag, batch_format="pyarrow").groupby(
        "bkt").map_groups(head_bucket, batch_format="pyarrow")


def percentile_stats(sf_dir: str, ps=(50, 90, 99)) -> pa.Table:
    """Exact distributed percentiles of ``n_chars`` per source — the
    counting-quantile shape that works at any scale for bounded-domain
    columns: map-side per-(source, value) count partials, one SMALL
    ``groupby((source, value)).sum`` (rows bounded by the value domain, not
    the corpus), then the quantile is picked from each source's count
    histogram.  No sort of the data, no per-row shuffle.

    The pick rule is DuckDB ``quantile_disc`` parity: 1-based position
    ``ceil(p * n)`` computed in exact integer arithmetic."""
    docs = read(sf_dir, "documents", columns=["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["source", "n_chars"]).aggregate(
            [("n_chars", "count")])
        return g.rename_columns(["source", "n_chars", "cnt"])

    agg = docs.map_batches(partial, batch_format="pyarrow").groupby(
        ["source", "n_chars"]).aggregate(Sum("cnt", alias_name="cnt"))
    hist = pa.Table.from_pylist(agg.take_all()).sort_by(
        [("source", "ascending"), ("n_chars", "ascending")])

    srcs = hist.column("source").to_numpy(zero_copy_only=False)
    vals = hist.column("n_chars").to_numpy()
    cnts = hist.column("cnt").to_numpy()
    starts = np.concatenate(([0], np.flatnonzero(srcs[1:] != srcs[:-1]) + 1))
    ends = np.concatenate((starts[1:], [len(srcs)]))
    out = {"source": [], **{f"p{p}": [] for p in ps}}
    for s, e in zip(starts, ends):
        cum = np.cumsum(cnts[s:e])
        n = int(cum[-1])
        out["source"].append(srcs[s])
        for p in ps:
            pos = max(1, (p * n + 99) // 100)  # ceil(p*n/100), 1-based
            out[f"p{p}"].append(int(vals[s:e][np.searchsorted(cum, pos)]))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        **{f"p{p}": pa.array(out[f"p{p}"], pa.int64()) for p in ps},
    })


def distinct_daily_users(sf_dir: str) -> pa.Table:
    """Exact per-day COUNT(DISTINCT user_id) + event count over the events
    stream — the daily-active-users rollup every event pipeline runs.

    Scale shape: the classic exact count-distinct two-level aggregate.
    One streaming pass emits, per batch, the WITHIN-BATCH distinct
    (day, user) pairs (map-side shrink — repeated activity collapses
    before the shuffle) plus per-day event-count partials as tagged rows;
    the only full exchange is the ``groupby(day, user_id)`` over the
    pre-deduped pairs.  Day counts then reduce map-side again into a tiny
    per-day groupby.  No driver state beyond the days-sized result."""
    ev = read(sf_dir, "events", columns=["ts", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.strftime(t.column("ts"), format="%Y-%m-%d")
        # event counts include EVERY row (SQL count(*)); the distinct-user
        # side drops null user_ids (SQL count(DISTINCT ...) skips nulls)
        evc = pc.value_counts(day)
        tb = pa.table({"day": day, "user_id": t.column("user_id")})
        tb = tb.filter(pc.is_valid(tb.column("user_id")))
        uniq = tb.group_by(["day", "user_id"]).aggregate([])
        n_u, n_e = uniq.num_rows, len(evc)
        return pa.table({
            "kind": pa.array([0] * n_u + [1] * n_e, pa.int8()),
            "day": pa.concat_arrays([
                uniq.column("day").combine_chunks(),
                evc.field("values")]),
            "user_id": pa.concat_arrays([
                uniq.column("user_id").combine_chunks(),
                pa.array([-1] * n_e, pa.int64())]),
            "n_part": pa.concat_arrays([
                pa.array([0] * n_u, pa.int64()),
                pc.cast(evc.field("counts"), pa.int64())]),
        })

    tagged = ev.map_batches(partial, batch_format="pyarrow").materialize()

    def only(kind):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("kind"),
                                     pa.scalar(kind, pa.int8())))
        return fn

    # distinct users: global dedup of (day, user), then per-day counts
    # (value_counts per block after the dedup groupby, tiny final sum)
    def day_count(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("day"))
        return pa.table({"day": vc.field("values"),
                         "n_part": pc.cast(vc.field("counts"), pa.int64())})

    users = tagged.map_batches(only(0), batch_format="pyarrow").groupby(
        ["day", "user_id"]).aggregate(Count(alias_name="c")).map_batches(
        day_count, batch_format="pyarrow").groupby("day").aggregate(
        Sum("n_part", alias_name="n_users"))
    events = tagged.map_batches(only(1), batch_format="pyarrow").groupby(
        "day").aggregate(Sum("n_part", alias_name="n_events"))

    by_day = {}
    for r in users.take_all():
        by_day[r["day"]] = [int(r["n_users"]), 0]
    for r in events.take_all():
        by_day[r["day"]][1] = int(r["n_events"])
    days = sorted(by_day)
    return pa.table({
        "day": pa.array(days, pa.string()),
        "n_users": pa.array([by_day[d][0] for d in days], pa.int64()),
        "n_events": pa.array([by_day[d][1] for d in days], pa.int64()),
    })


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_stages(sf_dir: str, steps=FUNNEL_STEPS,
                  n_buckets: int = 256) -> "rd.Dataset":
    """Ordered-funnel analysis over the events stream — the product
    analytics op sessionization doesn't cover: per user, how far through
    ``steps`` they progressed under EARLIEST-GREEDY semantics (first step-1
    event; first step-2 event STRICTLY after it; ...), with each reached
    step's completion timestamp (epoch microseconds; -1 for unreached).
    Users with no step-1 event emit no row.

    Scale shape: the ``user_sessions`` pattern — one bounded
    ``hash(user) % n_buckets`` exchange (never per-user groups), then every
    contained user resolves vectorized per bucket: one lexsort over
    (user, ts), per-step masked segment minima via ``np.minimum.reduceat``
    over candidate rows gated on the previous step's time.  The SQL oracle
    replicates the same chained strict-after minima relationally."""
    from prosearch_ray.pipelines.dedup import _mix64

    ev = read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    nb = np.uint64(n_buckets)
    steps = tuple(steps)

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("event_type"),
                        value_set=pa.array(steps, pa.string()))
        t = t.filter(keep)
        uid = t.column("user_id").to_numpy()
        return t.append_column(
            "bkt", pa.array((_mix64(uid.astype(np.uint64)) % nb)
                            .astype(np.int64), pa.int64()))

    empty = pa.table(
        {"user_id": pa.array([], pa.int64()),
         "stage": pa.array([], pa.int64()),
         **{f"t{i + 1}": pa.array([], pa.int64())
            for i in range(len(steps))}})

    def bucket_funnel(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return empty
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        # vectorized event_type -> step id (null for non-step events, which
        # tag() already dropped; fill -1 keeps the mask semantics anyway)
        sid = pc.fill_null(pc.index_in(
            g.column("event_type"),
            value_set=pa.array(steps, pa.string())), -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts, uid))
        u, t, s = uid[order], ts[order], sid[order]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        users = u[starts]
        bounds = np.append(starts, len(u))
        nu = len(users)
        seg_of_row = np.repeat(np.arange(nu), np.diff(bounds))
        NONE = np.iinfo(np.int64).max
        prev = np.full(nu, -1, np.int64)  # step-0 gate: any ts qualifies
        t_steps = []
        for i in range(len(steps)):
            cand = (s == i) & (t > prev[seg_of_row])
            if cand.any():
                idx = np.flatnonzero(cand)
                cur = np.full(nu, NONE, np.int64)
                np.minimum.at(cur, seg_of_row[idx], t[idx])
            else:
                cur = np.full(nu, NONE, np.int64)
            # a user who missed an earlier step can never reach this one
            cur = np.where(prev == NONE, NONE, cur) if i else cur
            t_steps.append(cur)
            prev = cur
        stage = np.sum([(c != NONE).astype(np.int64) for c in t_steps],
                       axis=0)
        keep = t_steps[0] != NONE
        cols = {"user_id": pa.array(users[keep], pa.int64()),
                "stage": pa.array(stage[keep], pa.int64())}
        for i, c in enumerate(t_steps):
            cols[f"t{i + 1}"] = pa.array(
                np.where(c[keep] == NONE, -1, c[keep]), pa.int64())
        return pa.table(cols)

    return ev.map_batches(tag, batch_format="pyarrow").groupby(
        "bkt").map_groups(bucket_funnel, batch_format="pyarrow")


WEEK_US = 7 * 86_400 * 1_000_000


def retention_cohorts(sf_dir: str, n_buckets: int = 256) -> pa.Table:
    """Cohort retention matrix over the events stream — the third classic
    stream-analytics shape next to sessionization and funnels: users
    cohorted by the week of their FIRST ``signup`` event, counted in every
    (cohort_week, week_offset) cell where they have ANY activity at or
    after their cohort week.

    Scale shape: one pass emits tagged map-side partials (per-user signup
    minima and distinct (user, activity-week) pairs) into a bounded
    ``hash(user) % n_buckets`` exchange.  Each user lives in EXACTLY one
    bucket, so per-bucket distinct-user cell counts are ADDITIVE — the
    final aggregate is a tiny ``groupby((cohort, offset)).sum`` over
    cells-per-bucket rows, never a corpus-scale count-distinct."""
    from ray.data.aggregate import Sum

    from prosearch_ray.pipelines.dedup import _mix64

    ev = read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    nb = np.uint64(n_buckets)

    def partials(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        sign = pc.equal(t.column("event_type"), "signup").to_numpy(
            zero_copy_only=False)
        outs = []
        if sign.any():
            su, si = uid[sign], ts[sign]
            order = np.lexsort((si, su))
            first = np.concatenate(([True], su[order][1:] != su[order][:-1]))
            outs.append((su[order][first], si[order][first],
                         np.zeros(int(first.sum()), np.int64)))
        wk = ts // WEEK_US
        key = np.stack([uid, wk], axis=1)
        uniq = np.unique(key, axis=0)
        outs.append((uniq[:, 0], uniq[:, 1],
                     np.ones(len(uniq), np.int64)))
        u = np.concatenate([o[0] for o in outs])
        v = np.concatenate([o[1] for o in outs])
        k = np.concatenate([o[2] for o in outs])
        return pa.table({
            "bkt": pa.array((_mix64(u.astype(np.uint64)) % nb)
                            .astype(np.int64), pa.int64()),
            "user_id": pa.array(u, pa.int64()),
            "val": pa.array(v, pa.int64()),
            "kind": pa.array(k, pa.int64()),
        })

    def bucket_cells(g: pa.Table) -> pa.Table:
        empty = pa.table({"cohort_week": pa.array([], pa.int64()),
                          "week_offset": pa.array([], pa.int64()),
                          "n_part": pa.array([], pa.int64())})
        if not g.num_rows:
            return empty
        kind = g.column("kind").to_numpy()
        uid = g.column("user_id").to_numpy()
        val = g.column("val").to_numpy()
        s_m = kind == 0
        if not s_m.any():
            return empty
        su, sv = uid[s_m], val[s_m]
        order = np.lexsort((sv, su))
        first = np.concatenate(([True], su[order][1:] != su[order][:-1]))
        c_users = su[order][first]                      # sorted unique
        c_week = sv[order][first] // WEEK_US
        au, aw = uid[~s_m], val[~s_m]
        pos = np.searchsorted(c_users, au)
        pos_c = np.clip(pos, 0, len(c_users) - 1)
        hit = c_users[pos_c] == au
        off = aw - c_week[pos_c]
        keep = hit & (off >= 0)
        if not keep.any():
            return empty
        # distinct (user, week) may repeat across input batches — dedup,
        # then count users per (cohort, offset) cell
        cells = np.stack([c_week[pos_c][keep], off[keep], au[keep]], axis=1)
        cells = np.unique(cells, axis=0)
        cw_off = cells[:, 0] * (1 << 32) + cells[:, 1]
        u_keys, counts = np.unique(cw_off, return_counts=True)
        return pa.table({
            "cohort_week": pa.array(u_keys >> 32, pa.int64()),
            "week_offset": pa.array(u_keys & 0xFFFFFFFF, pa.int64()),
            "n_part": pa.array(counts.astype(np.int64), pa.int64()),
        })

    agg = (ev.map_batches(partials, batch_format="pyarrow")
           .groupby("bkt").map_groups(bucket_cells, batch_format="pyarrow")
           .groupby(["cohort_week", "week_offset"])
           .aggregate(Sum("n_part", alias_name="n_users")))
    out = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    out = pa.table({"cohort_week": out.column("cohort_week"),
                    "week_offset": out.column("week_offset"),
                    "n_users": pc.cast(out.column("n_users"), pa.int64())})
    return out.sort_by([("cohort_week", "ascending"),
                        ("week_offset", "ascending")])
