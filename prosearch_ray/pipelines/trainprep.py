"""Training-data preparation operators: sequence packing and n-gram counts.

Both are SQL-checkable (driver oracles in __ray_entry__.oracle_sql) and use
the simple tokenizer (lowercase + split on non-[a-z0-9] runs) whose SQL
parity is pinned by tests/test_sql_tokenizer_parity.py.

``pack_sequences`` is the concat-then-chunk packing an LLM training pipeline
runs before batching: documents are laid end-to-end per source shard and cut
into fixed token-budget sequences, so each doc gets a global start offset
and a sequence id.  The global per-source prefix sum is computed with the
bucketed-exchange pattern (the same salt-free bounded-group shape as the
index build): a tiny per-(source, bucket) aggregate broadcast as base
offsets + an exact within-bucket cumsum under ``groupby(...).map_groups``
where every group is at most ``bucket_docs`` rows — no global sort, no
driver-side scan of the corpus.

``ngram_counts`` is the classic distributed n-gram count: vectorized
per-batch bigram partial counts (map-side combining) -> small
``groupby(bigram).sum`` -> per-block top-k prune -> tiny driver merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from prosearch_ray.pipelines.common import read
from prosearch_ray.state.broadcast import bget, bput

PACK_BUDGET = 512       # tokens per packed training sequence
PACK_BUCKET_DOCS = 4096  # docs per prefix-sum bucket (bounded group size)
NGRAM_TOP_K = 100


def _split_tokens(col: pa.ChunkedArray):
    """Vectorized simple-tokenize of a string column: returns
    ``(flat_tokens, doc_of, n_docs)`` with empty tokens dropped (identical
    token stream to the SQL ``list_filter(string_split_regex(...))``)."""
    split = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-z0-9]+")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    counts = np.diff(split.offsets.to_numpy().astype(np.int64))
    flat = split.flatten()
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(keep)), doc_of[keep], len(counts)


def doc_ngrams(col, n: int, pre=None):
    """Vectorized within-doc token n-grams of a string column: returns
    ``(grams, doc_of)`` where grams are space-joined token windows (a flat
    Arrow string array) and doc_of maps each gram to its batch-local doc
    index.  THE within-doc n-gram kernel — shared by decontaminate /
    boilerplate_flags (curate), MinHash/SimHash shingling (dedup, n=2) and
    pmi_bigrams, so the gram semantics can never diverge between them.
    ``pre`` takes an existing ``_split_tokens(col)`` result so callers that
    also need the unigram stream tokenize once."""
    flat, doc_of, _ = pre if pre is not None else _split_tokens(col)
    m = len(flat) - n + 1
    if m <= 0:
        return pa.array([], pa.string()), np.array([], np.int64)
    parts = [flat.slice(i, m) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    same = doc_of[n - 1:] == doc_of[:m]  # window stays inside one doc
    out = grams.filter(pa.array(same))
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out, doc_of[:m][same]


def pack_sequences(sf_dir: str, budget: int = PACK_BUDGET,
                   bucket_docs: int = PACK_BUCKET_DOCS) -> "rd.Dataset":
    """Concat-then-chunk sequence packing per source shard.

    Output per doc: ``start_tok`` = tokens laid down before it in its
    source (docs ordered by doc_id), ``seq_id`` = start_tok // budget.
    """
    docs = read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def count(t: pa.Table) -> pa.Table:
        _, doc_of, n = _split_tokens(t.column("text"))
        n_tok = np.bincount(doc_of, minlength=n)
        ids = t.column("doc_id").to_numpy()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "bucket": pa.array(ids // bucket_docs, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
        })

    # the counted table is the ~1% derivative of the corpus — materialize it
    # once instead of re-tokenizing for each of the two consumers below
    counted = docs.map_batches(count, batch_format="pyarrow").materialize()

    # tiny aggregate: total tokens per (source, bucket) -> exclusive prefix
    # per source on the driver, broadcast as base offsets
    partials = counted.groupby(["source", "bucket"]).aggregate(
        Sum("n_tokens", alias_name="tok_sum")).take_all()
    partials.sort(key=lambda r: (r["source"], r["bucket"]))
    bases = {}
    run_source, run_sum = None, 0
    for r in partials:
        if r["source"] != run_source:
            run_source, run_sum = r["source"], 0
        bases[(r["source"], int(r["bucket"]))] = run_sum
        run_sum += int(r["tok_sum"])
    ref = bput(bases)

    def pack_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "seq_id": pa.array([], pa.int64())})
        t = t.sort_by("doc_id")
        base = bget(ref)[(t.column("source")[0].as_py(),
                          int(t.column("bucket")[0].as_py()))]
        n_tok = t.column("n_tokens").to_numpy()
        start = base + np.cumsum(n_tok) - n_tok
        return pa.table({
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "n_tokens": t.column("n_tokens"),
            "start_tok": pa.array(start, pa.int64()),
            "seq_id": pa.array(start // budget, pa.int64()),
        })

    return counted.groupby(["source", "bucket"]).map_groups(
        pack_group, batch_format="pyarrow")


# per-lang token budgets for the deterministic corpus-mixing operator;
# sized so every lang's budget BINDS at sf0.001/0.01/0.1 (each lang carries
# >= 3.5k tokens there) — langs with no budget (zh) are dropped entirely
MIX_BUDGETS = {"en": 5000, "de": 2000, "fr": 2500, "es": 1500}


def budget_mix(sf_dir: str, budgets=None,
               bucket_docs: int = PACK_BUCKET_DOCS) -> "rd.Dataset":
    """Token-budget corpus mixing — the data-mixing step of training-corpus
    assembly: each language gets a token budget and contributes docs in
    deterministic doc_id order until its INCLUSIVE running token total
    exceeds the budget (languages without a budget contribute nothing).

    Scale shape (the ``pack_sequences`` two-level prefix sum): one
    streaming tokenize-count pass, a tiny (lang, bucket) partial-sum
    aggregate, driver exclusive prefix per lang (lang x bucket rows, never
    corpus-sized), then per-bucket vectorized cumsum + budget gate — no
    global sort, no corpus-sized driver state."""
    budgets = dict(MIX_BUDGETS if budgets is None else budgets)
    docs = read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def count(t: pa.Table) -> pa.Table:
        _, doc_of, n = _split_tokens(t.column("text"))
        n_tok = np.bincount(doc_of, minlength=n)
        ids = t.column("doc_id").to_numpy()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lang": t.column("lang"),
            "bucket": pa.array(ids // bucket_docs, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
        })

    counted = docs.map_batches(count, batch_format="pyarrow").materialize()

    partials = counted.groupby(["lang", "bucket"]).aggregate(
        Sum("n_tokens", alias_name="tok_sum")).take_all()
    partials.sort(key=lambda r: (r["lang"], r["bucket"]))
    bases = {}
    run_lang, run_sum = None, 0
    for r in partials:
        if r["lang"] != run_lang:
            run_lang, run_sum = r["lang"], 0
        bases[(r["lang"], int(r["bucket"]))] = run_sum
        run_sum += int(r["tok_sum"])
    ref = bput((bases, budgets))

    def mix_group(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
            "cum_tokens": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        b, bud = bget(ref)
        lang = t.column("lang")[0].as_py()
        limit = int(bud.get(lang, 0))
        base = b[(lang, int(t.column("bucket")[0].as_py()))]
        if base >= limit:  # whole bucket past the budget — emit nothing
            return empty
        t = t.sort_by("doc_id")
        n_tok = t.column("n_tokens").to_numpy()
        cum = base + np.cumsum(n_tok)
        keep = cum <= limit
        t = t.filter(pa.array(keep))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lang": t.column("lang"),
            "n_tokens": t.column("n_tokens"),
            "cum_tokens": pa.array(cum[keep], pa.int64()),
        })

    return counted.groupby(["lang", "bucket"]).map_groups(
        mix_group, batch_format="pyarrow")


def _bigram_partial(t: pa.Table) -> pa.Table:
    """Map-side within-doc bigram occurrence counts of one batch (adjacent
    token pairs never cross doc boundaries) — shared by ngram_counts and
    pmi_bigrams."""
    grams, _ = doc_ngrams(t.column("text"), 2)
    vc = pc.value_counts(grams)
    return pa.table({"bigram": vc.field("values"),
                     "n_part": pc.cast(vc.field("counts"), pa.int64())})


def ngram_counts(sf_dir: str, k: int = NGRAM_TOP_K) -> pa.Table:
    """Top-k bigrams by occurrence count over documents.text."""
    docs = read(sf_dir, "documents", columns=["text"])

    agg = docs.map_batches(_bigram_partial, batch_format="pyarrow").groupby(
        "bigram").aggregate(Sum("n_part", alias_name="n"))

    def local_topk(t: pa.Table) -> pa.Table:
        # after the groupby each bigram lives in exactly one block, so a
        # per-block (count desc, bigram asc) head-k keeps every global
        # top-k candidate
        if t.num_rows <= k:
            return t
        return t.sort_by([("n", "descending"), ("bigram", "ascending")]
                         ).slice(0, k)

    rows = agg.map_batches(local_topk, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-int(r["n"]), r["bigram"]))
    rows = rows[:k]
    return pa.table({
        "bigram": pa.array([r["bigram"] for r in rows], pa.string()),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
    })


VEC_DIM = 64


def doc_vectors(sf_dir: str, dim: int = VEC_DIM) -> "rd.Dataset":
    """Hashed TF-IDF document vectorization — the feature-hashing step a
    training/retrieval pipeline runs to turn text into fixed-dimension
    vectors without a vocabulary: token -> md5 % dim bucket, weight =
    tf * ln(1 + N / (1 + df_bucket)), emitted in LONG form (one row per
    non-zero (doc, bucket)) so the DuckDB oracle value-checks every weight.

    Scale shape: tf per (doc, bucket) completes WITHIN each batch (a doc
    lives in one batch) — no corpus shuffle; the bucket df table is
    dim-sized (a tiny groupby), broadcast once.  md5 convention matches
    DuckDB ``md5_number_lower`` (digest[8:] little-endian), so the hash is
    oracle-exact."""
    import hashlib
    import math

    from prosearch_ray.state.broadcast import bget, bput

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def _doc_buckets(t: pa.Table):
        """(doc_of, bucket) per token occurrence; md5 computed once per
        DISTINCT token per batch via dictionary-encode."""
        flat, doc_of, n = _split_tokens(t.column("text"))
        enc = flat.dictionary_encode()
        hd = np.fromiter(
            (int.from_bytes(hashlib.md5(tok.encode()).digest()[8:],
                            "little") % dim
             for tok in enc.dictionary.to_pylist()),
            dtype=np.int64, count=len(enc.dictionary))
        codes = enc.indices.to_numpy(zero_copy_only=False)
        buckets = hd[codes] if len(codes) else np.array([], np.int64)
        return doc_of, buckets, n

    def df_partial(t: pa.Table) -> pa.Table:
        doc_of, buckets, _ = _doc_buckets(t)
        # distinct (doc, bucket) pairs -> per-bucket df contribution
        uniq = np.unique(doc_of * dim + buckets)
        cnt = np.bincount((uniq % dim).astype(np.int64), minlength=dim)
        return pa.table({"b": pa.array(np.arange(dim, dtype=np.int64)),
                         "df_part": pa.array(cnt, pa.int64())})

    df_rows = docs.map_batches(df_partial, batch_format="pyarrow").groupby(
        "b").aggregate(Sum("df_part", alias_name="df")).take_all()
    df = np.zeros(dim, np.int64)
    for r in df_rows:
        df[int(r["b"])] = int(r["df"])
    n_docs = docs.count()
    # exactly the SQL expression ln(1 + N/(1+df)) — same op order so the
    # float64 result is bit-identical to DuckDB's before rounding
    idf = np.log(1.0 + float(n_docs) / (1.0 + df.astype(np.float64)))
    ref = bput(idf)

    def weigh(t: pa.Table) -> pa.Table:
        from prosearch_ray.pipelines.common import sql_round

        idf_l = bget(ref)
        doc_of, buckets, n = _doc_buckets(t)
        ids = t.column("doc_id").to_numpy()
        keys, tf = np.unique(doc_of * dim + buckets, return_counts=True)
        d_i = (keys // dim).astype(np.int64)
        b_i = (keys % dim).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[d_i], pa.int64()),
            "bucket": pa.array(b_i, pa.int64()),
            "tf": pa.array(tf.astype(np.int64), pa.int64()),
            "w": pa.array(sql_round(tf * idf_l[b_i], 4), pa.float64()),
        })

    return docs.map_batches(weigh, batch_format="pyarrow")


CHUNK_TOKENS = 128


def chunk_documents(sf_dir: str, chunk: int = CHUNK_TOKENS) -> "rd.Dataset":
    """Fixed-token-window chunking — the one-to-many expansion a training
    pipeline runs on long documents (inverse of ``pack_sequences``): each
    doc emits ceil(n_tokens/chunk) rows with the chunk's token offset and
    length.  Pure per-batch flat expansion, no shuffle, no state."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        _, doc_of, n = _split_tokens(t.column("text"))
        n_tok = np.bincount(doc_of, minlength=n)
        ids = t.column("doc_id").to_numpy()
        n_chunks = -(-n_tok // chunk)  # ceil; 0 chunks for empty docs
        rep_ids = np.repeat(ids, n_chunks)
        total = int(n_chunks.sum())
        ends = np.cumsum(n_chunks)
        chunk_id = (np.arange(total, dtype=np.int64)
                    - np.repeat(ends - n_chunks, n_chunks))
        start = chunk_id * chunk
        length = np.minimum(chunk, np.repeat(n_tok, n_chunks) - start)
        return pa.table({
            "doc_id": pa.array(rep_ids, pa.int64()),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "start_tok": pa.array(start, pa.int64()),
            "chunk_tokens": pa.array(length, pa.int64()),
        })

    return docs.map_batches(explode, batch_format="pyarrow")


PMI_MIN_COUNT = 5  # report bigrams with at least this many occurrences


def pmi_bigrams(sf_dir: str, min_count: int = PMI_MIN_COUNT) -> pa.Table:
    """Pointwise mutual information of corpus bigrams — the collocation
    score a tokenizer/vocab pipeline uses to decide which adjacent pairs to
    merge (phrase mining):

        pmi(a,b) = ln( (c_ab / T2) / ((c_a / T1) * (c_b / T1)) )

    with T1 = total token occurrences, T2 = total bigram occurrences.

    Scale shape: ONE corpus pass (tokens computed once) emits unigram AND
    bigram value-count partials as tagged rows into a single bounded
    ``groupby((kind, g)).sum``; totals come from a kind-level rollup of
    that tiny aggregate.  Only bigrams with c_ab >= ``min_count`` survive
    (the heavy-hitter tail), so the driver-side join fetches unigram counts
    ONLY for tokens appearing in surviving bigrams — never the full
    vocabulary.  The float expression is evaluated in exactly DuckDB's op
    order, so the driver value-checks pmi to 4 decimals."""
    from prosearch_ray.pipelines.common import sql_round

    docs = read(sf_dir, "documents", columns=["text"])

    def mixed_partial(t: pa.Table) -> pa.Table:
        pre = _split_tokens(t.column("text"))
        grams, _ = doc_ngrams(None, 2, pre=pre)
        vcu = pc.value_counts(pre[0])
        vcb = pc.value_counts(grams)
        n_u, n_b = len(vcu), len(vcb)
        return pa.table({
            "kind": pa.array([0] * n_u + [1] * n_b, pa.int8()),
            "g": pa.concat_arrays([
                vcu.field("values").cast(pa.string()),
                vcb.field("values").cast(pa.string())]),
            "n_part": pa.concat_arrays([
                pc.cast(vcu.field("counts"), pa.int64()),
                pc.cast(vcb.field("counts"), pa.int64())]),
        })

    agg = docs.map_batches(mixed_partial, batch_format="pyarrow").groupby(
        ["kind", "g"]).aggregate(Sum("n_part", alias_name="n")).materialize()
    totals = {int(r["kind"]): float(r["sum"]) for r in agg.groupby(
        "kind").aggregate(Sum("n", alias_name="sum")).take_all()}
    empty = pa.table({
        "bigram": pa.array([], pa.string()),
        "n_ab": pa.array([], pa.int64()), "n_a": pa.array([], pa.int64()),
        "n_b": pa.array([], pa.int64()), "pmi": pa.array([], pa.float64())})
    if 0 not in totals or 1 not in totals:  # no tokens / no bigrams at all
        return empty
    t1, t2 = totals[0], totals[1]

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t.column("kind"), pa.scalar(1, pa.int8())),
                    pc.greater_equal(t.column("n"), pa.scalar(min_count)))
        return t.filter(m).select(["g", "n"])

    kept_parts = [tbl for tbl in agg.map_batches(
        keep, batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
    kept = pa.concat_tables(kept_parts) if kept_parts else None
    if kept is None or kept.num_rows == 0:
        return empty
    grams = kept.column("g").to_pylist()
    needed = set()
    for g in grams:
        a, b = g.split(" ", 1)
        needed.add(a)
        needed.add(b)
    need_arr = pa.array(sorted(needed), pa.string())

    def pick(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t.column("kind"), pa.scalar(0, pa.int8())),
                    pc.is_in(t.column("g"), value_set=need_arr))
        return t.filter(m).select(["g", "n"])

    cnt = {}
    for tbl in agg.map_batches(pick, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        cnt.update(zip(tbl.column("g").to_pylist(),
                       tbl.column("n").to_pylist()))

    order = sorted(range(len(grams)), key=lambda i: grams[i])
    c_ab = kept.column("n").to_numpy(zero_copy_only=False)[order].astype(
        np.float64)
    g_sorted = [grams[i] for i in order]
    c_a = np.array([cnt[g.split(" ", 1)[0]] for g in g_sorted], np.float64)
    c_b = np.array([cnt[g.split(" ", 1)[1]] for g in g_sorted], np.float64)
    pmi = sql_round(np.log((c_ab / t2) / ((c_a / t1) * (c_b / t1))), 4)
    return pa.table({
        "bigram": pa.array(g_sorted, pa.string()),
        "n_ab": pa.array(c_ab.astype(np.int64), pa.int64()),
        "n_a": pa.array(c_a.astype(np.int64), pa.int64()),
        "n_b": pa.array(c_b.astype(np.int64), pa.int64()),
        "pmi": pa.array(pmi, pa.float64()),
    })


KEYWORD_K = 3             # keywords reported per document
KW_BCAST_MAX = 1_000_000  # distinct terms; above this the df table cannot
                          # broadcast and the bucketed join path runs
KW_BUCKETS = 64           # bounded-exchange fan-out for the scale path


def keyword_extract(sf_dir: str, k: int = KEYWORD_K,
                    bcast_max: int = KW_BCAST_MAX,
                    n_buckets: int = KW_BUCKETS) -> "rd.Dataset":
    """Per-document top-k TF-IDF keywords — the corpus-tagging step a
    training/retrieval pipeline runs to label documents with their most
    characteristic terms:

        score(d, t) = round(tf(d,t) * ln(1 + N / (1 + df(t))), 4)

    (the ``doc_vectors`` idf, over the REAL term vocabulary instead of
    hashed buckets), ranked per doc by (score desc, term asc).

    Scale shape: tf per (doc, term) completes WITHIN each batch (a doc
    lives in one batch); df is one vocabulary-keyed groupby of map-side
    distinct-(doc,term) partials.  Below ``bcast_max`` distinct terms the
    (term, df) table broadcasts once and scoring + per-doc top-k finish in
    the same single pass (no shuffle at all).  Above it, the exact same
    rows come out of two bounded exchanges: tf rows and df rows co-group
    on a deterministic term-hash bucket (``_mix64`` of md5(term), never
    per-term groups), scores resolve vectorized per bucket, and per-doc
    top-k resolves in ``_mix64(doc_id) % n_buckets`` groups.  pytest pins
    both paths equal (``tests/test_pipelines.py``)."""
    import hashlib

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def df_partial(t: pa.Table) -> pa.Table:
        flat, doc_of, _ = _split_tokens(t.column("text"))
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        nd = len(enc.dictionary)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(doc_of * nd + codes) if nd else np.array([], np.int64)
        cnt = np.bincount((uniq % nd).astype(np.int64), minlength=nd) if nd \
            else np.array([], np.int64)
        return pa.table({"term": enc.dictionary,
                         "df_part": pa.array(cnt, pa.int64())})

    agg = docs.map_batches(df_partial, batch_format="pyarrow").groupby(
        "term").aggregate(Sum("df_part", alias_name="df")).materialize()
    n_docs = docs.count()
    n_terms = agg.count()

    def _tf_rows(t: pa.Table):
        """(doc index, batch-dict code, tf, dict terms, doc ids) of one
        batch — tf complete because each doc is whole within the batch."""
        flat, doc_of, _ = _split_tokens(t.column("text"))
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        nd = len(enc.dictionary)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keys, tf = np.unique(doc_of * nd + codes, return_counts=True) if nd \
            else (np.array([], np.int64), np.array([], np.int64))
        return (keys // nd if nd else keys), \
            (keys % nd if nd else keys), tf.astype(np.int64), \
            enc.dictionary, t.column("doc_id").to_numpy().astype(np.int64)

    def _topk_segments(d_i: np.ndarray, score: np.ndarray,
                       term_rank: np.ndarray):
        """Indices of the per-doc top-k rows by (score desc, term asc) plus
        their 1-based ranks; d_i must be doc-identifying ints."""
        order = np.lexsort((term_rank, -score, d_i))
        d_s = d_i[order]
        starts = np.flatnonzero(
            np.concatenate(([True], d_s[1:] != d_s[:-1])))
        sizes = np.diff(np.append(starts, len(d_s)))
        rnk = np.arange(len(d_s)) - np.repeat(starts, sizes)
        keep = rnk < k
        return order[keep], (rnk[keep] + 1).astype(np.int64)

    def _string_rank(terms: pa.Array) -> np.ndarray:
        order = pc.sort_indices(terms).to_numpy(zero_copy_only=False)
        rank = np.empty(len(terms), np.int64)
        rank[order] = np.arange(len(terms), dtype=np.int64)
        return rank

    if n_terms <= bcast_max:
        dft = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
        ref = bput((dft.column("term").combine_chunks(),
                    pc.cast(dft.column("df"), pa.int64()).combine_chunks()
                    .to_numpy().astype(np.int64)))

        def score_topk(t: pa.Table) -> pa.Table:
            from prosearch_ray.pipelines.common import sql_round

            terms, dfv = bget(ref)
            d_i, c_i, tf, dict_terms, ids = _tf_rows(t)
            if not len(d_i):
                return pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                    "rk": pa.array([], pa.int64())})
            gidx = pc.index_in(dict_terms, value_set=terms)
            gi = gidx.to_numpy(zero_copy_only=False).astype(np.int64)
            df_dict = dfv[gi]
            # exactly the SQL expression ln(1 + N/(1+df)) — doc_vectors' op
            # order, bit-identical to DuckDB before rounding
            idf_dict = np.log(1.0 + float(n_docs)
                              / (1.0 + df_dict.astype(np.float64)))
            score = sql_round(tf * idf_dict[c_i], 4)
            keep, rk = _topk_segments(d_i, score, _string_rank(dict_terms)[c_i])
            return pa.table({
                "doc_id": pa.array(ids[d_i[keep]], pa.int64()),
                "term": pc.take(dict_terms, pa.array(c_i[keep])),
                "tf": pa.array(tf[keep], pa.int64()),
                "df": pa.array(df_dict[c_i[keep]], pa.int64()),
                "score": pa.array(score[keep], pa.float64()),
                "rk": pa.array(rk, pa.int64()),
            })

        return docs.map_batches(score_topk, batch_format="pyarrow")

    # ---- scale path: two bounded exchanges, no vocabulary broadcast ----
    from prosearch_ray.pipelines.dedup import _mix64

    def _term_bucket(terms: pa.Array) -> np.ndarray:
        hv = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
             for s in terms.to_pylist()),
            dtype=np.uint64, count=len(terms))
        return (_mix64(hv) % np.uint64(n_buckets)).astype(np.int64)

    def tf_tagged(t: pa.Table) -> pa.Table:
        d_i, c_i, tf, dict_terms, ids = _tf_rows(t)
        tb = _term_bucket(dict_terms)
        return pa.table({
            "b": pa.array(tb[c_i] if len(c_i) else np.array([], np.int64),
                          pa.int64()),
            "kind": pa.array(np.zeros(len(d_i), np.int64), pa.int64()),
            "doc_id": pa.array(ids[d_i] if len(d_i)
                               else np.array([], np.int64), pa.int64()),
            "term": pc.take(dict_terms, pa.array(c_i)),
            "n": pa.array(tf, pa.int64()),
        })

    def df_tagged(t: pa.Table) -> pa.Table:
        terms = t.column("term").combine_chunks()
        return pa.table({
            "b": pa.array(_term_bucket(terms), pa.int64()),
            "kind": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            "doc_id": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
            "term": terms,
            "n": pc.cast(t.column("df"), pa.int64()),
        })

    tagged = docs.map_batches(tf_tagged, batch_format="pyarrow").union(
        agg.map_batches(df_tagged, batch_format="pyarrow"))

    def resolve_bucket(g: pa.Table) -> pa.Table:
        from prosearch_ray.pipelines.common import sql_round

        kind = g.column("kind").to_numpy()
        is_df = kind == 1
        dfm = g.filter(pa.array(is_df))
        tfm = g.filter(pa.array(~is_df))
        if not tfm.num_rows:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64())})
        df_terms = dfm.column("term").combine_chunks()
        dfv = dfm.column("n").to_numpy()
        gi = pc.index_in(tfm.column("term").combine_chunks(),
                         value_set=df_terms)
        gi = gi.to_numpy(zero_copy_only=False).astype(np.int64)
        dfr = dfv[gi]
        tf = tfm.column("n").to_numpy()
        idf = np.log(1.0 + float(n_docs) / (1.0 + dfr.astype(np.float64)))
        return pa.table({
            "doc_id": tfm.column("doc_id"),
            "term": tfm.column("term"),
            "tf": pa.array(tf, pa.int64()),
            "df": pa.array(dfr, pa.int64()),
            "score": pa.array(sql_round(tf * idf, 4), pa.float64()),
        })

    scored = tagged.groupby("b").map_groups(
        resolve_bucket, batch_format="pyarrow")

    def doc_bucket(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.uint64)
        return t.append_column(
            "db", pa.array((_mix64(ids) % np.uint64(n_buckets))
                           .astype(np.int64), pa.int64()))

    def topk_bucket(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
                "rk": pa.array([], pa.int64())})
        terms = g.column("term").combine_chunks()
        enc = terms.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        c_i = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keep, rk = _topk_segments(
            g.column("doc_id").to_numpy().astype(np.int64),
            g.column("score").to_numpy(),
            _string_rank(enc.dictionary)[c_i])
        out = g.take(pa.array(keep)).drop_columns("db")
        return out.append_column("rk", pa.array(rk, pa.int64()))

    return scored.map_batches(doc_bucket, batch_format="pyarrow").groupby(
        "db").map_groups(topk_bucket, batch_format="pyarrow")


SKIP_WINDOW = 3
SKIP_TOP_K = 200


def skipgram_counts(sf_dir: str, window: int = SKIP_WINDOW,
                    k: int = SKIP_TOP_K) -> pa.Table:
    """Window-``window`` skip-gram co-occurrence counts over
    ``documents.text`` — the word2vec/GloVe co-occurrence table a
    training pipeline precomputes: every ORDERED token pair (w1, w2)
    with w2 at distance 1..window after w1 inside one document, counted
    corpus-wide; top-k by (count desc, w1 asc, w2 asc).

    Scale shape (same exchange as ``ngram_counts``): pairs are emitted
    and pre-counted WITHIN each batch (a doc lives in one batch, so no
    pair crosses an exchange boundary), the map-side partials meet in a
    small ``groupby(pair).sum`` whose key domain is vocabulary², each
    post-groupby block keeps its local top-k (every global winner
    survives — a pair lives in exactly one block), and only k rows reach
    the driver.  The pair distance loop is per DISTANCE (<= window
    iterations of vectorized Arrow slicing), never per token."""
    docs = read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        flat, doc_of, _ = _split_tokens(t.column("text"))
        pairs = []
        for d in range(1, window + 1):
            m = len(flat) - d
            if m <= 0:
                continue
            same = doc_of[d:] == doc_of[:m]  # pair stays inside one doc
            sel = pa.array(same)
            w1 = flat.slice(0, m).filter(sel)
            w2 = flat.slice(d, m).filter(sel)
            joined = pc.binary_join_element_wise(w1, w2, " ")
            if isinstance(joined, pa.ChunkedArray):
                joined = joined.combine_chunks()
            pairs.append(joined)
        if not pairs:
            return pa.table({"pair": pa.array([], pa.string()),
                             "n_part": pa.array([], pa.int64())})
        vc = pc.value_counts(pa.concat_arrays(pairs))
        return pa.table({"pair": vc.field("values"),
                         "n_part": pc.cast(vc.field("counts"), pa.int64())})

    agg = docs.map_batches(partial, batch_format="pyarrow").groupby(
        "pair").aggregate(Sum("n_part", alias_name="n"))

    def local_topk(t: pa.Table) -> pa.Table:
        # tokens contain no spaces, so "w1 w2" lexicographic order equals
        # (w1, w2) tuple order — the per-block prune can sort the joined key
        if t.num_rows <= k:
            return t
        return t.sort_by([("n", "descending"), ("pair", "ascending")]
                         ).slice(0, k)

    rows = agg.map_batches(local_topk, batch_format="pyarrow").take_all()
    split = [(r["pair"].split(" ", 1), int(r["n"])) for r in rows]
    split.sort(key=lambda x: (-x[1], x[0][0], x[0][1]))
    split = split[:k]
    return pa.table({
        "w1": pa.array([p[0] for p, _ in split], pa.string()),
        "w2": pa.array([p[1] for p, _ in split], pa.string()),
        "n": pa.array([n for _, n in split], pa.int64()),
    })


# ------------------------------------------------------------------ BPE train
BPE_MERGES = 16  # merge rules learned by the driver entry
# vocab-size gate between the driver-local merge loop and the distributed
# per-round Dataset passes (the clean_corpus broadcast-vs-anti-join shape):
# below this many DISTINCT words the whole merge loop is a sub-second local
# computation — pytest pins both paths equal
BPE_LOCAL_MAX_VOCAB = 200_000


def _apply_merge(flat: np.ndarray, word_of: np.ndarray, left: str,
                 right: str, merged: str):
    """Apply one BPE merge to a flat symbol stream: replace every
    LEFTMOST-GREEDY non-overlapping (left, right) adjacency within a word
    by ``merged``.  Vectorized adjacency match; the only loop is over the
    (rare) runs of OVERLAPPING matches ("aaa" + merge (a,a) -> "aa","a"),
    which is match-sized, not stream-sized.  Returns (flat, word_of)."""
    if len(flat) < 2:
        return flat, word_of
    cand = np.nonzero((flat[:-1] == left) & (flat[1:] == right)
                      & (word_of[:-1] == word_of[1:]))[0]
    if len(cand) == 0:
        return flat, word_of
    # greedy leftmost: drop a match that starts where the previous kept
    # match ended (only possible when left == right chains overlap)
    if left == right:
        sel = []
        prev = -2
        for p in cand.tolist():
            if p > prev + 1:
                sel.append(p)
                prev = p
        cand = np.asarray(sel, np.int64)
    out = flat.copy()
    out[cand] = merged
    keep = np.ones(len(flat), bool)
    keep[cand + 1] = False
    return out[keep], word_of[keep]


def word_frequencies(docs: "rd.Dataset") -> "rd.Dataset":
    """Distributed word-frequency table of a ``text`` Dataset under the
    simple tokenizer: map-side dictionary-encode + bincount partials ->
    one vocabulary-keyed groupby.  Returns (term, c).  Same kernel shape
    as ``curate.lm_perplexity``'s term-count pass — kept here as THE
    reusable helper (tokenizer semantics ride on ``_split_tokens``, whose
    SQL parity is pinned)."""

    def partial(t: pa.Table) -> pa.Table:
        flat, _, _ = _split_tokens(t.column("text"))
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        cnt = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                          minlength=len(enc.dictionary))
        return pa.table({"term": enc.dictionary,
                         "c_part": pa.array(cnt.astype(np.int64))})

    return docs.map_batches(partial, batch_format="pyarrow").groupby(
        "term").aggregate(Sum("c_part", alias_name="c"))


def _local_bpe(flat: np.ndarray, word_of: np.ndarray, c: np.ndarray,
               n_merges: int) -> list:
    """Driver-local merge loop over a flattened vocab symbol stream —
    the small-vocab fast path of ``bpe_train`` (numpy-vectorized stats,
    identical tie-break and greedy semantics to the distributed loop;
    pytest pins both paths equal)."""
    merges = []
    for rank in range(n_merges):
        if len(flat) < 2:
            break
        same = word_of[:-1] == word_of[1:]
        if not same.any():
            break
        pairs = flat[:-1][same] + " " + flat[1:][same]
        keys, inv = np.unique(pairs, return_inverse=True)
        cnt = np.bincount(inv, weights=c[word_of[:-1][same]]).astype(np.int64)
        # max count, tie to the smallest pair key (keys are ascending, so
        # the FIRST max is the lexicographically smallest)
        best = int(np.flatnonzero(cnt == cnt.max())[0])
        left, right = str(keys[best]).split(" ", 1)
        merged = left + right
        merges.append((rank, left, right, merged, int(cnt[best])))
        flat, word_of = _apply_merge(flat, word_of, left, right, merged)
    return merges


def bpe_train(sf_dir: str, n_merges: int = BPE_MERGES,
              local_max_vocab: int = BPE_LOCAL_MAX_VOCAB) -> pa.Table:
    """Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016): learn
    the ``n_merges`` highest-frequency symbol merges over the corpus.
    Classic semantics: pair statistics count every adjacent symbol
    position weighted by word frequency (overlaps included); applying a
    merge is leftmost-greedy; ties break to the lexicographically
    smallest (left, right).

    Output: one row per learned rule — (rank, left, right, merged, freq)
    with freq the pair count at merge time.  Deterministic, pinned
    against a pure-Python Sennrich reference in pytest (no SQL oracle —
    the merge loop is inherently iterative).

    Scale shape: the ONE corpus-sized pass is the word-frequency
    aggregate (map-side partial counts -> vocabulary-keyed groupby).
    The merge loop then runs over the DISTINCT-WORD table only
    (vocabulary-sized, orders of magnitude below the corpus) on one of
    two pytest-pinned-equal paths: at or below ``local_max_vocab``
    distinct words the whole loop is DRIVER-LOCAL numpy (sub-second —
    per-round Dataset barriers would dominate by 100x); above it each
    round is one vectorized pair-stats pass (dictionary-encoded pair
    keys, weighted bincount partials -> pair-keyed groupby -> per-block
    local winners -> tiny driver reduce) plus one vectorized merge-apply
    pass, with the vocab Dataset re-materialized per round so lineage
    stays flat."""
    docs = read(sf_dir, "documents", columns=["text"])

    vocab = word_frequencies(docs)

    def symbolize(t: pa.Table) -> pa.Table:
        terms = t.column("term").combine_chunks()
        # split each word into single-character symbols: a cast to
        # list<string> via python is vocab-sized, not corpus-sized
        syms = pa.array([list(w) for w in terms.to_pylist()],
                        pa.list_(pa.string()))
        return pa.table({"syms": syms,
                         "c": pc.cast(t.column("c"), pa.int64())})

    vocab = vocab.map_batches(symbolize, batch_format="pyarrow").materialize()

    def _flat(t: pa.Table):
        syms = t.column("syms").combine_chunks()
        off = syms.offsets.to_numpy().astype(np.int64)
        counts = np.diff(off)
        word_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        flat = np.asarray(syms.flatten().to_pylist(), dtype=object)
        return flat, word_of, t.column("c").to_numpy().astype(np.int64)

    def _merge_table(merges: list) -> pa.Table:
        return pa.table({
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "merged": pa.array([m[3] for m in merges], pa.string()),
            "freq": pa.array([m[4] for m in merges], pa.int64()),
        })

    if vocab.count() <= local_max_vocab:
        batches = list(vocab.iter_batches(batch_format="pyarrow"))
        if not batches:  # empty corpus: nothing to merge
            return _merge_table([])
        return _merge_table(_local_bpe(*_flat(pa.concat_tables(batches)),
                                       n_merges))

    merges = []
    for rank in range(n_merges):
        def pair_partial(t: pa.Table) -> pa.Table:
            flat, word_of, c = _flat(t)
            if len(flat) < 2:
                return pa.table({"pair": pa.array([], pa.string()),
                                 "c_part": pa.array([], pa.int64())})
            same = word_of[:-1] == word_of[1:]
            la = pa.array(flat[:-1][same], pa.string())
            ra = pa.array(flat[1:][same], pa.string())
            keys = pc.binary_join_element_wise(la, ra, " ")
            w = c[word_of[:-1][same]]
            enc = keys.dictionary_encode()
            cnt = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                              weights=w, minlength=len(enc.dictionary))
            return pa.table({"pair": enc.dictionary,
                             "c_part": pa.array(cnt.astype(np.int64))})

        stats = vocab.map_batches(
            pair_partial, batch_format="pyarrow").groupby("pair").aggregate(
            Sum("c_part", alias_name="c"))

        def local_winner(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            idx = pc.sort_indices(t, sort_keys=[("c", "descending"),
                                                ("pair", "ascending")])
            return t.take(idx[:1])

        cand = stats.map_batches(local_winner,
                                 batch_format="pyarrow").take_all()
        if not cand:
            break
        best = sorted(cand, key=lambda r: (-int(r["c"]), r["pair"]))[0]
        left, right = str(best["pair"]).split(" ", 1)
        merged = left + right
        merges.append((rank, left, right, merged, int(best["c"])))

        def apply_batch(t: pa.Table, left=left, right=right,
                        merged=merged) -> pa.Table:
            flat, word_of, c = _flat(t)
            flat, word_of = _apply_merge(flat, word_of, left, right, merged)
            counts = np.bincount(word_of, minlength=t.num_rows)
            off = np.zeros(len(counts) + 1, np.int64)
            np.cumsum(counts, out=off[1:])
            syms = pa.ListArray.from_arrays(
                pa.array(off, pa.int64()).cast(pa.int32()),
                pa.array(flat, pa.string()))
            return pa.table({"syms": syms, "c": t.column("c")})

        vocab = vocab.map_batches(apply_batch,
                                  batch_format="pyarrow").materialize()

    return _merge_table(merges)


def bpe_encode(sf_dir: str, merges: pa.Table | None = None,
               n_merges: int = BPE_MERGES) -> "rd.Dataset":
    """Apply a trained BPE merge table to the corpus (the tokenize step a
    training pipeline runs after ``bpe_train``): every doc gets its
    pre-merge simple-token count and its post-merge BPE token count.
    ``merges`` defaults to training on the same corpus first.

    Semantics mirror training exactly: each word is transformed by the
    merge rules IN RANK ORDER with leftmost-greedy application — so a
    corpus word that existed at training time encodes to precisely the
    symbols the trainer left it with (pytest-pinned).

    Scale shape: the merge table broadcasts once; each batch encodes its
    DISTINCT words only (dictionary-encode, then the per-word merge loop
    — vocabulary-bounded per batch, never per occurrence; for
    production-sized merge lists swap the rank-scan for the min-rank
    priority walk) and per-doc counts are one gathered bincount.  One
    corpus pass, no shuffle."""
    if merges is None:
        merges = bpe_train(sf_dir, n_merges=n_merges)
    rules = [(str(l), str(r), str(m)) for l, r, m in
             zip(merges.column("left").to_pylist(),
                 merges.column("right").to_pylist(),
                 merges.column("merged").to_pylist())]
    ref = bput(rules)

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def encode(t: pa.Table) -> pa.Table:
        rl = bget(ref)
        flat, doc_of, n_docs = _split_tokens(t.column("text"))
        enc = flat.dictionary_encode()
        n_len = np.empty(len(enc.dictionary), np.int64)
        for wi, w in enumerate(enc.dictionary.to_pylist()):
            syms = np.asarray(list(w), dtype=object)
            wo = np.zeros(len(syms), np.int64)
            for left, right, merged in rl:
                syms, wo = _apply_merge(syms, wo, left, right, merged)
            n_len[wi] = len(syms)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        per_tok = n_len[codes] if len(codes) else np.array([], np.int64)
        n_bpe = np.bincount(doc_of, weights=per_tok,
                            minlength=n_docs).astype(np.int64)
        n_tok = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_bpe": pa.array(n_bpe, pa.int64()),
        })

    return docs.map_batches(encode, batch_format="pyarrow")
