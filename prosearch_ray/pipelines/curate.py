"""End-to-end corpus curation — the composition a training-data pipeline
actually runs over raw documents: near-duplicate KEEPER filter + quality
gate + language gate, emitting the clean training subset.

Scale shape: the two per-doc signals fuse into ONE ``map_batches`` pass
(no per-signal re-read, no doc-level join); the near-dup LOSER list from
the dedup clustering stays a participants-only DATASET end-to-end and is
applied to the (already heavily gated, text-free) survivor rows — broadcast
once through the object store while it is small, else as one bounded-bucket
hash anti-join on doc_id.  No corpus-sized driver table on any path.  Every
predicate is SQL-expressible, so the whole composition is exact-checked
against DuckDB by the driver."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from prosearch_ray.pipelines.common import read, sql_round
from prosearch_ray.state.broadcast import bget, bput

DEFAULT_MIN_TTR = 0.5
DEFAULT_LANGS = ("de", "en", "es", "fr")
# broadcast the non-keeper id set into the gate stage while it is this many
# rows; above it the dup filter runs as a bounded-bucket hash anti-join
CLEAN_BCAST_MAX_NON_KEEPERS = 4_000_000
CLEAN_ANTI_JOIN_BUCKETS = 64


class _CurateStage:
    """Actor-pool stage: marker lexicons built once; per batch computes
    language prediction + type-token ratio (both vectorized — one Arrow
    tokenize pass feeds the textstats kernels) and applies the language +
    quality gates as numpy masks.  The near-dup gate is applied AFTER this
    stage, on the text-free survivor rows (so the anti-join never shuffles
    document payloads)."""

    def __init__(self, min_ttr: float, keep_langs):
        self.min_ttr = float(min_ttr)
        self.keep_langs = sorted(keep_langs)

    def __call__(self, t: pa.Table) -> pa.Table:
        from prosearch_ray.pipelines.textstats import (_doc_token_stats,
                                                       _lang_scores)
        from prosearch_ray.pipelines.trainprep import _split_tokens

        ids = t.column("doc_id").to_numpy()
        pre = _split_tokens(t.column("text"))
        pred, _, n_tok, _, _ = _lang_scores(t.column("text"), pre=pre)
        _, _, _, _, n_uniq = _doc_token_stats(t.column("text"), pre=pre)
        nz = np.maximum(1, n_tok).astype(np.float64)
        ttr = sql_round(np.where(n_tok > 0, n_uniq / nz, 0.0), 4)
        keep = (np.isin(pred.astype(object), self.keep_langs)
                & (ttr >= self.min_ttr))
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "pred_lang": pa.array(pred[keep].tolist(), pa.string()),
            "ttr": pa.array(ttr[keep], pa.float64()),
        })


def clean_corpus(sf_dir: str, min_ttr: float = DEFAULT_MIN_TTR,
                 keep_langs=DEFAULT_LANGS,
                 bcast_max: int = CLEAN_BCAST_MAX_NON_KEEPERS,
                 n_buckets: int = CLEAN_ANTI_JOIN_BUCKETS) -> "rd.Dataset":
    from prosearch_ray.pipelines.dedup import _mix64, non_keepers_ds

    nk = non_keepers_ds(sf_dir).materialize()
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    survivors = docs.map_batches(
        _CurateStage, fn_constructor_args=(min_ttr, tuple(keep_langs)),
        batch_format="pyarrow", concurrency=2, num_cpus=1)

    if nk.count() <= bcast_max:
        ids = np.sort(np.concatenate(
            [t.column("doc_id").to_numpy() for t in
             nk.iter_batches(batch_format="pyarrow")] or
            [np.array([], np.int64)]).astype(np.int64))
        ref = bput(ids)

        def drop_dups(t: pa.Table) -> pa.Table:
            non_keepers = bget(ref)
            keep = ~np.isin(t.column("doc_id").to_numpy(), non_keepers,
                            assume_unique=True)
            return t.filter(pa.array(keep))

        return survivors.map_batches(drop_dups, batch_format="pyarrow")

    # bounded-bucket hash anti-join: survivor rows (kind=1) and non-keeper
    # rows (kind=0) meet in hash(doc_id) % n_buckets groups; one np.isin per
    # bucket, group count fixed — no corpus-scale broadcast or driver set.
    nb = np.uint64(n_buckets)

    def surv_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        return pa.table({
            "bkt": pa.array((_mix64(ids) % nb).astype(np.int64), pa.int64()),
            "kind": pa.array(np.ones(len(ids), np.int8), pa.int8()),
            "doc_id": pa.array(ids, pa.int64()),
            "pred_lang": t.column("pred_lang"),
            "ttr": t.column("ttr"),
        })

    def nk_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        return pa.table({
            "bkt": pa.array((_mix64(ids) % nb).astype(np.int64), pa.int64()),
            "kind": pa.array(np.zeros(len(ids), np.int8), pa.int8()),
            "doc_id": pa.array(ids, pa.int64()),
            "pred_lang": pa.array([None] * len(ids), pa.string()),
            "ttr": pa.array(np.zeros(len(ids)), pa.float64()),
        })

    def anti(g: pa.Table) -> pa.Table:
        kind = g.column("kind").to_numpy()
        ids = g.column("doc_id").to_numpy()
        drop = np.unique(ids[kind == 0])
        sm = kind == 1
        keep = sm & ~np.isin(ids, drop)
        g = g.filter(pa.array(keep))
        return g.select(["doc_id", "pred_lang", "ttr"])

    both = survivors.map_batches(surv_rows, batch_format="pyarrow").union(
        nk.map_batches(nk_rows, batch_format="pyarrow"))
    return both.groupby("bkt").map_groups(anti, batch_format="pyarrow")


DECON_N = 3         # token n-gram width (real pipelines use ~13; the bench
                    # corpus averages ~54 tokens/doc so 3 keeps the signal)
DECON_EVAL_MOD = 50  # eval set = every doc with doc_id % mod == 0


def _doc_ngrams(col: pa.ChunkedArray, n: int):
    """Within-doc token n-grams — the shared kernel lives in
    ``trainprep.doc_ngrams`` (one definition for curate / dedup /
    trainprep gram semantics)."""
    from prosearch_ray.pipelines.trainprep import doc_ngrams

    return doc_ngrams(col, n)


def decontaminate(sf_dir: str, n: int = DECON_N,
                  eval_mod: int = DECON_EVAL_MOD) -> "rd.Dataset":
    """Benchmark decontamination — the pre-training hygiene pass that flags
    training documents sharing any token ``n``-gram with a held-out eval
    set (here the deterministic ``doc_id % eval_mod == 0`` subset, so the
    DuckDB oracle reproduces it; in production the eval set is the actual
    benchmark suite).

    Scale shape: the eval side is SMALL by definition (a fixed benchmark,
    not a corpus-sized table), so its distinct n-gram set is collected once
    and broadcast via the object store — the corpus pass is then a pure
    ``map_batches`` with a vectorized Arrow ``is_in`` membership probe: no
    shuffle, no join, one streaming read of the training corpus.  Per doc
    it emits the count of DISTINCT overlapping n-grams (``n_hits``) and a
    0/1 ``contaminated`` flag; the caller drops flagged docs or routes them
    to review."""
    import pyarrow.compute as pc

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def eval_grams(t: pa.Table) -> pa.Table:
        t = t.filter(pa.array(t.column("doc_id").to_numpy() % eval_mod == 0))
        grams, _ = _doc_ngrams(t.column("text"), n)
        return pa.table({"g": pc.unique(grams)})

    ev: set = set()
    for tbl in docs.map_batches(
            eval_grams, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        ev.update(tbl.column("g").to_pylist())
    ref = bput(pa.array(sorted(ev), pa.string()))

    def probe(t: pa.Table) -> pa.Table:
        ev_arr = bget(ref)
        t = t.filter(pa.array(t.column("doc_id").to_numpy() % eval_mod != 0))
        ids = t.column("doc_id").to_numpy()
        grams, doc_of = _doc_ngrams(t.column("text"), n)
        hit = pc.is_in(grams, value_set=ev_arr).to_numpy(
            zero_copy_only=False)
        n_hits = np.zeros(len(ids), np.int64)
        if hit.any():
            enc = pc.dictionary_encode(grams.filter(pa.array(hit)))
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy().astype(np.int64)
            # distinct (doc, gram) pairs -> per-doc distinct-hit counts
            uniq = np.unique(doc_of[hit] * len(enc.dictionary) + codes)
            n_hits = np.bincount(uniq // len(enc.dictionary),
                                 minlength=len(ids)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_hits": pa.array(n_hits, pa.int64()),
            "contaminated": pa.array((n_hits > 0).astype(np.int64),
                                     pa.int64()),
        })

    return docs.map_batches(probe, batch_format="pyarrow")


BOILER_N = 3        # boilerplate n-gram width
BOILER_MIN_DF = 5   # gram is boilerplate if it appears in >= this many docs
                    # (real pipelines use corpus-relative thresholds; the
                    # bench documents table maxes out at df=7 per gram at
                    # sf0.01, so 5 keeps the driver check non-trivial)
BOILER_MAX_SHARE = 0.1  # doc flagged when its boilerplate share reaches this
                        # (bench corpus max share is ~0.28)


def boilerplate_flags(sf_dir: str, n: int = BOILER_N,
                      min_df: int = BOILER_MIN_DF,
                      max_share: float = BOILER_MAX_SHARE) -> "rd.Dataset":
    """Corpus-level boilerplate gate (C4/CCNet-style): find token n-grams
    shared by >= ``min_df`` distinct documents (navigation chrome, license
    headers, generated scaffolding), then flag documents whose occurrence
    share of such grams reaches ``max_share``.  The across-doc complement
    of ``textstats.repetition_stats`` (within-doc repetition).

    Scale shape: pass 1 computes per-gram DOCUMENT frequency with map-side
    partials (distinct (doc, gram) inside each batch via one
    dictionary-encode + bincount — no per-row Python) feeding one bounded
    ``groupby(gram).sum`` of (gram, partial_count) rows; the df-filtered
    boilerplate set is a Zipf heavy-hitter tail — tiny relative to the
    corpus — and broadcasts once through the object store.  Pass 2 is a
    pure streaming ``map_batches`` probe (vectorized ``is_in`` + bincount),
    no shuffle.  Both the gram semantics and the rounding are DuckDB-exact,
    so the driver value-checks the whole composition.

    The two passes each scan + re-tokenize the corpus; fusing them (the
    minhash-style cached intermediate) was measured and REJECTED: the
    reusable intermediate here is the full gram stream, which is LARGER
    than the (column-pruned) corpus read it would save — minhash's cache
    works because distinct per-doc shingle hashes are far smaller than the
    text.  Tokenize is vectorized Arrow (2.35 s for both passes at sf0.1 /
    32 CPUs), so the second scan is I/O-shaped and streams."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial_df(t: pa.Table) -> pa.Table:
        grams, doc_of = _doc_ngrams(t.column("text"), n)
        if len(grams) == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(grams)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        nd = len(enc.dictionary)
        uniq = np.unique(doc_of * nd + codes)  # distinct (doc, gram) pairs
        return pa.table({
            "g": enc.dictionary,
            "c": pa.array(np.bincount(uniq % nd, minlength=nd), pa.int64()),
        })

    df = docs.map_batches(partial_df, batch_format="pyarrow").groupby(
        "g").aggregate(Sum("c", alias_name="df"))

    def thresh(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t.column("df"),
                             pa.scalar(min_df))).select(["g"])

    bp: set = set()
    for tbl in df.map_batches(thresh, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        bp.update(tbl.column("g").to_pylist())
    ref = bput(pa.array(sorted(bp), pa.string()))

    def score(t: pa.Table) -> pa.Table:
        bp_arr = bget(ref)
        ids = t.column("doc_id").to_numpy()
        grams, doc_of = _doc_ngrams(t.column("text"), n)
        n_grams = np.bincount(doc_of, minlength=len(ids)).astype(np.int64)
        n_boiler = np.zeros(len(ids), np.int64)
        if len(grams):
            hit = pc.is_in(grams, value_set=bp_arr).to_numpy(
                zero_copy_only=False)
            if hit.any():
                n_boiler = np.bincount(
                    doc_of[hit], minlength=len(ids)).astype(np.int64)
        share = sql_round(
            n_boiler / np.maximum(1, n_grams).astype(np.float64), 4)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_boiler": pa.array(n_boiler, pa.int64()),
            "boiler_share": pa.array(share, pa.float64()),
            "flagged": pa.array((share >= max_share).astype(np.int64),
                                pa.int64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


# per-lang sampling rates (percent) for the deterministic stratified sample
SAMPLE_RATES = {"en": 60, "de": 40, "fr": 25, "zh": 10}


def stratified_sample(sf_dir: str, rates=None) -> "rd.Dataset":
    """Deterministic stratified downsampling — the standard corpus-mixing
    step of a training-data pipeline: keep a doc iff
    ``md5_number_lower(doc_id) % 100 < rate[lang]``.  Pure per-row filter
    (no shuffle, no state); the hash convention matches DuckDB's
    ``md5_number_lower`` so the driver exact-checks the kept set."""
    import hashlib

    rates = dict(SAMPLE_RATES if rates is None else rates)

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        langs = t.column("lang").to_pylist()
        mask = []
        for i, lang in zip(ids, langs):
            h = int.from_bytes(
                hashlib.md5(str(i).encode()).digest()[8:], "little")
            mask.append(h % 100 < rates.get(lang, 0))
        t = t.filter(pa.array(mask))
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang": t.column("lang")})

    docs = read(sf_dir, "documents", columns=["doc_id", "lang"])
    return docs.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# CCNet-style language-model quality scoring

LM_VOCAB_TOP_K = 50_000  # scale-path broadcast cap (terms kept in the LM)


def lm_perplexity(sf_dir: str, vocab_top_k: int | None = LM_VOCAB_TOP_K
                  ) -> "rd.Dataset":
    """CCNet-style LM quality score: a Laplace-smoothed unigram LM is fit on
    the corpus itself and every doc gets its average negative log-likelihood
    (low = fluent/common, high = rare/garbled — the CCNet perplexity-filter
    signal, with the corpus unigram LM standing in for the external KenLM).

    p(t) = (c(t) + 1) / (T + V) with c = corpus term count, T = total
    tokens, V = distinct terms; ``avg_nll = round(-mean(ln p), 4)``.

    Scale shape: pass 1 is map-side partial term counts -> one
    vocabulary-keyed groupby -> tiny (T, V) rollup; the LM broadcast is
    bounded by ``vocab_top_k`` (distributed per-block top-k + tiny merge,
    the term_df pattern; terms outside the cap score as c = 0 with T and V
    unchanged).  Pass 2 is a pure vectorized probe (``index_in`` against
    the broadcast term table + bincount-weighted per-doc sums) — no
    shuffle, no Python rows.  ``vocab_top_k=None`` broadcasts the full
    vocabulary (exact; the SQL-oracle config — only sane below ~1M terms).
    """
    from ray.data.aggregate import Sum

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        from prosearch_ray.pipelines.trainprep import _split_tokens

        flat, _, _ = _split_tokens(t.column("text"))
        denc = flat.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        cnt = np.bincount(denc.indices.to_numpy(zero_copy_only=False),
                          minlength=len(denc.dictionary))
        return pa.table({"term": denc.dictionary,
                         "c_part": pa.array(cnt, pa.int64())})

    agg = docs.map_batches(partial, batch_format="pyarrow").groupby(
        "term").aggregate(Sum("c_part", alias_name="c")).materialize()

    # tiny (T, V) rollup: one row per aggregated block
    def tv_part(t: pa.Table) -> pa.Table:
        c = pc.cast(t.column("c"), pa.int64())
        return pa.table({
            "T_part": pa.array([int(pc.sum(c).as_py() or 0)], pa.int64()),
            "V_part": pa.array([t.num_rows], pa.int64())})

    tv = pa.concat_tables(list(agg.map_batches(
        tv_part, batch_format="pyarrow").iter_batches(batch_format="pyarrow")))
    T = int(pc.sum(tv.column("T_part")).as_py() or 0)
    V = int(pc.sum(tv.column("V_part")).as_py() or 0)

    if vocab_top_k is None:
        lm = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    else:
        k = int(vocab_top_k)

        def local_topk(t: pa.Table) -> pa.Table:
            if t.num_rows <= k:
                return t
            idx = pc.sort_indices(t, sort_keys=[("c", "descending"),
                                                ("term", "ascending")])
            return t.take(idx[:k])

        cand = pa.concat_tables(list(agg.map_batches(
            local_topk,
            batch_format="pyarrow").iter_batches(batch_format="pyarrow")))
        if cand.num_rows > k:
            idx = pc.sort_indices(cand, sort_keys=[("c", "descending"),
                                                   ("term", "ascending")])
            cand = cand.take(idx[:k])
        lm = cand

    ref = bput((lm.column("term").combine_chunks(),
                pc.cast(lm.column("c"), pa.int64()).combine_chunks()
                .to_numpy().astype(np.float64)))
    denom = float(T + V)

    def score(t: pa.Table) -> pa.Table:
        from prosearch_ray.pipelines.trainprep import _split_tokens

        terms, counts = bget(ref)
        flat, doc_of, n_docs = _split_tokens(t.column("text"))
        idx = pc.index_in(flat, value_set=terms)
        # index_in yields nulls for misses; fill with -1 then mask
        filled = pc.fill_null(idx, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.where(filled >= 0, counts[np.maximum(filled, 0)], 0.0)
        lp = np.log((c + 1.0) / denom)
        sums = np.bincount(doc_of, weights=lp, minlength=n_docs)
        n = np.bincount(doc_of, minlength=n_docs)
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        keep = n > 0
        avg_nll = sql_round(-(sums[keep] / n[keep]), 4)
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_tokens": pa.array(n[keep].astype(np.int64), pa.int64()),
            "avg_nll": pa.array(avg_nll, pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


RESERVOIR_N = 20  # docs kept per source


def reservoir_sample(sf_dir: str, n: int = RESERVOIR_N) -> pa.Table:
    """Exact-n deterministic per-source sample — the balanced-mix
    counterpart of ``stratified_sample`` (rates give *proportions*; a
    training mix often needs *exactly n* docs per source regardless of
    source size).  A doc is kept iff it ranks in its source's first ``n``
    by ``md5_number_lower(doc_id)`` (the repo's DuckDB-checkable hash
    order — a uniform deterministic permutation, so the sample is an
    unbiased without-replacement draw).

    Scale shape: per-block local top-n per source (sources are bounded;
    hash ranks need no global order), then a tiny driver merge of
    ``<= n x n_sources`` rows per block — the ``topk_orders`` pattern.
    No shuffle, no corpus-sized state."""
    import hashlib

    docs = read(sf_dir, "documents", columns=["doc_id", "source"])

    def local(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        hv = [int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:],
                             "little") for i in ids]
        # split the 64-bit hash into exact int64 halves (float64 would
        # round away low bits and could mis-order vs the exact SQL compare)
        hi = np.array([h >> 32 for h in hv], dtype=np.int64)
        lo = np.array([h & 0xFFFFFFFF for h in hv], dtype=np.int64)
        src = t.column("source").to_numpy(zero_copy_only=False)
        ids64 = np.asarray(ids, dtype=np.int64)
        order = np.lexsort((ids64, lo, hi, src))
        s_s = src[order]
        starts = np.flatnonzero(np.concatenate(([True], s_s[1:] != s_s[:-1])))
        sizes = np.diff(np.append(starts, len(s_s)))
        rnk = np.arange(len(s_s)) - np.repeat(starts, sizes)
        idx = order[rnk < n]
        return pa.table({
            "source": pa.array(src[idx].tolist(), pa.string()),
            "doc_id": pa.array(ids64[idx], pa.int64()),
            "h_hi": pa.array(hi[idx], pa.int64()),
            "h_lo": pa.array(lo[idx], pa.int64()),
        })

    cand = pa.concat_tables(list(docs.map_batches(
        local, batch_format="pyarrow").iter_batches(batch_format="pyarrow")))
    src = cand.column("source").to_numpy(zero_copy_only=False)
    ids = cand.column("doc_id").to_numpy()
    order = np.lexsort((ids, cand.column("h_lo").to_numpy(),
                        cand.column("h_hi").to_numpy(), src))
    s_s = src[order]
    starts = np.flatnonzero(np.concatenate(([True], s_s[1:] != s_s[:-1])))
    sizes = np.diff(np.append(starts, len(s_s)))
    rnk = np.arange(len(s_s)) - np.repeat(starts, sizes)
    idx = order[rnk < n]
    out = pa.table({
        "source": pa.array(src[idx].tolist(), pa.string()),
        "doc_id": pa.array(ids[idx], pa.int64()),
        "rn": pa.array((rnk[rnk < n] + 1).astype(np.int64), pa.int64()),
    })
    return out.sort_by([("source", "ascending"), ("doc_id", "ascending")])


# PII redaction presets — the patterns a training-data scrub pass runs by
# default (all RE2 syntax, so the DuckDB oracle's regexp_* functions — also
# RE2 — apply them with IDENTICAL match semantics)
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d{1,2}[ .-]?\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_text(sf_dir: str, patterns=PII_PATTERNS) -> "rd.Dataset":
    """PII / pattern redaction over ``documents.text`` — the scrub pass a
    training pipeline runs before releasing a corpus: each (name, regex,
    replacement) is applied IN ORDER (each pattern sees the previous
    pattern's replacements — so e.g. an email is never double-counted as
    a phone number once redacted), emitting the cleaned text plus one
    ``n_<name>`` count column per pattern (non-overlapping match counts,
    the ``regexp_extract_all`` convention).

    Scale shape: one stateless vectorized ``map_batches`` pass — RE2
    kernels (``count_substring_regex`` / ``replace_substring_regex``) over
    the whole batch column, no per-row Python, no shuffle, no state."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    pats = [(str(n), str(p), str(r)) for n, p, r in patterns]

    def scrub(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        counts = {}
        for name, pat, repl in pats:
            counts[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(txt, pat), pa.int64())
            txt = pc.replace_substring_regex(txt, pat, repl)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        return pa.table({"doc_id": t.column("doc_id"),
                         "clean_text": txt, **counts})

    return docs.map_batches(scrub, batch_format="pyarrow")


# DSIR defaults: hashed-feature dimension and the target domain selector.
# dim is deliberately small at test scale so the oracle's per-bucket CTEs
# stay cheap; production uses 10k+ buckets (the paper's setting) — the
# pipeline shape is dim-independent (every exchange is dim-sized).
DSIR_DIM = 128
DSIR_TARGET_LANG = "en"


def _dsir_feats(col, dim: int):
    """Hashed unigram+bigram feature occurrences of a text column:
    ``(doc_of, bucket)`` per occurrence + batch doc count.  Features hash
    token -> md5 % dim with the DuckDB ``md5_number_lower`` convention
    (digest[8:] little-endian, same as trainprep.doc_vectors), computed
    once per DISTINCT feature per batch via dictionary-encode."""
    import hashlib

    from prosearch_ray.pipelines.trainprep import _split_tokens, doc_ngrams

    pre = _split_tokens(col)
    flat, doc_of, n_docs = pre
    bi, bi_doc = doc_ngrams(col, 2, pre=pre)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    feats = pa.concat_arrays([flat, bi])
    fdoc = np.concatenate([doc_of, bi_doc]) if len(feats) else doc_of
    enc = feats.dictionary_encode()
    hd = np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[8:],
                        "little") % dim
         for s in enc.dictionary.to_pylist()),
        dtype=np.int64, count=len(enc.dictionary))
    codes = enc.indices.to_numpy(zero_copy_only=False)
    buckets = hd[codes] if len(codes) else np.array([], np.int64)
    return fdoc.astype(np.int64), buckets, n_docs


def dsir_weights(sf_dir: str, dim: int = DSIR_DIM,
                 target_lang: str = DSIR_TARGET_LANG) -> "rd.Dataset":
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): every document gets the
    log importance ratio of a hashed-n-gram bag-of-features model fit on a
    TARGET domain (here: the corpus' ``lang = target_lang`` slice) vs the
    RAW corpus —

        logw(doc) = sum_b tf_b * [ln p_target(b) - ln p_raw(b)]

    with Laplace-smoothed bucket probabilities p(b) = (c_b + 1)/(total +
    dim) over unigram+bigram features hashed to ``dim`` buckets.  High
    logw = "looks like the target domain"; a selection pass keeps the
    top-weighted docs (the resampling step is a trivial weighted sample on
    this column).

    Scale shape: pass 1 is map-side dim-sized bucket-count partials (raw
    and target counted in the same pass) -> one dim-sized groupby -> a
    dim-sized log-ratio vector broadcast once; pass 2 is a pure vectorized
    probe (per-doc tf via np.unique + per-doc SEQUENTIAL bucket-ascending
    sums via np.add.reduceat, matching the oracle's ``sum(... ORDER BY
    b)`` bit-for-bit).  No corpus shuffle on either pass.  The corpus is
    tokenized twice (once per pass) — same measured trade as
    boilerplate_flags: the per-occurrence feature stream is larger than
    the column-pruned re-read it would save."""
    from ray.data.aggregate import Sum

    docs = read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    arange = pa.array(np.arange(dim, dtype=np.int64), pa.int64())

    def bucket_partial(t: pa.Table) -> pa.Table:
        fdoc, buckets, _ = _dsir_feats(t.column("text"), dim)
        is_tgt = pc.equal(t.column("lang"), target_lang).to_numpy(
            zero_copy_only=False).astype(bool)
        raw = np.bincount(buckets, minlength=dim)
        tgt = (np.bincount(buckets[is_tgt[fdoc]], minlength=dim)
               if len(fdoc) else np.zeros(dim, np.int64))
        return pa.table({"b": arange,
                         "raw_part": pa.array(raw.astype(np.int64)),
                         "tgt_part": pa.array(tgt.astype(np.int64))})

    rows = docs.map_batches(bucket_partial, batch_format="pyarrow").groupby(
        "b").aggregate(Sum("raw_part", alias_name="raw"),
                       Sum("tgt_part", alias_name="tgt")).take_all()
    raw = np.zeros(dim, np.float64)
    tgt = np.zeros(dim, np.float64)
    for r in rows:
        raw[int(r["b"])] = float(r["raw"])
        tgt[int(r["b"])] = float(r["tgt"])
    # exactly the oracle's expression order: (c + 1) / (tot + dim), ln,
    # subtract — so the float64 vector is bit-identical to DuckDB's
    lam = (np.log((tgt + 1.0) / (tgt.sum() + dim))
           - np.log((raw + 1.0) / (raw.sum() + dim)))
    ref = bput(lam)

    def score(t: pa.Table) -> pa.Table:
        lam_l = bget(ref)
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        fdoc, buckets, n = _dsir_feats(t.column("text"), dim)
        keys, tf = np.unique(fdoc * dim + buckets, return_counts=True)
        d_i = (keys // dim).astype(np.int64)
        contrib = tf.astype(np.float64) * lam_l[(keys % dim).astype(np.int64)]
        logw = np.zeros(n, np.float64)
        if len(d_i):
            udocs, dstart = np.unique(d_i, return_index=True)
            # sequential left-to-right segment sums, buckets ascending
            # within each doc (np.unique key order) == sum(ORDER BY b)
            logw[udocs] = np.add.reduceat(contrib, dstart)
        nf = np.bincount(fdoc, minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_feats": pa.array(nf, pa.int64()),
            "logw": pa.array(sql_round(logw, 4), pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")
