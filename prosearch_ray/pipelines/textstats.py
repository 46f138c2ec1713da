"""Text-analysis operators over ``documents``: language-ID, quality scoring,
document fingerprinting.  All three are SQL-checkable: the marker heuristic,
the quality features and the winnowing scheme are each expressed in DuckDB
(see __ray_entry__.oracle_sql) and exact-matched by the driver.

All kernels are VECTORIZED per batch: tokenization is one Arrow regex split
(``trainprep._split_tokens``), marker membership is ``pc.is_in`` + bincount,
per-doc distinct counts come from one lexsort, and gram hashing dict-encodes
so each distinct gram is md5'd once per batch — no per-token Python loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from prosearch_ray.pipelines.common import read, sql_round
from prosearch_ray.pipelines.trainprep import _split_tokens
from prosearch_ray.state.broadcast import bget, bput

# Tiny per-language marker lexicons (n-gram/stopword heuristic). The testdata
# text is synthetic English-ish for every lang value, so this demonstrates the
# operator shape (per-language score vectors, argmax, confidence) rather than
# real discrimination power.
LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "value", "table"},
    "de": {"der", "die", "das", "und", "nicht", "ist", "mit", "ein"},
    "fr": {"le", "la", "les", "et", "est", "une", "des", "pas"},
    "es": {"el", "la", "los", "que", "de", "es", "una", "por"},
    "zh": set(),  # no latin markers; falls through to byte heuristic
}

_CJK_RE = "[一-鿿]"  # same range as the "一" <= ch <= "鿿" heuristic


def _doc_token_stats(col, pre=None):
    """Vectorized per-doc token statistics from one Arrow tokenize pass:
    returns ``(flat_tokens, doc_of, n_docs, n_tok, n_uniq)`` where distinct
    counts come from one (doc, token-code) lexsort — no Python sets.
    ``pre`` lets a caller share an existing ``_split_tokens(col)`` result."""
    flat, doc_of, n = pre if pre is not None else _split_tokens(col)
    n_tok = np.bincount(doc_of, minlength=n).astype(np.int64)
    codes = flat.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    order = np.lexsort((codes, doc_of))
    d_s, c_s = doc_of[order], codes[order]
    first = np.ones(len(d_s), bool)
    first[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
    n_uniq = np.bincount(d_s[first], minlength=n).astype(np.int64)
    return flat, doc_of, n, n_tok, n_uniq


def _lang_scores(col, pre=None):
    """Vectorized marker-score language prediction for a string column:
    one ``pc.is_in`` + bincount per language, argmax over the sorted-lang
    score matrix (ties -> alphabetically first, like the scalar reference),
    CJK short-circuit via one regex over the first 200 codepoints.
    Returns ``(pred: object ndarray, conf, n_tok, doc_of, flat)``.
    ``pre`` lets a caller share an existing ``_split_tokens(col)`` result."""
    flat, doc_of, n = pre if pre is not None else _split_tokens(col)
    n_tok = np.bincount(doc_of, minlength=n).astype(np.int64)
    denom = np.maximum(1, n_tok).astype(np.float64)
    langs = sorted(k for k in LANG_MARKERS if LANG_MARKERS[k])
    score = np.zeros((n, len(langs)))
    for j, lang in enumerate(langs):
        member = pc.is_in(
            flat, value_set=pa.array(sorted(LANG_MARKERS[lang]))
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        score[:, j] = np.bincount(doc_of, weights=member, minlength=n) / denom
    best = np.argmax(score, axis=1)  # first max == smallest lang name
    conf = score[np.arange(n), best] if n else np.array([], np.float64)
    pred = np.array(langs, dtype=object)[best] if n else np.array([], object)
    cjk = pc.match_substring_regex(
        pc.utf8_slice_codeunits(col, 0, 200), _CJK_RE
    ).to_numpy(zero_copy_only=False)
    pred = np.where(cjk, "zh", pred)
    conf = np.where(cjk, 1.0, conf)
    return pred, conf, n_tok, doc_of, flat


class LangId:
    """Stateful actor-pool stage (marker tables built once per actor)."""

    def __init__(self):
        self.langs = sorted(k for k in LANG_MARKERS if LANG_MARKERS[k])

    def __call__(self, t: pa.Table) -> pa.Table:
        pred, conf, _, _, _ = _lang_scores(t.column("text"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "pred_lang": pa.array(pred.tolist(), pa.string()),
            "confidence": pa.array(sql_round(conf, 4), pa.float64()),
        })


def lang_id(sf_dir: str) -> "rd.Dataset":
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(LangId, batch_format="pyarrow",
                            concurrency=2, num_cpus=1)


def quality_score(sf_dir: str) -> "rd.Dataset":
    """Quality features per doc: token count, distinct count, type-token
    ratio, mean token length — all SQL-expressible for the oracle."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        flat, doc_of, n, n_tok, n_uniq = _doc_token_stats(t.column("text"))
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        sum_len = np.bincount(doc_of, weights=lens.astype(np.float64),
                              minlength=n)
        nz = np.maximum(1, n_tok).astype(np.float64)
        ttr = np.where(n_tok > 0, n_uniq / nz, 0.0)
        mean_len = np.where(n_tok > 0, sum_len / nz, 0.0)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_uniq": pa.array(n_uniq, pa.int64()),
            "ttr": pa.array(sql_round(ttr, 4), pa.float64()),
            "mean_tok_len": pa.array(sql_round(mean_len, 4), pa.float64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def _seg_reduce(keys: np.ndarray, counts: np.ndarray, K: int, n: int):
    """Per-doc (max, dup-sum) over sorted combined (doc*K + code) unique
    keys: segmented reduceat on the doc boundaries — no Python loops."""
    max_c = np.zeros(n, np.int64)
    dup_c = np.zeros(n, np.int64)
    if len(keys):
        docs_u = (keys // K).astype(np.int64)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(docs_u)) + 1))
        present = docs_u[starts]
        max_c[present] = np.maximum.reduceat(counts, starts)
        dup_c[present] = np.add.reduceat(
            np.where(counts >= 2, counts, 0), starts)
    return max_c, dup_c


def repetition_stats(sf_dir: str) -> "rd.Dataset":
    """Gopher-style repetition filters per doc: the fraction of tokens
    taken by the single most frequent unigram (``top_unigram_frac``), the
    same for bigrams (``top_bigram_frac``), and the fraction of bigram
    occurrences whose bigram occurs more than once (``dup_bigram_frac``)
    — the standard 'boilerplate / repeated-span' quality gates a training
    pipeline applies before sampling.  Pure per-batch map (no shuffle);
    per-(doc, gram) counts come from one np.unique over combined integer
    keys, per-doc maxima from segmented reduceat."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        flat, doc_of, n = _split_tokens(t.column("text"))
        n_tok = np.bincount(doc_of, minlength=n).astype(np.int64)

        codes = flat.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        K = max(1, int(codes.max()) + 1) if len(codes) else 1
        uk, uc = np.unique(doc_of * K + codes, return_counts=True)
        max_uni, _ = _seg_reduce(uk, uc, K, n)

        L = len(flat)
        if L >= 2:
            span = L - 1
            grams = pc.binary_join_element_wise(
                flat.slice(0, span), flat.slice(1, span), " ")
            same = doc_of[:span] == doc_of[1:]
            grams = grams.filter(pa.array(same))
            gdoc = doc_of[:span][same]
        else:
            grams, gdoc = pa.array([], pa.string()), np.array([], np.int64)
        n_big = np.bincount(gdoc, minlength=n).astype(np.int64)
        bcodes = grams.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        K2 = max(1, int(bcodes.max()) + 1) if len(bcodes) else 1
        bk, bc = np.unique(gdoc * K2 + bcodes, return_counts=True)
        max_big, dup_big = _seg_reduce(bk, bc, K2, n)

        uden = np.maximum(1, n_tok).astype(np.float64)
        bden = np.maximum(1, n_big).astype(np.float64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "top_unigram_frac": pa.array(
                sql_round(np.where(n_tok > 0, max_uni / uden, 0.0), 4),
                pa.float64()),
            "top_bigram_frac": pa.array(
                sql_round(np.where(n_big > 0, max_big / bden, 0.0), 4),
                pa.float64()),
            "dup_bigram_frac": pa.array(
                sql_round(np.where(n_big > 0, dup_big / bden, 0.0), 4),
                pa.float64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def fingerprint(sf_dir: str, kgram: int = 4, window: int = 5) -> "rd.Dataset":
    """Winnowing document fingerprints (k-gram hashes, per-window minimum) —
    the rolling-hash fingerprinting operator.  The gram hash is the first 16
    hex chars of md5 (any 64-bit PRF works for winnowing; md5 keeps the
    DuckDB oracle bit-exact — fixed-width hex compares lexicographically ==
    numerically).  Grams are built batch-wide with one element-wise Arrow
    join of shifted token slices, each DISTINCT gram is md5'd once per batch
    (dictionary-encode), and window mins are a vectorized shifted-slice
    minimum per doc."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        import hashlib

        flat, doc_of, n = _split_tokens(t.column("text"))
        L = len(flat)
        if L >= kgram:
            span = L - kgram + 1
            parts = [flat.slice(i, span) for i in range(kgram)]
            grams = pc.binary_join_element_wise(*parts, " ")
            gdoc = doc_of[:span]
            same = gdoc == doc_of[kgram - 1:]
            grams = grams.filter(pa.array(same))
            gdoc = gdoc[same]
        else:
            grams, gdoc = pa.array([], pa.string()), np.array([], np.int64)
        denc = grams.dictionary_encode()
        hd = np.fromiter(
            (int(hashlib.md5(g.encode()).hexdigest()[:16], 16)
             for g in denc.dictionary.to_pylist()),
            dtype=np.uint64, count=len(denc.dictionary))
        h_flat = hd[denc.indices.to_numpy(zero_copy_only=False)] \
            if len(denc) else np.array([], np.uint64)
        counts = np.bincount(gdoc, minlength=n)
        ends = np.cumsum(counts)
        starts = ends - counts
        n_fp = np.zeros(n, np.int64)
        min_fp = [""] * n
        for d in range(n):
            hs = h_flat[starts[d]:ends[d]]
            if not len(hs):
                continue
            m = len(hs)
            span_d = max(1, m - window + 1)  # one truncated window if m<window
            mins = hs[:span_d].copy()
            for off in range(1, min(window, m)):
                end = min(off + span_d, m)
                np.minimum(mins[:end - off], hs[off:end],
                           out=mins[:end - off])
            fps = np.unique(mins)
            n_fp[d] = len(fps)
            min_fp[d] = f"{int(fps[0]):016x}"
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_fingerprints": pa.array(n_fp, pa.int64()),
            "min_fingerprint": pa.array(min_fp, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


# BPE-ish pre-tokenizer regex (GPT-2 pre-tokenizer family, RE2-compatible —
# no lookahead so pyarrow (RE2) and DuckDB (RE2) count identically): a piece
# is an optional leading space followed by a letter / digit / punctuation run
# CAPPED at 4 chars — the bounded-piece-length proxy for a learned BPE
# vocabulary (long words split into several pieces, like real BPE output).
BPE_PATTERN = r" ?[a-zA-Z]{1,4}| ?[0-9]{1,4}| ?[^a-zA-Z0-9 ]{1,4}"
_WS_PATTERN = r"[^ ]+"


def token_count_bpe(sf_dir: str) -> "rd.Dataset":
    """Per-doc token counts under BOTH counting conventions a training-data
    budget needs: whitespace tokens (``n_ws``) and BPE-ish pre-tokenizer
    pieces (``n_bpe``, GPT-2-style regex) plus ``n_chars``.  One vectorized
    ``pyarrow.compute.count_substring_regex`` pass per convention — no
    shuffle, no Python rows."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        n_ws = pc.count_substring_regex(txt, _WS_PATTERN)
        n_bpe = pc.count_substring_regex(txt, BPE_PATTERN)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_ws": pc.cast(n_ws, pa.int64()),
            "n_bpe": pc.cast(n_bpe, pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


SKETCH_K = 64  # bottom-k sketch size (KMV)


def distinct_sketch(sf_dir: str, k: int = SKETCH_K) -> pa.Table:
    """Per-source distinct-token cardinality via a bottom-k (KMV) sketch —
    the mergeable sketch a 100 TB pipeline uses where an exact
    ``count(DISTINCT ...)`` would shuffle the full vocabulary: keep the k
    smallest ``md5_number_lower(term)`` values per source; the k-th
    smallest hash ``hk`` estimates distinct count as
    ``round((k-1) * 2^64 / hk)`` (sources with fewer than k distinct terms
    report exactly).  The hash is the repo's DuckDB-checkable md5
    convention, so the driver oracle replicates every row INCLUDING the
    estimate — a deterministic sketch, not a sampled one.

    Scale shape: per-batch bottom-k partials per source (distinct terms
    dict-encode once, one md5 per distinct term per batch), merged on the
    driver from ``<= k x n_sources`` rows per block — sketches are unions
    of hash sets, so merge = dedup + bottom-k, associative and exact.  No
    shuffle, no vocabulary-sized state anywhere."""
    import hashlib

    docs = read(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        flat, doc_of, n = _split_tokens(t.column("text"))
        src = t.column("source").to_numpy(zero_copy_only=False)
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        nd = len(enc.dictionary)
        if not nd:
            return pa.table({"source": pa.array([], pa.string()),
                             "hv": pa.array([], pa.uint64())})
        hv_dict = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
             for s in enc.dictionary.to_pylist()),
            dtype=np.uint64, count=nd)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (source, term-hash) pairs of this batch
        pair_src = src[doc_of]
        order = np.lexsort((hv_dict[codes], pair_src))
        s_s, h_s = pair_src[order], hv_dict[codes][order]
        first = np.concatenate(([True], (s_s[1:] != s_s[:-1])
                                | (h_s[1:] != h_s[:-1])))
        s_s, h_s = s_s[first], h_s[first]
        # bottom-k per source: pairs are (source, hash)-sorted already
        starts = np.flatnonzero(np.concatenate(([True],
                                                s_s[1:] != s_s[:-1])))
        sizes = np.diff(np.append(starts, len(s_s)))
        rnk = np.arange(len(s_s)) - np.repeat(starts, sizes)
        keep = rnk < k
        return pa.table({"source": pa.array(s_s[keep].tolist(), pa.string()),
                         "hv": pa.array(h_s[keep], pa.uint64())})

    cand = pa.concat_tables(list(docs.map_batches(
        partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")))
    src = cand.column("source").to_numpy(zero_copy_only=False)
    hv = cand.column("hv").to_numpy()
    order = np.lexsort((hv, src))
    s_s, h_s = src[order], hv[order]
    first = np.concatenate(([True], (s_s[1:] != s_s[:-1])
                            | (h_s[1:] != h_s[:-1])))
    s_s, h_s = s_s[first], h_s[first]
    starts = np.flatnonzero(np.concatenate(([True], s_s[1:] != s_s[:-1])))
    sizes = np.diff(np.append(starts, len(s_s)))
    rnk = np.arange(len(s_s)) - np.repeat(starts, sizes)
    keep = rnk < k
    s_k, h_k, r_k = s_s[keep], h_s[keep], rnk[keep]
    srcs = s_k[np.flatnonzero(np.concatenate(
        ([True], s_k[1:] != s_k[:-1])))]
    out_n, out_hk, out_est = [], [], []
    for s in srcs:
        m = s_k == s
        kk = int(m.sum())
        hk = int(h_k[m][kk - 1])
        out_n.append(kk)
        out_hk.append(hk)
        if kk < k:
            est = float(kk)
        else:
            # exactly the SQL expression round((k-1) * 2^64 / hk)
            est = float(sql_round(
                np.array([(k - 1) * 18446744073709551616.0 / hk]), 0)[0])
        out_est.append(est)
    return pa.table({
        "source": pa.array(srcs.tolist(), pa.string()),
        "k_used": pa.array(out_n, pa.int64()),
        "kth_hash": pa.array(out_hk, pa.uint64()),
        "est_distinct": pa.array(out_est, pa.float64()),
    }).sort_by("source")


CMS_WIDTH = 1024   # cells per hash row
CMS_DEPTH = 4      # independent hash rows


def cms_counts(sf_dir: str, probe_terms, width: int = CMS_WIDTH,
               depth: int = CMS_DEPTH) -> pa.Table:
    """Count-min-sketch term-frequency estimates (Cormode & Muthukrishnan
    2005) — the ADDITIVE mergeable sketch next to the KMV distinct sketch
    (``distinct_sketch``): a fixed (depth x width) counter grid where row d
    buckets a term at ``md5_number_lower(d || ':' || term) % width``, and a
    term's estimate is the MIN of its ``depth`` cells.  Estimates
    overestimate only (collisions add, never subtract): est >= true count,
    with error <= 2 * total_tokens / width at 1 - (1/2)^depth probability.
    The md5 convention makes every cell and estimate deterministic, so the
    DuckDB oracle replicates the ESTIMATES exactly — the sketch itself is
    verified, not a tolerance band.

    Scale shape: per-batch partials scatter-add token counts into a local
    (depth x width) grid (one md5 per distinct term per row — terms
    dict-encode first), each batch emits <= depth * width (d, cell, cnt)
    rows, and grids MERGE BY ADDITION — associative, commutative, bounded
    state (depth*width cells regardless of corpus size), the map-side
    combiner shape that at 100 TB needs no vocabulary-sized shuffle at
    all."""
    import hashlib

    docs = read(sf_dir, "documents", columns=["text"])
    w, dth = int(width), int(depth)

    def partial(t: pa.Table) -> pa.Table:
        flat, _doc_of, _n = _split_tokens(t.column("text"))
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        nd = len(enc.dictionary)
        if not nd:
            return pa.table({"d": pa.array([], pa.int32()),
                             "cell": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        term_counts = np.bincount(codes, minlength=nd)
        terms = enc.dictionary.to_pylist()
        out_d, out_cell, out_cnt = [], [], []
        for d in range(dth):
            hv = np.fromiter(
                (int.from_bytes(
                    hashlib.md5(f"{d}:{s}".encode()).digest()[8:], "little")
                 for s in terms),
                dtype=np.uint64, count=nd)
            cells = (hv % np.uint64(w)).astype(np.int64)
            grid = np.zeros(w, dtype=np.int64)
            np.add.at(grid, cells, term_counts)
            nz = np.flatnonzero(grid)
            out_d.append(np.full(len(nz), d, dtype=np.int32))
            out_cell.append(nz)
            out_cnt.append(grid[nz])
        return pa.table({"d": pa.array(np.concatenate(out_d)),
                         "cell": pa.array(np.concatenate(out_cell)),
                         "cnt": pa.array(np.concatenate(out_cnt))})

    grid = np.zeros((dth, w), dtype=np.int64)
    for b in docs.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        # sketch merge = addition: bounded (depth x width) state.  add.at,
        # not fancy +=: iter_batches re-chunks rows, so one batch can carry
        # the SAME (d, cell) from two map partials — buffered fancy
        # indexing would apply only one of them
        np.add.at(grid, (b.column("d").to_numpy(),
                         b.column("cell").to_numpy()),
                  b.column("cnt").to_numpy())

    terms = list(probe_terms)
    ests = []
    for s in terms:
        cells = [int.from_bytes(hashlib.md5(f"{d}:{s}".encode()).digest()[8:],
                                "little") % w for d in range(dth)]
        ests.append(int(min(grid[d, c] for d, c in enumerate(cells))))
    return pa.table({"term": pa.array(terms, pa.string()),
                     "est_count": pa.array(ests, pa.int64())}
                    ).sort_by("term")


HH_M = 200  # Misra-Gries counter budget: finds every term with freq > N/m


def heavy_hitters(sf_dir: str, m: int = HH_M) -> pa.Table:
    """EXACT frequent-terms mining (space-saving / Misra-Gries shape,
    Misra & Gries 1982): every term whose corpus frequency is strictly
    above ``N / m`` tokens, with its exact count.

    Scale shape — two bounded corpus passes, never a vocabulary-sized
    exchange:

    1. **Candidate pass** (the distributed MG argument): each batch counts
       its own tokens (dict-encode + bincount) and emits only terms with
       ``batch_count * m > batch_tokens`` — at most ``m`` rows per batch.
       If a term's GLOBAL count exceeds ``N/m`` it must exceed ``n_b/m``
       in at least one batch (else summing the per-batch bounds would cap
       its global count at ``N/m``), so the union of batch candidates is a
       superset of the true answer.  Batch token totals ride along as a
       ``""`` sentinel row (the tokenizer never yields an empty string).
    2. **Exact recount**: the (<= m per batch, deduped) candidate set
       broadcasts via ray.put; a second pass filters tokens to candidates
       (``pc.is_in``), emits per-batch partial counts, and a tiny
       ``groupby(term).sum`` finalizes.  The driver filters by the exact
       global threshold — no approximation survives to the output.
    """
    docs = read(sf_dir, "documents", columns=["text"])
    mm = int(m)

    def cand_partial(t: pa.Table) -> pa.Table:
        flat, _doc_of, _n = _split_tokens(t.column("text"))
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        nd = len(enc.dictionary)
        n_tok = len(flat)
        if not nd:
            return pa.table({"term": pa.array([""], pa.string()),
                             "cnt": pa.array([0], pa.int64())})
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.bincount(codes, minlength=nd)
        keep = np.flatnonzero(counts * mm > n_tok)
        return pa.table({
            "term": pa.concat_arrays([
                enc.dictionary.take(pa.array(keep, pa.int64())),
                pa.array([""], pa.string())]),
            "cnt": pa.array(np.append(counts[keep], n_tok), pa.int64())})

    cand = pa.concat_tables(list(docs.map_batches(
        cand_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")))
    terms = cand.column("term").to_numpy(zero_copy_only=False)
    cnts = cand.column("cnt").to_numpy()
    total = int(cnts[terms == ""].sum())
    cand_terms = pa.array(sorted(set(terms[terms != ""].tolist())),
                          pa.string())
    if not len(cand_terms):
        return pa.table({"term": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    ref = bput(cand_terms)

    def recount(t: pa.Table) -> pa.Table:
        cset = bget(ref)
        flat, _doc_of, _n = _split_tokens(t.column("text"))
        hit = flat.filter(pc.is_in(flat, value_set=cset))
        enc = hit.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        nd = len(enc.dictionary)
        if not nd:
            return pa.table({"term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.bincount(codes, minlength=nd)
        return pa.table({"term": enc.dictionary,
                         "cnt": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Sum

    agg = docs.map_batches(recount, batch_format="pyarrow").groupby(
        "term").aggregate(Sum("cnt", alias_name="cnt"))
    out = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    keep = out.column("cnt").to_numpy() * mm > total
    out = out.filter(pa.array(keep))
    return out.sort_by([("cnt", "descending"), ("term", "ascending")])
