"""Distributed text/search pipelines over the ``documents`` testdata table,
each with an exact DuckDB oracle (see __ray_entry__.oracle_sql).

These use the SQL-expressible ``simple_tokenize`` (lowercase + split on
non-[a-z0-9] runs — text/tokenizer.py) so the whole distributed path —
tokenize → partial aggregate → shuffle → score — is value-checked against a
pure-SQL reimplementation.  The full code-aware engine (camelCase splitting,
fieldnorm quantization, block-max pruning) is conformance-checked against the
brute-force oracle in tests/test_conformance.py instead.
"""

from __future__ import annotations

import hashlib
from typing import Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from prosearch_ray.index.scoring import B, K1
from prosearch_ray.pipelines.common import read, sql_round
from prosearch_ray.state.broadcast import bget, bput

# Fixed query for the SQL-checked BM25 pipeline (both terms exist in the
# synthetic documents vocabulary).
BM25_QUERY_TERMS: Tuple[str, ...] = ("table", "hash")
BM25_K = 10


def _split_doc_tokens(text_col) -> Tuple[pa.Array, np.ndarray, int]:
    """Vectorized simple_tokenize over a batch column: Arrow lower +
    regex-split on non-[a-z0-9] runs (same token set as simple_tokenize for
    ASCII — pinned by the SQL oracles).  Returns (flat non-empty token
    array, doc index per token, n_docs).  No Python loop over rows."""
    split = pc.split_pattern_regex(pc.utf8_lower(text_col), "[^a-z0-9]+")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    counts = np.diff(split.offsets.to_numpy().astype(np.int64))
    flat = split.flatten()
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(keep)), doc_of[keep], len(counts)


def term_df(sf_dir: str, limit: int = 100) -> pa.Table:
    """Top terms by document frequency (A5 df statistics analog).

    Scale pattern: per-batch partial df (set-of-terms per doc, then a
    within-batch combiner) -> small groupby(term).sum -> per-block local
    top-k over the aggregated dataset -> tiny driver merge of <= limit rows
    per block.  The vocabulary-sized aggregate never reaches the driver
    (code-corpus vocabulary at 100 TB is billions of terms)."""
    docs = read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        """Per-doc distinct via one packed-key np.unique; no Python loop
        over rows or tokens."""
        flat, doc_of, _ = _split_doc_tokens(t.column("text"))
        denc = flat.dictionary_encode()
        tid = denc.indices.to_numpy().astype(np.int64)
        packed = (doc_of << np.int64(32)) | tid
        dist_tid = (np.unique(packed) & np.int64(0xFFFFFFFF))
        df_part = np.bincount(dist_tid, minlength=len(denc.dictionary))
        return pa.table({
            "term": denc.dictionary,
            "df_part": pa.array(df_part, pa.int64())})

    agg = docs.map_batches(partial, batch_format="pyarrow").groupby(
        "term").aggregate(Sum("df_part", alias_name="df"))

    def local_topk(t: pa.Table) -> pa.Table:
        df = pc.cast(t.column("df"), pa.int64())
        t = pa.table({"term": t.column("term"), "df": df})
        if t.num_rows <= limit:
            return t
        idx = pc.sort_indices(t, sort_keys=[("df", "descending"),
                                            ("term", "ascending")])
        return t.take(idx[:limit])

    cand = agg.map_batches(local_topk, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: (-r["df"], r["term"]))
    cand = cand[:limit]
    return pa.table({
        "term": pa.array([r["term"] for r in cand], pa.string()),
        "df": pa.array([int(r["df"]) for r in cand], pa.int64()),
    })


def token_counts(sf_dir: str) -> "rd.Dataset":
    """Per-doc token count (M6/M7 length measure with the simple tokenizer)."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        _, doc_of, n_docs = _split_doc_tokens(t.column("text"))
        n = np.bincount(doc_of, minlength=n_docs)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(n, pa.int64())})

    return docs.map_batches(fn, batch_format="pyarrow")


def bm25_topk(sf_dir: str, terms: Sequence[str] = BM25_QUERY_TERMS,
              k: int = BM25_K) -> pa.Table:
    """Distributed BM25 top-k with AND semantics over documents.text.

    Three-stage Ray pipeline (no full materialization):
      1. map_batches: per-doc tf for each query term + doc length
         (only docs matching ALL terms survive — conjunctive pre-filter);
      2. tiny global aggregates for N, avgdl, df (partial per batch);
      3. map_batches rescoring with broadcast stats + per-batch local top-k
         prune, then a driver-side merge of ≤ k rows per batch.

    Scores use exact doc lengths (no fieldnorm quantization) so the DuckDB
    oracle can reproduce them bit-for-bit at round(.,4).
    """
    terms = list(terms)
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def tf_batch(t: pa.Table) -> pa.Table:
        """Vectorized per-doc query-term tf + doc length: one Arrow split,
        then a bincount per query term (query term count is tiny and fixed;
        no Python loop over rows)."""
        flat, doc_of, n_docs = _split_doc_tokens(t.column("text"))
        dl = np.bincount(doc_of, minlength=n_docs)
        cols = {
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "dl": pa.array(dl, pa.int64()),
        }
        for i, term in enumerate(terms):
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(doc_of[hit], minlength=n_docs)
            cols[f"tf_{i}"] = pa.array(tf, pa.int64())
        return pa.table(cols)

    # materialized: the tf table is narrow (doc_id, dl, tf_i) and is consumed
    # TWICE (stats pass + scoring pass) — without this Ray re-executes the
    # lazy tokenize map and the corpus is split/tokenized twice
    tf_ds = docs.map_batches(tf_batch, batch_format="pyarrow").materialize()

    # global stats in ONE pass over the (small, term-count-wide) tf dataset
    def stats_partial(t: pa.Table) -> pa.Table:
        row = {"n_part": [t.num_rows], "dl_part": [int(pc.sum(t.column("dl")).as_py() or 0)]}
        for i in range(len(terms)):
            row[f"df_{i}"] = [int(pc.sum(pc.cast(pc.greater(
                t.column(f"tf_{i}"), 0), pa.int64())).as_py() or 0)]
        return pa.table(row)

    stats_rows = tf_ds.map_batches(stats_partial, batch_format="pyarrow").take_all()
    n_docs = sum(r["n_part"] for r in stats_rows)
    if n_docs == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    avgdl = sum(r["dl_part"] for r in stats_rows) / n_docs
    dfs = [sum(r[f"df_{i}"] for r in stats_rows) for i in range(len(terms))]
    idfs = [float(np.log1p((n_docs - df + 0.5) / (df + 0.5))) for df in dfs]
    ref = bput({"avgdl": avgdl, "idfs": idfs})

    def score_batch(t: pa.Table) -> pa.Table:
        st = bget(ref)
        mask = np.ones(t.num_rows, dtype=bool)
        for i in range(len(terms)):
            mask &= t.column(f"tf_{i}").to_numpy() > 0
        if not mask.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        dl = t.column("dl").to_numpy()[mask].astype(np.float64)
        score = np.zeros(mask.sum(), dtype=np.float64)
        for i in range(len(terms)):
            tf = t.column(f"tf_{i}").to_numpy()[mask].astype(np.float64)
            score += st["idfs"][i] * tf * (K1 + 1.0) / (
                tf + K1 * (1.0 - B + B * dl / st["avgdl"]))
        ids = t.column("doc_id").to_numpy()[mask]
        order = np.lexsort((ids, -score))[:k]  # local top-k prune
        return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                         "score": pa.array(score[order], pa.float64())})

    cand = tf_ds.map_batches(score_batch, batch_format="pyarrow").take_all()
    ids = np.array([r["doc_id"] for r in cand], dtype=np.int64)
    scores = np.array([r["score"] for r in cand], dtype=np.float64)
    order = np.lexsort((ids, -scores))[:k]
    return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                     "score": pa.array(sql_round(scores[order], 4), pa.float64())})


def exact_dedup(sf_dir: str) -> "rd.Dataset":
    """Exact-content dedup groups (D1; checksum dedup CrawlerRunner.java:134):
    per md5(text) keep min doc_id + group size."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def hash_batch(t: pa.Table) -> pa.Table:
        md5s = [hashlib.md5(x.encode("utf-8")).hexdigest()
                for x in t.column("text").to_pylist()]
        return pa.table({"sha": pa.array(md5s, pa.string()),
                         "doc_id": t.column("doc_id")})

    agg = docs.map_batches(hash_batch, batch_format="pyarrow").groupby(
        "sha").aggregate(Min("doc_id", alias_name="keeper"),
                         Count(alias_name="n_copies"))
    return agg.map_batches(
        lambda t: pa.table({
            "sha": t.column("sha"),
            "keeper": pc.cast(t.column("keeper"), pa.int64()),
            "n_copies": pc.cast(t.column("n_copies"), pa.int64()),
        }),
        batch_format="pyarrow")
