"""End-to-end corpus curation — the composition a training-data pipeline
actually runs over raw documents: near-duplicate KEEPER filter + quality
gate + language gate, emitting the clean training subset.

Scale shape: the three per-doc signals fuse into ONE ``map_batches`` pass
(no per-signal re-read, no doc-level join); the only cross-doc state is the
non-keeper id set from the dedup clustering, which is the near-dup LOSER
list — orders of magnitude smaller than the corpus — broadcast once via the
object store.  Every predicate is SQL-expressible, so the whole composition
is exact-checked against DuckDB by the driver."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from prosearch_ray.pipelines.common import read, sql_round
from prosearch_ray.pipelines.dedup import dedup_clusters
from prosearch_ray.state.broadcast import bget, bput

DEFAULT_MIN_TTR = 0.5
DEFAULT_LANGS = ("de", "en", "es", "fr")


class _CurateStage:
    """Actor-pool stage: marker lexicons built once; per batch computes
    language prediction + type-token ratio (both vectorized — one Arrow
    tokenize pass feeds the textstats kernels) and applies all three gates
    as numpy masks."""

    def __init__(self, non_keepers_ref, min_ttr: float, keep_langs):
        self.non_keepers = bget(non_keepers_ref)  # sorted int64 ids
        self.min_ttr = float(min_ttr)
        self.keep_langs = sorted(keep_langs)

    def __call__(self, t: pa.Table) -> pa.Table:
        from prosearch_ray.pipelines.textstats import (_doc_token_stats,
                                                       _lang_scores)
        from prosearch_ray.pipelines.trainprep import _split_tokens

        ids = t.column("doc_id").to_numpy()
        dup = np.isin(ids, self.non_keepers, assume_unique=True)
        pre = _split_tokens(t.column("text"))
        pred, _, n_tok, _, _ = _lang_scores(t.column("text"), pre=pre)
        _, _, _, _, n_uniq = _doc_token_stats(t.column("text"), pre=pre)
        nz = np.maximum(1, n_tok).astype(np.float64)
        ttr = sql_round(np.where(n_tok > 0, n_uniq / nz, 0.0), 4)
        keep = (~dup
                & np.isin(pred.astype(object), self.keep_langs)
                & (ttr >= self.min_ttr))
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "pred_lang": pa.array(pred[keep].tolist(), pa.string()),
            "ttr": pa.array(ttr[keep], pa.float64()),
        })


def clean_corpus(sf_dir: str, min_ttr: float = DEFAULT_MIN_TTR,
                 keep_langs=DEFAULT_LANGS) -> "rd.Dataset":
    clusters = dedup_clusters(sf_dir)
    keep_mask = clusters.column("is_keeper").to_numpy(zero_copy_only=False)
    non_keepers = np.sort(
        clusters.column("doc_id").to_numpy()[~keep_mask]).astype(np.int64)
    ref = bput(non_keepers)
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        _CurateStage, fn_constructor_args=(ref, min_ttr, tuple(keep_langs)),
        batch_format="pyarrow", concurrency=2, num_cpus=1)


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
