"""Text-analysis operators over ``documents``: language-ID, quality scoring,
document fingerprinting.  All three are SQL-checkable: the marker heuristic,
the quality features and the winnowing scheme are each expressed in DuckDB
(see __ray_entry__.oracle_sql) and exact-matched by the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from prosearch_ray.pipelines.common import read, sql_round
from prosearch_ray.text.tokenizer import simple_tokenize

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


class LangId:
    """Stateful actor-pool stage (markers + regexes built once per actor)."""

    def __init__(self):
        self.langs = sorted(k for k in LANG_MARKERS if LANG_MARKERS[k])
        self.markers = {k: LANG_MARKERS[k] for k in self.langs}

    def __call__(self, t: pa.Table) -> pa.Table:
        preds, confs = [], []
        for text in t.column("text").to_pylist():
            toks = simple_tokenize(text)
            n = max(1, len(toks))
            has_cjk = any("一" <= ch <= "鿿" for ch in text[:200])
            if has_cjk:
                preds.append("zh")
                confs.append(1.0)
                continue
            scores = {lang: sum(tok in mk for tok in toks) / n
                      for lang, mk in self.markers.items()}
            best = max(sorted(scores), key=lambda k: scores[k])
            preds.append(best)
            confs.append(scores[best])
        return pa.table({
            "doc_id": t.column("doc_id"),
            "pred_lang": pa.array(preds, pa.string()),
            "confidence": pa.array(sql_round(confs, 4), pa.float64()),
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
        n_tok, n_uniq, ttr, mean_len = [], [], [], []
        for text in t.column("text").to_pylist():
            toks = simple_tokenize(text)
            n = len(toks)
            u = len(set(toks))
            n_tok.append(n)
            n_uniq.append(u)
            ttr.append(u / n if n else 0.0)
            mean_len.append(sum(len(x) for x in toks) / n if n else 0.0)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_uniq": pa.array(n_uniq, pa.int64()),
            "ttr": pa.array(sql_round(ttr, 4), pa.float64()),
            "mean_tok_len": pa.array(sql_round(mean_len, 4), pa.float64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def fingerprint(sf_dir: str, kgram: int = 4, window: int = 5) -> "rd.Dataset":
    """Winnowing document fingerprints (k-gram hashes, per-window minimum) —
    the rolling-hash fingerprinting operator.  The gram hash is the first 16
    hex chars of md5 (any 64-bit PRF works for winnowing; md5 keeps the
    DuckDB oracle bit-exact — fixed-width hex compares lexicographically ==
    numerically), window mins are a vectorized shifted-slice minimum."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        import hashlib

        ids = t.column("doc_id").to_pylist()
        n_fp, min_fp = [], []
        for text in t.column("text").to_pylist():
            toks = simple_tokenize(text)
            grams = [" ".join(toks[i:i + kgram])
                     for i in range(max(0, len(toks) - kgram + 1))]
            if not grams:
                n_fp.append(0)
                min_fp.append("")
                continue
            # uint64 value of the 16-hex-char md5 prefix: numeric order ==
            # lexicographic order of the fixed-width hex the oracle compares
            hs = np.array([int(hashlib.md5(g.encode()).hexdigest()[:16], 16)
                           for g in grams], dtype=np.uint64)
            n = len(hs)
            span = max(1, n - window + 1)  # one (truncated) window if n<window
            mins = hs[:span].copy()
            for off in range(1, min(window, n)):
                end = min(off + span, n)
                np.minimum(mins[:end - off], hs[off:end], out=mins[:end - off])
            fps = np.unique(mins)
            n_fp.append(len(fps))
            min_fp.append(f"{int(fps[0]):016x}")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_fingerprints": pa.array(n_fp, pa.int64()),
            "min_fingerprint": pa.array(min_fp, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")
