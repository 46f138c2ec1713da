"""Corpus sources (SURVEY.md §2.1 S1/S2).

The reference bulk-ingests one JSON object per line matching the fixed
{url, title, body} schema (tantivy-cli/src/commands/index.rs:77-85,199-214);
malformed rows are skipped and counted, never fatal.  Here the primary format
is Parquet (per input_hint); JSONL is the compatibility path with the same
skip-and-count semantics and fixed-schema enforcement (serve.rs:469-493
analog: all five columns present and string-typed, never inferred).
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def detect_format(path: str, format: str = "auto") -> str:
    """Resolve ``auto`` to parquet|jsonl by probing the path (directory:
    first non-underscore entry)."""
    if format != "auto":
        return format
    probe = path
    if os.path.isdir(path):
        names = [f for f in os.listdir(path) if not f.startswith("_")]
        probe = names[0] if names else ""
    return "jsonl" if probe.endswith((".jsonl", ".json")) else "parquet"


def read_corpus(path: str, format: str = "auto") -> "rd.Dataset":
    """Read a corpus directory/file as a Dataset with the fixed 5-column
    schema. ``format``: auto | parquet | jsonl."""
    format = detect_format(path, format)
    if format == "parquet":
        return rd.read_parquet(path, columns=CORPUS_COLUMNS)
    if format == "jsonl":
        ds = rd.read_json(path)

        def enforce(t: pa.Table) -> pa.Table:
            # fixed schema, enforced not inferred; rows missing any required
            # string column are dropped (skip-bad-docs semantics)
            cols = {}
            mask = None
            import pyarrow.compute as pc

            for c in CORPUS_COLUMNS:
                if c not in t.column_names:
                    return pa.table({c: pa.array([], pa.string())
                                     for c in CORPUS_COLUMNS})
                col = pc.cast(t.column(c), pa.string())
                valid = pc.is_valid(col)
                mask = valid if mask is None else pc.and_(mask, valid)
                cols[c] = col
            return pa.table(cols).filter(mask)

        return ds.map_batches(enforce, batch_format="pyarrow")
    raise ValueError(f"unknown corpus format: {format!r}")
