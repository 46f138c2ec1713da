"""Index inspection — df/cf/N statistics surfaced from the on-disk index
(the ``tantivy inspect`` analog, /root/reference/tantivy-cli/src/commands/
inspect.rs:14-82, and the A5 aggregation of SURVEY.md §2.6)."""

from __future__ import annotations

import json
import os

import pyarrow.dataset as pads


def index_stats(index_dir: str, top_terms: int = 20) -> dict:
    """Summary stats + the ``top_terms`` highest-df terms (from the dict
    shards — a column-pruned scan, no posting decode)."""
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    d = pads.dataset(os.path.join(index_dir, "dict"))
    tbl = d.to_table(columns=["term", "df", "df_title", "df_body"])
    import numpy as np

    df = tbl.column("df").to_numpy()
    order = np.argsort(-df, kind="stable")[:top_terms]
    terms = tbl.column("term").to_pylist()
    top = [
        {"term": terms[i], "df": int(df[i]),
         "df_title": int(tbl.column("df_title")[int(i)].as_py()),
         "df_body": int(tbl.column("df_body")[int(i)].as_py())}
        for i in order
    ]
    manifest_dir = os.path.join(index_dir, "manifest")
    n_buckets_built = len([f for f in os.listdir(manifest_dir)
                           if f.endswith(".json")])
    return {
        **stats,
        "n_buckets_built": n_buckets_built,
        "top_terms": top,
    }


def prefix_terms(index_dir: str, prefix: str) -> "object":
    """Dictionary PREFIX-RANGE read — the term-autocomplete / vocabulary-
    exploration primitive over the persistent dict: returns (term, df,
    df_title, df_body) for every indexed term starting with ``prefix``,
    term-sorted.

    Scale shape: dict parts are term-SORTED parquet (hash-partitioned by
    term), so the range filter ``prefix <= term < next(prefix)`` prunes at
    parquet row-group granularity — each of the P parts contributes one
    point-range read, never a full dictionary scan.  Tokens are
    [a-z0-9]+, so the exclusive upper bound is the prefix with its last
    byte incremented."""
    if not prefix:
        raise ValueError("prefix must be non-empty")
    hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
    d = pads.dataset(os.path.join(index_dir, "dict"))
    flt = (pads.field("term") >= prefix) & (pads.field("term") < hi)
    return d.to_table(
        columns=["term", "df", "df_title", "df_body"],
        filter=flt).sort_by("term")
