"""Doc-sharded index build + corpus-wide BM25 statistics.

At 100 TB one index directory per cluster is the wrong shape: a single
query would decode postings over the whole corpus on one node.  The scale
design is S doc shards — each an ordinary index built by ``build_index`` —
queried scatter-gather (query/sharded.py) with CORPUS-WIDE BM25 statistics
so shard scores are bit-identical to an unsharded build:

- ``shard = md5(doc_key) % S``: all versions of a key co-locate, so the
  in-bucket last-write-wins upsert keeps its semantics per shard;
- cross-shard exact-content dedup runs on KEY COLUMNS ONLY before the
  shard builds (upsert-resolve per key, then min-doc_key winner per sha —
  the same deterministic rule as build.py's in-index fixup), so the final
  global doc set equals the unsharded build's;
- ``global_stats.json`` (N, avgdl) and ``global_dict.parquet`` (per-term
  corpus-wide df, term-sorted for point reads) are derived from the shard
  outputs; shard searchers score with these (searcher.score_n_docs /
  _global_df), the distributed-frequency (DFS) query model.

Layout under ``root``::

    corpus/shard=K/   hive-partitioned corpus split (resumable sink)
    shard=000/ ...    one ordinary index per shard
    global_stats.json
    global_dict.parquet
"""

from __future__ import annotations

import json
import os
from typing import FrozenSet, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data as rd

from prosearch_ray.index import docid
from prosearch_ray.index.build import (CORPUS_COLUMNS, DEFAULT_LANGS,
                                       _sha256_hex_arrow, build_index)
from prosearch_ray.sinks import write_partitioned


def shard_dirs(root: str):
    return [os.path.join(root, d) for d in sorted(os.listdir(root))
            if d.startswith("shard=")]


def _tag_batch(langs: FrozenSet[str], num_shards: int):
    """Lang filter (mirrors the build's content-type gate so loser
    detection sees the same row set) + doc_key/sha/shard columns."""
    accepted = pa.array(sorted(langs))

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("lang"), value_set=accepted))
        keys = [docid.doc_key(r, p)
                for r, p in zip(t.column("repo").to_pylist(),
                                t.column("path").to_pylist())]
        shards = np.fromiter((docid.bucket_of(k, num_shards) for k in keys),
                             dtype=np.int64, count=len(keys))
        return pa.table({
            **{c: t.column(c) for c in CORPUS_COLUMNS},
            "doc_key": pa.array(keys, pa.string()),
            "sha_hex": pa.array(_sha256_hex_arrow(t.column("content")),
                                pa.string()),
            "shard": pa.array(shards, pa.int64()),
        })
    return fn


def _cross_shard_losers(corpus_root: str) -> set:
    """doc_keys whose upsert-surviving version loses global content dedup
    (min-doc_key winner per sha — build.py's fixup rule, applied across
    shards).  Key columns only; at corpus scale this becomes a distributed
    groupby whose (tiny) loser list comes back to the driver — same
    threshold pattern as _content_dedup_fixup."""
    tbl = pads.dataset(corpus_root, partitioning="hive").to_table(
        columns=["doc_key", "sha_hex", "commit"])
    if tbl.num_rows == 0:
        return set()
    # upsert resolve: first row per key under (key asc, commit desc, sha
    # desc) — identical to _canonicalize_bucket, but corpus-wide
    tbl = tbl.sort_by([("doc_key", "ascending"), ("commit", "descending"),
                       ("sha_hex", "descending")])
    keys = tbl.column("doc_key").to_numpy(zero_copy_only=False)
    first = np.concatenate(([True], keys[1:] != keys[:-1]))
    surv = tbl.filter(pa.array(first))
    # duplicated shas among survivors -> min doc_key wins
    vc = pc.value_counts(surv.column("sha_hex"))
    dup_shas = vc.field("values").filter(pc.greater(vc.field("counts"), 1))
    if not len(dup_shas):
        return set()
    sub = surv.filter(pc.is_in(surv.column("sha_hex"), value_set=dup_shas))
    sub = sub.sort_by([("sha_hex", "ascending"), ("doc_key", "ascending")])
    shas = sub.column("sha_hex").to_numpy(zero_copy_only=False)
    loser_mask = np.concatenate(([False], shas[1:] == shas[:-1]))
    return set(sub.column("doc_key").to_numpy(zero_copy_only=False)[loser_mask])


def build_sharded_index(
    source, root: str, num_shards: int = 4, *,
    docs_per_bucket: int = docid.DOCS_PER_BUCKET_DEFAULT,
    langs: FrozenSet[str] = DEFAULT_LANGS,
    resume: bool = True,
) -> dict:
    """Partition the corpus into ``num_shards`` doc shards (one content
    pass, resumable), build an ordinary index per shard, then derive the
    corpus-wide stats + merged dictionary.  Returns a report."""
    os.makedirs(root, exist_ok=True)
    corpus_root = os.path.join(root, "corpus")
    if isinstance(source, str):
        ds = rd.read_parquet(source, columns=CORPUS_COLUMNS)
    else:
        ds = source
    write_partitioned(
        ds.map_batches(_tag_batch(langs, num_shards), batch_format="pyarrow"),
        corpus_root, "shard")

    losers = _cross_shard_losers(corpus_root)

    reports = []
    for s in range(num_shards):
        sdir = os.path.join(corpus_root, f"shard={s}")
        idx_dir = os.path.join(root, f"shard={s:03d}")
        if not os.path.isdir(sdir):
            os.makedirs(os.path.join(idx_dir), exist_ok=True)
            continue
        sds = rd.read_parquet(sdir, columns=CORPUS_COLUMNS + ["doc_key"])
        n_est = sds.count()
        if losers:
            loser_arr = pa.array(sorted(losers))

            def drop_losers(t: pa.Table) -> pa.Table:
                return t.filter(pc.invert(pc.is_in(
                    t.column("doc_key"), value_set=loser_arr)))

            sds = sds.map_batches(drop_losers, batch_format="pyarrow")
        reports.append(build_index(
            sds, idx_dir, docs_per_bucket=docs_per_bucket, langs=langs,
            resume=resume, n_input_estimate=n_est))

    # corpus-wide stats: sums over the shard stats files
    n_docs = sum(r["n_docs"] for r in reports)
    total_lt = sum(r["total_len_title"] for r in reports)
    total_lb = sum(r["total_len_body"] for r in reports)
    gstats = {
        "n_docs": n_docs,
        "num_shards": num_shards,
        "shard_n_docs": [r["n_docs"] for r in reports],
        "avgdl_title": (total_lt / n_docs) if n_docs else 0.0,
        "avgdl_body": (total_lb / n_docs) if n_docs else 0.0,
    }
    tmp = os.path.join(root, "global_stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(gstats, f)
    os.replace(tmp, os.path.join(root, "global_stats.json"))

    # merged dictionary: per-term corpus-wide df, term-sorted for point
    # reads.  Driver-side pyarrow groupby here (dict rows ≈ vocab size); at
    # corpus scale this is one more small spill exchange over hash(term).
    dict_files = []
    for d in shard_dirs(root):
        dd = os.path.join(d, "dict")
        if os.path.isdir(dd):
            dict_files += [os.path.join(dd, f) for f in os.listdir(dd)
                           if f.endswith(".parquet")]
    if dict_files:
        dicts = pads.dataset(dict_files).to_table(
            columns=["term", "df", "df_title", "df_body"])
        merged = pa.TableGroupBy(dicts, "term").aggregate(
            [("df", "sum"), ("df_title", "sum"), ("df_body", "sum")])
        merged = merged.rename_columns(
            ["term", "df", "df_title", "df_body"]).sort_by("term")
        pq.write_table(merged, os.path.join(root, "global_dict.parquet"),
                       row_group_size=8192)
        n_terms = merged.num_rows
    else:
        n_terms = 0

    return {"n_docs": n_docs, "n_terms": n_terms, "num_shards": num_shards,
            "shards": reports, **{k: gstats[k]
                                  for k in ("avgdl_title", "avgdl_body")}}
