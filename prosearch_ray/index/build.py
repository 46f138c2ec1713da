"""The distributed index build — a Ray Data pipeline (SURVEY.md §3.4, §7).

Replaces the reference's crawl→commit→tantivy-segment path
(/root/reference/src/main/java/com/milindmantri/CrawlerRunner.java:72-153,
/root/reference/tantivy-cli/src/commands/index.rs:20-148) with:

    read_parquet(corpus)
      ── pass 1 (keys only): map_batches(doc_key+sha256) → groupby(doc_key)
         → upsert winners; → groupby(sha) over winners → content-dup winners
         (both results are SMALL: only actually-contested keys are broadcast)
      ── pass 2: map_batches(normalize + sha256 + lang filter + broadcast
         dedup filters + bucket assign) → groupby(bucket).map_groups(stage-A
         writer: sort by doc_key, write docs/bucket parquet atomically)
      ── per-bucket offsets (tiny driver-side cumsum) → doc_ids
      ── stage B: Dataset of bucket work-items → one task per bucket:
         tokenize, build posting segments, write postings+docmeta+manifest
         atomically (resume skips buckets with a valid manifest)
      ── dict/stats: partial per-batch df aggregation → groupby(term).sum →
         dict.parquet; stats.json from manifest rows.

Scale notes (explicitly designed for the 100 TB case):
- exactly ONE full-content shuffle (the bucket groupby); dedup decisions ride
  key-only aggregates whose contested subset is broadcast (bget);
- skew: the shuffle key is ``bucket`` — uniformly distributed by md5 and
  bounded at ``docs_per_bucket`` docs, so no Zipf-heavy term or repo can
  create a straggler group (the bucket is the salt; see segment.py);
- resume: every bucket's outputs are written temp+rename with a manifest row
  (attempt counter, fingerprint); a killed build re-runs only missing buckets
  and never re-tokenizes finished ones;
- determinism: bucket assignment, in-bucket order and offsets depend only on
  the input rows, never on parallelism — the index is byte-identical at
  num_cpus=8 and num_cpus=32.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Dict, FrozenSet, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from prosearch_ray.index import docid, layout
from prosearch_ray.index.segment import build_segment
from prosearch_ray.state.broadcast import bget, bput

DEFAULT_LANGS: FrozenSet[str] = frozenset(["java", "py", "rs", "js", "go", "md", "txt"])
CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]

SourceT = Union[str, "ray.data.Dataset"]


def _atomic_write_table(table: pa.Table, path: str, row_group_size: int = 8192) -> int:
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp, row_group_size=row_group_size)
    os.replace(tmp, path)
    return os.path.getsize(path)


def _atomic_write_json(obj: dict, path: str) -> None:
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _sha256_hex_column(contents) -> list:
    return [hashlib.sha256(c.encode("utf-8")).hexdigest() for c in contents]


def _doc_keys_column(repos, paths) -> list:
    return [docid.doc_key(r, p) for r, p in zip(repos, paths)]


def _keys_batch(langs: FrozenSet[str]):
    """Pass-1 projection: (doc_key, commit_sha) for lang-accepted rows."""
    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("lang"), value_set=pa.array(sorted(langs)))
        batch = batch.filter(mask)
        keys = _doc_keys_column(batch.column("repo").to_pylist(),
                                batch.column("path").to_pylist())
        shas = _sha256_hex_column(batch.column("content").to_pylist())
        commit_sha = [c + "|" + s for c, s in
                      zip(batch.column("commit").to_pylist(), shas)]
        return pa.table({"doc_key": pa.array(keys, pa.string()),
                         "commit_sha": pa.array(commit_sha, pa.string())})
    return fn


def _normalize_batch(langs: FrozenSet[str], num_buckets: int,
                     contested_ref, dupsha_ref):
    """Pass-2 normalize: lang filter (M3), doc_key (M1), sha256 (D1 invariant),
    title fallback (M5), n_chars (M6), broadcast dedup filters, bucket."""
    def fn(batch: pa.Table) -> pa.Table:
        contested: Dict[str, str] = bget(contested_ref)
        dup_sha: Dict[str, str] = bget(dupsha_ref)
        mask = pc.is_in(batch.column("lang"), value_set=pa.array(sorted(langs)))
        batch = batch.filter(mask)
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        commits = batch.column("commit").to_pylist()
        contents = batch.column("content").to_pylist()
        keys = _doc_keys_column(repos, paths)
        shas = _sha256_hex_column(contents)
        keep = np.ones(len(keys), dtype=bool)
        for i, (k, c, s) in enumerate(zip(keys, commits, shas)):
            w = contested.get(k)
            if w is not None and (c + "|" + s) != w:
                keep[i] = False  # upsert loser (delete-then-reinsert analog)
                continue
            ks = dup_sha.get(s)
            if ks is not None and k != ks:
                keep[i] = False  # exact-content duplicate, first-key-wins
        n_chars = pc.add(
            pc.utf8_length(batch.column("content")),
            pc.utf8_length(pa.array(keys, pa.string())),
        )
        out = pa.table({
            "doc_key": pa.array(keys, pa.string()),
            "repo": batch.column("repo"),
            "path": batch.column("path"),
            "commit": batch.column("commit"),
            "lang": batch.column("lang"),
            "title": pa.array(keys, pa.string()),
            "content": batch.column("content"),
            "sha256": pa.array([bytes.fromhex(s) for s in shas], pa.binary()),
            "sha_hex": pa.array(shas, pa.string()),
            "n_chars": pc.cast(n_chars, pa.int64()),
            "bucket": pa.array(docid.buckets_of(keys, num_buckets), pa.int32()),
        })
        return out.filter(pa.array(keep))
    return fn


def _stage_a_writer(staged_dir: str):
    """groupby(bucket).map_groups body: canonical in-bucket order + atomic
    docs file; emits (bucket, n_docs)."""
    def fn(group: pa.Table) -> pa.Table:
        bucket = int(group.column("bucket")[0].as_py())
        group = group.sort_by([("doc_key", "ascending")])
        keys = group.column("doc_key").to_pylist()
        # drop full duplicates of the same doc_key (identical commit+sha rows
        # that both survived the upsert filter): keep the first
        keep = np.ones(len(keys), dtype=bool)
        for i in range(1, len(keys)):
            if keys[i] == keys[i - 1]:
                keep[i] = False
        group = group.filter(pa.array(keep))
        path = os.path.join(staged_dir, f"bucket={bucket:08d}.parquet")
        _atomic_write_table(group.drop_columns(["sha_hex"]), path)
        return pa.table({"bucket": pa.array([bucket], pa.int32()),
                         "n_docs": pa.array([group.num_rows], pa.int64())})
    return fn


def _build_bucket(index_dir: str):
    """Stage-B task body: one bucket -> segment postings + docmeta + manifest."""
    def fn(item: dict) -> dict:
        t0 = time.perf_counter()
        bucket = int(item["bucket"])
        docs = pq.read_table(item["staged_path"])
        postings, docmeta = build_segment(bucket, docs, int(item["base_doc_id"]))
        name = f"bucket={bucket:08d}.parquet"
        pbytes = _atomic_write_table(postings, os.path.join(index_dir, "segments", name))
        _atomic_write_table(docmeta, os.path.join(index_dir, "docmeta", name))
        manifest = {
            "bucket": bucket,
            "n_docs": docs.num_rows,
            "base_doc_id": int(item["base_doc_id"]),
            "n_terms": postings.num_rows,
            "sum_len_title": int(pc.sum(docmeta.column("len_title")).as_py() or 0),
            "sum_len_body": int(pc.sum(docmeta.column("len_body")).as_py() or 0),
            "postings_bytes": pbytes,
            "wall_ms": int((time.perf_counter() - t0) * 1000),
            "attempt": int(item["attempt"]),
            "fingerprint": item["fingerprint"],
        }
        _atomic_write_json(manifest, os.path.join(index_dir, "manifest", f"bucket={bucket:08d}.json"))
        return manifest
    return fn


def _fingerprint(staged_path: str, n_docs: int) -> str:
    return f"{n_docs}:{os.path.getsize(staged_path)}"


def _merge_writer(index_dir: str):
    """groupby(part).map_groups body: one term-hash partition -> final
    postings file (all of a term's bucket segments, (term, bucket)-sorted,
    small row groups for point lookups) + its dict shard (df totals,
    computed in-task — no separate dict pass)."""
    def fn(group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        tbl = group.drop_columns(["part"]).sort_by(
            [("term", "ascending"), ("bucket", "ascending")])
        name = f"part={part:05d}.parquet"
        pbytes = _atomic_write_table(
            tbl, os.path.join(index_dir, "postings", name),
            row_group_size=layout.POSTINGS_ROW_GROUP)
        d = pa.TableGroupBy(
            tbl.select(["term", "df", "df_title", "df_body"]), "term"
        ).aggregate([("df", "sum"), ("df_title", "sum"), ("df_body", "sum")])
        d = d.rename_columns(["term", "df", "df_title", "df_body"]).sort_by("term")
        _atomic_write_table(d, os.path.join(index_dir, "dict", name))
        return pa.table({"part": pa.array([part], pa.int32()),
                         "n_rows": pa.array([tbl.num_rows], pa.int64()),
                         "n_terms": pa.array([d.num_rows], pa.int64()),
                         "bytes": pa.array([pbytes], pa.int64())})
    return fn


def build_index(
    source: SourceT,
    index_dir: str,
    *,
    docs_per_bucket: int = docid.DOCS_PER_BUCKET_DEFAULT,
    langs: FrozenSet[str] = DEFAULT_LANGS,
    resume: bool = True,
    n_input_estimate: Optional[int] = None,
) -> dict:
    """Build (or resume) the inverted index at ``index_dir``. Returns a build
    report. ``source`` is a corpus parquet path/dir or a Dataset with columns
    (repo, path, commit, lang, content)."""
    t_start = time.perf_counter()
    phase_t: Dict[str, float] = {}

    def _mark(name: str, t0: float) -> None:
        phase_t[name] = round(time.perf_counter() - t0, 3)

    for sub in ("staged", "segments", "postings", "docmeta", "manifest", "dict"):
        os.makedirs(os.path.join(index_dir, sub), exist_ok=True)

    if isinstance(source, str):
        ds_raw = ray.data.read_parquet(source, columns=CORPUS_COLUMNS)
    else:
        ds_raw = source
    n_est = n_input_estimate if n_input_estimate is not None else ds_raw.count()
    num_buckets = docid.num_buckets_for(n_est, docs_per_bucket)

    staged_dir = os.path.join(index_dir, "staged")
    offsets_path = os.path.join(staged_dir, "_offsets.json")

    if resume and os.path.exists(offsets_path):
        off = json.load(open(offsets_path))
        assert off["num_buckets"] == num_buckets, "resume with different bucketing"
        counts = {int(k): v for k, v in off["counts"].items()}
        staged_fresh = False
    else:
        # ----- pass 1: key-space dedup decisions (no content shuffled) -----
        t0 = time.perf_counter()
        keys_ds = ds_raw.map_batches(_keys_batch(langs), batch_format="pyarrow",
                                     zero_copy_batch=True)
        agg1 = keys_ds.groupby("doc_key").aggregate(
            Count(alias_name="n_rows"),
            Max("commit_sha", alias_name="winner"),
        )
        contested: Dict[str, str] = {}
        dup_sha: Dict[str, str] = {}

        def _winner_sha(batch: pa.Table) -> pa.Table:
            winners = batch.column("winner").to_pylist()
            return pa.table({
                "doc_key": batch.column("doc_key"),
                "n_rows": batch.column("n_rows"),
                "winner": batch.column("winner"),
                "winner_sha": pa.array([w.rsplit("|", 1)[1] for w in winners], pa.string()),
            })

        # The per-key aggregate has two consumers (contested-key scan +
        # content-dup groupby). Small inputs: pull it to the driver once and
        # finish both in memory (saves two Dataset executions of fixed
        # overhead). Large inputs: persist to parquet once so neither
        # consumer re-hashes the corpus, and keep both follow-ups distributed.
        if n_est <= 2_000_000:
            seen_sha: Dict[str, str] = {}
            for b in agg1.map_batches(_winner_sha,
                                      batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"):
                for row in b.to_pylist():
                    if row["n_rows"] > 1:
                        contested[row["doc_key"]] = row["winner"]
                    s = row["winner_sha"]
                    cur = seen_sha.get(s)
                    if cur is None:
                        seen_sha[s] = row["doc_key"]
                    else:
                        dup_sha[s] = min(cur, row["doc_key"])
                        seen_sha[s] = dup_sha[s]
        else:
            keys_staged = os.path.join(staged_dir, "_keys")
            if os.path.isdir(keys_staged):
                for f in os.listdir(keys_staged):
                    os.remove(os.path.join(keys_staged, f))
            agg1.map_batches(_winner_sha,
                             batch_format="pyarrow").write_parquet(keys_staged)

            agg1w = ray.data.read_parquet(keys_staged)
            for b in agg1w.iter_batches(batch_format="pyarrow"):
                m = pc.greater(b.column("n_rows"), 1)
                for row in b.filter(m).select(["doc_key", "winner"]).to_pylist():
                    contested[row["doc_key"]] = row["winner"]
            sha_agg = ray.data.read_parquet(
                keys_staged, columns=["winner_sha", "doc_key"]).groupby(
                "winner_sha").aggregate(
                Count(alias_name="n_keys"), Min("doc_key", alias_name="keeper"))
            for b in sha_agg.iter_batches(batch_format="pyarrow"):
                m = pc.greater(b.column("n_keys"), 1)
                for row in b.filter(m).select(["winner_sha", "keeper"]).to_pylist():
                    dup_sha[row["winner_sha"]] = row["keeper"]

        _mark("pass1_dedup_keys", t0)

        # ----- pass 2: normalize + filter + the one content shuffle -----
        t0 = time.perf_counter()
        contested_ref = bput(contested)
        dupsha_ref = bput(dup_sha)
        norm = ds_raw.map_batches(
            _normalize_batch(langs, num_buckets, contested_ref, dupsha_ref),
            batch_format="pyarrow", zero_copy_batch=True)
        counts_rows = norm.groupby("bucket").map_groups(
            _stage_a_writer(staged_dir), batch_format="pyarrow").take_all()
        counts = {int(r["bucket"]): int(r["n_docs"]) for r in counts_rows}
        _atomic_write_json(
            {"num_buckets": num_buckets,
             "counts": {str(k): v for k, v in counts.items()},
             "n_docs": int(sum(counts.values()))},
            offsets_path)
        staged_fresh = True
        _mark("pass2_stage_bucketed_docs", t0)

    offsets = docid.bucket_offsets(counts)
    n_docs = int(sum(counts.values()))

    # ----- stage B: one task per bucket, resumable -----
    manifest_dir = os.path.join(index_dir, "manifest")
    work, skipped = [], 0
    for bucket in sorted(counts):
        if counts[bucket] == 0:
            continue
        staged_path = os.path.join(staged_dir, f"bucket={bucket:08d}.parquet")
        fp = _fingerprint(staged_path, counts[bucket])
        mpath = os.path.join(manifest_dir, f"bucket={bucket:08d}.json")
        attempt = 1
        if os.path.exists(mpath):
            try:
                m = json.load(open(mpath))
            except (ValueError, OSError):
                m = None
            name = f"bucket={bucket:08d}.parquet"
            outputs_ok = (
                m is not None and m.get("fingerprint") == fp
                and os.path.exists(os.path.join(index_dir, "segments", name))
                and os.path.exists(os.path.join(index_dir, "docmeta", name))
            )
            if resume and outputs_ok:
                skipped += 1
                continue
            if m is not None:
                attempt = int(m.get("attempt", 0)) + 1
        work.append({
            "bucket": bucket,
            "staged_path": staged_path,
            "base_doc_id": int(offsets[bucket]),
            "attempt": attempt,
            "fingerprint": fp,
        })

    if work:
        t0 = time.perf_counter()
        ray.data.from_items(work).map(_build_bucket(index_dir)).materialize()
        _mark("stage_b_segments", t0)

    # ----- merge: term-partitioned postings + dict (forcemerge analog) -----
    manifests = []
    for fn in sorted(os.listdir(manifest_dir)):
        if fn.endswith(".json"):
            manifests.append(json.load(open(os.path.join(manifest_dir, fn))))
    total_lt = sum(m["sum_len_title"] for m in manifests)
    total_lb = sum(m["sum_len_body"] for m in manifests)

    total_seg_rows = sum(m["n_terms"] for m in manifests)
    num_parts = layout.num_parts_for(total_seg_rows)
    merge_fp = hashlib.md5(json.dumps(
        [(m["bucket"], m["fingerprint"], m["n_terms"]) for m in manifests]
        + [num_parts]).encode()).hexdigest()
    merge_path = os.path.join(index_dir, "_merge.json")
    merge_state = None
    if resume and os.path.exists(merge_path):
        try:
            ms = json.load(open(merge_path))
            if ms.get("fingerprint") == merge_fp:
                merge_state = ms
        except (ValueError, OSError):
            pass

    t0 = time.perf_counter()
    if merge_state is None and manifests:
        seg_ds = ray.data.read_parquet(os.path.join(index_dir, "segments"))
        part_rows = seg_ds.map_batches(
            layout.add_part_column(num_parts), batch_format="pyarrow"
        ).groupby("part").map_groups(
            _merge_writer(index_dir), batch_format="pyarrow").take_all()
        n_terms = int(sum(r["n_terms"] for r in part_rows))
        # drop stale part files from an earlier layout
        live = {f"part={int(r['part']):05d}.parquet" for r in part_rows}
        for sub in ("postings", "dict"):
            for f in os.listdir(os.path.join(index_dir, sub)):
                if f.endswith(".parquet") and f not in live:
                    os.remove(os.path.join(index_dir, sub, f))
        merge_state = {"fingerprint": merge_fp, "num_parts": num_parts,
                       "n_terms": n_terms}
        _atomic_write_json(merge_state, merge_path)
        merged = True
    else:
        n_terms = int(merge_state["n_terms"]) if merge_state else 0
        merged = False
    _mark("merge_postings_dict", t0)

    stats = {
        "n_docs": n_docs,
        "num_buckets": num_buckets,
        "docs_per_bucket": docs_per_bucket,
        "total_len_title": total_lt,
        "total_len_body": total_lb,
        "avgdl_title": (total_lt / n_docs) if n_docs else 0.0,
        "avgdl_body": (total_lb / n_docs) if n_docs else 0.0,
        "n_terms": n_terms,
        "num_parts": num_parts,
        "langs": sorted(langs),
        "format_version": 2,
    }
    _atomic_write_json(stats, os.path.join(index_dir, "stats.json"))

    return {
        **stats,
        "built_buckets": len(work),
        "skipped_buckets": skipped,
        "merged": merged,
        "staged_fresh": staged_fresh,
        "phases": phase_t,
        "wall_s": time.perf_counter() - t_start,
    }
