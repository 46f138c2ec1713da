"""Deterministic document identity: keys, buckets, doc_ids.

Replaces the reference's crawl-state identity machinery (url primary key +
Postgres unique (host,url) — /root/reference/src/main/java/com/milindmantri/
Manager.java:54-62, TantivyCommitter.java:48-82) with a parallelism-invariant
scheme (SURVEY.md §4.3.2, reworked to avoid a global sort):

- ``doc_key = repo + "/" + normalize_path(path)`` — unique after dedup.
- ``bucket = md5(doc_key)[:8] % num_buckets`` — a STABLE hash (never Python's
  salted ``hash``), so the assignment is identical across runs, cluster sizes
  and ``num_cpus`` levels.
- within a bucket, docs are ranked by ascending ``doc_key``;
  ``doc_id = bucket_offset[bucket] + rank`` with offsets = exclusive cumsum of
  per-bucket doc counts in bucket order → doc_ids are compact (0..N-1) and
  globally deterministic, yet assigned with NO global sort: only a tiny
  (num_buckets)-row aggregate crosses the cluster.

Buckets double as the index's segments: every (term, bucket) posting segment
is bounded by the bucket size, which makes the posting-merge shuffle skew-proof
by construction (no heavy-hitter term ever forms a group larger than one
bucket's postings) — the salting strategy required by the north rule.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np

DOCS_PER_BUCKET_DEFAULT = 4096


def normalize_path(path: str) -> str:
    """Path canonicalization — the analog of the reference's URL normalizer
    (removeDuplicateSlashes, removeDotSegments;
    /root/reference/src/main/java/com/milindmantri/CrawlerRunner.java:26-38).
    """
    segs: List[str] = []
    for seg in path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if segs:
                segs.pop()
            continue
        segs.append(seg)
    return "/".join(segs)


def doc_key(repo: str, path: str) -> str:
    return repo + "/" + normalize_path(path)


def bucket_of(key: str, num_buckets: int) -> int:
    h = hashlib.md5(key.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") % num_buckets


def buckets_of(keys, num_buckets: int) -> np.ndarray:
    """Vector wrapper (md5 has no numpy kernel; the per-key loop runs once per
    row in the normalize stage and is dominated by the sha256 content hash)."""
    return np.fromiter(
        (bucket_of(k, num_buckets) for k in keys), dtype=np.int64, count=len(keys)
    )


def num_buckets_for(n_docs_estimate: int, docs_per_bucket: int = DOCS_PER_BUCKET_DEFAULT) -> int:
    """Bucket count from the PRE-dedup input size estimate (parquet metadata
    row count) — deterministic given the input, independent of parallelism."""
    return max(1, -(-int(n_docs_estimate) // int(docs_per_bucket)))


def bucket_offsets(bucket_counts: dict) -> np.ndarray:
    """Exclusive prefix-sum of per-bucket doc counts, indexed by bucket id.
    ``bucket_counts`` maps bucket -> n_docs (missing buckets = 0)."""
    nb = (max(bucket_counts) + 1) if bucket_counts else 0
    counts = np.zeros(nb, dtype=np.int64)
    for b, c in bucket_counts.items():
        counts[b] = c
    offsets = np.zeros(nb, dtype=np.int64)
    if nb:
        offsets[1:] = np.cumsum(counts)[:-1]
    return offsets
