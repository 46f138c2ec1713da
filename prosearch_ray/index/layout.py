"""Physical index layout: term-hash partitioning of the merged postings.

After per-bucket segment build, segments are merged into ``num_parts`` final
postings files partitioned by a STABLE term hash, so a query term maps to
exactly one file (``term_part``) and — with (term, bucket)-sorted rows and
small row groups — to ~one row group.  This is the analog of tantivy's
forcemerge (/root/reference/tantivy-cli/src/commands/merge.rs:18-32) plus the
term dictionary.

Skew note: the merge groupby key is ``part``; a part holds many terms and a
term holds at most ``num_buckets`` segment rows, so even stopword-grade terms
cannot create an oversized group (north-rule salted-shuffle requirement —
the (term, bucket) segmentation is the salt, the part hash spreads terms).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

POSTINGS_ROW_GROUP = 2048
SEG_ROWS_PER_PART = 16384


def term_part(term: str, num_parts: int) -> int:
    h = hashlib.blake2b(term.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "big") % num_parts


def num_parts_for(total_segment_rows: int,
                  rows_per_part: int = SEG_ROWS_PER_PART) -> int:
    # Keep part cardinality comfortably above worker count: Ray's
    # sort-based groupby range-partitions on the key, and a low-cardinality
    # key collapses the shuffle onto a handful of reducers.
    return max(16, -(-int(total_segment_rows) // int(rows_per_part)))


def add_part_column(num_parts: int):
    def fn(t: pa.Table) -> pa.Table:
        parts = np.fromiter(
            (term_part(x, num_parts) for x in t.column("term").to_pylist()),
            dtype=np.int32, count=t.num_rows)
        return t.append_column("part", pa.array(parts, pa.int32()))
    return fn
