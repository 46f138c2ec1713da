"""Per-bucket segment construction — the pure kernel of the build pipeline.

A bucket is this engine's segment (the analog of a tantivy segment built by
one IndexWriter thread — /root/reference/tantivy-cli/src/commands/index.rs:90-101):
all docs whose ``md5(doc_key) % num_buckets`` match, ranked by doc_key, with
globally contiguous doc_ids.  Each (term, bucket) posting segment is encoded
delta-gap + varint with segment-level max-score metadata (max_tf + min norm
ids), which gives block-max-style upper bounds for query-time pruning.

Because bucket size is bounded by construction, NO term — however Zipf-heavy —
ever produces a group larger than one bucket's postings: this is the explicit
skew/salting design required by the north rule (the bucket id acts as the
salt; final per-term merge is a cheap concat of segments in bucket order).
"""

from __future__ import annotations

from collections import Counter
from typing import Tuple

import numpy as np
import pyarrow as pa

from prosearch_ray.index.codec import encode_bitset, encode_deltas, encode_varints
from prosearch_ray.index.fieldnorm import fieldnorm_to_id
from prosearch_ray.text.tokenizer import tokenize

POSTINGS_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("bucket", pa.int32()),
    ("df", pa.uint32()),          # docs with the term in title OR body
    ("df_title", pa.uint32()),
    ("df_body", pa.uint32()),
    ("doc_ids", pa.binary()),     # delta-gap varint, ascending absolute ids
    ("tfs", pa.binary()),         # body tf varints (0 = title-only posting)
    ("title_flags", pa.binary()),  # LSB-first bitset aligned with doc_ids
    ("max_tf", pa.uint32()),      # segment block-max metadata
    ("min_norm_body", pa.uint8()),
    ("min_norm_title", pa.uint8()),
])

DOCMETA_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("doc_key", pa.string()),
    ("bucket", pa.int32()),
    ("len_title", pa.int32()),
    ("len_body", pa.int32()),
    ("norm_title", pa.uint8()),
    ("norm_body", pa.uint8()),
    ("sha256", pa.binary()),
    ("n_chars", pa.int64()),
])


def build_segment(
    bucket: int, docs: pa.Table, base_doc_id: int
) -> Tuple[pa.Table, pa.Table]:
    """Build (postings, docmeta) for one bucket.

    ``docs`` must already be canonical (deduped, sorted ascending by doc_key)
    with columns doc_key, title, content, sha256, n_chars.  doc_ids are
    ``base_doc_id + row_index``.
    """
    n = docs.num_rows
    titles = docs.column("title").to_pylist()
    contents = docs.column("content").to_pylist()

    # term -> ([local doc idx], [tf_body], [in_title])
    post: dict = {}
    len_title = np.zeros(n, dtype=np.int32)
    len_body = np.zeros(n, dtype=np.int32)
    for i in range(n):
        t_toks = tokenize(titles[i])
        b_toks = tokenize(contents[i])
        len_title[i] = len(t_toks)
        len_body[i] = len(b_toks)
        body_tf = Counter(b_toks)
        title_set = set(t_toks)
        for term in title_set | body_tf.keys():
            entry = post.setdefault(term, ([], [], []))
            entry[0].append(i)
            entry[1].append(body_tf.get(term, 0))
            entry[2].append(term in title_set)

    norm_title = fieldnorm_to_id(len_title)
    norm_body = fieldnorm_to_id(len_body)

    terms = sorted(post)
    cols = {k: [] for k in ("term", "bucket", "df", "df_title", "df_body",
                            "doc_ids", "tfs", "title_flags", "max_tf",
                            "min_norm_body", "min_norm_title")}
    for term in terms:
        idxs, tfs, flags = post[term]
        idx_arr = np.asarray(idxs, dtype=np.int64)
        tf_arr = np.asarray(tfs, dtype=np.uint64)
        fl_arr = np.asarray(flags, dtype=bool)
        cols["term"].append(term)
        cols["bucket"].append(bucket)
        cols["df"].append(len(idx_arr))
        cols["df_title"].append(int(fl_arr.sum()))
        cols["df_body"].append(int((tf_arr > 0).sum()))
        cols["doc_ids"].append(encode_deltas((idx_arr + base_doc_id).astype(np.uint64)))
        cols["tfs"].append(encode_varints(tf_arr))
        cols["title_flags"].append(encode_bitset(fl_arr))
        cols["max_tf"].append(int(tf_arr.max()) if len(tf_arr) else 0)
        body_norms = norm_body[idx_arr[tf_arr > 0]]
        title_norms = norm_title[idx_arr[fl_arr]]
        cols["min_norm_body"].append(int(body_norms.min()) if len(body_norms) else 255)
        cols["min_norm_title"].append(int(title_norms.min()) if len(title_norms) else 255)

    postings = pa.table(
        {name: pa.array(cols[name], POSTINGS_SCHEMA.field(name).type)
         for name in POSTINGS_SCHEMA.names},
        schema=POSTINGS_SCHEMA,
    )
    docmeta = pa.table({
        "doc_id": pa.array(base_doc_id + np.arange(n, dtype=np.int64), pa.int64()),
        "doc_key": docs.column("doc_key"),
        "bucket": pa.array(np.full(n, bucket, dtype=np.int32), pa.int32()),
        "len_title": pa.array(len_title, pa.int32()),
        "len_body": pa.array(len_body, pa.int32()),
        "norm_title": pa.array(norm_title, pa.uint8()),
        "norm_body": pa.array(norm_body, pa.uint8()),
        "sha256": docs.column("sha256"),
        "n_chars": docs.column("n_chars"),
    }, schema=DOCMETA_SCHEMA)
    return postings, docmeta
