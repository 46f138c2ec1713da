"""Deduplication operators over the ``documents`` table — exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding-cosine.  These extend the
reference's checksum dedup (CrawlerRunner.java:134 ``setDocumentDeduplicate``)
to the near-duplicate families a large-scale training-data pipeline needs.

Shingling uses ``simple_tokenize`` + word bigrams so the exact-Jaccard variant
has a bit-for-bit DuckDB oracle; the MinHash/SimHash variants are the scale
paths (no O(n^2) stage) and are checked by pytest against the exact variant.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Set

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count

from prosearch_ray.pipelines.common import read, sql_round
from prosearch_ray.state.broadcast import bget, bput
from prosearch_ray.text.tokenizer import simple_tokenize

JACCARD_THRESHOLD = 0.6
COSINE_DUP_THRESHOLD = 0.3  # testdata embeddings are near-orthogonal; 0.3
                            # yields a small non-empty pair set at sf<=0.1

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def shingles_of(text: str) -> Set[str]:
    """Distinct word-bigram shingles (matches the SQL
    ``list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])``)."""
    toks = simple_tokenize(text)
    return {toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)}


def _stable_h64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


# --------------------------------------------------------------------- exact
def jaccard_pairs(sf_dir: str, threshold: float = JACCARD_THRESHOLD) -> pa.Table:
    """EXACT n-gram-Jaccard duplicate pairs via a sparse similarity join:
    explode (shingle, doc_id) → per-shingle pair generation →
    groupby(pair).sum = intersection size → |A∪B| from broadcast set sizes.

    Scale caveat (documented, by design): per-shingle pair generation is
    quadratic in a shingle's df — at 100 TB this operator is the VERIFIER
    for candidates from minhash_dup_pairs, not a standalone all-pairs scan.
    """
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids, shs = [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            for sh in shingles_of(text):
                ids.append(doc_id)
                shs.append(sh)
        return pa.table({"shingle": pa.array(shs, pa.string()),
                         "doc_id": pa.array(ids, pa.int64())})

    exploded = docs.map_batches(explode, batch_format="pyarrow")

    # doc -> shingle-set size (small table, broadcast)
    sizes_rows = exploded.groupby("doc_id").aggregate(
        Count(alias_name="sz")).take_all()
    sizes = {r["doc_id"]: r["sz"] for r in sizes_rows}
    sizes_ref = bput(sizes)

    def pairs_of_group(g: pa.Table) -> pa.Table:
        ids = sorted(g.column("doc_id").to_pylist())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"ida": pa.array(a, pa.int64()),
                         "idb": pa.array(b, pa.int64())})

    inter = exploded.groupby("shingle").map_groups(
        pairs_of_group, batch_format="pyarrow").groupby(
        ["ida", "idb"]).aggregate(Count(alias_name="inter"))

    def jaccard(t: pa.Table) -> pa.Table:
        sz = bget(sizes_ref)
        ia = t.column("ida").to_numpy()
        ib = t.column("idb").to_numpy()
        inter_n = t.column("inter").to_numpy().astype(np.float64)
        union_n = np.array([sz[x] + sz[y] for x, y in zip(ia, ib)]) - inter_n
        jac = inter_n / union_n
        m = jac >= threshold
        return pa.table({"ida": pa.array(ia[m], pa.int64()),
                         "idb": pa.array(ib[m], pa.int64()),
                         "jac": pa.array(sql_round(jac[m], 4), pa.float64())})

    rows = inter.map_batches(jaccard, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["ida"], r["idb"]))
    return pa.table({
        "ida": pa.array([r["ida"] for r in rows], pa.int64()),
        "idb": pa.array([r["idb"] for r in rows], pa.int64()),
        "jac": pa.array([r["jac"] for r in rows], pa.float64()),
    })


# ------------------------------------------------------------------- minhash
def minhash_signatures(ds: "rd.Dataset", num_perm: int = 64,
                       seed: int = 7) -> "rd.Dataset":
    """Per-doc MinHash signature (vectorized): stable 64-bit shingle hashes
    permuted by ``num_perm`` affine maps (a*h+b mod 2^61-1)."""
    p = (1 << 61) - 1
    rng = np.random.default_rng(seed)
    a = rng.integers(1, p, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, p, size=num_perm, dtype=np.int64).astype(np.uint64)
    ref = bput((a, b))

    def fn(t: pa.Table) -> pa.Table:
        aa, bb = bget(ref)
        ids, sigs = [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            sh = shingles_of(text)
            if not sh:
                continue
            h = np.array([_stable_h64(s) for s in sh], dtype=np.uint64) % np.uint64(p)
            # affine permutations via Python-int matmul-free loop in numpy
            perm = (h[:, None] * aa[None, :] + bb[None, :]) % np.uint64(p)
            sigs.append(perm.min(axis=0))
            ids.append(doc_id)
        if not ids:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sig": pa.array([], pa.list_(pa.uint64()))})
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def minhash_dup_pairs(sf_dir: str, num_perm: int = 64, bands: int = 16,
                      threshold: float = JACCARD_THRESHOLD) -> pa.Table:
    """MinHash + LSH near-dup pairs (the scale path): signature → band rows →
    groupby(band_id, band_hash) buckets → candidate pairs → EXACT Jaccard
    verification of candidates only. Never an all-pairs scan."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    rows_per_band = num_perm // bands
    sig_ds = minhash_signatures(docs, num_perm=num_perm)

    def band_rows(t: pa.Table) -> pa.Table:
        b_ids, b_hash, d_ids = [], [], []
        for doc_id, sig in zip(t.column("doc_id").to_pylist(),
                               t.column("sig").to_pylist()):
            arr = np.asarray(sig, dtype=np.uint64)
            for band in range(bands):
                chunk = arr[band * rows_per_band:(band + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                b_ids.append(band)
                b_hash.append(h)
                d_ids.append(doc_id)
        return pa.table({"band_id": pa.array(b_ids, pa.int32()),
                         "band_hash": pa.array(b_hash, pa.string()),
                         "doc_id": pa.array(d_ids, pa.int64())})

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = sorted(set(g.column("doc_id").to_pylist()))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"ida": pa.array(a, pa.int64()),
                         "idb": pa.array(b, pa.int64())})

    cand = sig_ds.map_batches(band_rows, batch_format="pyarrow").groupby(
        ["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pyarrow").groupby(
        ["ida", "idb"]).aggregate(Count(alias_name="n_bands"))
    cand_rows = cand.take_all()

    if not cand_rows:
        return pa.table({"ida": pa.array([], pa.int64()),
                         "idb": pa.array([], pa.int64()),
                         "jac": pa.array([], pa.float64())})

    # exact verification of the (small) candidate set: broadcast shingle sets
    # of candidate docs only
    cand_ids = sorted({r["ida"] for r in cand_rows} | {r["idb"] for r in cand_rows})
    cand_set = set(cand_ids)

    def cand_shingles(t: pa.Table) -> pa.Table:
        ids, shs = [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            if doc_id in cand_set:
                ids.append(doc_id)
                shs.append(sorted(shingles_of(text)))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "shingles": pa.array(shs, pa.list_(pa.string()))})

    sh_map: Dict[int, Set[str]] = {}
    for r in docs.map_batches(cand_shingles, batch_format="pyarrow").take_all():
        sh_map[r["doc_id"]] = set(r["shingles"])

    out_a, out_b, out_j = [], [], []
    for r in sorted(cand_rows, key=lambda r: (r["ida"], r["idb"])):
        sa, sb = sh_map.get(r["ida"], set()), sh_map.get(r["idb"], set())
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        jac = inter / (len(sa) + len(sb) - inter)
        if jac >= threshold:
            out_a.append(r["ida"])
            out_b.append(r["idb"])
            out_j.append(jac)
    return pa.table({"ida": pa.array(out_a, pa.int64()),
                     "idb": pa.array(out_b, pa.int64()),
                     "jac": pa.array(sql_round(out_j, 4), pa.float64())})


# ------------------------------------------------------------------- simhash
def simhash64(text: str) -> int:
    """64-bit SimHash over simple tokens (tf-weighted bit votes)."""
    from collections import Counter

    votes = np.zeros(64, dtype=np.int64)
    for tok, tf in Counter(simple_tokenize(text)).items():
        h = _stable_h64(tok)
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes += np.where(bits.astype(bool), tf, -tf)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """SimHash near-dup pairs: 64-bit fingerprints, candidate generation by
    the 4-segment pigeonhole trick (hamming<=3 ⇒ at least one identical
    16-bit segment), verification by exact hamming distance."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp_batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        fps = [simhash64(x) for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(fps, pa.uint64())})

    fp_ds = docs.map_batches(fp_batch, batch_format="pyarrow")

    def seg_rows(t: pa.Table) -> pa.Table:
        d, seg, segv, fp = [], [], [], []
        for doc_id, f in zip(t.column("doc_id").to_pylist(),
                             t.column("fp").to_pylist()):
            for s in range(4):
                d.append(doc_id)
                seg.append(s)
                segv.append((f >> (16 * s)) & 0xFFFF)
                fp.append(f)
        return pa.table({"seg": pa.array(seg, pa.int32()),
                         "segv": pa.array(segv, pa.int32()),
                         "doc_id": pa.array(d, pa.int64()),
                         "fp": pa.array(fp, pa.uint64())})

    def seg_pairs(g: pa.Table) -> pa.Table:
        rows = sorted(zip(g.column("doc_id").to_pylist(),
                          g.column("fp").to_pylist()))
        a, b, ham = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if rows[i][0] == rows[j][0]:
                    continue
                d = bin(rows[i][1] ^ rows[j][1]).count("1")
                if d <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    ham.append(d)
        return pa.table({"ida": pa.array(a, pa.int64()),
                         "idb": pa.array(b, pa.int64()),
                         "hamming": pa.array(ham, pa.int32())})

    pairs = fp_ds.map_batches(seg_rows, batch_format="pyarrow").groupby(
        ["seg", "segv"]).map_groups(seg_pairs, batch_format="pyarrow")
    rows = {(r["ida"], r["idb"]): r["hamming"] for r in pairs.take_all()}
    keys = sorted(rows)
    return pa.table({
        "ida": pa.array([k[0] for k in keys], pa.int64()),
        "idb": pa.array([k[1] for k in keys], pa.int64()),
        "hamming": pa.array([rows[k] for k in keys], pa.int32()),
    })


# ----------------------------------------------------------------- embedding
def embedding_dup_pairs(sf_dir: str,
                        threshold: float = COSINE_DUP_THRESHOLD) -> pa.Table:
    """Embedding-cosine near-dup pairs. The comparison matrix is broadcast
    once (ray.put) and each batch does one float64 matmul against it —
    the blocked-matmul pattern that scales to an IVF/LSH-bucketed variant."""
    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    all_rows = emb.take_all()  # comparison side: small at test scale; at 100TB
    # this side is IVF-partitioned and only same-cluster blocks are compared
    ids_all = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in all_rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ref = bput((ids_all, mat))

    def fn(t: pa.Table) -> pa.Table:
        bids, bmat = bget(ref)
        ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        cos = m @ bmat.T
        ia, ib, cc = [], [], []
        for r in range(len(ids)):
            hit = np.where(cos[r] >= threshold)[0]
            for c in hit:
                if ids[r] < bids[c]:
                    ia.append(ids[r])
                    ib.append(bids[c])
                    cc.append(cos[r, c])
        return pa.table({"ida": pa.array(ia, pa.int64()),
                         "idb": pa.array(ib, pa.int64()),
                         "cos": pa.array(cc, pa.float64())})

    rows = emb.map_batches(fn, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["ida"], r["idb"]))
    return pa.table({
        "ida": pa.array([r["ida"] for r in rows], pa.int64()),
        "idb": pa.array([r["idb"] for r in rows], pa.int64()),
        "cos": pa.array(sql_round([r["cos"] for r in rows], 4), pa.float64()),
    })
