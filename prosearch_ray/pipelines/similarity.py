"""Similarity search over the ``embeddings`` table: brute-force cosine top-k
(the exact baseline, SQL-checkable) and an LSH-bucketed approximate variant
(the scale path).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

import ray.data as rd

from prosearch_ray.pipelines.common import read, sql_round
from prosearch_ray.state.broadcast import bget, bput

KNN_QUERY_IDS: Sequence[int] = (0, 1, 2, 3, 4)
KNN_K = 10


def _normalized(mat: np.ndarray) -> np.ndarray:
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def knn_cosine(sf_dir: str, query_ids: Sequence[int] = KNN_QUERY_IDS,
               k: int = KNN_K) -> pa.Table:
    """Exact brute-force cosine top-k: the query matrix is broadcast once;
    every batch computes one float64 matmul against it and keeps a local
    top-k per query; the driver merges ≤ k rows per (query, batch)."""
    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qset = set(int(q) for q in query_ids)

    def grab_queries(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_pylist()
        keep = [i for i, v in enumerate(ids) if v in qset]
        if not keep:
            return t.slice(0, 0)
        return t.take(pa.array(keep, pa.int64()))

    q_rows = emb.map_batches(grab_queries, batch_format="pyarrow").take_all()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = _normalized(np.array([r["embedding"] for r in q_rows], dtype=np.float64))
    ref = bput((q_ids, q_mat))

    def score(t: pa.Table) -> pa.Table:
        qids, qm = bget(ref)
        ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
        m = _normalized(np.array(t.column("embedding").to_pylist(), dtype=np.float64))
        cos = qm @ m.T  # (n_queries, batch)
        out_q, out_n, out_c = [], [], []
        for r in range(len(qids)):
            mask = ids != qids[r]
            row = cos[r][mask]
            rid = ids[mask]
            top = np.lexsort((rid, -row))[:k]
            out_q.extend([qids[r]] * len(top))
            out_n.extend(rid[top])
            out_c.extend(row[top])
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "nid": pa.array(out_n, pa.int64()),
                         "cos": pa.array(out_c, pa.float64())})

    rows = emb.map_batches(score, batch_format="pyarrow").take_all()
    out_q, out_n, out_c = [], [], []
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["nid"], r["cos"]))
    for q in sorted(by_q):
        nid = np.array([x[0] for x in by_q[q]], dtype=np.int64)
        cos = np.array([x[1] for x in by_q[q]], dtype=np.float64)
        top = np.lexsort((nid, -cos))[:k]
        out_q.extend([q] * len(top))
        out_n.extend(nid[top])
        out_c.extend(cos[top])
    return pa.table({"qid": pa.array(out_q, pa.int64()),
                     "nid": pa.array(out_n, pa.int64()),
                     "cos": pa.array(sql_round(out_c, 4), pa.float64())})


def lsh_knn(sf_dir: str, query_ids: Sequence[int] = KNN_QUERY_IDS,
            k: int = KNN_K, n_planes: int = 8, seed: int = 11) -> pa.Table:
    """Approximate top-k via random-hyperplane LSH buckets (the scale path:
    candidates come only from the query's bucket and its 1-bit-flip
    neighbors, so each batch scores a small candidate subset).  Recall is
    checked against knn_cosine in pytest, not against a SQL oracle."""
    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = emb.take(1)[0]
    dim = len(first["embedding"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def sig_of(mat: np.ndarray) -> np.ndarray:
        return ((mat @ planes.T) > 0) @ (1 << np.arange(n_planes))

    qset = set(int(q) for q in query_ids)
    q_rows = [r for r in emb.take_all() if r["vec_id"] in qset]
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = _normalized(np.array([r["embedding"] for r in q_rows], dtype=np.float64))
    q_sigs = sig_of(q_mat)
    # candidate buckets per query: own bucket + all 1-bit flips
    cand_buckets = {}
    for i, s in enumerate(q_sigs):
        cand_buckets[int(q_ids[i])] = {int(s)} | {int(s) ^ (1 << b)
                                                  for b in range(n_planes)}
    ref = bput((q_ids, q_mat, cand_buckets, planes))

    def score(t: pa.Table) -> pa.Table:
        qids, qm, cbuckets, pl = bget(ref)
        ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
        m = _normalized(np.array(t.column("embedding").to_pylist(), dtype=np.float64))
        sigs = ((m @ pl.T) > 0) @ (1 << np.arange(pl.shape[0]))
        out_q, out_n, out_c = [], [], []
        for r in range(len(qids)):
            mask = np.array([int(s) in cbuckets[int(qids[r])] for s in sigs])
            mask &= ids != qids[r]
            if not mask.any():
                continue
            cos = qm[r] @ m[mask].T
            rid = ids[mask]
            top = np.lexsort((rid, -cos))[:k]
            out_q.extend([qids[r]] * len(top))
            out_n.extend(rid[top])
            out_c.extend(cos[top])
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "nid": pa.array(out_n, pa.int64()),
                         "cos": pa.array(out_c, pa.float64())})

    rows = emb.map_batches(score, batch_format="pyarrow").take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["nid"], r["cos"]))
    out_q, out_n, out_c = [], [], []
    for q in sorted(by_q):
        nid = np.array([x[0] for x in by_q[q]], dtype=np.int64)
        cos = np.array([x[1] for x in by_q[q]], dtype=np.float64)
        top = np.lexsort((nid, -cos))[:k]
        out_q.extend([q] * len(top))
        out_n.extend(nid[top])
        out_c.extend(cos[top])
    return pa.table({"qid": pa.array(out_q, pa.int64()),
                     "nid": pa.array(out_n, pa.int64()),
                     "cos": pa.array(sql_round(out_c, 4), pa.float64())})


def _kmeans_centroids(mat: np.ndarray, n_clusters: int, seed: int,
                      n_iter: int = 8) -> np.ndarray:
    """Deterministic Lloyd's k-means on unit vectors (driver-side, over a
    sample at scale); returns L2-normalized centroids."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)
    cent = mat[np.sort(idx)].copy()
    for _ in range(n_iter):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_knn(sf_dir: str, query_ids: Sequence[int] = KNN_QUERY_IDS,
            k: int = KNN_K, n_clusters: int = 16, n_probe: int = 4,
            seed: int = 13) -> pa.Table:
    """IVF (inverted-file) approximate top-k: k-means centroids are trained
    once on the driver (on a sample, at scale) and broadcast; each batch
    assigns its vectors to their nearest centroid and scores them only
    against queries probing that cluster.  ``n_probe == n_clusters`` degrades
    to exact brute force — pinned against knn_cosine in pytest."""
    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    all_rows = emb.take_all()  # training sample; at 100TB use ds.random_sample
    ids_all = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    mat = _normalized(np.array([r["embedding"] for r in all_rows],
                               dtype=np.float64))
    cent = _kmeans_centroids(mat, n_clusters, seed)

    qset = set(int(q) for q in query_ids)
    q_mask = np.isin(ids_all, sorted(qset))
    q_ids = ids_all[q_mask]
    q_mat = mat[q_mask]
    # each query probes its n_probe nearest clusters
    probe = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]
    ref = bput((q_ids, q_mat, cent, probe))

    def score(t: pa.Table) -> pa.Table:
        qids, qm, c, pr = bget(ref)
        ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
        m = _normalized(np.array(t.column("embedding").to_pylist(),
                                 dtype=np.float64))
        assign = np.argmax(m @ c.T, axis=1)
        out_q, out_n, out_c = [], [], []
        for r in range(len(qids)):
            mask = np.isin(assign, pr[r]) & (ids != qids[r])
            if not mask.any():
                continue
            cos = qm[r] @ m[mask].T
            rid = ids[mask]
            top = np.lexsort((rid, -cos))[:k]
            out_q.extend([qids[r]] * len(top))
            out_n.extend(rid[top])
            out_c.extend(cos[top])
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "nid": pa.array(out_n, pa.int64()),
                         "cos": pa.array(out_c, pa.float64())})

    rows = emb.map_batches(score, batch_format="pyarrow").take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["nid"], r["cos"]))
    out_q, out_n, out_c = [], [], []
    for q in sorted(by_q):
        nid = np.array([x[0] for x in by_q[q]], dtype=np.int64)
        cos = np.array([x[1] for x in by_q[q]], dtype=np.float64)
        top = np.lexsort((nid, -cos))[:k]
        out_q.extend([q] * len(top))
        out_n.extend(nid[top])
        out_c.extend(cos[top])
    return pa.table({"qid": pa.array(out_q, pa.int64()),
                     "nid": pa.array(out_n, pa.int64()),
                     "cos": pa.array(sql_round(out_c, 4), pa.float64())})
