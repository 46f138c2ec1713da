"""Similarity search over the ``embeddings`` table: brute-force cosine top-k
(the exact baseline, SQL-checkable) and LSH/IVF-bucketed approximate variants
(the scale paths).

Scale contract (all three entry points):
- the full embeddings table is NEVER materialized on the driver — query rows
  are grabbed with a distributed filter, k-means trains on a bounded
  ``random_sample``, and every batch ships back at most k rows per query;
- the query matrix / centroids are broadcast once (``ray.put``) and each
  batch does one vectorized float64 matmul against them.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd

from prosearch_ray.pipelines.common import read, sql_round
from prosearch_ray.state.broadcast import bget, bput

KNN_QUERY_IDS: Sequence[int] = (0, 1, 2, 3, 4)
KNN_K = 10
IVF_TRAIN_CAP = 65536  # max rows pulled for k-means training (sampled above)


def _normalized(mat: np.ndarray) -> np.ndarray:
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def _mat_of(col) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> column without a Python
    list detour: flatten the Arrow list values and reshape."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if not len(arr):
        return np.empty((0, 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(flat, dtype=np.float64).reshape(len(arr), -1)


def _grab_query_rows(emb: "rd.Dataset",
                     query_ids: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Fetch the query vectors with a distributed filter (each batch ships
    back only matching rows — never the table), deterministically ordered by
    vec_id; returns (q_ids, L2-normalized q_mat)."""
    qset = sorted(int(q) for q in query_ids)

    def grab(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        keep = np.flatnonzero(np.isin(ids, qset))
        return t.take(pa.array(keep, pa.int64())) if keep.size else t.slice(0, 0)

    rows = emb.map_batches(grab, batch_format="pyarrow").take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    mat = _normalized(np.array([r["embedding"] for r in rows],
                               dtype=np.float64))[order]
    return ids[order], mat


def _merge_topk(rows, k: int) -> pa.Table:
    """Driver-side final merge of the per-batch local top-k rows (≤ k per
    (query, batch) — bounded, never the table)."""
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


def knn_cosine(sf_dir: str, query_ids: Sequence[int] = KNN_QUERY_IDS,
               k: int = KNN_K) -> pa.Table:
    """Exact brute-force cosine top-k: the query matrix is broadcast once;
    every batch computes one float64 matmul against it and keeps a local
    top-k per query; the driver merges ≤ k rows per (query, batch)."""
    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_ids, q_mat = _grab_query_rows(emb, query_ids)
    ref = bput((q_ids, q_mat))

    def score(t: pa.Table) -> pa.Table:
        qids, qm = bget(ref)
        ids = t.column("vec_id").to_numpy().astype(np.int64, copy=False)
        m = _normalized(_mat_of(t.column("embedding")))
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

    return _merge_topk(emb.map_batches(score, batch_format="pyarrow").take_all(), k)


def lsh_knn(sf_dir: str, query_ids: Sequence[int] = KNN_QUERY_IDS,
            k: int = KNN_K, n_planes: int = 8, seed: int = 11) -> pa.Table:
    """Approximate top-k via random-hyperplane LSH buckets (the scale path:
    candidates come only from the query's bucket and its 1-bit-flip
    neighbors, so each batch scores a small candidate subset).  Recall is
    checked against knn_cosine in pytest, not against a SQL oracle."""
    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_ids, q_mat = _grab_query_rows(emb, query_ids)
    dim = q_mat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    q_sigs = ((q_mat @ planes.T) > 0) @ (1 << np.arange(n_planes))
    # candidate buckets per query: own bucket + all 1-bit flips
    cand_buckets = {}
    for i, s in enumerate(q_sigs):
        cand_buckets[int(q_ids[i])] = np.array(
            sorted({int(s)} | {int(s) ^ (1 << b) for b in range(n_planes)}),
            dtype=np.int64)
    ref = bput((q_ids, q_mat, cand_buckets, planes))

    def score(t: pa.Table) -> pa.Table:
        qids, qm, cbuckets, pl = bget(ref)
        ids = t.column("vec_id").to_numpy().astype(np.int64, copy=False)
        m = _normalized(_mat_of(t.column("embedding")))
        sigs = (((m @ pl.T) > 0) @ (1 << np.arange(pl.shape[0]))).astype(np.int64)
        out_q, out_n, out_c = [], [], []
        for r in range(len(qids)):
            mask = np.isin(sigs, cbuckets[int(qids[r])]) & (ids != qids[r])
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

    return _merge_topk(emb.map_batches(score, batch_format="pyarrow").take_all(), k)


def _kmeans_centroids(mat: np.ndarray, n_clusters: int, seed: int,
                      n_iter: int = 8) -> np.ndarray:
    """Deterministic Lloyd's k-means on unit vectors (runs on the bounded
    training sample); returns L2-normalized centroids."""
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


def _train_sample_matrix(emb: "rd.Dataset", cap: int, seed: int) -> np.ndarray:
    """Bounded k-means training sample: at most ~``cap`` rows reach the
    driver — above that the table is down-sampled with a distributed
    ``random_sample`` — ordered by vec_id for determinism."""
    n = emb.count()
    ds = emb if n <= cap else emb.random_sample(cap / n, seed=seed)
    rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return _normalized(mat[np.argsort(ids)])


# ------------------------------------------------------- materialized IVF
IVF_INDEX_VERSION = 1


def build_ivf_index(sf_dir: str, root: str, n_clusters: int = 16,
                    seed: int = 13) -> dict:
    """Materialize a PERSISTENT IVF index (the reference's build-once,
    point-read-at-query-time shape, index.rs -> serve.rs, applied to ANN):
    k-means centroids trained on a bounded sample are saved at
    ``root/centroids.npy`` and the embeddings table is written
    cluster-partitioned (hive ``cluster=K/`` dirs with per-partition
    _SUCCESS markers via ``sinks.write_partitioned`` — resumable, never one
    giant file).  Queries then read ONLY probed partitions.

    Returns the manifest dict; a rerun with a matching manifest reuses the
    index without rewriting committed partitions."""
    import json
    import os

    from prosearch_ray import sinks

    man_path = os.path.join(root, "manifest.json")
    parts_dir = os.path.join(root, "parts")
    manifest = {"version": IVF_INDEX_VERSION, "n_clusters": n_clusters,
                "seed": seed}
    if os.path.exists(man_path):
        with open(man_path) as f:
            old = json.load(f)
        if {k: old.get(k) for k in manifest} != manifest:
            raise ValueError(
                f"ivf index at {root} was built with {old}, requested "
                f"{manifest}: use a different root")
        if len(sinks.committed_partitions(parts_dir, "cluster")) and \
                old.get("complete"):
            return old

    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent = _kmeans_centroids(_train_sample_matrix(emb, IVF_TRAIN_CAP, seed),
                             n_clusters, seed)
    os.makedirs(root, exist_ok=True)
    np.save(os.path.join(root, "centroids.npy"), cent)
    ref = bput(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = bget(ref)
        m = _normalized(_mat_of(t.column("embedding")))
        cl = (np.argmax(m @ c.T, axis=1) if len(m) else
              np.array([], np.int64)).astype(np.int32)
        return t.append_column("cluster", pa.array(cl, pa.int32()))

    rep = sinks.write_partitioned(
        emb.map_batches(assign, batch_format="pyarrow"), parts_dir, "cluster")
    manifest.update(complete=True, dim=int(cent.shape[1]),
                    written=len(rep["written"]), skipped=len(rep["skipped"]))
    with open(man_path, "w") as f:
        json.dump(manifest, f)
    return manifest


def ivf_index_search(root: str, q_ids: np.ndarray, q_mat: np.ndarray,
                     k: int = KNN_K, n_probe: int = 4,
                     _report: dict = None) -> pa.Table:
    """Top-k search over a materialized IVF index: load the (tiny)
    centroids, compute each query's ``n_probe`` nearest cells, and read
    ONLY those partition directories — the 100 TB path touches
    n_probe/n_clusters of the stored bytes.  Per-row cluster assignment is
    recomputed from the broadcast centroids inside each batch (one small
    matmul; bit-identical to the stored partitioning) so each query scores
    only vectors in ITS probed cells, not the union."""
    import os

    cent = np.load(os.path.join(root, "centroids.npy"))
    probe = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]
    probed = sorted({int(c) for c in probe.ravel()})
    dirs = [os.path.join(root, "parts", f"cluster={c}") for c in probed]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if _report is not None:
        total = len([n for n in os.listdir(os.path.join(root, "parts"))
                     if n.startswith("cluster=")])
        _report.update(probed_dirs=list(dirs), total_partitions=total)
    files = [os.path.join(d, f) for d in dirs
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return _merge_topk([], k)
    pruned = rd.read_parquet(files, columns=["vec_id", "embedding"])
    ref = bput((q_ids, q_mat, cent, probe))

    def score(t: pa.Table) -> pa.Table:
        qids, qm, c, pr = bget(ref)
        ids = t.column("vec_id").to_numpy().astype(np.int64, copy=False)
        m = _normalized(_mat_of(t.column("embedding")))
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

    return _merge_topk(
        pruned.map_batches(score, batch_format="pyarrow").take_all(), k)


def _ivf_cache_root(sf_dir: str, n_clusters: int, seed: int) -> str:
    import hashlib
    import os

    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{n_clusters}|{seed}|v{IVF_INDEX_VERSION}"
        .encode()).hexdigest()[:16]
    return os.path.join("/tmp", "prosearch_ivf_cache", key)


def ivf_knn(sf_dir: str, query_ids: Sequence[int] = KNN_QUERY_IDS,
            k: int = KNN_K, n_clusters: int = 16, n_probe: int = 4,
            seed: int = 13, index_root: str = None) -> pa.Table:
    """IVF (inverted-file) approximate top-k over a MATERIALIZED index:
    builds (or reuses — the build is resumable and cached per
    (sf_dir, n_clusters, seed)) the cluster-partitioned index, then routes
    queries through partition-pruned reads (``ivf_index_search``).
    ``n_probe == n_clusters`` probes every partition and degrades to exact
    brute force — pinned against knn_cosine in pytest."""
    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_ids, q_mat = _grab_query_rows(emb, query_ids)
    root = index_root or _ivf_cache_root(sf_dir, n_clusters, seed)
    build_ivf_index(sf_dir, root, n_clusters=n_clusters, seed=seed)
    return ivf_index_search(root, q_ids, q_mat, k=k, n_probe=n_probe)


CLUSTER_SEEDS = 8


def cluster_assign(sf_dir: str, n_seeds: int = CLUSTER_SEEDS) -> "rd.Dataset":
    """Nearest-seed cluster assignment — the (single) assignment step of
    k-means / IVF training with deterministic seed centroids (the first
    ``n_seeds`` vectors): each vector joins the seed with the highest
    cosine similarity (ties to the smallest seed id).  Seeds broadcast
    once; each batch is one float64 matmul + argmax — no shuffle."""
    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    s_ids, s_mat = _grab_query_rows(emb, list(range(n_seeds)))
    order = np.argsort(s_ids)
    s_ids, s_mat = s_ids[order], s_mat[order]
    ref = bput((s_ids, s_mat))

    def assign(t: pa.Table) -> pa.Table:
        sids, sm = bget(ref)
        ids = t.column("vec_id").to_numpy().astype(np.int64, copy=False)
        m = _normalized(_mat_of(t.column("embedding")))
        cos = m @ sm.T  # (batch, n_seeds); seed rows are unit-normalized
        best = np.argmax(cos, axis=1)  # first max = smallest sid (sorted)
        sim = cos[np.arange(len(ids)), best]
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(sids[best], pa.int64()),
            "sim": pa.array(sql_round(sim, 4), pa.float64()),
        })

    return emb.map_batches(assign, batch_format="pyarrow")
