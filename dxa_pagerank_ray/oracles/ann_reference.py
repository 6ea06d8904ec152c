"""Sequential (no-Ray) references for the approximate similarity ops.

Same role as ``stages.multimodal.media_expected_tables``: each function
computes a query's output on ONE in-memory table with the identical
math and tie-break order as the distributed stage, so materializing it
as parquet gives the driver a hash-checkable oracle.  A match proves
the distributed run — bucketing, sampling, actor batching, candidate
merge — is partition- and execution-order-independent.

The approximate ops are deterministic by construction here: LSH planes
come from a fixed seed, and IVF training reads a deterministic
hash-ordered sample (``stages.ann.train_ivf_centroids``) so engine and
reference train on the bit-identical matrix.  Outputs are integer-only
(ids + ranks), keeping the driver's value hash immune to the ~ulp
dot-product differences between batched and single-matrix BLAS calls.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.ann import (
    _kmeans,
    _merge_topk,
    _normalize,
    _sample_order,
    _to_matrix,
)


def _ids_matrix(t: pa.Table, id_col: str, vec_col: str):
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return ids, _normalize(_to_matrix(t[vec_col]))


def _candidates(ids, m, qn, hits_per_query) -> pa.Table:
    rows = []
    for j, hit in enumerate(hits_per_query):
        if not hit.any():
            continue
        sims = m[hit] @ qn[j]
        rows.append(pa.table({
            "qi": pa.array(np.full(int(hit.sum()), j, dtype=np.int64)),
            "neighbor_id": pa.array(ids[hit], pa.int64()),
            "sim": pa.array(sims, pa.float64()),
        }))
    if not rows:
        return pa.table({"qi": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    return pa.concat_tables(rows)


def lsh_topk_reference(t: pa.Table, queries: np.ndarray,
                       query_ids: np.ndarray, k: int = 10,
                       n_planes: int = 4, n_tables: int = 16, seed: int = 7,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> pa.Table:
    """Single-batch mirror of ``stages.ann.lsh_topk``."""
    ids, m = _ids_matrix(t, id_col, vec_col)
    q = np.asarray(queries, dtype=np.float64)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, q.shape[1]))
    qn = _normalize(q)
    q_sigs = np.stack(
        [(qn @ planes[tt].T > 0) @ (1 << np.arange(n_planes))
         for tt in range(n_tables)], axis=1)
    sigs = np.stack(
        [(m @ planes[tt].T > 0) @ (1 << np.arange(n_planes))
         for tt in range(n_tables)], axis=1)
    hits = [(sigs == q_sigs[j]).any(axis=1) for j in range(qn.shape[0])]
    return _merge_topk(_candidates(ids, m, qn, hits),
                       np.asarray(query_ids, dtype=np.int64), k)


def ivf_topk_reference(t: pa.Table, queries: np.ndarray,
                       query_ids: np.ndarray, k: int = 10,
                       n_centroids: int = 16, nprobe: int = 4,
                       sample_n: int = 4096, iters: int = 10, seed: int = 7,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> pa.Table:
    """Single-batch mirror of ``stages.ann.ivf_topk`` (training included:
    the same hash-ordered sample selection over the full table)."""
    ids, m = _ids_matrix(t, id_col, vec_col)
    order = _sample_order(ids, sample_n)
    cents = _kmeans(_normalize(_to_matrix(t[vec_col])[order]),
                    n_centroids, iters, seed)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    assign = np.argmax(m @ cents.T, axis=1)
    hits = [np.isin(assign, probes[j]) for j in range(qn.shape[0])]
    return _merge_topk(_candidates(ids, m, qn, hits),
                       np.asarray(query_ids, dtype=np.int64), k)


def embedding_near_dups_lsh_reference(
        t: pa.Table, threshold: float, n_planes: int = 8, n_tables: int = 6,
        seed: int = 7, max_bucket: int | None = None,
        id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Single-batch mirror of ``stages.dedup.embedding_near_dups_lsh``:
    (a, b) with a < b iff the two vectors share a (table, signature)
    bucket of size in [2, max_bucket] and exact cosine >= threshold —
    deduplicated across tables.  Integer-only output."""
    from ..stages.dedup import _DEFAULT_MAX_BUCKET

    if max_bucket is None:
        max_bucket = _DEFAULT_MAX_BUCKET
    ids, m = _ids_matrix(t, id_col, vec_col)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, m.shape[1]))
    pairs: set[tuple[int, int]] = set()
    for tt in range(n_tables):
        sig = ((m @ planes[tt].T > 0) @ (1 << np.arange(n_planes))).astype(
            np.int64)
        for b in np.unique(sig):
            idx = np.flatnonzero(sig == b)
            if len(idx) < 2 or len(idx) > max_bucket:
                continue
            sims = m[idx] @ m[idx].T
            ii, jj = np.nonzero(sims >= threshold)
            keep = jj > ii
            for i, j in zip(idx[ii[keep]], idx[jj[keep]]):
                a, c = int(ids[i]), int(ids[j])
                pairs.add((a, c) if a < c else (c, a))
    srt = sorted(pairs)
    return pa.table({
        "a": pa.array([p[0] for p in srt], pa.int64()),
        "b": pa.array([p[1] for p in srt], pa.int64()),
    })


def pagerank_top20_reference(src: np.ndarray, dst: np.ndarray, n: int,
                             k: int = 20, damping: float = 0.85,
                             threshold: float = 1e-8,
                             max_rounds: int = 200) -> pa.Table:
    """(v, rank): top-k vertices of the numpy lump-PageRank reference,
    ordered by (-pr, v) — the CSR engine's ``top_k`` tie-break."""
    from .graph_oracles import pagerank_lump

    pr, _, _ = pagerank_lump(src, dst, n, damping, threshold, max_rounds)
    order = np.lexsort((np.arange(n), -pr))[:k]
    return pa.table({
        "v": pa.array(order.astype(np.int64), pa.int64()),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64),
                         pa.int64()),
    })


def embedding_clusters_reference(t: pa.Table, n_centroids: int = 16,
                                 sample_n: int = 4096, iters: int = 10,
                                 seed: int = 7, id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> pa.Table:
    """Single-batch mirror of ``stages.semdedup.assign_clusters`` with
    ``stages.ann.train_ivf_centroids`` training: same hash-ordered
    sample, same ``_kmeans`` on the bit-identical matrix, and the same
    exact-dot (non-BLAS) argmax assignment, so cluster ids are
    bit-equal to the distributed run under any partitioning."""
    from ..stages.semdedup import _exact_dots

    ids, m = _ids_matrix(t, id_col, vec_col)
    order = _sample_order(ids, sample_n)
    cents = _kmeans(_normalize(_to_matrix(t[vec_col])[order]),
                    n_centroids, iters, seed)
    cl = _exact_dots(m, cents).argmax(axis=1).astype(np.int64)
    o = np.argsort(ids, kind="stable")
    return pa.table({id_col: pa.array(ids[o], pa.int64()),
                     "cluster": pa.array(cl[o], pa.int64())})


def semantic_dedup_reference(t: pa.Table, n_centroids: int = 16,
                             threshold: float = 0.97, sample_n: int = 4096,
                             iters: int = 10, seed: int = 7,
                             max_cluster: int | None = None,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> pa.Table:
    """Single-batch mirror of ``stages.semdedup.semantic_dedup_keepers``
    — identical training + assignment as ``embedding_clusters_reference``
    and the IDENTICAL ``_segment_drops`` pure function per cluster, so
    the kept set is bit-equal by construction."""
    from ..stages.semdedup import (
        _DEFAULT_MAX_CLUSTER,
        _exact_dots,
        _segment_drops,
    )

    if max_cluster is None:
        max_cluster = _DEFAULT_MAX_CLUSTER
    ids, m = _ids_matrix(t, id_col, vec_col)
    order = _sample_order(ids, sample_n)
    cents = _kmeans(_normalize(_to_matrix(t[vec_col])[order]),
                    n_centroids, iters, seed)
    cl = _exact_dots(m, cents).argmax(axis=1).astype(np.int64)
    o = np.lexsort((ids, cl))
    ids, cl, m = ids[o], cl[o], m[o]
    starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
    ends = np.r_[starts[1:], len(cl)]
    keep = np.ones(len(cl), dtype=bool)
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        keep[s:e] = ~_segment_drops(ids[s:e], m[s:e], threshold,
                                    max_cluster=max_cluster)
    return pa.table({id_col: pa.array(ids[keep], pa.int64()),
                     "cluster": pa.array(cl[keep], pa.int64())})
