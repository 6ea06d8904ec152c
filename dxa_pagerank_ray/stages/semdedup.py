"""SemDeDup — semantic deduplication over an embedding column
(graft-added op; Abbas et al. 2023, arXiv:2303.09540): k-means-cluster
the embedding space on a deterministic bounded sample (reusing
``stages.ann.train_ivf_centroids``), assign every vector to its
nearest centroid with a broadcast-centroid ``map_batches`` pass, then
inside each cluster DROP every vector whose cosine similarity to a
lower-id cluster member exceeds ``threshold``.  Keeps one
representative per semantic near-duplicate ball — the embedding-space
complement of MinHash dedup (which only sees lexical overlap).

Drop rule: ``x`` is dropped iff SOME ``y`` with ``id(y) < id(x)`` in
the same cluster has ``cos(x, y) > threshold`` — *any* lower-id
neighbor, kept or not (the paper's greedy variant conditions on ``y``
itself being kept; the any-neighbor rule is deliberately chosen
because it is order-independent, hence embarrassingly parallel and
bit-reproducible under any partitioning, and only ever drops MORE
near-duplicates, never a vector with no near-dup).

Exact-kernel contract: every dot product here uses an
elementwise-multiply + last-axis reduce (``_exact_dots`` /
``_pair_sims``), NEVER a BLAS gemm.  numpy's pairwise reduction over
the contiguous last axis is a pure function of (row values, d), so
each similarity is bit-identical regardless of batch shape, tile
layout, or parallelism — BLAS gemm rounding is row-position-dependent
(measured: BASELINE.md), which would let a near-``threshold`` pair
flip between the distributed run and the sequential oracle.

Scale notes (100 TB): centroids are trained once on a bounded sample
and broadcast via ``ray.put``; assignment streams.  The sweep
co-locates one CLUSTER (not the dataset) per group — size
``n_centroids`` ~ N / desired_cluster so cluster width stays bounded;
clusters above ``max_cluster`` keep their overflow verbatim (logged),
mirroring the LSH hub-bucket cap, and the pair loop is tiled so
transient memory is ~``tile² · d`` floats regardless of cluster size.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from ..context import derive_num_groups
from .ann import _normalize, _to_matrix, train_ivf_centroids

_log = logging.getLogger(__name__)

# Cluster-member cap for the O(m²) sweep: members beyond the cap (in
# id order) are kept verbatim + logged — the safe direction (never a
# false drop).  4096² /2 pairs ≈ 8.4M sims per capped cluster.
_DEFAULT_MAX_CLUSTER = 4096

# Pair tile edge: each tile materializes ≤ tile² pair-rows × d floats
# (512² × 64 × 8 B ≈ 134 MB transient) — bounded regardless of m.
_SIM_TILE = 512


def _exact_dots(rows: np.ndarray, cents: np.ndarray,
                chunk: int = 8192) -> np.ndarray:
    """(n, d) · (C, d)ᵀ -> (n, C) WITHOUT BLAS: broadcast multiply +
    last-axis reduce, chunked over rows so the (chunk, C, d) temporary
    stays ~64 MB.  Each output element reduces its own contiguous
    length-d stretch — bit-deterministic for any chunking."""
    n = len(rows)
    out = np.empty((n, len(cents)), dtype=np.float64)
    for lo in range(0, n, chunk):
        blk = rows[lo:lo + chunk]
        out[lo:lo + chunk] = (blk[:, None, :] * cents[None, :, :]).sum(axis=2)
    return out


def _pair_sims(v: np.ndarray, ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
    """Row-pair cosine sims over unit rows — (pairs, d) multiply +
    axis-1 reduce; deterministic for any pair batching."""
    return (v[ii] * v[jj]).sum(axis=1)


def _segment_drops(ids: np.ndarray, v: np.ndarray, threshold: float,
                   max_cluster: int = _DEFAULT_MAX_CLUSTER,
                   tile: int = _SIM_TILE) -> np.ndarray:
    """One cluster's members, SORTED by id (``v`` unit rows aligned
    with ``ids``) -> boolean drop mask.  Pure module-level function
    shared verbatim by the distributed sweep and the sequential
    oracle reference — the bit-identity contract lives here."""
    m = len(ids)
    drop = np.zeros(m, dtype=bool)
    swept = min(m, max_cluster)
    for i0 in range(0, swept, tile):
        i1 = min(i0 + tile, swept)
        for j0 in range(i0, swept, tile):
            j1 = min(j0 + tile, swept)
            ii, jj = np.meshgrid(np.arange(i0, i1), np.arange(j0, j1),
                                 indexing="ij")
            if i0 == j0:
                keep = ii < jj
                ii, jj = ii[keep], jj[keep]
            else:
                ii, jj = ii.ravel(), jj.ravel()
            if not len(ii):
                continue
            hot = _pair_sims(v, ii, jj) > threshold
            drop[jj[hot]] = True  # jj is the larger index = larger id
    return drop


def assign_clusters(emb_ds, centroids: np.ndarray, id_col: str = "vec_id",
                    vec_col: str = "embedding"):
    """-> Dataset (id_col, cluster): nearest-centroid assignment,
    centroids broadcast once via ``ray.put``, exact-dot argmax (ties:
    lowest cluster id, numpy argmax first-max)."""
    import ray

    cents_ref = ray.put(np.ascontiguousarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        m = _normalize(_to_matrix(batch[vec_col]))
        cl = (_exact_dots(m, cents).argmax(axis=1)
              if len(m) else np.array([], dtype=np.int64))
        return pa.table({id_col: batch[id_col],
                         "cluster": pa.array(cl.astype(np.int64), pa.int64())})

    return emb_ds.map_batches(assign, batch_format="pyarrow")


def semantic_dedup_keepers(emb_ds, n_centroids: int = 16,
                           threshold: float = 0.97, seed: int = 7,
                           sample_n: int = 4096, iters: int = 10,
                           max_cluster: int = _DEFAULT_MAX_CLUSTER,
                           centroids: np.ndarray | None = None,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           num_groups: int | None = None):
    """-> Dataset (id_col, cluster) of the KEPT vectors (drop rule and
    determinism contract in the module docstring).  One shuffle: rows
    route to a coarse cluster group, each group runs one vectorized
    lexsort + boundary sweep (the repo-wide LSH-bucket pattern — no
    per-cluster ``map_groups`` task storm)."""
    import functools

    if centroids is None:
        centroids = train_ivf_centroids(
            emb_ds, n_centroids=n_centroids, sample_n=sample_n,
            iters=iters, seed=seed, id_col=id_col, vec_col=vec_col)
    import ray

    cents_ref = ray.put(np.ascontiguousarray(centroids, dtype=np.float64))
    G = num_groups if num_groups is not None else derive_num_groups(emb_ds)

    def assign_part(batch: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        m = _normalize(_to_matrix(batch[vec_col]))
        cl = (_exact_dots(m, cents).argmax(axis=1)
              if len(m) else np.array([], dtype=np.int64))
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(cl.astype(np.int64), pa.int64()),
            "part": pa.array(cl % G, pa.int64()),
            vec_col: batch[vec_col],
        })

    sweep = functools.partial(_semdedup_sweep, id_col=id_col,
                              vec_col=vec_col, threshold=threshold,
                              max_cluster=max_cluster)
    return (
        emb_ds.map_batches(assign_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sweep, batch_format="pyarrow")
    )


def _semdedup_sweep(t: pa.Table, id_col: str, vec_col: str,
                    threshold: float, max_cluster: int) -> pa.Table:
    """One coarse partition of (id, cluster, vec) rows -> kept
    (id, cluster) rows.  Lexsort by (cluster, id), then one
    ``_segment_drops`` per cluster segment."""
    ids = t[id_col].to_numpy(zero_copy_only=False)
    cl = t["cluster"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, cl))
    ids, cl = ids[order], cl[order]
    v = _normalize(_to_matrix(t[vec_col]))[order]
    starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
    ends = np.r_[starts[1:], len(cl)]
    keep = np.ones(len(cl), dtype=bool)
    n_capped = 0
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        if e - s > max_cluster:
            n_capped += 1
        keep[s:e] = ~_segment_drops(ids[s:e], v[s:e], threshold,
                                    max_cluster=max_cluster)
    if n_capped:
        _log.warning(
            "semantic_dedup: %d cluster(s) wider than max_cluster=%d; "
            "overflow members kept verbatim — raise n_centroids to "
            "narrow clusters", n_capped, max_cluster)
    return pa.table({
        id_col: pa.array(ids[keep], pa.int64()),
        "cluster": pa.array(cl[keep], pa.int64()),
    })
