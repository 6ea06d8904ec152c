"""Similarity search over an embedding column (graft-added op).

- ``brute_force_topk``: exact cosine top-k — numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once), per-batch local
  top-k, tiny global merge on the driver.  O(N·Q·D) distributed.
- ``lsh_topk``: random-hyperplane LSH bucketing — only vectors sharing
  a bucket with a query are scored.  Approximate; the bench/e2e tests
  measure its recall against brute force.
- ``ivf_topk``: IVF variant — spherical k-means cells trained on a
  bounded driver-side sample, queries probe the ``nprobe`` nearest
  cells; scanned fraction ~ nprobe/n_centroids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy flatten)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-30)


def _concat_candidates(batches: list) -> pa.Table:
    """Concat per-batch candidate tables; typed-empty when no batch
    produced candidates (Ray drops all-empty outputs entirely)."""
    if not batches:
        return pa.table({"qi": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    return pa.concat_tables(batches)


def _merge_topk(parts: pa.Table, qids: np.ndarray, k: int) -> pa.Table:
    """Driver-side merge of per-batch candidate (qi, neighbor_id, sim)
    rows into the final (query_id, neighbor_id, rank) table — ties
    broken by lower neighbor id, self-matches excluded."""
    qi = parts["qi"].to_numpy(zero_copy_only=False)
    nid = parts["neighbor_id"].to_numpy(zero_copy_only=False)
    sim = parts["sim"].to_numpy(zero_copy_only=False)
    out_q, out_n, out_r = [], [], []
    for j in range(len(qids)):
        mask = (qi == j) & (nid != qids[j])
        order = np.lexsort((nid[mask], -sim[mask]))[:k]
        sel_n = nid[mask][order]
        out_q.append(np.full(len(sel_n), qids[j], dtype=np.int64))
        out_n.append(sel_n)
        out_r.append(np.arange(1, len(sel_n) + 1, dtype=np.int64))
    cat = lambda xs: (np.concatenate(xs) if xs else np.array([], dtype=np.int64))  # noqa: E731
    return pa.table(
        {
            "query_id": pa.array(cat(out_q), pa.int64()),
            "neighbor_id": pa.array(cat(out_n), pa.int64()),
            "rank": pa.array(cat(out_r), pa.int64()),
        }
    )


def brute_force_topk(emb_ds, queries: np.ndarray, query_ids: np.ndarray,
                     k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> pa.Table:
    """-> (query_id, neighbor_id, rank) — exact cosine top-k per query,
    self-matches excluded, ties broken by lower neighbor id."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    qids = np.asarray(query_ids, dtype=np.int64)

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(batch[vec_col]))
        # Pre-sort rows by id so the stable argsort below breaks
        # similarity ties toward LOWER neighbor id — the same
        # (-sim, id) total order _merge_topk applies globally; plain
        # argpartition by sim alone could drop a tied lower-id row that
        # belongs in the final top-k.
        id_order = np.argsort(ids, kind="stable")
        ids = ids[id_order]
        sims = m[id_order] @ q.T  # (n, Q)
        nq = sims.shape[1]
        kk = min(k + 1, sims.shape[0])  # +1 to survive self-match removal
        part = np.argsort(-sims, axis=0, kind="stable")[:kk]  # (kk, Q)
        rows = []
        for j in range(nq):
            sel = part[:, j]
            rows.append(
                pa.table(
                    {
                        "qi": pa.array(np.full(len(sel), j, dtype=np.int64)),
                        "neighbor_id": pa.array(ids[sel], pa.int64()),
                        "sim": pa.array(sims[sel, j], pa.float64()),
                    }
                )
            )
        return pa.concat_tables(rows)

    parts = _concat_candidates(
        list(
            emb_ds.map_batches(score, batch_format="pyarrow").iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        )
    )
    return _merge_topk(parts, qids, k)


def lsh_topk(emb_ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
             n_planes: int = 4, n_tables: int = 16, seed: int = 7,
             id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Approximate cosine top-k: score only vectors that collide with a
    query in >=1 random-hyperplane hash table.  Same output schema as
    ``brute_force_topk``.

    Parameter regime: collision prob per plane is 1 - arccos(sim)/pi,
    so selectivity is tuned to the similarity regime — near-duplicate
    search (sim > 0.9) wants many planes (12-16) for sharp buckets;
    generic top-k over near-orthogonal embeddings needs few planes and
    more tables to keep recall (defaults favor recall)."""
    import ray

    q = np.asarray(queries, dtype=np.float64)
    d = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, d))
    qn = _normalize(q)
    q_sigs = np.stack(
        [(qn @ planes[t].T > 0) @ (1 << np.arange(n_planes)) for t in range(n_tables)],
        axis=1,
    )  # (Q, T)
    state_ref = ray.put((qn, q_sigs, planes))
    qids = np.asarray(query_ids, dtype=np.int64)

    def score(batch: pa.Table) -> pa.Table:
        qn_, q_sigs_, planes_ = ray.get(state_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(batch[vec_col]))
        sigs = np.stack(
            [(m @ planes_[t].T > 0) @ (1 << np.arange(planes_.shape[1]))
             for t in range(planes_.shape[0])],
            axis=1,
        )  # (n, T)
        rows = []
        for j in range(qn_.shape[0]):
            hit = (sigs == q_sigs_[j]).any(axis=1)
            if not hit.any():
                continue
            sims = m[hit] @ qn_[j]
            rows.append(
                pa.table(
                    {
                        "qi": pa.array(np.full(int(hit.sum()), j, dtype=np.int64)),
                        "neighbor_id": pa.array(ids[hit], pa.int64()),
                        "sim": pa.array(sims, pa.float64()),
                    }
                )
            )
        if not rows:
            return pa.table({"qi": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.concat_tables(rows)

    parts = _concat_candidates(
        list(
            emb_ds.map_batches(score, batch_format="pyarrow").iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        )
    )
    return _merge_topk(parts, qids, k)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain, Vigna) — vectorized uint64
    mix used as a deterministic pseudo-random order on integer ids."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _sample_order(ids: np.ndarray, sample_n: int) -> np.ndarray:
    """Row indices of the ``sample_n`` smallest ``(_mix64(id), id)``
    keys, in that key order — a partition- and execution-order-
    independent pseudo-random sample selection."""
    h = _mix64(ids)
    return np.lexsort((ids, h))[:sample_n]


def _kmeans(m: np.ndarray, n_centroids: int, iters: int,
            seed: int) -> np.ndarray:
    """Spherical k-means on a fixed (n, d) unit matrix — pure numpy,
    bit-deterministic given ``m``'s exact row order (shared by the
    distributed trainer and the sequential driver-oracle reference)."""
    rng = np.random.default_rng(seed)
    cents = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            sel = m[assign == c]
            if len(sel):
                cents[c] = sel.mean(axis=0)
        cents = _normalize(cents)
    return cents


def train_ivf_centroids(emb_ds, n_centroids: int = 16, sample_n: int = 4096,
                        iters: int = 10, seed: int = 7,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> np.ndarray:
    """Spherical k-means on a DETERMINISTIC bounded sample -> (C, d)
    unit centroids.  Each batch pre-selects its ``sample_n`` smallest
    ``(_mix64(id), id)`` rows (so at most sample_n vectors per batch
    reach the driver); the driver merges to the global smallest
    ``sample_n`` in key order.  The selected set AND its training
    order are functions of the ids alone — independent of
    partitioning, block arrival order, and parallelism — which makes
    the centroids (and every downstream cell assignment)
    bit-reproducible across runs and cluster shapes.  A plain
    ``limit()`` sample here would vary with the streaming executor's
    block order under ``preserve_order=False``."""

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.take(pa.array(_sample_order(ids, sample_n)))

    batches = [
        b for b in emb_ds.select_columns([id_col, vec_col])
        .map_batches(pick, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        if b.num_rows
    ]
    if not batches:
        raise ValueError("train_ivf_centroids: empty embedding dataset")
    t = pa.concat_tables(batches)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    order = _sample_order(ids, sample_n)
    m = _normalize(_to_matrix(t[vec_col])[order])
    return _kmeans(m, n_centroids, iters, seed)


def ivf_topk(emb_ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4, seed: int = 7,
             centroids: np.ndarray | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """IVF (inverted-file) approximate top-k: vectors partition into
    Voronoi cells of k-means centroids; each query scores only the
    ``nprobe`` nearest cells.  Scanned fraction ~ nprobe/n_centroids —
    the scale path when LSH selectivity is hard to tune.  Same output
    schema as ``brute_force_topk``; recall measured in tests."""
    import ray

    if centroids is None:
        centroids = train_ivf_centroids(emb_ds, n_centroids, seed=seed,
                                        id_col=id_col, vec_col=vec_col)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    # per-query probe lists: nprobe nearest centroids
    probes = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    state_ref = ray.put((qn, probes, centroids))
    qids = np.asarray(query_ids, dtype=np.int64)

    def score(batch: pa.Table) -> pa.Table:
        qn_, probes_, cents_ = ray.get(state_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(batch[vec_col]))
        assign = np.argmax(m @ cents_.T, axis=1)  # (n,)
        rows = []
        for j in range(qn_.shape[0]):
            hit = np.isin(assign, probes_[j])
            if not hit.any():
                continue
            sims = m[hit] @ qn_[j]
            rows.append(
                pa.table(
                    {
                        "qi": pa.array(np.full(int(hit.sum()), j, dtype=np.int64)),
                        "neighbor_id": pa.array(ids[hit], pa.int64()),
                        "sim": pa.array(sims, pa.float64()),
                    }
                )
            )
        if not rows:
            return pa.table({"qi": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.concat_tables(rows)

    parts = _concat_candidates(
        list(
            emb_ds.map_batches(score, batch_format="pyarrow").iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        )
    )
    return _merge_topk(parts, qids, k)
