"""Deterministic synthetic embeddings table (scaling-bench input).

Same shape as the driver's ``embeddings.parquet`` — ``(vec_id:int64,
embedding:list<float> unit-norm, label:int32)`` — at arbitrary row
counts, for the ``bench.py --scaling-query`` evidence on the
embedding-family operators (ANN, embedding near-dup, SemDeDup,
k-means assignment).  Determinism contract as ``synth_graph`` /
``synth_docs``: every random draw is a counter-keyed splitmix64 hash
(Box-Muller for normals), so generation is embarrassingly parallel
and bit-identical at any block layout or parallelism.

Structure:

- ``n_clusters`` unit-norm cluster centers (label = cluster id);
  a point = ``normalize(center + noise_scale * N(0, I))`` — loose
  clusters like the driver fixture;
- a ``dup_rate`` fraction of points are NEAR-DUPLICATES of the
  anchor point of their 50-point stripe (tiny extra noise, cosine
  ~0.99+) so the near-dup/SemDeDup sweeps land planted structure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .synth_graph import _splitmix64, _u01

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_SALT_U2 = np.uint64(0xD6E8FEB86659FD93)


def _gauss(key: np.ndarray) -> np.ndarray:
    """Standard normals from uint64 counter keys (Box-Muller)."""
    u1 = _u01(_splitmix64(key))
    u2 = _u01(_splitmix64(key ^ _SALT_U2))
    return (np.sqrt(-2.0 * np.log(np.maximum(u1, 1e-300)))
            * np.cos(2.0 * np.pi * u2))


def _centers(n_clusters: int, dim: int, seed: int) -> np.ndarray:
    key = (np.arange(n_clusters * dim, dtype=np.uint64) * _GOLD
           ^ np.uint64(seed) ^ np.uint64(0xABCDEF))
    c = _gauss(key).reshape(n_clusters, dim)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _embs_for_ids(ids: np.ndarray, seed: int, dim: int, n_clusters: int,
                  noise_scale: float, dup_rate: float, stripe: int,
                  dup_noise: float) -> pa.Table:
    ids = ids.astype(np.uint64)
    s = np.uint64(seed)
    n = len(ids)
    cents = _centers(n_clusters, dim, seed)

    anchors = (ids // np.uint64(stripe)) * np.uint64(stripe)
    h_dup = _splitmix64(ids * _GOLD ^ s ^ np.uint64(5))
    is_dup = (_u01(h_dup) < dup_rate) & (ids != anchors)
    draw_id = np.where(is_dup, anchors, ids)

    h_c = _splitmix64(draw_id * _GOLD ^ s ^ np.uint64(6))
    cluster = np.floor(_u01(h_c) * n_clusters).astype(np.int64)
    cluster = np.minimum(cluster, n_clusters - 1)

    # per-(draw point, dim) noise — dup pairs share it, then diverge
    # by a small own-keyed perturbation
    key = (draw_id[:, None] * _GOLD
           ^ (np.arange(dim, dtype=np.uint64)[None, :] + np.uint64(1))
           * np.uint64(0xC2B2AE3D27D4EB4F) ^ s)
    vec = cents[cluster] + noise_scale * _gauss(key.ravel()).reshape(n, dim)
    if is_dup.any():
        okey = (ids[:, None] * _GOLD
                ^ (np.arange(dim, dtype=np.uint64)[None, :] + np.uint64(1))
                * np.uint64(0x94D049BB133111EB) ^ s)
        pert = _gauss(okey.ravel()).reshape(n, dim)
        vec = vec + np.where(is_dup[:, None], dup_noise * pert, 0.0)
    vec = (vec / np.linalg.norm(vec, axis=1, keepdims=True)) \
        .astype(np.float32)

    flat = pa.array(vec.reshape(-1), pa.float32())
    offs = pa.array(np.arange(n + 1, dtype=np.int32) * dim)
    return pa.table({
        "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
        "embedding": pa.ListArray.from_arrays(offs, flat),
        "label": pa.array(cluster.astype(np.int32), pa.int32()),
    })


def synthetic_embeddings(n: int, seed: int = 9, dim: int = 64,
                         n_clusters: int = 10, noise_scale: float = 0.6,
                         dup_rate: float = 0.1, stripe: int = 50,
                         dup_noise: float = 0.05,
                         override_num_blocks: int | None = None):
    """Distributed embeddings Dataset — see module docstring."""
    import ray.data as rd

    def gen(batch: dict) -> pa.Table:
        return _embs_for_ids(np.asarray(batch["id"]), seed, dim,
                             n_clusters, noise_scale, dup_rate, stripe,
                             dup_noise)

    return rd.range(n, override_num_blocks=override_num_blocks).map_batches(
        gen, batch_format="numpy"
    )


def synthetic_embeddings_numpy(n: int, seed: int = 9, dim: int = 64,
                               n_clusters: int = 10,
                               noise_scale: float = 0.6,
                               dup_rate: float = 0.1, stripe: int = 50,
                               dup_noise: float = 0.05) -> pa.Table:
    """Driver-side generation (oracle/test path) — identical rows."""
    return _embs_for_ids(np.arange(n, dtype=np.uint64), seed, dim,
                         n_clusters, noise_scale, dup_rate, stripe,
                         dup_noise)


def embeddings_table_for_range(lo: int, hi: int, **kw) -> pa.Table:
    """Rows ``vec_id in [lo, hi)`` — chunked-writer helper (counter
    keying makes any id range independently generable)."""
    return _embs_for_ids(np.arange(lo, hi, dtype=np.uint64),
                         kw.pop("seed", 9), kw.pop("dim", 64),
                         kw.pop("n_clusters", 10),
                         kw.pop("noise_scale", 0.6),
                         kw.pop("dup_rate", 0.1), kw.pop("stripe", 50),
                         kw.pop("dup_noise", 0.05))
