"""Deterministic synthetic graph generator (FIXTURES.md F3).

Mirrors the reference's ``CreateSyntheticGraphSeed`` parameters
(``CreateSyntheticGraphSeed.java:36-41``): N dense vertices, per-vertex
in-degree ~ floor(Exp(mean)) capped at N-1 (``:145-147``), a locality
parameter biasing in-neighbors to nearby ids (``:119-143``), no
self-loops.  The reference replays one seeded RNG on every slave
because slaves cannot shuffle; here every random draw is a pure
counter-keyed hash (splitmix64 of (seed, vertex, draw-index)), so
generation is embarrassingly parallel inside ``map_batches`` AND
bit-identical regardless of batch/block boundaries or parallelism —
which is what makes the two-parallelism-level scaling runs read the
same graph.

Duplicates are possible by construction (the reference dedups per
vertex with a HashSet, ``:82-105``); the engine's exact-dedup stage
collapses them, exercising the first-class dedup path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_M = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M
    return x ^ (x >> np.uint64(31))


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)


def _edges_for_ids(ids: np.ndarray, n: int, mean_indeg: float,
                   locality: float, seed: int, window: int) -> pa.Table:
    ids = ids.astype(np.uint64)
    s = np.uint64(seed)
    h0 = _splitmix64(ids * np.uint64(0x9E3779B97F4A7C15) ^ s)
    indeg = np.minimum(
        np.floor(-mean_indeg * np.log(np.maximum(_u01(h0), 1e-300))),
        float(n - 1),
    ).astype(np.int64)
    total = int(indeg.sum())
    if total == 0:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64())})
    v_rep = np.repeat(ids.astype(np.int64), indeg)
    starts = np.cumsum(indeg) - indeg
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, indeg)
    key = (v_rep.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
           ^ (j.astype(np.uint64) + np.uint64(1)) * np.uint64(0xC2B2AE3D27D4EB4F)
           ^ s)
    h1 = _splitmix64(key)
    h2 = _splitmix64(h1 ^ np.uint64(0xD6E8FEB86659FD93))
    use_local = _u01(h1) < locality
    off = np.floor((_u01(h2) * 2.0 - 1.0) * window).astype(np.int64)
    src_local = np.clip(v_rep + off, 0, n - 1)
    src_uniform = np.floor(_u01(h2) * n).astype(np.int64)
    src = np.where(use_local, src_local, src_uniform)
    self_loop = src == v_rep
    src = np.where(self_loop, (v_rep + 1) % n, src)
    return pa.table({"src": pa.array(src, pa.int64()),
                     "dst": pa.array(v_rep, pa.int64())})


def synthetic_edges(n: int, mean_indeg: float = 6.0, locality: float = 0.8,
                    seed: int = 21, window: int | None = None,
                    override_num_blocks: int | None = None):
    """Distributed edge Dataset (duplicates included — dedup downstream)."""
    import ray.data as rd

    if window is None:
        window = max(16, n // 64)

    def gen(batch: dict) -> pa.Table:
        return _edges_for_ids(np.asarray(batch["id"]), n, mean_indeg,
                              locality, seed, window)

    return rd.range(n, override_num_blocks=override_num_blocks).map_batches(
        gen, batch_format="numpy"
    )


def synthetic_edges_numpy(n: int, mean_indeg: float = 6.0, locality: float = 0.8,
                          seed: int = 21, window: int | None = None):
    """Driver-side generation (oracle/test path) — identical rows."""
    if window is None:
        window = max(16, n // 64)
    return _edges_for_ids(np.arange(n, dtype=np.uint64), n, mean_indeg,
                          locality, seed, window)
