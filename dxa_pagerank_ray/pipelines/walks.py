"""Deterministic random-walk corpus generation (DeepWalk-style, Perozzi
et al. 2014 — public literature): fixed-length uniform random walks over
the out-adjacency, emitted as ``(walk_id, step, v)`` rows — the node
"sentences" that feed skip-gram embedding training.

Determinism contract (the property that makes walks verifiable and
resumable at 100 TB): step ``t`` of walk ``w`` standing at vertex ``v``
moves to ``nbrs(v)[splitmix64(w, seed*1_000_003 + t) % outdeg(v)]``
with the neighbor list SORTED by vertex id — a pure function of
``(walk_id, step, seed)`` and the deduplicated edge set, independent of
partitioning, shard count, execution order, and arrival order.  The
sequential reference (``walks_reference``) replays the identical
arithmetic, so a hash match proves the distributed walker exchange is
order-independent.

Execution shape: the same pinned CSR shard-actor family as the label
engines — walkers live on the shard owning their current vertex; each
superstep every shard advances its residents ONE step vectorized
(gather degrees, one ``sample_hash`` call per shard, fancy-index the
next vertices), logs the emissions locally, and routes moved walkers
with one packed ``(counts, wid, v)`` buffer per source shard (2A
object-store ops per step).  Walks retire when they reach a dangling
vertex.  The log never touches the driver until the final bounded
collect (or per-shard Parquet write at scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.sampling import sample_hash
from .pagerank_csr import (
    _bounds,
    _shard_parts,
    default_num_actors,
    distribute_edges,
)

_SEED_MIX = 1_000_003


def _make_walk_actor_cls():
    import ray

    @ray.remote
    class WalkShard:
        def __init__(self, shard_id: int, bounds: np.ndarray,
                     shard_parts: np.ndarray, seed: int,
                     weighted: bool = False):
            self.weighted = weighted
            self._edge_w: list[np.ndarray] = []
            self.s = shard_id
            self.bounds = bounds
            self.sp = shard_parts
            self.A = len(shard_parts) - 1
            self.lo = int(bounds[shard_parts[shard_id]])
            self.hi = int(bounds[shard_parts[shard_id + 1]])
            self.size = self.hi - self.lo
            self.shard_lo = bounds[shard_parts[:-1]]
            self.seed = seed
            self._edge_src: list[np.ndarray] = []
            self._edge_dst: list[np.ndarray] = []
            self._seen_keys: set[str] = set()
            self.wid = np.array([], dtype=np.int64)   # resident walkers
            self.cur = np.array([], dtype=np.int64)   # their LOCAL vertex
            self._log: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []

        def add_edges(self, t: pa.Table, key: str | None = None) -> int:
            if key is not None:
                if key in self._seen_keys:
                    return 0
                self._seen_keys.add(key)
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            self._edge_src.append(src)
            self._edge_dst.append(dst)
            if self.weighted:
                w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
                if len(w) and w.min() <= 0:
                    raise ValueError("walk edge weights must be positive "
                                     "integers (link counts)")
                self._edge_w.append(w)
            return len(src)

        def seal(self) -> int:
            """Per-vertex CSR with neighbor lists SORTED by id — the
            arrival-order-independent layout the determinism contract
            needs.  Weighted: an INTEGER cumulative-weight array over
            the sorted edges — integer arithmetic keeps the per-vertex
            weight offsets exact, so the draw is bit-identical at any
            shard layout (a float cumsum would round differently per
            shard)."""
            src = (np.concatenate(self._edge_src)
                   if self._edge_src else np.array([], dtype=np.int64))
            dst = (np.concatenate(self._edge_dst)
                   if self._edge_dst else np.array([], dtype=np.int64))
            w = (np.concatenate(self._edge_w)
                 if self._edge_w else np.array([], dtype=np.int64))
            self._edge_src = self._edge_dst = self._edge_w = []
            self._seen_keys = set()
            src_local = src - self.lo
            order = np.lexsort((dst, src_local))
            src_local, dst = src_local[order], dst[order]
            deg = np.bincount(src_local, minlength=self.size)
            self.indptr = np.concatenate(
                [[0], np.cumsum(deg)]).astype(np.int64)
            self.nbrs = dst
            if self.weighted:
                self.cw = np.cumsum(w[order]).astype(np.int64)
            return int(len(dst))

        def start_walks(self, seeds: np.ndarray) -> int:
            """Claim the walks starting in this shard's vertex range
            (walk_id = start vertex id) and log their step-0 rows."""
            mine = seeds[(seeds >= self.lo) & (seeds < self.hi)]
            self.wid = mine.astype(np.int64)
            self.cur = self.wid - self.lo
            self._log = [(self.wid.copy(),
                          np.zeros(len(mine), dtype=np.int64),
                          self.wid.copy())]
            return len(mine)

        def step_compute(self, t: int):
            """Advance residents one step; log arrivals; emit ONE
            packed (counts, wid, v_global) buffer routing every moved
            walker to its new owner.  Dangling residents retire."""
            deg = self.indptr[self.cur + 1] - self.indptr[self.cur]
            alive = deg > 0
            wid, cur, deg = self.wid[alive], self.cur[alive], deg[alive]
            if len(wid):
                h = sample_hash(wid, self.seed * _SEED_MIX + t)
                if self.weighted:
                    # inverse-CDF draw over exact integer cumulative
                    # weights: P(edge j) = w_j / W(v)
                    s_ptr = self.indptr[cur]
                    base = np.where(s_ptr > 0, self.cw[s_ptr - 1], 0)
                    tot = self.cw[self.indptr[cur + 1] - 1] - base
                    pick_val = (h % tot.astype(np.uint64)).astype(np.int64)
                    nxt = self.nbrs[np.searchsorted(
                        self.cw, base + pick_val, side="right")]
                else:
                    pick = (h % deg.astype(np.uint64)).astype(np.int64)
                    nxt = self.nbrs[self.indptr[cur] + pick]
                self._log.append(
                    (wid, np.full(len(wid), t, dtype=np.int64), nxt))
            else:
                nxt = np.array([], dtype=np.int64)
            self.wid = np.array([], dtype=np.int64)
            self.cur = np.array([], dtype=np.int64)
            owner = np.searchsorted(self.shard_lo, nxt,
                                    side="right") - 1
            order = np.argsort(owner, kind="stable")
            wid, nxt, owner = wid[order], nxt[order], owner[order]
            counts = np.bincount(owner, minlength=self.A).astype(np.int64)
            return counts, wid, nxt

        def step_apply(self, *packed) -> int:
            """Adopt inbound walkers (they already logged their arrival
            at the source shard)."""
            wids, curs = [], []
            for counts, wid_all, v_all in packed:
                end = int(counts[: self.s + 1].sum())
                start = end - int(counts[self.s])
                wids.append(wid_all[start:end])
                curs.append(v_all[start:end] - self.lo)
            self.wid = (np.concatenate(wids) if wids
                        else np.array([], dtype=np.int64))
            self.cur = (np.concatenate(curs) if curs
                        else np.array([], dtype=np.int64))
            return len(self.wid)

        def collect_log(self) -> pa.Table:
            if not self._log:
                return pa.table({"walk_id": pa.array([], pa.int64()),
                                 "step": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())})
            return pa.table({
                "walk_id": pa.array(
                    np.concatenate([x[0] for x in self._log]), pa.int64()),
                "step": pa.array(
                    np.concatenate([x[1] for x in self._log]), pa.int64()),
                "v": pa.array(
                    np.concatenate([x[2] for x in self._log]), pa.int64()),
            })

        def write_log(self, out_dir: str) -> str:
            """Per-shard Parquet sink — the scale path (the driver
            never materializes the corpus)."""
            import os

            import pyarrow.parquet as pq

            os.makedirs(out_dir, exist_ok=True)
            name = f"shard={self.s:03d}.parquet"
            pq.write_table(self.collect_log(),
                           os.path.join(out_dir, name))
            return name

    return WalkShard


class WalkCSR:
    """Pinned walk-shard pool over a directed deduplicated edge
    Dataset."""

    def __init__(self, edges_ds, num_vertices: int, num_partitions: int = 32,
                 num_actors: int | None = None, seed: int = 0,
                 num_cpus_per_actor: float = 1.0, weighted: bool = False):
        import ray

        self.n = num_vertices
        self.A = num_actors or default_num_actors(num_partitions)
        self.bounds = _bounds(num_vertices, num_partitions)
        self.sp = _shard_parts(num_partitions, self.A)
        shard_lo = self.bounds[self.sp[:-1]]
        cls = _make_walk_actor_cls()
        self.actors = [
            cls.options(num_cpus=num_cpus_per_actor).remote(
                a, self.bounds, self.sp, seed, weighted)
            for a in range(self.A)
        ]
        distribute_edges(edges_ds, self.actors, shard_lo)
        self.num_edges = sum(
            ray.get([a.seal.remote() for a in self.actors]))

    def run(self, seeds, length: int) -> None:
        """Walk ``length`` steps from each seed vertex (walk_id = seed
        id).  Rows logged: step 0 (the seed) through the last step
        reached (walks retire at dangling vertices)."""
        import ray

        seeds = np.unique(np.asarray(seeds, dtype=np.int64))
        if len(seeds) and (seeds[0] < 0 or seeds[-1] >= self.n):
            raise ValueError("seed ids out of range")
        ray.get([a.start_walks.remote(seeds) for a in self.actors])
        for t in range(1, length + 1):
            outs = [a.step_compute.remote(t) for a in self.actors]
            moved = ray.get([self.actors[b].step_apply.remote(*outs)
                             for b in range(self.A)])
            if sum(moved) == 0:
                break

    def collect(self) -> pa.Table:
        """Driver-side corpus table — small/medium runs only; at scale
        use ``write_logs``."""
        import ray

        return pa.concat_tables(
            ray.get([a.collect_log.remote() for a in self.actors]))

    def write_logs(self, out_dir: str) -> list[str]:
        import ray

        return sorted(ray.get([a.write_log.remote(out_dir)
                               for a in self.actors]))

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []


def walks_reference(src: np.ndarray, dst: np.ndarray, n: int,
                    seeds: np.ndarray, length: int,
                    seed: int = 0, w: np.ndarray | None = None) -> pa.Table:
    """Sequential single-process replay of the identical walk
    arithmetic (sorted-neighbor CSR + the same per-(walk, step)
    splitmix64 draw; with ``w``: the same integer inverse-CDF draw over
    cumulative weights) — the materialized-parquet oracle pattern: a
    hash match proves the distributed walker exchange is partition- and
    order-independent."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    cw = (np.cumsum(np.asarray(w, dtype=np.int64)[order]).astype(np.int64)
          if w is not None else None)
    deg = np.bincount(src, minlength=n)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    wid = np.unique(np.asarray(seeds, dtype=np.int64))
    cur = wid.copy()
    out_w = [wid.copy()]
    out_t = [np.zeros(len(wid), dtype=np.int64)]
    out_v = [wid.copy()]
    for t in range(1, length + 1):
        d = indptr[cur + 1] - indptr[cur]
        alive = d > 0
        wid, cur, d = wid[alive], cur[alive], d[alive]
        if not len(wid):
            break
        h = sample_hash(wid, seed * _SEED_MIX + t)
        if cw is not None:
            s_ptr = indptr[cur]
            base = np.where(s_ptr > 0, cw[s_ptr - 1], 0)
            tot = cw[indptr[cur + 1] - 1] - base
            pick_val = (h % tot.astype(np.uint64)).astype(np.int64)
            cur = dst[np.searchsorted(cw, base + pick_val, side="right")]
        else:
            cur = dst[indptr[cur]
                      + (h % d.astype(np.uint64)).astype(np.int64)]
        out_w.append(wid.copy())
        out_t.append(np.full(len(wid), t, dtype=np.int64))
        out_v.append(cur.copy())
    return pa.table({
        "walk_id": pa.array(np.concatenate(out_w), pa.int64()),
        "step": pa.array(np.concatenate(out_t), pa.int64()),
        "v": pa.array(np.concatenate(out_v), pa.int64()),
    })
