"""CSR shard-actor HITS (hubs & authorities, Kleinberg 1999 — public
literature; no reference counterpart, dxa-pageRank implements only
PageRank).

Same execution shape as ``pagerank_csr.PageRankCSR`` (P fixed logical
partitions dealt onto A 1-CPU shard actors, packed per-round message
buffers, p-ordered float reductions so results are bit-identical across
shard counts), with TWO pinned block sets per shard: the forward blocks
push hub scores along ``u -> v`` (the authority gather) and the reverse
blocks push authority scores along ``v -> u`` (the hub gather).  Each
round is two half-steps; after each half-step the driver reduces
per-partition sum-of-squares partials in p order and broadcasts the
global L2 norm into the shards' ``scale`` call:

    auth'(v) = sum_{u->v} hub(u);   auth = auth' / ||auth'||_2
    hub'(u)  = sum_{u->v} auth(v);  hub  = hub'  / ||hub'||_2

Init: hub = 1 everywhere (the classic power-iteration start).  Error =
L1 delta of both vectors per round; converged when <= threshold.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .pagerank_csr import (
    _bounds,
    _shard_parts,
    default_num_actors,
    distribute_edges,
)


@dataclass
class HitsResult:
    auth: np.ndarray | None
    hub: np.ndarray | None
    rounds: int
    errs: list[float]
    converged: bool


def _make_hits_actor_cls():
    import ray

    @ray.remote
    class HitsShard:
        def __init__(self, shard_id: int, bounds: np.ndarray,
                     shard_parts: np.ndarray):
            self.s = shard_id
            self.bounds = bounds
            self.sp = shard_parts
            self.P = len(bounds) - 1
            self.A = len(shard_parts) - 1
            self.p_lo = int(shard_parts[shard_id])
            self.p_hi = int(shard_parts[shard_id + 1])
            self.lo = int(bounds[self.p_lo])
            self.hi = int(bounds[self.p_hi])
            self.size = self.hi - self.lo
            self.hub = np.ones(self.size, dtype=np.float64)
            self.auth = np.zeros(self.size, dtype=np.float64)
            self._raw = np.zeros(self.size, dtype=np.float64)
            self._edge_src: list[np.ndarray] = []
            self._edge_dst: list[np.ndarray] = []
            self._seen_keys: set[str] = set()

        def add_edges(self, t: pa.Table, key: str | None = None) -> int:
            if key is not None:
                if key in self._seen_keys:
                    return 0
                self._seen_keys.add(key)
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            self._edge_src.append(src)
            self._edge_dst.append(dst)
            return len(src)

        def _build_blocks(self, src: np.ndarray, dst: np.ndarray):
            """(p, q)-keyed sparse blocks for pushing values from local
            ``src`` to global ``dst`` — identical layout to
            ``pagerank_csr.CSRShard.seal``."""
            src_local = src - self.lo
            sp = np.searchsorted(self.bounds, src, side="right") - 1
            tp = np.searchsorted(self.bounds, dst, side="right") - 1
            key = sp * self.P + tp
            order = np.lexsort((dst, key))
            src_local, dst, key = src_local[order], dst[order], key[order]
            blocks = {}
            starts = (np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
                      if len(key) else np.array([], dtype=np.int64))
            ends = np.r_[starts[1:], len(key)] if len(starts) else starts
            for s, e in zip(starts, ends):
                p, q = divmod(int(key[s]), self.P)
                blocks[(p, q)] = (
                    src_local[s:e].astype(np.int32),
                    (dst[s:e] - int(self.bounds[q])).astype(np.int32),
                )
            return blocks

        def seal_forward(self) -> int:
            """Forward blocks only; the raw edge arrays stay buffered
            for the reverse routing pass."""
            if self.size >= (1 << 31):
                raise NotImplementedError(
                    "shard slices must stay < 2^31 vertices for int32 "
                    "locals; raise num_partitions/num_actors"
                )
            src = (np.concatenate(self._edge_src)
                   if self._edge_src else np.array([], dtype=np.int64))
            dst = (np.concatenate(self._edge_dst)
                   if self._edge_dst else np.array([], dtype=np.int64))
            self._edge_src = self._edge_dst = []
            self._seen_keys = set()
            self.fwd = self._build_blocks(src, dst)
            # stage reversed edges for the reverse routing exchange:
            # group by the shard that owns DST (the reverse source)
            owner = np.searchsorted(self.bounds[self.sp[:-1]], dst,
                                    side="right") - 1
            order = np.argsort(owner, kind="stable")
            self._rev_src = dst[order]      # reverse edges: dst -> src
            self._rev_dst = src[order]
            self._rev_owner = owner[order]
            return int(len(src))

        def rev_slice(self, a: int):
            """The reversed edges owned by shard ``a`` (src = original
            dst) — pulled once by each shard during the reverse build."""
            lo = int(np.searchsorted(self._rev_owner, a))
            hi = int(np.searchsorted(self._rev_owner, a, side="right"))
            return self._rev_src[lo:hi], self._rev_dst[lo:hi]

        def seal_reverse(self, *slices) -> int:
            """Build reverse blocks from every shard's staged slices.
            The staged arrays are NOT freed here — peers may still be
            pulling their slices; the driver calls ``drop_staged`` once
            every shard has sealed."""
            src = (np.concatenate([s[0] for s in slices])
                   if slices else np.array([], dtype=np.int64))
            dst = (np.concatenate([s[1] for s in slices])
                   if slices else np.array([], dtype=np.int64))
            self.rev = self._build_blocks(src, dst)
            return int(len(src))

        def drop_staged(self) -> None:
            del self._rev_src, self._rev_dst, self._rev_owner

        def _compute(self, blocks, values: np.ndarray):
            metas, idx_out, val_out = [], [], []
            for (p, q), (src_l, dst_l) in sorted(blocks.items()):
                vals = values[src_l]
                b = np.flatnonzero(np.r_[True, dst_l[1:] != dst_l[:-1]])
                tgt = int(np.searchsorted(self.sp, q, side="right") - 1)
                metas.append((tgt, p, q, len(b)))
                idx_out.append(dst_l[b])
                val_out.append(np.add.reduceat(vals, b))
            meta = np.array(metas, dtype=np.int64).reshape(-1, 4)
            idx = (np.concatenate(idx_out) if idx_out
                   else np.array([], dtype=np.int32))
            vals = (np.concatenate(val_out) if val_out
                    else np.array([], dtype=np.float64))
            return meta, idx, vals

        def auth_compute(self):
            return self._compute(self.fwd, self.hub)

        def hub_compute(self):
            return self._compute(self.rev, self.auth)

        # ---- SALSA (Lempel & Moran 2000) ----
        def salsa_prepare(self, n: int) -> None:
            """Degree vectors for the stochastic half-steps, computed
            locally from the sealed blocks (forward src multiplicity =
            out-degree; reverse src multiplicity = in-degree), and the
            uniform 1/N hub start of the SALSA random walk."""
            od = np.zeros(self.size, dtype=np.float64)
            for (_, _), (src_l, _) in self.fwd.items():
                od += np.bincount(src_l, minlength=self.size)
            ind = np.zeros(self.size, dtype=np.float64)
            for (_, _), (src_l, _) in self.rev.items():
                ind += np.bincount(src_l, minlength=self.size)
            self._od, self._ind = od, ind
            self.hub = np.full(self.size, 1.0 / n, dtype=np.float64)
            self.auth = np.zeros(self.size, dtype=np.float64)

        def salsa_auth_compute(self):
            """Authority gather of the DEGREE-NORMALIZED hub mass:
            per-edge value hub(u) / outdeg(u) — same division the SQL
            oracle performs (ulp-level association differences are
            absorbed by the callers' nano rounding)."""
            vals = np.divide(self.hub, self._od,
                             out=np.zeros_like(self.hub),
                             where=self._od > 0)
            return self._compute(self.fwd, vals)

        def salsa_hub_compute(self):
            vals = np.divide(self.auth, self._ind,
                             out=np.zeros_like(self.auth),
                             where=self._ind > 0)
            return self._compute(self.rev, vals)

        def _accumulate(self, shard_msgs) -> np.ndarray:
            """Accumulate inbound partials p-ordered into the raw
            (unnormalized) vector."""
            per_q: dict[int, list] = {}
            for meta, idx_all, vals_all in shard_msgs:
                if not len(meta):
                    continue
                ends = np.cumsum(meta[:, 3])
                starts = ends - meta[:, 3]
                for i in np.flatnonzero(meta[:, 0] == self.s):
                    p, q = int(meta[i, 1]), int(meta[i, 2])
                    per_q.setdefault(q, []).append(
                        (p, idx_all[starts[i]:ends[i]],
                         vals_all[starts[i]:ends[i]])
                    )
            raw = np.zeros(self.size, dtype=np.float64)
            for q, entries in per_q.items():
                off = int(self.bounds[q]) - self.lo
                for _, idx, vals in sorted(entries, key=lambda e: e[0]):
                    raw[off + idx] += vals
            self._raw = raw
            return raw

        def apply(self, *shard_msgs):
            """HITS accumulate; returns per-owned-partition sums of
            squares (p, ss) for the driver's L2 reduce."""
            raw = self._accumulate(shard_msgs)
            out = []
            for p in range(self.p_lo, self.p_hi):
                s = int(self.bounds[p]) - self.lo
                e = int(self.bounds[p + 1]) - self.lo
                out.append((p, float(np.sum(raw[s:e] * raw[s:e]))))
            return out

        def apply_l1(self, *shard_msgs):
            """SALSA accumulate; returns per-owned-partition plain sums
            (p, s) for the driver's L1 reduce (the half-step vectors
            are probability distributions)."""
            raw = self._accumulate(shard_msgs)
            out = []
            for p in range(self.p_lo, self.p_hi):
                s = int(self.bounds[p]) - self.lo
                e = int(self.bounds[p + 1]) - self.lo
                out.append((p, float(np.sum(raw[s:e]))))
            return out

        def scale(self, norm: float, which: str):
            """Divide the raw vector by the global norm, store it as
            auth/hub, and return per-partition L1 deltas (p, err)."""
            new = self._raw / norm if norm > 0 else self._raw.copy()
            old = self.auth if which == "auth" else self.hub
            out = []
            for p in range(self.p_lo, self.p_hi):
                s = int(self.bounds[p]) - self.lo
                e = int(self.bounds[p + 1]) - self.lo
                out.append((p, float(np.sum(np.abs(new[s:e] - old[s:e])))))
            if which == "auth":
                self.auth = new
            else:
                self.hub = new
            return out

        def get_state(self):
            return self.lo, self.auth, self.hub

        def write_scores(self, out_dir: str) -> list[dict]:
            """One Parquet file per owned logical partition (K1
            per-partition writer shape) — (v, auth, hub)."""
            import os

            import pyarrow.parquet as pq

            os.makedirs(out_dir, exist_ok=True)
            lineage = []
            for p in range(self.p_lo, self.p_hi):
                lo, hi = int(self.bounds[p]), int(self.bounds[p + 1])
                name = f"part={p:03d}.parquet"
                pq.write_table(
                    pa.table({
                        "v": pa.array(np.arange(lo, hi, dtype=np.int64),
                                      pa.int64()),
                        "auth": pa.array(self.auth[lo - self.lo:hi - self.lo],
                                         pa.float64()),
                        "hub": pa.array(self.hub[lo - self.lo:hi - self.lo],
                                        pa.float64()),
                    }),
                    os.path.join(out_dir, name),
                )
                lineage.append({"part": p, "file": name, "rows": hi - lo})
            return lineage

    return HitsShard


class HitsCSR:
    """Pinned HITS shard pool over a directed deduplicated edge
    Dataset.  The reverse block build is a one-time shard-to-shard
    exchange of the staged reversed edges (each shard pulls its slice
    from every peer) — no extra Ray Data shuffle."""

    def __init__(self, edges_ds, num_vertices: int, num_partitions: int = 32,
                 num_actors: int | None = None,
                 num_cpus_per_actor: float = 1.0):
        import ray

        self.n = num_vertices
        self.P = num_partitions
        self.A = num_actors or default_num_actors(num_partitions)
        self.bounds = _bounds(num_vertices, num_partitions)
        self.sp = _shard_parts(num_partitions, self.A)
        shard_lo = self.bounds[self.sp[:-1]]
        cls = _make_hits_actor_cls()
        self.actors = [
            cls.options(num_cpus=num_cpus_per_actor).remote(
                a, self.bounds, self.sp)
            for a in range(self.A)
        ]
        distribute_edges(edges_ds, self.actors, shard_lo)
        self.num_edges = sum(
            ray.get([a.seal_forward.remote() for a in self.actors]))
        # reverse exchange: shard b collects slice b from every shard
        ray.get([
            self.actors[b].seal_reverse.remote(
                *[a.rev_slice.remote(b) for a in self.actors])
            for b in range(self.A)
        ])
        ray.get([a.drop_staged.remote() for a in self.actors])

    def _half_step(self, compute_name: str, which: str,
                   apply_name: str = "apply") -> float:
        import ray

        outs = [getattr(a, compute_name).remote() for a in self.actors]
        ss = ray.get([getattr(self.actors[b], apply_name).remote(*outs)
                      for b in range(self.A)])
        flat = sorted((t for s in ss for t in s), key=lambda t: t[0])
        total = float(np.sum([t[1] for t in flat]))
        norm = float(np.sqrt(total)) if apply_name == "apply" else total
        errs = ray.get([a.scale.remote(norm, which) for a in self.actors])
        flat = sorted((t for s in errs for t in s), key=lambda t: t[0])
        return float(np.sum([t[1] for t in flat]))

    def run(self, threshold: float = 1e-9, max_rounds: int = 100,
            collect_state: bool = True) -> HitsResult:
        errs: list[float] = []
        rounds = 0
        converged = False
        while rounds < max_rounds and not converged:
            rounds += 1
            e_auth = self._half_step("auth_compute", "auth")
            e_hub = self._half_step("hub_compute", "hub")
            errs.append(e_auth + e_hub)
            converged = errs[-1] <= threshold
        auth = hub = None
        if collect_state:
            import ray

            auth = np.empty(self.n, dtype=np.float64)
            hub = np.empty(self.n, dtype=np.float64)
            for lo, a_sl, h_sl in ray.get(
                [a.get_state.remote() for a in self.actors]
            ):
                auth[lo:lo + len(a_sl)] = a_sl
                hub[lo:lo + len(h_sl)] = h_sl
        return HitsResult(auth=auth, hub=hub, rounds=rounds, errs=errs,
                          converged=converged)

    def run_salsa(self, threshold: float = 1e-9, max_rounds: int = 100,
                  collect_state: bool = True) -> HitsResult:
        """SALSA (Lempel & Moran 2000, "The stochastic approach for
        link-structure analysis" — public literature; no reference
        counterpart): HITS with DEGREE-NORMALIZED sends and L1
        normalization — the half-step vectors are the distributions of
        the alternating random walk on the bipartite hub/authority
        graph:

            auth'(v) = sum_{u->v} hub(u) / outdeg(u);  auth = auth'/|auth'|_1
            hub'(u)  = sum_{u->v} auth(v) / indeg(v);  hub  = hub'/|hub'|_1

        Init hub = 1/N.  Same engine, blocks and message shapes as
        HITS; only the per-edge values and the norm kind change.  The
        fixpoint authority score within a connected authority-graph
        component is proportional to in-degree (the classic SALSA
        closed form) — pytest checks that limit."""
        import ray

        ray.get([a.salsa_prepare.remote(self.n) for a in self.actors])
        errs: list[float] = []
        rounds = 0
        converged = False
        while rounds < max_rounds and not converged:
            rounds += 1
            e_auth = self._half_step("salsa_auth_compute", "auth",
                                     apply_name="apply_l1")
            e_hub = self._half_step("salsa_hub_compute", "hub",
                                    apply_name="apply_l1")
            errs.append(e_auth + e_hub)
            converged = errs[-1] <= threshold
        auth = hub = None
        if collect_state:
            auth = np.empty(self.n, dtype=np.float64)
            hub = np.empty(self.n, dtype=np.float64)
            for lo, a_sl, h_sl in ray.get(
                [a.get_state.remote() for a in self.actors]
            ):
                auth[lo:lo + len(a_sl)] = a_sl
                hub[lo:lo + len(h_sl)] = h_sl
        return HitsResult(auth=auth, hub=hub, rounds=rounds, errs=errs,
                          converged=converged)

    def write_scores(self, out_dir: str) -> list[dict]:
        """Distributed final write: every shard writes its owned
        partitions' files; the driver only merges lineage."""
        import ray

        parts = ray.get([a.write_scores.remote(out_dir)
                         for a in self.actors])
        return sorted((x for part in parts for x in part),
                      key=lambda x: x["part"])

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
