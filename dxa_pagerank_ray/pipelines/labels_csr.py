"""CSR shard-actor engine for label algorithms (CC, label prop).

Same execution shape as ``pipelines.pagerank_csr.PageRankCSR`` (the
Ray-native analogue of the reference's resident-partition superstep
worker, ``RunLumpPrRoundTask.java:57-65``): A shard actors (default:
cluster CPUs) each pin a contiguous range of the P fixed logical
partitions, with per-target-shard edge blocks built once; each
superstep exchanges A x A sparse partials actor-to-actor through the
object store instead of re-shuffling the edge table every round.
Label reductions (min for CC, integer mode counts for LP) are
associative and commutative, so results are identical at any shard
count without the ordered-reduction machinery PageRank needs;
checkpoint lineage files stay keyed by logical partition, so a run
checkpointed at A=32 resumes at A=8.

Message kinds:
- connected components: per-dst **min** of neighbor labels (hash-min,
  SURVEY.md §2.11), converged when no label changes — matches the
  broadcast engine / numpy oracle exactly.
- label propagation: per-dst **mode** of neighbor labels with lowest-
  label tie-break; partials are (dst, label, count) triples combined
  per target shard — deterministic, exact match vs the oracle.

Both expect a *symmetrized* edge Dataset (callers pass
``superstep.undirect(edges)`` for directed input, mirroring the
broadcast engine).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .pagerank_csr import (
    _bounds,
    _shard_parts,
    default_num_actors,
    distribute_edges,
)


# weighted-SSSP "unreached" sentinel: larger than any real path cost
# (sum of int64 weights along <= V-1 hops stays far below), stable
# under + w in the relaxation (min(old, sentinel + w) = old)
SSSP_SENTINEL = 1 << 62


def _hll_alpha(m: int) -> float:
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m))


def _ball_est_dense(regs: np.ndarray) -> np.ndarray:
    """Per-row HLL estimate of a dense uint8 register matrix [n, R]
    (Flajolet et al. 2007 with linear-counting small-range
    correction) — the shard-local form used by harmonic-centrality
    accumulation."""
    m = regs.shape[1]
    s = np.exp2(-regs.astype(np.float64)).sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    est = _hll_alpha(m) * m * m / s
    small = (est <= 2.5 * m) & (zeros > 0)
    est[small] = m * np.log(m / zeros[small])
    return est


def hll_estimates(regs_table: pa.Table, num_vertices: int,
                  num_registers: int = 64) -> np.ndarray:
    """Per-vertex ball-size estimates from ``hyperball()``'s long-form
    (v, bucket, rho) table — the standard HyperLogLog estimator
    (Flajolet et al. 2007) with the small-range linear-counting
    correction.  Floats live HERE, outside the hash-compared register
    surface."""
    m = num_registers
    v = regs_table["v"].to_numpy(zero_copy_only=False)
    r = regs_table["rho"].to_numpy(zero_copy_only=False)
    # harmonic sum starts from all-zero registers (2^-0 each) ...
    s = np.full(num_vertices, float(m))
    np.add.at(s, v, np.exp2(-r.astype(np.float64)) - 1.0)
    # ... and the zero-register count decrements per nonzero row
    zeros = np.full(num_vertices, m, dtype=np.int64)
    np.add.at(zeros, v, -1)
    est = _hll_alpha(m) * m * m / s
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        est[small] = m * np.log(m / zeros[small])
    return est


def int_sum_exact(arr: np.ndarray) -> int:
    """Exact Python-int sum of a non-negative int64 array via a
    hi/lo split: each half's np.sum stays below 2^63 while
    len(arr) < 2^33 and elements < 2^60, so no wrap — unlike a plain
    ``np.sum`` (which wraps silently) and much faster than
    ``dtype=object``.  Used where shard partials must equal a
    sequential full-array sum bit-for-bit at ANY scale."""
    if len(arr) == 0:
        return 0
    assert len(arr) < (1 << 33)
    lo = int(np.sum(arr & np.int64((1 << 30) - 1)))
    hi = int(np.sum(arr >> np.int64(30)))
    return (hi << 30) + lo


def avg_distance_nano(nf: list[int]) -> int:
    """Mean finite-pair distance from a HyperANF curve: sum_d d *
    (N(d) - N(d-1)) over the reachable-pair mass N(max) - N(0)
    (N(0) counts the self-pairs), nano-quantized — pure Python-int
    arithmetic shared between query and oracle.  0 when no vertex
    reaches another (den == 0)."""
    num = sum(d * (nf[d] - nf[d - 1]) for d in range(1, len(nf)))
    den = nf[-1] - nf[0]
    return num * 1_000_000_000 // den if den > 0 else 0


def effective_diameter_nano(nf: list[int]) -> int:
    """90% effective diameter from a HyperANF neighborhood-function
    curve (integer-micro N(d) values, ``neighborhood_function``):
    the smallest d where N(d) reaches 90% of N(max), linearly
    interpolated inside the crossing step and nano-quantized — pure
    Python-int arithmetic, so engine and sequential oracle agree
    bit-for-bit.  den > 0 is guaranteed: d is the FIRST crossing, so
    10*N(d-1) < 9*N(max) <= 10*N(d)."""
    target = 9 * nf[-1]  # compare 10 * nf[d] >= 9 * nf[-1]
    d = next(i for i, v in enumerate(nf) if 10 * v >= target)
    if d == 0:
        return 0
    num = target - 10 * nf[d - 1]
    den = 10 * (nf[d] - nf[d - 1])
    return (d - 1) * 1_000_000_000 + num * 1_000_000_000 // den


def lin_nano(reach: np.ndarray, sumdist: np.ndarray) -> np.ndarray:
    """Lin's index r(v)^2 / sd(v) (Boldi & Vigna 2014 §3.2: reachable
    count squared over sum of finite distances — closeness that
    rewards, not punishes, large reachable sets), nano-quantized
    int64.  Vertices reaching nothing (sd == 0) get 1.0 by the
    paper's convention.  Row-local float64 in one fixed expression —
    shared verbatim by ``LabelCSR.lin_centrality`` callers and the
    sequential oracle, so the two quantize bit-identically."""
    lin = np.ones_like(sumdist)
    m = sumdist > 0
    lin[m] = (reach[m] * reach[m]) / sumdist[m]
    return (lin * 1e9).astype(np.int64)


def _unique_pairs(s: np.ndarray, d: np.ndarray,
                  n: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (s, d) rows, both int64 in [0, n).  Packed-key unique
    while ``s * n + d`` fits int64 (n < ~3e9), lexsort boundary sweep
    beyond that."""
    if len(s) == 0:
        e = np.array([], dtype=np.int64)
        return e, e.copy()
    if n <= (1 << 31):
        key = np.unique(s * np.int64(n) + d)
        return key // n, key % n
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
    return s[keep], d[keep]


def _make_label_actor_cls():
    import ray

    @ray.remote
    class LabelShard:
        def __init__(self, shard_id: int, bounds: np.ndarray,
                     shard_parts: np.ndarray, weighted: bool = False):
            self.weighted = weighted
            self._edge_w: list[np.ndarray] = []
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
            self.shard_lo = bounds[shard_parts[:-1]]  # vertex lo per shard
            self.labels = np.arange(self.lo, self.hi, dtype=np.int64)
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
            if self.weighted:
                w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
                if len(w) and w.min() <= 0:
                    raise ValueError("edge weights must be positive "
                                     "integers")
                self._edge_w.append(w)
            return len(src)

        def seal(self) -> int:
            if self.size >= (1 << 31):
                raise NotImplementedError(
                    "shard slices must stay < 2^31 vertices for int32 "
                    "locals; raise num_partitions/num_actors"
                )
            src = (np.concatenate(self._edge_src)
                   if self._edge_src else np.array([], dtype=np.int64))
            dst = (np.concatenate(self._edge_dst)
                   if self._edge_dst else np.array([], dtype=np.int64))
            w = (np.concatenate(self._edge_w)
                 if self._edge_w else np.array([], dtype=np.int64))
            self._edge_src = self._edge_dst = self._edge_w = []
            self._seen_keys = set()
            src_local = src - self.lo
            ts = np.searchsorted(self.shard_lo, dst, side="right") - 1
            order = np.lexsort((dst, ts))
            src_local, dst, ts = src_local[order], dst[order], ts[order]
            starts = np.searchsorted(ts, np.arange(self.A))
            ends = np.searchsorted(ts, np.arange(self.A), side="right")
            # int32 locals: shard slices are < 2^31 rows (checked above)
            self.blocks = [
                (src_local[starts[b]:ends[b]].astype(np.int32),
                 (dst[starts[b]:ends[b]] - int(self.shard_lo[b])).astype(np.int32))
                for b in range(self.A)
            ]
            if self.weighted:
                w = w[order]
                self.wblocks = [w[starts[b]:ends[b]]
                                for b in range(self.A)]
            return int(len(dst))

        def reset_labels(self) -> None:
            self.labels = np.arange(self.lo, self.hi, dtype=np.int64)

        def reset_edges(self) -> None:
            """Drop every sealed/staged edge structure so a NEW edge
            set can be routed onto the same pool (``reload_edges``) —
            actor spawn, vertex bounds and label state survive."""
            self._edge_src, self._edge_dst, self._edge_w = [], [], []
            self._seen_keys = set()
            for attr in ("blocks", "wblocks", "rev_blocks",
                         "_rev_src", "_rev_dst", "_rev_owner"):
                if hasattr(self, attr):
                    delattr(self, attr)

        def seed_distances(self, seeds: np.ndarray, sentinel: int) -> None:
            """BFS init: 0 for seed vertices owned by this shard,
            ``sentinel`` (= num_vertices, larger than any real hop
            distance) everywhere else."""
            self.labels = np.full(self.size, sentinel, dtype=np.int64)
            mine = seeds[(seeds >= self.lo) & (seeds < self.hi)]
            self.labels[mine - self.lo] = 0

        # ---- reverse-direction blocks (staged exchange, the
        # ``hits_csr.HitsShard`` seal_forward/rev_slice/seal_reverse
        # pattern) — built ON DEMAND so one routed engine serves both
        # gather directions (bow-tie runs forward AND backward BFS on
        # one pool instead of constructing/routing two engines) ----
        def stage_reverse(self) -> None:
            """Reconstruct this shard's raw edges from the sealed
            blocks (src = local + lo, dst = local + target shard lo),
            reverse them, and group by the shard owning the new src
            (the original dst) for the pull exchange."""
            srcs, dsts = [], []
            for b in range(self.A):
                src_l, dst_l = self.blocks[b]
                srcs.append(src_l.astype(np.int64) + self.lo)
                dsts.append(dst_l.astype(np.int64) + int(self.shard_lo[b]))
            src = (np.concatenate(srcs)
                   if srcs else np.array([], dtype=np.int64))
            dst = (np.concatenate(dsts)
                   if dsts else np.array([], dtype=np.int64))
            owner = np.searchsorted(self.shard_lo, dst, side="right") - 1
            order = np.argsort(owner, kind="stable")
            self._rev_src = dst[order]  # reversed: dst -> src
            self._rev_dst = src[order]
            self._rev_owner = owner[order]

        def rev_slice(self, a: int):
            """The reversed edges owned by shard ``a``."""
            lo = int(np.searchsorted(self._rev_owner, a))
            hi = int(np.searchsorted(self._rev_owner, a, side="right"))
            return self._rev_src[lo:hi], self._rev_dst[lo:hi]

        def seal_reverse(self, *slices) -> int:
            src = (np.concatenate([s for s, _ in slices])
                   if slices else np.array([], dtype=np.int64))
            dst = (np.concatenate([d for _, d in slices])
                   if slices else np.array([], dtype=np.int64))
            src_local = src - self.lo
            ts = np.searchsorted(self.shard_lo, dst, side="right") - 1
            order = np.lexsort((dst, ts))
            src_local, dst, ts = src_local[order], dst[order], ts[order]
            starts = np.searchsorted(ts, np.arange(self.A))
            ends = np.searchsorted(ts, np.arange(self.A), side="right")
            self.rev_blocks = [
                (src_local[starts[b]:ends[b]].astype(np.int32),
                 (dst[starts[b]:ends[b]]
                  - int(self.shard_lo[b])).astype(np.int32))
                for b in range(self.A)
            ]
            return int(len(dst))

        def drop_staged(self) -> None:
            del self._rev_src, self._rev_dst, self._rev_owner

        # ---- connected components (hash-min) ----
        def _gather_min(self, blocks):
            """ONE packed (counts, idx, vals) buffer for all target
            shards — counts[b] rows belong to target b, concatenated in
            target order.  A object-store puts per round instead of A²
            (same packing rationale as ``pagerank_csr`` ``compute``)."""
            idx_out, val_out = [], []
            counts = np.zeros(self.A, dtype=np.int64)
            for b in range(self.A):
                src_l, dst_l = blocks[b]
                if len(dst_l) == 0:
                    continue
                vals = self.labels[src_l]
                bd = np.flatnonzero(np.r_[True, dst_l[1:] != dst_l[:-1]])
                counts[b] = len(bd)
                idx_out.append(dst_l[bd])
                val_out.append(np.minimum.reduceat(vals, bd))
            return (counts,
                    np.concatenate(idx_out) if idx_out
                    else np.array([], dtype=np.int64),
                    np.concatenate(val_out) if val_out
                    else np.array([], dtype=np.int64))

        def cc_compute(self):
            return self._gather_min(self.blocks)

        def cc_compute_rev(self):
            """Min-gather along the REVERSED edges (requires
            ``seal_reverse``) — backward BFS on the same pool."""
            return self._gather_min(self.rev_blocks)

        def _my_slices(self, packed_list, col0: int = 1):
            """Slice this shard's segment out of each packed buffer."""
            segs = []
            for packed in packed_list:
                counts = packed[0]
                end = int(counts[: self.s + 1].sum())
                start = end - int(counts[self.s])
                segs.append(tuple(arr[start:end] for arr in packed[col0:]))
            return segs

        def cc_apply(self, *packed) -> int:
            partials = self._my_slices(packed)
            idx = np.concatenate([p[0] for p in partials]) if partials else \
                np.array([], dtype=np.int64)
            if len(idx) == 0:
                return 0
            vals = np.concatenate([p[1] for p in partials])
            # sort-merge the (at most A) sorted partials instead of
            # ufunc.at (which is an order of magnitude slower)
            order = np.argsort(idx, kind="stable")
            idx, vals = idx[order], vals[order]
            b = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
            new = self.labels.copy()
            tgt = idx[b]
            new[tgt] = np.minimum(new[tgt], np.minimum.reduceat(vals, b))
            changed = int(np.sum(new != self.labels))
            self.labels = new
            return changed

        def sssp_compute(self):
            """Min-plus gather for weighted shortest paths: per-dst min
            over inbound edges of label(src) + w (Bellman-Ford
            relaxation, map-side combined).  Same packed wire shape as
            ``cc_compute``; apply is plain min-merge (``cc_apply``)."""
            idx_out, val_out = [], []
            counts = np.zeros(self.A, dtype=np.int64)
            for b in range(self.A):
                src_l, dst_l = self.blocks[b]
                if len(dst_l) == 0:
                    continue
                vals = self.labels[src_l] + self.wblocks[b]
                bd = np.flatnonzero(np.r_[True, dst_l[1:] != dst_l[:-1]])
                counts[b] = len(bd)
                idx_out.append(dst_l[bd])
                val_out.append(np.minimum.reduceat(vals, bd))
            return (counts,
                    np.concatenate(idx_out) if idx_out
                    else np.array([], dtype=np.int64),
                    np.concatenate(val_out) if val_out
                    else np.array([], dtype=np.int64))

        def bfs_apply(self, *packed) -> int:
            """Relax step for multi-source BFS: new(v) = min(old(v),
            1 + min over in-neighbors u of old(u)).  Reuses
            ``cc_compute`` on the wire (per-dst min of source labels);
            the sentinel is stable under +1 because the update is
            clipped by the old value (min(sentinel, sentinel+1) =
            sentinel).  After k supersteps label(v) is the true hop
            distance iff dist(v) <= k, else the sentinel."""
            partials = self._my_slices(packed)
            idx = np.concatenate([p[0] for p in partials]) if partials else \
                np.array([], dtype=np.int64)
            if len(idx) == 0:
                return 0
            vals = np.concatenate([p[1] for p in partials])
            order = np.argsort(idx, kind="stable")
            idx, vals = idx[order], vals[order]
            b = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
            new = self.labels.copy()
            tgt = idx[b]
            new[tgt] = np.minimum(new[tgt],
                                  np.minimum.reduceat(vals, b) + 1)
            changed = int(np.sum(new != self.labels))
            self.labels = new
            return changed

        # ---- label propagation (mode, min tie-break) ----
        def lp_compute(self):
            """Packed like ``cc_compute``: (counts, dst, label, cnt)."""
            d_out, l_out, c_out = [], [], []
            counts = np.zeros(self.A, dtype=np.int64)
            for b in range(self.A):
                src_l, dst_l = self.blocks[b]
                if len(dst_l) == 0:
                    continue
                lab = self.labels[src_l]
                order = np.lexsort((lab, dst_l))
                d, l = dst_l[order], lab[order]
                bd = np.flatnonzero(
                    np.r_[True, (d[1:] != d[:-1]) | (l[1:] != l[:-1])]
                )
                cnt = np.diff(np.r_[bd, len(d)])
                counts[b] = len(bd)
                d_out.append(d[bd])
                l_out.append(l[bd])
                c_out.append(cnt)
            empty = np.array([], dtype=np.int64)
            return (counts,
                    np.concatenate(d_out) if d_out else empty,
                    np.concatenate(l_out) if l_out else empty,
                    np.concatenate(c_out) if c_out else empty)

        def lp_apply(self, *packed) -> int:
            partials = self._my_slices(packed)
            ds = np.concatenate([p[0] for p in partials]) if partials else \
                np.array([], dtype=np.int64)
            if len(ds) == 0:
                return 0
            ls = np.concatenate([p[1] for p in partials])
            cs = np.concatenate([p[2] for p in partials])
            # combine counts across source shards
            order = np.lexsort((ls, ds))
            ds, ls, cs = ds[order], ls[order], cs[order]
            b = np.flatnonzero(np.r_[True, (ds[1:] != ds[:-1]) | (ls[1:] != ls[:-1])])
            ds, ls = ds[b], ls[b]
            cs = np.add.reduceat(cs, b)
            # mode with lowest-label tie-break: sort (dst, -cnt, label),
            # first row per dst wins (same rule as superstep.mode_gather)
            order = np.lexsort((ls, -cs, ds))
            ds, ls = ds[order], ls[order]
            first = np.flatnonzero(np.r_[True, ds[1:] != ds[:-1]])
            new = self.labels.copy()
            new[ds[first]] = ls[first]
            changed = int(np.sum(new != self.labels))
            self.labels = new
            return changed

        # ---- HyperBall neighborhood sketches (Boldi & Vigna 2011) ----
        def hll_seed(self, R: int, seed: int) -> None:
            """Per-vertex HyperLogLog registers [size, R] seeded with
            the vertex's OWN insert: bucket = hash % R, rho = trailing
            zeros of (hash // R) + 1 (trailing zeros give the same
            geometric distribution as the classical leading-zero rho
            for a uniform hash, and are SQL-exact via gcd with 2^w +
            log2 of an exact power of two — the oracle contract)."""
            from ..stages.sampling import sample_hash

            ids = np.arange(self.lo, self.hi, dtype=np.int64)
            h = sample_hash(ids, seed)
            bucket = (h % np.uint64(R)).astype(np.int64)
            x = h // np.uint64(R)
            low = x & (~x + np.uint64(1))
            maxrho = 64 - int(np.log2(R)) + 1
            rho = np.where(
                x == 0, maxrho,
                np.log2(np.maximum(low, 1).astype(np.float64)).astype(
                    np.int64) + 1).astype(np.uint8)
            self.regs = np.zeros((self.size, R), dtype=np.uint8)
            if self.size:
                self.regs[np.arange(self.size), bucket] = rho

        def hll_compute(self):
            """Packed (counts, idx, mats): per-dst max-merged register
            rows, one buffer for all target shards (the label-engine
            wire shape with a [groups, R] uint8 matrix payload)."""
            R = self.regs.shape[1]
            idx_out, mat_out = [], []
            counts = np.zeros(self.A, dtype=np.int64)
            for b in range(self.A):
                src_l, dst_l = self.blocks[b]
                if len(dst_l) == 0:
                    continue
                bd = np.flatnonzero(np.r_[True, dst_l[1:] != dst_l[:-1]])
                counts[b] = len(bd)
                idx_out.append(dst_l[bd])
                mat_out.append(
                    np.maximum.reduceat(self.regs[src_l], bd, axis=0))
            return (counts,
                    np.concatenate(idx_out) if idx_out
                    else np.array([], dtype=np.int32),
                    np.concatenate(mat_out, axis=0) if mat_out
                    else np.zeros((0, R), dtype=np.uint8))

        def hll_apply(self, *packed) -> int:
            """Register max-merge; returns the number of vertices whose
            register vector changed (0 = ball fixed point)."""
            partials = self._my_slices(packed)
            idx = np.concatenate([p[0] for p in partials]) if partials \
                else np.array([], dtype=np.int64)
            if len(idx) == 0:
                return 0
            mats = np.concatenate([p[1] for p in partials], axis=0)
            order = np.argsort(idx, kind="stable")
            idx, mats = idx[order], mats[order]
            b = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
            merged = np.maximum.reduceat(mats, b, axis=0)
            tgt = idx[b]
            new = self.regs.copy()
            new[tgt] = np.maximum(new[tgt], merged)
            changed = int(np.count_nonzero(np.any(new != self.regs,
                                                  axis=1)))
            self.regs = new
            return changed

        def hll_emit(self):
            """Long-form (v, bucket, rho) rows of this shard's nonzero
            registers — exactly the buckets some ball member hashed to,
            the driver-gate comparison surface."""
            vi, bi = np.nonzero(self.regs)
            return vi + self.lo, bi, self.regs[vi, bi]

        def hc_reset(self) -> None:
            """Start geometric-centrality accumulation from the current
            (seeded, depth-0) registers: harmonic (``hc``) and
            sum-of-distances (``sd``, the Lin's-index denominator)
            ride the SAME ball-delta stream."""
            self.hc = np.zeros(self.size, dtype=np.float64)
            self.sd = np.zeros(self.size, dtype=np.float64)
            self._prev_est = _ball_est_dense(self.regs)

        def hc_accumulate(self, d: int) -> None:
            """After the superstep for depth d: hc += (|B(v,d)| -
            |B(v,d-1)|) / d and sd += (|B(v,d)| - |B(v,d-1)|) * d,
            sizes HLL-estimated from the local registers — no extra
            message volume, pure shard-local math."""
            cur = _ball_est_dense(self.regs)
            delta = cur - self._prev_est
            self.hc += delta / float(d)
            self.sd += delta * float(d)
            self._prev_est = cur

        def hc_emit(self):
            return self.lo, self.hc

        def cl_emit(self):
            """(lo, sum-of-distances, final reachable-ball estimate) —
            the two Lin's-index inputs (Boldi & Vigna 2014 §3.2)."""
            return self.lo, self.sd, self._prev_est

        def nf_partial(self) -> int:
            """Shard partial of the HyperANF neighborhood function
            N(d) = sum_v |B(v, d)|: per-vertex HLL estimates quantized
            to MICRO int64 BEFORE summing (est <= V <= ~1e9 keeps
            est * 1e6 < 2^60 per element), summed EXACTLY as Python
            ints (``int_sum_exact`` — a plain np.sum would wrap int64
            once the shard's ball mass passes ~9.2e12, and wrap
            DIFFERENTLY from the sequential oracle's full-array sum).
            Integer sums are associative, so shard partials + driver
            sum equal any sequential order bit-for-bit."""
            est = _ball_est_dense(self.regs)
            return int_sum_exact((est * 1e6).astype(np.int64))

        def hll_write(self, out_dir: str) -> list[dict]:
            """Scale-path register sink: one Parquet file of long-form
            (v, bucket, rho) rows per owned logical partition (the
            driver never sees the V x R register mass)."""
            import os

            import pyarrow.parquet as pq

            os.makedirs(out_dir, exist_ok=True)
            lineage = []
            for p in range(self.p_lo, self.p_hi):
                lo, hi = int(self.bounds[p]), int(self.bounds[p + 1])
                sl = self.regs[lo - self.lo : hi - self.lo]
                vi, bi = np.nonzero(sl)
                name = f"part={p:03d}.parquet"
                pq.write_table(
                    pa.table({
                        "v": pa.array(vi + lo, pa.int64()),
                        "bucket": pa.array(bi.astype(np.int64), pa.int64()),
                        "rho": pa.array(sl[vi, bi].astype(np.int64),
                                        pa.int64()),
                    }),
                    os.path.join(out_dir, name),
                )
                lineage.append({"part": p, "file": name,
                                "rows": int(len(vi))})
            return lineage

        # ---- k-core decomposition (distributed h-index iteration) ----
        def deg_compute(self):
            """(counts, dst, cnt) — per-target incoming-edge counts
            (with a SIMPLE symmetrized edge set, indegree == degree);
            packed like ``cc_compute``."""
            i_out, c_out = [], []
            counts = np.zeros(self.A, dtype=np.int64)
            for b in range(self.A):
                _, dst_l = self.blocks[b]
                if len(dst_l) == 0:
                    continue
                bd = np.flatnonzero(np.r_[True, dst_l[1:] != dst_l[:-1]])
                counts[b] = len(bd)
                i_out.append(dst_l[bd])
                c_out.append(np.diff(np.r_[bd, len(dst_l)]).astype(np.int64))
            empty = np.array([], dtype=np.int64)
            return (counts,
                    np.concatenate(i_out) if i_out else empty,
                    np.concatenate(c_out) if c_out else empty)

        def deg_apply(self, *packed) -> int:
            """Initialize core estimates: labels[v] = degree(v) (0 for
            isolated vertices)."""
            partials = self._my_slices(packed)
            self.labels = np.zeros(self.size, dtype=np.int64)
            idx = np.concatenate([p[0] for p in partials]) if partials else \
                np.array([], dtype=np.int64)
            if len(idx) == 0:
                return 0
            cnt = np.concatenate([p[1] for p in partials])
            order = np.argsort(idx, kind="stable")
            idx, cnt = idx[order], cnt[order]
            b = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
            self.labels[idx[b]] = np.add.reduceat(cnt, b)
            return 0

        def core_compute(self):
            """Messages are (dst, current core of src, multiplicity) —
            identical wire shape to ``lp_compute``."""
            return self.lp_compute()

        def core_apply(self, *packed) -> int:
            """H-index step: new core(v) = max h such that >= h
            neighbors have core >= h, clipped at the current estimate
            (the clip is a no-op — the iteration is monotone
            non-increasing from the degree init — but keeps the update
            safe under any init)."""
            partials = self._my_slices(packed)
            ds = np.concatenate([p[0] for p in partials]) if partials else \
                np.array([], dtype=np.int64)
            if len(ds) == 0:
                return 0
            ls = np.concatenate([p[1] for p in partials])
            cs = np.concatenate([p[2] for p in partials])
            # combine multiplicities of equal (dst, value) across shards
            order = np.lexsort((ls, ds))
            ds, ls, cs = ds[order], ls[order], cs[order]
            b = np.flatnonzero(
                np.r_[True, (ds[1:] != ds[:-1]) | (ls[1:] != ls[:-1])]
            )
            ds, ls = ds[b], ls[b]
            cs = np.add.reduceat(cs, b)
            # H per dst: values descending, h = max(min(value, cum-count))
            order = np.lexsort((-ls, ds))
            ds, ls, cs = ds[order], ls[order], cs[order]
            b = np.flatnonzero(np.r_[True, ds[1:] != ds[:-1]])
            sizes = np.diff(np.r_[b, len(ds)])
            cum = np.cumsum(cs)
            within = cum - np.repeat(cum[b] - cs[b], sizes)
            h = np.maximum.reduceat(np.minimum(ls, within), b)
            tgt = ds[b]
            new = self.labels.copy()
            new[tgt] = np.minimum(new[tgt], h)
            changed = int(np.sum(new != self.labels))
            self.labels = new
            return changed

        # ---- strongly connected components: forward-backward
        # COLORING with trim (Orzan 2004 "On Distributed Verification
        # and Verified Distribution", ch. 4; trim step from
        # McLendon et al. 2005 FW-BW-Trim — public-literature
        # algorithms; no reference counterpart).  Per outer round:
        # (1) trim singleton SCCs with no active in- or out-neighbor,
        # (2) forward min-label fixpoint over ACTIVE vertices — the
        # color of v = min active vertex reaching v, (3) backward mark
        # from color roots (color(r)==r): along v->w, color(w) <=
        # color(v) within the active subgraph, so v joins root r's SCC
        # iff the MAX over marked out-neighbors' colors equals
        # color(v) (a max-gather — a min would be masked by
        # smaller-colored neighbors of other components).  Marked
        # vertices get scc_id = color = the SCC's minimum member. ----
        def scc_init(self) -> None:
            self.scc = np.full(self.size, -1, dtype=np.int64)
            self.mark = np.zeros(self.size, dtype=bool)
            self.labels = np.arange(self.lo, self.hi, dtype=np.int64)

        def _gather_reduce(self, blocks, vals_full, reducer):
            """Packed (counts, idx, vals) gather like ``_gather_min``
            but over a caller-supplied per-vertex value vector."""
            idx_out, val_out = [], []
            counts = np.zeros(self.A, dtype=np.int64)
            for b in range(self.A):
                src_l, dst_l = blocks[b]
                if len(dst_l) == 0:
                    continue
                vals = vals_full[src_l]
                bd = np.flatnonzero(np.r_[True, dst_l[1:] != dst_l[:-1]])
                counts[b] = len(bd)
                idx_out.append(dst_l[bd])
                val_out.append(reducer.reduceat(vals, bd))
            return (counts,
                    np.concatenate(idx_out) if idx_out
                    else np.array([], dtype=np.int64),
                    np.concatenate(val_out) if val_out
                    else np.array([], dtype=np.int64))

        def _merge_partials(self, packed, reducer):
            """-> (tgt, merged) from the A packed buffers, or None."""
            partials = self._my_slices(packed)
            idx = np.concatenate([p[0] for p in partials]) if partials \
                else np.array([], dtype=np.int64)
            if len(idx) == 0:
                return None
            vals = np.concatenate([p[1] for p in partials])
            order = np.argsort(idx, kind="stable")
            idx, vals = idx[order], vals[order]
            b = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
            return idx[b], reducer.reduceat(vals, b)

        def scc_color_compute(self):
            active = self.scc < 0
            n = int(self.bounds[-1])
            vals = np.where(active, self.labels, np.int64(n))
            return self._gather_reduce(self.blocks, vals, np.minimum)

        def scc_color_apply(self, *packed) -> int:
            merged = self._merge_partials(packed, np.minimum)
            if merged is None:
                return 0
            tgt, vals = merged
            active = self.scc < 0
            upd = active[tgt] & (vals < self.labels[tgt])
            self.labels[tgt[upd]] = vals[upd]
            return int(upd.sum())

        def scc_mark_seed(self) -> int:
            active = self.scc < 0
            own = np.arange(self.lo, self.hi, dtype=np.int64)
            self.mark = active & (self.labels == own)
            return int(self.mark.sum())

        def scc_mark_compute(self):
            send = (self.scc < 0) & self.mark
            vals = np.where(send, self.labels, np.int64(-1))
            return self._gather_reduce(self.rev_blocks, vals, np.maximum)

        def scc_mark_apply(self, *packed) -> int:
            merged = self._merge_partials(packed, np.maximum)
            if merged is None:
                return 0
            tgt, vals = merged
            active = self.scc < 0
            newly = (active[tgt] & ~self.mark[tgt]
                     & (vals == self.labels[tgt]))
            self.mark[tgt[newly]] = True
            return int(newly.sum())

        def scc_presence_compute_fwd(self):
            vals = (self.scc < 0).astype(np.int64)
            return self._gather_reduce(self.blocks, vals, np.maximum)

        def scc_presence_apply_in(self, *packed) -> int:
            self._has_in = np.zeros(self.size, dtype=bool)
            merged = self._merge_partials(packed, np.maximum)
            if merged is not None:
                tgt, vals = merged
                self._has_in[tgt] = vals > 0
            return 0

        def scc_presence_compute_rev(self):
            vals = (self.scc < 0).astype(np.int64)
            return self._gather_reduce(self.rev_blocks, vals, np.maximum)

        def scc_presence_apply_out(self, *packed) -> int:
            self._has_out = np.zeros(self.size, dtype=bool)
            merged = self._merge_partials(packed, np.maximum)
            if merged is not None:
                tgt, vals = merged
                self._has_out[tgt] = vals > 0
            return 0

        def scc_trim_finalize(self) -> int:
            """Active vertices with no active in-neighbor OR no active
            out-neighbor are singleton SCCs — assign own id."""
            active = self.scc < 0
            t = active & (~self._has_in | ~self._has_out)
            own = np.arange(self.lo, self.hi, dtype=np.int64)
            self.scc[t] = own[t]
            return int(t.sum())

        def scc_assign(self) -> int:
            m = self.mark
            self.scc[m] = self.labels[m]
            self.mark = np.zeros(self.size, dtype=bool)
            self.labels = np.arange(self.lo, self.hi, dtype=np.int64)
            return int(m.sum())

        def scc_remaining(self) -> int:
            return int(np.sum(self.scc < 0))

        # ---- DAG longest-path levels (max-plus over forward edges;
        # level(v) = 1 + max over in-neighbors, 0 at sources —
        # topological depth / critical-path length) ----
        def reset_labels_zero(self) -> None:
            self.labels = np.zeros(self.size, dtype=np.int64)

        def level_compute(self):
            return self._gather_reduce(self.blocks, self.labels,
                                       np.maximum)

        def level_apply(self, *packed) -> int:
            merged = self._merge_partials(packed, np.maximum)
            if merged is None:
                return 0
            tgt, vals = merged
            upd = vals + 1 > self.labels[tgt]
            self.labels[tgt[upd]] = vals[upd] + 1
            return int(upd.sum())

        def scc_finalize_labels(self) -> None:
            """Copy scc ids into ``labels`` so the engine's standard
            sinks (``write_labels``, ``label_sizes``, checkpoints)
            serve SCC results unchanged."""
            self.labels = self.scc.copy()

        def scc_restore_identity(self) -> None:
            """Undo ``scc_finalize_labels`` mid-run (labels must be
            identity at the top of every outer coloring round)."""
            self.labels = np.arange(self.lo, self.hi, dtype=np.int64)

        def scc_from_labels(self) -> None:
            """Resume init: a checkpoint written at an outer-round
            boundary holds the scc array in the labels column (marks
            are zero and labels identity at every boundary, so scc IS
            the complete algorithm state)."""
            self.scc = self.labels.copy()
            self.mark = np.zeros(self.size, dtype=bool)
            self.labels = np.arange(self.lo, self.hi, dtype=np.int64)

        def get_state(self):
            return self.lo, self.labels

        def write_ckpt(self, base: str, it: int) -> list[dict]:
            """One file per owned LOGICAL partition (resume works at any
            shard count)."""
            import os

            import pyarrow.parquet as pq

            d = os.path.join(base, f"iter={it:05d}")
            os.makedirs(d, exist_ok=True)
            lineage = []
            for p in range(self.p_lo, self.p_hi):
                lo, hi = int(self.bounds[p]), int(self.bounds[p + 1])
                name = f"part={p:03d}.parquet"
                pq.write_table(
                    pa.table(
                        {
                            "v": pa.array(np.arange(lo, hi, dtype=np.int64),
                                          pa.int64()),
                            "label": pa.array(
                                self.labels[lo - self.lo : hi - self.lo],
                                pa.int64()),
                        }
                    ),
                    os.path.join(d, name),
                )
                lineage.append({"part": p, "file": name, "rows": hi - lo,
                                "v_lo": lo, "v_hi": hi})
            return lineage

        def load_ckpt(self, base: str, it: int) -> int:
            import os

            import pyarrow.parquet as pq

            for p in range(self.p_lo, self.p_hi):
                t = pq.read_table(
                    os.path.join(base, f"iter={it:05d}", f"part={p:03d}.parquet")
                )
                lab = t["label"].to_numpy(zero_copy_only=False)
                lo, hi = int(self.bounds[p]), int(self.bounds[p + 1])
                if len(lab) != hi - lo:
                    raise ValueError(
                        f"checkpoint partition {p} has {len(lab)} rows, "
                        f"expected {hi - lo} (partition count changed?)"
                    )
                self.labels[lo - self.lo : hi - self.lo] = lab
            return self.size

        def write_labels(self, out_dir: str) -> list[dict]:
            """Final label sink: one file per owned logical partition
            (K1 per-partition writer shape, ``PRInfoTask.java:52-97``)."""
            import os

            import pyarrow.parquet as pq

            os.makedirs(out_dir, exist_ok=True)
            lineage = []
            for p in range(self.p_lo, self.p_hi):
                lo, hi = int(self.bounds[p]), int(self.bounds[p + 1])
                name = f"part={p:03d}.parquet"
                pq.write_table(
                    pa.table(
                        {
                            "v": pa.array(np.arange(lo, hi, dtype=np.int64),
                                          pa.int64()),
                            "label": pa.array(
                                self.labels[lo - self.lo : hi - self.lo],
                                pa.int64()),
                        }
                    ),
                    os.path.join(out_dir, name),
                )
                lineage.append({"part": p, "file": name, "rows": hi - lo})
            return lineage

        def label_counts(self):
            """(labels, counts) of this shard's slice — partial for the
            distributed component-size aggregate."""
            u, c = np.unique(self.labels, return_counts=True)
            return u, c

        def condensation_pairs(self, labels_full: np.ndarray):
            """DISTINCT ``(labels[src], labels[dst])`` pairs with
            different endpoints over this shard's sealed edges — the
            shard-local partial of the SCC condensation DAG.
            ``labels_full`` rides a driver ``ray.put`` broadcast (gate
            tier; the 1e12-vertex path remaps via co-grouped
            label-parquet joins instead).  Runs as an ACTOR task so
            the pool computes its own condensation with zero extra
            CPUs: the pool may hold every CPU in the cluster (e.g.
            the 4-CPU test session), where a driver-launched Ray Data
            remap job could never schedule and the caller would
            deadlock."""
            ss, dd = [], []
            for b in range(self.A):
                src_l, dst_l = self.blocks[b]
                s = labels_full[src_l.astype(np.int64) + self.lo]
                d = labels_full[dst_l.astype(np.int64)
                                + int(self.shard_lo[b])]
                keep = s != d
                ss.append(s[keep])
                dd.append(d[keep])
            s = (np.concatenate(ss)
                 if ss else np.array([], dtype=np.int64))
            d = (np.concatenate(dd)
                 if dd else np.array([], dtype=np.int64))
            return _unique_pairs(s, d, len(labels_full))

    return LabelShard


class LabelCSR:
    """Pinned label-shard pool over a symmetrized edge Dataset."""

    def __init__(self, und_edges_ds, num_vertices: int,
                 num_partitions: int = 32, num_actors: int | None = None,
                 num_cpus_per_actor: float = 1.0, weighted: bool = False):
        import ray

        self.n = num_vertices
        self.P = num_partitions
        self.A = num_actors or default_num_actors(num_partitions)
        self.bounds = _bounds(num_vertices, num_partitions)
        self.sp = _shard_parts(num_partitions, self.A)
        shard_lo = self.bounds[self.sp[:-1]]
        cls = _make_label_actor_cls()
        self.actors = [
            cls.options(num_cpus=num_cpus_per_actor).remote(
                a, self.bounds, self.sp, weighted
            )
            for a in range(self.A)
        ]
        distribute_edges(und_edges_ds, self.actors, shard_lo)
        self.num_edges = sum(ray.get([a.seal.remote() for a in self.actors]))
        self._has_reverse = False

    def reload_edges(self, edges) -> None:
        """Swap in a NEW edge set on the SAME shard pool (same vertex
        space, partition bounds and actors): drop sealed/staged edge
        state, route the new edges, re-seal forward.  The SCC ->
        condensation -> dag-levels chain runs all passes on one pool
        instead of spawning and routing a second engine for the
        condensation DAG (r4 verdict item 3).  Reverse blocks are
        dropped (rebuild on demand via ``build_reverse``).

        ``edges`` is either a Dataset (routed via ``distribute_edges``
        — needs at least one spare CPU beyond the pool: even
        ``ray.data.from_arrow`` launches a 1-CPU metadata task, which
        DEADLOCKS when the pool holds every CPU, as observed at the
        4-CPU test session) or a driver-side ``pa.Table`` with
        ``src``/``dst`` columns — sliced by owning shard and pushed
        straight into the actors with plain actor calls, safe at any
        CPU occupancy.  Use the table form for driver-sized edge sets
        (e.g. a condensation DAG), the Dataset form for big ones."""
        import ray

        shard_lo = self.bounds[self.sp[:-1]]
        ray.get([a.reset_edges.remote() for a in self.actors])
        if isinstance(edges, pa.Table):
            src = edges["src"].to_numpy(zero_copy_only=False)
            owner = np.searchsorted(shard_lo, src, side="right") - 1
            order = np.argsort(owner, kind="stable")
            t = edges.take(pa.array(order, pa.int64()))
            owner = owner[order]
            starts = np.searchsorted(owner, np.arange(self.A))
            ends = np.searchsorted(owner, np.arange(self.A),
                                   side="right")
            ray.get([
                self.actors[a].add_edges.remote(
                    t.slice(starts[a], ends[a] - starts[a]))
                for a in range(self.A) if ends[a] > starts[a]
            ])
        else:
            distribute_edges(edges, self.actors, shard_lo)
        self.num_edges = sum(ray.get([a.seal.remote()
                                      for a in self.actors]))
        self._has_reverse = False

    def condensation_edges(self, labels_ref):
        """Distinct ``(label[src], label[dst])`` pairs (endpoints
        differing) over the pool's sealed edges — the SCC condensation
        DAG, computed ON the pool via actor tasks (see
        ``LabelShard.condensation_pairs`` for why no Ray Data job may
        run here).  ``labels_ref``: a ``ray.put`` of the full labels
        vector.  The driver union is condensation-DAG-sized (distinct
        inter-component pairs, already per-shard-deduped)."""
        import ray

        parts = ray.get([a.condensation_pairs.remote(labels_ref)
                         for a in self.actors])
        s = np.concatenate([p[0] for p in parts])
        d = np.concatenate([p[1] for p in parts])
        return _unique_pairs(s, d, self.n)

    def build_reverse(self) -> None:
        """Build REVERSED-edge blocks on the same shard pool via a
        staged pull exchange (each shard reconstructs + regroups its
        sealed edges once, every shard pulls its slice) — one routed
        engine then serves both gather directions, so callers needing
        forward AND backward traversal (bow-tie) skip a second
        construction + edge routing entirely.  Idempotent."""
        import ray

        if self._has_reverse:
            return
        ray.get([a.stage_reverse.remote() for a in self.actors])
        slices = [[a.rev_slice.remote(b) for a in self.actors]
                  for b in range(self.A)]
        ray.get([self.actors[b].seal_reverse.remote(*slices[b])
                 for b in range(self.A)])
        ray.get([a.drop_staged.remote() for a in self.actors])
        self._has_reverse = True

    def _superstep(self, compute_name: str, apply_name: str) -> int:
        """2A object-store ops per round: each compute publishes one
        packed buffer; every apply receives all A refs and slices its
        own segment (zero-copy plasma reads on shared nodes)."""
        import ray

        outs = [getattr(a, compute_name).remote() for a in self.actors]
        changed = ray.get(
            [
                getattr(self.actors[b], apply_name).remote(*outs)
                for b in range(self.A)
            ]
        )
        return int(sum(changed))

    def _resume(self, checkpoint_dir: str | None, resume: bool,
                init_name: str = "reset_labels", init_args: tuple = ()):
        """-> (start_round, changed history) restored from the latest
        complete checkpoint, or (0, []) after the algorithm's fresh
        init (``init_name`` actor method; identity labels by default,
        ``seed_distances`` for BFS)."""
        import json
        import os

        import ray

        if resume and checkpoint_dir is not None:
            from ..state.checkpoint import latest_checkpoint

            it = latest_checkpoint(checkpoint_dir)
            if it is not None:
                with open(os.path.join(checkpoint_dir, f"iter={it:05d}",
                                       "MANIFEST.json")) as f:
                    manifest = json.load(f)
                if len(manifest["partitions"]) != self.P:
                    raise ValueError(
                        f"checkpoint has {len(manifest['partitions'])} "
                        f"partitions, engine has {self.P}"
                    )
                ray.get([a.load_ckpt.remote(checkpoint_dir, it)
                         for a in self.actors])
                return it, [m["changed"] for m in manifest["metrics"]]
        ray.get([getattr(a, init_name).remote(*init_args)
                 for a in self.actors])
        return 0, []

    def _checkpoint(self, checkpoint_dir: str, it: int,
                    hist: list[int]) -> None:
        import json
        import os

        import ray

        lineage = [
            x
            for part in ray.get([a.write_ckpt.remote(checkpoint_dir, it)
                                 for a in self.actors])
            for x in part
        ]
        d = os.path.join(checkpoint_dir, f"iter={it:05d}")
        manifest = {
            "iter": it,
            "num_vertices": self.n,
            "columns": ["label"],
            "scalars": {},
            "partitions": sorted(lineage, key=lambda x: x["part"]),
            "metrics": [{"round": i + 1, "changed": c}
                        for i, c in enumerate(hist)],
        }
        tmp = os.path.join(d, "MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "MANIFEST.json"))

    def connected_components(self, max_rounds: int = 200,
                             checkpoint_dir: str | None = None,
                             checkpoint_every: int = 0, resume: bool = False,
                             collect_state: bool = True):
        """Hash-min label closure: rounds ~ graph DIAMETER + 1 (labels
        move one hop per superstep — a path graph of N vertices takes N
        rounds, see tests/test_labels_csr.py path-graph stress).  Web
        link graphs have small diameters so this is the right default;
        for pathological high-diameter inputs the standard mitigation
        is star contraction (two-phase large-star/small-star a la
        Kiveris et al., "Connected Components in MapReduce and
        Beyond") which cuts rounds to O(log N) at the cost of three
        O(E) shuffles per round — implemented as the pure-Ray-Data
        ``pipelines.cc_star.connected_components_star``; use that for
        high-diameter inputs."""
        from .components import ComponentsResult

        rounds, hist = self._resume(checkpoint_dir, resume)
        if not (hist and hist[-1] == 0):
            while rounds < max_rounds:
                rounds += 1
                changed = self._superstep("cc_compute", "cc_apply")
                hist.append(changed)
                if (checkpoint_dir is not None and checkpoint_every > 0
                        and rounds % checkpoint_every == 0):
                    self._checkpoint(checkpoint_dir, rounds, hist)
                if changed == 0:
                    break
        return ComponentsResult(
            labels=self._collect() if collect_state else None,
            rounds=rounds, changed_per_round=hist)

    def label_propagation(self, rounds: int = 10,
                          checkpoint_dir: str | None = None,
                          checkpoint_every: int = 0, resume: bool = False,
                          collect_state: bool = True):
        from .labelprop import LabelPropResult

        done, hist = self._resume(checkpoint_dir, resume)
        if not (hist and hist[-1] == 0):
            while done < rounds:
                done += 1
                changed = self._superstep("lp_compute", "lp_apply")
                hist.append(changed)
                if (checkpoint_dir is not None and checkpoint_every > 0
                        and done % checkpoint_every == 0):
                    self._checkpoint(checkpoint_dir, done, hist)
                if changed == 0:
                    break
        return LabelPropResult(
            labels=self._collect() if collect_state else None,
            rounds=done, changed_per_round=hist)

    def bfs_distances(self, seeds, max_depth: int = 32,
                      checkpoint_dir: str | None = None,
                      checkpoint_every: int = 0, resume: bool = False,
                      collect_state: bool = True, reverse: bool = False):
        """Multi-source shortest HOP distance (crawl depth) from
        ``seeds``, bounded at ``max_depth`` — the bound is part of the
        operator contract (crawl-frontier semantics: "everything within
        D hops of the seed list"), which also makes the recursive-CTE
        SQL oracle exact by construction instead of relying on an
        unverifiable cap.  Edge direction is taken as given: pass the
        directed edge Dataset for forward/crawl BFS or
        ``superstep.undirect(edges)`` for undirected distance.  One
        superstep extends the frontier one hop, so after
        min(max_depth, fixpoint) rounds every label is either the true
        distance (<= max_depth) or the sentinel ``num_vertices``
        (unreached within the bound).  Message volume per round equals
        connected components' (``cc_compute`` is reused on the wire).
        No reference counterpart (dxa-pageRank implements only
        PageRank, `MainPR.java`); standard link-graph companion op."""
        from .components import ComponentsResult

        seeds = np.asarray(seeds, dtype=np.int64)
        if len(seeds) == 0:
            raise ValueError("bfs_distances needs at least one seed")
        if seeds.min() < 0 or seeds.max() >= self.n:
            raise ValueError("seed vertex id out of range")
        if reverse and not self._has_reverse:
            # ``reverse=True`` walks the stored edges BACKWARD on the
            # same pool (see build_reverse) — bow-tie's backward pass
            self.build_reverse()
        compute = "cc_compute_rev" if reverse else "cc_compute"
        rounds, hist = self._resume(checkpoint_dir, resume,
                                    "seed_distances", (seeds, self.n))
        if not (hist and hist[-1] == 0):
            while rounds < max_depth:
                rounds += 1
                changed = self._superstep(compute, "bfs_apply")
                hist.append(changed)
                if (checkpoint_dir is not None and checkpoint_every > 0
                        and rounds % checkpoint_every == 0):
                    self._checkpoint(checkpoint_dir, rounds, hist)
                if changed == 0:
                    break
        return ComponentsResult(
            labels=self._collect() if collect_state else None,
            rounds=rounds, changed_per_round=hist)

    def sssp_distances(self, seeds, max_hops: int = 16,
                       collect_state: bool = True):
        """Multi-source WEIGHTED shortest-path cost, bounded at
        ``max_hops`` relaxation rounds (distributed Bellman-Ford):
        after k supersteps label(v) = min cost over paths of <= k edges
        from any seed, else the sentinel ``SSSP_SENTINEL`` — the same
        bounded-round contract as ``bfs_distances``, which makes the
        recursive-CTE SQL oracle exact by construction (positive
        INTEGER weights keep every cost exact).  Requires the engine
        built with ``weighted=True`` on a ``(src, dst, w)`` Dataset.
        Stops early at the fixed point (positive weights guarantee one
        within V-1 rounds)."""
        from .components import ComponentsResult

        seeds = np.asarray(seeds, dtype=np.int64)
        if len(seeds) == 0:
            raise ValueError("sssp_distances needs at least one seed")
        if seeds.min() < 0 or seeds.max() >= self.n:
            raise ValueError("seed vertex id out of range")
        rounds, hist = self._resume(None, False, "seed_distances",
                                    (seeds, SSSP_SENTINEL))
        while rounds < max_hops:
            rounds += 1
            changed = self._superstep("sssp_compute", "cc_apply")
            hist.append(changed)
            if changed == 0:
                break
        return ComponentsResult(
            labels=self._collect() if collect_state else None,
            rounds=rounds, changed_per_round=hist)

    def hyperball(self, depth: int = 8, num_registers: int = 64,
                  seed: int = 13):
        """HyperBall (Boldi & Vigna 2011, "HyperANF/HyperBall:
        approximating the neighbourhood function of very large graphs"
        — public-literature algorithm): per-vertex HyperLogLog sketches
        of the depth-bounded OUT-ball |{u : dist(v, u) <= depth}|.
        Each superstep max-merges every vertex's registers with its
        neighbors' along the STORED edge direction, so for out-balls
        construct the engine on the REVERSED edge Dataset (v's ball is
        the union of its out-neighbors' balls plus itself).

        The sketch internals are deterministic — hash
        ``stages.sampling.sample_hash(v, seed)``, bucket = hash % R,
        rho = trailing zeros of (hash // R) + 1 — so the emitted
        long-form (v, bucket, rho) register table is EXACTLY
        reproducible and hash-checkable against a SQL oracle that
        recomputes the same registers from depth-bounded all-pairs
        reachability; ball-size ESTIMATES (floats) are a closed form
        over the registers (``hll_estimates``).  Register memory is
        V x R bytes per run (64 B/vertex at R=64); message volume per
        superstep is one [groups, R] uint8 matrix per (source shard,
        target shard) block, max-merged map-side.  Stops early at the
        ball fixed point (changed == 0).

        Returns (long-form pa.Table (v, bucket, rho), rounds,
        changed_per_round).  The collected table is sized for the
        driver-gate queries (<= V x R rows); at web scale call
        ``write_hyperball(out_dir)`` afterwards instead — every shard
        sinks its owned partitions' registers to Parquet and nothing
        lands on the driver."""
        import ray

        if num_registers < 2 or num_registers > 256 or \
                (num_registers & (num_registers - 1)):
            raise ValueError("num_registers must be a power of two in "
                             "[2, 256]")
        ray.get([a.hll_seed.remote(num_registers, seed)
                 for a in self.actors])
        rounds, hist = 0, []
        while rounds < depth:
            rounds += 1
            changed = self._superstep("hll_compute", "hll_apply")
            hist.append(changed)
            if changed == 0:
                break
        return self.emit_registers(), rounds, hist

    def emit_registers(self) -> pa.Table:
        """Collect the CURRENT long-form (v, bucket, rho) register
        table — valid after ``hyperball()`` or ``harmonic_centrality()``
        (both converge the same register state, so one run serves both
        sinks)."""
        import ray

        parts = ray.get([a.hll_emit.remote() for a in self.actors])
        v = np.concatenate([p[0] for p in parts])
        bkt = np.concatenate([p[1] for p in parts])
        rho = np.concatenate([p[2] for p in parts])
        return pa.table({"v": pa.array(v.astype(np.int64), pa.int64()),
                         "bucket": pa.array(bkt.astype(np.int64), pa.int64()),
                         "rho": pa.array(rho.astype(np.int64), pa.int64())})

    def neighborhood_function(self, depth: int = 8,
                              num_registers: int = 64, seed: int = 13):
        """HyperANF (Boldi, Rosa & Vigna 2011, "HyperANF:
        approximating the neighbourhood function of very large graphs
        on a budget"): N(d) = sum_v |B(v, d)| estimated per depth from
        the HyperBall registers.  Per-depth totals are integer-micro
        quantized shard partials summed on the driver (order-free by
        integer associativity — see ``nf_partial``), so the result is
        partition- and execution-order-independent and replayable by a
        sequential oracle.  Same reversed-edge contract as
        ``hyperball``.

        Returns (list nf_micro per depth 0..rounds, rounds,
        changed_per_round)."""
        import ray

        if num_registers < 2 or num_registers > 256 or \
                (num_registers & (num_registers - 1)):
            raise ValueError("num_registers must be a power of two in "
                             "[2, 256]")
        ray.get([a.hll_seed.remote(num_registers, seed)
                 for a in self.actors])
        nf = [sum(ray.get([a.nf_partial.remote() for a in self.actors]))]
        rounds, hist = 0, []
        while rounds < depth:
            rounds += 1
            changed = self._superstep("hll_compute", "hll_apply")
            nf.append(sum(ray.get([a.nf_partial.remote()
                                   for a in self.actors])))
            hist.append(changed)
            if changed == 0:
                break
        return nf, rounds, hist

    def harmonic_centrality(self, depth: int = 8, num_registers: int = 64,
                            seed: int = 13):
        """Harmonic-centrality ESTIMATES via HyperBall per-depth ball
        deltas — hc(v) ~= sum_d (|B(v,d)| - |B(v,d-1)|) / d (Boldi &
        Vigna 2013/2014, "In-core computation of geometric
        centralities with HyperBall" — the algorithm's headline
        application).  Same engine contract as ``hyperball`` (REVERSED
        edges for the out-ball / outgoing-distance variant); the delta
        accumulation is shard-local per round, so message volume equals
        plain HyperBall's.  Approximate (HLL error compounds through
        the deltas) but DETERMINISTIC given (seed, R) — accuracy is
        pytest-pinned against exact BFS harmonic centrality.

        Returns (np.ndarray hc estimates [n], rounds,
        changed_per_round)."""
        import ray

        rounds, hist = self._geometric_loop(depth, num_registers, seed)
        out = np.zeros(self.n, dtype=np.float64)
        for lo, sl in ray.get([a.hc_emit.remote() for a in self.actors]):
            out[lo : lo + len(sl)] = sl
        return out, rounds, hist

    def _geometric_loop(self, depth: int, num_registers: int, seed: int):
        """The shared HyperBall centrality superstep loop: seed
        registers, run register max-merge supersteps, accumulate the
        per-depth ball deltas shard-locally after each one (both the
        harmonic and the sum-of-distances series — one run serves both
        emit surfaces)."""
        import ray

        if num_registers < 2 or num_registers > 256 or \
                (num_registers & (num_registers - 1)):
            raise ValueError("num_registers must be a power of two in "
                             "[2, 256]")
        ray.get([a.hll_seed.remote(num_registers, seed)
                 for a in self.actors])
        ray.get([a.hc_reset.remote() for a in self.actors])
        rounds, hist = 0, []
        while rounds < depth:
            rounds += 1
            changed = self._superstep("hll_compute", "hll_apply")
            ray.get([a.hc_accumulate.remote(rounds) for a in self.actors])
            hist.append(changed)
            if changed == 0:
                break
        return rounds, hist

    def lin_centrality(self, depth: int = 8, num_registers: int = 64,
                       seed: int = 13):
        """LIN'S-INDEX closeness inputs via the same HyperBall ball
        deltas as ``harmonic_centrality`` (Boldi & Vigna 2014,
        "Axioms for centrality" §3.2 — the closeness variant that
        stays meaningful on disconnected web graphs): sum-of-distances
        sd(v) ~= sum_d d * (|B(v,d)| - |B(v,d-1)|) and reachable-set
        size r(v) ~= |B(v, conv)|.  Lin's index itself is
        ``lin_nano(reach, sumdist)`` — row-local arithmetic shared
        verbatim with the sequential oracle
        (``graph_oracles.hyperball_lin``).  Same engine contract as
        ``hyperball`` (REVERSED edges for outgoing distances);
        deterministic given (seed, R).

        Returns (np.ndarray sumdist [n], np.ndarray reach [n], rounds,
        changed_per_round)."""
        import ray

        rounds, hist = self._geometric_loop(depth, num_registers, seed)
        sd = np.zeros(self.n, dtype=np.float64)
        reach = np.zeros(self.n, dtype=np.float64)
        for lo, s, r in ray.get([a.cl_emit.remote()
                                 for a in self.actors]):
            sd[lo : lo + len(s)] = s
            reach[lo : lo + len(r)] = r
        return sd, reach, rounds, hist

    def core_decomposition(self, max_rounds: int = 10_000,
                           checkpoint_dir: str | None = None,
                           checkpoint_every: int = 0, resume: bool = False,
                           collect_state: bool = True):
        """Core number per vertex via distributed h-index iteration
        (Lü, Zhou, Zhang & Stanley 2016, "The H-index of a network node
        and its relation to degree and coreness", Nat. Commun. —
        public-literature algorithm): estimates initialize to vertex
        degree, each superstep replaces a vertex's estimate with the
        H-index of its neighbors' estimates, and the fixpoint is exactly
        the coreness.  The estimate vector is monotone non-increasing,
        so convergence (changed == 0) is a safe stop; round count is
        bounded by the largest per-vertex estimate drop and is small on
        web-like graphs (degrees ~ cores after a handful of rounds).

        Expects a SIMPLE symmetrized edge Dataset —
        ``superstep.simple_undirect(edges)`` (self-loops dropped,
        deduplicated) — degrees count each neighbor once and a vertex
        never feeds its own estimate into its H-index.  Message volume per round equals label propagation's
        (distinct (dst, value) pairs per target shard); no new exchange
        machinery.  No reference counterpart (dxa-pageRank implements
        only PageRank); included as the standard fourth member of the
        link-graph analytics family (north_rule)."""
        rounds, hist = self._resume(checkpoint_dir, resume)
        if rounds == 0:
            # one degree superstep seeds the estimates (labels := deg)
            self._superstep("deg_compute", "deg_apply")
        if not (hist and hist[-1] == 0):
            while rounds < max_rounds:
                rounds += 1
                changed = self._superstep("core_compute", "core_apply")
                hist.append(changed)
                if (checkpoint_dir is not None and checkpoint_every > 0
                        and rounds % checkpoint_every == 0):
                    self._checkpoint(checkpoint_dir, rounds, hist)
                if changed == 0:
                    break
        from .components import ComponentsResult

        return ComponentsResult(
            labels=self._collect() if collect_state else None,
            rounds=rounds, changed_per_round=hist)

    def strongly_connected_components(self, max_outer: int = 10_000,
                                      trim_rounds: int = 64,
                                      checkpoint_dir: str | None = None,
                                      checkpoint_every: int = 0,
                                      resume: bool = False,
                                      collect_state: bool = True):
        """Per-vertex SCC ids (= the minimum member of each SCC) via
        distributed forward-backward COLORING with trim — see the
        actor-method block for the algorithm and citations.  Expects
        the DIRECTED edge Dataset (callers must NOT symmetrize);
        reverse blocks are built on the same pool.

        Outer rounds: >= 1 SCC (the one rooted at the minimum active
        vertex) is assigned per round, and the trim loop peels all
        degree-dangling singleton chains first, so round count tracks
        the graph's SCC condensation depth, not the SCC count.  Each
        inner fixpoint is the engine's standard 2A-object packed
        exchange.

        Checkpoints are written at OUTER-round boundaries, where the
        scc array is the complete algorithm state (marks zero, labels
        identity) — so the standard one-column label checkpoint
        carries SCC unchanged, and resume works at any shard count
        like every other algorithm on this pool."""
        import ray

        self.build_reverse()
        outer, hist = self._resume(checkpoint_dir, resume,
                                   init_name="scc_init")
        if outer:
            # the checkpointed labels column holds the scc array
            ray.get([a.scc_from_labels.remote() for a in self.actors])
        while True:
            remaining = sum(ray.get(
                [a.scc_remaining.remote() for a in self.actors]))
            if remaining == 0:
                break
            outer += 1
            if outer > max_outer:
                raise RuntimeError(
                    f"SCC did not converge in {max_outer} outer rounds"
                )
            for _ in range(trim_rounds):
                self._superstep("scc_presence_compute_fwd",
                                "scc_presence_apply_in")
                self._superstep("scc_presence_compute_rev",
                                "scc_presence_apply_out")
                trimmed = sum(ray.get(
                    [a.scc_trim_finalize.remote() for a in self.actors]))
                if trimmed == 0:
                    break
            while self._superstep("scc_color_compute", "scc_color_apply"):
                pass
            seeded = sum(ray.get(
                [a.scc_mark_seed.remote() for a in self.actors]))
            if seeded:
                while self._superstep("scc_mark_compute",
                                      "scc_mark_apply"):
                    pass
            assigned = sum(ray.get(
                [a.scc_assign.remote() for a in self.actors]))
            hist.append(assigned)
            if (checkpoint_dir is not None and checkpoint_every > 0
                    and outer % checkpoint_every == 0):
                ray.get([a.scc_finalize_labels.remote()
                         for a in self.actors])
                self._checkpoint(checkpoint_dir, outer, hist)
                ray.get([a.scc_restore_identity.remote()
                         for a in self.actors])
        from .components import ComponentsResult

        ray.get([a.scc_finalize_labels.remote() for a in self.actors])
        return ComponentsResult(
            labels=self._collect() if collect_state else None,
            rounds=outer, changed_per_round=hist)

    def dag_levels(self, max_rounds: int = 10_000,
                   collect_state: bool = True):
        """Longest-path LEVEL per vertex of a DAG (topological depth /
        critical-path length): level(v) = 1 + max over in-neighbors'
        levels, 0 at sources — the scheduling pass a crawl planner or
        build system runs on a condensation DAG.  Max-plus fixpoint on
        the standard packed exchange; converges in exactly
        longest-path-length rounds.  Raises past ``max_rounds``
        (the input contained a cycle — levels diverge there), so a
        non-DAG input fails loudly instead of looping."""
        import ray

        ray.get([a.reset_labels_zero.remote() for a in self.actors])
        rounds = 0
        hist: list[int] = []
        while True:
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError(
                    f"dag_levels: no fixpoint in {max_rounds} rounds — "
                    "input has a cycle or depth exceeds the bound"
                )
            changed = self._superstep("level_compute", "level_apply")
            hist.append(changed)
            if changed == 0:
                break
        from .components import ComponentsResult

        return ComponentsResult(
            labels=self._collect() if collect_state else None,
            rounds=rounds, changed_per_round=hist)

    def write_hyperball(self, out_dir: str) -> list[dict]:
        """Distributed register sink after ``hyperball()``: every shard
        writes its owned partitions' (v, bucket, rho) Parquet files."""
        import ray

        parts = ray.get([a.hll_write.remote(out_dir) for a in self.actors])
        return sorted((x for part in parts for x in part),
                      key=lambda x: x["part"])

    def _collect(self) -> np.ndarray:
        import ray

        out = np.empty(self.n, dtype=np.int64)
        for lo, sl in ray.get([a.get_state.remote() for a in self.actors]):
            out[lo : lo + len(sl)] = sl
        return out

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def write_labels(self, out_dir: str) -> list[dict]:
        """Distributed final-label write: every shard writes its owned
        partitions' Parquet files."""
        import ray

        parts = ray.get([a.write_labels.remote(out_dir) for a in self.actors])
        return sorted((x for part in parts for x in part),
                      key=lambda x: x["part"])

    def label_sizes(self):
        """(label, size) across the graph via per-shard partial counts
        merged on the driver (result size = number of distinct labels,
        not N)."""
        import ray

        parts = ray.get([a.label_counts.remote() for a in self.actors])
        labs = np.concatenate([p[0] for p in parts])
        cnts = np.concatenate([p[1] for p in parts])
        order = np.argsort(labs, kind="stable")
        labs, cnts = labs[order], cnts[order]
        b = np.flatnonzero(np.r_[True, labs[1:] != labs[:-1]])
        return labs[b], np.add.reduceat(cnts, b)
