"""CSR shard-actor PageRank — the scale/performance engine.

This is the Ray-native analogue of the reference's resident-partition
superstep worker (T1, ``RunLumpPrRoundTask.java:57-65``: each slave's
vertex partition stays in DXRAM local memory across all rounds), with
one extra level the reference lacks: **logical partitions are decoupled
from physical workers**.

- ``num_partitions`` P logical contiguous vertex-id ranges — FIXED per
  run and across cluster sizes (like the reference's slave count baked
  into the partition map, ``ReadLumpInEdgeListTask.java:144``).  All
  per-partition artifacts (CSR blocks, checkpoint lineage files,
  reduction order) are keyed by p in 0..P-1.
- ``num_actors`` A shard actors (default: cluster CPUs, capped at P) —
  each owns a contiguous range of partitions and reserves one CPU.
  Running the same job at A=8 and A=32 changes only how many shards
  the fixed partition set is dealt onto — the sandbox evidence for the
  N-vs-4N-nodes criterion — and results are **bit-identical across A**
  because every float reduction happens in logical-partition order:
  per-dst message sums accumulate partials p=0..P-1 in order, and the
  driver sums per-partition (err, pr_sum) scalars in p order.

Per superstep (block-partitioned SpMV):

1. every shard computes per-edge contributions ``pr/outdeg`` vectorized
   and pre-combines them per (source partition p, target partition q)
   into sparse ``(local_idx, sum)`` partials (map-side combine — the
   two-level aggregate that also handles hub skew, SURVEY.md §4);
2. the A x A shard-to-shard messages flow through the object store
   (``num_returns=A`` — each target shard receives ONLY its inbound
   (p, q) partials; this is the bulk exchange replacing per-vertex
   remote gets, SURVEY.md §2.5 J1);
3. every shard accumulates inbound partials per owned q (in p order),
   applies the lump formula to its non-dangling slice, and returns
   per-partition (err, pr_sum) partials; the driver reduces the two
   scalars in p order and broadcasts ``danglingPR`` into the next
   round's task args (the MetaChunk reduce of ``MainPR.java:156-167``).

Checkpoints are one Parquet file per LOGICAL partition (written by its
owning shard), so a run checkpointed at A=32 resumes at A=8 unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .pagerank import PageRankResult


def _bounds(n: int, num_partitions: int) -> np.ndarray:
    """Contiguous range bounds, balanced like the reference's ceil/floor
    partition sizing (``MainPR.java:241-248``)."""
    return np.linspace(0, n, num_partitions + 1).astype(np.int64)


def _shard_parts(num_partitions: int, num_actors: int) -> np.ndarray:
    """Deal P logical partitions onto A shards (contiguous, balanced)."""
    return np.linspace(0, num_partitions, num_actors + 1).astype(np.int64)


def default_num_actors(num_partitions: int) -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", num_partitions))
    return max(1, min(num_partitions, cpus))


_ROUTE_ACK_TIMEOUT_S = 60.0  # per ray.wait round on the ack barrier
_ROUTE_ACK_TRIES = 30        # loud failure after ~30 min of no ack
# (this host has shown multi-minute whole-machine stalls; the loud
# failure should only fire when resubmission is truly hopeless)


def distribute_edges(edges_ds, actors, shard_lo: np.ndarray) -> int:
    """Route an edge Dataset to its owning shard actors WORKER-SIDE:
    a ``map_batches`` pass splits each batch by src range and pushes the
    slices straight into the actors (no driver hot loop — at cluster
    scale the driver would otherwise stream every edge once).  Routing
    tasks run with ``num_cpus=0`` because the shard pool may hold every
    CPU in the cluster.  Returns the routed edge count.

    The handle list ships via ``ray.put`` — actor handles captured in a
    plain closure do not survive Ray Data's operator serialization (the
    routing task hangs); handles deserialized from the object store
    re-register with their owner correctly.

    ``add_edges`` is a side effect, so a silently replayed routing task
    (task retry or lineage reconstruction of an evicted block) would
    append the same edges twice and corrupt every downstream result.
    The routing op therefore runs with ``max_retries=0``: a lost worker
    fails the load loudly instead, and the caller restarts the engine
    (at real cluster scale, prefer the partitioned-Parquet write +
    per-shard read path, which is idempotent by construction).

    Liveness: an actor-task submission through a freshly deserialized
    handle can be lost in transit (observed once on a heavily throttled
    host: one ``add_edges`` of four never executed and the plain
    ``ray.get`` ack barrier slept ~30 min until a transport-level retry
    redelivered it).  Each chunk therefore carries a unique key the
    actor dedups on, and the ack barrier is a bounded ``ray.wait`` loop
    that RESUBMITS unacked chunks with the same key — safe because the
    actor ignores a key it has already applied — and fails loudly after
    ``_ROUTE_ACK_TRIES`` rounds instead of hanging a 100-TB load."""
    import uuid

    import ray

    # captured at call time (driver) so the routing closure carries the
    # values into the workers — module globals would re-resolve to the
    # defaults in each worker process
    ack_timeout_s = _ROUTE_ACK_TIMEOUT_S
    ack_tries = _ROUTE_ACK_TRIES

    # barrier: actors fully constructed/registered before routing starts
    ray.get([a.__ray_ready__.remote() for a in actors])
    handles_ref = ray.put(actors)

    def route(batch: pa.Table) -> pa.Table:
        acts = ray.get(handles_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        owner = np.searchsorted(shard_lo, src, side="right") - 1
        order = np.argsort(owner, kind="stable")
        t = batch.take(pa.array(order))
        osort = owner[order]
        A = len(acts)
        starts = np.searchsorted(osort, np.arange(A))
        ends = np.searchsorted(osort, np.arange(A), side="right")
        pending = {}
        for a in range(A):
            if ends[a] > starts[a]:
                key = uuid.uuid4().hex
                sl = t.slice(starts[a], ends[a] - starts[a])
                pending[acts[a].add_edges.remote(sl, key)] = (a, key, sl)
        # ack before the block is retired (load barrier), resubmitting
        # chunks whose submission was lost (idempotent via key)
        tries = 0
        while pending:
            ready, not_ready = ray.wait(list(pending),
                                        num_returns=len(pending),
                                        timeout=ack_timeout_s)
            ray.get(ready)  # surface actor-side errors loudly
            for r in ready:
                pending.pop(r)
            if not not_ready:
                break
            tries += 1
            if tries >= ack_tries:
                raise RuntimeError(
                    f"edge routing: {len(not_ready)} add_edges chunks "
                    f"unacked after {tries * ack_timeout_s:.0f}s"
                )
            for r in not_ready:
                a, key, sl = pending.pop(r)
                pending[acts[a].add_edges.remote(sl, key)] = (a, key, sl)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    routed = edges_ds.map_batches(route, batch_format="pyarrow",
                                  batch_size=1 << 20, num_cpus=0,
                                  max_retries=0)
    # consume on the driver: a sum() aggregate would need 1-CPU tasks,
    # which cannot schedule while the shard pool holds every CPU
    total = 0
    for b in routed.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        total += int(pa.compute.sum(b["n"]).as_py() or 0)
    return total


def write_edges_partitioned(edges_ds, out_dir: str, num_vertices: int,
                            num_partitions: int) -> None:
    """Write an edge Dataset as hive-partitioned Parquet keyed by the
    OWNING LOGICAL PARTITION (``part = src's partition``) — the
    idempotent cluster-scale load path: each shard actor then reads
    exactly its own ``part=p`` directories (``load_parquet``), so a
    failed/retried load replaces state instead of appending (the
    routing fan-out's ``max_retries=0`` caveat disappears), and the
    directory layout is the per-partition lineage for resume.  One
    file per (input block, part); re-running skips via the marker."""
    import json
    import os

    bounds = _bounds(num_vertices, num_partitions)

    def add_part(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds, src, side="right") - 1
        return batch.append_column("part", pa.array(part, pa.int64()))

    edges_ds.map_batches(add_part, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["part"])
    with open(os.path.join(out_dir, "_edges_meta.json"), "w") as f:
        json.dump({"num_vertices": num_vertices,
                   "num_partitions": num_partitions}, f)


def _check_edges_meta(path: str, num_vertices: int,
                      num_partitions: int) -> None:
    import json
    import os

    mf = os.path.join(path, "_edges_meta.json")
    if not os.path.exists(mf):
        raise ValueError(
            f"{path}: not a write_edges_partitioned layout "
            "(_edges_meta.json missing)")
    meta = json.load(open(mf))
    if (meta["num_vertices"] != num_vertices
            or meta["num_partitions"] != num_partitions):
        raise ValueError(
            f"{path}: partitioned for n={meta['num_vertices']} "
            f"P={meta['num_partitions']}, engine wants n={num_vertices} "
            f"P={num_partitions}")


def _make_actor_cls():
    import ray

    @ray.remote
    class CSRShard:
        def __init__(self, shard_id: int, bounds: np.ndarray,
                     shard_parts: np.ndarray, n: int, damping: float,
                     msg_dtype: str = "float64", weighted: bool = False,
                     idx_dtype: str = "auto"):
            # per-round message value dtype: "float32" halves the value
            # bytes of every (idx, sums) partial (12 -> 8 B/entry with
            # the int32 index) — the single-box DRAM/object-store
            # saturation lever.  The rounding happens per (p, q) block
            # BEFORE shipping, so results stay bit-identical across
            # shard counts; only the absolute accuracy vs the float64
            # engine changes (~1e-7 relative on gathered sums).
            self.msg_dtype = np.dtype(msg_dtype)
            # per-round message INDEX dtype: indices are partition-local
            # (dst - bounds[q]), so when every partition is narrower
            # than 2^16 a uint16 index cuts the idx bytes in half
            # (12 -> 10 B/entry with float64 values).  "auto" selects
            # uint16 iff max partition width allows; explicit
            # "int32"/"uint16" pins it (the A/B lever for the
            # bandwidth-bound widest scaling pair).
            widest = int(np.max(np.diff(bounds))) if len(bounds) > 1 else 0
            if idx_dtype == "auto":
                self.idx_dtype = np.uint16 if widest <= 0xFFFF else np.int32
            else:
                self.idx_dtype = np.dtype(idx_dtype)
                if self.idx_dtype == np.uint16 and widest > 0xFFFF:
                    raise ValueError(
                        "idx_dtype=uint16 needs every partition narrower "
                        f"than 65536 vertices (widest is {widest}); raise "
                        "num_partitions")
            self.s = shard_id
            self.bounds = bounds                  # P+1 vertex bounds
            self.sp = shard_parts                 # A+1 partition bounds
            self.P = len(bounds) - 1
            self.A = len(shard_parts) - 1
            self.p_lo = int(shard_parts[shard_id])
            self.p_hi = int(shard_parts[shard_id + 1])
            self.lo = int(bounds[self.p_lo])
            self.hi = int(bounds[self.p_hi])
            self.size = self.hi - self.lo
            self.n = n
            self.d = damping
            self.pr = np.full(self.size, 1.0 / n, dtype=np.float64)
            self.outdeg = np.zeros(self.size, dtype=np.int64)
            self.weighted = weighted
            self.tv: np.ndarray | None = None  # teleport slice (PPR)
            self._edge_src: list[np.ndarray] = []
            self._edge_dst: list[np.ndarray] = []
            self._edge_w: list[np.ndarray] = []
            self._seen_keys: set[str] = set()

        def add_edges(self, t: pa.Table, key: str | None = None) -> int:
            """Feed a chunk of this shard's out-edges (src in [lo, hi));
            callable repeatedly during load.  Weighted engines read the
            per-edge ``w`` column (positive out-weights).  ``key`` makes
            the call idempotent: a chunk resubmitted by the routing ack
            barrier (lost-submission recovery) is applied once."""
            if key is not None:
                if key in self._seen_keys:
                    return 0
                self._seen_keys.add(key)
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            self._edge_src.append(src)
            self._edge_dst.append(dst)
            if self.weighted:
                w = t["w"].to_numpy(zero_copy_only=False).astype(np.float64)
                if len(w) and w.min() <= 0:
                    raise ValueError("edge weights must be positive")
                self._edge_w.append(w)
            return len(src)

        def load_parquet(self, path: str) -> int:
            """Read this shard's own ``part=p`` directories from a
            ``write_edges_partitioned`` layout — the idempotent load:
            state is RESET first, so a retried/replayed load task
            yields the same shard contents (contrast ``add_edges``,
            which must be guarded against replay).  All shards read
            concurrently; nothing passes through the driver."""
            import os

            import pyarrow.parquet as pq

            self._edge_src, self._edge_dst, self._edge_w = [], [], []
            self._seen_keys = set()
            cols = ["src", "dst"] + (["w"] if self.weighted else [])
            total = 0
            for p in range(self.p_lo, self.p_hi):
                d = os.path.join(path, f"part={p}")
                if not os.path.isdir(d):  # partition owns no edges
                    continue
                total += self.add_edges(pq.read_table(d, columns=cols))
            return total

        def _build_csr(self, src: np.ndarray, dst: np.ndarray,
                       w: np.ndarray):
            """Build per-(p, q) CSR blocks from raw global edge arrays
            (src owned by this shard): edges bucketed by (source
            partition p, target partition q), each block sorted by dst
            — the partial for (p, q) is then one reduceat, independent
            of how partitions are dealt onto shards.  Returns
            ``(blocks, outdeg, inv_or_wsum, nondangling, n_edges)``
            — shared by the forward ``seal`` and the reverse-direction
            ``seal_reverse`` so both directions are bit-identically
            constructed."""
            src_local = src - self.lo
            outdeg = np.bincount(src_local,
                                 minlength=self.size).astype(np.int64)
            sp = np.searchsorted(self.bounds, src, side="right") - 1
            tp = np.searchsorted(self.bounds, dst, side="right") - 1
            key = sp * self.P + tp
            order = np.lexsort((dst, key))
            src_local, dst, key = src_local[order], dst[order], key[order]
            if self.weighted:
                w = w[order]
            # block index: (p, q) -> slice
            blocks: dict[tuple[int, int], tuple] = {}
            starts = (np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
                      if len(key) else np.array([], dtype=np.int64))
            ends = np.r_[starts[1:], len(key)] if len(starts) else starts
            for s, e in zip(starts, ends):
                p, q = divmod(int(key[s]), self.P)
                # int32 locals: partition slices are < 2^31 rows, so
                # 32-bit indices halve both the pinned CSR footprint
                # and the per-round message index bytes
                block = (
                    src_local[s:e].astype(np.int32),
                    (dst[s:e] - int(self.bounds[q])).astype(self.idx_dtype),
                )
                if self.weighted:
                    block = block + (w[s:e],)
                blocks[(p, q)] = block
            if self.weighted:
                # out-STRENGTH: contributions distribute as w/W(u)
                inv_or_wsum = np.bincount(src_local, weights=w,
                                          minlength=self.size)
                nondangling = inv_or_wsum > 0
            else:
                inv_or_wsum = np.where(
                    outdeg > 0, 1.0 / np.maximum(outdeg, 1), 0.0
                )
                nondangling = outdeg > 0
            return blocks, outdeg, inv_or_wsum, nondangling, int(len(dst))

        def _install(self, built) -> int:
            blocks, outdeg, inv_or_wsum, nondangling, n_edges = built
            self.blocks = blocks
            self.outdeg = outdeg
            if self.weighted:
                self.wsum = inv_or_wsum
            else:
                self.inv_outdeg = inv_or_wsum
            self.nondangling = nondangling
            return n_edges

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
                 if self._edge_w else np.array([], dtype=np.float64))
            self._edge_src = self._edge_dst = self._edge_w = []
            self._seen_keys = set()
            return self._install(self._build_csr(src, dst, w))

        # ---- reverse-direction blocks (the ``hits_csr.HitsShard``
        # stage/pull/seal exchange) — one routed pool serves PageRank
        # on BOTH edge directions, so inverse-PageRank composites
        # (TrustRank seed scoring) skip a second engine build ----
        def stage_reverse(self) -> None:
            """Reconstruct this shard's raw edges from the sealed
            forward blocks, reverse them, and group by the shard owning
            the new src (the original dst) for the pull exchange."""
            if self.weighted:
                raise NotImplementedError(
                    "reverse-direction blocks are unweighted-only "
                    "(reversing redistributes by IN-strength, which no "
                    "current caller defines)")
            srcs, dsts = [], []
            for (p, q), block in sorted(self.blocks.items()):
                src_l, dst_l = block[0], block[1]
                srcs.append(src_l.astype(np.int64) + self.lo)
                dsts.append(np.add(dst_l, int(self.bounds[q]),
                                   dtype=np.int64))
            src = (np.concatenate(srcs)
                   if srcs else np.array([], dtype=np.int64))
            dst = (np.concatenate(dsts)
                   if dsts else np.array([], dtype=np.int64))
            shard_lo = self.bounds[self.sp[:-1]]
            owner = np.searchsorted(shard_lo, dst, side="right") - 1
            order = np.argsort(owner, kind="stable")
            self._rev_src = dst[order]  # reversed: dst -> src
            self._rev_dst = src[order]
            self._rev_owner = owner[order]

        def rev_slice(self, a: int):
            lo = int(np.searchsorted(self._rev_owner, a))
            hi = int(np.searchsorted(self._rev_owner, a, side="right"))
            return self._rev_src[lo:hi], self._rev_dst[lo:hi]

        def seal_reverse(self, *slices) -> int:
            src = (np.concatenate([s[0] for s in slices])
                   if slices else np.array([], dtype=np.int64))
            dst = (np.concatenate([s[1] for s in slices])
                   if slices else np.array([], dtype=np.int64))
            self._alt = self._build_csr(
                src, dst, np.array([], dtype=np.float64))
            self._alt_is_rev = True
            return self._alt[4]

        def drop_staged(self) -> None:
            del self._rev_src, self._rev_dst, self._rev_owner

        def set_direction(self, rev: bool) -> int:
            """Swap the ACTIVE block set between forward and reverse
            (requires ``seal_reverse``), re-initialize pr to 1/N and
            clear any teleport vector; returns this shard's
            active-direction dangling count."""
            if not hasattr(self, "_alt"):
                raise ValueError("set_direction needs seal_reverse first")
            if rev == self._alt_is_rev:  # the wanted set is inactive
                current = (self.blocks, self.outdeg, self.inv_outdeg,
                           self.nondangling, -1)
                self._install(self._alt)
                self._alt = current
                self._alt_is_rev = not rev
            self.reset_state()
            return int((~self.nondangling).sum())

        def reset_state(self) -> None:
            """Back to the 1/N uniform start with no teleport — run a
            fresh PageRank variant on the same sealed pool."""
            self.pr = np.full(self.size, 1.0 / self.n, dtype=np.float64)
            self.tv = None

        def compute(self):
            """Phase 1: ONE packed message buffer for the whole shard —
            ``(meta, idx, vals)`` with one ``meta`` row ``(tgt_shard, p,
            q, count)`` per (p, q) block and the block partials
            concatenated in meta order.  One object-store put per
            source shard per round (A total) instead of one per
            (source, target) pair (A²): at A=32 the old shape was 1024
            puts + 1024 ref args per 95 ms round, pure per-object
            overhead.  Receivers slice their blocks zero-copy from the
            shared buffer (plasma read).  Multi-node trade, documented:
            each NODE pulls each source buffer once and its resident
            shards share it — per-node bytes grow toward the full
            message volume, but object count (the scheduler-side
            throttle at high A) drops by A×."""
            if self.weighted:
                # per-vertex ratio FIRST, then per-edge multiply — the
                # association shared with the numpy and SQL oracles
                contrib = np.where(self.nondangling,
                                   self.pr / np.where(self.nondangling,
                                                      self.wsum, 1.0), 0.0)
            else:
                contrib = self.pr * self.inv_outdeg
            metas: list[tuple[int, int, int, int]] = []
            idx_out: list[np.ndarray] = []
            val_out: list[np.ndarray] = []
            for (p, q), block in sorted(self.blocks.items()):
                src_l, dst_l = block[0], block[1]
                vals = contrib[src_l]
                if self.weighted:
                    vals = vals * block[2]
                # dst_l is sorted within the block -> reduceat combine
                b = np.flatnonzero(np.r_[True, dst_l[1:] != dst_l[:-1]])
                tgt_shard = int(np.searchsorted(self.sp, q, side="right") - 1)
                sums = np.add.reduceat(vals, b)
                if self.msg_dtype != np.float64:
                    sums = sums.astype(self.msg_dtype)
                metas.append((tgt_shard, p, q, len(b)))
                idx_out.append(dst_l[b])
                val_out.append(sums)
            meta = np.array(metas, dtype=np.int64).reshape(-1, 4)
            idx = (np.concatenate(idx_out) if idx_out
                   else np.array([], dtype=self.idx_dtype))
            vals = (np.concatenate(val_out) if val_out
                    else np.array([], dtype=self.msg_dtype))
            return meta, idx, vals

        def apply(self, dangling_pr: float, restore: bool, *shard_msgs):
            """Phase 2: accumulate inbound partials per owned partition
            in SOURCE-PARTITION ORDER (deterministic float reduction
            independent of shard count), lump formula.  Normal round:
            update non-dangling only (frozen dangling,
            ``RunLumpPrRoundTask.java:71-76``); restore round: dangling
            only (``:77-83``).  Returns per-owned-partition (err,
            pr_sum) partials."""
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
            gathered = np.zeros(self.size, dtype=np.float64)
            for q, entries in per_q.items():
                off = int(self.bounds[q]) - self.lo
                for _, idx, vals in sorted(entries, key=lambda e: e[0]):
                    # force int64 target indices: idx may be uint16
                    # (compact wire dtype) and NEP-50 numpy would keep
                    # python-int + uint16 at uint16 (silent overflow)
                    gathered[np.add(idx, off, dtype=np.int64)] += vals
            if self.tv is not None:  # personalized: teleport to seeds
                new_pr = (1.0 - self.d) * self.tv + self.d * gathered \
                    + self.d * dangling_pr * self.tv
            else:
                new_pr = (1.0 - self.d) / self.n + self.d * gathered \
                    + self.d * dangling_pr / self.n
            if restore:
                self.pr = np.where(self.nondangling, self.pr, new_pr)
                return self._partition_scalars(None)
            errv = np.abs(new_pr - self.pr) * self.nondangling
            self.pr = np.where(self.nondangling, new_pr, self.pr)
            return self._partition_scalars(errv)

        def _partition_scalars(self, errv: np.ndarray | None):
            """Per owned logical partition: (p, err, pr_sum_nondangling)
            — the driver reduces these in p order so convergence scalars
            are bit-identical for any shard count."""
            out = []
            for p in range(self.p_lo, self.p_hi):
                s = int(self.bounds[p]) - self.lo
                e = int(self.bounds[p + 1]) - self.lo
                nd = self.nondangling[s:e]
                err = float(errv[s:e].sum()) if errv is not None else 0.0
                out.append((p, err, float(self.pr[s:e][nd].sum())))
            return out

        def num_dangling(self) -> int:
            return int((~self.nondangling).sum())

        def set_teleport(self, seeds: np.ndarray, k: int) -> float:
            """Personalized PageRank teleport: uniform 1/k over the
            ``seeds`` id set (k = global seed count).  Re-initializes
            pr to the teleport distribution and returns this shard's
            DANGLING teleport mass (the driver sums these for the
            initial lumped scalar).  Must be called before ``run``."""
            self.tv = np.zeros(self.size, dtype=np.float64)
            local = seeds[(seeds >= self.lo) & (seeds < self.hi)] - self.lo
            self.tv[local] = 1.0 / k
            self.pr = self.tv.copy()
            return float(self.tv[~self.nondangling].sum())

        def get_state(self):
            return self.lo, self.pr

        def write_ckpt(self, base: str, it: int) -> list[dict]:
            """One Parquet file per OWNED LOGICAL PARTITION (lineage is
            partition-keyed, so resume works at any shard count — the
            Ray analogue of the per-slave ``.pageRank`` files of
            ``PRInfoTask.java:52-97``, but mid-run)."""
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
                            "pr": pa.array(self.pr[lo - self.lo : hi - self.lo],
                                           pa.float64()),
                        }
                    ),
                    os.path.join(d, name),
                )
                lineage.append({"part": p, "file": name, "rows": hi - lo,
                                "v_lo": lo, "v_hi": hi})
            return lineage

        def load_ckpt(self, base: str, it: int) -> int:
            """Restore owned partitions from their lineage files."""
            import os

            import pyarrow.parquet as pq

            for p in range(self.p_lo, self.p_hi):
                t = pq.read_table(
                    os.path.join(base, f"iter={it:05d}", f"part={p:03d}.parquet")
                )
                pr = t["pr"].to_numpy(zero_copy_only=False)
                lo, hi = int(self.bounds[p]), int(self.bounds[p + 1])
                if len(pr) != hi - lo:
                    raise ValueError(
                        f"checkpoint partition {p} has {len(pr)} rows, "
                        f"expected {hi - lo} (partition count changed?)"
                    )
                self.pr[lo - self.lo : hi - self.lo] = pr
            return self.size

        def write_ranks(self, out_dir: str, fmt: str = "parquet") -> list[dict]:
            """Final rank sink: one file per owned logical partition,
            written by the owner (the K1 per-partition writer,
            ``PRInfoTask.java:52-97``) — the driver never materializes
            the full rank vector.  ``fmt="text"`` writes ``<v> <pr>``
            lines with plain positional decimals (no scientific
            notation — the ``BigDecimal.toPlainString`` format of
            ``PRInfoTask.java:83-86``) for golden-file diffs."""
            import os

            import pyarrow.parquet as pq

            os.makedirs(out_dir, exist_ok=True)
            lineage = []
            for p in range(self.p_lo, self.p_hi):
                lo, hi = int(self.bounds[p]), int(self.bounds[p + 1])
                sl = self.pr[lo - self.lo : hi - self.lo]
                if fmt == "text":
                    name = f"part={p:03d}.pageRank"
                    with open(os.path.join(out_dir, name), "w") as f:
                        for v, x in zip(range(lo, hi), sl):
                            f.write(
                                f"{v} "
                                f"{np.format_float_positional(x, unique=True, trim='-')}\n"
                            )
                else:
                    name = f"part={p:03d}.parquet"
                    pq.write_table(
                        pa.table(
                            {
                                "v": pa.array(np.arange(lo, hi, dtype=np.int64),
                                              pa.int64()),
                                "pr": pa.array(sl, pa.float64()),
                            }
                        ),
                        os.path.join(out_dir, name),
                    )
                lineage.append({"part": p, "file": name, "rows": hi - lo})
            return lineage

        def local_topk(self, k: int):
            """This shard's k highest ranks -> (global ids, values).
            Candidates are selected under the same (-pr, id) total
            order the driver merge uses, so rank ties at the cut keep
            the lower vertex id (argpartition by value alone could drop
            a tied lower-id vertex that belongs in the global top-k)."""
            kk = min(k, self.size)
            if kk == 0:
                return (np.array([], dtype=np.int64),
                        np.array([], dtype=np.float64))
            local_ids = np.arange(self.size, dtype=np.int64)
            part = np.lexsort((local_ids, -self.pr))[:kk]
            return part + self.lo, self.pr[part]

    return CSRShard


class PageRankCSR:
    """Builds the pinned shard-actor pool once; ``run`` iterates
    supersteps.

    Load path: the edge Dataset is routed to owners with a streaming
    ``iter_batches`` fan-out (each batch is split by src range and
    appended to the owning shard) — at cluster scale the same routing
    runs as a partitioned-Parquet write + per-shard read, which also
    provides the per-partition lineage for resume.
    """

    def __init__(self, edges_ds, num_vertices: int, num_partitions: int = 32,
                 damping: float = 0.85, num_actors: int | None = None,
                 num_cpus_per_actor: float = 1.0,
                 message_dtype: str = "float64", weighted: bool = False,
                 index_dtype: str = "auto",
                 edges_path: str | None = None):
        import ray

        self.n = num_vertices
        self.P = num_partitions
        self.d = damping
        self.A = num_actors or default_num_actors(num_partitions)
        self.bounds = _bounds(num_vertices, num_partitions)
        self.sp = _shard_parts(num_partitions, self.A)
        shard_lo = self.bounds[self.sp[:-1]]  # vertex lo per shard
        if edges_path is not None:
            _check_edges_meta(edges_path, num_vertices, num_partitions)
        cls = _make_actor_cls()
        self.actors = [
            cls.options(num_cpus=num_cpus_per_actor).remote(
                a, self.bounds, self.sp, num_vertices, damping,
                msg_dtype=message_dtype, weighted=weighted,
                idx_dtype=index_dtype,
            )
            for a in range(self.A)
        ]
        if edges_path is not None:
            # idempotent per-shard read of the partitioned layout: all
            # shards pull their own part=p dirs concurrently (no
            # routing fan-out, no replay guard needed)
            ray.get([a.load_parquet.remote(edges_path)
                     for a in self.actors])
        else:
            distribute_edges(edges_ds, self.actors, shard_lo)
        self.num_edges = sum(ray.get([a.seal.remote() for a in self.actors]))
        self.num_dangling = sum(
            ray.get([a.num_dangling.remote() for a in self.actors])
        )
        self.weighted = weighted
        self._has_reverse = False
        self._init_dangling_pr: float | None = None

    def build_reverse(self) -> None:
        """Build REVERSED-edge blocks on the same shard pool via a
        staged pull exchange (each shard reconstructs + regroups its
        sealed edges once, every shard pulls its slice) — one routed
        engine then serves PageRank on both edge directions, so
        composites needing inverse PageRank (TrustRank seed scoring,
        Gyongyi et al. 2004) skip a second construction + edge routing
        entirely.  Idempotent; unweighted engines only."""
        import ray

        if self._has_reverse:
            return
        if self.weighted:
            raise NotImplementedError(
                "build_reverse is unweighted-only (see stage_reverse)")
        ray.get([a.stage_reverse.remote() for a in self.actors])
        ray.get([
            self.actors[b].seal_reverse.remote(
                *[a.rev_slice.remote(b) for a in self.actors])
            for b in range(self.A)
        ])
        ray.get([a.drop_staged.remote() for a in self.actors])
        self._has_reverse = True

    def set_direction(self, direction: str) -> None:
        """Activate ``"fwd"`` or ``"rev"`` blocks on every shard
        (requires ``build_reverse``); resets rank state to the uniform
        1/N start, clears any teleport, and refreshes the engine's
        dangling count for the active direction."""
        import ray

        rev = {"fwd": False, "rev": True}[direction]
        parts = ray.get([a.set_direction.remote(rev)
                         for a in self.actors])
        self.num_dangling = int(sum(parts))
        self._init_dangling_pr = None

    def reset(self) -> None:
        """Re-initialize rank state (pr = 1/N, no teleport) without
        touching the sealed blocks — run another PageRank variant on
        the same pool (call ``personalize`` after, if needed)."""
        import ray

        ray.get([a.reset_state.remote() for a in self.actors])
        self._init_dangling_pr = None

    def personalize(self, seeds) -> None:
        """Switch the engine to PERSONALIZED PageRank: teleport mass
        distributes uniformly over the ``seeds`` vertex ids instead of
        1/N over all vertices (topic-sensitive PageRank, Haveliwala
        2002 — public literature), and the dangling lump redistributes
        to the seeds likewise.  Call once before ``run`` (and again
        before a ``resume=True`` run — the teleport vector is engine
        setup, not checkpointed state).  The seed list is broadcast
        whole: seed sets are query-sized (topics, trusted hosts), not
        graph-sized."""
        import ray

        seeds = np.unique(np.asarray(seeds, dtype=np.int64))
        if len(seeds) == 0:
            raise ValueError("personalize() needs at least one seed")
        if seeds[0] < 0 or seeds[-1] >= self.n:
            raise ValueError("seed ids out of range")
        k = len(seeds)
        parts = ray.get([a.set_teleport.remote(seeds, k)
                         for a in self.actors])
        self._init_dangling_pr = float(np.sum(parts))

    def shutdown(self) -> None:
        """Kill the shard actors and release their CPU reservation.  A
        pool that outlives its run starves later stages."""
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def write_ranks(self, out_dir: str, fmt: str = "parquet") -> list[dict]:
        """Distributed final-rank write: every shard writes its owned
        partitions' files; the driver only merges lineage."""
        import ray

        parts = ray.get([a.write_ranks.remote(out_dir, fmt)
                         for a in self.actors])
        return sorted((x for part in parts for x in part),
                      key=lambda x: x["part"])

    def top_k(self, k: int = 20):
        """Distributed top-k: per-shard ``argpartition`` top-k, driver
        merges A*k candidates (ties broken by lower vertex id) — the
        driver never holds the dense rank vector."""
        import ray

        parts = ray.get([a.local_topk.remote(k) for a in self.actors])
        ids = np.concatenate([p[0] for p in parts])
        vals = np.concatenate([p[1] for p in parts])
        order = np.lexsort((ids, -vals))[:k]
        return ids[order], vals[order]

    def _exchange(self, dangling_pr: float, restore: bool):
        """One compute+apply exchange; -> p-ordered (err, pr_sum).
        Each source shard publishes ONE packed message object; every
        apply receives the same A refs and slices out its own blocks
        (see ``compute``) — 2A object-store ops per round."""
        import ray

        outs = [a.compute.remote() for a in self.actors]
        stats = ray.get(
            [
                self.actors[b].apply.remote(dangling_pr, restore, *outs)
                for b in range(self.A)
            ]
        )
        flat = sorted((t for s in stats for t in s), key=lambda t: t[0])
        err = float(np.sum([t[1] for t in flat]))
        pr_sum = float(np.sum([t[2] for t in flat]))
        return err, pr_sum

    def _write_manifest(self, base: str, it: int, lineage: list[dict],
                        dangling_pr: float, errs: list[float],
                        seconds: list[float], threshold: float) -> None:
        import json
        import os

        d = os.path.join(base, f"iter={it:05d}")
        manifest = {
            "iter": it,
            "num_vertices": self.n,
            "columns": ["pr"],
            "scalars": {"dangling_pr": dangling_pr, "damping": self.d,
                        "threshold": threshold},
            "partitions": sorted(lineage, key=lambda x: x["part"]),
            "metrics": [
                {"round": i + 1, "err": e, "seconds": s}
                for i, (e, s) in enumerate(zip(errs, seconds))
            ],
        }
        tmp = os.path.join(d, "MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "MANIFEST.json"))

    def run(self, threshold: float = 1e-6, max_rounds: int = 100,
            checkpoint_dir: str | None = None, checkpoint_every: int = 0,
            resume: bool = False, collect_state: bool = True) -> PageRankResult:
        """Iterate supersteps; optionally checkpoint every k rounds
        (shards write their owned partitions' files — the MANIFEST is
        the completeness marker, written last) and resume from the
        latest complete checkpoint (topology is rebuilt from the edge
        source by ``__init__``; only the iterated vertex state +
        scalars restore — at ANY shard count)."""
        import json
        import os
        import time

        import ray

        dangling_pr = (self._init_dangling_pr
                       if self._init_dangling_pr is not None
                       else self.num_dangling / self.n)
        errs: list[float] = []
        seconds: list[float] = []
        rounds = 0
        converged = False
        resumed_from = None
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
                dangling_pr = float(manifest["scalars"]["dangling_pr"])
                errs = [m["err"] for m in manifest["metrics"]]
                seconds = [m["seconds"] for m in manifest["metrics"]]
                rounds = it
                resumed_from = it
                converged = len(errs) > 0 and errs[-1] <= threshold
        while rounds < max_rounds and not converged:
            t0 = time.perf_counter()
            rounds += 1
            err, pr_sum = self._exchange(dangling_pr, restore=False)
            dangling_pr = 1.0 - pr_sum
            errs.append(err)
            seconds.append(time.perf_counter() - t0)
            converged = err <= threshold
            if (checkpoint_dir is not None and checkpoint_every > 0
                    and rounds % checkpoint_every == 0):
                lineage = [
                    x
                    for part in ray.get(
                        [a.write_ckpt.remote(checkpoint_dir, rounds)
                         for a in self.actors]
                    )
                    for x in part
                ]
                self._write_manifest(checkpoint_dir, rounds, lineage,
                                     dangling_pr, errs, seconds, threshold)
        if self.num_dangling:
            self._exchange(dangling_pr, restore=True)
        pr = None
        if collect_state:
            # dense driver-side vector: convenience for small/medium N;
            # at cluster scale pass collect_state=False and use
            # write_ranks / top_k, which never leave the shards
            pr = np.empty(self.n, dtype=np.float64)
            import ray as _ray

            for lo, slice_pr in _ray.get(
                [a.get_state.remote() for a in self.actors]
            ):
                pr[lo : lo + len(slice_pr)] = slice_pr
        return PageRankResult(pr=pr, rounds=rounds, errs=errs,
                              round_seconds=seconds, converged=converged,
                              resumed_from=resumed_from)


def pagerank_csr(edges_ds, num_vertices: int, num_partitions: int = 32,
                 damping: float = 0.85, threshold: float = 1e-6,
                 max_rounds: int = 100,
                 num_actors: int | None = None) -> PageRankResult:
    eng = PageRankCSR(edges_ds, num_vertices, num_partitions, damping,
                      num_actors=num_actors)
    res = eng.run(threshold, max_rounds)
    eng.shutdown()
    return res
