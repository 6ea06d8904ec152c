"""CSR partition-actor PageRank — the scale/performance engine.

This is the Ray-native analogue of the reference's resident-partition
superstep worker (T1, ``RunLumpPrRoundTask.java:57-65``: each slave's
vertex partition stays in DXRAM local memory across all rounds).  Here a
pool of P ``@ray.remote`` actors each pins one contiguous vertex-id
range: its out-edge CSR (zero-copy numpy from Arrow), its out-degree
vector and its PageRank slice — built ONCE, reused every superstep.
Vertex state never touches the driver; only the convergence scalars do
(the MetaChunk reduce of ``MainPR.java:156-167``).

Per superstep (block-partitioned SpMV):

1. every actor p computes its per-edge contributions ``pr/outdeg``
   vectorized and pre-combines them per destination partition q into
   sparse ``(local_idx, sum)`` partials (map-side combine — the same
   two-level aggregate that handles hub skew, SURVEY.md §4);
2. the P×P partial blocks flow actor-to-actor through the object store
   (``num_returns=P`` — each target gets ONLY its inbound blocks; this
   is the bulk message exchange replacing per-vertex remote gets,
   SURVEY.md §2.5 J1);
3. every actor q accumulates its inbound partials, applies the lump
   formula to its non-dangling slice, and returns (err, pr_sum)
   partials; the driver reduces the two scalars and broadcasts
   ``danglingPR`` into the next round's task args.

Partition count P is fixed per run (like the reference's slave count,
``ReadLumpInEdgeListTask.java:144``); cluster size can differ — more
nodes just host more actors each, which is what makes the N-vs-4N
scaling run possible without repartitioning.  P² partial blocks per
superstep bounds P at a few thousand; beyond that a two-level (node,
actor) exchange tree would be needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .pagerank import PageRankResult


def _bounds(n: int, num_partitions: int) -> np.ndarray:
    """Contiguous range bounds, balanced like the reference's ceil/floor
    partition sizing (``MainPR.java:241-248``)."""
    return np.linspace(0, n, num_partitions + 1).astype(np.int64)


def _make_actor_cls():
    import ray

    @ray.remote
    class CSRPartition:
        def __init__(self, part_id: int, bounds: np.ndarray, n: int,
                     damping: float):
            self.p = part_id
            self.bounds = bounds
            self.P = len(bounds) - 1
            self.lo = int(bounds[part_id])
            self.hi = int(bounds[part_id + 1])
            self.size = self.hi - self.lo
            self.n = n
            self.d = damping
            self.pr = np.full(self.size, 1.0 / n, dtype=np.float64)
            self.outdeg = np.zeros(self.size, dtype=np.int64)
            self.blocks: list[tuple[np.ndarray, np.ndarray]] = []
            self._edge_src: list[np.ndarray] = []
            self._edge_dst: list[np.ndarray] = []

        def add_edges(self, t: pa.Table) -> int:
            """Feed a chunk of this partition's out-edges (src in
            [lo, hi)); callable repeatedly during load."""
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            self._edge_src.append(src)
            self._edge_dst.append(dst)
            return len(src)

        def seal(self) -> int:
            """Build the pinned CSR: per target-partition edge blocks
            sorted by dst, plus the local out-degree vector."""
            src = (np.concatenate(self._edge_src)
                   if self._edge_src else np.array([], dtype=np.int64))
            dst = (np.concatenate(self._edge_dst)
                   if self._edge_dst else np.array([], dtype=np.int64))
            self._edge_src = self._edge_dst = []
            src_local = src - self.lo
            self.outdeg = np.bincount(src_local, minlength=self.size).astype(np.int64)
            tp = np.searchsorted(self.bounds, dst, side="right") - 1
            order = np.lexsort((dst, tp))
            src_local, dst, tp = src_local[order], dst[order], tp[order]
            starts = np.searchsorted(tp, np.arange(self.P))
            ends = np.searchsorted(tp, np.arange(self.P), side="right")
            self.blocks = []
            for q in range(self.P):
                s, e = starts[q], ends[q]
                self.blocks.append(
                    (src_local[s:e].astype(np.int64),
                     (dst[s:e] - int(self.bounds[q])).astype(np.int64))
                )
            self.inv_outdeg = np.where(
                self.outdeg > 0, 1.0 / np.maximum(self.outdeg, 1), 0.0
            )
            self.nondangling = self.outdeg > 0
            return int(len(dst))

        def compute(self):
            """Phase 1: sparse (idx, sums) partial per target partition."""
            contrib = self.pr * self.inv_outdeg
            out = []
            for q in range(self.P):
                src_l, dst_l = self.blocks[q]
                if len(dst_l) == 0:
                    out.append((np.array([], dtype=np.int64),
                                np.array([], dtype=np.float64)))
                    continue
                vals = contrib[src_l]
                # dst_l is sorted (seal's lexsort) -> reduceat combine
                b = np.flatnonzero(np.r_[True, dst_l[1:] != dst_l[:-1]])
                out.append((dst_l[b], np.add.reduceat(vals, b)))
            return tuple(out) if self.P > 1 else out[0]

        def apply(self, dangling_pr: float, restore: bool, *partials):
            """Phase 2: accumulate inbound partials, lump formula.
            Normal round: update non-dangling only (frozen dangling,
            ``RunLumpPrRoundTask.java:71-76``).  Restore round: update
            dangling only (``:77-83``)."""
            gathered = np.zeros(self.size, dtype=np.float64)
            for idx, vals in partials:
                if len(idx):
                    gathered[idx] += vals
            new_pr = (1.0 - self.d) / self.n + self.d * gathered \
                + self.d * dangling_pr / self.n
            if restore:
                self.pr = np.where(self.nondangling, self.pr, new_pr)
                return 0.0, float(self.pr[self.nondangling].sum())
            err = float(
                np.abs(new_pr[self.nondangling] - self.pr[self.nondangling]).sum()
            )
            self.pr = np.where(self.nondangling, new_pr, self.pr)
            return err, float(self.pr[self.nondangling].sum())

        def num_dangling(self) -> int:
            return int((~self.nondangling).sum())

        def get_state(self):
            return self.lo, self.pr

        def write_ckpt(self, base: str, it: int) -> dict:
            """Write this partition's vertex-state slice (per-partition
            lineage: each actor persists only its own id range, the Ray
            analogue of the per-slave ``.pageRank`` files of
            ``PRInfoTask.java:52-97`` — but mid-run, for resume)."""
            import os

            import pyarrow.parquet as pq

            d = os.path.join(base, f"iter={it:05d}")
            os.makedirs(d, exist_ok=True)
            name = f"part={self.p:03d}.parquet"
            pq.write_table(
                pa.table(
                    {
                        "v": pa.array(
                            np.arange(self.lo, self.hi, dtype=np.int64),
                            pa.int64(),
                        ),
                        "pr": pa.array(self.pr, pa.float64()),
                    }
                ),
                os.path.join(d, name),
            )
            return {"part": self.p, "file": name, "rows": self.size,
                    "v_lo": self.lo, "v_hi": self.hi}

        def load_ckpt(self, base: str, it: int) -> int:
            """Restore this partition's slice from its own lineage file."""
            import os

            import pyarrow.parquet as pq

            t = pq.read_table(
                os.path.join(base, f"iter={it:05d}", f"part={self.p:03d}.parquet")
            )
            pr = t["pr"].to_numpy(zero_copy_only=False)
            if len(pr) != self.size:
                raise ValueError(
                    f"checkpoint partition {self.p} has {len(pr)} rows, "
                    f"expected {self.size} (partition count changed?)"
                )
            self.pr = pr.astype(np.float64)
            return self.size

    return CSRPartition


class PageRankCSR:
    """Builds the pinned actor pool once; ``run`` iterates supersteps.

    Load path: the edge Dataset is routed to owners with a streaming
    ``iter_batches`` fan-out (each batch is split by src range and
    appended to the owning actor) — at cluster scale the same routing
    runs as a partitioned-Parquet write + per-actor read, which also
    provides the per-partition lineage for resume.
    """

    def __init__(self, edges_ds, num_vertices: int, num_partitions: int = 8,
                 damping: float = 0.85,
                 num_cpus_per_actor: float | None = None):
        import ray

        self.n = num_vertices
        self.P = num_partitions
        self.d = damping
        self.bounds = _bounds(num_vertices, num_partitions)
        if num_cpus_per_actor is None:
            # P is fixed per run; the CPU grant per actor shrinks when
            # the cluster is smaller than the partition count (more
            # actors per core — the reference's slaves-vs-cluster-size
            # decoupling).  Never reserve >=1 each when P > cores or the
            # pool would deadlock waiting for resources.
            total = ray.cluster_resources().get("CPU", num_partitions)
            num_cpus_per_actor = min(1.0, max(total / num_partitions / 2, 0.01))
        cls = _make_actor_cls()
        self.actors = [
            cls.options(num_cpus=num_cpus_per_actor).remote(
                p, self.bounds, num_vertices, damping
            )
            for p in range(num_partitions)
        ]
        pending = []
        for batch in edges_ds.iter_batches(batch_size=1 << 20,
                                           batch_format="pyarrow"):
            src = batch["src"].to_numpy(zero_copy_only=False)
            owner = np.searchsorted(self.bounds, src, side="right") - 1
            order = np.argsort(owner, kind="stable")
            t = batch.take(pa.array(order))
            osort = owner[order]
            starts = np.searchsorted(osort, np.arange(self.P))
            ends = np.searchsorted(osort, np.arange(self.P), side="right")
            for p in range(self.P):
                if ends[p] > starts[p]:
                    pending.append(
                        self.actors[p].add_edges.remote(
                            t.slice(starts[p], ends[p] - starts[p])
                        )
                    )
        ray.get(pending)
        self.num_edges = sum(ray.get([a.seal.remote() for a in self.actors]))
        self.num_dangling = sum(ray.get([a.num_dangling.remote() for a in self.actors]))

    def shutdown(self) -> None:
        """Kill the partition actors and release their CPU reservation.
        A pool that outlives its run starves later stages on a small
        cluster (P actors x fractional CPUs stay reserved)."""
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []

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
            resume: bool = False) -> PageRankResult:
        """Iterate supersteps; optionally checkpoint every k rounds
        (actors write their own partition files — the MANIFEST is the
        completeness marker, written last) and resume from the latest
        complete checkpoint (topology is rebuilt from the edge source by
        ``__init__``; only the iterated vertex state + scalars restore)."""
        import json
        import os
        import time

        import ray

        dangling_pr = self.num_dangling / self.n
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
            outs = [
                a.compute.options(num_returns=self.P).remote()
                if self.P > 1 else [a.compute.remote()]
                for a in self.actors
            ]
            stats = ray.get(
                [
                    self.actors[q].apply.remote(
                        dangling_pr, False, *[outs[p][q] for p in range(self.P)]
                    )
                    for q in range(self.P)
                ]
            )
            err = float(sum(s[0] for s in stats))
            pr_sum = float(sum(s[1] for s in stats))
            dangling_pr = 1.0 - pr_sum
            errs.append(err)
            seconds.append(time.perf_counter() - t0)
            converged = err <= threshold
            if (checkpoint_dir is not None and checkpoint_every > 0
                    and rounds % checkpoint_every == 0):
                lineage = ray.get(
                    [a.write_ckpt.remote(checkpoint_dir, rounds)
                     for a in self.actors]
                )
                self._write_manifest(checkpoint_dir, rounds, lineage,
                                     dangling_pr, errs, seconds, threshold)
        if self.num_dangling:
            outs = [
                a.compute.options(num_returns=self.P).remote()
                if self.P > 1 else [a.compute.remote()]
                for a in self.actors
            ]
            ray.get(
                [
                    self.actors[q].apply.remote(
                        dangling_pr, True, *[outs[p][q] for p in range(self.P)]
                    )
                    for q in range(self.P)
                ]
            )
        pr = np.empty(self.n, dtype=np.float64)
        import ray as _ray

        for lo, slice_pr in _ray.get([a.get_state.remote() for a in self.actors]):
            pr[lo : lo + len(slice_pr)] = slice_pr
        return PageRankResult(pr=pr, rounds=rounds, errs=errs,
                              round_seconds=seconds, converged=converged,
                              resumed_from=resumed_from)


def pagerank_csr(edges_ds, num_vertices: int, num_partitions: int = 8,
                 damping: float = 0.85, threshold: float = 1e-6,
                 max_rounds: int = 100) -> PageRankResult:
    eng = PageRankCSR(edges_ds, num_vertices, num_partitions, damping)
    return eng.run(threshold, max_rounds)
