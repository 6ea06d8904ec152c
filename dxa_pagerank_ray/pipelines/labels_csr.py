"""CSR partition-actor engine for label algorithms (CC, label prop).

Same execution shape as ``pipelines.pagerank_csr.PageRankCSR`` (the
Ray-native analogue of the reference's resident-partition superstep
worker, ``RunLumpPrRoundTask.java:57-65``): P actors pin contiguous
vertex-id ranges with per-target-partition edge blocks built once;
each superstep exchanges P x P sparse partials actor-to-actor through
the object store instead of re-shuffling the edge table every round —
at scale this removes the per-round all-to-all of the broadcast engine
(`pipelines.superstep`), which stays as the semantics reference and
small-graph default.

Message kinds:
- connected components: per-dst **min** of neighbor labels (hash-min,
  SURVEY.md §2.11), converged when no label changes — matches the
  broadcast engine / numpy oracle exactly.
- label propagation: per-dst **mode** of neighbor labels with lowest-
  label tie-break; partials are (dst, label, count) triples combined
  per target partition — deterministic, exact match vs the oracle.

Both expect a *symmetrized* edge Dataset (callers pass
``superstep.undirect(edges)`` for directed input, mirroring the
broadcast engine).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .pagerank_csr import _bounds


def _make_label_actor_cls():
    import ray

    @ray.remote
    class LabelPartition:
        def __init__(self, part_id: int, bounds: np.ndarray):
            self.p = part_id
            self.bounds = bounds
            self.P = len(bounds) - 1
            self.lo = int(bounds[part_id])
            self.hi = int(bounds[part_id + 1])
            self.size = self.hi - self.lo
            self.labels = np.arange(self.lo, self.hi, dtype=np.int64)
            self._edge_src: list[np.ndarray] = []
            self._edge_dst: list[np.ndarray] = []

        def add_edges(self, t: pa.Table) -> int:
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            self._edge_src.append(src)
            self._edge_dst.append(dst)
            return len(src)

        def seal(self) -> int:
            src = (np.concatenate(self._edge_src)
                   if self._edge_src else np.array([], dtype=np.int64))
            dst = (np.concatenate(self._edge_dst)
                   if self._edge_dst else np.array([], dtype=np.int64))
            self._edge_src = self._edge_dst = []
            src_local = src - self.lo
            tp = np.searchsorted(self.bounds, dst, side="right") - 1
            order = np.lexsort((dst, tp))
            src_local, dst, tp = src_local[order], dst[order], tp[order]
            starts = np.searchsorted(tp, np.arange(self.P))
            ends = np.searchsorted(tp, np.arange(self.P), side="right")
            self.blocks = [
                (src_local[starts[q]:ends[q]].astype(np.int64),
                 (dst[starts[q]:ends[q]] - int(self.bounds[q])).astype(np.int64))
                for q in range(self.P)
            ]
            return int(len(dst))

        def reset_labels(self) -> None:
            self.labels = np.arange(self.lo, self.hi, dtype=np.int64)

        # ---- connected components (hash-min) ----
        def cc_compute(self):
            out = []
            for q in range(self.P):
                src_l, dst_l = self.blocks[q]
                if len(dst_l) == 0:
                    out.append((np.array([], dtype=np.int64),
                                np.array([], dtype=np.int64)))
                    continue
                vals = self.labels[src_l]
                b = np.flatnonzero(np.r_[True, dst_l[1:] != dst_l[:-1]])
                out.append((dst_l[b], np.minimum.reduceat(vals, b)))
            return tuple(out) if self.P > 1 else out[0]

        def cc_apply(self, *partials) -> int:
            idx = np.concatenate([p[0] for p in partials]) if partials else \
                np.array([], dtype=np.int64)
            if len(idx) == 0:
                return 0
            vals = np.concatenate([p[1] for p in partials])
            # sort-merge the (at most P) sorted partials instead of
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

        # ---- label propagation (mode, min tie-break) ----
        def lp_compute(self):
            out = []
            for q in range(self.P):
                src_l, dst_l = self.blocks[q]
                if len(dst_l) == 0:
                    out.append((np.array([], dtype=np.int64),
                                np.array([], dtype=np.int64),
                                np.array([], dtype=np.int64)))
                    continue
                lab = self.labels[src_l]
                order = np.lexsort((lab, dst_l))
                d, l = dst_l[order], lab[order]
                b = np.flatnonzero(np.r_[True, (d[1:] != d[:-1]) | (l[1:] != l[:-1])])
                cnt = np.diff(np.r_[b, len(d)])
                out.append((d[b], l[b], cnt))
            return tuple(out) if self.P > 1 else out[0]

        def lp_apply(self, *partials) -> int:
            ds = np.concatenate([p[0] for p in partials]) if partials else \
                np.array([], dtype=np.int64)
            if len(ds) == 0:
                return 0
            ls = np.concatenate([p[1] for p in partials])
            cs = np.concatenate([p[2] for p in partials])
            # combine counts across source partitions
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

        def get_state(self):
            return self.lo, self.labels

    return LabelPartition


class LabelCSR:
    """Pinned label-partition pool over a symmetrized edge Dataset."""

    def __init__(self, und_edges_ds, num_vertices: int,
                 num_partitions: int = 8,
                 num_cpus_per_actor: float | None = None):
        import ray

        self.n = num_vertices
        self.P = num_partitions
        self.bounds = _bounds(num_vertices, num_partitions)
        if num_cpus_per_actor is None:
            total = ray.cluster_resources().get("CPU", num_partitions)
            num_cpus_per_actor = min(1.0, max(total / num_partitions / 2, 0.01))
        cls = _make_label_actor_cls()
        self.actors = [
            cls.options(num_cpus=num_cpus_per_actor).remote(p, self.bounds)
            for p in range(num_partitions)
        ]
        pending = []
        for batch in und_edges_ds.iter_batches(batch_size=1 << 20,
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
                    pending.append(self.actors[p].add_edges.remote(
                        t.slice(starts[p], ends[p] - starts[p])))
        ray.get(pending)
        self.num_edges = sum(ray.get([a.seal.remote() for a in self.actors]))

    def _superstep(self, compute_name: str, apply_name: str) -> int:
        import ray

        outs = [
            getattr(a, compute_name).options(num_returns=self.P).remote()
            if self.P > 1 else [getattr(a, compute_name).remote()]
            for a in self.actors
        ]
        changed = ray.get(
            [
                getattr(self.actors[q], apply_name).remote(
                    *[outs[p][q] for p in range(self.P)]
                )
                for q in range(self.P)
            ]
        )
        return int(sum(changed))

    def connected_components(self, max_rounds: int = 200):
        import ray

        from .components import ComponentsResult

        ray.get([a.reset_labels.remote() for a in self.actors])
        hist: list[int] = []
        rounds = 0
        for rounds in range(1, max_rounds + 1):
            changed = self._superstep("cc_compute", "cc_apply")
            hist.append(changed)
            if changed == 0:
                break
        return ComponentsResult(labels=self._collect(), rounds=rounds,
                                changed_per_round=hist)

    def label_propagation(self, rounds: int = 10):
        import ray

        from .labelprop import LabelPropResult

        ray.get([a.reset_labels.remote() for a in self.actors])
        hist: list[int] = []
        done = 0
        for done in range(1, rounds + 1):
            changed = self._superstep("lp_compute", "lp_apply")
            hist.append(changed)
            if changed == 0:
                break
        return LabelPropResult(labels=self._collect(), rounds=done,
                               changed_per_round=hist)

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
