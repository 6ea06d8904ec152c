"""Shared superstep machinery: scatter/gather over an edge Dataset.

The reference's superstep is a pull-gather with per-vertex remote reads
(``RunLumpPrRoundTask.java:90-116``).  Here a superstep is dataflow
(SURVEY.md §2.5 J1): the per-vertex values are broadcast once per round
(``ray.put`` of a dense numpy array — the Ray analogue of the
MetaChunk/driver scalar broadcast, generalized to the vertex vector),
each edge batch computes its messages vectorized and pre-combines them
per key (map-side combine, SURVEY.md §4 "skew"), a ``groupby(dst)``
aggregate performs the message-exchange shuffle, and the driver
densifies the (at most N-row) combined result.

This broadcast engine is the default for graphs whose per-vertex vector
fits comfortably in the object store (``BROADCAST_VERTEX_LIMIT``, 8
bytes/vertex ~ 80 MB at 1e7).  Beyond it, the CSR partition-actor
engine (`pipelines.pagerank.PageRankCSR`) keeps vertex state fully
distributed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def put_vector(vec: np.ndarray):
    import ray

    return ray.put(np.ascontiguousarray(vec))


def sparse_sum_gather(edges_ds, values_ref, n: int,
                      batch_size: int | None = None) -> np.ndarray:
    """sum_{u->v} values[u] for every v — the PageRank message exchange.

    Scatter: broadcast ``values`` (per-src contribution, already divided
    by outdeg by the caller); map-side combine per batch (sort+reduceat
    by dst); gather: ``groupby("dst").sum`` shuffle; densify on driver.
    """
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vals_by_src = ray.get(values_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        vals = vals_by_src[src]
        order = np.argsort(dst, kind="stable")
        dsort, vsort = dst[order], vals[order]
        bounds = np.flatnonzero(np.r_[True, dsort[1:] != dsort[:-1]])
        sums = np.add.reduceat(vsort, bounds)
        return pa.table({"dst": pa.array(dsort[bounds], pa.int64()),
                         "msg": pa.array(sums, pa.float64())})

    msgs = edges_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=batch_size)
    combined = msgs.groupby("dst").aggregate(Sum("msg", alias_name="msg"))
    out = np.zeros(n, dtype=np.float64)
    for b in combined.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        out[b["dst"].to_numpy(zero_copy_only=False)] = b["msg"].to_numpy(
            zero_copy_only=False
        )
    return out


def sparse_min_gather(edges_ds, labels_ref, n: int,
                      batch_size: int | None = None) -> np.ndarray:
    """min_{u->v} labels[u] per v (int64; ``INT64_MAX`` where no message)
    — the hash-min CC message exchange.  Same scatter/combine/shuffle
    shape as the sum gather, with Min as both combiner and aggregate."""
    import ray
    from ray.data.aggregate import Min

    def partial(batch: pa.Table) -> pa.Table:
        labels = ray.get(labels_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        vals = labels[src]
        order = np.argsort(dst, kind="stable")
        dsort, vsort = dst[order], vals[order]
        bounds = np.flatnonzero(np.r_[True, dsort[1:] != dsort[:-1]])
        mins = np.minimum.reduceat(vsort, bounds)
        return pa.table({"dst": pa.array(dsort[bounds], pa.int64()),
                         "msg": pa.array(mins, pa.int64())})

    msgs = edges_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=batch_size)
    combined = msgs.groupby("dst").aggregate(Min("msg", alias_name="msg"))
    out = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    for b in combined.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        out[b["dst"].to_numpy(zero_copy_only=False)] = b["msg"].to_numpy(
            zero_copy_only=False
        )
    return out


def mode_gather(edges_ds, labels_ref, n: int,
                batch_size: int | None = None) -> np.ndarray:
    """Per-receiver *mode* of neighbor labels, ties broken by the lowest
    label (label propagation's aggregate; deterministic).

    Two-level: per-batch (dst, label) pair counts (map-side combine),
    ``groupby(["dst", "label"]).sum`` shuffle, then a per-dst argmax on
    the driver over the (much smaller) combined pair table.  Returns -1
    where a vertex received no message.
    """
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        labels = ray.get(labels_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        lab = labels[src]
        order = np.lexsort((lab, dst))
        dsort, lsort = dst[order], lab[order]
        bounds = np.flatnonzero(
            np.r_[True, (dsort[1:] != dsort[:-1]) | (lsort[1:] != lsort[:-1])]
        )
        counts = np.diff(np.r_[bounds, len(dsort)])
        return pa.table({"dst": pa.array(dsort[bounds], pa.int64()),
                         "label": pa.array(lsort[bounds], pa.int64()),
                         "cnt": pa.array(counts, pa.int64())})

    msgs = edges_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=batch_size)
    combined = msgs.groupby(["dst", "label"]).aggregate(Sum("cnt", alias_name="cnt"))
    t = pa.concat_tables(
        list(combined.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )
    out = np.full(n, -1, dtype=np.int64)
    if t.num_rows == 0:
        return out
    dsts = t["dst"].to_numpy(zero_copy_only=False)
    labs = t["label"].to_numpy(zero_copy_only=False)
    cnts = t["cnt"].to_numpy(zero_copy_only=False)
    # sort by (dst, -count, label): first row per dst = mode w/ min tie-break
    order = np.lexsort((labs, -cnts, dsts))
    dsts, labs = dsts[order], labs[order]
    first = np.flatnonzero(np.r_[True, dsts[1:] != dsts[:-1]])
    out[dsts[first]] = labs[first]
    return out


def dense_out_degrees(edges_ds, n: int) -> np.ndarray:
    """Dense out-degree vector via distributed partial counts (A1 of
    SURVEY.md §2.6, computed once at load like the reference's pass 1,
    ``ReadLumpInEdgeListTask.java:69-71``)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        u, c = np.unique(src, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "cnt": pa.array(c, pa.int64())})

    combined = (
        edges_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("cnt", alias_name="outdeg"))
    )
    out = np.zeros(n, dtype=np.int64)
    for b in combined.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        out[b["v"].to_numpy(zero_copy_only=False)] = b["outdeg"].to_numpy(
            zero_copy_only=False
        )
    return out


def undirect(edges_ds):
    """Materialized undirected (symmetrized) edge Dataset — CC/LP input."""

    def flip(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["dst"], "dst": batch["src"]})

    return edges_ds.union(
        edges_ds.map_batches(flip, batch_format="pyarrow")
    ).materialize()


def simple_undirect(edges_ds):
    """SIMPLE symmetrized edge Dataset: self-loops dropped, then
    symmetrized and exactly deduplicated — the k-core input contract
    (a self-loop would inflate a vertex's degree and feed its own
    estimate into its H-index)."""
    from .graph_build import dedup_edges

    def drop_loops(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.invert(pc.equal(batch["src"], batch["dst"])))

    return dedup_edges(
        undirect(edges_ds.map_batches(drop_loops, batch_format="pyarrow"))
    ).materialize()
