"""Connected components by alternating large-star / small-star
contraction (Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014 — public
literature).

This is the HIGH-DIAMETER scale path the hash-min engines document as
out of scope: hash-min moves labels one hop per superstep (a path graph
of N vertices needs N rounds, see ``labels_csr.connected_components``),
while star contraction converges in O(log N) rounds by rewiring the
edge set itself:

- **large-star** (per node u): connect every neighbor v > u to
  ``m = min(Γ(u) ∪ {u})``.
- **small-star** (per node u, edges oriented high→low after a
  large-star): connect u and every neighbor except the minimum to
  ``m = min(Γ(u))``.

Both phases preserve connectivity; the fixed point is a disjoint union
of stars whose centers are the component minima.  Implemented
Ray-Data-first: each phase is one ``map_batches`` emit + ONE coarse
hash-partition shuffle + a vectorized per-partition lexsort/reduceat
sweep (the same high-cardinality-groupby shape as ``stages/agg.py`` —
a per-vertex ``groupby().map_groups`` would pay per-group overhead on
|V| near-singleton groups).  Convergence detection is exact: the edge
set is a star forest iff no vertex appears as BOTH a source and a
destination (stars are two-level; connectivity preservation rules out
a component splitting into several stars), checked with one more
coarse aggregate per round.

Trade vs the CSR hash-min engine, documented for the 100-TB sizing
call: star contraction shuffles O(E) three times per round for
O(log N) rounds and needs no resident actor state; hash-min exchanges
only per-boundary labels per round with zero shuffles but takes
diameter+1 rounds.  Web link graphs (small diameter) favor hash-min;
adversarial/high-diameter graphs favor this.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _coarse_groups(num_vertices: int) -> int:
    # ~2M vertices per coarse partition keeps per-partition sweeps in
    # cache-friendly numpy sizes while bounding partition count
    return max(1, min(512, num_vertices // 2_000_000 + 1))


def _sweep_phase(edges_ds, G: int, large: bool):
    """One contraction phase: emit (k, nb[, part]) rows, shuffle on the
    coarse key, per-partition grouped min + re-emit."""

    def emit(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        if large:  # symmetrize: group on both endpoints
            k = np.concatenate([s, d])
            nb = np.concatenate([d, s])
        else:  # edges oriented high->low: group on the high endpoint
            k, nb = s, d
        part = k % np.int64(G)
        return pa.table({"k": pa.array(k, pa.int64()),
                         "nb": pa.array(nb, pa.int64()),
                         "part": pa.array(part, pa.int64())})

    def sweep(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        nb = t["nb"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, k))
        k, nb = k[order], nb[order]
        b = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        # m per group = min(neighbors ∪ {k}) (nb sorted asc per group)
        m_grp = np.minimum(nb[b], k[b])
        sizes = np.diff(np.r_[b, len(k)])
        m = np.repeat(m_grp, sizes)
        if large:
            keep = nb > k  # connect strictly-larger neighbors to m
            src, dst = nb[keep], m[keep]
        else:
            # (nb, m) for nb != m, plus one (k, m) per group
            keep = nb != m
            src = np.concatenate([nb[keep], k[b]])
            dst = np.concatenate([m[keep], m_grp])
        # within-partition exact dedup (all rows of a key are here)
        o = np.lexsort((dst, src))
        src, dst = src[o], dst[o]
        first = (np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
                 if len(src) else np.array([], dtype=bool))
        return pa.table({"src": pa.array(src[first], pa.int64()),
                         "dst": pa.array(dst[first], pa.int64())})

    return (
        edges_ds.map_batches(emit, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sweep, batch_format="pyarrow")
        .materialize()
    )


def _is_star_forest(edges_ds, G: int) -> bool:
    """Exact fixed-point test: no vertex is both a src and a dst."""

    def flags(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        v = np.concatenate([s, d])
        f = np.concatenate([np.ones(len(s), dtype=np.int64),
                            np.full(len(d), 2, dtype=np.int64)])
        # map-side combine: (v, min f, max f) per batch
        order = np.lexsort((f, v))
        v, f = v[order], f[order]
        b = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        mn = f[b]
        mx = np.maximum.reduceat(f, b)
        return pa.table({"v": pa.array(v[b], pa.int64()),
                         "mn": pa.array(mn, pa.int64()),
                         "mx": pa.array(mx, pa.int64()),
                         "part": pa.array(v[b] % np.int64(G), pa.int64())})

    def both(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        mn = t["mn"].to_numpy(zero_copy_only=False)
        mx = t["mx"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, mn, mx = v[order], mn[order], mx[order]
        b = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        gmn = np.minimum.reduceat(mn, b)
        gmx = np.maximum.reduceat(mx, b)
        n_both = int(np.sum(gmn != gmx))
        return pa.table({"n_both": pa.array([n_both], pa.int64())})

    parts = edges_ds.map_batches(flags, batch_format="pyarrow") \
        .groupby("part").map_groups(both, batch_format="pyarrow")
    total = 0
    for bt in parts.iter_batches(batch_size=1 << 20,
                                 batch_format="pyarrow"):
        total += int(pa.compute.sum(bt["n_both"]).as_py() or 0)
    return total == 0


def connected_components_star(edges_ds, num_vertices: int,
                              max_rounds: int = 64):
    """-> ``(star_edges_ds, rounds)``: the converged star forest (one
    ``(v, m)`` edge per non-center member, m = component min) and the
    number of large+small rounds taken.  Input: a directed edge
    Dataset; self-loops and duplicates are tolerated (the first
    large-star sweep drops/collapses them)."""
    from ..context import derive_num_groups
    from ..stages.agg import coarse_distinct

    # group count: vertex-based heuristic, raised by the edge FOOTPRINT
    # (sweep cost is per-edge; a 1-group loop over a 50M-edge graph
    # would serialize every round), floor 1 — small graphs should not
    # pay per-task fixed costs on dozens of near-empty partitions
    G = max(_coarse_groups(num_vertices),
            derive_num_groups(edges_ds, minimum=1))
    # align the loop's physical width with G once, up front: each
    # phase's groupby emits as many partitions as input BLOCKS, so a
    # 64-block tiny input would pay ~64 task launches per sweep per
    # round (measured: cc_sizes_star 2.4 -> 8.5s at sf0.1), while a
    # 1-block big input would serialize (the round-4 coupling lesson)
    edges = edges_ds.repartition(G)
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        edges = _sweep_phase(edges, G, large=True)
        edges = _sweep_phase(edges, G, large=False)
        if _is_star_forest(edges, G):
            break
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds")
    # The per-phase dedup is only within a coarse partition keyed by the
    # GROUP id k, but the same output edge (nb, m) can be emitted from
    # two groups living in different partitions (e.g. small-star groups
    # 5 and 6 over {5-0, 5-1, 6-0, 6-1} both emit (1, 0)).  Duplicates
    # are harmless mid-loop (sweeps collapse them) and invisible to
    # _is_star_forest, but they would break the "one edge per member"
    # contract consumers rely on (cc_sizes_star counts rows per dst), so
    # dedup the converged forest globally — partitioned by src, NOT by
    # group id, so identical rows co-locate.  One O(E_star) pass.
    return coarse_distinct(edges, ["src", "dst"]), rounds


def cc_sizes_star(edges_ds, num_vertices: int, max_rounds: int = 64):
    """(label, size) per component — label = min member id — via star
    contraction, including size-1 components for isolated vertices.
    Sizes aggregate distributed (coarse per-dst counts); the singleton
    set comes from a broadcast anti-join against the O(distinct
    endpoints) member set (the ``q_dangling_vertices`` pattern)."""
    import ray
    import ray.data as rd

    from ..stages.agg import coarse_agg, coarse_distinct

    stars, _rounds = connected_components_star(edges_ds, num_vertices,
                                               max_rounds)
    # component sizes: leaves per center + 1 for the center itself
    sizes = coarse_agg(stars, ["dst"], [("dst", "count", "n_leaves")])

    def plus_center(batch: pa.Table) -> pa.Table:
        n = batch["n_leaves"].to_numpy(zero_copy_only=False)
        return pa.table({
            "label": batch["dst"],
            "size": pa.array(n + 1, pa.int64()),
        })

    comp = sizes.map_batches(plus_center, batch_format="pyarrow")
    # singletons: ids in [0, n) that are no star member.  The member
    # set is O(V); collect its DISTINCT ids only (distributed distinct
    # first), sorted for a searchsorted anti-join.
    src_u = stars.select_columns(["src"]).rename_columns({"src": "v"})
    dst_u = stars.select_columns(["dst"]).rename_columns({"dst": "v"})
    members = coarse_distinct(src_u.union(dst_u), ["v"])
    mem = np.sort(np.concatenate(
        [b["v"].to_numpy(zero_copy_only=False)
         for b in members.iter_batches(batch_size=1 << 20,
                                       batch_format="pyarrow")]
        + [np.array([], dtype=np.int64)]))
    mem_ref = ray.put(mem)

    def singletons(batch) -> pa.Table:
        ms = ray.get(mem_ref)
        ids = batch["id"].astype(np.int64)
        if len(ms):
            i = np.clip(np.searchsorted(ms, ids), 0, len(ms) - 1)
            ids = ids[ms[i] != ids]
        return pa.table({"label": pa.array(ids, pa.int64()),
                         "size": pa.array(np.ones(len(ids), np.int64),
                                          pa.int64())})

    lone = rd.range(num_vertices).map_batches(singletons,
                                              batch_format="numpy")
    return comp.union(lone)
