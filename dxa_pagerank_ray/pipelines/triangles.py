"""Triangle counting (one-shot, non-iterative — SURVEY.md §2.11, §7
step 8).

Algorithm: degree-ordered edge orientation + distributed wedge check.

1. Canonicalize: undirected simple graph — ``(lo, hi)`` per edge, self
   loops dropped, exact dedup (``groupby(src,dst)``).
2. Orient each edge from the endpoint with smaller ``(degree, id)`` to
   the larger — every out-neighborhood then has size O(sqrt(E)), which
   bounds the wedge work (standard forward/compact-forward counting).
3. Broadcast the oriented CSR + a sorted packed edge set once
   (``ray.put``); a ``map_batches`` pass over vertex-id ranges
   enumerates each vertex's out-wedges vectorized and counts closures
   with one ``searchsorted`` per batch; final ``sum()`` reduce.

The broadcast stage bounds this engine at graphs whose oriented CSR
fits the object store (fine for the 1e7-edge bench tier; the 1e12-doc
tier would replace step 3 with a self-join + semi-join shuffle on the
same oriented table — same counts, all-to-all exchange instead of a
broadcast).  Vertex ids must fit in 31 bits for edge packing here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .graph_build import dedup_edges


def _canonicalize(edges_ds):
    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pa.table({"src": pa.array(lo, pa.int64()),
                         "dst": pa.array(hi, pa.int64())})

    return dedup_edges(edges_ds.map_batches(canon, batch_format="pyarrow"))


# Edge-count bound for the broadcast CSR engine: the shipped state is
# ~16 B/edge + 8 B/vertex (~160 MB at the limit — the same object-store
# budget as graph_build.BROADCAST_VERTEX_LIMIT).  Above it the default
# entry point dispatches to the all-shuffle engine.
BROADCAST_EDGE_LIMIT = 10_000_000


def _orient_shuffle(canon, num_partitions: int = 64,
                    degree_broadcast_limit: int | None = None):
    """Degree-ordered orientation of a canonicalized edge Dataset —
    the shared step 2 of the all-shuffle triangle engines (guarded
    degree broadcast with the co-grouped-join fallback; see
    ``triangle_count_shuffle``'s docstring)."""
    import ray

    # distributed degree table -> broadcast (deg, id) ordering key
    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [batch["src"].to_numpy(zero_copy_only=False),
             batch["dst"].to_numpy(zero_copy_only=False)]
        )
        u, c = np.unique(both, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "cnt": pa.array(c, pa.int64())})

    from ..context import BROADCAST_VERTEX_LIMIT
    from ..stages.agg import coarse_agg

    deg_limit = BROADCAST_VERTEX_LIMIT if degree_broadcast_limit is None \
        else degree_broadcast_limit
    deg_ds = coarse_agg(canon.map_batches(deg_partial, batch_format="pyarrow"),
                        ["v"], [("cnt", "sum", "deg")]).materialize()

    if deg_ds.count() <= deg_limit:
        # small-V path: one ray.put of the sorted (v, deg) arrays,
        # orientation is a shuffle-free map_batches scan
        deg_tbl = pa.concat_tables(
            list(deg_ds.iter_batches(batch_size=1 << 20,
                                     batch_format="pyarrow"))
        )
        dv = deg_tbl["v"].to_numpy(zero_copy_only=False)
        dd = deg_tbl["deg"].to_numpy(zero_copy_only=False)
        order = np.argsort(dv, kind="stable")
        deg_ref = ray.put((dv[order], dd[order]))

        def orient(batch: pa.Table) -> pa.Table:
            vs, ds_ = ray.get(deg_ref)
            lo = batch["src"].to_numpy(zero_copy_only=False)
            hi = batch["dst"].to_numpy(zero_copy_only=False)
            dlo = ds_[np.searchsorted(vs, lo)]
            dhi = ds_[np.searchsorted(vs, hi)]
            fwd = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
            a = np.where(fwd, lo, hi)
            b = np.where(fwd, hi, lo)
            return pa.table({"src": pa.array(a, pa.int64()),
                             "dst": pa.array(b, pa.int64())})

        oriented = canon.map_batches(orient, batch_format="pyarrow") \
            .materialize()
    else:
        # web-scale path: attach each endpoint's degree with a
        # co-grouped distributed join (degrees never touch the driver),
        # then orient per batch — same guard discipline as
        # relational.top_customers_by_revenue
        from ..stages.dedup import cogroup_attach

        schema1 = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
        with_dsrc = cogroup_attach(
            canon, "src", deg_ds, "v", "deg", "dsrc", schema1, pa.int64())
        schema2 = schema1.append(pa.field("dsrc", pa.int64()))
        with_both = cogroup_attach(
            with_dsrc, "dst", deg_ds, "v", "deg", "ddst", schema2,
            pa.int64())

        def orient_attached(batch: pa.Table) -> pa.Table:
            lo = batch["src"].to_numpy(zero_copy_only=False)
            hi = batch["dst"].to_numpy(zero_copy_only=False)
            dlo = batch["dsrc"].to_numpy(zero_copy_only=False)
            dhi = batch["ddst"].to_numpy(zero_copy_only=False)
            fwd = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
            a = np.where(fwd, lo, hi)
            b = np.where(fwd, hi, lo)
            return pa.table({"src": pa.array(a, pa.int64()),
                             "dst": pa.array(b, pa.int64())})

        oriented = with_both.map_batches(
            orient_attached, batch_format="pyarrow").materialize()
    return oriented


def triangle_count_shuffle(edges_ds, num_partitions: int = 64,
                           _canon=None,
                           degree_broadcast_limit: int | None = None) -> int:
    """All-shuffle triangle count — the scale path for graphs whose
    oriented CSR cannot broadcast (the `triangle_count` limit).

    1. canonicalize + dedup (as the broadcast variant);
    2. degree-ordered orientation (degrees via a distributed count;
       the O(V) degree table ships as a ``ray.put`` lookup only while
       it fits ``degree_broadcast_limit`` rows — beyond that, V at web
       scale is billions of urls, so degrees are attached to both
       endpoints with two co-grouped distributed joins instead and
       nothing lands on the driver);
    3. wedge generation: group oriented edges by tail on a COARSE
       hash partition, one vectorized sweep enumerates each tail's
       out-pairs (u, w) — degree orientation bounds out-degrees at
       O(sqrt(E)) so wedge volume is O(E^{3/2}) worst case, streaming;
    4. closing check: hash-join wedges against the oriented edge set on
       (src, dst) — a pure all-to-all equi-join, no broadcast;
    5. count = matched rows.

    Partitioning assumption: wedges for one tail must co-locate (step
    3 groups by tail hash); the closing join hash-partitions both sides
    on (src, dst).
    """
    import ray
    import ray.data as rd

    canon = _canon if _canon is not None else _canonicalize(edges_ds).materialize()
    if canon.count() == 0:
        return 0

    oriented = _orient_shuffle(canon, num_partitions,
                               degree_broadcast_limit)

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["src"].to_numpy(zero_copy_only=False) % num_partitions
        return batch.append_column("part", pa.array(part, pa.int64()))

    def wedges(t: pa.Table) -> pa.Table:
        a = t["src"].to_numpy(zero_copy_only=False)
        b = t["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        ends = np.r_[starts[1:], len(a)]
        out_u, out_w = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            iu, iw = np.triu_indices(m, 1)
            out_u.append(b[s:e][iu])  # b sorted -> u < w in (deg,id)? no:
            out_w.append(b[s:e][iw])  # sorted by id; closing edge may be
            # oriented either way, so emit BOTH orientations downstream
        if not out_u:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        u = np.concatenate(out_u)
        w = np.concatenate(out_w)
        return pa.table({"src": pa.array(np.concatenate([u, w]), pa.int64()),
                         "dst": pa.array(np.concatenate([w, u]), pa.int64())})

    wedge_ds = (
        oriented.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedges, batch_format="pyarrow")
        .materialize()
    )
    nw = wedge_ds.count()
    if nw == 0:
        return 0
    # size join partitions to the data: Ray 2.49's hash join breaks on
    # empty partitions, which tiny inputs would otherwise produce
    join_parts = max(1, min(num_partitions, nw // 4096 + 1))
    closed = wedge_ds.join(
        oriented, join_type="inner", num_partitions=join_parts,
        on=("src", "dst"),
    )
    return int(closed.count())


def triangle_count(edges_ds, num_vertices: int,
                   batch_size: int = 1 << 16,
                   broadcast_limit: int | None = None) -> int:
    """Exact triangle count of the undirected simple graph underlying
    ``edges_ds`` (dense ids).

    Dispatches on the (deduplicated) edge count, the same guard
    discipline as the id join in ``build_link_graph``: at or under
    ``broadcast_limit`` edges (default ``BROADCAST_EDGE_LIMIT``) the
    oriented CSR broadcasts once via ``ray.put`` and wedge checks run
    as a ``map_batches`` scan (no further shuffle); above it the
    all-shuffle wedge-join engine runs on the already-canonicalized
    edge set — nothing is materialized on the driver."""
    import ray
    import ray.data as rd

    n = num_vertices
    limit = BROADCAST_EDGE_LIMIT if broadcast_limit is None else broadcast_limit
    canon = _canonicalize(edges_ds).materialize()
    if canon.count() > limit or n >= (1 << 31):
        return triangle_count_shuffle(edges_ds, _canon=canon)
    t = pa.concat_tables(
        list(canon.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    ) if canon.count() else pa.table({"src": pa.array([], pa.int64()),
                                      "dst": pa.array([], pa.int64())})
    lo = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    hi = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(lo) == 0:
        return 0
    deg = np.bincount(lo, minlength=n) + np.bincount(hi, minlength=n)
    # orient: from smaller (deg, id) to larger
    key_lo = deg[lo] * (n + 1) + lo
    key_hi = deg[hi] * (n + 1) + hi
    fwd = key_lo < key_hi
    a = np.where(fwd, lo, hi)  # tail (smaller key)
    b = np.where(fwd, hi, lo)  # head
    # oriented CSR over tails
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, a + 1, 1)
    indptr = np.cumsum(indptr)
    packed = np.sort((a << np.int64(31)) | b)
    state_ref = ray.put((indptr, b, packed))

    def count_batch(batch: dict) -> pa.Table:
        indptr_, nbrs, packed_ = ray.get(state_ref)
        cand_u = []
        cand_w = []
        for v in batch["id"]:
            s, e = indptr_[v], indptr_[v + 1]
            if e - s < 2:
                continue
            nb = nbrs[s:e]  # sorted ascending
            k = len(nb)
            iu, iw = np.triu_indices(k, 1)
            cand_u.append(nb[iu])
            cand_w.append(nb[iw])
        if not cand_u:
            return pa.table({"cnt": pa.array([0], pa.int64())})
        u = np.concatenate(cand_u)
        w = np.concatenate(cand_w)
        # wedge closes iff (u,w) or (w,u) is an oriented edge
        p1 = (u << np.int64(31)) | w
        p2 = (w << np.int64(31)) | u
        i1 = np.searchsorted(packed_, p1)
        i2 = np.searchsorted(packed_, p2)
        c = int(
            np.sum((i1 < len(packed_)) & (packed_[np.minimum(i1, len(packed_) - 1)] == p1))
            + np.sum((i2 < len(packed_)) & (packed_[np.minimum(i2, len(packed_) - 1)] == p2))
        )
        return pa.table({"cnt": pa.array([c], pa.int64())})

    counts = rd.range(n).map_batches(count_batch, batch_format="numpy",
                                     batch_size=batch_size)
    return int(counts.sum("cnt"))


def per_vertex_triangles(edges_ds, num_vertices: int,
                         batch_size: int = 1 << 16,
                         broadcast_limit: int | None = None,
                         num_partitions: int = 64,
                         _canon=None):
    """-> Dataset (v, triangles) for every vertex in at least one
    triangle — the per-vertex refinement of ``triangle_count`` (local
    clustering coefficient's numerator; a standard link-spam /
    community signal).  Same dual-tier dispatch as the total count:
    at or under the broadcast limit the oriented CSR ships once via
    ``ray.put`` and a vertex-range scan emits sparse per-vertex
    partials; above it the all-shuffle wedge join runs with the wedge
    CENTER carried through the join, the closed rows explode into
    their three corners, and a coarse hash aggregate sums per vertex
    (nothing O(V) on the driver at either tier)."""
    import ray
    import ray.data as rd

    from ..stages.agg import coarse_agg

    n = num_vertices
    limit = BROADCAST_EDGE_LIMIT if broadcast_limit is None else broadcast_limit
    canon = (_canon if _canon is not None
             else _canonicalize(edges_ds).materialize())
    if canon.count() > limit or n >= (1 << 31):
        return _per_vertex_triangles_shuffle(canon, num_partitions)
    t = pa.concat_tables(
        list(canon.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    ) if canon.count() else pa.table({"src": pa.array([], pa.int64()),
                                      "dst": pa.array([], pa.int64())})
    lo = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    hi = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    empty = pa.table({"v": pa.array([], pa.int64()),
                      "triangles": pa.array([], pa.int64())})
    if len(lo) == 0:
        return rd.from_arrow(empty)
    deg = np.bincount(lo, minlength=n) + np.bincount(hi, minlength=n)
    key_lo = deg[lo] * (n + 1) + lo
    key_hi = deg[hi] * (n + 1) + hi
    fwd = key_lo < key_hi
    a = np.where(fwd, lo, hi)
    b = np.where(fwd, hi, lo)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, a + 1, 1)
    indptr = np.cumsum(indptr)
    packed = np.sort((a << np.int64(31)) | b)
    state_ref = ray.put((indptr, b, packed))

    def count_batch(batch: dict) -> pa.Table:
        indptr_, nbrs, packed_ = ray.get(state_ref)
        cs, us, ws = [], [], []
        for v in batch["id"]:
            s, e = indptr_[v], indptr_[v + 1]
            if e - s < 2:
                continue
            nb = nbrs[s:e]
            iu, iw = np.triu_indices(e - s, 1)
            cs.append(np.full(len(iu), v, dtype=np.int64))
            us.append(nb[iu])
            ws.append(nb[iw])
        if not cs:
            return empty
        c = np.concatenate(cs)
        u = np.concatenate(us)
        w = np.concatenate(ws)
        p1 = (u << np.int64(31)) | w
        p2 = (w << np.int64(31)) | u
        i1 = np.searchsorted(packed_, p1)
        i2 = np.searchsorted(packed_, p2)
        m1 = (i1 < len(packed_)) & (packed_[np.minimum(i1, len(packed_) - 1)] == p1)
        closed = m1 | ((i2 < len(packed_))
                       & (packed_[np.minimum(i2, len(packed_) - 1)] == p2))
        if not closed.any():
            return empty
        corners = np.concatenate([c[closed], u[closed], w[closed]])
        cnt = np.bincount(corners)
        vs = np.flatnonzero(cnt)
        return pa.table({"v": pa.array(vs, pa.int64()),
                         "triangles": pa.array(cnt[vs], pa.int64())})

    partials = rd.range(n).map_batches(count_batch, batch_format="numpy",
                                       batch_size=batch_size)
    return coarse_agg(partials, ["v"], [("triangles", "sum", "triangles")])


def _per_vertex_triangles_shuffle(canon, num_partitions: int):
    """All-shuffle per-vertex tier: the wedge sweep of
    ``triangle_count_shuffle`` with the wedge center carried through
    the closing-edge join; closed rows explode into three corner rows
    and a coarse aggregate counts per vertex."""
    from ..stages.agg import coarse_agg

    # reuse the orientation machinery by re-running the degree +
    # orient steps of the shuffle engine on the canonical edges
    oriented = _orient_shuffle(canon, num_partitions)

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["src"].to_numpy(zero_copy_only=False) % num_partitions
        return batch.append_column("part", pa.array(part, pa.int64()))

    def wedges(t: pa.Table) -> pa.Table:
        a = t["src"].to_numpy(zero_copy_only=False)
        b = t["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        ends = np.r_[starts[1:], len(a)]
        out_c, out_u, out_w = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            iu, iw = np.triu_indices(m, 1)
            out_c.append(np.full(len(iu), a[s], dtype=np.int64))
            out_u.append(b[s:e][iu])
            out_w.append(b[s:e][iw])
        if not out_u:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        c = np.concatenate(out_c)
        u = np.concatenate(out_u)
        w = np.concatenate(out_w)
        # closing edge may be oriented either way: emit both, center kept
        return pa.table({
            "src": pa.array(np.concatenate([u, w]), pa.int64()),
            "dst": pa.array(np.concatenate([w, u]), pa.int64()),
            "c": pa.array(np.concatenate([c, c]), pa.int64()),
        })

    wedge_ds = (
        oriented.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedges, batch_format="pyarrow")
        .materialize()
    )
    import ray.data as rd

    empty = pa.table({"v": pa.array([], pa.int64()),
                      "triangles": pa.array([], pa.int64())})
    nw = wedge_ds.count()
    if nw == 0:
        return rd.from_arrow(empty)
    join_parts = max(1, min(num_partitions, nw // 4096 + 1))
    closed = wedge_ds.join(oriented, join_type="inner",
                           num_partitions=join_parts, on=("src", "dst"))

    def corners(batch: pa.Table) -> pa.Table:
        v = np.concatenate([
            batch["c"].to_numpy(zero_copy_only=False),
            batch["src"].to_numpy(zero_copy_only=False),
            batch["dst"].to_numpy(zero_copy_only=False),
        ])
        return pa.table({"v": pa.array(v, pa.int64())})

    corner_ds = closed.map_batches(corners, batch_format="pyarrow")
    return coarse_agg(corner_ds, ["v"], [("v", "count", "triangles")])


def clustering_coefficients(edges_ds, num_vertices: int,
                            batch_size: int = 1 << 16,
                            broadcast_limit: int | None = None,
                            num_partitions: int = 64):
    """-> Dataset ``(v, deg, triangles, lcc_nano)`` over every vertex
    with >= 1 edge in the canonical simple graph: the LOCAL CLUSTERING
    COEFFICIENT (Watts & Strogatz 1998) ``2*tri / (deg*(deg-1))``,
    shipped as INTEGER nano-units via floor division (identical in
    numpy and SQL, so values are hash-exact vs the DuckDB oracle —
    same contract as ``jaccard_related_topk``).  Vertices with
    ``deg < 2`` score 0; isolated vertices never appear (no edge rows
    to derive them from — the oracle applies the same domain).

    Shape: NO join.  Degree partials ``(v, deg, 0)`` stream off the
    canonical edges, the sparse per-vertex triangle rows re-emit as
    ``(v, 0, triangles)``, and ONE ``coarse_agg`` over the union sums
    both columns — fully distributed, nothing O(V) on the driver, and
    the triangle side reuses ``per_vertex_triangles``'s dual-tier
    dispatch on the SAME materialized canonical edge set.

    Overflow honesty at web scale: ``2*tri*1e9`` exceeds int64 once
    ``tri > ~4.6e9`` (a vertex whose neighborhood closes billions of
    wedges).  The vectorized int64 path covers everything below that;
    the rare hub rows fall back to exact Python big-int division, so
    results stay exact instead of silently wrapping.  The SQL oracle
    computes in HUGEINT (int128) for the same reason."""
    from ..stages.agg import coarse_agg

    canon = _canonicalize(edges_ds).materialize()
    tri = per_vertex_triangles(edges_ds, num_vertices,
                               batch_size=batch_size,
                               broadcast_limit=broadcast_limit,
                               num_partitions=num_partitions,
                               _canon=canon)

    def deg_partial(b: pa.Table) -> pa.Table:
        v = np.concatenate([b["src"].to_numpy(zero_copy_only=False),
                            b["dst"].to_numpy(zero_copy_only=False)])
        vs, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vs, pa.int64()),
                         "deg": pa.array(cnt, pa.int64()),
                         "triangles": pa.array(
                             np.zeros(len(vs), dtype=np.int64), pa.int64())})

    def tri_rows(b: pa.Table) -> pa.Table:
        return pa.table({"v": b["v"],
                         "deg": pa.array(
                             np.zeros(b.num_rows, dtype=np.int64), pa.int64()),
                         "triangles": b["triangles"]})

    merged = coarse_agg(
        canon.map_batches(deg_partial, batch_format="pyarrow").union(
            tri.map_batches(tri_rows, batch_format="pyarrow")),
        ["v"], [("deg", "sum", "deg"), ("triangles", "sum", "triangles")])

    _NANO = 1_000_000_000
    _SAFE_TRI = ((1 << 63) - 1) // (2 * _NANO)  # int64-safe numerator bound

    def finalize(t: pa.Table) -> pa.Table:
        deg = t["deg"].to_numpy(zero_copy_only=False)
        tri_ = t["triangles"].to_numpy(zero_copy_only=False)
        denom = deg * (deg - 1)
        lcc = np.where(denom >= 2,
                       (2 * np.minimum(tri_, _SAFE_TRI) * _NANO)
                       // np.maximum(denom, 1), 0)
        big = tri_ > _SAFE_TRI  # exact big-int fallback, vanishingly rare
        if big.any():
            for i in np.flatnonzero(big):
                lcc[i] = (2 * int(tri_[i]) * _NANO) // int(denom[i])
        return pa.table({"v": t["v"], "deg": t["deg"],
                         "triangles": t["triangles"],
                         "lcc_nano": pa.array(lcc, pa.int64())})

    return merged.map_batches(finalize, batch_format="pyarrow")


def global_clustering(edges_ds, num_vertices: int,
                      num_partitions: int = 64) -> pa.Table:
    """One-row graph diagnostic: TRANSITIVITY (3*triangles / wedges,
    the global clustering coefficient) and the network-average local
    coefficient (mean of ``lcc`` over vertices with >= 1 edge, deg<2
    counting 0 — the Watts-Strogatz average), both as integer
    nano-units.  Wedges = sum over vertices of C(deg, 2).

    Reduction shape: the per-vertex table collapses to one partial row
    per block (sum_lcc, sum_wedges, sum_tri, n) — driver work is
    summing a handful of int rows with PYTHON ints (arbitrary
    precision, so the 3*T*1e9 numerator can't overflow at any scale)."""
    lcc = clustering_coefficients(edges_ds, num_vertices,
                                  num_partitions=num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        deg = t["deg"].to_numpy(zero_copy_only=False)
        tri_ = t["triangles"].to_numpy(zero_copy_only=False)
        lc = t["lcc_nano"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "wedges": pa.array([int((deg * (deg - 1) // 2).sum())], pa.int64()),
            "tri3": pa.array([int(tri_.sum())], pa.int64()),
            "lcc_sum": pa.array([int(lc.sum())], pa.int64()),
        })

    rows = lcc.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(int(r["n"]) for r in rows)
    wedges = sum(int(r["wedges"]) for r in rows)
    tri3 = sum(int(r["tri3"]) for r in rows)  # 3 * n_triangles (corner sum)
    lcc_sum = sum(int(r["lcc_sum"]) for r in rows)
    trans = (tri3 * 1_000_000_000) // wedges if wedges else 0
    avg = lcc_sum // n if n else 0
    return pa.table({
        "n_vertices": pa.array([n], pa.int64()),
        "n_wedges": pa.array([wedges], pa.int64()),
        "n_triangles": pa.array([tri3 // 3], pa.int64()),
        "transitivity_nano": pa.array([trans], pa.int64()),
        "avg_lcc_nano": pa.array([avg], pa.int64()),
    })
