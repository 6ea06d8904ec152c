"""Whole-graph diagnostic statistics over a deduplicated edge Dataset.

Standard first-look numbers over a new crawl's link graph (alongside
``degree_distribution``): degree assortativity (Newman 2002,
"Assortativity mixing in networks" — are high-out-degree pages linking
to high-in-degree pages?) and edge reciprocity (fraction of links whose
reverse link exists — mutual-link density, a link-farm signal).  No
reference counterpart (dxa-pageRank implements only PageRank,
`MainPR.java`).

Both return INTEGER tables so the DuckDB oracles hash-compare exactly:
the assortativity op emits the six raw moment sums of the per-edge
(outdeg(src), indeg(dst)) joint distribution — the Pearson coefficient
is a closed form over them (`assortativity_from_moments`), and keeping
floats out of the driver gate avoids summation-order ulps.  Overflow
bound: moments fit int64 while E * maxdeg^2 < 2^63 (comfortable for
web graphs: 1e12 edges x maxdeg 1e3; pages with 1e6 out-links are cap
candidates long before this bound matters).

Scale shape: degree tables via ``coarse_agg`` (map-side combine, one
coarse shuffle each), degrees attached edge-side with two
``cogroup_attach`` joins (nothing lands on the driver), moment partials
one row per batch, reduced on the driver (O(num_blocks) scalars).
Reciprocity needs ONE coarse shuffle on the unordered endpoint pair and
a vectorized per-partition sweep — no join of the edge table against
itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..context import derive_num_groups
from ..stages.agg import coarse_agg
from ..stages.dedup import cogroup_attach

_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def _moment_row(sd: np.ndarray, dd: np.ndarray) -> pa.Table:
    return pa.table({
        "n_edges": pa.array([len(sd)], pa.int64()),
        "sum_sd": pa.array([int(sd.sum())], pa.int64()),
        "sum_dd": pa.array([int(dd.sum())], pa.int64()),
        "sum_sd2": pa.array([int((sd * sd).sum())], pa.int64()),
        "sum_dd2": pa.array([int((dd * dd).sum())], pa.int64()),
        "sum_cross": pa.array([int((sd * dd).sum())], pa.int64()),
    })


def _collect_degrees(deg_ds, key: str):
    """(sorted keys, degrees) numpy pair of a small degree table."""
    t = pa.concat_tables(list(deg_ds.iter_batches(batch_size=1 << 20,
                                                  batch_format="pyarrow")))
    k = t[key].to_numpy(zero_copy_only=False)
    d = t["deg"].to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="stable")
    return k[order], d[order]


def degree_moment_sums(edges_ds, num_groups: int | None = None,
                       broadcast_limit: int | None = None) -> pa.Table:
    """ONE row ``(n_edges, sum_sd, sum_dd, sum_sd2, sum_dd2, sum_cross)``
    where per edge (u, v): sd = outdeg(u), dd = indeg(v) — the exact
    integer moments of the directed degree-assortativity coefficient.

    Degree tables are |V|-sized: below ``broadcast_limit`` rows they
    ship once via ``ray.put`` and moments come out of a SINGLE edge
    pass (searchsorted lookups, no joins); above it, the two
    ``cogroup_attach`` joins run fully distributed — the same
    size-guard discipline as ``top_customers_by_revenue``.  Callers
    pass a materialized (or otherwise execution-deterministic)
    ``edges_ds`` so the degree tables and the edge pass see identical
    rows."""
    import ray

    from .relational import BROADCAST_ROW_LIMIT

    limit = BROADCAST_ROW_LIMIT if broadcast_limit is None else broadcast_limit
    if num_groups is None:
        num_groups = derive_num_groups(edges_ds)
    od = coarse_agg(edges_ds, ["src"], [("src", "count", "deg")],
                    num_groups=num_groups).materialize()
    ind = coarse_agg(edges_ds, ["dst"], [("dst", "count", "deg")],
                     num_groups=num_groups).materialize()

    if od.count() <= limit and ind.count() <= limit:
        lookup_ref = ray.put((_collect_degrees(od, "src"),
                              _collect_degrees(ind, "dst")))

        def partial(b: pa.Table) -> pa.Table:
            (ok, odeg), (ik, ideg) = ray.get(lookup_ref)
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            # coverage is structural: the degree tables were built from
            # this same edge set, so searchsorted always hits
            sd = odeg[np.searchsorted(ok, s)]
            dd = ideg[np.searchsorted(ik, d)]
            return _moment_row(sd, dd)

        rows = edges_ds.map_batches(partial,
                                    batch_format="pyarrow").take_all()
    else:
        e1 = cogroup_attach(edges_ds, "src", od, "src", "deg", "sd",
                            _EDGE_SCHEMA, pa.int64(), num_groups=num_groups)
        s2 = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                        ("sd", pa.int64())])
        e2 = cogroup_attach(e1, "dst", ind, "dst", "deg", "dd",
                            s2, pa.int64(), num_groups=num_groups)

        def partial(b: pa.Table) -> pa.Table:
            return _moment_row(b["sd"].to_numpy(zero_copy_only=False),
                               b["dd"].to_numpy(zero_copy_only=False))

        rows = e2.map_batches(partial, batch_format="pyarrow").take_all()

    cols = ["n_edges", "sum_sd", "sum_dd", "sum_sd2", "sum_dd2",
            "sum_cross"]
    return pa.table({c: pa.array([sum(int(r[c]) for r in rows)], pa.int64())
                     for c in cols})


def assortativity_from_moments(m: pa.Table) -> float:
    """Pearson r of (outdeg(src), indeg(dst)) over edges, from the
    integer moment row (float math stays OUT of the driver-gate
    comparison)."""
    n, sx, sy, sxx, syy, sxy = (float(m[c][0].as_py()) for c in m.column_names)
    num = n * sxy - sx * sy
    den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    return float(num / den) if den else float("nan")


def _recip_sweep(t: pa.Table) -> pa.Table:
    """One coarse partition of (lo, hi, dir) rows -> one
    (n_edges, n_reciprocal) partial: an edge is reciprocal iff its
    unordered endpoint pair appears in BOTH directions."""
    lo = t["lo"].to_numpy(zero_copy_only=False)
    hi = t["hi"].to_numpy(zero_copy_only=False)
    dr = t["dir"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dr, hi, lo))
    lo, hi, dr = lo[order], hi[order], dr[order]
    b = np.flatnonzero(np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])])
    # a self-loop (lo == hi) is its own reverse edge: reciprocal by
    # definition (and by the SQL oracle's self-join) even though its
    # only stored direction flag is 0
    both = ((np.minimum.reduceat(dr, b) == 0)
            & (np.maximum.reduceat(dr, b) == 1)) | (lo[b] == hi[b])
    sizes = np.diff(np.r_[b, len(lo)])
    return pa.table({
        "n_edges": pa.array([len(lo)], pa.int64()),
        "n_reciprocal": pa.array([int(sizes[both].sum())], pa.int64()),
    })


def reciprocity_counts(edges_ds, num_groups: int | None = None) -> pa.Table:
    """ONE row ``(n_edges, n_reciprocal)`` over a DEDUPLICATED directed
    edge Dataset.  A stored self-loop counts as reciprocal (it is its
    own reverse edge — matching the SQL oracle's self-join), so the
    result does not silently diverge if the deduplicated-input contract
    is ever violated upstream."""
    if num_groups is None:
        num_groups = derive_num_groups(edges_ds)

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        part = ((lo * np.int64(1000003) + hi) % np.int64(num_groups)
                + np.int64(num_groups)) % np.int64(num_groups)
        return pa.table({
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(hi, pa.int64()),
            "dir": pa.array((s > d).astype(np.int64), pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    parts = (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_recip_sweep, batch_format="pyarrow")
    ).take_all()
    return pa.table({
        "n_edges": pa.array(
            [sum(int(r["n_edges"]) for r in parts)], pa.int64()),
        "n_reciprocal": pa.array(
            [sum(int(r["n_reciprocal"]) for r in parts)], pa.int64()),
    })
