"""Co-citation "related pages" over the link graph.

Two pages are co-cited when one source links to both; their co-citation
count (number of common in-neighbors) is the classic relatedness signal
for web graphs (Dean & Henzinger 1999, "Finding Related Pages in the
World Wide Web" — public-literature algorithm; no reference counterpart,
dxa-pageRank implements only PageRank, `MainPR.java`).

Scale shape (same discipline as the LSH pair sweeps in
``stages/dedup.py``):

1. ONE coarse hash-partition shuffle on ``src`` — all out-edges of a
   source land in one partition;
2. per partition: one vectorized lexsort + boundary sweep over every
   source, then ONE repeat/arange pair enumeration across ALL sub-cap
   sources at once — no per-source Python loop (the output is
   pair-volume-sized either way; the enumeration now is too);
3. hub sources above ``max_outdeg`` are DROPPED + logged — the cap is
   part of the operator contract, not a silent truncation: a
   navigation/boilerplate page linking to m pages alone implies
   m(m-1)/2 spurious "related" pairs, so every production co-citation
   system bounds the source fan-out (the SQL oracle applies the same
   ``HAVING count(*) <= max_outdeg`` filter — semantics match by
   construction);
4. pair counting via ``coarse_agg`` (map-side Arrow hash combine, one
   coarse shuffle on ``a``);
5. top-k with a per-partition cut under the final total order
   (count desc, a, b), so the global sort ranks <= blocks*k rows.
"""

from __future__ import annotations

import functools
import logging

import numpy as np
import pyarrow as pa

from ..context import derive_num_groups
from ..stages.agg import coarse_agg

_log = logging.getLogger(__name__)

# One source's pairs are enumerated inside one task: at the cap that is
# ~8.4M pairs (~134 MB of int64 ids) per hub source, the same per-task
# bound as the LSH bucket cap (`dedup._DEFAULT_MAX_BUCKET`).
DEFAULT_MAX_OUTDEG = 4096


def _cocite_sweep(t: pa.Table, max_outdeg: int,
                  ra_nano: bool = False) -> pa.Table:
    """One coarse partition of (src, dst) rows -> co-cited pairs
    (a, b), a < b, one row per (source, pair) incidence.  Expects
    DEDUPLICATED edges (distinct dst per src -> strict a < b).  Pure
    function (module-level so tests can assert the hub bound
    directly).  With ``ra_nano`` each pair row carries
    ``w = 1e9 // outdeg(src)`` — the resource-allocation weight (Zhou,
    Lü & Zhang 2009); the coarse ``src`` partition holds ALL of a
    source's rows, so the group size IS the global degree.

    Pair enumeration is ONE vectorized two-level repeat/arange expansion
    across every sub-cap source at once (no per-source Python loop —
    that loop was the measured constant behind the r4
    link-prediction/resource-allocation timings): level 1 expands one
    row per (source, i) left-member slot, level 2 expands each slot to
    its ``size-1-i`` right members.  Peak memory is a small constant ×
    the pair volume — the same asymptotic footprint the tiled loop had,
    since the output table itself is pair-volume-sized."""
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
    ends = np.r_[starts[1:], len(src)]
    sizes = ends - starts
    cand = np.flatnonzero(sizes >= 2)
    hubs = cand[sizes[cand] > max_outdeg]
    if len(hubs):
        _log.warning(
            "cocitation: dropped %d hub source(s) totalling %d out-edges "
            "(> max_outdeg=%d); pairs co-cited only by boilerplate-degree "
            "sources are not counted — raise max_outdeg to include them",
            len(hubs), int(sizes[hubs].sum()), max_outdeg,
        )
    keep = cand[sizes[cand] <= max_outdeg]
    empty = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    if ra_nano:
        empty["w"] = pa.array([], pa.int64())
    if not len(keep):
        return pa.table(empty)
    m = sizes[keep].astype(np.int64)   # per-source out-degree
    st = starts[keep].astype(np.int64)
    # level 1: one row per (source, i), i = left-member local index in
    # [0, m-1); each row owns cnt = m-1-i right members.
    ni = m - 1
    tot_i = int(ni.sum())
    g_of = np.repeat(np.arange(len(keep), dtype=np.int64), ni)
    i_loc = np.arange(tot_i, dtype=np.int64) - np.repeat(
        np.cumsum(ni) - ni, ni)
    cnt = m[g_of] - 1 - i_loc
    i_glob = st[g_of] + i_loc
    # level 2: expand each slot to its right members j = i+1 .. end-1.
    tot_p = int(cnt.sum())
    j_rel = np.arange(tot_p, dtype=np.int64) - np.repeat(
        np.cumsum(cnt) - cnt, cnt)
    ii = np.repeat(i_glob, cnt)
    jj = ii + 1 + j_rel
    cols = {"a": pa.array(dst[ii], pa.int64()),   # dst sorted per src
            "b": pa.array(dst[jj], pa.int64())}   # -> a < b
    if ra_nano:
        w = np.int64(1_000_000_000) // m
        cols["w"] = pa.array(np.repeat(w[g_of], cnt), pa.int64())
    return pa.table(cols)


def swept_pairs(edges_ds, max_outdeg: int = DEFAULT_MAX_OUTDEG,
                num_groups: int | None = None, ra_nano: bool = False):
    """The MATERIALIZED co-citation pair-incidence dataset: one coarse
    ``src``-hash shuffle, the hub-bounded ``_cocite_sweep`` per
    partition — shared by ``cocitation_counts`` and the
    ``link_prediction_topk`` anti-join fold so the partition math and
    dispatch rationale live in exactly one place.

    MATERIALIZE before any downstream aggregate: the sweep expands
    every degree-d group into d(d-1)/2 pair rows — the one transform
    in this engine whose output size the metadata-only estimate cannot
    predict from the source footprint.  Left lazy, ``coarse_agg``
    would dispatch off the (small) edge-table estimate and run the
    whole pair combine on one core (measured: 2.3s single-task combine
    over 7.1M coupling pairs at sf0.1); forcing a wide combine instead
    penalizes the genuinely-small pair sets (jaccard's forward counts
    paid ~1.8s of sort fixed cost for 18 MB of pairs).  A materialized
    dataset exposes its TRUE bytes, so the dispatch is right on both
    sides — worth the pipeline barrier."""
    if num_groups is None:
        num_groups = derive_num_groups(edges_ds)
    G = num_groups

    def add_part(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (s % np.int64(G) + np.int64(G)) % np.int64(G)
        return pa.table({"src": batch["src"], "dst": batch["dst"],
                         "part": pa.array(part, pa.int64())})

    return (
        edges_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(functools.partial(_cocite_sweep, max_outdeg=max_outdeg,
                                      ra_nano=ra_nano),
                    batch_format="pyarrow")
    ).materialize()


def cocitation_counts(edges_ds, max_outdeg: int = DEFAULT_MAX_OUTDEG,
                      num_groups: int | None = None,
                      ra_nano: bool = False):
    """(a, b, n) co-citation counts over a DEDUPLICATED directed edge
    Dataset — n = number of distinct sources linking to both a and b,
    counting only sources with out-degree <= ``max_outdeg``.  With
    ``ra_nano``: (a, b, ra_nano) resource-allocation sums instead
    (sum over common sources u of ``1e9 // outdeg(u)``)."""
    pairs = swept_pairs(edges_ds, max_outdeg=max_outdeg,
                        num_groups=num_groups, ra_nano=ra_nano)
    if ra_nano:
        return coarse_agg(pairs, ["a", "b"], [("w", "sum", "ra_nano")])
    return coarse_agg(pairs, ["a", "b"], [("a", "count", "n")])


def jaccard_related_topk(edges_ds, k: int = 20,
                         max_outdeg: int = DEFAULT_MAX_OUTDEG,
                         num_groups: int | None = None,
                         broadcast_limit: int | None = None) -> pa.Table:
    """Related pages by JACCARD similarity of in-neighborhoods:
    jac(a, b) = |In(a) ∩ In(b)| / |In(a) ∪ In(b)| — degree-normalized
    co-citation (raw counts over-rank popular pages).  The intersection
    is the hub-bounded co-citation count; the union is
    indeg(a) + indeg(b) - inter.  Scores ship as INTEGER nano-units
    (inter * 1e9 // union — floor division is identical in numpy and
    SQL, so the (jac_nano desc, a, b) total order is hash-exact).

    The |V|-sized in-degree table attaches under the same broadcast
    guard as ``graph_stats.degree_moment_sums``: collected + ray.put
    below ``broadcast_limit`` rows, co-grouped joins above it.

    NOTE: the hub cap applies to the co-citation SOURCES (common
    in-neighbor enumeration), while indeg(a)/indeg(b) count ALL
    in-edges — the oracle applies the same asymmetry."""
    import ray

    from ..stages.dedup import cogroup_attach
    from .relational import BROADCAST_ROW_LIMIT

    limit = BROADCAST_ROW_LIMIT if broadcast_limit is None else broadcast_limit
    counts = cocitation_counts(edges_ds, max_outdeg=max_outdeg,
                               num_groups=num_groups).materialize()
    ind = coarse_agg(edges_ds.map_batches(
        lambda b: pa.table({"v": b["dst"]}), batch_format="pyarrow"),
        ["v"], [("v", "count", "d")]).materialize()

    if ind.count() <= limit:
        t = pa.concat_tables(list(ind.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        key = t["v"].to_numpy(zero_copy_only=False)
        deg = t["d"].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        lookup_ref = ray.put((key[order], deg[order]))

        def attach(b: pa.Table) -> pa.Table:
            kk, dd = ray.get(lookup_ref)
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            da = dd[np.searchsorted(kk, a)]   # coverage structural:
            db = dd[np.searchsorted(kk, bb)]  # pair members are dsts
            return pa.table({"a": b["a"], "b": b["b"], "inter": b["n"],
                             "da": pa.array(da, pa.int64()),
                             "db": pa.array(db, pa.int64())})

        scored = counts.map_batches(attach, batch_format="pyarrow")
    else:
        s1 = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                        ("n", pa.int64())])
        e1 = cogroup_attach(counts, "a", ind, "v", "d", "da",
                            s1, pa.int64(),
                            num_groups=derive_num_groups(counts))
        s2 = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                        ("n", pa.int64()), ("da", pa.int64())])
        e2 = cogroup_attach(e1, "b", ind, "v", "d", "db",
                            s2, pa.int64(),
                            num_groups=derive_num_groups(counts))
        scored = e2.map_batches(
            lambda t: pa.table({"a": t["a"], "b": t["b"],
                                "inter": t["n"], "da": t["da"],
                                "db": t["db"]}),
            batch_format="pyarrow")

    def score_topk(t: pa.Table) -> pa.Table:
        inter = t["inter"].to_numpy(zero_copy_only=False)
        uni = (t["da"].to_numpy(zero_copy_only=False)
               + t["db"].to_numpy(zero_copy_only=False) - inter)
        jac = inter * np.int64(1_000_000_000) // uni
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((b, a, -jac))[:k]
        return pa.table({
            "a": pa.array(a[sel], pa.int64()),
            "b": pa.array(b[sel], pa.int64()),
            "inter": pa.array(inter[sel], pa.int64()),
            "uni": pa.array(uni[sel], pa.int64()),
            "jac_nano": pa.array(jac[sel], pa.int64()),
        })

    rows = scored.map_batches(score_topk, batch_format="pyarrow") \
        .sort(["jac_nano", "a", "b"],
              descending=[True, False, False]).limit(k).take_all()
    cols = ["a", "b", "inter", "uni", "jac_nano"]
    return pa.table({c: pa.array([r[c] for r in rows], pa.int64())
                     for c in cols})


def coupling_topk(edges_ds, k: int = 20,
                  max_outdeg: int = DEFAULT_MAX_OUTDEG,
                  num_groups: int | None = None):
    """Bibliographic coupling (Kessler 1963): top-k page pairs by
    common OUT-neighbor count — exactly co-citation over the REVERSED
    edge set, so the same hub-bounded sweep runs with the cap applied
    to target fan-in (a page cited by everyone creates spurious
    couplings, the mirror of the navigation-hub case)."""

    def rev(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["dst"], "dst": batch["src"]})

    return cocitation_topk(edges_ds.map_batches(rev, batch_format="pyarrow"),
                           k=k, max_outdeg=max_outdeg, num_groups=num_groups)


def cocitation_topk(edges_ds, k: int = 20,
                    max_outdeg: int = DEFAULT_MAX_OUTDEG,
                    num_groups: int | None = None):
    """Top-k co-cited pairs, total order (n desc, a, b) — deterministic
    under ties.  Per-partition cut first, so the final sort ranks
    <= blocks*k candidate rows, never the full pair table.  Returns a
    schema-pinned Arrow table (<= k rows is driver-sized by
    construction; Ray's sort emits column-less empty blocks, so an
    empty Dataset would lose the (a, b, n) schema)."""
    counts = cocitation_counts(edges_ds, max_outdeg=max_outdeg,
                               num_groups=num_groups)

    def local_topk(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((b, a, -n))[:k]
        return t.take(pa.array(sel, pa.int64()))

    pruned = counts.map_batches(local_topk, batch_format="pyarrow")
    rows = pruned.sort(["n", "a", "b"],
                       descending=[True, False, False]).limit(k).take_all()
    return pa.table({
        "a": pa.array([r["a"] for r in rows], pa.int64()),
        "b": pa.array([r["b"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def link_prediction_topk(edges_ds, k: int = 20,
                         max_degree: int = DEFAULT_MAX_OUTDEG,
                         num_groups: int | None = None,
                         score: str = "cn"):
    """Common-neighbors LINK PREDICTION (Liben-Nowell & Kleinberg 2003,
    "The Link Prediction Problem for Social Networks"): top-k NON-edge
    pairs (a < b) by ``|N(a) ∩ N(b)|`` over the UNDIRECTED graph.
    ``score="ra"`` ranks by the RESOURCE-ALLOCATION index instead
    (Zhou, Lü & Zhang 2009: sum over common neighbors u of
    ``1e9 // deg(u)`` in integer nano — degree-discounted common
    neighbors, the strongest of the local similarity indices in their
    benchmark); output column becomes ``ra_nano``.

    Pipeline = three reuses of existing shapes:

    1. symmetrize + distinct (``coarse_distinct`` on both directions)
       — the undirected adjacency, one shuffle;
    2. the hub-bounded co-citation sweep over it: pairs of neighbors
       of every middle vertex u count once per u, so the pair count IS
       the common-neighbor count; vertices above ``max_degree`` are
       dropped under the operator's hub contract (a celebrity node
       implies deg² spurious candidate pairs);
    3. existing edges removed INSIDE the pair-count aggregate: the
       canonical (lo < hi) edge set rides the SAME coarse shuffle as
       the pair incidences, as marker rows ``(a, b, v=0, e=1)`` next
       to pair rows ``(a, b, v=score, e=0)``; the per-key combine
       yields ``(sum v, sum e)`` and keys with ``e > 0`` are dropped —
       the anti-join costs ZERO extra shuffles (the r4 design
       reshuffled the aggregated count table a second time for a
       co-grouped anti-join; folding it removes one all-to-all over
       the largest keyed intermediate, the dominant volume at scale).

    Returns ``(a, b, n)`` Arrow table, total order (n desc, a, b).
    """
    from ..stages.agg import coarse_distinct

    if score not in ("cn", "ra"):
        raise ValueError(f"link_prediction_topk: bad score={score!r}")
    nc = "n" if score == "cn" else "ra_nano"
    if num_groups is None:
        num_groups = derive_num_groups(edges_ds)

    def sym(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({
            "src": pa.array(np.concatenate([s, d]), pa.int64()),
            "dst": pa.array(np.concatenate([d, s]), pa.int64()),
        })

    und = coarse_distinct(
        edges_ds.map_batches(sym, batch_format="pyarrow"), ["src", "dst"],
        num_groups=num_groups,
    ).materialize()

    pairs = swept_pairs(und, max_outdeg=max_degree,
                        num_groups=num_groups, ra_nano=(score == "ra"))

    def mark_pairs(b: pa.Table) -> pa.Table:
        v = b["w"] if score == "ra" else pa.array(
            np.ones(b.num_rows, dtype=np.int64), pa.int64())
        return pa.table({"a": b["a"], "b": b["b"], "v": v,
                         "e": pa.array(np.zeros(b.num_rows, np.int64),
                                       pa.int64())})

    def mark_edges(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s < d  # canonical direction only — und holds both
        lo, hi = s[keep], d[keep]
        return pa.table({"a": pa.array(lo, pa.int64()),
                         "b": pa.array(hi, pa.int64()),
                         "v": pa.array(np.zeros(len(lo), np.int64),
                                       pa.int64()),
                         "e": pa.array(np.ones(len(lo), np.int64),
                                       pa.int64())})

    both = pairs.map_batches(mark_pairs, batch_format="pyarrow").union(
        und.map_batches(mark_edges, batch_format="pyarrow"))
    agg = coarse_agg(both, ["a", "b"],
                     [("v", "sum", nc), ("e", "sum", "e")])

    def drop_edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["e"], 0)).drop_columns(["e"])

    nonedge = agg.map_batches(drop_edges, batch_format="pyarrow")

    def local_topk(t: pa.Table) -> pa.Table:
        n = t[nc].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((b, a, -n))[:k]
        return t.take(pa.array(sel, pa.int64()))

    pruned = nonedge.map_batches(local_topk, batch_format="pyarrow")
    rows = pruned.sort([nc, "a", "b"],
                       descending=[True, False, False]).limit(k).take_all()
    return pa.table({
        "a": pa.array([r["a"] for r in rows], pa.int64()),
        "b": pa.array([r["b"] for r in rows], pa.int64()),
        nc: pa.array([r[nc] for r in rows], pa.int64()),
    })
