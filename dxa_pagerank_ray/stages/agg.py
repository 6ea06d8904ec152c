"""High-cardinality group aggregation.

Ray Data's ``groupby(keys).aggregate(...)`` runs a global sort-based
aggregate; with key cardinality approaching row count it degenerates
into one long single-core reduce (measured on this engine: >25 min for
a 2-key distinct over E=256M edges, >10 min for a 1-key count over 32M
vertices — both replaced, both previously fine at sf0.1 which is why
round 1 shipped them).

``coarse_agg`` keeps the same semantics with a scale-stable shape:

1. map-side pre-combine per batch with Arrow's C++ hash aggregation
   (``pa.Table.group_by``) — no shuffle;
2. ONE coarse integer partition key (``hash(keys[0]) % G``, G derived
   from input size) — a small-cardinality sort instead of a key-space
   sort;
3. per-partition final combine, again Arrow hash aggregation (millions
   of groups per partition are fine in C++).

Partitioning assumption: all rows of one key land in one coarse
partition (guaranteed — the partition is a function of ``keys[0]``;
callers must put the highest-cardinality column first).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..context import derive_num_groups, estimate_size_bytes

# combiner for each partial kind: counts combine by SUM
_COMBINE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

# Inputs whose metadata-estimated size fits ONE coarse group take a
# fast path: map-side partials -> repartition(1) -> one final combine.
# Ray's sort-shuffle has seconds of fixed cost (sampling + G x blocks
# exchange tasks) that dominates small inputs — measured 3.0s -> 1.0s
# on the 1.5 MB sf0.1 documents table; at scale the estimate exceeds
# the threshold and the general coarse-partition path is unchanged.
_ONE_GROUP_BYTES = 64 << 20


def _fits_one_group(ds) -> bool:
    est = estimate_size_bytes(ds)
    return est is not None and est <= _ONE_GROUP_BYTES


def _part_for(col: pa.ChunkedArray | pa.Array, G: int) -> np.ndarray:
    if pa.types.is_integer(col.type):
        k = col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return (k % np.int64(G) + np.int64(G)) % np.int64(G)
    from .ids import hash64

    return hash64(col) % np.int64(G)


def _group_combine(t: pa.Table, keys: list[str], specs) -> pa.Table:
    """Arrow hash-agg ``t`` by ``keys``; specs = [(in_col, kind, out)].
    Output columns: keys + outs, in that order."""
    agg = [(c, _COMBINE[kind]) for c, kind, _ in specs]
    g = t.group_by(keys).aggregate(agg)
    # pyarrow names results f"{col}_{fn}"; rebuild with stable names
    cols = {k: g[k] for k in keys}
    for c, kind, out in specs:
        cols[out] = g[f"{c}_{_COMBINE[kind]}"]
    return pa.table(cols)


def coarse_agg(ds, keys: list[str], specs, num_groups: int | None = None):
    """``SELECT keys, agg(col) AS out GROUP BY keys`` for
    HIGH-CARDINALITY keys.  ``specs``: list of ``(col, kind, out)``
    with kind in sum|min|max|count (col ignored for count)."""
    small = num_groups is None and _fits_one_group(ds)
    G = 1 if small else (num_groups or derive_num_groups(ds))
    partial_specs = [(out, kind, out) for _, kind, out in specs]

    def partial(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k] for k in keys}
        for c, kind, out in specs:
            cols[out] = (
                pa.array(np.ones(batch.num_rows, dtype=np.int64))
                if kind == "count" else batch[c]
            )
        g = _group_combine(pa.table(cols), keys, partial_specs)
        if small:
            return g
        return g.append_column(
            "part", pa.array(_part_for(g[keys[0]], G), pa.int64())
        )

    def combine(t: pa.Table) -> pa.Table:
        if not small:
            t = t.drop_columns(["part"])
        return _group_combine(t, keys, partial_specs)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if small:
        return partials.repartition(1) \
            .map_batches(combine, batch_format="pyarrow", batch_size=None)
    return partials.groupby("part").map_groups(combine, batch_format="pyarrow")


def coarse_distinct(ds, keys: list[str], num_groups: int | None = None):
    """Exact DISTINCT on ``keys`` at any cardinality (same shape)."""
    small = num_groups is None and _fits_one_group(ds)
    G = 1 if small else (num_groups or derive_num_groups(ds))

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.table({k: batch[k] for k in keys}).group_by(keys).aggregate([])
        if small:
            return g
        return g.append_column(
            "part", pa.array(_part_for(g[keys[0]], G), pa.int64())
        )

    def combine(t: pa.Table) -> pa.Table:
        if not small:
            t = t.drop_columns(["part"])
        return t.group_by(keys).aggregate([])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if small:
        return partials.repartition(1) \
            .map_batches(combine, batch_format="pyarrow", batch_size=None)
    return partials.groupby("part").map_groups(combine, batch_format="pyarrow")


# driver-side histogram bound for ``exact_quantiles``: value-counts
# results above this row count switch to the iterative range-narrowing
# tier instead of collecting an unbounded histogram on the driver.
QUANTILE_HIST_LIMIT = 1 << 20

# buckets per narrowing pass: log_B(2^63) passes bound the scan count
# (4096 -> <= 6 full passes over the column for any int64 range).
_NARROW_BUCKETS = 4096


def _check_pcts(pcts: list[int]) -> None:
    bad = [p for p in pcts if not (1 <= int(p) <= 100)]
    if bad:
        raise ValueError(f"percentiles must be integers in [1, 100], "
                         f"got {bad}")


def _quantiles_narrowing(ds, col: str, pcts: list[int]) -> pa.Table:
    """Range-narrowing exact quantiles for UNBOUNDED-cardinality int64
    columns: no per-value histogram ever exists — each pass buckets
    the active range of every percentile into ``_NARROW_BUCKETS``
    equal-width buckets, one distributed count pass serves all
    percentiles at once, and each percentile recurses into the bucket
    containing its rank.  Width-1 buckets terminate (the bucket index
    IS the value), so any int64 column finishes in <= ~6 scans.
    Driver state per pass: ``len(pcts) * _NARROW_BUCKETS`` counts."""

    def mm_partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"mn": pa.array([int(v.min())], pa.int64()),
                         "mx": pa.array([int(v.max())], pa.int64()),
                         "n": pa.array([len(v)], pa.int64())})

    mn, mx, n = None, None, 0
    for b in ds.map_batches(mm_partial, batch_format="pyarrow") \
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        for i in range(b.num_rows):
            mn = (int(b["mn"][i].as_py()) if mn is None
                  else min(mn, int(b["mn"][i].as_py())))
            mx = (int(b["mx"][i].as_py()) if mx is None
                  else max(mx, int(b["mx"][i].as_py())))
            n += int(b["n"][i].as_py())
    if n == 0:
        return pa.table({"pct": pa.array([], pa.int64()),
                         "value": pa.array([], pa.int64())})
    if mx - mn >= (1 << 62):
        raise NotImplementedError(
            "range-narrowing quantiles need the value span < 2^62 "
            "(int64 bucket arithmetic); rescale the column first")
    K = len(pcts)
    ranks = [min(n, max(1, (int(p) * n + 99) // 100)) for p in pcts]
    lo = [mn] * K          # per-pct active range [lo, hi]
    hi = [mx] * K
    below = [0] * K        # count of rows < lo[k]
    value = [None] * K
    while any(v is None for v in value):
        active = [k for k in range(K) if value[k] is None]
        edges = []  # (k, lo, width) — shipped in the task closure
        for k in active:
            rng = hi[k] - lo[k] + 1
            width = -(-rng // _NARROW_BUCKETS)  # ceil
            edges.append((k, lo[k], hi[k], width))

        def bucket_partial(batch: pa.Table, edges=tuple(edges)) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            ks, bs, cs = [], [], []
            for k, lo_k, hi_k, width in edges:
                sel = v[(v >= lo_k) & (v <= hi_k)]
                if len(sel) == 0:
                    continue
                bkt = (sel - lo_k) // width
                cnt = np.bincount(bkt)
                nz = np.flatnonzero(cnt)
                ks.append(np.full(len(nz), k, dtype=np.int64))
                bs.append(nz.astype(np.int64))
                cs.append(cnt[nz].astype(np.int64))
            if not ks:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            return pa.table({"k": pa.array(np.concatenate(ks), pa.int64()),
                             "b": pa.array(np.concatenate(bs), pa.int64()),
                             "c": pa.array(np.concatenate(cs), pa.int64())})

        counts = {(k, 0): 0 for k in active}
        for t in ds.map_batches(bucket_partial, batch_format="pyarrow") \
                .iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            kk = t["k"].to_numpy(zero_copy_only=False)
            bb = t["b"].to_numpy(zero_copy_only=False)
            cc = t["c"].to_numpy(zero_copy_only=False)
            for i in range(len(kk)):
                key = (int(kk[i]), int(bb[i]))
                counts[key] = counts.get(key, 0) + int(cc[i])
        for k, lo_k, hi_k, width in edges:
            need = ranks[k] - below[k]
            acc = 0
            nb = (hi_k - lo_k) // width + 1
            for j in range(nb):
                c = counts.get((k, j), 0)
                if acc + c >= need:
                    below[k] += acc
                    lo[k] = lo_k + j * width
                    hi[k] = min(hi_k, lo_k + (j + 1) * width - 1)
                    if width == 1:
                        value[k] = lo[k]
                    break
                acc += c
            else:  # pragma: no cover - rank always lands in a bucket
                raise AssertionError("rank not found in bucket scan")
    return pa.table({"pct": pa.array([int(p) for p in pcts], pa.int64()),
                     "value": pa.array([int(v) for v in value],
                                       pa.int64())})


def exact_quantiles(ds, col: str, pcts: list[int],
                    num_groups: int | None = None,
                    hist_limit: int = QUANTILE_HIST_LIMIT) -> pa.Table:
    """EXACT order statistics of an int64 column, distributed: the
    value at 1-based rank ``min(n, (p*n + 99) // 100)`` (integer-ceil
    of p/100*n — pure integer arithmetic, so the definition is
    bit-identical in numpy and SQL; no float rounding at exact
    boundaries).  ``pcts`` must lie in [1, 100] (validated — rank is
    additionally clamped to n as belt-and-braces).

    Shape: one distributed value-counts pass (``coarse_agg`` count per
    value — map-side combine first, so each block ships at most its
    DISTINCT values), then the (value, count) histogram collects on
    the driver for a cumsum rank scan.  The histogram is bounded by
    the column's distinct-value count, not the row count — for
    bounded-domain columns (lengths, scores, degrees) that is
    thousands of rows at any data scale.  A column whose distinct
    count exceeds ``hist_limit`` (guard: the histogram's own
    distributed count, checked BEFORE anything lands on the driver)
    switches to the iterative range-narrowing tier
    (``_quantiles_narrowing``): <= ~6 additional full scans, O(1)
    driver memory, same exact semantics — so an unbounded-cardinality
    column can never collect an unbounded histogram.

    Returns ``(pct:int64, value:int64)`` sorted by pct.
    """
    _check_pcts(pcts)
    hist_ds = coarse_agg(ds, [col], [(col, "count", "cnt")],
                         num_groups=num_groups).materialize()
    if hist_ds.count() > hist_limit:
        return _quantiles_narrowing(ds, col, pcts)
    empty = pa.table({col: pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
    hist = pa.concat_tables(
        [empty] + list(hist_ds.iter_batches(batch_size=1 << 20,
                                            batch_format="pyarrow"))
    )
    vals = hist[col].to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = hist["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    out_p, out_v = [], []
    for p in pcts:
        if n == 0:
            continue
        rank = min(n, max(1, (p * n + 99) // 100))
        i = int(np.searchsorted(cum, rank))
        out_p.append(int(p))
        out_v.append(int(vals[i]))
    return pa.table({"pct": pa.array(out_p, pa.int64()),
                     "value": pa.array(out_v, pa.int64())})


def exact_quantiles_by_group(ds, group_col: str, col: str,
                             pcts: list[int],
                             num_groups: int | None = None) -> pa.Table:
    """``exact_quantiles`` per group: one distributed (group, value)
    count pass, then the per-group cumsum rank scan on the driver.
    Same bounded-domain contract as the ungrouped form — the histogram
    is |groups| x |distinct values|, not the row count.  Group keys
    must be NON-NULL (validated loudly: a None key would become an
    object array and break the lexsort) and ``pcts`` must lie in
    [1, 100].  Returns ``(group_col, pct, value)`` sorted by
    (group, pct)."""
    _check_pcts(pcts)
    # value column FIRST in the key list: the coarse partition hashes
    # keys[0], and the group column (e.g. lang) is low-cardinality —
    # partitioning on it would cap parallelism at |groups|
    hist_ds = coarse_agg(ds, [col, group_col], [(col, "count", "cnt")],
                         num_groups=num_groups)
    parts = [b for b in hist_ds.iter_batches(batch_size=1 << 20,
                                             batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        return pa.table({group_col: pa.array([], pa.string()),
                         "pct": pa.array([], pa.int64()),
                         "value": pa.array([], pa.int64())})
    hist = pa.concat_tables(parts)
    if hist[group_col].null_count:
        raise ValueError(
            f"exact_quantiles_by_group: NULL values in group column "
            f"{group_col!r} — fill or filter them first")
    keys = np.asarray(hist[group_col].to_pylist())
    vals = hist[col].to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = hist["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((vals, keys))
    keys, vals, cnts = keys[order], vals[order], cnts[order]
    b = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    ends = np.r_[b[1:], len(keys)]
    out_g, out_p, out_v = [], [], []
    for gi in range(len(b)):
        lo, hi = int(b[gi]), int(ends[gi])
        cum = np.cumsum(cnts[lo:hi])
        n = int(cum[-1])
        for p in pcts:
            rank = min(n, max(1, (p * n + 99) // 100))
            i = int(np.searchsorted(cum, rank))
            out_g.append(keys[lo])
            out_p.append(int(p))
            out_v.append(int(vals[lo + i]))
    return pa.table({group_col: pa.array(out_g, pa.string()),
                     "pct": pa.array(out_p, pa.int64()),
                     "value": pa.array(out_v, pa.int64())})


def coarse_topk(ds, group_col: str, order_col: str, id_col: str,
                k: int, num_groups: int | None = None):
    """Distributed TOP-K PER GROUP (the "3 longest docs per language" /
    "best pages per host" shape).  Top-k is ALGEBRAIC — the top-k of a
    union is the top-k of the partial top-ks — so the scale-stable
    form mirrors ``coarse_agg``: (1) map-side per-batch top-k per
    group (bounds every batch's output to k rows per group seen, no
    shuffle); (2) ONE coarse shuffle on ``hash(group_col) % G``;
    (3) per-partition final top-k.  Whole groups never move — only
    k-row partials do, which is what survives a 100-TB corpus with
    hot groups.

    Ordering contract (mirrored by a SQL ``row_number() OVER
    (PARTITION BY group ORDER BY order_col DESC, id_col ASC)``):
    ``order_col`` DESC, ``id_col`` ASC tiebreak — deterministic at any
    partitioning.  ``order_col`` must be integer; ``id_col`` may be
    integer OR string (ASCII byte order == DuckDB binary collation;
    its type is preserved in the output).  Returns (group_col,
    id_col, order_col, rank)."""
    small = num_groups is None and _fits_one_group(ds)
    G = 1 if small else (num_groups or derive_num_groups(ds))

    def topk(t: pa.Table, with_part: bool) -> pa.Table:
        # group by per-batch dictionary CODES (string groups stay in
        # C kernels; any consistent order groups equal keys — only
        # the within-group order is contractual)
        gcol = t[group_col].combine_chunks() if isinstance(
            t[group_col], pa.ChunkedArray) else t[group_col]
        import pyarrow.compute as pc

        codes = pc.dictionary_encode(gcol)
        if isinstance(codes, pa.ChunkedArray):  # pragma: no cover
            codes = codes.combine_chunks()
        gc = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[order_col].to_numpy(zero_copy_only=False)
        i = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, -v, gc))
        g = gcol.take(pa.array(order, pa.int64()))
        gc, v, i = gc[order], v[order], i[order]
        starts = np.r_[True, gc[1:] != gc[:-1]] if len(gc) else \
            np.array([], dtype=bool)
        # rank within group = index - index of group start
        start_idx = np.maximum.accumulate(
            np.where(starts, np.arange(len(gc)), 0))
        rank = np.arange(len(gc)) - start_idx
        keep = rank < k
        gk = g.filter(pa.array(keep))
        out = {group_col: gk,
               id_col: pa.array(i[keep],
                                type=t.schema.field(id_col).type),
               order_col: pa.array(v[keep], pa.int64()),
               "rank": pa.array(rank[keep] + 1, pa.int64())}
        if with_part:
            out["part"] = pa.array(
                _part_for(pa.chunked_array([gk]), G), pa.int64())
        return pa.table(out)

    def partial(b: pa.Table) -> pa.Table:
        return topk(b, with_part=not small)

    def combine(t: pa.Table) -> pa.Table:
        if not small:
            t = t.drop_columns(["part"])
        return topk(t, with_part=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if small:
        return partials.repartition(1).map_batches(
            combine, batch_format="pyarrow", batch_size=None)
    return partials.groupby("part").map_groups(
        combine, batch_format="pyarrow")
