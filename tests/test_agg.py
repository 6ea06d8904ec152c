"""coarse_agg / coarse_distinct: small-input fast path vs general path.

The fast path (metadata-estimated input <= one coarse group) skips the
part-key sort entirely — these tests pin that both shapes produce the
same relation, and that the fast path is actually taken for tiny
in-memory inputs.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from dxa_pagerank_ray.stages.agg import (
    _fits_one_group,
    coarse_agg,
    coarse_distinct,
)


def _rows(ds, cols):
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
         if b.num_rows]
    )
    return sorted(zip(*[t[c].to_pylist() for c in cols]))


def _input(n=5000, reps=7):
    rng = np.random.default_rng(11)
    keys = rng.integers(0, n // reps, n)
    vals = rng.integers(0, 1000, n)
    return pa.table({
        "k": pa.array(keys, pa.int64()),
        "v": pa.array(vals, pa.int64()),
    })


def test_coarse_agg_fast_path_matches_general(ray_session):
    t = _input()
    specs = [("v", "sum", "v_sum"), ("v", "min", "v_min"),
             ("v", "count", "n")]
    fast_ds = rd.from_arrow(t).repartition(4)
    assert _fits_one_group(fast_ds)  # tiny input -> fast path taken
    fast = _rows(coarse_agg(fast_ds, ["k"], specs),
                 ["k", "v_sum", "v_min", "n"])
    general = _rows(
        coarse_agg(rd.from_arrow(t).repartition(4), ["k"], specs,
                   num_groups=8),
        ["k", "v_sum", "v_min", "n"])
    assert fast == general
    # spot-check against numpy
    k = t["k"].to_numpy()
    v = t["v"].to_numpy()
    k0 = fast[0][0]
    m = k == k0
    assert fast[0] == (k0, int(v[m].sum()), int(v[m].min()), int(m.sum()))


def test_coarse_distinct_fast_path_matches_general(ray_session):
    t = _input()
    fast = _rows(coarse_distinct(rd.from_arrow(t).repartition(4), ["k", "v"]),
                 ["k", "v"])
    general = _rows(
        coarse_distinct(rd.from_arrow(t).repartition(4), ["k", "v"],
                        num_groups=8),
        ["k", "v"])
    assert fast == general
    assert fast == sorted(set(zip(t["k"].to_pylist(), t["v"].to_pylist())))


def test_exact_quantiles_matches_numpy_order_statistics(ray_session):
    from dxa_pagerank_ray.stages.agg import exact_quantiles

    rng = np.random.default_rng(7)
    # heavy ties + skew: the histogram path must resolve ranks inside
    # runs of equal values
    vals = np.concatenate([
        rng.integers(0, 50, 3000),
        rng.integers(0, 5, 2000),
        np.full(500, 42),
    ]).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    pcts = [1, 10, 25, 50, 75, 90, 99, 100]
    got = exact_quantiles(ds, "x", pcts, num_groups=4)
    s = np.sort(vals)
    n = len(s)
    exp = {p: int(s[max(1, (p * n + 99) // 100) - 1]) for p in pcts}
    assert got.num_rows == len(pcts)
    for p, v in zip(got["pct"].to_pylist(), got["value"].to_pylist()):
        assert v == exp[p], (p, v, exp[p])


def test_exact_quantiles_empty_and_single(ray_session):
    from dxa_pagerank_ray.stages.agg import exact_quantiles

    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    assert exact_quantiles(empty, "x", [50]).num_rows == 0
    one = rd.from_arrow(pa.table({"x": pa.array([9], pa.int64())}))
    got = exact_quantiles(one, "x", [1, 50, 100])
    assert got["value"].to_pylist() == [9, 9, 9]


def test_exact_quantiles_narrowing_tier_matches_histogram_path(ray_session):
    """High-cardinality guard (r4 verdict item 8): forcing hist_limit
    below the distinct count switches to the range-narrowing tier,
    which must return the SAME exact order statistics (incl. negative
    values, duplicates, a huge-span outlier, and pct=100)."""
    from dxa_pagerank_ray.stages.agg import exact_quantiles

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.integers(-10**12, 10**12, 5000),
        np.repeat(rng.integers(-100, 100, 10), 50),
        np.array([np.iinfo(np.int64).min // 4, np.iinfo(np.int64).max // 4]),
    ]).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())})) \
        .repartition(4).materialize()
    pcts = [1, 7, 50, 93, 100]
    hist = exact_quantiles(ds, "x", pcts, num_groups=4)
    narrow = exact_quantiles(ds, "x", pcts, num_groups=4, hist_limit=10)
    assert hist.to_pydict() == narrow.to_pydict()
    s = np.sort(vals)
    n = len(s)
    for p, v in zip(narrow["pct"].to_pylist(), narrow["value"].to_pylist()):
        assert v == int(s[min(n, max(1, (p * n + 99) // 100)) - 1])


def test_exact_quantiles_narrowing_empty(ray_session):
    from dxa_pagerank_ray.stages.agg import exact_quantiles

    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    assert exact_quantiles(empty, "x", [50], hist_limit=0).num_rows == 0


def test_exact_quantiles_validates_pcts(ray_session):
    import pytest

    from dxa_pagerank_ray.stages.agg import exact_quantiles

    ds = rd.from_arrow(pa.table({"x": pa.array([1, 2, 3], pa.int64())}))
    with pytest.raises(ValueError, match="percentiles"):
        exact_quantiles(ds, "x", [0])
    with pytest.raises(ValueError, match="percentiles"):
        exact_quantiles(ds, "x", [101])


def test_exact_quantiles_by_group_rejects_null_groups(ray_session):
    import pytest

    from dxa_pagerank_ray.stages.agg import exact_quantiles_by_group

    t = pa.table({"g": pa.array(["a", None, "b"], pa.string()),
                  "x": pa.array([1, 2, 3], pa.int64())})
    with pytest.raises(ValueError, match="NULL"):
        exact_quantiles_by_group(rd.from_arrow(t), "g", "x", [50])


def test_coarse_topk_partition_invariance(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dxa_pagerank_ray.stages.agg import coarse_topk

    rows = pa.table({
        "grp": pa.array(["a", "b", "a", "a", "b", "c", "a"], pa.string()),
        "val": pa.array([5, 9, 7, 7, 1, 4, 2], pa.int64()),
        "id": pa.array([10, 20, 30, 40, 50, 60, 70], pa.int64()),
    })

    def run(ds, **kw):
        t = coarse_topk(ds, "grp", "val", "id", k=2, **kw).to_pandas()
        return sorted(map(tuple, t[["grp", "id", "val", "rank"]]
                          .values.tolist()))

    got = run(rd.from_arrow(rows))
    # a: 7@30 then 7@40 (id-asc tiebreak); b: 9@20 then 1@50; c: 4@60
    assert got == [("a", 30, 7, 1), ("a", 40, 7, 2),
                   ("b", 20, 9, 1), ("b", 50, 1, 2),
                   ("c", 60, 4, 1)]
    # invariant to partitioning and to the forced coarse path
    assert run(rd.from_arrow(rows).repartition(4)) == got
    assert run(rd.from_arrow(rows).repartition(3), num_groups=2) == got


def test_coarse_topk_string_ids(ray_session):
    """String id columns (the 'best pages per host' shape): ascending
    codepoint tiebreak, id type preserved, partition-invariant."""
    import pyarrow as pa
    import ray.data as rd

    from dxa_pagerank_ray.stages.agg import coarse_topk

    rows = pa.table({
        "host": pa.array(["h1", "h1", "h1", "h2", "h2"], pa.string()),
        "n": pa.array([7, 7, 9, 3, 3], pa.int64()),
        "url": pa.array(["u/b", "u/a", "u/c", "u/z", "u/y"], pa.string()),
    })

    def run(ds, **kw):
        t = coarse_topk(ds, "host", "n", "url", k=2, **kw)
        pt = pa.concat_tables(t.iter_batches(batch_size=None,
                                             batch_format="pyarrow"))
        assert pt.schema.field("url").type == pa.string()
        return sorted(map(tuple, pt.to_pandas()[
            ["host", "url", "n", "rank"]].values.tolist()))

    got = run(rd.from_arrow(rows))
    assert got == [("h1", "u/a", 7, 2), ("h1", "u/c", 9, 1),
                   ("h2", "u/y", 3, 1), ("h2", "u/z", 3, 2)]
    assert run(rd.from_arrow(rows).repartition(4)) == got
    assert run(rd.from_arrow(rows).repartition(3), num_groups=2) == got
