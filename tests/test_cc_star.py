"""Large-star/small-star contraction CC vs the numpy hash-min oracle —
and the O(log N) round-count evidence on the high-diameter path graph
(the case the hash-min engines document as their weakness)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dxa_pagerank_ray.oracles.graph_oracles import connected_components
from dxa_pagerank_ray.pipelines.cc_star import (
    cc_sizes_star,
    connected_components_star,
)


def _ds(src, dst, parts: int = 4):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ).repartition(parts).materialize()


@pytest.mark.parametrize("seed", [7, 23])
def test_cc_star_random_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    n, m = 500, 900
    src = rng.integers(0, n - 50, m)  # ids in [n-50, n) mostly isolated
    dst = rng.integers(0, n - 50, m)
    exp = connected_components(src, dst, n)
    lab, sz = np.unique(exp, return_counts=True)
    got = cc_sizes_star(_ds(src, dst), n).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    np.testing.assert_array_equal(got["label"].to_numpy(), lab)
    np.testing.assert_array_equal(got["size"].to_numpy(), sz)


def test_cc_star_path_graph_log_rounds():
    """Diameter-(N-1) path: star contraction lands in O(log N) rounds —
    the documented mitigation for the hash-min engines' linear-diameter
    behavior (tests/test_labels_csr.py pins N rounds for the same
    input)."""
    n = 512
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    stars, rounds = connected_components_star(_ds(src, dst), n)
    t = stars.to_pandas()
    assert (t["dst"] == 0).all()
    assert sorted(t["src"].tolist()) == list(range(1, n))
    assert rounds <= 12  # ~log2(512) + small constant


def test_cc_star_multi_group_no_duplicate_star_edges(monkeypatch):
    """Regression (round-4 advice): with G > 1 coarse partitions the
    same star edge (nb, m) can be emitted by two groups in DIFFERENT
    partitions (small-star groups 5 and 6 over {5-0,5-1,6-0,6-1} both
    emit (1,0)); the per-partition dedup misses it, inflating
    cc_sizes_star.  The converged forest must be globally distinct and
    the sizes exact at any G."""
    from dxa_pagerank_ray.pipelines import cc_star as mod

    monkeypatch.setattr(mod, "_coarse_groups", lambda n: 4)
    # the advice's minimal repro plus a random graph, both at G=4
    src = np.array([5, 5, 6, 6], dtype=np.int64)
    dst = np.array([0, 1, 0, 1], dtype=np.int64)
    stars, _ = mod.connected_components_star(_ds(src, dst, parts=3), 7)
    t = stars.to_pandas()
    assert not t.duplicated(["src", "dst"]).any()
    got = mod.cc_sizes_star(_ds(src, dst, parts=3), 7).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    np.testing.assert_array_equal(got["label"].to_numpy(), [0, 2, 3, 4])
    np.testing.assert_array_equal(got["size"].to_numpy(), [4, 1, 1, 1])

    rng = np.random.default_rng(41)
    n, m = 300, 500
    rsrc = rng.integers(0, n, m)
    rdst = rng.integers(0, n, m)
    exp = connected_components(rsrc, rdst, n)
    lab, sz = np.unique(exp, return_counts=True)
    got2 = mod.cc_sizes_star(_ds(rsrc, rdst), n).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    np.testing.assert_array_equal(got2["label"].to_numpy(), lab)
    np.testing.assert_array_equal(got2["size"].to_numpy(), sz)


def test_cc_star_tolerates_duplicates_and_self_loops():
    src = np.array([0, 0, 1, 2, 2, 4])
    dst = np.array([1, 1, 0, 2, 3, 4])  # dup (0,1), both dirs, loops
    got = cc_sizes_star(_ds(src, dst, parts=2), 6).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    # components: {0,1}, {2,3}, {4}, {5}
    np.testing.assert_array_equal(got["label"].to_numpy(), [0, 2, 4, 5])
    np.testing.assert_array_equal(got["size"].to_numpy(), [2, 2, 1, 1])
