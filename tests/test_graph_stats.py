"""Graph diagnostic statistics (assortativity moments, reciprocity) vs
brute-force numpy oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dxa_pagerank_ray.pipelines.graph_stats import (
    assortativity_from_moments,
    degree_moment_sums,
    reciprocity_counts,
)


def _ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ).materialize()


def _dedup(src, dst):
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    keep = pairs[:, 0] != pairs[:, 1]
    return pairs[keep, 0], pairs[keep, 1]


def _moments_oracle(src, dst):
    from collections import Counter

    od = Counter(src.tolist())
    ind = Counter(dst.tolist())
    sd = np.array([od[s] for s in src.tolist()], dtype=np.int64)
    dd = np.array([ind[d] for d in dst.tolist()], dtype=np.int64)
    return {"n_edges": len(src), "sum_sd": int(sd.sum()),
            "sum_dd": int(dd.sum()), "sum_sd2": int((sd * sd).sum()),
            "sum_dd2": int((dd * dd).sum()),
            "sum_cross": int((sd * dd).sum())}, sd, dd


@pytest.mark.parametrize("seed", [2, 17])
@pytest.mark.parametrize("num_groups", [1, 4])
def test_degree_moments_exact(seed, num_groups):
    rng = np.random.default_rng(seed)
    src, dst = _dedup(rng.integers(0, 50, 800), rng.integers(0, 50, 800))
    got = degree_moment_sums(_ds(src, dst), num_groups=num_groups)
    exp, sd, dd = _moments_oracle(src, dst)
    assert {c: int(got[c][0].as_py()) for c in got.column_names} == exp
    # the closed-form r equals numpy's Pearson on the per-edge pairs
    r = assortativity_from_moments(got)
    np.testing.assert_allclose(r, np.corrcoef(sd, dd)[0, 1], atol=1e-12)


def test_degree_moments_paths_agree():
    """Broadcast (small degree tables) and distributed (cogroup joins,
    forced with broadcast_limit=0) paths return identical moments."""
    rng = np.random.default_rng(4)
    src, dst = _dedup(rng.integers(0, 40, 500), rng.integers(0, 40, 500))
    ds = _ds(src, dst)
    bc = degree_moment_sums(ds, num_groups=2)
    dist = degree_moment_sums(ds, num_groups=2, broadcast_limit=0)
    assert bc.to_pydict() == dist.to_pydict()


def test_assortativity_known_sign():
    """Edges from low-out-degree sources to a shared high-in-degree
    hub plus one high-out-degree source to fresh targets — construct a
    case with a known NEGATIVE correlation (hub source's targets have
    indegree 1)."""
    src = np.r_[np.zeros(10, dtype=np.int64), [20, 21, 22]]
    dst = np.r_[np.arange(1, 11), [15, 15, 15]]
    m = degree_moment_sums(_ds(src, dst), num_groups=2)
    assert assortativity_from_moments(m) < 0


@pytest.mark.parametrize("num_groups", [1, 4])
def test_reciprocity_exact(num_groups):
    rng = np.random.default_rng(9)
    src, dst = _dedup(rng.integers(0, 25, 700), rng.integers(0, 25, 700))
    got = reciprocity_counts(_ds(src, dst), num_groups=num_groups)
    es = set(zip(src.tolist(), dst.tolist()))
    n_rec = sum((d, s) in es for s, d in es)
    assert int(got["n_edges"][0].as_py()) == len(es)
    assert int(got["n_reciprocal"][0].as_py()) == n_rec
    assert n_rec > 0  # dense enough to actually exercise mutual links


def test_reciprocity_hand_case():
    # 0<->1 mutual, 2->3 one-way
    got = reciprocity_counts(_ds([0, 1, 2], [1, 0, 3]), num_groups=2)
    assert int(got["n_edges"][0].as_py()) == 3
    assert int(got["n_reciprocal"][0].as_py()) == 2


def test_reciprocity_self_loop_counts_reciprocal():
    """A stored self-loop is its own reverse edge — reciprocal, exactly
    as the SQL oracle's self-join counts it (round-4 advice: the engine
    must not silently diverge from the oracle if the dedup contract is
    violated upstream)."""
    # 4->4 self-loop, 0<->1 mutual, 2->3 one-way
    got = reciprocity_counts(_ds([0, 1, 2, 4], [1, 0, 3, 4]), num_groups=2)
    assert int(got["n_edges"][0].as_py()) == 4
    assert int(got["n_reciprocal"][0].as_py()) == 3
