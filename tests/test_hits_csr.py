"""HITS (hubs & authorities) on the bidirectional CSR shard engine vs
the numpy power-iteration oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dxa_pagerank_ray.oracles.graph_oracles import hits as hits_oracle
from dxa_pagerank_ray.oracles.graph_oracles import salsa as salsa_oracle
from dxa_pagerank_ray.pipelines.hits_csr import HitsCSR


def _ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ).materialize()


def test_hits_known_structure():
    """One hub pointing at three authorities: the hub takes all hub
    mass, the three authorities split authority mass equally."""
    src = np.array([0, 0, 0])
    dst = np.array([1, 2, 3])
    eng = HitsCSR(_ds(src, dst), 4, num_partitions=2, num_actors=2)
    r = eng.run(threshold=1e-12, max_rounds=50)
    eng.shutdown()
    np.testing.assert_allclose(r.hub, [1.0, 0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(
        r.auth, [0, 1 / np.sqrt(3), 1 / np.sqrt(3), 1 / np.sqrt(3)],
        atol=1e-12)


def test_hits_random_vs_numpy_and_shard_invariance():
    rng = np.random.default_rng(17)
    n, m = 300, 2000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    key = np.unique(src[keep] * n + dst[keep])
    src, dst = key // n, key % n
    exp_a, exp_h, exp_rounds, _ = hits_oracle(src, dst, n, 1e-10, 300)
    ds = _ds(src, dst)
    res = {}
    for a in (1, 4):
        eng = HitsCSR(ds, n, num_partitions=8, num_actors=a)
        res[a] = eng.run(threshold=1e-10, max_rounds=300)
        eng.shutdown()
    assert res[1].rounds == exp_rounds
    np.testing.assert_allclose(res[1].auth, exp_a, rtol=0, atol=1e-12)
    np.testing.assert_allclose(res[1].hub, exp_h, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(res[1].auth, res[4].auth)
    np.testing.assert_array_equal(res[1].hub, res[4].hub)
    assert abs(np.sum(res[1].auth ** 2) - 1.0) < 1e-9  # unit L2 norm


# ---- SALSA (degree-normalized, L1) ----


def test_salsa_random_vs_numpy_and_shard_invariance():
    rng = np.random.default_rng(23)
    n, m = 300, 2000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    key = np.unique(src[keep] * n + dst[keep])
    src, dst = key // n, key % n
    exp_a, exp_h, exp_rounds, _ = salsa_oracle(src, dst, n, 1e-10, 300)
    ds = _ds(src, dst)
    res = {}
    for a in (1, 4):
        eng = HitsCSR(ds, n, num_partitions=8, num_actors=a)
        res[a] = eng.run_salsa(threshold=1e-10, max_rounds=300)
        eng.shutdown()
    assert res[1].rounds == exp_rounds
    np.testing.assert_allclose(res[1].auth, exp_a, rtol=0, atol=1e-12)
    np.testing.assert_allclose(res[1].hub, exp_h, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(res[1].auth, res[4].auth)
    np.testing.assert_array_equal(res[1].hub, res[4].hub)
    # the half-step vectors are probability distributions
    assert abs(np.sum(res[1].auth) - 1.0) < 1e-9
    assert abs(np.sum(res[1].hub) - 1.0) < 1e-9


def test_salsa_stationary_is_indegree_proportional():
    """Classic SALSA closed form: within a connected authority graph,
    the stationary authority score of v is indeg(v) / |E|.  Build a
    graph whose authority side is one connected component."""
    # hubs 0..3 each point at a ring of authorities 4..7 with overlap
    src = np.array([0, 0, 1, 1, 2, 2, 3, 3, 0])
    dst = np.array([4, 5, 5, 6, 6, 7, 7, 4, 6])
    n = 8
    eng = HitsCSR(_ds(src, dst), n, num_partitions=4, num_actors=2)
    r = eng.run_salsa(threshold=1e-13, max_rounds=500)
    eng.shutdown()
    ind = np.bincount(dst, minlength=n).astype(float)
    np.testing.assert_allclose(r.auth, ind / ind.sum(), atol=1e-9)
