"""CSR partition-actor label engine (CC hash-min, label prop) vs the
broadcast engine and the numpy oracles — identical semantics, pinned
execution."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dxa_pagerank_ray.oracles import graph_oracles as oracle
from dxa_pagerank_ray.pipelines.components import connected_components
from dxa_pagerank_ray.pipelines.graph_build import build_link_graph
from dxa_pagerank_ray.pipelines.labelprop import label_propagation
from dxa_pagerank_ray.pipelines.labels_csr import LabelCSR
from dxa_pagerank_ray.pipelines.superstep import undirect
from dxa_pagerank_ray.sources.pages import pages_table

CASES = {
    "two_chains": (np.array([0, 1, 3, 4]), np.array([1, 2, 4, 3]), 6),
    "k3_pendant": (np.array([0, 1, 2, 2, 4, 5, 6]),
                   np.array([1, 2, 0, 3, 5, 6, 4]), 7),
    "star": (np.zeros(5, dtype=np.int64), np.arange(1, 6), 6),
}


def _ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ).materialize()


@pytest.mark.parametrize("name", list(CASES))
@pytest.mark.parametrize("parts", [1, 3])
def test_csr_cc_exact(name, parts):
    src, dst, n = CASES[name]
    eng = LabelCSR(undirect(_ds(src, dst)), n, num_partitions=parts)
    got = eng.connected_components()
    eng.shutdown()
    np.testing.assert_array_equal(
        got.labels, oracle.connected_components(src, dst, n)
    )


@pytest.mark.parametrize("name", list(CASES))
@pytest.mark.parametrize("parts", [1, 3])
def test_csr_lp_matches_broadcast(name, parts):
    src, dst, n = CASES[name]
    ds = _ds(src, dst)
    und = undirect(ds)
    bcast = label_propagation(ds, n, rounds=5)
    eng = LabelCSR(und, n, num_partitions=parts)
    got = eng.label_propagation(rounds=5)
    eng.shutdown()
    np.testing.assert_array_equal(got.labels, bcast.labels)
    assert got.rounds == bcast.rounds
    assert got.changed_per_round == bcast.changed_per_round


def test_csr_cc_identical_across_shard_counts():
    """Fixed P=8 logical partitions on A=1 vs A=4 shards: identical
    labels and per-round change counts."""
    pages = rd.from_arrow(pages_table(64, seed=42)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    und = undirect(g.edges)
    res = {}
    for a in (1, 4):
        eng = LabelCSR(und, g.num_vertices, num_partitions=8, num_actors=a)
        res[a] = eng.connected_components()
        eng.shutdown()
    np.testing.assert_array_equal(res[1].labels, res[4].labels)
    assert res[1].changed_per_round == res[4].changed_per_round


def test_csr_cc_checkpoint_resume(tmp_path):
    """CC interrupted mid-run resumes from its label checkpoint and
    lands on the identical fixed point and round count."""
    pages = rd.from_arrow(pages_table(64, seed=42)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    und = undirect(g.edges)
    ck = str(tmp_path / "ck")
    eng = LabelCSR(und, g.num_vertices, num_partitions=4)
    full = eng.connected_components()
    eng.shutdown()  # actors reserve whole CPUs: release before rebuilding
    eng = LabelCSR(und, g.num_vertices, num_partitions=4)
    eng.connected_components(max_rounds=2, checkpoint_dir=ck,
                             checkpoint_every=1)
    eng.shutdown()
    eng = LabelCSR(und, g.num_vertices, num_partitions=4)
    resumed = eng.connected_components(checkpoint_dir=ck, resume=True)
    eng.shutdown()
    np.testing.assert_array_equal(resumed.labels, full.labels)
    assert resumed.rounds == full.rounds
    assert resumed.changed_per_round == full.changed_per_round


def test_csr_cc_on_built_graph_matches_broadcast():
    pages = rd.from_arrow(pages_table(64, seed=42)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    und = undirect(g.edges)
    bcast = connected_components(g.edges, g.num_vertices)
    eng = LabelCSR(und, g.num_vertices, num_partitions=4)
    got = eng.connected_components()
    eng.shutdown()
    np.testing.assert_array_equal(got.labels, bcast.labels)
    assert got.rounds == bcast.rounds


def test_csr_cc_path_graph_high_diameter():
    """Round-count stress on a diameter-(N-1) path graph: hash-min
    moves labels ONE hop per superstep, so a path of N vertices needs
    N-1 rounds to converge plus one to observe no change.  Documents
    the linear-diameter behavior called out in the
    ``connected_components`` docstring (web graphs have small
    diameters; pathological inputs need pointer-doubling, out of
    scope).  Also checks per-round change counts shrink monotonically
    to zero (each round settles exactly one more vertex tail)."""
    n = 512
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    und = undirect(_ds(src, dst))
    eng = LabelCSR(und, n, num_partitions=4, num_actors=2)
    got = eng.connected_components(max_rounds=n + 2)
    eng.shutdown()
    assert np.array_equal(got.labels, np.zeros(n, dtype=np.int64))
    assert got.rounds == n  # (n-1) hops + the terminal no-change round
    assert got.changed_per_round[-1] == 0
    assert all(a >= b for a, b in zip(got.changed_per_round,
                                      got.changed_per_round[1:]))


# ---- k-core decomposition (distributed h-index iteration) -------------------


def _simple_und(src, dst):
    from dxa_pagerank_ray.pipelines.superstep import simple_undirect

    return simple_undirect(_ds(src, dst))


@pytest.mark.parametrize("name", list(CASES))
@pytest.mark.parametrize("parts", [1, 3])
def test_csr_kcore_exact_small(name, parts):
    """Engine (h-index iteration) vs the independent min-degree peeling
    oracle on the hand-built cases — two different algorithms."""
    src, dst, n = CASES[name]
    eng = LabelCSR(_simple_und(src, dst), n, num_partitions=parts)
    got = eng.core_decomposition()
    eng.shutdown()
    np.testing.assert_array_equal(got.labels, oracle.core_numbers(src, dst, n))
    assert got.changed_per_round[-1] == 0


def test_csr_kcore_known_structure():
    """Clique K5 (core 4) + a pendant path off it (core 1) + one
    isolated vertex (core 0) — known answers by construction."""
    k5 = np.array([(a, b) for a in range(5) for b in range(a + 1, 5)])
    path = np.array([(4, 5), (5, 6)])
    src = np.concatenate([k5[:, 0], path[:, 0]])
    dst = np.concatenate([k5[:, 1], path[:, 1]])
    n = 8  # vertex 7 isolated
    eng = LabelCSR(_simple_und(src, dst), n, num_partitions=3)
    got = eng.core_decomposition()
    eng.shutdown()
    np.testing.assert_array_equal(
        got.labels, np.array([4, 4, 4, 4, 4, 1, 1, 0]))


@pytest.mark.parametrize("seed", [3, 11])
def test_csr_kcore_random_vs_peeling(seed):
    """Random multigraph (dups + self-loops in the raw edge list, both
    dropped by the simple-graph build) vs the peeling oracle, and
    shard-count invariance of labels AND round history."""
    rng = np.random.default_rng(seed)
    n, m = 300, 2400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    und = _simple_und(src, dst)
    exp = oracle.core_numbers(src, dst, n)
    res = {}
    for a in (1, 4):
        eng = LabelCSR(und, n, num_partitions=8, num_actors=a)
        res[a] = eng.core_decomposition()
        eng.shutdown()
    np.testing.assert_array_equal(res[1].labels, exp)
    np.testing.assert_array_equal(res[4].labels, exp)
    assert res[1].changed_per_round == res[4].changed_per_round
    assert exp.max() >= 3  # dense enough to exercise multi-level peeling


def test_route_ack_resubmission_is_idempotent(monkeypatch):
    """Force the lost-ack recovery branch: with a near-zero ack
    timeout, ray.wait rounds expire before acks arrive and every chunk
    is resubmitted (same key) — the engine must still load every edge
    exactly once."""
    from dxa_pagerank_ray.pipelines import pagerank_csr as pcsr

    # tiny wait rounds force resubmission, but the retry budget must be
    # effectively unbounded: the test asserts IDEMPOTENCY, not ack
    # latency (a throttled host once burned 1000 instant rounds before
    # the first ack landed and hit the loud-failure path instead)
    monkeypatch.setattr(pcsr, "_ROUTE_ACK_TIMEOUT_S", 0.02)
    monkeypatch.setattr(pcsr, "_ROUTE_ACK_TRIES", 1_000_000)
    rng = np.random.default_rng(44)
    n, m = 200, 1200
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    ds = _ds(pairs[:, 0], pairs[:, 1])
    eng = LabelCSR(ds, n, num_partitions=4, num_actors=2)
    try:
        assert eng.num_edges == len(pairs)  # no double-append
    finally:
        eng.shutdown()


def test_add_edges_key_idempotent():
    """The routing ack barrier may RESUBMIT a chunk whose submission was
    lost; the actor must apply a given key exactly once (lost-ack
    recovery must not double-append edges)."""
    import ray

    from dxa_pagerank_ray.pipelines.labels_csr import _make_label_actor_cls

    cls = _make_label_actor_cls()
    a = cls.options(num_cpus=0).remote(
        0, np.array([0, 4], dtype=np.int64), np.array([0, 1], dtype=np.int64))
    t = pa.table({"src": pa.array([0, 1], pa.int64()),
                  "dst": pa.array([1, 2], pa.int64())})
    try:
        assert ray.get(a.add_edges.remote(t, "k1")) == 2
        assert ray.get(a.add_edges.remote(t, "k1")) == 0  # dup key ignored
        assert ray.get(a.add_edges.remote(t, "k2")) == 2
        assert ray.get(a.seal.remote()) == 4
    finally:
        ray.kill(a)


# ---- multi-source depth-bounded BFS -----------------------------------------


def _bfs_oracle(src, dst, n, seeds, max_depth):
    """Sequential frontier BFS over the DIRECTED edge list; unreached
    (within max_depth) = sentinel n."""
    dist = np.full(n, n, dtype=np.int64)
    dist[np.asarray(seeds, dtype=np.int64)] = 0
    adj: dict[int, list[int]] = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), []).append(int(d))
    frontier = list(seeds)
    for depth in range(1, max_depth + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if dist[v] > depth:
                    dist[v] = depth
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    return dist


@pytest.mark.parametrize("name", list(CASES))
@pytest.mark.parametrize("parts", [1, 3])
def test_csr_bfs_exact_small(name, parts):
    """Directed BFS from vertex 0 on the hand-built cases vs the
    sequential oracle (edge direction taken as given)."""
    src, dst, n = CASES[name]
    eng = LabelCSR(_ds(src, dst), n, num_partitions=parts)
    got = eng.bfs_distances([0], max_depth=32)
    eng.shutdown()
    np.testing.assert_array_equal(
        got.labels, _bfs_oracle(src, dst, n, [0], 32))


@pytest.mark.parametrize("seed", [7, 23])
def test_csr_bfs_multi_seed_random(seed):
    """Random directed graph, 3-seed frontier: oracle-exact and
    shard-count invariant (labels AND per-round change history)."""
    rng = np.random.default_rng(seed)
    n, m = 400, 1200
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    seeds = [1, 2, 3]
    exp = _bfs_oracle(src, dst, n, seeds, 16)
    ds = _ds(src, dst)
    res = {}
    for a in (1, 4):
        eng = LabelCSR(ds, n, num_partitions=8, num_actors=a)
        res[a] = eng.bfs_distances(seeds, max_depth=16)
        eng.shutdown()
    np.testing.assert_array_equal(res[1].labels, exp)
    np.testing.assert_array_equal(res[4].labels, exp)
    assert res[1].changed_per_round == res[4].changed_per_round
    assert (exp < n).sum() > len(seeds)  # the frontier actually spread


def test_csr_bfs_depth_bound_path_graph():
    """Path graph 0->1->...->63 with max_depth=5: vertices 0..5 get
    their true distance, everything past the bound stays sentinel, and
    the engine runs exactly max_depth supersteps (no fixpoint below the
    bound)."""
    n = 64
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    eng = LabelCSR(_ds(src, dst), n, num_partitions=4, num_actors=2)
    got = eng.bfs_distances([0], max_depth=5)
    eng.shutdown()
    exp = np.full(n, n, dtype=np.int64)
    exp[:6] = np.arange(6)
    np.testing.assert_array_equal(got.labels, exp)
    assert got.rounds == 5


def test_csr_bfs_checkpoint_resume(tmp_path):
    """Interrupt after 2 rounds, rebuild at a different shard count,
    resume — identical distances and round history."""
    rng = np.random.default_rng(13)
    n, m = 300, 900
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    ds = _ds(src, dst)
    eng = LabelCSR(ds, n, num_partitions=8, num_actors=2)
    full = eng.bfs_distances([0, 5], max_depth=16)
    eng.shutdown()
    ck = str(tmp_path / "bfs")
    eng = LabelCSR(ds, n, num_partitions=8, num_actors=2)
    eng.bfs_distances([0, 5], max_depth=2, checkpoint_dir=ck,
                      checkpoint_every=1)
    eng.shutdown()
    eng = LabelCSR(ds, n, num_partitions=8, num_actors=4)
    resumed = eng.bfs_distances([0, 5], max_depth=16,
                                checkpoint_dir=ck, resume=True)
    eng.shutdown()
    np.testing.assert_array_equal(resumed.labels, full.labels)
    assert resumed.rounds == full.rounds


# ---- weighted SSSP (hop-bounded Bellman-Ford) --------------------------------


def _wds(src, dst, w):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "w": pa.array(w, pa.int64())})
    ).materialize()


def _sssp_oracle(src, dst, w, n, seeds, max_hops, sentinel):
    dist = np.full(n, sentinel, dtype=np.int64)
    dist[np.asarray(seeds, dtype=np.int64)] = 0
    for _ in range(max_hops):
        new = dist.copy()
        np.minimum.at(new, dst, dist[src] + w)
        if np.array_equal(new, dist):
            break
        dist = new
    return dist


@pytest.mark.parametrize("seed", [6, 29])
def test_csr_sssp_vs_bellman_ford(seed):
    from dxa_pagerank_ray.pipelines.labels_csr import SSSP_SENTINEL

    rng = np.random.default_rng(seed)
    n, m = 300, 1500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    w = rng.integers(1, 50, len(src))
    seeds = [0, 7]
    exp = _sssp_oracle(src, dst, w, n, seeds, 12, SSSP_SENTINEL)
    ds = _wds(src, dst, w)
    res = {}
    for a in (1, 4):
        eng = LabelCSR(ds, n, num_partitions=8, num_actors=a,
                       weighted=True)
        res[a] = eng.sssp_distances(seeds, max_hops=12)
        eng.shutdown()
    np.testing.assert_array_equal(res[1].labels, exp)
    np.testing.assert_array_equal(res[4].labels, exp)
    assert res[1].changed_per_round == res[4].changed_per_round
    reach = exp[exp < SSSP_SENTINEL]
    assert len(reach) > 10 and reach.max() > 50  # multi-hop costs exist


def test_csr_sssp_hop_bound_and_cheaper_long_path():
    """Cost 10 direct edge vs a 3-edge path of cost 3: with
    max_hops=1 the direct edge wins; with max_hops=3 the cheap path
    wins — the hop bound is the contract, not an approximation."""
    from dxa_pagerank_ray.pipelines.labels_csr import SSSP_SENTINEL

    src = np.array([0, 0, 2, 3])
    dst = np.array([1, 2, 3, 1])
    w = np.array([10, 1, 1, 1])
    ds = _wds(src, dst, w)
    eng = LabelCSR(ds, 4, num_partitions=2, weighted=True)
    one = eng.sssp_distances([0], max_hops=1)
    eng.shutdown()
    eng = LabelCSR(ds, 4, num_partitions=2, weighted=True)
    three = eng.sssp_distances([0], max_hops=3)
    eng.shutdown()
    assert one.labels[1] == 10 and three.labels[1] == 3
    assert one.labels[3] == SSSP_SENTINEL and three.labels[3] == 2


def test_csr_bfs_seed_validation():
    src, dst, n = CASES["star"]
    eng = LabelCSR(_ds(src, dst), n, num_partitions=2)
    try:
        with pytest.raises(ValueError):
            eng.bfs_distances([])
        with pytest.raises(ValueError):
            eng.bfs_distances([n])
    finally:
        eng.shutdown()


def test_csr_kcore_checkpoint_resume(tmp_path):
    """Interrupt after 1 round, rebuild at a different shard count,
    resume — identical cores and total round count."""
    rng = np.random.default_rng(5)
    n, m = 200, 1600
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    und = _simple_und(src, dst)
    eng = LabelCSR(und, n, num_partitions=8, num_actors=2)
    full = eng.core_decomposition()
    eng.shutdown()
    ck = str(tmp_path / "kcore")
    eng = LabelCSR(und, n, num_partitions=8, num_actors=2)
    eng.core_decomposition(max_rounds=1, checkpoint_dir=ck, checkpoint_every=1)
    eng.shutdown()
    eng = LabelCSR(und, n, num_partitions=8, num_actors=4)
    resumed = eng.core_decomposition(checkpoint_dir=ck, resume=True)
    eng.shutdown()
    np.testing.assert_array_equal(resumed.labels, full.labels)
    assert resumed.rounds == full.rounds


def test_bowtie_regions_hand_case():
    """Broder bow-tie on a hand graph: cycle {0,1,2} = SCC, 3 -> 0 is
    IN, 2 -> 4 is OUT, 5 isolated is OTHER.  Pivot = max-total-degree
    min-id vertex (0, inside the SCC by construction).  The backward
    pass runs ``reverse=True`` on the SAME pool (build_reverse) and
    must equal a separate engine over the reversed edge set."""
    from dxa_pagerank_ray.pipelines.testdata_graph import _max_degree_pivot

    src = np.array([0, 1, 2, 3, 2])
    dst = np.array([1, 2, 0, 0, 4])
    n = 6
    ds = _ds(src, dst)
    pivot = _max_degree_pivot(ds)
    assert pivot == 0
    eng = LabelCSR(ds, n, num_partitions=3)
    f = eng.bfs_distances([pivot], max_depth=n + 1)
    b = eng.bfs_distances([pivot], max_depth=n + 1, reverse=True)
    eng.shutdown()
    # reference: a separate engine constructed on the reversed edges
    eng = LabelCSR(_ds(dst, src), n, num_partitions=3)
    b_ref = eng.bfs_distances([pivot], max_depth=n + 1)
    eng.shutdown()
    np.testing.assert_array_equal(b.labels, b_ref.labels)
    assert (b.rounds, b.changed_per_round) == \
        (b_ref.rounds, b_ref.changed_per_round)
    fm, bm = f.labels < n, b.labels < n
    region = np.where(fm & bm, "scc",
                      np.where(bm, "in", np.where(fm, "out", "other")))
    assert region.tolist() == ["scc", "scc", "scc", "in", "out", "other"]


def test_reverse_bfs_random_matches_reversed_engine():
    """Random directed graph: reverse=True on one pool is bit-identical
    to a fresh engine over the reversed edge Dataset, at two shard
    counts."""
    rng = np.random.default_rng(31)
    n, m = 300, 1400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    for actors in (1, 3):
        eng = LabelCSR(_ds(src, dst), n, num_partitions=6,
                       num_actors=actors)
        got = eng.bfs_distances([7, 11], max_depth=12, reverse=True)
        eng.shutdown()
        eng = LabelCSR(_ds(dst, src), n, num_partitions=6,
                       num_actors=actors)
        ref = eng.bfs_distances([7, 11], max_depth=12)
        eng.shutdown()
        np.testing.assert_array_equal(got.labels, ref.labels)


def test_bowtie_distributed_classify_matches_dense():
    """collect_limit=0 forces the write_labels + per-partition zip-join
    classification; rows must equal the dense path's exactly (round-4
    verdict item 6)."""
    from dxa_pagerank_ray.pipelines.testdata_graph import q_bowtie_regions

    sf = "/root/testdata/sf0.001"
    dense = q_bowtie_regions(sf)
    dist = q_bowtie_regions(sf, collect_limit=0)
    assert dense.equals(dist)


@pytest.mark.parametrize("name", list(CASES))
@pytest.mark.parametrize("parts", [1, 3])
def test_csr_scc_exact_small(name, parts):
    src, dst, n = CASES[name]
    eng = LabelCSR(_ds(src, dst), n, num_partitions=parts)
    got = eng.strongly_connected_components()
    eng.shutdown()
    exp = oracle.strongly_connected_components(src, dst, n)
    assert np.array_equal(got.labels, exp), name


@pytest.mark.parametrize("seed", [3, 17, 29])
def test_csr_scc_random_vs_tarjan(seed):
    rng = np.random.default_rng(seed)
    n, m = 120, 360
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    eng = LabelCSR(_ds(src, dst), n, num_partitions=4, num_actors=2)
    got = eng.strongly_connected_components()
    eng.shutdown()
    exp = oracle.strongly_connected_components(src, dst, n)
    assert np.array_equal(got.labels, exp)


def test_csr_scc_cycle_chain_structures():
    # two 3-cycles bridged by a path, plus an isolated vertex
    src = np.array([0, 1, 2, 2, 3, 4, 5, 6])
    dst = np.array([1, 2, 0, 3, 4, 5, 6, 4])
    n = 8
    eng = LabelCSR(_ds(src, dst), n, num_partitions=3)
    got = eng.strongly_connected_components()
    eng.shutdown()
    exp = oracle.strongly_connected_components(src, dst, n)
    assert np.array_equal(got.labels, exp)
    assert got.labels[0] == got.labels[1] == got.labels[2] == 0
    assert got.labels[4] == got.labels[5] == got.labels[6] == 4
    assert got.labels[3] == 3 and got.labels[7] == 7


def test_csr_scc_checkpoint_resume(tmp_path):
    """Checkpoint per outer round, keep only the round-1 checkpoint
    (simulated interruption), rebuild at a different shard count,
    resume — identical scc ids and outer-round count."""
    import shutil

    # two 3-cycles bridged 0->3: two outer coloring rounds by
    # construction (cycle B shares cycle A's color until A retires)
    src = np.array([0, 1, 2, 3, 4, 5, 0])
    dst = np.array([1, 2, 0, 4, 5, 3, 3])
    n = 6
    ds = _ds(src, dst)
    eng = LabelCSR(ds, n, num_partitions=4, num_actors=2)
    full = eng.strongly_connected_components()
    eng.shutdown()
    assert full.rounds == 2
    ck = str(tmp_path / "scc")
    eng = LabelCSR(ds, n, num_partitions=4, num_actors=2)
    eng.strongly_connected_components(checkpoint_dir=ck,
                                      checkpoint_every=1)
    eng.shutdown()
    shutil.rmtree(f"{ck}/iter=00002")
    eng = LabelCSR(ds, n, num_partitions=4, num_actors=4)
    resumed = eng.strongly_connected_components(checkpoint_dir=ck,
                                                resume=True)
    eng.shutdown()
    np.testing.assert_array_equal(resumed.labels, full.labels)
    assert resumed.rounds == full.rounds
    exp = oracle.strongly_connected_components(src, dst, n)
    np.testing.assert_array_equal(full.labels, exp)


def test_dag_levels_known_and_cycle_guard():
    # diamond DAG 0->{1,2}->3->4 with extra 0->3: levels 0,1,1,2,3
    src = np.array([0, 0, 1, 2, 3, 0])
    dst = np.array([1, 2, 3, 3, 4, 3])
    n = 5
    eng = LabelCSR(_ds(src, dst), n, num_partitions=3)
    got = eng.dag_levels()
    eng.shutdown()
    assert got.labels.tolist() == [0, 1, 1, 2, 3]
    assert got.rounds == 4  # 3 productive + the fixpoint-confirming round
    # cycle input fails loudly instead of looping
    eng = LabelCSR(_ds(np.array([0, 1]), np.array([1, 0])), 2,
                   num_partitions=2)
    with pytest.raises(RuntimeError, match="cycle"):
        eng.dag_levels(max_rounds=20)
    eng.shutdown()


def test_reload_edges_matches_fresh_engine():
    """reload_edges swaps a NEW edge set onto the same pool: results on
    the reloaded pool must be identical to a fresh engine built on the
    new edges — including after an SCC run that built reverse blocks
    (the dag_levels chain), and reverse blocks must rebuild correctly
    after a reload."""
    src_a, dst_a, _ = CASES["two_chains"]
    src_b, dst_b, _ = CASES["k3_pendant"]
    n = 7

    # fresh engine first and shut down before the pool spawns — two
    # live 3-actor pools would exceed the 4-CPU test session
    fresh = LabelCSR(_ds(src_b, dst_b), n, num_partitions=3)
    exp_cc = fresh.connected_components()
    exp_scc = fresh.strongly_connected_components()
    fresh.shutdown()

    pool = LabelCSR(_ds(src_a, dst_a), n, num_partitions=3)
    pool.strongly_connected_components()  # dirties labels + reverse
    pool.reload_edges(_ds(src_b, dst_b))
    got_cc = pool.connected_components()
    got_scc = pool.strongly_connected_components()
    pool.shutdown()
    np.testing.assert_array_equal(got_cc.labels, exp_cc.labels)
    np.testing.assert_array_equal(got_scc.labels, exp_scc.labels)


def test_reload_edges_dag_levels_chain():
    """The exact q_dag_levels shape on a micro graph: SCC on a cycle +
    tail, remap to condensation, reload, max-plus levels."""
    # 0->1->2->0 (one SCC), 2->3->4 (chain)
    src = np.array([0, 1, 2, 2, 3])
    dst = np.array([1, 2, 0, 3, 4])
    n = 5
    pool = LabelCSR(_ds(src, dst), n, num_partitions=2)
    res = pool.strongly_connected_components()
    scc = res.labels
    # pool-computed condensation == the driver remap + dedup
    import ray

    cs, cd = pool.condensation_edges(ray.put(scc))
    s, d = scc[src], scc[dst]
    keep = s != d
    exp = sorted(zip(s[keep].tolist(), d[keep].tolist()))
    assert sorted(zip(cs.tolist(), cd.tolist())) == sorted(set(exp))
    # driver-table reload form (the saturated-pool-safe path)
    pool.reload_edges(pa.table({"src": pa.array(cs, pa.int64()),
                                "dst": pa.array(cd, pa.int64())}))
    lev = pool.dag_levels()
    pool.shutdown()
    ids = np.unique(scc)
    got = {int(i): int(lev.labels[i]) for i in ids}
    assert got == {0: 0, 3: 1, 4: 2}
