"""CSR partition-actor engine vs the numpy oracle and the broadcast
engine — identical semantics, different execution."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dxa_pagerank_ray.oracles.graph_oracles import pagerank_lump
from dxa_pagerank_ray.pipelines.graph_build import build_link_graph, edges_to_numpy
from dxa_pagerank_ray.pipelines.pagerank import pagerank
from dxa_pagerank_ray.pipelines.pagerank_csr import pagerank_csr
from dxa_pagerank_ray.sources.edgelist import README7, parse_edgelist
from dxa_pagerank_ray.sources.pages import pages_table


def test_csr_readme7_vs_oracle(tmp_path):
    p = tmp_path / "g.txt"
    p.write_text(README7)
    t, n = parse_edgelist(str(p))
    edges = rd.from_arrow(t).materialize()
    src, dst = edges_to_numpy(edges)
    exp_pr, exp_rounds, exp_errs = pagerank_lump(src, dst, n, 0.85, 1e-9, 200)
    res = pagerank_csr(edges, n, num_partitions=3, threshold=1e-9, max_rounds=200)
    assert res.rounds == exp_rounds
    np.testing.assert_allclose(res.pr, exp_pr, atol=1e-6, rtol=0)
    np.testing.assert_allclose(res.errs, exp_errs, rtol=1e-6, atol=1e-12)


@pytest.mark.parametrize("parts", [1, 4])
def test_csr_on_built_graph_matches_broadcast_engine(parts):
    pages = rd.from_arrow(pages_table(64, seed=42)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    bcast = pagerank(g.edges, g.num_vertices, threshold=1e-8)
    csr = pagerank_csr(g.edges, g.num_vertices, num_partitions=parts,
                       threshold=1e-8)
    assert csr.rounds == bcast.rounds
    np.testing.assert_allclose(csr.pr, bcast.pr, atol=1e-12, rtol=0)
    assert abs(csr.pr.sum() - 1.0) < 1e-9


def test_csr_bit_identical_across_shard_counts():
    """The N-vs-4N story: fixed P logical partitions dealt onto A=1 vs
    A=4 shard actors must give BIT-identical ranks and error traces
    (all float reductions run in logical-partition order)."""
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    pages = rd.from_arrow(pages_table(64, seed=42)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    res = {}
    for a in (1, 4):
        eng = PageRankCSR(g.edges, g.num_vertices, num_partitions=8,
                          num_actors=a)
        res[a] = eng.run(threshold=1e-8, max_rounds=40)
        eng.shutdown()
    np.testing.assert_array_equal(res[1].pr, res[4].pr)
    assert res[1].errs == res[4].errs
    assert res[1].rounds == res[4].rounds


def test_csr_resume_across_shard_counts(tmp_path):
    """Checkpoint written at A=4 resumes at A=2 (lineage is per logical
    partition, not per shard)."""
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    pages = rd.from_arrow(pages_table(64, seed=42)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    ck = str(tmp_path / "ck")
    eng = PageRankCSR(g.edges, g.num_vertices, num_partitions=8,
                      num_actors=4)
    full = eng.run(threshold=1e-8, max_rounds=40)
    eng.shutdown()
    eng = PageRankCSR(g.edges, g.num_vertices, num_partitions=8,
                      num_actors=4)
    eng.run(threshold=1e-8, max_rounds=3, checkpoint_dir=ck,
            checkpoint_every=1)
    eng.shutdown()
    eng = PageRankCSR(g.edges, g.num_vertices, num_partitions=8,
                      num_actors=2)
    resumed = eng.run(threshold=1e-8, max_rounds=40, checkpoint_dir=ck,
                      resume=True)
    eng.shutdown()
    assert resumed.resumed_from == 3
    np.testing.assert_array_equal(resumed.pr, full.pr)


def test_csr_checkpoint_resume(tmp_path):
    """Interrupt after 5 rounds (last complete ckpt: round 4), rebuild a
    fresh engine, resume — final ranks must be bit-equal to the
    uninterrupted run (FIXTURES.md F6)."""
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    pages = rd.from_arrow(pages_table(64, seed=42)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    ck = str(tmp_path / "ckpt")
    eng = PageRankCSR(g.edges, g.num_vertices, num_partitions=4)
    full = eng.run(threshold=1e-8, max_rounds=40)
    eng.shutdown()  # actors reserve whole CPUs: release before rebuilding
    eng = PageRankCSR(g.edges, g.num_vertices, num_partitions=4)
    eng.run(threshold=1e-8, max_rounds=5, checkpoint_dir=ck,
            checkpoint_every=2)
    eng.shutdown()
    eng = PageRankCSR(g.edges, g.num_vertices, num_partitions=4)
    resumed = eng.run(threshold=1e-8, max_rounds=40, checkpoint_dir=ck,
                      resume=True)
    eng.shutdown()
    assert resumed.resumed_from == 4
    assert resumed.rounds == full.rounds
    np.testing.assert_array_equal(resumed.pr, full.pr)
    np.testing.assert_allclose(resumed.errs, full.errs, rtol=1e-9, atol=1e-15)
    # partition-count mismatch must be rejected, not silently misread
    # (explicit shutdown: the raised exception's traceback would pin
    # the engine — and its CPU-holding actors — for the whole session)
    eng_bad = PageRankCSR(g.edges, g.num_vertices, num_partitions=2)
    try:
        with pytest.raises(ValueError):
            eng_bad.run(checkpoint_dir=ck, resume=True)
    finally:
        eng_bad.shutdown()


def test_csr_hub_skew_star():
    """200k-spoke star (every edge points at vertex 0): the hub's
    inbound messages arrive as at most P per-block partials (map-side
    combine caps skew); ranks still match the oracle."""
    from dxa_pagerank_ray.pipelines.pagerank_csr import pagerank_csr

    n = 200_001
    src = np.arange(1, n, dtype=np.int64)
    dst = np.zeros(n - 1, dtype=np.int64)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).materialize()
    exp_pr, exp_rounds, _ = pagerank_lump(src, dst, n, 0.85, 1e-8, 200)
    res = pagerank_csr(edges, n, num_partitions=16, threshold=1e-8,
                       max_rounds=200)
    assert res.converged and res.rounds == exp_rounds
    np.testing.assert_allclose(res.pr, exp_pr, atol=1e-9, rtol=0)
    assert abs(res.pr.sum() - 1.0) < 1e-6


def test_csr_empty_graph():
    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    ).materialize()
    res = pagerank_csr(empty, 3, num_partitions=2, threshold=1e-9)
    np.testing.assert_allclose(res.pr, np.full(3, 1 / 3), atol=1e-12)


def test_csr_float32_messages_bit_identical_and_accurate():
    """message_dtype='float32' (the message-volume scaling lever):
    still BIT-identical across shard counts (per-block rounding happens
    before shipping and is A-independent), and within float32 accuracy
    of the float64 oracle."""
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    pages = rd.from_arrow(pages_table(64, seed=42)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    src, dst = edges_to_numpy(g.edges)
    exp_pr, _, _ = pagerank_lump(src, dst, g.num_vertices, 0.85, 1e-8, 100)
    res = {}
    for a in (1, 4):
        eng = PageRankCSR(g.edges, g.num_vertices, num_partitions=8,
                          num_actors=a, message_dtype="float32")
        res[a] = eng.run(threshold=1e-8, max_rounds=100)
        eng.shutdown()
    np.testing.assert_array_equal(res[1].pr, res[4].pr)
    assert res[1].errs == res[4].errs
    np.testing.assert_allclose(res[4].pr, exp_pr, rtol=0, atol=5e-7)
    assert abs(res[4].pr.sum() - 1.0) < 1e-5


def test_csr_uint16_indices_bit_identical():
    """index_dtype='uint16' (the message-INDEX-bytes scaling lever,
    legal when every partition is narrower than 2^16): bit-identical
    ranks/errs vs the int32 engine at two shard counts; 'auto' engages
    uint16 on narrow partitions and an explicit uint16 request on wide
    partitions raises."""
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    pages = rd.from_arrow(pages_table(64, seed=42)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    res = {}
    for idx_dt in ("int32", "uint16"):
        for a in (1, 4):
            eng = PageRankCSR(g.edges, g.num_vertices, num_partitions=8,
                              num_actors=a, index_dtype=idx_dt)
            res[(idx_dt, a)] = eng.run(threshold=1e-8, max_rounds=100)
            eng.shutdown()
    base = res[("int32", 1)]
    for k, r in res.items():
        np.testing.assert_array_equal(r.pr, base.pr, err_msg=str(k))
        assert r.errs == base.errs, k
    # explicit uint16 on too-wide partitions must fail loudly (the
    # shard ctor raises; it surfaces through the routing barrier)
    with pytest.raises(Exception, match="uint16"):
        PageRankCSR(g.edges, 200_000, num_partitions=2,
                    index_dtype="uint16", num_actors=1)


def _weighted_ds(seed: int, n: int, m: int):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedup pairs, weight = multiplicity + a deterministic positive part
    key = src * n + dst
    uk, w = np.unique(key, return_counts=True)
    src, dst = uk // n, uk % n
    w = w.astype(np.float64) + (uk % 7) * 0.5
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "w": pa.array(w, pa.float64())})
    return rd.from_arrow(t).repartition(4).materialize(), src, dst, w


def test_csr_weighted_vs_numpy_oracle():
    """Weighted contributions PR(u)*w(u,v)/W(u) (Xing & Ghorbani 2004)
    vs the weighted numpy oracle; dangling = zero out-strength."""
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    n = 400
    ds, src, dst, w = _weighted_ds(13, n, 3000)
    exp, exp_rounds, _ = pagerank_lump(src, dst, n, 0.85, 1e-10, 500,
                                       weights=w)
    eng = PageRankCSR(ds, n, num_partitions=8, num_actors=2, weighted=True)
    r = eng.run(threshold=1e-10, max_rounds=500)
    eng.shutdown()
    assert r.rounds == exp_rounds
    np.testing.assert_allclose(r.pr, exp, rtol=0, atol=1e-14)
    assert abs(r.pr.sum() - 1.0) < 1e-9


def test_csr_weighted_bit_identical_across_shard_counts():
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    n = 400
    ds, *_ = _weighted_ds(29, n, 3000)
    res = {}
    for a in (1, 4):
        eng = PageRankCSR(ds, n, num_partitions=8, num_actors=a,
                          weighted=True)
        res[a] = eng.run(threshold=1e-8)
        eng.shutdown()
    np.testing.assert_array_equal(res[1].pr, res[4].pr)
    assert res[1].errs == res[4].errs


def test_csr_weighted_rejects_nonpositive_weights():
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    t = pa.table({"src": pa.array([0, 1], pa.int64()),
                  "dst": pa.array([1, 2], pa.int64()),
                  "w": pa.array([1.0, 0.0], pa.float64())})
    ds = rd.from_arrow(t).materialize()
    with pytest.raises(Exception, match="positive"):
        PageRankCSR(ds, 3, num_partitions=2, num_actors=1, weighted=True)


def test_csr_personalized_vs_numpy_oracle():
    """Personalized (topic-sensitive) PageRank: teleport over a seed
    set, dangling lump redistributed to seeds; vs the teleport numpy
    oracle, plus shard-count invariance."""
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    pages = rd.from_arrow(pages_table(128, seed=3)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    src, dst = edges_to_numpy(g.edges)
    n = g.num_vertices
    seeds = np.arange(0, n, 7, dtype=np.int64)
    t = np.zeros(n)
    t[seeds] = 1.0 / len(seeds)
    exp, exp_rounds, _ = pagerank_lump(src, dst, n, 0.85, 1e-10, 500,
                                       teleport=t)
    res = {}
    for a in (1, 4):
        eng = PageRankCSR(g.edges, n, num_partitions=8, num_actors=a)
        eng.personalize(seeds)
        res[a] = eng.run(threshold=1e-10, max_rounds=500)
        eng.shutdown()
    assert res[1].rounds == exp_rounds
    np.testing.assert_allclose(res[1].pr, exp, rtol=0, atol=1e-14)
    np.testing.assert_array_equal(res[1].pr, res[4].pr)
    assert abs(res[1].pr.sum() - 1.0) < 1e-9
    # teleport concentrates mass on seeds: well above their uniform share
    assert res[1].pr[seeds].sum() > 2.0 * len(seeds) / n


def test_csr_personalize_validates_seeds():
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    t = pa.table({"src": pa.array([0], pa.int64()),
                  "dst": pa.array([1], pa.int64())})
    ds = rd.from_arrow(t).materialize()
    eng = PageRankCSR(ds, 2, num_partitions=2, num_actors=1)
    with pytest.raises(ValueError, match="seed"):
        eng.personalize([])
    with pytest.raises(ValueError, match="range"):
        eng.personalize([5])
    eng.shutdown()


def test_csr_partitioned_parquet_load_bit_identical(tmp_path, ray_session):
    """write_edges_partitioned + edges_path load must equal the
    routing-fan-out load bit-for-bit (ranks AND error trace), be
    idempotent on re-load, and reject a mismatched layout."""
    import pytest

    from dxa_pagerank_ray.pipelines.pagerank_csr import (
        PageRankCSR,
        write_edges_partitioned,
    )

    pages = rd.from_arrow(pages_table(96, seed=3)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    edges = g.edges.materialize()
    n = g.num_vertices

    out = str(tmp_path / "edges_part")
    write_edges_partitioned(edges, out, n, num_partitions=8)

    eng_a = PageRankCSR(edges, n, num_partitions=8, num_actors=2)
    res_a = eng_a.run(threshold=1e-9)
    na, da = eng_a.num_edges, eng_a.num_dangling
    eng_a.shutdown()

    eng_b = PageRankCSR(None, n, num_partitions=8, num_actors=3,
                        edges_path=out)
    assert (eng_b.num_edges, eng_b.num_dangling) == (na, da)
    res_b = eng_b.run(threshold=1e-9)
    eng_b.shutdown()

    assert res_a.rounds == res_b.rounds
    assert np.array_equal(res_a.pr, res_b.pr)
    assert np.array_equal(res_a.errs, res_b.errs)

    # idempotent: loading the same layout twice (fresh engine) is not
    # an append — same edge count, same result
    eng_c = PageRankCSR(None, n, num_partitions=8, edges_path=out)
    import ray as _ray

    _ray.get([a.load_parquet.remote(out) for a in eng_c.actors])
    assert sum(_ray.get([a.seal.remote() for a in eng_c.actors])) == na
    eng_c.shutdown()

    with pytest.raises(ValueError, match="partitioned for"):
        PageRankCSR(None, n, num_partitions=16, edges_path=out)
    with pytest.raises(ValueError, match="_edges_meta"):
        PageRankCSR(None, n, num_partitions=8, edges_path=str(tmp_path))


def test_csr_bidirectional_pool_matches_fresh_engines():
    """One bidirectional pool (build_reverse + set_direction + reset)
    must reproduce three FRESH engines' results exactly: reverse-run pr
    == a fresh engine built on the reversed Dataset (nano-identical —
    only the within-block arrival order of equal-dst edges differs,
    absorbed by nano rounding), and the forward re-runs (plain +
    personalized) bit-equal fresh forward engines."""
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    pages = rd.from_arrow(pages_table(64, seed=7)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    edges = g.edges.materialize()
    n = g.num_vertices

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["dst"], "dst": b["src"]})

    redges = edges.map_batches(rev, batch_format="pyarrow").materialize()
    fresh = {}
    eng = PageRankCSR(redges, n, num_partitions=8, num_actors=2)
    fresh["rev"] = eng.run(threshold=0.0, max_rounds=4)
    eng.shutdown()
    eng = PageRankCSR(edges, n, num_partitions=8, num_actors=2)
    fresh["fwd"] = eng.run(threshold=0.0, max_rounds=4)
    eng.shutdown()
    seeds = np.arange(0, n, 5, dtype=np.int64)
    eng = PageRankCSR(edges, n, num_partitions=8, num_actors=2)
    eng.personalize(seeds)
    fresh["ppr"] = eng.run(threshold=0.0, max_rounds=4)
    eng.shutdown()

    pool = PageRankCSR(edges, n, num_partitions=8, num_actors=2)
    pool.build_reverse()
    pool.set_direction("rev")
    got_rev = pool.run(threshold=0.0, max_rounds=4)
    pool.set_direction("fwd")
    got_fwd = pool.run(threshold=0.0, max_rounds=4)
    pool.reset()
    pool.personalize(seeds)
    got_ppr = pool.run(threshold=0.0, max_rounds=4)
    pool.shutdown()

    def nano(x):
        return np.floor(x * 1e9 + 0.5).astype(np.int64)

    np.testing.assert_array_equal(nano(got_rev.pr), nano(fresh["rev"].pr))
    np.testing.assert_allclose(got_rev.pr, fresh["rev"].pr, rtol=1e-12)
    np.testing.assert_array_equal(got_fwd.pr, fresh["fwd"].pr)
    np.testing.assert_array_equal(got_ppr.pr, fresh["ppr"].pr)


def test_csr_set_direction_requires_reverse():
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    pages = rd.from_arrow(pages_table(16, seed=7)).repartition(2)
    g = build_link_graph(pages, num_partitions=2)
    eng = PageRankCSR(g.edges, g.num_vertices, num_partitions=4,
                      num_actors=1)
    with pytest.raises(Exception, match="seal_reverse"):
        eng.set_direction("rev")
    eng.shutdown()


def test_csr_build_reverse_rejects_weighted():
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    ds, _, _, _ = _weighted_ds(3, 20, 60)
    eng = PageRankCSR(ds, 20, num_partitions=4, num_actors=1,
                      weighted=True)
    with pytest.raises(NotImplementedError):
        eng.build_reverse()
    eng.shutdown()
