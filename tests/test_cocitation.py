"""Co-citation related-pages operator vs a brute-force numpy oracle:
exact counts, hub-cap contract, partition invariance, top-k total
order."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dxa_pagerank_ray.pipelines.cocitation import (
    _cocite_sweep,
    cocitation_counts,
    cocitation_topk,
)


def _ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ).materialize()


def _oracle_counts(src, dst, max_outdeg=10**9):
    """Brute force: for each pair of distinct dsts of one src, +1."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for s, d in zip(src, dst):
        adj[int(s)].add(int(d))
    c = Counter()
    for outs in adj.values():
        if len(outs) > max_outdeg:
            continue
        outs = sorted(outs)
        for i in range(len(outs)):
            for j in range(i + 1, len(outs)):
                c[(outs[i], outs[j])] += 1
    return c


def _as_counter(ds_or_table):
    t = ds_or_table.to_pandas() if hasattr(ds_or_table, "to_pandas") \
        else ds_or_table
    return {(int(a), int(b)): int(n)
            for a, b, n in zip(t["a"], t["b"], t["n"])}


@pytest.mark.parametrize("seed", [5, 19])
@pytest.mark.parametrize("num_groups", [1, 4])
def test_cocitation_counts_exact(seed, num_groups):
    """Random deduplicated graph: exact (a, b, n) agreement with brute
    force at every partitioning."""
    rng = np.random.default_rng(seed)
    m = 600
    src = rng.integers(0, 40, m)
    dst = rng.integers(0, 60, m)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    got = _as_counter(cocitation_counts(_ds(src, dst),
                                        num_groups=num_groups))
    exp = dict(_oracle_counts(src, dst))
    assert got == exp and len(got) > 50


def test_cocitation_hub_cap():
    """A source above max_outdeg contributes NO pairs; co-citations
    through normal sources are unaffected — the sweep's hub bound is
    the operator contract, not best-effort."""
    hub_dsts = np.arange(100, 120)            # hub 0: outdeg 20 > cap 16
    src = np.r_[np.zeros(20, dtype=np.int64), [1, 1, 2, 2]]
    dst = np.r_[hub_dsts, [100, 101, 100, 101]]
    got = _as_counter(cocitation_counts(_ds(src, dst), max_outdeg=16,
                                        num_groups=2))
    assert got == {(100, 101): 2}
    # sweep-level: same table through the pure function
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    sw = _cocite_sweep(t, max_outdeg=16)
    assert sw.num_rows == 2  # (100,101) from src 1 and src 2 only


def test_coupling_is_cocitation_of_reverse():
    """Bibliographic coupling == co-citation on the reversed edges."""
    from dxa_pagerank_ray.pipelines.cocitation import coupling_topk

    rng = np.random.default_rng(3)
    m = 400
    src = rng.integers(0, 30, m)
    dst = rng.integers(30, 70, m)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    got = coupling_topk(_ds(src, dst), k=10, num_groups=2).to_pandas()
    exp = cocitation_topk(_ds(dst, src), k=10, num_groups=2).to_pandas()
    assert got.values.tolist() == exp.values.tolist() and len(got) == 10


def test_cocitation_topk_total_order():
    """Top-k applies the (n desc, a, b) total order, deterministic
    under count ties."""
    # srcs 0..4 all link to {10, 11}; srcs 0..1 also to {12, 13}
    src, dst = [], []
    for s in range(5):
        src += [s, s]
        dst += [10, 11]
    for s in range(2):
        src += [s, s]
        dst += [12, 13]
    res = cocitation_topk(_ds(src, dst), k=3, num_groups=2).to_pandas()
    rows = list(zip(res["a"], res["b"], res["n"]))
    assert rows[0] == (10, 11, 5)
    # remaining counts all tie at 2 -> (a, b) ascending decides
    assert rows[1:] == [(10, 12, 2), (10, 13, 2)]


def test_jaccard_related_vs_bruteforce():
    """jac_nano ranking vs brute force over exact in-neighborhoods,
    both paths (broadcast and forced-distributed) identical."""
    from dxa_pagerank_ray.pipelines.cocitation import jaccard_related_topk

    rng = np.random.default_rng(12)
    m = 500
    src = rng.integers(0, 30, m)
    dst = rng.integers(30, 70, m)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    got = jaccard_related_topk(_ds(src, dst), k=10, num_groups=2)
    # brute force
    from collections import defaultdict

    ins = defaultdict(set)
    for s, d in zip(src.tolist(), dst.tolist()):
        ins[d].add(s)
    rows = []
    keys = sorted(ins)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            inter = len(ins[a] & ins[b])
            if inter:
                uni = len(ins[a] | ins[b])
                rows.append((inter * 10**9 // uni, a, b, inter, uni))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    exp = [(a, b, i_, u, j) for j, a, b, i_, u in rows[:10]]
    got_rows = list(zip(got["a"].to_pylist(), got["b"].to_pylist(),
                        got["inter"].to_pylist(), got["uni"].to_pylist(),
                        got["jac_nano"].to_pylist()))
    assert got_rows == exp
    dist = jaccard_related_topk(_ds(src, dst), k=10, num_groups=2,
                                broadcast_limit=0)
    assert dist.to_pydict() == got.to_pydict()


def test_link_prediction_known_answer(ray_session):
    from dxa_pagerank_ray.pipelines.cocitation import link_prediction_topk

    # path 0-1-2 plus star 3->{0,2}: undirected N(0)={1,3}, N(2)={1,3}
    # -> (0,2) common=2 non-edge; (1,3) common=2 non-edge; edges never
    # appear in the output even when co-neighbored
    src = [0, 1, 3, 3]
    dst = [1, 2, 0, 2]
    got = link_prediction_topk(_ds(src, dst), k=10, num_groups=2)
    rows = list(zip(got["a"].to_pylist(), got["b"].to_pylist(),
                    got["n"].to_pylist()))
    assert rows == [(0, 2, 2), (1, 3, 2)]


def test_link_prediction_brute_force(ray_session):
    from dxa_pagerank_ray.pipelines.cocitation import link_prediction_topk

    rng = np.random.default_rng(23)
    m = 400
    src = rng.integers(0, 60, m)
    dst = rng.integers(0, 60, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    got = link_prediction_topk(_ds(src, dst), k=15, num_groups=3)
    from collections import Counter, defaultdict

    nbr = defaultdict(set)
    edges = set()
    for s, d in zip(src.tolist(), dst.tolist()):
        nbr[s].add(d); nbr[d].add(s)
        edges.add((min(s, d), max(s, d)))
    c = Counter()
    for outs in nbr.values():
        outs = sorted(outs)
        for i in range(len(outs)):
            for j in range(i + 1, len(outs)):
                c[(outs[i], outs[j])] += 1
    exp = sorted(((a, b, n) for (a, b), n in c.items()
                  if (a, b) not in edges),
                 key=lambda r: (-r[2], r[0], r[1]))[:15]
    rows = list(zip(got["a"].to_pylist(), got["b"].to_pylist(),
                    got["n"].to_pylist()))
    assert rows == exp
