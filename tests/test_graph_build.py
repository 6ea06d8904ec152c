"""Graph build: link extraction -> dense ids -> dedup edges -> degrees,
verified against the fixture's ground-truth edge set."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dxa_pagerank_ray.pipelines.graph_build import (
    build_link_graph,
    dedup_edges,
    edges_to_numpy,
    out_degree_table,
)
from dxa_pagerank_ray.sources.pages import expected_links, pages_table
from dxa_pagerank_ray.stages.ids import assign_dense_ids, hash64


def _expected_graph(n_pages: int, seed: int):
    """Ground-truth dense-id graph, mirroring the engine's id rule:
    dense ids assigned in sorted-url order over pages ∪ link targets."""
    src_urls, dst_urls = expected_links(n_pages, seed=seed)
    from dxa_pagerank_ray.sources.pages import default_domains, url_of

    nd = default_domains(n_pages)
    universe = sorted(
        {url_of(i, nd) for i in range(n_pages)} | set(src_urls) | set(dst_urls)
    )
    idx = {u: i for i, u in enumerate(universe)}
    pairs = sorted({(idx[s], idx[d]) for s, d in zip(src_urls, dst_urls)})
    return universe, pairs


def test_build_link_graph_matches_ground_truth():
    n_pages, seed = 64, 42
    pages = rd.from_arrow(pages_table(n_pages, seed=seed)).repartition(8)
    g = build_link_graph(pages, num_partitions=4)
    universe, exp_pairs = _expected_graph(n_pages, seed)

    assert g.num_vertices == len(universe)
    mapping = g.url_ids.to_pandas().sort_values("v")
    assert list(mapping["url"]) == universe  # sorted-url dense assignment
    assert list(mapping["v"]) == list(range(len(universe)))

    src, dst = edges_to_numpy(g.edges)
    got_pairs = sorted(zip(src.tolist(), dst.tolist()))
    assert got_pairs == exp_pairs  # deduplicated exactly
    assert len(got_pairs) == len(set(got_pairs))


def test_dedup_edges_collapses_duplicates():
    t = pa.table({"src": [1, 1, 2, 1], "dst": [2, 2, 3, 2]})
    out = dedup_edges(rd.from_arrow(t)).to_pandas()
    assert sorted(map(tuple, out[["src", "dst"]].values.tolist())) == [(1, 2), (2, 3)]


def test_out_degree_table():
    t = pa.table({"src": [0, 0, 0, 2], "dst": [1, 2, 3, 0]})
    out = out_degree_table(rd.from_arrow(t)).to_pandas().set_index("v")["outdeg"]
    assert out[0] == 3 and out[2] == 1
    assert 1 not in out.index  # dangling vertices absent from the table


def test_assign_dense_ids_is_sorted_and_dense():
    vals = [f"k{i:03d}" for i in range(100)]
    rng = np.random.default_rng(3)
    shuffled = [vals[i] for i in rng.permutation(100)]
    ds = rd.from_arrow(pa.table({"url": shuffled})).repartition(7)
    out = assign_dense_ids(ds, "url", "v").to_pandas().sort_values("v")
    assert list(out["url"]) == vals
    assert list(out["v"]) == list(range(100))


def test_hash64_stable_and_distinct():
    a = hash64(["x", "y", "x"])
    assert a[0] == a[2] != a[1]
    assert (a >= 0).all()
    # pinned value — stability across runs/processes
    assert int(a[0]) == int(hash64(["x"])[0])


def test_map_ids_broadcast_survives_hash_collisions(monkeypatch):
    """Force every url onto ONE 64-bit hash: the broadcast id join must
    resolve all endpoints exactly through the collision side table
    instead of silently picking an arbitrary winner."""
    import dxa_pagerank_ray.stages.ids as ids_mod
    from dxa_pagerank_ray.pipelines.graph_build import _map_ids_broadcast

    def colliding_hash64(urls):
        urls = list(urls) if isinstance(urls, list) else urls
        return np.zeros(len(urls), dtype=np.int64)

    monkeypatch.setattr(ids_mod, "hash64", colliding_hash64)

    urls = [f"u{i}" for i in range(8)]
    mapping = rd.from_arrow(
        pa.table({"url": urls, "v": pa.array(range(8), pa.int64())})
    ).repartition(3)
    links = rd.from_arrow(
        pa.table({"src_url": [urls[i] for i in (0, 3, 7, 5)],
                  "dst_url": [urls[i] for i in (1, 2, 6, 0)]})
    ).repartition(2)
    out = _map_ids_broadcast(links, mapping).to_pandas()
    got = sorted(zip(out["src"], out["dst"]))
    assert got == [(0, 1), (3, 2), (5, 0), (7, 6)]


def test_host_edges_matches_ground_truth():
    """Host collapse vs the fixture's ground-truth link list collapsed
    in plain Python (duplicates preserved as n_links weight)."""
    from collections import Counter

    from dxa_pagerank_ray.pipelines.graph_build import host_edges

    pages = rd.from_arrow(pages_table(96, seed=7)).repartition(4)
    got = host_edges(pages).to_pandas()
    src, dst = expected_links(96, seed=7)
    host = lambda u: u.split("/")[2]
    exp = Counter((host(a), host(b)) for a, b in zip(src, dst))
    got_map = {(r.src_host, r.dst_host): r.n_links
               for r in got.itertuples()}
    assert got_map == dict(exp)
    assert got["n_links"].max() > 1  # duplicate hrefs exercised
