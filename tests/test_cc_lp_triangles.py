"""CC (exact), label propagation (exact), triangle count (exact) vs
numpy oracles, on micro-graphs and the built link graph."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dxa_pagerank_ray.oracles import graph_oracles as oracle
from dxa_pagerank_ray.pipelines.components import connected_components
from dxa_pagerank_ray.pipelines.graph_build import build_link_graph, edges_to_numpy
from dxa_pagerank_ray.pipelines.labelprop import label_propagation
from dxa_pagerank_ray.pipelines.triangles import triangle_count
from dxa_pagerank_ray.sources.pages import pages_table

CASES = {
    # two chains + isolated vertex
    "two_chains": (np.array([0, 1, 3, 4]), np.array([1, 2, 4, 3]), 6),
    # K3 plus pendant + planted extra triangle 4-5-6
    "k3_pendant": (np.array([0, 1, 2, 2, 4, 5, 6]),
                   np.array([1, 2, 0, 3, 5, 6, 4]), 7),
    # duplicate + reversed edges (must not double count)
    "dups": (np.array([0, 0, 1, 2, 1]), np.array([1, 1, 2, 0, 0]), 3),
    # star
    "star": (np.zeros(5, dtype=np.int64), np.arange(1, 6), 6),
}


def _ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).materialize()


@pytest.mark.parametrize("name", list(CASES))
def test_connected_components_exact(name):
    src, dst, n = CASES[name]
    got = connected_components(_ds(src, dst), n)
    exp = oracle.connected_components(src, dst, n)
    np.testing.assert_array_equal(got.labels, exp)


@pytest.mark.parametrize("name", list(CASES))
def test_label_propagation_exact(name):
    src, dst, n = CASES[name]
    got = label_propagation(_ds(src, dst), n, rounds=7)
    exp = oracle.label_propagation(src, dst, n, rounds=7)
    np.testing.assert_array_equal(got.labels, exp)


@pytest.mark.parametrize("name", list(CASES))
def test_triangle_count_shuffle_matches_broadcast(name):
    from dxa_pagerank_ray.pipelines.triangles import triangle_count_shuffle

    src, dst, n = CASES[name]
    expect = triangle_count(_ds(src, dst), n)
    got = triangle_count_shuffle(_ds(src, dst), num_partitions=4)
    assert got == expect


@pytest.mark.parametrize("name", list(CASES))
def test_triangle_count_shuffle_distributed_degrees(name):
    """degree_broadcast_limit=0 forces the co-grouped degree-attach
    path (the web-scale V shape) — counts must match the broadcast
    engine on both sides of the guard."""
    from dxa_pagerank_ray.pipelines.triangles import triangle_count_shuffle

    src, dst, n = CASES[name]
    expect = triangle_count(_ds(src, dst), n)
    got = triangle_count_shuffle(_ds(src, dst), num_partitions=4,
                                 degree_broadcast_limit=0)
    assert got == expect


@pytest.mark.parametrize("name", list(CASES))
def test_triangle_count_exact(name):
    src, dst, n = CASES[name]
    assert triangle_count(_ds(src, dst), n) == oracle.triangle_count(src, dst, n)


def test_all_on_built_link_graph():
    pages = rd.from_arrow(pages_table(64, seed=42)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    src, dst = edges_to_numpy(g.edges)
    n = g.num_vertices

    cc = connected_components(g.edges, n)
    np.testing.assert_array_equal(cc.labels, oracle.connected_components(src, dst, n))

    lp = label_propagation(g.edges, n, rounds=5)
    np.testing.assert_array_equal(
        lp.labels, oracle.label_propagation(src, dst, n, rounds=5)
    )

    assert triangle_count(g.edges, n) == oracle.triangle_count(src, dst, n)


@pytest.mark.parametrize("name", list(CASES))
def test_triangle_count_dispatches_to_shuffle(name):
    """broadcast_limit=0 forces the default entry point onto the
    all-shuffle engine; counts must be identical."""
    src, dst, n = CASES[name]
    expect = oracle.triangle_count(src, dst, n)
    assert triangle_count(_ds(src, dst), n, broadcast_limit=0) == expect


def test_per_vertex_triangles_tiers_agree(ray_session):
    """Per-vertex counts: known answer, corner-sum = 3x total count,
    and broadcast/shuffle tier equality on a built graph."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dxa_pagerank_ray.pipelines.triangles import (
        per_vertex_triangles,
        triangle_count,
    )

    tri = pa.table({"src": pa.array([0, 1, 2, 2], pa.int64()),
                    "dst": pa.array([1, 2, 0, 3], pa.int64())})
    got = per_vertex_triangles(rd.from_arrow(tri), 4).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert got["v"].tolist() == [0, 1, 2]
    assert got["triangles"].tolist() == [1, 1, 1]

    from dxa_pagerank_ray.pipelines.graph_build import build_link_graph
    from dxa_pagerank_ray.sources.pages import pages_table

    g = build_link_graph(rd.from_arrow(pages_table(120, seed=9)),
                         num_partitions=4)
    edges = g.edges.materialize()
    bc = per_vertex_triangles(edges, g.num_vertices).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    sh = per_vertex_triangles(edges, g.num_vertices, broadcast_limit=0) \
        .to_pandas().sort_values("v").reset_index(drop=True)
    assert bc.equals(sh)
    total = triangle_count(edges, g.num_vertices)
    assert int(bc["triangles"].sum()) == 3 * total
    assert (bc["triangles"] > 0).all()


def test_clustering_coefficients(ray_session):
    """Local coefficients: known answer on the 'kite' graph (triangle
    0-1-2 plus pendant 2-3), tier equality under a forced shuffle
    dispatch, and the global summary's exact integer identities."""
    import pyarrow as pa
    import ray.data as rd

    from dxa_pagerank_ray.pipelines.triangles import (
        clustering_coefficients,
        global_clustering,
    )

    kite = pa.table({"src": pa.array([0, 1, 2, 2], pa.int64()),
                     "dst": pa.array([1, 2, 0, 3], pa.int64())})
    got = clustering_coefficients(rd.from_arrow(kite), 4).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert got["v"].tolist() == [0, 1, 2, 3]
    assert got["deg"].tolist() == [2, 2, 3, 1]
    assert got["triangles"].tolist() == [1, 1, 1, 0]
    # lcc: v0=v1=1.0, v2=2*1/(3*2)=1/3 floor-div nano, v3 deg<2 -> 0
    third = (2 * 10**9) // 6
    assert got["lcc_nano"].tolist() == [10**9, 10**9, third, 0]

    g = global_clustering(rd.from_arrow(kite), 4)
    assert g["n_vertices"][0].as_py() == 4
    # wedges: C(2,2)+C(2,2)+C(3,2)+0 = 1+1+3 = 5; transitivity 3*1/5
    assert g["n_wedges"][0].as_py() == 5
    assert g["n_triangles"][0].as_py() == 1
    assert g["transitivity_nano"][0].as_py() == (3 * 10**9) // 5
    assert g["avg_lcc_nano"][0].as_py() == \
        (10**9 + 10**9 + third + 0) // 4

    from dxa_pagerank_ray.pipelines.graph_build import build_link_graph
    from dxa_pagerank_ray.sources.pages import pages_table

    gg = build_link_graph(rd.from_arrow(pages_table(120, seed=9)),
                          num_partitions=4)
    edges = gg.edges.materialize()
    bc = clustering_coefficients(edges, gg.num_vertices).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    sh = clustering_coefficients(edges, gg.num_vertices,
                                 broadcast_limit=0).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert bc.equals(sh)
    assert (bc["lcc_nano"] <= 10**9).all()
