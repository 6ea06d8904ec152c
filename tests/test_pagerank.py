"""PageRank engine vs the numpy lump-semantics oracle (FIXTURES.md F5.1):
allclose atol=1e-6 (north_rule), sum(PR)=1, round-error trace agreement."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dxa_pagerank_ray.oracles.graph_oracles import pagerank_lump
from dxa_pagerank_ray.pipelines.graph_build import (
    build_link_graph,
    dedup_edges,
    edges_to_numpy,
)
from dxa_pagerank_ray.pipelines.pagerank import pagerank
from dxa_pagerank_ray.sources.edgelist import README7, parse_edgelist
from dxa_pagerank_ray.sources.pages import pages_table

MICROGRAPHS = {
    "readme7": README7,
    "chain5": "0\n1\n2\n3\n4\n",
    "star6": "0\n1\n1\n1\n1\n1\n",  # vertex 1 -> all others? no: in-lists
    "alldangling3": "0\n0\n0\n",
    "single1": "0\n",
    "dupes4": "2 2 3\n0\n1\n1 1\n",
}


def _graph_from_text(text: str, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text(text)
    t, n = parse_edgelist(str(p))
    return t, n


@pytest.mark.parametrize("name", list(MICROGRAPHS))
def test_pagerank_micrographs_vs_oracle(name, tmp_path):
    t, n = _graph_from_text(MICROGRAPHS[name], tmp_path)
    # engine runs on the deduplicated edge table (first-class stage)
    edges = dedup_edges(rd.from_arrow(t)).materialize() if t.num_rows else (
        rd.from_arrow(t).materialize()
    )
    src, dst = edges_to_numpy(edges) if t.num_rows else (
        np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    )
    exp_pr, exp_rounds, exp_errs = pagerank_lump(src, dst, n, 0.85, 1e-9, 200)
    res = pagerank(edges, n, damping=0.85, threshold=1e-9, max_rounds=200)
    assert res.rounds == exp_rounds
    np.testing.assert_allclose(res.pr, exp_pr, atol=1e-6, rtol=0)
    np.testing.assert_allclose(res.errs, exp_errs, rtol=1e-6, atol=1e-12)
    assert abs(res.pr.sum() - 1.0) < 1e-9


def test_pagerank_on_built_link_graph():
    pages = rd.from_arrow(pages_table(64, seed=42)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    src, dst = edges_to_numpy(g.edges)
    exp_pr, exp_rounds, _ = pagerank_lump(src, dst, g.num_vertices, 0.85, 1e-8, 100)
    res = pagerank(g.edges, g.num_vertices, damping=0.85, threshold=1e-8)
    assert res.converged and res.rounds == exp_rounds
    np.testing.assert_allclose(res.pr, exp_pr, atol=1e-6, rtol=0)
    assert abs(res.pr.sum() - 1.0) < 1e-9


def test_pagerank_duplicate_edges_are_deduped(tmp_path):
    """dupes4 has a repeated in-neighbor: raw parse keeps it (reference
    counts it twice, ReadLumpInEdgeListTask.java:69-71) but the engine's
    dedup stage collapses it before PageRank."""
    t, n = _graph_from_text(MICROGRAPHS["dupes4"], tmp_path)
    assert t.num_rows == 6  # duplicates preserved by the parser
    deduped = dedup_edges(rd.from_arrow(t)).materialize()
    assert deduped.count() == 4


def test_pagerank_checkpoint_resume(tmp_path):
    pages = rd.from_arrow(pages_table(64, seed=42)).repartition(4)
    g = build_link_graph(pages, num_partitions=4)
    ck = str(tmp_path / "ck")

    full = pagerank(g.edges, g.num_vertices, threshold=1e-8, max_rounds=40)
    # run only 5 rounds, checkpointing every 2 (last complete ckpt: 4)
    partial = pagerank(g.edges, g.num_vertices, threshold=1e-8, max_rounds=5,
                       checkpoint_dir=ck, checkpoint_every=2)
    assert not partial.converged
    resumed = pagerank(g.edges, g.num_vertices, threshold=1e-8, max_rounds=40,
                       checkpoint_dir=ck, resume=True)
    assert resumed.resumed_from == 4
    assert resumed.rounds == full.rounds
    np.testing.assert_allclose(resumed.pr, full.pr, atol=1e-12, rtol=0)
    np.testing.assert_allclose(resumed.errs, full.errs, rtol=1e-9, atol=1e-15)


def test_pagerank_all_dangling(tmp_path):
    t, n = _graph_from_text(MICROGRAPHS["alldangling3"], tmp_path)
    res = pagerank(rd.from_arrow(t).materialize(), n, threshold=1e-9)
    # no edges: every vertex ends at uniform 1/N after restore
    np.testing.assert_allclose(res.pr, np.full(n, 1 / n), atol=1e-12)
