"""CLI driver (`python -m dxa_pagerank_ray ...`) — in-process via
``cli.main`` (pytest's Ray session is reused; the CLI only owns
``ray.init`` when none exists, the ray-job-submit contract)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from dxa_pagerank_ray.cli import main
from dxa_pagerank_ray.oracles.graph_oracles import pagerank_lump
from dxa_pagerank_ray.pipelines.graph_build import build_link_graph, edges_to_numpy
from dxa_pagerank_ray.sources.pages import pages_table


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages") / "pages")
    rd.from_arrow(pages_table(64, seed=42)).repartition(2).write_parquet(d)
    return d


def _read_vertex_col(out_dir: str, name: str, col: str) -> np.ndarray:
    d = os.path.join(out_dir, name)
    tabs = [pq.read_table(os.path.join(d, f)) for f in sorted(os.listdir(d))]
    import pyarrow as pa

    t = pa.concat_tables(tabs)
    v = t["v"].to_numpy(zero_copy_only=False)
    out = np.empty(len(v), dtype=t[col].to_numpy(zero_copy_only=False).dtype)
    out[v] = t[col].to_numpy(zero_copy_only=False)
    return out


def test_cli_pagerank_vs_oracle(pages_dir, tmp_path):
    out = str(tmp_path / "pr_out")
    main(["pagerank", "--pages", pages_dir, "--out", out,
          "--partitions", "3", "--threshold", "1e-8"])
    stats = json.load(open(os.path.join(out, "statistics.json")))
    assert stats["ALGORITHM"] == "pagerank" and stats["CONVERGED"]
    assert len(stats["rounds_table"]) == stats["NUM_ROUNDS"]
    pr = _read_vertex_col(out, "ranks", "pr")
    g = build_link_graph(rd.read_parquet(pages_dir), num_partitions=3)
    src, dst = edges_to_numpy(g.edges)
    exp, _, _ = pagerank_lump(src, dst, g.num_vertices, 0.85, 1e-8, 100)
    np.testing.assert_allclose(pr, exp, atol=1e-6, rtol=0)
    # url mapping written alongside
    assert os.path.isdir(os.path.join(out, "url_ids"))


def test_cli_components_and_triangles_on_edges(tmp_path):
    import pyarrow as pa

    edges_dir = str(tmp_path / "edges")
    # two components {0,1,2} (a triangle) and {3,4}
    t = pa.table({"src": pa.array([0, 1, 2, 3], pa.int64()),
                  "dst": pa.array([1, 2, 0, 4], pa.int64())})
    rd.from_arrow(t).write_parquet(edges_dir)

    out = str(tmp_path / "cc_out")
    main(["components", "--edges", edges_dir, "--out", out])
    labels = _read_vertex_col(out, "labels", "label")
    np.testing.assert_array_equal(labels, [0, 0, 0, 3, 3])

    out2 = str(tmp_path / "tri_out")
    main(["triangles", "--edges", edges_dir, "--out", out2])
    stats = json.load(open(os.path.join(out2, "statistics.json")))
    assert stats["NUM_TRIANGLES"] == 1

    # k-core: the triangle is the 2-core, the pendant pair core 1
    out3 = str(tmp_path / "kcore_out")
    main(["kcore", "--edges", edges_dir, "--out", out3])
    cores = _read_vertex_col(out3, "labels", "label")
    np.testing.assert_array_equal(cores, [2, 2, 2, 1, 1])

    # directed BFS from 0: around the triangle; 3->4 unreached (n=5)
    out4 = str(tmp_path / "bfs_out")
    main(["bfs", "--edges", edges_dir, "--out", out4, "--seeds", "0",
          "--max-depth", "8"])
    depths = _read_vertex_col(out4, "depths", "label")
    np.testing.assert_array_equal(depths, [0, 1, 2, 5, 5])

    # whole-graph diagnostics: 4 directed edges, none reciprocal
    out5 = str(tmp_path / "stats_out")
    main(["stats", "--edges", edges_dir, "--out", out5])
    stats = json.load(open(os.path.join(out5, "statistics.json")))
    assert stats["NUM_EDGES"] == 4 and stats["N_RECIPROCAL_EDGES"] == 0
    assert stats["ASSORTATIVITY_MOMENTS"]["n_edges"] == 4
    assert os.path.isdir(os.path.join(out5, "out_degrees"))


def test_cli_pagerank_text_format(pages_dir, tmp_path):
    """--format text: '<v> <pr>' plain-decimal lines (no scientific
    notation), values roundtripping to the parquet ranks."""
    out = str(tmp_path / "txt_out")
    main(["pagerank", "--pages", pages_dir, "--out", out,
          "--partitions", "3", "--threshold", "1e-8", "--format", "text"])
    d = os.path.join(out, "ranks")
    files = sorted(os.listdir(d))
    assert files and all(f.endswith(".pageRank") for f in files)
    vals = {}
    for f in files:
        for line in open(os.path.join(d, f)):
            v, pr = line.split()
            assert "e" not in pr and "E" not in pr  # plain decimal
            vals[int(v)] = float(pr)
    assert abs(sum(vals.values()) - 1.0) < 1e-6
    assert sorted(vals) == list(range(len(vals)))


def test_cli_resume_roundtrip(pages_dir, tmp_path):
    out1 = str(tmp_path / "a")
    ck = str(tmp_path / "ck")
    main(["pagerank", "--pages", pages_dir, "--out", out1,
          "--threshold", "1e-8", "--max-rounds", "4",
          "--checkpoint-dir", ck, "--checkpoint-every", "2"])
    out2 = str(tmp_path / "b")
    main(["pagerank", "--pages", pages_dir, "--out", out2,
          "--threshold", "1e-8", "--checkpoint-dir", ck, "--resume"])
    stats = json.load(open(os.path.join(out2, "statistics.json")))
    assert stats["RESUMED_FROM"] == 4 and stats["CONVERGED"]


SF_DOCS = "/root/testdata/sf0.001/documents.parquet"
SF_EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_cli_dedup_exact_and_minhash(tmp_path):
    out = str(tmp_path / "dx")
    main(["dedup", "--docs", SF_DOCS, "--out", out, "--method", "exact"])
    stats = json.load(open(os.path.join(out, "statistics.json")))
    assert stats["ALGORITHM"] == "dedup_exact" and stats["ROWS"] == 500

    out2 = str(tmp_path / "dm")
    main(["dedup", "--docs", SF_DOCS, "--out", out2, "--method", "minhash"])
    import __ray_entry__ as entrymod

    exp = entrymod.queries()["minhash_dup_pairs"](
        "/root/testdata/sf0.001").count()
    stats2 = json.load(open(os.path.join(out2, "statistics.json")))
    assert stats2["ROWS"] == exp


def test_cli_ann_and_textops(tmp_path):
    out = str(tmp_path / "ann")
    main(["ann", "--embeddings", SF_EMB, "--out", out, "--k", "10"])
    t = pq.read_table(os.path.join(out, "neighbors.parquet"))
    assert t.num_rows == 30
    assert t.column_names == ["query_id", "neighbor_id", "rank"]

    out2 = str(tmp_path / "tx")
    main(["textops", "--docs", SF_DOCS, "--out", out2,
          "--ops", "tokens,lang,ttr,repetition"])
    stats = json.load(open(os.path.join(out2, "statistics.json")))
    assert stats["ROWS"] == {"tokens": 500, "lang": 500,
                             "ttr": 500, "repetition": 500}
    t = pq.read_table(os.path.join(out2, "ttr"))
    assert t.column_names == ["doc_id", "n_tokens", "n_types", "ttr_nano"]


def test_cli_partition_edges_roundtrip(pages_dir, tmp_path):
    """partition-edges -> pagerank --edges <layout> must use the
    per-shard fast path and produce ranks identical to the direct
    pages run at the same partitions."""
    out_direct = str(tmp_path / "direct")
    main(["pagerank", "--pages", pages_dir, "--out", out_direct,
          "--partitions", "4", "--threshold", "1e-8"])

    edir = str(tmp_path / "edges_part")
    main(["partition-edges", "--pages", pages_dir, "--out", edir,
          "--partitions", "4"])
    assert os.path.exists(os.path.join(edir, "_edges_meta.json"))

    out_fast = str(tmp_path / "fast")
    main(["pagerank", "--edges", edir, "--out", out_fast,
          "--partitions", "4", "--threshold", "1e-8"])

    pr_a = _read_vertex_col(out_direct, "ranks", "pr")
    pr_b = _read_vertex_col(out_fast, "ranks", "pr")
    assert np.array_equal(pr_a, pr_b)

    # mismatched --partitions falls back to the Dataset load (reads
    # part=p dirs as plain hive parquet) and still agrees — to ulps
    # only: a different P changes the p-ordered reduction order
    out_slow = str(tmp_path / "slow")
    main(["pagerank", "--edges", edir, "--out", out_slow,
          "--partitions", "2", "--threshold", "1e-8"])
    pr_c = _read_vertex_col(out_slow, "ranks", "pr")
    np.testing.assert_allclose(pr_c, pr_a, atol=1e-12, rtol=0)


def test_cli_canonicalize(pages_dir, tmp_path):
    out = str(tmp_path / "canon")
    # pre-existing sibling output must SURVIVE (only out/canonical is
    # cleared — the repo-wide CLI contract)
    os.makedirs(os.path.join(out, "other"), exist_ok=True)
    open(os.path.join(out, "other", "keep.txt"), "w").write("x")
    main(["canonicalize", "--pages", pages_dir, "--out", out])
    assert os.path.exists(os.path.join(out, "other", "keep.txt"))
    t = pq.read_table(os.path.join(out, "canonical"))
    assert t.column_names == ["url", "canonical_url"]
    assert t.num_rows > 0
    from dxa_pagerank_ray.functions.urls import canonicalize_urls
    assert (t["canonical_url"].to_pylist()
            == canonicalize_urls(t["url"]).to_pylist())
