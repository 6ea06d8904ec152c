"""WARC source/sink: byte-exact roundtrip vs the Parquet pages path and
graph-build equivalence (same input format Common Crawl ships)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dxa_pagerank_ray.pipelines.graph_build import (
    build_link_graph,
    edges_to_numpy,
)
from dxa_pagerank_ray.sources.pages import pages_table
from dxa_pagerank_ray.sources.warc import read_warc_pages, write_warc


@pytest.mark.parametrize("suffix", [".warc", ".warc.gz"])
def test_warc_roundtrip_byte_exact(tmp_path, suffix):
    t = pages_table(48, seed=9)
    path = str(tmp_path / f"crawl{suffix}")
    assert write_warc(path, t) == 48
    got = read_warc_pages(path).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    exp = t.select(["url", "warc_ts", "html"]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == exp["url"].tolist()
    assert got["warc_ts"].tolist() == exp["warc_ts"].tolist()
    assert [bytes(x) for x in got["html"]] == \
        [bytes(x) for x in exp["html"]]


def test_warc_roundtrip_subsecond_timestamps(tmp_path):
    """timestamp[us] values with nonzero microseconds must survive the
    WARC roundtrip losslessly (WARC 1.1 fractional-second dates), and
    second-aligned values must keep the plain format."""
    ts = [1_700_000_000_000_000 + 123_456,   # fractional
          1_700_000_000_000_000]             # second-aligned
    t = pa.table({
        "url": pa.array(["http://a.test/x", "http://b.test/y"]),
        "warc_ts": pa.array(np.array(ts, dtype=np.int64),
                            pa.timestamp("us")),
        "html": pa.array([b"<html>a</html>", b"<html>b</html>"],
                         pa.binary()),
    })
    path = str(tmp_path / "frac.warc")
    assert write_warc(path, t) == 2
    raw = open(path, "rb").read()
    assert b"WARC-Date: 2023-11-14T22:13:20.123456Z" in raw
    assert b"WARC-Date: 2023-11-14T22:13:20Z" in raw
    got = read_warc_pages(path).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert [v.value // 1000 for v in got["warc_ts"]] == \
        sorted(ts, reverse=True)


def test_warc_graph_matches_parquet_path(tmp_path):
    """build_link_graph over WARC-read pages produces the identical
    edge set as over the Parquet pages source."""
    t = pages_table(64, seed=42)
    # parquet path
    g_pq = build_link_graph(rd.from_arrow(t).repartition(4),
                            num_partitions=4)
    e_pq = np.stack(edges_to_numpy(g_pq.edges), axis=1)
    # warc path, split across two files (two read tasks)
    p1 = str(tmp_path / "a.warc.gz")
    p2 = str(tmp_path / "b.warc.gz")
    write_warc(p1, t.slice(0, 32))
    write_warc(p2, t.slice(32))
    g_wc = build_link_graph(read_warc_pages([p1, p2]).materialize(),
                            num_partitions=4)
    e_wc = np.stack(edges_to_numpy(g_wc.edges), axis=1)
    assert g_wc.num_vertices == g_pq.num_vertices
    np.testing.assert_array_equal(
        e_wc[np.lexsort((e_wc[:, 1], e_wc[:, 0]))],
        e_pq[np.lexsort((e_pq[:, 1], e_pq[:, 0]))])


def test_warc_skips_non_response_records(tmp_path):
    """request/warcinfo records interleaved with responses are ignored
    (the Common-Crawl file layout)."""
    t = pages_table(3, seed=5)
    path = str(tmp_path / "mixed.warc")
    write_warc(path, t)
    raw = open(path, "rb").read()
    extra = (b"WARC/1.0\r\nWARC-Type: request\r\n"
             b"WARC-Target-URI: https://x.example/\r\n"
             b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
             b"Content-Length: 4\r\n\r\nGET /\r\n\r\n")
    # fix the length header to the actual body ("GET /" is 5 bytes)
    extra = extra.replace(b"Content-Length: 4", b"Content-Length: 5")
    open(path, "wb").write(extra + raw)
    got = read_warc_pages(path).to_pandas()
    assert len(got) == 3 and set(got["url"]) == set(t["url"].to_pylist())
