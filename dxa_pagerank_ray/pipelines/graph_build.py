"""Pages -> deduplicated edge table -> degree tables (SURVEY.md §2.11,
§3.4).

Replaces the reference's two-pass edge-list file reader
(``ReadLumpInEdgeListTask.java:53-128``: pass 1 counts out-degrees, pass
2 builds per-slave in-edge lists) with a single streamed extraction plus
groupby-aggregates — the parsed link Dataset is produced once and both
degrees and adjacency derive from it.

Shuffle keys per stage (documented per SURVEY.md §4): distinct urls —
``url``; dense-id assignment — range shuffle on ``url``; id join —
``src_url`` / ``dst_url`` hash partitions; exact edge dedup —
``(src, dst)``; out-degrees — ``src``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..context import BROADCAST_VERTEX_LIMIT
from ..functions.html_fast import fast_text_and_links as extract_text_and_links
from ..stages.ids import assign_dense_ids

_LINK_SCHEMA = pa.schema([("src_url", pa.string()), ("dst_url", pa.string())])


def extract_stage(pages_ds, batch_size: int = 256):
    """pages -> ``(url, text, links:list<string>)`` — one parse per page
    (stateless ``map_batches``; html never leaves this stage, so the
    heavy binary column is dropped as early as possible)."""

    def ex(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        texts, links = [], []
        for u, h in zip(urls, htmls):
            t, ls = extract_text_and_links(h, u)
            texts.append(t)
            links.append(ls)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "text": pa.array(texts, pa.string()),
                "links": pa.array(links, pa.list_(pa.string())),
            }
        )

    return pages_ds.map_batches(ex, batch_format="pyarrow", batch_size=batch_size)


def extract_text_stage(pages_ds, batch_size: int = 256):
    """pages -> ``(url, text)`` (byte-identity surface vs the oracle)."""
    return extract_stage(pages_ds, batch_size).select_columns(["url", "text"])


def extract_links_stage(pages_ds, batch_size: int = 256):
    """pages -> ``links(src_url, dst_url)``, duplicates preserved
    (dedup is its own stage, SURVEY.md §2.7)."""

    def flatten(batch: pa.Table) -> pa.Table:
        links = batch["links"]
        n_per_row = pa.compute.list_value_length(links).fill_null(0).to_numpy(
            zero_copy_only=False
        )
        src = pa.compute.list_parent_indices(links).to_numpy(zero_copy_only=False)
        flat = pa.compute.list_flatten(links)
        src_urls = pa.compute.take(batch["url"], pa.array(src))
        del n_per_row
        return pa.Table.from_arrays([src_urls, flat], schema=_LINK_SCHEMA)

    return (
        extract_stage(pages_ds, batch_size)
        .select_columns(["url", "links"])
        .map_batches(flatten, batch_format="pyarrow")
    )


def anchor_texts_stage(pages_ds, batch_size: int = 256):
    """pages -> ``(src_url, dst_url, anchor)`` — anchor-text pairs in
    document order, duplicates preserved (``functions.html
    .extract_anchor_texts``).  Stateless ``map_batches``; the html
    column is dropped at this stage like ``extract_stage``."""
    from ..functions.html import extract_anchor_texts

    def ex(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        src, dst, txt = [], [], []
        for u, h in zip(urls, htmls):
            for t_url, t_txt in extract_anchor_texts(h, u):
                src.append(u)
                dst.append(t_url)
                txt.append(t_txt)
        return pa.table({"src_url": pa.array(src, pa.string()),
                         "dst_url": pa.array(dst, pa.string()),
                         "anchor": pa.array(txt, pa.string())})

    return pages_ds.map_batches(ex, batch_format="pyarrow",
                                batch_size=batch_size)


def local_distinct(batch: pa.Table) -> pa.Table:
    """Within-batch distinct (pre-combine before the global shuffle)."""
    return batch.group_by(batch.column_names).aggregate([])


def dedup_edges(edges_ds, num_partitions: int | None = None):
    """Exact edge dedup — first-class stage (north_star "deduplicated
    edge table").  Two-level: per-batch distinct (map-side combine, no
    shuffle), then a COARSE hash-partition groupby with one vectorized
    lexsort-distinct per partition.

    The coarse key (not ``groupby(["src","dst"])``) matters at scale: a
    2-key global sort-aggregate over ~|E| near-singleton groups
    degenerates into a single long reduce (measured: one core pegged
    >25 min at E=256M), while a small-cardinality int key shuffles once
    and each partition dedups in one numpy pass.  Inputs whose
    metadata-estimated size fits one coarse group skip the
    sort-shuffle entirely (repartition(1) + one distinct pass — the
    same fast path as ``stages/agg.py``; Ray's sort has seconds of
    fixed sampling/exchange cost that dominated every small-sf graph
    query)."""
    from ..context import derive_num_groups
    from ..stages.agg import _fits_one_group

    pre = edges_ds.map_batches(local_distinct, batch_format="pyarrow")
    small = num_partitions is None and _fits_one_group(edges_ds)
    G = 1 if small else (num_partitions or derive_num_groups(edges_ds))

    def add_part(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        part = (s * np.int64(1_000_003) + d) % np.int64(G)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def distinct(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])] \
            if len(s) else np.array([], dtype=bool)
        return pa.table({"src": pa.array(s[keep], pa.int64()),
                         "dst": pa.array(d[keep], pa.int64())})

    if small:
        import ray

        out = pre.repartition(1).map_batches(
            distinct, batch_format="pyarrow", batch_size=None)
        # split back out to cluster width (plain block split, no sort):
        # Ray's sort/groupby shuffles emit as many partitions as input
        # BLOCKS, so leaving the fast path's single block would
        # serialize every downstream pair sweep / coarse combine onto
        # one core (measured: coupling_top20's whole 7M-pair sweep ran
        # as one 2.4s single-CPU task off the 1-block edge table)
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        return out.repartition(2 * cpus)
    return pre.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(distinct, batch_format="pyarrow")


def hosts_of(urls):
    """Vectorized netloc extraction (one RE2 C call per batch):
    ``https://sub.example.com/p/1`` -> ``sub.example.com``.  Input urls
    are normalized (``functions.html.normalize_url``) so the scheme is
    always present and the netloc lowercase."""
    import pyarrow.compute as pc

    return pc.replace_substring_regex(
        urls, pattern=r"^https?://([^/]+).*$", replacement=r"\1"
    )


def host_edges(pages_ds, batch_size: int = 256):
    """pages -> ``(src_host, dst_host, n_links)`` — the host-level
    collapse of the page link graph (the standard first aggregation of
    a web crawl: host graphs are ~3 orders of magnitude smaller than
    page graphs and drive host-level PageRank / spam analyses).

    Page-level duplicates are PRESERVED as link weight: ``n_links``
    counts every anchor, so the collapse is a pure aggregation of the
    extraction output (no dedup stage in between).  Shape: stateless
    extract ``map_batches`` -> vectorized host slice -> ``coarse_agg``
    on (src_host, dst_host) — map-side combine first, so only
    host-pair partials (tiny vs page links) enter the shuffle."""
    from ..stages.agg import coarse_agg

    links = extract_links_stage(pages_ds, batch_size)

    def to_hosts(batch: pa.Table) -> pa.Table:
        return pa.table({"src_host": hosts_of(batch["src_url"]),
                         "dst_host": hosts_of(batch["dst_url"])})

    pairs = links.map_batches(to_hosts, batch_format="pyarrow")
    return coarse_agg(pairs, ["src_host", "dst_host"],
                      [("src_host", "count", "n_links")])


def host_graph_dense(pairs_ds, num_partitions: int = 32,
                     weighted: bool = False) -> "LinkGraph":
    """``(src_host, dst_host[, n_links])`` pairs -> ``LinkGraph`` over
    hosts: self-host (intra-site) edges dropped, ids dense in
    sorted-host order (``assign_dense_ids``, same determinism contract
    as the page graph).  Default UNWEIGHTED — one edge per distinct
    inter-host pair; ``weighted=True`` keeps ``n_links`` as the edge
    weight column ``w`` for the weighted PageRank
    (``PageRankCSR(weighted=True)``).  Feeds the host-level PageRank,
    the standard web ranking granularity above pages."""
    import pyarrow.compute as pc

    def drop_self(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(batch["src_host"], batch["dst_host"]))
        t = batch.filter(keep)
        cols = {"src_url": t["src_host"], "dst_url": t["dst_host"]}
        if weighted:
            cols["w"] = pc.cast(t["n_links"], pa.float64())
        return pa.table(cols)

    links = pairs_ds.map_batches(drop_self, batch_format="pyarrow") \
        .materialize()
    from ..stages.agg import coarse_distinct

    src_u = links.select_columns(["src_url"]).rename_columns(
        {"src_url": "url"})
    dst_u = links.select_columns(["dst_url"]).rename_columns(
        {"dst_url": "url"})
    hosts = coarse_distinct(src_u.union(dst_u), ["url"])
    mapping = assign_dense_ids(hosts, "url", "v").materialize()
    n = mapping.count()
    if n <= BROADCAST_VERTEX_LIMIT:
        e = _map_ids_broadcast(links, mapping)
    else:  # pragma: no cover - host universes beyond 1e7 hosts
        e = links.join(mapping, join_type="inner",
                       num_partitions=num_partitions,
                       on=("src_url",), right_on=("url",))
        e = e.rename_columns({"v": "src"})
        e = e.join(mapping, join_type="inner",
                   num_partitions=num_partitions,
                   on=("dst_url",), right_on=("url",))
        e = e.rename_columns({"v": "dst"}).select_columns(
            ["src", "dst"] + (["w"] if weighted else []))
    # input pairs are already distinct (host_edges aggregates), and the
    # host->id map is injective, so no dedup stage is needed here
    return LinkGraph(edges=e.materialize(), num_vertices=int(n),
                     url_ids=mapping)


def out_degree_table(edges_ds):
    """``(v, outdeg)`` over deduplicated edges (A1 of SURVEY.md §2.6);
    map-side partial counts then a coarse-partition combine — key
    cardinality is |V|, which degenerates Ray's sort-aggregate
    (see stages/agg.py)."""
    from ..stages.agg import coarse_agg

    out = coarse_agg(edges_ds, ["src"], [("src", "count", "outdeg")])
    return out.rename_columns({"src": "v"})


@dataclass
class LinkGraph:
    """A built link graph: dense-id edges + vertex universe.

    ``edges`` is a materialized Dataset ``(src:int64, dst:int64)``,
    deduplicated, ids dense in ``0..num_vertices-1`` assigned by sorted
    url order (deterministic).  ``url_ids`` maps ``url -> v``.
    """

    edges: "object"
    num_vertices: int
    url_ids: "object | None" = None


def build_link_graph(pages_ds, num_partitions: int = 32,
                     batch_size: int = 256) -> LinkGraph:
    """pages -> LinkGraph.

    Vertex universe = page urls ∪ link-target urls (external targets
    become dangling vertices, mirroring the reference where every id in
    ``1..N`` is a vertex whether or not it has edges,
    ``ReadLumpInEdgeListTask.java:86-128``).
    """
    links = extract_links_stage(pages_ds, batch_size).materialize()

    page_urls = pages_ds.select_columns(["url"])
    dst_urls = links.select_columns(["dst_url"]).rename_columns({"dst_url": "url"})
    all_urls = page_urls.union(dst_urls)
    from ..stages.agg import coarse_distinct

    distinct_urls = coarse_distinct(all_urls, ["url"])
    mapping = assign_dense_ids(distinct_urls, "url", "v").materialize()
    n = mapping.count()

    if links.count() == 0:
        # Empty link set: hash joins on an empty left side lose the
        # schema (empty shuffle partitions carry no columns), so short-
        # circuit with an explicitly-typed empty edge table.
        import ray.data as rd

        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
        return LinkGraph(edges=rd.from_arrow(empty).materialize(),
                         num_vertices=int(n), url_ids=mapping)

    if n <= BROADCAST_VERTEX_LIMIT:
        # Broadcast id lookup: ship (sorted url-hash, dense id) numpy
        # arrays once via ray.put (16 B/vertex — ~160 MB at the 1e7
        # limit) and resolve both endpoints per batch with searchsorted.
        # No shuffle at all for the id join; this is the default path.
        e = _map_ids_broadcast(links, mapping)
    else:
        # Scale path: two hash-partitioned joins.  NOTE Ray 2.49's hash
        # join breaks on *empty* right partitions, which can only occur
        # for tiny inputs — unreachable here since n > the broadcast
        # limit guarantees dense partitions.
        e = links.join(mapping, join_type="inner",
                       num_partitions=num_partitions,
                       on=("src_url",), right_on=("url",))
        e = e.rename_columns({"v": "src"})
        e = e.join(mapping, join_type="inner",
                   num_partitions=num_partitions,
                   on=("dst_url",), right_on=("url",))
        e = e.rename_columns({"v": "dst"}).select_columns(["src", "dst"])
    edges = dedup_edges(e, num_partitions).materialize()
    return LinkGraph(edges=edges, num_vertices=int(n), url_ids=mapping)


def _map_ids_broadcast(links, mapping):
    """links(src_url, dst_url) -> (src, dst) via a broadcast hash->id
    lookup table (``ray.put`` once, ``ray.get`` zero-copy per task).

    The 64-bit url hash can collide between two distinct urls (expected
    ~n^2/2^64 pairs — ~3 in a million runs at the 1e7-vertex limit), and
    a silent collision would assign one url the other's vertex id.  The
    sorted hash array is therefore checked for duplicates, and the few
    colliding urls are resolved EXACTLY through a tiny broadcast
    {url: id} dict riding in the same object-store entry — the hot
    lookup stays a hash searchsorted."""
    import ray

    from ..stages.ids import hash64

    def add_hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"h": pa.array(hash64(batch["url"]), pa.int64()),
             "v": batch["v"], "url": batch["url"]}
        )

    hv = pa.concat_tables(
        mapping.map_batches(add_hash, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    )
    h = hv["h"].to_numpy(zero_copy_only=False)
    v = hv["v"].to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    hs, vs = h[order], v[order]
    dup = np.zeros(len(hs), dtype=bool)
    if len(hs) > 1:
        eq = hs[1:] == hs[:-1]
        dup[1:] |= eq
        dup[:-1] |= eq
    if dup.any():
        coll_hashes = np.unique(hs[dup])
        urls_sorted = hv["url"].combine_chunks().take(
            pa.array(order[dup], pa.int64()))
        exact = dict(zip(urls_sorted.to_pylist(), vs[dup].tolist()))
    else:
        coll_hashes = np.array([], dtype=np.int64)
        exact = {}
    ref = ray.put((hs, vs, coll_hashes, exact))

    def to_ids(batch: pa.Table) -> pa.Table:
        hs_sorted, vs_sorted, coll, exact_ids = ray.get(ref)

        def lookup(urls):
            hh = hash64(urls)
            i = np.searchsorted(hs_sorted, hh)
            i = np.clip(i, 0, len(hs_sorted) - 1)
            if not np.array_equal(hs_sorted[i], hh):
                raise ValueError("url missing from id mapping")
            out = vs_sorted[i]
            if len(coll):
                j = np.searchsorted(coll, hh)
                hit = np.flatnonzero(
                    (j < len(coll)) & (coll[np.minimum(j, len(coll) - 1)] == hh)
                )
                for k in hit.tolist():
                    out[k] = exact_ids[urls[k].as_py()]
            return out

        cols = {
            "src": pa.array(lookup(batch["src_url"]), pa.int64()),
            "dst": pa.array(lookup(batch["dst_url"]), pa.int64()),
        }
        for c in batch.column_names:  # carry payload columns (weights)
            if c not in ("src_url", "dst_url"):
                cols[c] = batch[c]
        return pa.table(cols)

    return links.map_batches(to_ids, batch_format="pyarrow")


def edges_to_numpy(edges_ds) -> tuple[np.ndarray, np.ndarray]:
    """Collect an edge Dataset to driver numpy arrays — test/oracle
    helper ONLY (never used in pipelines; at scale edges stay
    distributed)."""
    t = pa.concat_tables(
        [b for b in edges_ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow")]
    )
    return (
        t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
        t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
    )
