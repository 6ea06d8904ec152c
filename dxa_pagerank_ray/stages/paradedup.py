"""Paragraph-level exact deduplication (boilerplate removal).

The CCNet / RefinedWeb-style pass every web-scale training pipeline
runs before document-level dedup: split each document into paragraphs,
count every exact paragraph string across the WHOLE corpus, drop the
paragraphs that repeat (navigation bars, cookie banners, license
boilerplate repeat across millions of pages; real prose almost never
repeats verbatim), and reassemble each document from its surviving
paragraphs in original order.

Split contract: ``str.split(delimiter)`` — an empty document is ONE
empty paragraph, adjacent delimiters yield empty paragraphs, and empty
paragraphs are counted (and therefore dropped) like any other string.
This is exactly DuckDB's ``string_split``, which keeps the SQL oracle
character-exact.

Scale shape (two tiers, the repo-wide guarded-broadcast idiom):

1. Count: ``coarse_agg`` over the exploded paragraph strings — Arrow
   hash-agg pre-combine per batch means only each batch's DISTINCT
   paragraphs enter the one coarse shuffle, then the count table is
   filtered to ``cnt > max_count`` BEFORE anything else sees it.  The
   duplicated-paragraph set is the small side by construction (it is
   the boilerplate, not the corpus).
2. Apply:
   - dup set ≤ ``broadcast_limit`` rows: the strings are collected,
     ``ray.put`` ONCE, and one stateless ``map_batches`` over the
     original documents re-splits, filters and re-joins locally —
     document text never moves through a shuffle at all.
   - larger: distributed fallback — explode, coarse-partition by
     paragraph hash, co-grouped semi-join marks the dropped rows,
     then one doc-keyed shuffle reassembles.  Text moves twice; only
     in the regime where the dup set itself is cluster-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..context import derive_num_groups
from .agg import coarse_agg

# Byte budget for the broadcast tier's dup table (same order as the
# repo's other driver-side broadcasts: ~hundreds of MB, not GB).
_BROADCAST_BYTES = 256 << 20


def _explode(batch: pa.Table, delimiter: str, text_col: str,
             id_col: str) -> pa.Table:
    """(doc_id, pidx, para) rows — vectorized: one Arrow split kernel,
    offsets unpacked with numpy repeat/arange, no per-row Python."""
    import pyarrow.compute as pc

    lst = pc.split_pattern(pc.fill_null(batch[text_col], ""),
                           pattern=delimiter)
    lst = lst.combine_chunks()
    offsets = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    total = int(offsets[-1]) - int(offsets[0])
    return pa.table({
        id_col: pa.array(np.repeat(ids, counts), pa.int64()),
        "pidx": pa.array(
            np.arange(total, dtype=np.int64)
            - np.repeat(offsets[:-1] - offsets[0], counts), pa.int64()),
        "para": lst.values if lst.offset == 0 and total == len(lst.values)
        else lst.flatten(),
    })


# Occurrence key for keep="first": key = doc_id * _PIDX_LIMIT + pidx,
# totally ordered by (doc_id, pidx).  Loud guards: ≤ 2^21 paragraphs
# per document and doc ids < 2^42 (ample at the 10^12-doc design
# point) keep the key inside int64.
_PIDX_LIMIT = 1 << 21
_DOC_ID_LIMIT = 1 << 42


def duplicated_paragraphs(docs_ds, max_count: int = 1,
                          delimiter: str = "\n", text_col: str = "text",
                          id_col: str = "doc_id"):
    """Dataset of ``(para, cnt, keep_key)`` for every paragraph string
    occurring more than ``max_count`` times corpus-wide; ``keep_key``
    is the occurrence key of its globally-FIRST occurrence (min over
    (doc_id, pidx)), computed in the same coarse aggregate as the
    count."""
    import pyarrow.compute as pc

    def explode_keys(b: pa.Table) -> pa.Table:
        ex = _explode(b, delimiter, text_col, id_col)
        ids = ex[id_col].to_numpy(zero_copy_only=False)
        pidx = ex["pidx"].to_numpy(zero_copy_only=False)
        if len(ids) and (pidx.max() >= _PIDX_LIMIT
                         or ids.max() >= _DOC_ID_LIMIT or ids.min() < 0):
            raise ValueError(
                "paragraph_dedup occurrence key overflow: need "
                f"0 <= doc_id < 2^42 and < 2^21 paragraphs per doc "
                f"(got doc_id max {ids.max()}, pidx max {pidx.max()})")
        return pa.table({
            "para": ex["para"],
            "key": pa.array(ids * _PIDX_LIMIT + pidx, pa.int64()),
        })

    keyed = docs_ds.map_batches(explode_keys, batch_format="pyarrow")
    cnts = coarse_agg(keyed, ["para"], [("para", "count", "cnt"),
                                        ("key", "min", "keep_key")])
    return cnts.map_batches(
        lambda t: t.filter(pc.greater(t["cnt"], max_count)),
        batch_format="pyarrow")


def _assemble(ids: np.ndarray, pidx: np.ndarray, paras: list[str],
              dropped: np.ndarray, delimiter: str,
              id_col: str) -> pa.Table:
    """Per-doc reassembly of pre-sorted (doc_id, pidx) paragraph rows.
    One Python join per document (C-level str.join over a slice) —
    the irreducible per-doc step, everything around it is numpy."""
    if len(ids) == 0:  # Ray sort/groupby can emit empty blocks
        return pa.table({id_col: pa.array([], pa.int64()),
                         "clean_text": pa.array([], pa.string()),
                         "n_paras": pa.array([], pa.int64()),
                         "n_dropped": pa.array([], pa.int64())})
    bounds = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1], True])
    out_id = ids[bounds[:-1]]
    texts, n_par, n_drop = [], [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        keep = ~dropped[s:e]
        texts.append(delimiter.join(
            [paras[j] for j in range(s, e) if keep[j - s]]))
        n_par.append(e - s)
        n_drop.append(int((e - s) - keep.sum()))
    return pa.table({
        id_col: pa.array(out_id, pa.int64()),
        "clean_text": pa.array(texts, pa.string()),
        "n_paras": pa.array(n_par, pa.int64()),
        "n_dropped": pa.array(n_drop, pa.int64()),
    })


def paragraph_dedup(docs_ds, max_count: int = 1, delimiter: str = "\n",
                    text_col: str = "text", id_col: str = "doc_id",
                    keep: str = "none",
                    broadcast_limit: int | None = None,
                    num_groups: int | None = None):
    """(doc_id, clean_text, n_paras, n_dropped) — every input document
    exactly once, ``clean_text`` its surviving paragraphs joined by
    ``delimiter`` in original order (empty string when everything was
    boilerplate).  A paragraph with corpus-wide count ≤ ``max_count``
    always survives; for repeated paragraphs ``keep`` selects the
    semantics: ``"none"`` drops every occurrence (boilerplate removal),
    ``"first"`` keeps exactly the globally-first occurrence by
    (doc_id, pidx) — the CCNet/RefinedWeb line-dedup contract."""
    import ray
    import pyarrow.compute as pc

    from ..context import estimate_size_bytes
    from ..pipelines.relational import BROADCAST_ROW_LIMIT

    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    keep_first = keep == "first"
    limit = BROADCAST_ROW_LIMIT if broadcast_limit is None else broadcast_limit
    dups = duplicated_paragraphs(docs_ds, max_count, delimiter,
                                 text_col, id_col).materialize()

    # Rows alone don't bound the broadcast (paragraphs are arbitrary-
    # length strings): also require the materialized dup table's byte
    # size under the same ~hundreds-of-MB budget the row limit models.
    est = estimate_size_bytes(dups)
    if dups.count() <= limit and (est is None or est <= _BROADCAST_BYTES):
        parts = [b for b in dups.iter_batches(batch_size=1 << 20,
                                              batch_format="pyarrow")
                 if b.num_rows]
        dup_tbl = (pa.concat_tables(parts).combine_chunks() if parts
                   else pa.table({"para": pa.array([], pa.string()),
                                  "keep_key": pa.array([], pa.int64())}))
        # ship as Arrow arrays (zero-copy from plasma per task, unlike
        # a dict which re-unpickles per ray.get)
        dup_ref = ray.put((dup_tbl["para"].combine_chunks(),
                           dup_tbl["keep_key"].combine_chunks()
                           .to_numpy(zero_copy_only=False)))

        def scrub(batch: pa.Table) -> pa.Table:
            dup_paras, keep_keys = ray.get(dup_ref)
            ex = _explode(batch, delimiter, text_col, id_col)
            ids = ex[id_col].to_numpy(zero_copy_only=False)
            pidx = ex["pidx"].to_numpy(zero_copy_only=False)
            pos = pc.index_in(ex["para"], value_set=dup_paras)
            dropped = pc.is_valid(pos).to_numpy(zero_copy_only=False)
            if keep_first and len(dup_paras):
                idx = pc.fill_null(pos, 0).to_numpy(zero_copy_only=False)
                dropped = dropped & (keep_keys[idx]
                                     != ids * _PIDX_LIMIT + pidx)
            # explode emits rows already in (doc, pidx) order
            return _assemble(ids, pidx, ex["para"].to_pylist(), dropped,
                             delimiter, id_col)

        return docs_ds.map_batches(scrub, batch_format="pyarrow")

    # Distributed tier: semi-join on paragraph hash partitions, then a
    # doc-keyed reassembly shuffle.  Collision-free marking: within a
    # hash partition the dup strings are compared by VALUE (index_in),
    # the 63-bit hash only routes (same key function as agg._part_for,
    # reused so co-partitioning with coarse_agg-derived tables holds).
    from .agg import _part_for

    G = num_groups or derive_num_groups(docs_ds, dups)

    def _para_parts(col) -> np.ndarray:
        # hash each DISTINCT paragraph once per batch (blake2b is a
        # per-string Python call; batches repeat boilerplate heavily)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        uniq = pc.unique(col)
        upart = _part_for(uniq, G)
        idx = pc.index_in(col, value_set=uniq) \
            .to_numpy(zero_copy_only=False)
        return upart[idx]

    def tag_doc(batch: pa.Table) -> pa.Table:
        ex = _explode(batch, delimiter, text_col, id_col)
        return ex.append_column(
            "part", pa.array(_para_parts(ex["para"]), pa.int64()))

    def tag_dup(batch: pa.Table) -> pa.Table:
        # the dup side rides keep_key in the "pidx" column (doc rows
        # are distinguished by a non-null doc id)
        return pa.table({
            id_col: pa.nulls(batch.num_rows, pa.int64()),
            "pidx": batch["keep_key"],
            "para": batch["para"],
            "part": pa.array(_para_parts(batch["para"]), pa.int64()),
        })

    both = docs_ds.map_batches(tag_doc, batch_format="pyarrow").union(
        dups.map_batches(tag_dup, batch_format="pyarrow"))

    def mark(t: pa.Table) -> pa.Table:
        is_dup = pc.is_null(t[id_col])
        dup_side = t.filter(is_dup)
        dup_vals = dup_side["para"].combine_chunks()
        rows = t.filter(pc.invert(is_dup))
        pos = pc.index_in(rows["para"], value_set=dup_vals)
        hit = pc.is_valid(pos).to_numpy(zero_copy_only=False)
        if keep_first and len(dup_vals):
            keep_keys = dup_side["pidx"].combine_chunks() \
                .to_numpy(zero_copy_only=False)
            idx = pc.fill_null(pos, 0).to_numpy(zero_copy_only=False)
            row_keys = (rows[id_col].to_numpy(zero_copy_only=False)
                        * _PIDX_LIMIT
                        + rows["pidx"].to_numpy(zero_copy_only=False))
            hit = hit & (keep_keys[idx] != row_keys)
        return pa.table({
            id_col: rows[id_col],
            "pidx": rows["pidx"],
            "para": rows["para"],
            "dropped": pa.array(hit),
            "dpart": pa.array(
                rows[id_col].to_numpy(zero_copy_only=False) % np.int64(G),
                pa.int64()),
        })

    marked = both.groupby("part").map_groups(mark, batch_format="pyarrow")

    def assemble_group(t: pa.Table) -> pa.Table:
        t = t.sort_by([(id_col, "ascending"), ("pidx", "ascending")])
        return _assemble(
            t[id_col].to_numpy(zero_copy_only=False),
            t["pidx"].to_numpy(zero_copy_only=False),
            t["para"].to_pylist(),
            t["dropped"].to_numpy(zero_copy_only=False),
            delimiter, id_col)

    return marked.groupby("dpart").map_groups(
        assemble_group, batch_format="pyarrow")
