"""Training-corpus selection — the flagship composite pipeline.

This is the end-to-end shape a web-text training-data pipeline
actually runs: language filter -> quality filter -> near-dup
clustering -> keep one representative per cluster.  Every stage is a
streaming Ray Data transform already verified on its own
(``stages.textops``, ``stages.dedup``); this module only composes them
and pins the cross-stage contract.

Scale notes: the filters run BEFORE the (shuffling) dedup stages so
the minhash/LSH exchange only moves surviving documents; the keep
step dispatches on ``stages.dedup.near_dup_clusters``'s guard —
below ``BROADCAST_VERTEX_LIMIT`` docs the keeper vector broadcasts as
one dense int64 array, above it the ``LabelCSR`` tier writes labels
as partitioned parquet and the keep step becomes a distributed
co-grouped join on that output (nothing O(num_docs) on the driver).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.textops import count_regex


def filter_quality_lang(docs_ds, langs: tuple[str, ...],
                        min_tokens: int, max_punct_ratio: float,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Streaming doc filter: predicted language in ``langs`` (LangId
    actor pool), token count >= ``min_tokens``, punctuation ratio <=
    ``max_punct_ratio``.  -> (doc_id, text, lang_pred) of survivors."""
    from ..stages.textops import lang_id

    lang_set = set(langs)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lang_ok = pc.fill_null(
            pc.is_in(batch["lang_pred"],
                     value_set=pa.array(sorted(lang_set))), False) \
            .to_numpy(zero_copy_only=False).astype(bool)
        n_tokens = count_regex(batch[text_col], r"\w+")
        n_punct = count_regex(batch[text_col], r"[^\w\s]")
        n_chars = pc.fill_null(pc.utf8_length(batch[text_col]), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        mask = (lang_ok & (n_tokens >= min_tokens)
                & (n_punct <= max_punct_ratio * np.maximum(n_chars, 1)))
        return batch.filter(pa.array(mask)).select(
            [id_col, text_col, "lang_pred"])

    return lang_id(docs_ds).map_batches(keep, batch_format="pyarrow")


def select_training_corpus(docs_ds, num_docs: int,
                           langs: tuple[str, ...] = ("en",),
                           min_tokens: int = 30,
                           max_punct_ratio: float = 0.2,
                           num_perm: int = 64, bands: int = 16,
                           threshold: float = 0.7,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           keeper_limit: int | None = None) -> pa.Table:
    """-> (doc_id, lang_pred) of the KEPT documents: survivors of the
    language/quality filters whose doc id is the minimum of their
    near-dup cluster (MinHash-LSH pairs unioned by hash-min connected
    components — exact duplicates collide in every band, so a separate
    exact-dedup pass is subsumed).  ``num_docs`` bounds the id space
    ([0, num_docs), dense), not the survivor count.

    The keep step dispatches on what ``near_dup_clusters`` returned
    (``keeper_limit`` -> its guard): a broadcast int64 array below the
    limit, else the partitioned keeper *Dataset* joined to the
    survivors with the distributed ``cogroup_attach`` equi-join —
    nothing O(num_docs) ever lands on the driver at the big tier.
    Both tiers produce identical rows (pinned by a test forcing
    ``keeper_limit=0``)."""
    import ray

    from ..stages.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        near_dup_clusters,
        verify_pairs_by_signature,
    )

    survivors = filter_quality_lang(
        docs_ds, langs, min_tokens, max_punct_ratio,
        text_col=text_col, id_col=id_col,
    ).materialize()  # read twice: signatures + final keep filter

    sigs = minhash_signatures(
        survivors.select_columns([id_col, text_col]),
        num_perm=num_perm).materialize()
    pairs = lsh_candidate_pairs(sigs, num_perm=num_perm, bands=bands)
    verified = verify_pairs_by_signature(pairs, sigs, threshold=threshold,
                                         num_perm=num_perm)
    keeper = near_dup_clusters(verified, num_docs, keeper_limit=keeper_limit)

    if isinstance(keeper, pa.Table):  # small tier: broadcast the array
        keeper_ref = ray.put(keeper["keeper"].to_numpy())

        def keep(batch: pa.Table) -> pa.Table:
            k = ray.get(keeper_ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(k[ids] == ids)).select(
                [id_col, "lang_pred"])

        kept = survivors.map_batches(keep, batch_format="pyarrow")
    else:  # big tier: co-grouped keep-join against the keeper Dataset
        from ..context import derive_num_groups
        from ..stages.dedup import cogroup_attach

        schema = pa.schema([(id_col, pa.int64()),
                            ("lang_pred", pa.string())])
        attached = cogroup_attach(
            survivors.select_columns([id_col, "lang_pred"]), id_col,
            keeper, "doc_id", "keeper", "__keeper", schema, pa.int64(),
            num_groups=derive_num_groups(survivors),
        )

        def keep_joined(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            k = batch["__keeper"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(k == ids)).select(
                [id_col, "lang_pred"])

        kept = attached.map_batches(keep_joined, batch_format="pyarrow")

    out = [
        b for b in kept.iter_batches(batch_size=1 << 20,
                                     batch_format="pyarrow")
        if b.num_rows
    ]
    if not out:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "lang_pred": pa.array([], pa.string())})
    t = pa.concat_tables(out)
    order = np.argsort(t[id_col].to_numpy(zero_copy_only=False))
    return t.take(pa.array(order))
