"""Synthetic-documents source (scaling-bench input) invariants."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from dxa_pagerank_ray.sources.synth_docs import (
    synthetic_documents,
    synthetic_documents_numpy,
    write_documents_parquet,
)


def _sorted(tbl):
    return tbl.sort_by("doc_id")


def test_block_count_invariance(ray_session):
    """Identical rows regardless of parallelism / block boundaries —
    the property that makes both scaling levels read the same corpus."""
    import ray

    ref = synthetic_documents_numpy(500, seed=7)
    for blocks in (1, 7, 64):
        ds = synthetic_documents(500, seed=7, override_num_blocks=blocks)
        got = _sorted(
            __import__("pyarrow").concat_tables(
                ray.get(ds.to_arrow_refs())))
        assert got.equals(_sorted(ref)), f"blocks={blocks} diverged"


def test_schema_matches_driver_documents():
    t = synthetic_documents_numpy(50)
    ref = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    assert t.schema.names == ref.schema.names
    assert [f.type for f in t.schema] == [ref.schema.field(n).type
                                          for n in t.schema.names]


def test_n_chars_and_langs_and_dups():
    t = synthetic_documents_numpy(2000, seed=7)
    text = t["text"].to_pylist()
    n_chars = t["n_chars"].to_pylist()
    assert all(len(s) == c for s, c in zip(text, n_chars))
    langs = set(t["lang"].to_pylist())
    assert langs == {"en", "zh", "de", "fr"}
    assert set(t["source"].to_pylist()) <= {f"src{i}" for i in range(10)}

    # planted near-dups: docs in a 64-stripe whose coin fired share
    # ~98% of their words with the stripe anchor -> word-set Jaccard
    # far above random pairs
    def jac(a: str, b: str) -> float:
        sa, sb = set(a.split()), set(b.split())
        return len(sa & sb) / len(sa | sb)

    sims = []
    for i in range(0, 2000, 64):
        for j in range(i + 1, min(i + 64, 2000)):
            s = jac(text[i], text[j])
            if s > 0.7:
                sims.append(s)
    # dup_rate=0.15 over ~31 stripes of 63 candidates -> expect ~290
    assert len(sims) > 150, len(sims)
    # most copies diverge from their anchor (perturbation), but short
    # docs can draw zero flips -> a small exact-duplicate tail remains
    # (like real web text; gives exact dedup work too)
    n_exact_dups = 2000 - len(set(text))
    assert 10 <= n_exact_dups <= 300, n_exact_dups
    # paragraph structure: the source-keyed boilerplate header is
    # exactly one hub paragraph per source, repeated by every
    # long-enough doc of that source (paragraph-dedup's reason to
    # exist); body paragraphs are doc-keyed and mostly unique
    import collections

    paras = collections.Counter(p for tx in text for p in tx.split("\n\n"))
    top = [c for _p, c in paras.most_common(10)]
    assert top[0] > 40, top  # hub paragraphs
    assert sum(1 for c in paras.values() if c == 1) > 3000  # unique body


def test_write_documents_parquet_slots_in_as_sf_dir(ray_session, tmp_path):
    out = write_documents_parquet(str(tmp_path), 300, seed=7,
                                  override_num_blocks=4)
    got = pq.read_table(f"{out}/documents.parquet").sort_by("doc_id")
    ref = _sorted(synthetic_documents_numpy(300, seed=7))
    assert got.equals(ref)
