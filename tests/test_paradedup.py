"""Paragraph-level dedup (both dispatch tiers) and PII redaction."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dxa_pagerank_ray.stages.paradedup import (duplicated_paragraphs,
                                               paragraph_dedup)
from dxa_pagerank_ray.stages.textops import pii_scrub, pii_scrub_batch

BOILER = "accept cookies to continue"
DOCS = pa.table({
    "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
    "text": [
        f"{BOILER}\nunique prose alpha\nshared tail",
        f"{BOILER}\nunique prose beta",
        "shared tail\nunique prose gamma",
        "",                       # one empty paragraph
        f"{BOILER}\n{BOILER}",    # nothing survives
    ],
})
# corpus-wide counts: BOILER x4, "shared tail" x2, "" x1, uniques x1


def _run(ds, **kw):
    out = paragraph_dedup(ds, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


EXPECT_CLEAN = [
    "unique prose alpha",
    "unique prose beta",
    "unique prose gamma",
    "",
    "",
]
EXPECT_DROPPED = [2, 1, 1, 0, 2]


@pytest.mark.parametrize("tier", ["broadcast", "distributed"])
def test_paragraph_dedup_tiers(tier):
    ds = rd.from_arrow(DOCS).repartition(3)
    kw = {"broadcast_limit": 0, "num_groups": 4} \
        if tier == "distributed" else {}
    out = _run(ds, **kw)
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 4]
    assert out["clean_text"].tolist() == EXPECT_CLEAN
    assert out["n_paras"].tolist() == [3, 2, 2, 1, 2]
    assert out["n_dropped"].tolist() == EXPECT_DROPPED


def test_paragraph_dedup_max_count():
    ds = rd.from_arrow(DOCS)
    out = _run(ds, max_count=2)
    # only BOILER (x4) exceeds 2 now; "shared tail" (x2) survives
    assert out["clean_text"][0] == "unique prose alpha\nshared tail"
    assert out["n_dropped"].tolist() == [1, 1, 0, 0, 2]


def test_duplicated_paragraphs_counts():
    ds = rd.from_arrow(DOCS).repartition(2)
    dups = duplicated_paragraphs(ds).to_pandas()
    got = dict(zip(dups["para"], dups["cnt"]))
    assert got == {BOILER: 4, "shared tail": 2}


def test_paragraph_dedup_partition_invariant():
    rng = np.random.default_rng(7)
    texts = ["\n".join(
        f"para {rng.integers(0, 9)} {rng.integers(0, 9)}"
        for _ in range(rng.integers(1, 6))) for _ in range(60)]
    t = pa.table({"doc_id": pa.array(range(60), pa.int64()), "text": texts})
    a = _run(rd.from_arrow(t).repartition(1))
    b = _run(rd.from_arrow(t).repartition(7), broadcast_limit=0,
             num_groups=3)
    assert a.equals(b)


def test_pii_scrub_batch_semantics():
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": [
            "write bob.smith+x@ex-ample.co.uk or 10.0.0.1",
            "call 555-123-4567 or +4915112345678",
            None,
            "not pii: 1.2 a@b 12-34",
        ],
    })
    out = pii_scrub_batch(t).to_pydict()
    assert out["clean_text"] == [
        "write <EMAIL> or <IP>",
        "call <PHONE> or <PHONE>",
        "",
        "not pii: 1.2 a@b 12-34",
    ]
    assert out["n_emails"] == [1, 0, 0, 0]
    assert out["n_ipv4"] == [1, 0, 0, 0]
    assert out["n_phones"] == [0, 2, 0, 0]


def test_pii_scrub_dataset_roundtrip():
    t = pa.table({"doc_id": pa.array([5], pa.int64()),
                  "text": ["clean text stays byte-identical"]})
    out = pii_scrub(rd.from_arrow(t)).to_pandas()
    assert out["clean_text"][0] == "clean text stays byte-identical"
    assert int(out[["n_emails", "n_ipv4", "n_phones"]].sum().sum()) == 0


def test_oov_counts_vocab_boundary():
    from dxa_pagerank_ray.stages.textops import oov_counts

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["the the the cat", "the dog zebra!", "", "THE zebra"],
    })
    # counts: the=5, zebra=2, cat=1, dog=1 -> top-2 vocab {the, zebra}
    out = oov_counts(rd.from_arrow(t).repartition(2), vocab_k=2) \
        .to_pandas().sort_values("doc_id")
    assert out["n_tokens"].tolist() == [4, 3, 0, 2]
    assert out["n_oov"].tolist() == [1, 1, 0, 0]


def test_oov_counts_tie_break_term_ascending():
    from dxa_pagerank_ray.stages.textops import oov_counts

    # b and c tie at 2; vocab_k=2 keeps {a(3), b} (term-ascending)
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": ["a a a b b c c"]})
    out = oov_counts(rd.from_arrow(t), vocab_k=2).to_pandas()
    assert out["n_oov"].tolist() == [2]


def test_normalize_text_contract():
    from dxa_pagerank_ray.stages.textops import normalize_text_batch

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["  a\t\tb \n c ", None, "x", " \t "],
    })
    out = normalize_text_batch(t).to_pydict()
    assert out["norm_text"] == ["a b c", "", "x", ""]


def test_bpe_token_counts():
    from dxa_pagerank_ray.stages.textops import bpe_token_counts

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["Hello world's fate!  I'll go... 123 abc42",
                 "", "  \t", "naïve café 42km"],
    })
    out = bpe_token_counts(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id")
    # hand-tokenized against the RE2 piece pattern
    assert out["n_pieces"].tolist() == [13, 0, 1, 4]
