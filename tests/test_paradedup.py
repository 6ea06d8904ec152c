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


def test_pii_and_normalize_match_duckdb_re2_property():
    """The byte-exactness contract the SQL oracles rely on: Arrow's
    RE2 kernels and DuckDB's RE2 functions agree on arbitrary input for
    every pattern the pii/normalize/bpe operators use."""
    import duckdb
    import pyarrow.compute as pc
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dxa_pagerank_ray.stages.textops import (BPE_PIECE_RE,
                                                 PII_PATTERNS, _WS_RUN)

    con = duckdb.connect()
    pats = [(p, r) for _, p, r in PII_PATTERNS] + \
        [(_WS_RUN, " "), (r"^ | $", "")]

    # seed corpus biased toward pattern-relevant shapes
    seeds = st.sampled_from([
        "a@b.co", " 1.2.3.4 ", "+12345678", "555-123-4567", "x  y\t\nz",
        " .", "@", "1.2.3.4.5", "a@b@c.de", "'ll", "café 42km",
    ])
    texts_st = st.lists(st.one_of(st.text(max_size=30), seeds), max_size=6)

    @settings(max_examples=120, deadline=None)
    @given(texts_st)
    def check(texts):
        arr = pa.array(texts, pa.string())
        for pat, repl in pats:
            got = pc.replace_substring_regex(
                arr, pattern=pat, replacement=repl).to_pylist()
            got_n = pc.count_substring_regex(arr, pat).to_pylist()
            sqlpat = pat.replace("'", "''")
            exp, exp_n = [], []
            for t in texts:
                r = con.execute(
                    "SELECT regexp_replace(?, '" + sqlpat + "', '"
                    + repl.replace("'", "''") + "', 'g'), "
                    "len(regexp_extract_all(?, '" + sqlpat + "'))",
                    [t, t]).fetchone()
                exp.append(r[0])
                exp_n.append(r[1])
            assert got == exp, pat
            assert got_n == exp_n, pat
        got_b = pc.count_substring_regex(arr, BPE_PIECE_RE).to_pylist()
        bpat = BPE_PIECE_RE.replace("'", "''")
        exp_b = [con.execute(
            "SELECT len(regexp_extract_all(?, '" + bpat + "'))",
            [t]).fetchone()[0] for t in texts]
        assert got_b == exp_b

    check()


def test_paragraph_dedup_matches_python_oracle_property():
    """Both dispatch tiers vs a pure-python corpus-wide oracle on
    random multi-paragraph corpora (including empty docs, empty
    paragraphs, and heavy duplication from a tiny paragraph pool)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    paras = st.sampled_from(["dup one", "dup two", "", "x", "longer para"])
    doc = st.lists(st.one_of(paras, st.text(
        alphabet=st.characters(blacklist_characters="\n",
                               codec="ascii"), max_size=12)),
        min_size=0, max_size=5).map("\n".join)

    @settings(max_examples=15, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=25), st.integers(1, 3))
    def check(texts, max_count):
        cnt = Counter(p for t in texts for p in t.split("\n"))
        exp = []
        for i, t in enumerate(texts):
            ps = t.split("\n")
            kept = [p for p in ps if cnt[p] <= max_count]
            exp.append((i, "\n".join(kept), len(ps), len(ps) - len(kept)))
        tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": texts})
        for kw in ({}, {"broadcast_limit": 0, "num_groups": 3}):
            got = paragraph_dedup(
                rd.from_arrow(tbl).repartition(4), max_count=max_count,
                **kw).to_pandas().sort_values("doc_id")
            got_rows = list(zip(got["doc_id"], got["clean_text"],
                                got["n_paras"], got["n_dropped"]))
            assert got_rows == exp, kw

    check()


@pytest.mark.parametrize("tier", ["broadcast", "distributed"])
def test_paragraph_dedup_keep_first(tier):
    ds = rd.from_arrow(DOCS).repartition(3)
    kw = {"broadcast_limit": 0, "num_groups": 4} \
        if tier == "distributed" else {}
    out = _run(ds, keep="first", **kw)
    # doc 0 holds the globally-first occurrence of both BOILER and
    # "shared tail", so it survives intact; later occurrences drop
    assert out["clean_text"].tolist() == [
        f"{BOILER}\nunique prose alpha\nshared tail",
        "unique prose beta",
        "unique prose gamma",
        "",
        "",
    ]
    assert out["n_dropped"].tolist() == [0, 1, 1, 0, 2]


def test_paragraph_dedup_keep_first_property():
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    paras = st.sampled_from(["dup one", "dup two", "", "x"])
    doc = st.lists(paras, min_size=0, max_size=4).map("\n".join)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=15))
    def check(texts):
        cnt = Counter(p for t in texts for p in t.split("\n"))
        first = {}
        for i, t in enumerate(texts):
            for j, p in enumerate(t.split("\n")):
                first.setdefault(p, (i, j))
        exp = []
        for i, t in enumerate(texts):
            ps = t.split("\n")
            kept = [p for j, p in enumerate(ps)
                    if cnt[p] <= 1 or first[p] == (i, j)]
            exp.append((i, "\n".join(kept), len(ps), len(ps) - len(kept)))
        tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": texts})
        for kw in ({}, {"broadcast_limit": 0, "num_groups": 3}):
            got = paragraph_dedup(rd.from_arrow(tbl).repartition(4),
                                  keep="first", **kw) \
                .to_pandas().sort_values("doc_id")
            got_rows = list(zip(got["doc_id"], got["clean_text"],
                                got["n_paras"], got["n_dropped"]))
            assert got_rows == exp, kw

    check()


def test_paragraph_dedup_key_overflow_guard():
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1 << 50], pa.int64()), "text": ["a"]}))
    with pytest.raises(Exception, match="occurrence key overflow"):
        paragraph_dedup(ds).to_pandas()
