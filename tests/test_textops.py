"""top_terms: corpus term-frequency top-k vs a plain Counter oracle."""

from collections import Counter

import pyarrow as pa
import ray.data as rd

from dxa_pagerank_ray.stages.textops import top_terms


def test_top_terms_matches_counter(ray_session):
    docs = [
        "The quick brown fox jumps over the lazy dog",
        "the dog sleeps; the fox runs! A dog_barks",
        "",
        None,
        "Fox fox FOX, dog",
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    got = top_terms(rd.from_arrow(t).repartition(3), k=4)
    import re

    cnt = Counter(
        tok for d in docs
        for tok in re.split(r"\W+", (d or "").lower()) if tok
    )
    # note: "dog_barks" stays one token (underscore is \w)
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert list(zip(got["term"].to_pylist(), got["n"].to_pylist())) == exp


def test_top_terms_ties_and_k_boundary(ray_session):
    # all terms distinct once -> pure alphabetical cut at the k boundary
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["d c b a e"], pa.string())})
    got = top_terms(rd.from_arrow(t), k=3)
    assert got["term"].to_pylist() == ["a", "b", "c"]
    assert got["n"].to_pylist() == [1, 1, 1]


def test_repetition_scores_known_and_edge_cases():
    """Hand-checkable repetition counts: a templated doc scores high,
    a no-repeat doc zero, sub-2-token docs emit (0, 0)."""
    import ray.data as rd

    from dxa_pagerank_ray.stages.textops import repetition_scores

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "buy now buy now buy now",   # bigrams: 5, distinct 2 -> dup 3
            "all words here are unique", # 4 bigrams, 0 dup
            "word",                      # < 2 tokens
            "",                          # empty
        ], pa.string()),
    })).materialize()
    t = repetition_scores(docs).to_pandas().sort_values("doc_id")
    assert t["n_bigrams"].tolist() == [5, 4, 0, 0]
    assert t["n_dup_bigrams"].tolist() == [3, 0, 0, 0]


def test_contamination_counts_exact():
    """Exact distinct-shingle overlap vs a hand oracle; eval docs
    self-flag fully; disjoint docs flag zero."""
    import ray.data as rd

    from dxa_pagerank_ray.stages.textops import contamination_counts

    texts = [
        "the quick brown fox jumps",       # eval doc (id 0)
        "a quick brown fox appears here",  # shares shingles with eval
        "zzzzzzzzzzzz completely unrelated text qq",
        "the quick brown fox jumps",       # exact copy of the eval doc
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).materialize()
    ev = docs.map_batches(
        lambda b: b.take(pa.array([0], pa.int64())),
        batch_format="pyarrow")
    t = contamination_counts(docs, ev, k=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    def sh(s):
        return {s[j:j + 8] for j in range(len(s) - 7)}

    evs = sh(texts[0])
    exp = [len(sh(x) & evs) for x in texts]
    assert t["n_overlap"].tolist() == exp
    assert exp[0] == len(evs) and exp[3] == len(evs)  # self/copy flag
    assert exp[1] > 0 and exp[2] == 0


def test_count_regex_matches_python_re():
    """count_regex (Arrow RE2 C kernel) must agree with the repo-wide
    re.ASCII tokenizer contract — the property the vectorized
    token/punct counters rely on for oracle-exactness."""
    import re

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dxa_pagerank_ray.stages.textops import count_regex

    tok = re.compile(r"\w+", re.ASCII)
    # RE2 \s is [\t\n\f\r ] (no \x0b) — the punct contract is RE2's,
    # shared with the DuckDB oracles; this is its Python equivalent
    pun = re.compile(r"[^\w\t\n\f\r ]", re.ASCII)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=8))
    def check(texts):
        arr = pa.array(texts, pa.string())
        got_t = count_regex(arr, r"\w+")
        got_p = count_regex(arr, r"[^\w\s]")
        exp_t = np.array([len(tok.findall(t or "")) for t in texts],
                         dtype=np.int64)
        exp_p = np.array([len(pun.findall(t or "")) for t in texts],
                         dtype=np.int64)
        assert got_t.tolist() == exp_t.tolist()
        assert got_p.tolist() == exp_p.tolist()

    check()


def test_doc_bigram_rows_known(ray_session):
    import pyarrow as pa

    from dxa_pagerank_ray.stages.textops import doc_bigram_rows

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["Hello,  world foo", "one", "", None],
                         pa.string()),
    })
    got = doc_bigram_rows(t)
    assert got["doc_id"].to_pylist() == [1, 1]
    assert got["bg"].to_pylist() == ["hello world", "world foo"]
    # pairing never crosses a document boundary
    t2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "text": pa.array(["a b", "c d"], pa.string())})
    got2 = doc_bigram_rows(t2)
    assert got2["bg"].to_pylist() == ["a b", "c d"]


def test_bigram_familiarity_small_corpus(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dxa_pagerank_ray.stages.textops import bigram_familiarity

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "the cat sat",          # bigrams: the cat, cat sat
            "the cat ran",          # the cat, cat ran
            "solo",                 # none
            "the cat sat down",     # the cat, cat sat, sat down
        ], pa.string()),
    })
    got = bigram_familiarity(rd.from_arrow(docs), num_groups=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # corpus counts: the cat=3, cat sat=2, cat ran=1, sat down=1
    assert got["n_bigrams"].tolist() == [2, 2, 0, 3]
    B = 1_000_000_000
    assert got["fam_nano"].tolist() == [
        (3 + 2) * B // 2, (3 + 1) * B // 2, 0, (3 + 2 + 1) * B // 3]


def test_postings_for_terms_small(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dxa_pagerank_ray.stages.textops import postings_for_terms

    docs = pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array(["a b a c", "b b d"], pa.string()),
    })
    got = postings_for_terms(rd.from_arrow(docs), ["a", "b"],
                             num_groups=2).to_pandas()
    rows = sorted(map(tuple, got[["term", "doc_id", "tf"]].values.tolist()))
    assert rows == [("a", 7, 2), ("b", 7, 1), ("b", 8, 2)]


def test_doc_chunks_micro(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dxa_pagerank_ray.stages.textops import doc_chunks

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["Hello, world foo bar baz", "", "one two"],
                         pa.string()),
    })
    got = doc_chunks(rd.from_arrow(docs), window=3, stride=2).to_pandas()
    got = got.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    rows = list(map(tuple, got.values.tolist()))
    # n=5, W=3, S=2 -> starts 0,2,4; empty doc emits nothing
    assert rows == [
        (1, 0, 3, "hello world foo"),
        (1, 1, 3, "foo bar baz"),
        (1, 2, 1, "baz"),
        (3, 0, 2, "one two"),
    ]


def test_doc_chunks_partition_independent(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dxa_pagerank_ray.stages.textops import doc_chunks

    docs = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array([" ".join(f"w{i}_{j}" for j in range(i % 11))
                          for i in range(40)], pa.string()),
    })

    def run(parts):
        df = doc_chunks(rd.from_arrow(docs).repartition(parts),
                        window=4, stride=3).to_pandas()
        return sorted(map(tuple, df.values.tolist()))

    a, b = run(1), run(7)
    assert a == b
    # every token covered; chunk count = ceil(n/stride) per non-empty doc
    import math
    exp_chunks = sum(math.ceil((i % 11) / 3) for i in range(40))
    assert len(a) == exp_chunks


def test_doc_ngram_rows_known(ray_session):
    import pyarrow as pa

    from dxa_pagerank_ray.stages.textops import doc_ngram_rows

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["Hello,  world foo bar", "one two", "", None],
                         pa.string()),
    })
    got = doc_ngram_rows(t, 3)
    assert got["doc_id"].to_pylist() == [1, 1]
    assert got["g"].to_pylist() == ["hello world foo", "world foo bar"]
    # windows never cross a document boundary
    t2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "text": pa.array(["a b c", "d e f"], pa.string())})
    got2 = doc_ngram_rows(t2, 3)
    assert got2["g"].to_pylist() == ["a b c", "d e f"]
    # n=2 reduces to the bigram contract
    from dxa_pagerank_ray.stages.textops import doc_bigram_rows
    assert doc_ngram_rows(t, 2)["g"].to_pylist() == \
        doc_bigram_rows(t)["bg"].to_pylist()


def test_duplicated_ngram_stats_small_corpus(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dxa_pagerank_ray.stages.textops import duplicated_ngram_stats

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "the cat sat on mat",        # 3 trigrams, all shared w/ doc 3
            "a dog ran far away fast",   # 4 trigrams, none shared
            "tiny",                      # no trigram
            "the cat sat on mat again",  # 4 trigrams: 3 shared + 1 unique
        ], pa.string()),
    })
    got = duplicated_ngram_stats(rd.from_arrow(docs), n=3, num_groups=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["n_grams"].tolist() == [3, 4, 0, 4]
    assert got["n_dup_grams"].tolist() == [3, 0, 0, 3]
    B = 1_000_000_000
    assert got["dup_frac_nano"].tolist() == [B, 0, 0, 3 * B // 4]
    # partition-count invariance
    got2 = duplicated_ngram_stats(
        rd.from_arrow(docs).repartition(3), n=3, num_groups=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got2.equals(got)


def test_ttr_scores_known_and_edge_cases():
    """Hand-checkable type-token ratios: repeats lower TTR, case folds
    ("The"=="the"), punctuation splits, empty/null docs emit zeros."""
    import ray.data as rd

    from dxa_pagerank_ray.stages.textops import ttr_scores

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "buy now buy now buy now",        # 6 tokens, 2 types
            "The quick brown fox, the fox!",  # 6 tokens, 4 types
            "unique",                         # 1 token, 1 type
            "",                               # empty
            None,                             # null
        ], pa.string()),
    })).materialize()
    t = ttr_scores(docs).to_pandas().sort_values("doc_id")
    assert t["n_tokens"].tolist() == [6, 6, 1, 0, 0]
    assert t["n_types"].tolist() == [2, 4, 1, 0, 0]
    assert t["ttr_nano"].tolist() == [
        2 * 10**9 // 6, 4 * 10**9 // 6, 10**9, 0, 0]


def test_ttr_batch_vs_python_reference_fuzz():
    """Property check: the vectorized dictionary-encode distinct count
    matches a per-doc Python set over the same ``\\W+``/lower split,
    across punctuation, unicode, repeats, empties and nulls."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dxa_pagerank_ray.stages.textops import ttr_batch

    texts = st.lists(
        st.one_of(st.none(), st.text(
            "aAbB 01.,!?\t\né中-", max_size=60)),
        min_size=1, max_size=12)

    @settings(max_examples=300, deadline=None)
    @given(texts)
    def run(ts):
        batch = pa.table({
            "doc_id": pa.array(range(len(ts)), pa.int64()),
            "text": pa.array(ts, pa.string()),
        })
        got = ttr_batch(batch)
        for i, t in enumerate(ts):
            toks = [w for w in re.split(r"\W+", (t or "").lower(),
                                        flags=re.ASCII) if w]
            assert got["n_tokens"][i].as_py() == len(toks)
            assert got["n_types"][i].as_py() == len(set(toks))

    run()


def test_lang_id_concurrency_invariant(ray_session):
    """lang_id is a row-pure map: the task-pool concurrency (and the
    r5m task-pool conversion itself) is scheduling-only — identical
    rows at any concurrency and block layout.  The value-invariance
    contract behind the gate's accepted outside-window entry."""
    import ray.data as rd

    from dxa_pagerank_ray.stages.textops import lang_id

    t = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array([
            "the of and to a in is it",          # en stopwords
            "der die und das ist nicht ein",     # de
            "le la et les des un une est",       # fr
            "el la de que y en los se",          # es
            "xyzzy qwerty asdf",                 # no stopword hits
            "the der le el",                     # cross-language tie
            "", "the the the the",
        ], pa.string()),
    })

    def rows(concurrency, blocks):
        ds = rd.from_arrow(t).repartition(blocks)
        out = lang_id(ds, concurrency=concurrency).take_all()
        return sorted((r["doc_id"], r["lang_pred"]) for r in out)

    ref = rows(1, 1)
    assert rows(2, 3) == ref
    assert rows(None, 4) == ref  # unbounded task-pool default
    assert len({lp for _i, lp in ref}) >= 3  # the fixture exercises real variety
