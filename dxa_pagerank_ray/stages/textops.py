"""Text analysis operators for training-data pipelines (graft-added,
first-class alongside SURVEY.md §2): token counting, quality scoring,
language id, document fingerprinting.

All operators are stateless vectorized ``map_batches`` stages except
language-id, which is a callable class (actor pool) so its stopword
tables are built once per actor, not per batch.
"""

from __future__ import annotations

import functools
import re

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"\w+", re.ASCII)
# Deliberately ASCII so the Python and DuckDB ('\\w+') tokenizations
# agree byte-for-byte on the oracle check.

# Punctuation contract is RE2's [^\w\s]: RE2 \s is [\t\n\f\r ] (NO
# \x0b vertical tab, unlike Python re.ASCII \s) — pinned to RE2
# because BOTH the Arrow count kernels and the DuckDB oracles run RE2,
# so this is the one definition that keeps engine and oracle
# hash-exact on every byte.  The Python-equivalent class:
_PUNCT_RE = re.compile(r"[^\w\t\n\f\r ]", re.ASCII)


def count_regex(arr, pattern: str) -> np.ndarray:
    """Non-overlapping regex match counts per string via Arrow's RE2 C
    kernel — no per-doc Python loop.  RE2's ``\\w`` is ASCII, matching
    the repo-wide ``re.ASCII`` tokenizer contract, and RE2 ``\\s`` is
    the oracle-side (DuckDB=RE2) whitespace contract (equality
    property-checked in tests); nulls count 0 like ``t or ''``."""
    import pyarrow.compute as pc

    c = pc.count_substring_regex(arr, pattern)
    return pc.fill_null(c, 0).to_numpy(zero_copy_only=False).astype(np.int64)

_STOPWORDS = {
    "en": {"the", "a", "of", "to", "and", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "je", "pas", "de"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "no", "que", "de"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    counts = count_regex(batch[text_col], r"\w+")
    return pa.table({id_col: batch[id_col],
                     "n_tokens": pa.array(counts, pa.int64())})


def token_counts(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    return docs_ds.map_batches(
        lambda b: token_count_batch(b, text_col, id_col), batch_format="pyarrow"
    )


def ttr_batch(batch: pa.Table, text_col: str = "text",
              id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_tokens, n_types, ttr_nano) — per-document
    type-token ratio, the classic lexical-diversity quality signal
    (low TTR = templated/repetitive text; a standard web-corpus
    filter axis alongside the Gopher repetition rules).  Tokens are
    lowercased ``\\W+`` splits with empties dropped (the repo-wide
    split contract shared with ``bigram_familiarity`` and the SQL
    oracles); ``ttr_nano = n_types * 1e9 // n_tokens`` (0 for empty
    docs) keeps the ratio integer-exact for the hash gate.

    Fully vectorized and EXACT: the flat token array is
    ``dictionary_encode``d (within-batch integer codes, no hashing —
    a hash collision would silently undercount types), then distinct
    (row, code) pairs come from one ``np.unique`` over
    ``row * dict_size + code``.  Stateless per-batch map — no
    shuffle, nothing on the driver; int64-safe while
    batch_rows * batch_distinct_tokens < 2^63."""
    import pyarrow.compute as pc

    n = batch.num_rows
    text = pc.fill_null(batch[text_col].combine_chunks(), "")
    lists = pc.split_pattern_regex(pc.utf8_lower(text), pattern=r"\W+")
    if isinstance(lists, pa.ChunkedArray):  # pragma: no cover
        lists = lists.combine_chunks()
    parent = lists.value_parent_indices().to_numpy(zero_copy_only=False)
    flat = lists.flatten()
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    parent = parent[nonempty].astype(np.int64)
    flat = flat.filter(pa.array(nonempty))
    n_tokens = np.bincount(parent, minlength=n).astype(np.int64)[:n]
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):  # pragma: no cover
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    stride = np.int64(len(enc.dictionary)) or np.int64(1)
    urow = np.unique(parent * stride + codes) // stride
    n_types = np.bincount(urow, minlength=n).astype(np.int64)[:n]
    ttr = np.where(n_tokens > 0,
                   n_types * np.int64(1_000_000_000)
                   // np.maximum(n_tokens, 1), np.int64(0))
    return pa.table({id_col: batch[id_col],
                     "n_tokens": pa.array(n_tokens, pa.int64()),
                     "n_types": pa.array(n_types, pa.int64()),
                     "ttr_nano": pa.array(ttr, pa.int64())})


def ttr_scores(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    return docs_ds.map_batches(
        lambda b: ttr_batch(b, text_col, id_col), batch_format="pyarrow")


def repetition_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_bigrams, n_dup_bigrams) — intra-document repetition:
    how many word-bigram occurrences are repeats of an earlier bigram
    in the same document (the Gopher-style repetition quality signal,
    Rae et al. 2021 — boilerplate/templated text scores high).  Tokens
    are ``\\w+`` (the repo-wide tokenizer contract shared with
    ``doc_token_counts``); a bigram repeats iff its exact (a, b) token
    pair occurred before — token strings contain no spaces, so this is
    identical to DISTINCT over the ``'a b'`` joined strings the SQL
    oracle counts.  Integer outputs -> hash-exact."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    n_bi = np.zeros(n, dtype=np.int64)
    n_dup = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = _TOKEN_RE.findall(t or "")
        m = len(toks) - 1
        if m <= 0:
            continue
        n_bi[i] = m
        n_dup[i] = m - len(set(zip(toks, toks[1:])))
    return pa.table({id_col: batch[id_col],
                     "n_bigrams": pa.array(n_bi, pa.int64()),
                     "n_dup_bigrams": pa.array(n_dup, pa.int64())})


def repetition_scores(docs_ds, text_col: str = "text",
                      id_col: str = "doc_id"):
    return docs_ds.map_batches(
        lambda b: repetition_batch(b, text_col, id_col),
        batch_format="pyarrow")


def contamination_counts(docs_ds, eval_ds, k: int = 8,
                         text_col: str = "text", id_col: str = "doc_id"):
    """Benchmark decontamination (the n-gram-overlap check every LLM
    training pipeline runs before training): per document, the number
    of DISTINCT length-``k`` character shingles it shares with the
    EVAL corpus.  Exact string shingles (no hashing), so the SQL
    oracle is substr-for-substr identical.

    Scale shape: the eval corpus is the small side by definition
    (benchmarks are fixed and tiny next to 100 TB of training data) —
    its distinct shingle set is built with per-partition set partials,
    unioned on the driver (O(eval shingles)), shipped ONCE via
    ``ray.put``, and every training batch counts overlaps against the
    broadcast set locally; the training side streams, nothing else
    lands on the driver."""
    import ray

    def eval_shingles(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for t in batch[text_col].to_pylist():
            t = t or ""
            out.update(t[j:j + k] for j in range(len(t) - k + 1))
        return pa.table({"sh": pa.array(sorted(out), pa.string())})

    ev: set[str] = set()
    for b in eval_ds.map_batches(eval_shingles, batch_format="pyarrow") \
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        ev.update(b["sh"].to_pylist())
    ev_ref = ray.put(ev)

    def count(batch: pa.Table) -> pa.Table:
        evs = ray.get(ev_ref)
        texts = batch[text_col].to_pylist()
        n = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            t = t or ""
            sh = {t[j:j + k] for j in range(len(t) - k + 1)}
            n[i] = len(sh & evs)
        return pa.table({id_col: batch[id_col],
                         "n_overlap": pa.array(n, pa.int64())})

    return docs_ds.map_batches(count, batch_format="pyarrow")


def quality_scores(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Heuristic quality features per doc: char count, token count, mean
    token length, punctuation ratio, uppercase ratio.  Pure integer /
    exact-ratio outputs so they are oracle-checkable."""

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_chars = pc.fill_null(pc.utf8_length(batch[text_col]), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_tokens = count_regex(batch[text_col], r"\w+")
        n_punct = count_regex(batch[text_col], r"[^\w\s]")
        denom = np.maximum(n_chars, 1)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "punct_ratio": pa.array(n_punct / denom, pa.float64()),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")


class LangId:
    """n-gram/stopword heuristic language id — stateful stage (actor
    pool): tables compiled once per actor (__init__), applied per batch
    (__call__), the T1 pattern of SURVEY.md §2.4.

    Semantics (mirrored exactly by the generated SQL oracle): tokens =
    first 200 ASCII ``\\w+`` runs, lowercased, as a SET; language =
    alphabetically-first argmax of distinct-stopword hits, 'und' on
    zero hits.  Fully vectorized: Arrow C kernels split/lower/match the
    whole batch (RE2's ``\\W`` is ASCII like the Python pattern); the
    per-language bitmask handles words shared between languages
    ('de' is a stopword of fr AND es)."""

    MAX_TOKENS = 200

    def __init__(self) -> None:
        self.langs = sorted(_STOPWORDS)  # alphabetical = tie-break order
        words = sorted({w for t in _STOPWORDS.values() for w in t})
        self.word_arr = pa.array(words, pa.string())
        bits = np.zeros(len(words), dtype=np.int64)
        for li, lang in enumerate(self.langs):
            for w in _STOPWORDS[lang]:
                bits[words.index(w)] |= 1 << li
        self.bits = bits
        self.lang_np = np.array(self.langs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        lists = pc.split_pattern_regex(text, pattern=r"\W+")
        if isinstance(lists, pa.ChunkedArray):  # pragma: no cover
            lists = lists.combine_chunks()
        parent = lists.value_parent_indices().to_numpy(zero_copy_only=False)
        flat = lists.flatten()
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parent = parent[nonempty]
        flat = flat.filter(pa.array(nonempty))
        if len(parent):
            # keep only the first MAX_TOKENS tokens of each row
            starts = np.searchsorted(parent, np.arange(n))
            pos = np.arange(len(parent)) - starts[parent]
            keep = pos < self.MAX_TOKENS
            parent = parent[keep]
            flat = flat.filter(pa.array(keep))
        codes = pc.fill_null(
            pc.index_in(pc.utf8_lower(flat), value_set=self.word_arr), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        valid = codes >= 0
        rows, cds = parent[valid], codes[valid]
        # SET semantics: one hit per distinct (row, stopword);
        # stride = vocabulary size, so growing the stopword tables can
        # never silently alias codes (the old hardcoded 64 would)
        stride = np.int64(len(self.word_arr))
        ukey = np.unique(rows * stride + cds)
        urow, ucode = ukey // stride, ukey % stride
        ubits = self.bits[ucode]
        counts = np.zeros((n, len(self.langs)), dtype=np.int64)
        for li in range(len(self.langs)):
            counts[:, li] = np.bincount(
                urow, weights=(ubits >> li) & 1, minlength=n
            ).astype(np.int64)[:n]
        if n:
            best = counts.argmax(axis=1)  # ties -> lowest index = alpha-first
            langs = np.where(counts.max(axis=1) > 0,
                             self.lang_np[best], "und")
        else:
            langs = np.array([], dtype=object)
        return batch.append_column(
            "lang_pred", pa.array(langs.tolist(), pa.string())
        )


@functools.lru_cache(maxsize=1)
def _lang_id_tables() -> "LangId":
    """One compiled stopword table per WORKER PROCESS (lru_cache lives
    in the worker's module globals) — the actor-pool benefit without
    the actor pool."""
    return LangId()


def _lang_id_batch(batch: pa.Table) -> pa.Table:
    return _lang_id_tables()(batch)


def lang_id(docs_ds, concurrency: int | None = None):
    """Language-id as a plain TASK pool.

    The compiled state is a few hundred stopwords (~1 ms to build,
    cached per worker process via ``_lang_id_tables``), so tasks —
    which scale with input blocks and need no ramp-up — beat an actor
    pool: the old autoscaling 4-actor default flatlined a 1M-doc
    corpus at ~10 s whether the cluster had 8 or 32 CPUs (BASELINE.md
    round-5m), invisible at gate scale.  ``concurrency`` caps
    concurrent tasks; ``None`` (default) lets the scheduler use every
    free CPU.  Scheduling-only knob: output rows are bit-identical at
    any setting (row-pure map)."""
    kw = {} if concurrency is None else {"concurrency": concurrency}
    return docs_ds.map_batches(_lang_id_batch, batch_format="pyarrow",
                               batch_size=1024, **kw)


def term_frequencies(docs_ds, text_col: str = "text",
                     num_groups: int | None = None):
    """Corpus-level term frequency: ``(term, n)`` over lowercased ASCII
    ``\\w+`` tokens — the classic web-text vocabulary sweep.

    Shape: Arrow C kernels lower/split/flatten the whole batch, a
    per-batch ``value_counts`` pre-combines (map-side partial — the
    payload leaving each batch is its distinct-term histogram, not the
    token stream), then ``coarse_agg`` sums per term.  Term cardinality
    scales with the corpus, so the native sort-aggregate is out
    (stages/agg.py rationale)."""
    import pyarrow.compute as pc

    from .agg import coarse_agg

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[text_col].combine_chunks(), "")
        lists = pc.split_pattern_regex(pc.utf8_lower(text), pattern=r"\W+")
        if isinstance(lists, pa.ChunkedArray):  # pragma: no cover
            lists = lists.combine_chunks()
        flat = lists.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({"term": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    counted = docs_ds.map_batches(partial, batch_format="pyarrow")
    return coarse_agg(counted, ["term"], [("n", "sum", "n")],
                      num_groups=num_groups)


def top_terms(docs_ds, k: int = 50, text_col: str = "text") -> pa.Table:
    """Top-``k`` corpus terms by frequency, ties broken term-ascending.
    Per-partition top-k cut after the distributed count — the driver
    merges at most (partitions x k) candidate rows, never the full
    vocabulary."""
    freqs = term_frequencies(docs_ds, text_col=text_col)

    def cut(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        terms = np.asarray(batch["term"].to_pylist())
        order = np.lexsort((terms, -n))[:k]
        return pa.table({"term": pa.array(terms[order].tolist(), pa.string()),
                         "n": pa.array(n[order], pa.int64())})

    parts = [
        b for b in freqs.map_batches(
            cut, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return pa.table({"term": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    return cut(pa.concat_tables(parts))


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """128-bit MD5 content fingerprint (hex) — one C call per document
    (replaces the round-1 per-byte Python FNV loop), stable across runs
    and directly oracle-able (DuckDB ``md5(text)``)."""
    import hashlib

    fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
           for t in batch[text_col].to_pylist()]
    return pa.table({id_col: batch[id_col],
                     "fingerprint": pa.array(fps, pa.string())})


def fingerprints(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    return docs_ds.map_batches(
        lambda b: fingerprint_batch(b, text_col, id_col), batch_format="pyarrow"
    )


def rolling_fingerprint_batch(batch: pa.Table, text_col: str = "text",
                              id_col: str = "doc_id") -> pa.Table:
    """64-bit polynomial rolling fingerprint over the UTF-8 bytes —
    fully vectorized per document (one wraparound multiply-accumulate
    pass, no per-byte Python), splitmix64-finished.  The incremental
    variant for pipelines that extend documents: append m bytes by
    ``h' = h * P^m + poly(new bytes)``."""
    from ..stages.dedup import _FNV_PRIME, _mix64

    texts = batch[text_col].to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8) \
            .astype(np.uint64)
        if len(b) == 0:
            out[i] = 0
            continue
        pows = np.multiply.accumulate(
            np.r_[np.uint64(1), np.full(len(b) - 1, _FNV_PRIME,
                                        dtype=np.uint64)]
        )
        out[i] = (b[::-1] * pows).sum()  # sum wraps in uint64
    return pa.table({id_col: batch[id_col],
                     "fingerprint": pa.array(
                         _mix64(out).astype(np.int64), pa.int64())})


def rolling_fingerprints(docs_ds, text_col: str = "text",
                         id_col: str = "doc_id"):
    return docs_ds.map_batches(
        lambda b: rolling_fingerprint_batch(b, text_col, id_col),
        batch_format="pyarrow",
    )


# PII redaction contract: all three patterns are RE2 (the engine runs
# them through Arrow's C kernels, the oracle through DuckDB — both
# RE2), applied IN ORDER with each count taken on the text as redacted
# so far, so engine and oracle are byte-exact by construction.  The
# order matters (an address inside an email is consumed by the email
# pass) and is part of the contract.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("n_ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("n_phones", r"(?:\+\d{7,15}|\b\d{3}-\d{3,4}-\d{4})\b", "<PHONE>"),
)


def pii_scrub_batch(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """(doc_id, clean_text, n_emails, n_ipv4, n_phones) — redact
    email addresses, dotted-quad IPv4 addresses and phone-shaped
    numbers, the pre-release scrub every published web-text pipeline
    runs (e.g. the C4 / RefinedWeb cleanup passes).  Stateless and
    fully vectorized: one RE2 count + one RE2 global replace per
    pattern per batch, no per-row Python."""
    import pyarrow.compute as pc

    cur = pc.fill_null(batch[text_col], "")
    cols: dict[str, pa.Array | pa.ChunkedArray] = {id_col: batch[id_col]}
    for out, pat, repl in PII_PATTERNS:
        cols[out] = pa.array(count_regex(cur, pat), pa.int64())
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=repl)
    cols["clean_text"] = cur
    return pa.table(cols)


def pii_scrub(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Streaming PII redaction over a documents Dataset — embarrassingly
    parallel (no shuffle, no state), so it scales linearly with input
    bytes; at 100 TB the cost is one RE2 scan per pattern per byte."""
    return docs_ds.map_batches(
        lambda b: pii_scrub_batch(b, text_col, id_col),
        batch_format="pyarrow")


def oov_counts(docs_ds, vocab_k: int = 1000, text_col: str = "text",
               id_col: str = "doc_id"):
    """(doc_id, n_tokens, n_oov) — per-document out-of-vocabulary
    token occurrences against the corpus top-``vocab_k`` vocabulary
    (count DESC, term ASC tie-break, the ``top_terms`` contract).
    High OOV rate = rare-token-heavy text (OCR noise, codes, spam) —
    a standard quality-filter signal.  Integer outputs -> hash-exact.

    Scale shape: the vocabulary is a top-k CAP by construction, so it
    is driver-sized whatever the corpus size; it ships ONCE via
    ``ray.put`` and each batch resolves membership with one Arrow
    ``index_in`` + numpy segment sums — no shuffle of the token
    stream, no per-row Python."""
    import ray
    import pyarrow.compute as pc

    vocab = top_terms(docs_ds, k=vocab_k, text_col=text_col)
    vref = ray.put(vocab["term"].combine_chunks())

    def count(batch: pa.Table) -> pa.Table:
        vset = ray.get(vref)
        text = pc.fill_null(batch[text_col].combine_chunks(), "")
        lists = pc.split_pattern_regex(pc.utf8_lower(text), pattern=r"\W+")
        if isinstance(lists, pa.ChunkedArray):  # pragma: no cover
            lists = lists.combine_chunks()
        flat = lists.flatten()
        offsets = lists.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = offsets[:-1] - offsets[0]
        ends = offsets[1:] - offsets[0]
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        in_vocab = pc.is_valid(pc.index_in(flat, value_set=vset)) \
            .to_numpy(zero_copy_only=False)
        cum_t = np.r_[0, np.cumsum(nonempty.astype(np.int64))]
        cum_o = np.r_[0, np.cumsum((nonempty & ~in_vocab).astype(np.int64))]
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pa.array(cum_t[ends] - cum_t[starts], pa.int64()),
            "n_oov": pa.array(cum_o[ends] - cum_o[starts], pa.int64()),
        })

    return docs_ds.map_batches(count, batch_format="pyarrow")


# Whitespace normalization contract (RE2, shared with the SQL oracle):
# collapse every run of RE2 \s ([\t\n\f\r ]) to one space, then strip
# one leading / trailing space — the canonicalization pass dedup
# pipelines run before hashing so formatting-only variants collide.
_WS_RUN = r"[\t\n\f\r ]+"


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    import pyarrow.compute as pc

    t = pc.replace_substring_regex(
        pc.fill_null(batch[text_col], ""), pattern=_WS_RUN, replacement=" ")
    t = pc.replace_substring_regex(t, pattern=r"^ | $", replacement="")
    return pa.table({id_col: batch[id_col], "norm_text": t})


def normalize_text(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, norm_text) — streaming, stateless, no shuffle."""
    return docs_ds.map_batches(
        lambda b: normalize_text_batch(b, text_col, id_col),
        batch_format="pyarrow")


# GPT-2-style pre-tokenizer, reduced to pure RE2 (the original's
# trailing-whitespace lookahead `\s+(?!\S)` is dropped — RE2 has no
# lookahead; a whitespace run still counts as ONE piece, it just isn't
# re-split before a following word).  Unicode-aware via RE2 \p{L}/\p{N},
# shared verbatim with the DuckDB oracle (quote-doubled there).
BPE_PIECE_RE = (r"'s|'t|'re|'ve|'m|'ll|'d"
                r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")


def bpe_token_counts(docs_ds, text_col: str = "text",
                     id_col: str = "doc_id"):
    """(doc_id, n_pieces) — BPE-ish pre-token counts, the token-budget
    estimate training pipelines use before the real tokenizer runs
    (piece counts upper-bound BPE tokens and track them closely).
    One RE2 C-kernel count per batch, no per-row Python."""

    def count(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            "n_pieces": pa.array(count_regex(batch[text_col],
                                             BPE_PIECE_RE), pa.int64()),
        })

    return docs_ds.map_batches(count, batch_format="pyarrow")


def doc_bigram_rows(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """(doc_id, bg) rows: consecutive lowercased ``\\W+``-split token
    pairs per document, joined by one space — the n=2 case of
    ``doc_ngram_rows`` (ONE tokenizer/window implementation for the
    bigram and n-gram query families; the SQL mirror is
    ``list_filter(regexp_split_to_array(...))`` + ``list_zip``)."""
    t = doc_ngram_rows(batch, 2, text_col, id_col)
    return t.rename_columns([id_col, "bg"])


BIGRAM_COUNT_CAP = 1000


def bigram_familiarity(docs_ds, cap: int = BIGRAM_COUNT_CAP,
                       num_groups: int | None = None):
    """Per-document BIGRAM FAMILIARITY — a KenLM-free, exactly-
    reproducible stand-in for LM-based quality scoring (CCNet-style
    filtering, Wenzek et al. 2020 uses LM perplexity; here the score
    is corpus-self-trained and integer-exact so the SQL oracle can
    mirror it bit-for-bit): for each doc,

        fam_nano = sum_i min(corpus_count(bg_i), cap) * 1e9
                   // n_bigrams,

    where corpus_count is the bigram's frequency across the whole
    corpus.  Boilerplate-heavy docs score high, gibberish scores ~1e9
    * its self-support.  All stages distributed, and the bigram
    STRINGS cross the wire exactly ONCE (r4 verdict item 6 — this was
    the slowest suite query at 13.3 s, cost = string-shuffle volume):

    1. per-batch emission: ``doc_bigram_rows`` + a map-side
       ``(doc_id, bg)`` multiplicity combine — a doc repeating a
       bigram k times ships ONE row ``(doc_id, bg, k)``, not k rows;
    2. ONE coarse shuffle on ``hash64(bg) % G``.  The partition key
       is a pure function of the bigram value, so every occurrence of
       a bigram lands in one partition — the within-partition sum of
       ``k`` IS the exact global corpus count.  That makes the old
       separate count aggregate (a second full string shuffle) and
       the union + co-grouped count join redundant: each partition
       self-counts and attaches locally (collisions of ``hash64``
       don't matter — the in-partition grouping is by the STRING);
    3. per-doc sums via ``coarse_agg`` on doc_id (int columns only);
       docs with < 2 tokens re-enter with fam_nano = 0 through a
       final co-grouped left join against the doc_id universe.

    int64 bound: fam sums stay < 2^63 while cap * n_bigrams < 9.2e9
    — i.e. up to ~9.2M bigrams per doc at the default cap (longer
    docs should be length-split upstream first).

    Returns Dataset ``(doc_id, n_bigrams, fam_nano)``.
    """
    import pyarrow.compute as pc

    from ..context import derive_num_groups
    from .agg import coarse_agg
    from .ids import hash64

    def emit(batch: pa.Table) -> pa.Table:
        t = doc_bigram_rows(batch)
        g = t.group_by(["doc_id", "bg"]).aggregate([("bg", "count")])
        return pa.table({"doc_id": g["doc_id"], "bg": g["bg"],
                         "k": g["bg_count"].cast(pa.int64())})

    comb = docs_ds.map_batches(emit, batch_format="pyarrow").materialize()
    if num_groups is None:
        num_groups = derive_num_groups(comb)
    G = num_groups

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({"part": pa.array(hash64(b["bg"]) % G, pa.int64()),
                         "doc_id": b["doc_id"], "bg": b["bg"],
                         "k": b["k"]})

    def attach(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64())})
        cnt = t.group_by("bg").aggregate([("k", "sum")])
        j = t.select(["doc_id", "bg", "k"]).join(
            cnt, keys=["bg"], join_type="inner")
        k = j["k"].to_numpy(zero_copy_only=False)
        c = np.minimum(j["k_sum"].to_numpy(zero_copy_only=False),
                       np.int64(cap))
        part = pa.table({"doc_id": j["doc_id"],
                         "s": pa.array(k * c, pa.int64()),
                         "nb": pa.array(k, pa.int64())})
        g = part.group_by("doc_id").aggregate(
            [("s", "sum"), ("nb", "sum")])
        return pa.table({"doc_id": g["doc_id"],
                         "s": g["s_sum"].cast(pa.int64()),
                         "nb": g["nb_sum"].cast(pa.int64())})

    per_doc = coarse_agg(
        comb.map_batches(tag, batch_format="pyarrow")
        .groupby("part").map_groups(attach, batch_format="pyarrow"),
        ["doc_id"], [("s", "sum", "s"), ("nb", "sum", "nb")],
        num_groups=G,
    )

    def tag_docs(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"part": pa.array(ids % G, pa.int64()),
                         "doc_id": b["doc_id"],
                         "s": pa.nulls(b.num_rows, pa.int64()),
                         "nb": pa.nulls(b.num_rows, pa.int64())})

    def tag_scores(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"part": pa.array(ids % G, pa.int64()),
                         "doc_id": b["doc_id"], "s": b["s"],
                         "nb": b["nb"]})

    universe = docs_ds.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"]}),
        batch_format="pyarrow")
    allrows = universe.map_batches(tag_docs, batch_format="pyarrow").union(
        per_doc.map_batches(tag_scores, batch_format="pyarrow"))

    def fill(t: pa.Table) -> pa.Table:
        have = pc.is_valid(t["nb"])
        scored = t.filter(have)
        docs = t.filter(pc.invert(have)).select(["doc_id"])
        ids = docs["doc_id"].to_numpy(zero_copy_only=False)
        sid = scored["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(sid, kind="stable")
        sid = sid[order]
        s = scored["s"].to_numpy(zero_copy_only=False)[order]
        nb = scored["nb"].to_numpy(zero_copy_only=False)[order]
        i = np.clip(np.searchsorted(sid, ids), 0, max(len(sid) - 1, 0))
        hit = (sid[i] == ids if len(sid)
               else np.zeros(len(ids), dtype=bool))
        nbo = np.zeros(len(ids), dtype=np.int64)
        fam = np.zeros(len(ids), dtype=np.int64)
        nbo[hit] = nb[i[hit]]
        fam[hit] = (s[i[hit]] * np.int64(1_000_000_000)) // nb[i[hit]]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_bigrams": pa.array(nbo, pa.int64()),
                         "fam_nano": pa.array(fam, pa.int64())})

    return allrows.groupby("part").map_groups(fill, batch_format="pyarrow")


def doc_ngram_rows(batch: pa.Table, n: int, text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """(doc_id, g) rows: consecutive lowercased ``\\W+``-split word
    n-grams per document, joined by single spaces — the length-``n``
    generalization of ``doc_bigram_rows`` under the identical
    tokenizer contract (empty tokens dropped BEFORE windowing, so the
    SQL mirror is ``list_filter(regexp_split_to_array(...))`` + list
    slices).  All-Arrow/numpy: flatten once, one window-boundary mask,
    one n-way vectorized join — no Python loop over tokens."""
    import pyarrow.compute as pc

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "g": pa.array([], pa.string())})
    if batch.num_rows == 0:
        return empty
    text = pc.fill_null(batch[text_col].combine_chunks(), "")
    lists = pc.split_pattern_regex(pc.utf8_lower(text), pattern=r"\W+")
    if isinstance(lists, pa.ChunkedArray):  # pragma: no cover
        lists = lists.combine_chunks()
    flat = lists.flatten()
    counts = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    docidx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    docidx = docidx[keep]
    L = len(docidx)
    if L < n:
        return empty
    # tokens of one doc are contiguous, so a window starting at i lies
    # inside one doc iff its first and last tokens share the doc index
    same = pa.array(docidx[n - 1:] == docidx[:L - n + 1])
    cols = [flat.slice(j, L - n + 1).filter(same) for j in range(n)]
    g = pc.binary_join_element_wise(*cols, " ")
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    win_doc = ids[docidx[:L - n + 1][same.to_numpy(zero_copy_only=False)]]
    return pa.table({id_col: pa.array(win_doc, pa.int64()), "g": g})


def duplicated_ngram_stats(docs_ds, n: int = 5,
                           num_groups: int | None = None):
    """Per-document DUPLICATED-N-GRAM FRACTION (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    corpus-internal duplication measure behind their NearDup/ExactSubstr
    analysis, word-n-gram granularity): a length-``n`` word n-gram is
    *duplicated* iff it occurs in >= 2 DISTINCT documents; per doc,

        dup_frac_nano = n_dup_grams * 1e9 // n_grams   (0 if no grams),

    where ``n_grams`` counts every n-gram occurrence in the doc and
    ``n_dup_grams`` the occurrences whose gram is duplicated.  Exact
    integers -> hash-exact SQL oracle.

    Distributed shape = the ``bigram_familiarity`` single-shuffle
    self-counting design: (1) map-side ``(doc_id, g, k)`` multiplicity
    combine (a doc is one row, so per-batch combine is globally
    per-doc); (2) ONE coarse shuffle on ``hash64(g) % G`` — the key is
    a pure function of the gram, so each partition holds EVERY doc row
    of its grams and the in-partition row count per gram IS the exact
    distinct-doc count (grouping is by the string; hash collisions
    are harmless); (3) per-doc int sums via ``coarse_agg``; (4) docs
    with < n tokens re-enter with zeros through the co-grouped
    universe fill.  Gram strings cross the wire exactly once.

    int64 bound: per-doc sums are occurrence counts * 1e9, safe while
    a single doc holds < 9.2e9 n-grams (length-split longer docs
    upstream).

    Returns Dataset ``(doc_id, n_grams, n_dup_grams, dup_frac_nano)``.
    """
    import pyarrow.compute as pc

    from ..context import derive_num_groups
    from .agg import coarse_agg
    from .ids import hash64

    def emit(batch: pa.Table) -> pa.Table:
        t = doc_ngram_rows(batch, n)
        g = t.group_by(["doc_id", "g"]).aggregate([("g", "count")])
        return pa.table({"doc_id": g["doc_id"], "g": g["g"],
                         "k": g["g_count"].cast(pa.int64())})

    comb = docs_ds.map_batches(emit, batch_format="pyarrow").materialize()
    if num_groups is None:
        num_groups = derive_num_groups(comb)
    G = num_groups

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({"part": pa.array(hash64(b["g"]) % G, pa.int64()),
                         "doc_id": b["doc_id"], "g": b["g"], "k": b["k"]})

    def attach(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "dup": pa.array([], pa.int64()),
                             "tot": pa.array([], pa.int64())})
        # rows are per (doc_id, g), so count(*) per g = distinct docs
        nd = t.group_by("g").aggregate([("g", "count")])
        j = t.select(["doc_id", "g", "k"]).join(
            pa.table({"g": nd["g"],
                      "nd": nd["g_count"].cast(pa.int64())}),
            keys=["g"], join_type="inner")
        k = j["k"].to_numpy(zero_copy_only=False)
        isdup = j["nd"].to_numpy(zero_copy_only=False) >= 2
        part = pa.table({"doc_id": j["doc_id"],
                         "dup": pa.array(np.where(isdup, k, 0), pa.int64()),
                         "tot": pa.array(k, pa.int64())})
        g = part.group_by("doc_id").aggregate(
            [("dup", "sum"), ("tot", "sum")])
        return pa.table({"doc_id": g["doc_id"],
                         "dup": g["dup_sum"].cast(pa.int64()),
                         "tot": g["tot_sum"].cast(pa.int64())})

    per_doc = coarse_agg(
        comb.map_batches(tag, batch_format="pyarrow")
        .groupby("part").map_groups(attach, batch_format="pyarrow"),
        ["doc_id"], [("dup", "sum", "dup"), ("tot", "sum", "tot")],
        num_groups=G,
    )

    def tag_docs(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"part": pa.array(ids % G, pa.int64()),
                         "doc_id": b["doc_id"],
                         "dup": pa.nulls(b.num_rows, pa.int64()),
                         "tot": pa.nulls(b.num_rows, pa.int64())})

    def tag_scores(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"part": pa.array(ids % G, pa.int64()),
                         "doc_id": b["doc_id"], "dup": b["dup"],
                         "tot": b["tot"]})

    universe = docs_ds.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"]}),
        batch_format="pyarrow")
    allrows = universe.map_batches(tag_docs, batch_format="pyarrow").union(
        per_doc.map_batches(tag_scores, batch_format="pyarrow"))

    def fill(t: pa.Table) -> pa.Table:
        have = pc.is_valid(t["tot"])
        scored = t.filter(have)
        docs = t.filter(pc.invert(have)).select(["doc_id"])
        ids = docs["doc_id"].to_numpy(zero_copy_only=False)
        sid = scored["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(sid, kind="stable")
        sid = sid[order]
        dup = scored["dup"].to_numpy(zero_copy_only=False)[order]
        tot = scored["tot"].to_numpy(zero_copy_only=False)[order]
        i = np.clip(np.searchsorted(sid, ids), 0, max(len(sid) - 1, 0))
        hit = (sid[i] == ids if len(sid)
               else np.zeros(len(ids), dtype=bool))
        tot_o = np.zeros(len(ids), dtype=np.int64)
        dup_o = np.zeros(len(ids), dtype=np.int64)
        frac = np.zeros(len(ids), dtype=np.int64)
        tot_o[hit] = tot[i[hit]]
        dup_o[hit] = dup[i[hit]]
        frac[hit] = (dup_o[hit] * np.int64(1_000_000_000)) // tot_o[hit]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_grams": pa.array(tot_o, pa.int64()),
                         "n_dup_grams": pa.array(dup_o, pa.int64()),
                         "dup_frac_nano": pa.array(frac, pa.int64())})

    return allrows.groupby("part").map_groups(fill, batch_format="pyarrow")


def postings_for_terms(docs_ds, terms: list[str],
                       text_col: str = "text",
                       num_groups: int | None = None):
    """Inverted-index POSTING LISTS for a fixed vocabulary: rows
    ``(term, doc_id, tf)`` for every document containing a vocabulary
    term.  The vocabulary ships in the task closure (callers pass a
    bounded set — e.g. ``top_terms``'s output); per batch the token
    stream filters through one vectorized ``is_in`` before any
    grouping, so the full vocabulary never shuffles.  The full-corpus
    index (unbounded vocabulary) is the same pipeline with the
    ``is_in`` filter removed and the final ``coarse_agg`` keyed on
    term — each term bucket then writes one partitioned-parquet
    posting file."""
    import pyarrow.compute as pc

    from .agg import coarse_agg

    vocab = pa.array(sorted(set(terms)), pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[text_col].combine_chunks(), "")
        lists = pc.split_pattern_regex(pc.utf8_lower(text),
                                       pattern=r"\W+")
        if isinstance(lists, pa.ChunkedArray):  # pragma: no cover
            lists = lists.combine_chunks()
        flat = lists.flatten()
        counts = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        docidx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        keep = pc.is_in(flat, value_set=vocab).to_numpy(
            zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = pa.table({"term": flat,
                      "doc_id": pa.array(ids[docidx[keep]], pa.int64())})
        g = t.group_by(["term", "doc_id"]).aggregate([([], "count_all")])
        return pa.table({"term": g["term"], "doc_id": g["doc_id"],
                         "tf": g["count_all"].cast(pa.int64())})

    partials = docs_ds.map_batches(partial, batch_format="pyarrow")
    return coarse_agg(partials, ["term", "doc_id"],
                      [("tf", "sum", "tf")], num_groups=num_groups)


def tfidf_top_terms_per_doc(docs_ds, k: int = 3,
                            text_col: str = "text",
                            num_groups: int | None = None):
    """Per-document TOP-``k`` terms by integer tf-idf — the classic
    keyword-extraction pass, with a log-free idf so the score is
    bit-exact in both engines:

        tfidf_nano(term, doc) = tf * (N * 1e9 // df(term))

    (idf as the rational N/df in nano units — same ordering as
    1/df for fixed N, no float log).  Pipeline:

    1. tf rows ``(term, doc_id, tf)`` — per-batch Arrow hash-agg
       partial, ``coarse_agg`` keyed on term;
    2. df = ``coarse_agg`` count over the tf rows per term (presence
       count, not occurrence count);
    3. df re-attached to tf rows by the string-keyed co-grouped Arrow
       join (``hash64(term)`` tag — vocabulary never broadcast);
    4. per-doc top-k: rows re-partition on ``doc_id`` and one
       vectorized lexsort sweep cuts k per doc under the total order
       (tfidf desc, term asc).

    int64 bound (same contract style as ``bigram_familiarity`` /
    ``clustering_coefficients``): scores need
    ``tf * (N * 1e9 // df) < 2^63`` — e.g. a hapax term (df=1) in a
    1e9-doc corpus overflows at tf >= 10.  Rows exceeding the bound
    RAISE (vectorized per-partition check) instead of wrapping
    silently; corpora near the bound should bucket-shard the doc space
    first (tf-idf per shard with shard-local N — the standard sharded-
    index practice).

    Returns Dataset ``(doc_id, term, tfidf_nano)``.
    """
    import pyarrow.compute as pc

    from ..context import derive_num_groups
    from .agg import coarse_agg
    from .ids import hash64

    def tf_partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[text_col].combine_chunks(), "")
        lists = pc.split_pattern_regex(pc.utf8_lower(text),
                                       pattern=r"\W+")
        if isinstance(lists, pa.ChunkedArray):  # pragma: no cover
            lists = lists.combine_chunks()
        flat = lists.flatten()
        counts = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        docidx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = pa.table({"term": flat,
                      "doc_id": pa.array(ids[docidx[keep]], pa.int64())})
        g = t.group_by(["term", "doc_id"]).aggregate([([], "count_all")])
        return pa.table({"term": g["term"], "doc_id": g["doc_id"],
                         "tf": g["count_all"].cast(pa.int64())})

    n_docs = docs_ds.count()
    tfs = coarse_agg(
        docs_ds.map_batches(tf_partial, batch_format="pyarrow"),
        ["term", "doc_id"], [("tf", "sum", "tf")],
        num_groups=num_groups,
    ).materialize()
    if num_groups is None:
        num_groups = derive_num_groups(tfs)
    G = num_groups
    dfs = coarse_agg(tfs, ["term"], [("term", "count", "df")],
                     num_groups=G)

    def tag_tfs(b: pa.Table) -> pa.Table:
        return pa.table({"part": pa.array(hash64(b["term"]) % G, pa.int64()),
                         "term": b["term"], "doc_id": b["doc_id"],
                         "tf": b["tf"],
                         "df": pa.nulls(b.num_rows, pa.int64())})

    def tag_dfs(b: pa.Table) -> pa.Table:
        return pa.table({"part": pa.array(hash64(b["term"]) % G, pa.int64()),
                         "term": b["term"],
                         "doc_id": pa.nulls(b.num_rows, pa.int64()),
                         "tf": pa.nulls(b.num_rows, pa.int64()),
                         "df": b["df"]})

    both = tfs.map_batches(tag_tfs, batch_format="pyarrow").union(
        dfs.map_batches(tag_dfs, batch_format="pyarrow"))
    scale = np.int64(n_docs) * np.int64(1_000_000_000)

    def score(t: pa.Table) -> pa.Table:
        have = pc.is_valid(t["df"])
        d = t.filter(have).select(["term", "df"])
        f = t.filter(pc.invert(have)).select(["term", "doc_id", "tf"])
        if f.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tfidf_nano": pa.array([], pa.int64())})
        j = f.join(d, keys=["term"], join_type="inner")
        tf = j["tf"].to_numpy(zero_copy_only=False)
        df = j["df"].to_numpy(zero_copy_only=False)
        idf = scale // df
        over = tf > np.int64(np.iinfo(np.int64).max) // np.maximum(idf, 1)
        if over.any():
            raise OverflowError(
                "tfidf_top_terms_per_doc: tf * (N*1e9 // df) exceeds "
                "int64 for some rows (hapax-heavy corpus too large for "
                "the nano scale) — shard the doc space first"
            )
        return pa.table({"doc_id": j["doc_id"], "term": j["term"],
                         "tfidf_nano": pa.array(tf * idf, pa.int64())})

    scored = both.groupby("part").map_groups(score, batch_format="pyarrow")

    def tag_doc(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.append_column("dpart", pa.array(ids % G, pa.int64()))

    def topk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sc = t["tfidf_nano"].to_numpy(zero_copy_only=False)
        terms = np.asarray(t["term"].to_pylist())
        order = np.lexsort((terms, -sc, ids))
        ids_o = ids[order]
        b = np.flatnonzero(np.r_[True, ids_o[1:] != ids_o[:-1]])
        within = np.arange(len(ids_o)) - np.repeat(b, np.diff(
            np.r_[b, len(ids_o)]))
        sel = order[within < k]
        return pa.table({
            "doc_id": t["doc_id"].take(pa.array(sel, pa.int64())),
            "term": t["term"].take(pa.array(sel, pa.int64())),
            "tfidf_nano": t["tfidf_nano"].take(pa.array(sel, pa.int64())),
        })

    return scored.map_batches(tag_doc, batch_format="pyarrow") \
        .groupby("dpart").map_groups(topk, batch_format="pyarrow")


def vocab_stats(docs_ds, text_col: str = "text"):
    """Corpus vocabulary statistics in one row: total token count,
    distinct types, hapax legomena (frequency-1 types) and the
    type/token ratio in integer nano — the Zipf-tail health check a
    corpus build runs after dedup.  One distributed term-frequency
    pass (``term_frequencies``), then a map-side 3-scalar partial per
    block and a driver-sized final sum."""
    freqs = term_frequencies(docs_ds, text_col=text_col)

    def partial(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_types": pa.array([len(n)], pa.int64()),
            "n_tokens": pa.array([int(n.sum())], pa.int64()),
            "n_hapax": pa.array([int((n == 1).sum())], pa.int64()),
        })

    parts = [b for b in freqs.map_batches(
        partial, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow") if b.num_rows]
    tot = {k: 0 for k in ("n_types", "n_tokens", "n_hapax")}
    for b in parts:
        for k in tot:
            tot[k] += int(b[k][0].as_py())
    ttr = (tot["n_types"] * 1_000_000_000 // tot["n_tokens"]
           if tot["n_tokens"] else 0)
    return pa.table({
        "n_tokens": pa.array([tot["n_tokens"]], pa.int64()),
        "n_types": pa.array([tot["n_types"]], pa.int64()),
        "n_hapax": pa.array([tot["n_hapax"]], pa.int64()),
        "type_token_ratio_nano": pa.array([ttr], pa.int64()),
    })


def doc_chunks(docs_ds, window: int = 64, stride: int = 32,
               text_col: str = "text", id_col: str = "doc_id"):
    """Fixed-size TOKEN-WINDOW chunking with overlap — the training-
    sample prep step that turns documents into model-context-sized
    pieces (graft-added training-data op; the reference implements
    only PageRank, ``MainPR.java``).  Chunk ``c`` of a document covers
    tokens ``[c*stride, min(c*stride + window, n))`` under the
    corpus-standard tokenizer (lowercased ``\\W+`` split, empties
    dropped — same contract as ``term_frequencies``, so the SQL
    mirror is ``list_filter(regexp_split_to_array(...))`` + DuckDB
    list slicing).  Chunk starts run 0, stride, 2*stride, ... while
    < n; zero-token documents emit nothing.

    Pure map — no shuffle, perfect streaming at any corpus size; the
    window overlap duplicates at most ``window/stride`` × the token
    bytes within one output batch.  All-vectorized: one Arrow
    tokenize + flatten, a two-level repeat/arange window expansion
    (the ``_cocite_sweep`` enumeration shape), one ``take`` gather,
    one ``binary_join`` — no Python loop over tokens or rows.

    Returns rows ``(doc_id, chunk_id, n_tokens, chunk)``.
    """
    import pyarrow.compute as pc

    if window < 1 or stride < 1:
        raise ValueError(
            f"doc_chunks: window and stride must be >= 1, got "
            f"window={window} stride={stride}")

    def chunk_batch(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "chunk_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "chunk": pa.array([], pa.string())})
        if batch.num_rows == 0:
            return empty
        text = pc.fill_null(batch[text_col].combine_chunks(), "")
        lists = pc.split_pattern_regex(pc.utf8_lower(text),
                                       pattern=r"\W+")
        if isinstance(lists, pa.ChunkedArray):  # pragma: no cover
            lists = lists.combine_chunks()
        flat = lists.flatten()
        counts = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        docidx = np.repeat(np.arange(len(counts), dtype=np.int64),
                           counts)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        docidx = docidx[keep]
        n = np.bincount(docidx, minlength=len(counts)).astype(np.int64)
        if n.sum() == 0:
            return empty
        doc_start = np.concatenate(
            ([0], np.cumsum(n)))[:-1]          # offset into flat
        n_chunks = -(-n // stride) * (n > 0)   # ceil(n/stride), 0 if empty
        cdoc = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
        cid = (np.arange(int(n_chunks.sum()), dtype=np.int64)
               - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
        cstart = cid * np.int64(stride)
        clen = np.minimum(np.int64(window), n[cdoc] - cstart)
        tot = int(clen.sum())
        rel = (np.arange(tot, dtype=np.int64)
               - np.repeat(np.cumsum(clen) - clen, clen))
        tok_idx = np.repeat(doc_start[cdoc] + cstart, clen) + rel
        gathered = flat.take(pa.array(tok_idx, pa.int64()))
        offsets = np.concatenate(([0], np.cumsum(clen)))
        la = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), gathered)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[cdoc], pa.int64()),
            "chunk_id": pa.array(cid, pa.int64()),
            "n_tokens": pa.array(clen, pa.int64()),
            "chunk": pc.binary_join(la, " "),
        })

    return docs_ds.map_batches(chunk_batch, batch_format="pyarrow")
