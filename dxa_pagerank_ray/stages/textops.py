"""Text analysis operators for training-data pipelines (graft-added,
first-class alongside SURVEY.md §2): token counting, quality scoring,
language id, document fingerprinting.

All operators are stateless vectorized ``map_batches`` stages except
language-id, which is a callable class (actor pool) so its stopword
tables are built once per actor, not per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"\w+", re.ASCII)
# Deliberately ASCII so the Python and DuckDB ('\\w+') tokenizations
# agree byte-for-byte on the oracle check.

_PUNCT_RE = re.compile(r"[^\w\s]", re.ASCII)

_STOPWORDS = {
    "en": {"the", "a", "of", "to", "and", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "je", "pas", "de"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "no", "que", "de"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    texts = batch[text_col].to_pylist()
    counts = np.fromiter(
        (len(_TOKEN_RE.findall(t or "")) for t in texts), dtype=np.int64,
        count=len(texts),
    )
    return pa.table({id_col: batch[id_col],
                     "n_tokens": pa.array(counts, pa.int64())})


def token_counts(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    return docs_ds.map_batches(
        lambda b: token_count_batch(b, text_col, id_col), batch_format="pyarrow"
    )


def quality_scores(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Heuristic quality features per doc: char count, token count, mean
    token length, punctuation ratio, uppercase ratio.  Pure integer /
    exact-ratio outputs so they are oracle-checkable."""

    def score(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        n_chars = np.empty(n, dtype=np.int64)
        n_tokens = np.empty(n, dtype=np.int64)
        n_punct = np.empty(n, dtype=np.int64)
        for i, t in enumerate(texts):
            t = t or ""
            n_chars[i] = len(t)
            n_tokens[i] = len(_TOKEN_RE.findall(t))
            n_punct[i] = len(_PUNCT_RE.findall(t))
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
    (__call__), the T1 pattern of SURVEY.md §2.4."""

    def __init__(self) -> None:
        self.word_re = _TOKEN_RE
        self.tables = {
            lang: frozenset(words) for lang, words in _STOPWORDS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs = []
        for t in texts:
            toks = set(w.lower() for w in self.word_re.findall(t or "")[:200])
            best, hits = "und", 0
            for lang, table in sorted(self.tables.items()):
                h = len(toks & table)
                if h > hits:
                    best, hits = lang, h
            langs.append(best)
        return batch.append_column("lang_pred", pa.array(langs, pa.string()))


def lang_id(docs_ds, concurrency: int = 4):
    return docs_ds.map_batches(LangId, batch_format="pyarrow",
                               concurrency=(1, concurrency), batch_size=1024)


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
