"""Deterministic synthetic documents table (scaling-bench input).

The driver's ``documents.parquet`` tops out at 5k rows (sf0.1) — small
enough that every text operator is fixed-overhead-dominated, so
per-operator scaling sweeps read ~1.0 regardless of the engine.  This
source generates the SAME shape ``(doc_id, text, lang, source,
n_chars)`` at arbitrary row counts for the ``bench.py
--scaling-query`` evidence, following the ``synth_graph`` determinism
contract: every random draw is a pure counter-keyed splitmix64 hash of
``(seed, doc_id, position)``, so generation is embarrassingly parallel
inside ``map_batches`` AND bit-identical regardless of block
boundaries or parallelism — both scaling levels read the identical
corpus.

Corpus properties (so the dedup/quality operators have real work):

- word-salad text over a ``vocab_size`` vocabulary with a quadratic
  (Zipf-ish) skew toward low word ids;
- document length ~ floor(Exp(mean_words)), clamped to [5, 4000];
- a ``dup_rate`` fraction of docs are NEAR-DUPLICATES of the anchor
  doc of their 64-doc stripe: same length and word draws, with ~2% of
  positions independently perturbed (MinHash/SimHash/Jaccard land in
  the planted bands; short copies can draw zero flips, leaving a small
  exact-duplicate tail for exact dedup — like real web text);
- ``lang`` / ``source`` drawn per doc (4 langs, 10 sources);
- text has PARAGRAPH structure: words group into ``"\\n\\n"``-joined
  paragraphs of ``para_words`` words, and the first ``boiler_words``
  words of every doc are drawn from its SOURCE's key — a boilerplate
  header paragraph shared by every doc of that source (the CCNet
  shape paragraph-dedup exists for: ~10 hub paragraphs repeated
  n/10 times each).

All assembly is vectorized: one hash pass for the word-index matrix,
one vocabulary ``take``, one ``pyarrow.compute.binary_join`` per
batch.  No Python loop touches a row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .synth_graph import _splitmix64, _u01

_LANGS = np.asarray(["en", "zh", "de", "fr"])
_LANG_CUM = np.asarray([0.5, 0.7, 0.85, 1.0])
_GOLD = np.uint64(0x9E3779B97F4A7C15)
_SALT_WORD = np.uint64(0xC2B2AE3D27D4EB4F)
_SALT_PERTURB = np.uint64(0xD6E8FEB86659FD93)


def _doc_vocab(vocab_size: int) -> pa.Array:
    # a handful of stopword-ish heads so quality/OOV scoring has the
    # frequent-token mass it expects, then numbered tails
    heads = ["the", "of", "and", "to", "a", "in", "is", "for", "on",
             "with", "data", "batch", "sort", "value", "column"]
    words = heads + [f"w{k}" for k in range(len(heads), vocab_size)]
    return pa.array(words[:vocab_size], pa.string())


#: words per paragraph / per source-keyed boilerplate header (module
#: constants, part of the corpus definition — bump the bench cache
#: version when changing).  The header length EQUALS the paragraph
#: length so the boilerplate lands as exactly the first paragraph —
#: a hub paragraph repeated by every long-enough doc of its source.
_PARA_WORDS = 40
_BOILER_WORDS = _PARA_WORDS


def _docs_for_ids(ids: np.ndarray, seed: int, mean_words: float,
                  vocab: pa.Array, dup_rate: float, stripe: int,
                  perturb: float) -> pa.Table:
    ids = ids.astype(np.uint64)
    s = np.uint64(seed)
    n = len(ids)
    vocab_size = len(vocab)

    # near-dup plan: doc i draws its words from key(anchor) when the
    # doc-level coin says dup (anchor = stripe head, never itself a dup
    # by construction of the coin on the head id)
    anchors = (ids // np.uint64(stripe)) * np.uint64(stripe)
    h_doc = _splitmix64(ids * _GOLD ^ s)
    is_dup = (_u01(h_doc) < dup_rate) & (ids != anchors)
    draw_id = np.where(is_dup, anchors, ids)

    # length comes from the DRAW id so dup pairs align position-wise
    h_len = _splitmix64(draw_id * _GOLD ^ s ^ np.uint64(1))
    length = np.clip(
        np.floor(-mean_words * np.log(np.maximum(_u01(h_len), 1e-300))),
        5, 4000).astype(np.int64)
    total = int(length.sum())

    h_src = _splitmix64(ids * _GOLD ^ s ^ np.uint64(3))
    si = np.floor(_u01(h_src) * 10).astype(np.int64)

    rep_draw = np.repeat(draw_id, length)
    rep_self = np.repeat(ids, length)
    starts = np.cumsum(length) - length
    j = (np.arange(total, dtype=np.int64)
         - np.repeat(starts, length)).astype(np.uint64)

    hw = _splitmix64(rep_draw * _GOLD ^ (j + np.uint64(1)) * _SALT_WORD ^ s)
    widx = np.floor(_u01(hw) ** 2 * vocab_size).astype(np.int64)
    widx = np.minimum(widx, vocab_size - 1)

    # source-keyed boilerplate header: the first _BOILER_WORDS words of
    # every doc are a function of its SOURCE alone — one hub paragraph
    # per source, repeated by every doc of that source (CCNet shape).
    # Only docs with > 3x the header length carry it, so short docs
    # don't degenerate into header-only texts (which would collide
    # exactly within a source and swamp the planted dup structure).
    rep_src = np.repeat(si.astype(np.uint64), length)
    rep_len = np.repeat(length, length)
    bmask = (j < np.uint64(_BOILER_WORDS)) \
        & (rep_len > 3 * _BOILER_WORDS)
    hb = _splitmix64(rep_src * _GOLD ^ (j + np.uint64(1)) * _SALT_WORD
                     ^ s ^ np.uint64(4))
    bidx = np.minimum(np.floor(_u01(hb) ** 2 * vocab_size)
                      .astype(np.int64), vocab_size - 1)
    widx = np.where(bmask, bidx, widx)

    # dup perturbation: keyed by the doc's OWN id so each copy diverges
    # independently of its anchor
    rep_dup = np.repeat(is_dup, length)
    if rep_dup.any():
        hp = _splitmix64(rep_self * _GOLD ^ (j + np.uint64(1))
                         ^ _SALT_PERTURB ^ s)
        flip = rep_dup & ~bmask & (_u01(hp) < perturb)  # headers stay exact
        alt = np.minimum(
            np.floor(_u01(_splitmix64(hp ^ _GOLD)) ** 2 * vocab_size)
            .astype(np.int64), vocab_size - 1)
        widx = np.where(flip, alt, widx)

    words = vocab.take(pa.array(widx, pa.int64()))
    # two-level join: words -> " "-joined paragraphs of _PARA_WORDS,
    # paragraphs -> "\n\n"-joined doc text (all Arrow C kernels)
    P = (length + _PARA_WORDS - 1) // _PARA_WORDS
    totp = int(P.sum())
    pdoc = np.repeat(np.arange(n), P)
    pstarts = np.cumsum(P) - P
    ppos = np.arange(totp, dtype=np.int64) - np.repeat(pstarts, P)
    plen = np.where(ppos < P[pdoc] - 1, _PARA_WORDS,
                    length[pdoc] - _PARA_WORDS * (P[pdoc] - 1))
    w_off = np.empty(totp + 1, dtype=np.int32)
    w_off[0] = 0
    np.cumsum(plen, out=w_off[1:])
    paras = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(w_off, pa.int32()), words), " ")
    d_off = np.empty(n + 1, dtype=np.int32)
    d_off[0] = 0
    np.cumsum(P, out=d_off[1:])
    text = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(d_off, pa.int32()), paras),
        "\n\n")

    h_lang = _splitmix64(ids * _GOLD ^ s ^ np.uint64(2))
    lang = _LANGS[np.searchsorted(_LANG_CUM, _u01(h_lang), side="right")
                  .clip(0, len(_LANGS) - 1)]
    source = np.char.add("src", si.astype("U1"))

    return pa.table({
        "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
        "text": text,
        "lang": pa.array(lang, pa.string()),
        "source": pa.array(source, pa.string()),
        "n_chars": pc.utf8_length(text).cast(pa.int64()),
    })


def synthetic_documents(n: int, seed: int = 7, mean_words: float = 120.0,
                        vocab_size: int = 2000, dup_rate: float = 0.15,
                        stripe: int = 64, perturb: float = 0.02,
                        override_num_blocks: int | None = None):
    """Distributed documents Dataset — see module docstring."""
    import ray.data as rd

    vocab = _doc_vocab(vocab_size)

    def gen(batch: dict) -> pa.Table:
        return _docs_for_ids(np.asarray(batch["id"]), seed, mean_words,
                             vocab, dup_rate, stripe, perturb)

    return rd.range(n, override_num_blocks=override_num_blocks).map_batches(
        gen, batch_format="numpy"
    )


def documents_table_for_range(lo: int, hi: int, seed: int = 7,
                              mean_words: float = 120.0,
                              vocab_size: int = 2000,
                              dup_rate: float = 0.15, stripe: int = 64,
                              perturb: float = 0.02) -> pa.Table:
    """Rows ``doc_id in [lo, hi)`` of the corpus — identical to the
    same slice of ``synthetic_documents_numpy(n>=hi)`` (counter-keyed
    draws make any id range independently generable; lets a writer
    chunk a large corpus without holding it in memory)."""
    return _docs_for_ids(np.arange(lo, hi, dtype=np.uint64), seed,
                         mean_words, _doc_vocab(vocab_size), dup_rate,
                         stripe, perturb)


def synthetic_documents_numpy(n: int, seed: int = 7,
                              mean_words: float = 120.0,
                              vocab_size: int = 2000,
                              dup_rate: float = 0.15, stripe: int = 64,
                              perturb: float = 0.02) -> pa.Table:
    """Driver-side generation (oracle/test path) — identical rows."""
    return _docs_for_ids(np.arange(n, dtype=np.uint64), seed, mean_words,
                         _doc_vocab(vocab_size), dup_rate, stripe, perturb)


def write_documents_parquet(out_dir: str, n: int, seed: int = 7,
                            override_num_blocks: int | None = None) -> str:
    """Materialize as ``<out_dir>/documents.parquet`` (a DIRECTORY, as
    ``ray.data.read_parquet`` treats it) so the dir slots in as a
    ``sf_dir`` for every documents-only registry query."""
    import os

    synthetic_documents(
        n, seed=seed, override_num_blocks=override_num_blocks
    ).write_parquet(os.path.join(out_dir, "documents.parquet"))
    return out_dir
