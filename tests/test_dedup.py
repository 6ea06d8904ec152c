"""Near-dup dedup families on planted duplicates (graft-added ops)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dxa_pagerank_ray.stages.dedup import (
    _MinHasher,
    exact_dedup_keepers,
    lsh_candidate_pairs,
    minhash_signature,
    minhash_signatures,
    ngram_jaccard,
    simhash_near_dups,
    verify_pairs_by_signature,
)

_BASE = [
    "the quick brown fox jumps over the lazy dog and runs far away ",
    "machine learning models require large curated training corpora ",
    "web crawl data contains boilerplate navigation and footer text ",
    "completely unrelated content about cooking pasta with tomatoes ",
]


def _docs_with_dups() -> pa.Table:
    """9 docs: ids 3i are originals (high unique-shingle count), 3i+1
    near-dups (tiny tail edit -> Jaccard ~0.95), 3i+2 unrelated filler
    with a disjoint vocabulary."""
    texts, ids = [], []
    for i, base in enumerate(_BASE[:3]):
        import hashlib

        orig = " ".join(f"{base.split()[0]}{i}word{j}" for j in range(150))
        filler = " ".join(
            hashlib.md5(f"filler{i}:{j}".encode()).hexdigest()[:10]
            for j in range(150)
        )
        texts += [orig, orig + " tiny tail edit.", filler]
        ids += [3 * i, 3 * i + 1, 3 * i + 2]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_minhash_agreement_tracks_jaccard():
    t = _BASE[0] * 30
    near, far = t + "tail edit.", _BASE[3] * 30
    agree_near = float(np.mean(minhash_signature(t) == minhash_signature(near)))
    agree_far = float(np.mean(minhash_signature(t) == minhash_signature(far)))
    assert abs(agree_near - ngram_jaccard(t, near)) < 0.2
    assert agree_near > 0.7 and agree_far < 0.1


def test_minhash_distributed_matches_local():
    t = _docs_with_dups()
    sigs = minhash_signatures(rd.from_arrow(t).repartition(3)) \
        .sort("doc_id").take_all()
    local = _MinHasher()(t)
    for i, row in enumerate(sigs):
        np.testing.assert_array_equal(np.asarray(row["sig"]),
                                      np.asarray(local["sig"][i].as_py()))


def test_minhash_lsh_finds_planted_pairs_only():
    t = _docs_with_dups()
    sigs = minhash_signatures(rd.from_arrow(t).repartition(3)).materialize()
    pairs = lsh_candidate_pairs(sigs)
    pairs_tbl = pa.concat_tables(
        list(pairs.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )
    sigs_tbl = pa.concat_tables(
        list(sigs.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )
    out = verify_pairs_by_signature(pairs_tbl, sigs_tbl, threshold=0.7)
    got = {(a, b) for a, b in zip(out["a"].to_pylist(), out["b"].to_pylist())}
    assert got == {(0, 1), (3, 4), (6, 7)}


def test_simhash_finds_planted_pairs():
    t = _docs_with_dups()
    out = simhash_near_dups(rd.from_arrow(t).repartition(3), max_hamming=3)
    if hasattr(out, "iter_batches"):
        out = pa.concat_tables(
            list(out.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
        )
    got = {(a, b) for a, b in zip(out["a"].to_pylist(), out["b"].to_pylist())}
    assert {(0, 1), (3, 4), (6, 7)} <= got
    # unrelated docs never pair with originals
    assert all(b - a == 1 for a, b in got)


def test_jaccard_verified_pairs_exact_values():
    from dxa_pagerank_ray.stages.dedup import jaccard_verified_pairs

    t = _docs_with_dups()
    out = jaccard_verified_pairs(rd.from_arrow(t).repartition(3),
                                 threshold=0.8)
    got = {(a, b) for a, b in zip(out["a"].to_pylist(), out["b"].to_pylist())}
    assert got == {(0, 1), (3, 4), (6, 7)}
    # verified values are the EXACT n-gram Jaccard, not the estimate
    texts = {i: t["text"][j].as_py()
             for j, i in enumerate(t["doc_id"].to_pylist())}
    for a, b, j in zip(out["a"].to_pylist(), out["b"].to_pylist(),
                       out["jaccard"].to_pylist()):
        assert j == pytest.approx(ngram_jaccard(texts[a], texts[b]))


def test_embedding_near_dups_empty_result():
    """No pair above threshold -> typed empty table, not a crash (Ray
    drops all-empty map outputs, so concat must fall back)."""
    from dxa_pagerank_ray.stages.dedup import embedding_near_dups

    rng = np.random.default_rng(0)
    t = pa.table({
        "vec_id": pa.array(np.arange(20, dtype=np.int64)),
        "embedding": pa.array(
            [list(map(float, rng.standard_normal(8))) for _ in range(20)],
            pa.list_(pa.float64())),
    })
    out = embedding_near_dups(rd.from_arrow(t), threshold=0.9999)
    assert out.num_rows == 0
    assert out.column_names == ["a", "b", "cosine"]


def test_exact_dedup_keeps_min_id():
    t = pa.table({"doc_id": pa.array([5, 1, 3, 2], pa.int64()),
                  "text": pa.array(["same", "same", "other", "same"])})
    out = exact_dedup_keepers(rd.from_arrow(t)).sort("doc_id").take_all()
    assert [(r["doc_id"], r["n_copies"]) for r in out] == [(1, 3), (3, 1)]
