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
    """Distributed end to end: pairs + signatures stay Datasets through
    the co-grouped verify (the 100-TB shape)."""
    t = _docs_with_dups()
    sigs = minhash_signatures(rd.from_arrow(t).repartition(3)).materialize()
    pairs = lsh_candidate_pairs(sigs)
    out = verify_pairs_by_signature(pairs, sigs, threshold=0.7).to_pandas()
    got = set(zip(out["a"], out["b"]))
    assert got == {(0, 1), (3, 4), (6, 7)}
    # estimate = exact agreement fraction of the two signatures
    local = _MinHasher()(t)
    sig = {i: np.asarray(local["sig"][j].as_py())
           for j, i in enumerate(t["doc_id"].to_pylist())}
    for a, b, est in zip(out["a"], out["b"], out["est_jaccard"]):
        assert est == float(np.mean(sig[a] == sig[b]))


def test_verify_pairs_empty_candidates():
    t = _docs_with_dups()
    sigs = minhash_signatures(rd.from_arrow(t)).materialize()
    empty = rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                    "b": pa.array([], pa.int64())}))
    out = verify_pairs_by_signature(empty, sigs, threshold=0.7).to_pandas()
    assert len(out) == 0
    # Ray drops all-empty blocks, so the schema may be lost entirely;
    # what matters is no crash and no phantom rows
    assert list(out.columns) in ([], ["a", "b", "est_jaccard"])


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
                                 threshold=0.8).to_pandas()
    got = set(zip(out["a"], out["b"]))
    assert got == {(0, 1), (3, 4), (6, 7)}
    # verified values are the EXACT n-gram Jaccard, not the estimate
    texts = {i: t["text"][j].as_py()
             for j, i in enumerate(t["doc_id"].to_pylist())}
    for a, b, j in zip(out["a"], out["b"], out["jaccard"]):
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


def _planted_embeddings(n: int = 120, d: int = 16, n_dups: int = 5,
                        seed: int = 3) -> pa.Table:
    """n random unit-ish vectors; the last n_dups are tiny perturbations
    of the first n_dups (cosine > 0.999)."""
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    m[n - n_dups:] = m[:n_dups] + 1e-3 * rng.standard_normal((n_dups, d))
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              pa.list_(pa.float64())),
    })


def _exact_pairs_numpy(t: pa.Table, threshold: float) -> set:
    m = np.array(t["embedding"].to_pylist())
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.triu(m @ m.T, k=1)
    ii, jj = np.nonzero(sims >= threshold)
    return set(zip(ii.tolist(), jj.tolist()))


def test_embedding_near_dups_exact_blockpairs():
    """Block-pair path == numpy all-pairs, across block boundaries."""
    from dxa_pagerank_ray.stages.dedup import embedding_near_dups

    t = _planted_embeddings()
    out = embedding_near_dups(rd.from_arrow(t).repartition(4),
                              threshold=0.99, block_rows=16)
    got = set(zip(out["a"].to_pylist(), out["b"].to_pylist()))
    exp = _exact_pairs_numpy(t, 0.99)
    assert got == exp and len(exp) >= 5


def test_embedding_near_dups_lsh_recall():
    from dxa_pagerank_ray.stages.dedup import embedding_near_dups_lsh

    t = _planted_embeddings()
    out = embedding_near_dups_lsh(rd.from_arrow(t).repartition(4),
                                  threshold=0.99).to_pandas()
    got = set(zip(out["a"], out["b"]))
    exp = _exact_pairs_numpy(t, 0.99)
    assert got <= exp  # exact verify -> precision 1
    assert len(got) >= 0.8 * len(exp)


def test_simhash_word_hashes_match_re_tokenization():
    """The vectorized segmented word hasher splits exactly like the
    ASCII \\w+ regex it replaces."""
    import re

    from dxa_pagerank_ray.stages.dedup import _word_hashes

    for text in ["", "   ", "a", "Hello, World_9  foo\tbar\nbaz!",
                 "..leading, and trailing..", "x" * 300]:
        words = re.findall(r"[0-9a-z_]+", text.lower())
        hs = _word_hashes(text)
        assert len(hs) == len(words)
        # same word -> same hash, regardless of position
        byword = {}
        for w, h in zip(words, hs.tolist()):
            assert byword.setdefault(w, h) == h


def test_exact_dedup_keeps_min_id():
    t = pa.table({"doc_id": pa.array([5, 1, 3, 2], pa.int64()),
                  "text": pa.array(["same", "same", "other", "same"])})
    out = exact_dedup_keepers(rd.from_arrow(t)).sort("doc_id").take_all()
    assert [(r["doc_id"], r["n_copies"]) for r in out] == [(1, 3), (3, 1)]


def test_brute_force_topk_tie_break_lower_id():
    """30 identical vectors: every similarity ties, so top-k must be
    exactly the lowest neighbor ids (self excluded) — the per-batch
    candidate cut has to preserve the global (-sim, id) order."""
    import ray.data as rd

    from dxa_pagerank_ray.stages.ann import brute_force_topk

    n, d, k = 30, 8, 10
    # one-hot: every partial product is 0 or 1, so the dot product is
    # EXACTLY 1.0 for every row regardless of BLAS summation order —
    # a dense vector gives row-position-dependent rounding and no ties
    vec = np.zeros(d, dtype=np.float64)
    vec[0] = 1.0
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([vec.tolist()] * n,
                              pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t).repartition(5)
    out = brute_force_topk(ds, np.stack([vec]), np.array([0]), k=k)
    got = out.to_pandas().sort_values("rank")
    assert list(got["neighbor_id"]) == list(range(1, k + 1))


# ---- hub-bucket bound (web-scale safety: one boilerplate band shared
# by millions of docs must not OOM a worker) ----------------------------------

def test_tile_pairs_matches_triu():
    from dxa_pagerank_ray.stages.dedup import _tile_pairs

    for s, e, tile in [(0, 7, 3), (5, 5, 4), (2, 3, 4), (10, 110, 16)]:
        got = set()
        for ii, jj in _tile_pairs(s, e, tile=tile):
            assert len(ii) <= tile * tile  # per-step transient bound
            assert np.all(ii < jj)
            got.update(zip(ii.tolist(), jj.tolist()))
        m = e - s
        ti, tj = np.triu_indices(m, k=1)
        want = set(zip((ti + s).tolist(), (tj + s).tolist()))
        assert got == want


def test_hub_bucket_skipped_and_logged(caplog):
    """A bucket above max_bucket contributes NO pairs (and warns);
    selective buckets in the same partition still pair."""
    import logging

    from dxa_pagerank_ray.stages.dedup import _minhash_pairs_sweep

    hub_n = 10_000
    band = np.r_[np.zeros(hub_n, np.int64), np.ones(2, np.int64)]
    bucket = np.zeros(hub_n + 2, np.int64)
    ids = np.arange(hub_n + 2, dtype=np.int64)
    t = pa.table({"band": band, "bucket": bucket, "doc_id": ids})
    with caplog.at_level(logging.WARNING,
                         logger="dxa_pagerank_ray.stages.dedup"):
        out = _minhash_pairs_sweep(t, id_col="doc_id", max_bucket=4096)
    assert out.to_pydict() == {"a": [hub_n], "b": [hub_n + 1]}
    assert any("skipped 1 hub bucket" in r.message for r in caplog.records)


def test_simhash_giant_bucket_bounded_memory():
    """10k-member bucket, kept (max_bucket raised): the tiled sweep's
    peak transient allocation stays near tile^2, never the O(m^2)
    triu/unpackbits blowup (~3 GB at m=10k) of the unbounded version."""
    import tracemalloc

    from dxa_pagerank_ray.stages.dedup import (_PAIR_TILE,
                                               _simhash_pairs_sweep)

    n = 10_000
    rng = np.random.default_rng(3)
    sigs = rng.integers(0, 2**63, size=n, dtype=np.int64)
    sigs[17] = sigs[4242]  # planted exact dup -> hamming 0
    t = pa.table({
        "band": np.zeros(n, np.int64),
        "bucket": np.zeros(n, np.int64),
        "doc_id": np.arange(n, dtype=np.int64),
        "sig": sigs,
    })
    tracemalloc.start()
    out = _simhash_pairs_sweep(t, id_col="doc_id", max_hamming=3,
                               max_bucket=n + 1)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    d = out.to_pydict()
    assert (17, 4242, 0) in set(zip(d["a"], d["b"], d["hamming"]))
    # ~10 tile-sized uint64/int64 temporaries; 50M-pair triu would be >1e9
    assert peak < 30 * _PAIR_TILE * _PAIR_TILE * 8


def test_near_dup_clusters_union_find_oracle():
    """Chained pairs (0-1, 1-2), a separate pair (5-6), singletons
    elsewhere — keeper must be the transitive-closure min, which plain
    per-pair dropping gets wrong (2 relates to 0 only through 1)."""
    from dxa_pagerank_ray.stages.dedup import near_dup_clusters

    n = 8
    pairs = rd.from_arrow(pa.table({
        "a": pa.array([0, 1, 5], pa.int64()),
        "b": pa.array([1, 2, 6], pa.int64()),
    }))
    got = near_dup_clusters(pairs, n)
    # union-find reference
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in [(0, 1), (1, 2), (5, 6)]:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = np.array([find(v) for v in range(n)], dtype=np.int64)
    assert got["doc_id"].to_pylist() == list(range(n))
    np.testing.assert_array_equal(
        np.asarray(got["keeper"].to_pylist()), expected)


def test_near_dup_clusters_distributed_tier_matches_broadcast():
    """keeper_limit=0 forces the LabelCSR tier (labels written as
    partitioned parquet, keeper returned as a Dataset — nothing dense
    on the driver); rows must equal the broadcast tier's exactly
    (round-4 verdict: the scale path must be a wired dispatch, not a
    docstring)."""
    from dxa_pagerank_ray.stages.dedup import near_dup_clusters

    n = 8
    pairs = rd.from_arrow(pa.table({
        "a": pa.array([0, 1, 5], pa.int64()),
        "b": pa.array([1, 2, 6], pa.int64()),
    })).repartition(2)
    small = near_dup_clusters(pairs, n)
    assert isinstance(small, pa.Table)
    big = near_dup_clusters(pairs, n, keeper_limit=0, num_partitions=4)
    assert isinstance(big, rd.Dataset)
    got = big.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == small["doc_id"].to_pylist()
    assert got["keeper"].tolist() == small["keeper"].to_pylist()


def test_near_dup_clusters_end_to_end_planted():
    """Full pipeline over the planted corpus: each original clusters
    with its near-dup (keeper = original's id); filler docs stay
    singletons."""
    from dxa_pagerank_ray.stages.dedup import (
        near_dup_clusters,
        verify_pairs_by_signature,
    )

    docs = _docs_with_dups()
    ds = rd.from_arrow(docs).repartition(3)
    sigs = minhash_signatures(ds, num_perm=64).materialize()
    pairs = lsh_candidate_pairs(sigs, num_perm=64, bands=16)
    verified = verify_pairs_by_signature(pairs, sigs, threshold=0.7)
    got = near_dup_clusters(verified, docs.num_rows)
    keeper = dict(zip(got["doc_id"].to_pylist(), got["keeper"].to_pylist()))
    for i in range(3):
        assert keeper[3 * i] == 3 * i
        assert keeper[3 * i + 1] == 3 * i      # near-dup joins original
        assert keeper[3 * i + 2] == 3 * i + 2  # filler stays singleton


def test_near_dup_keeper_driver_sweep_equals_superstep(ray_session):
    """The driver min-label fast path and the CC-superstep path must
    produce the identical keeper table (chains exercise transitivity;
    pointer jumping must not skip the global min)."""
    import pyarrow as pa
    import ray.data as rd

    from dxa_pagerank_ray.stages.dedup import near_dup_clusters

    pairs = pa.table({
        "a": pa.array([9, 8, 7, 2, 0, 12], pa.int64()),
        "b": pa.array([8, 7, 6, 3, 1, 13], pa.int64()),
    })
    ds = rd.from_arrow(pairs).repartition(3)
    fast = near_dup_clusters(ds, 16)
    slow = near_dup_clusters(ds, 16, pair_driver_limit=0)
    assert fast.equals(slow)
    k = fast["keeper"].to_pylist()
    assert k[9] == k[8] == k[7] == k[6] == 6      # chain collapses to min
    assert k[0] == k[1] == 0 and k[2] == k[3] == 2
    assert k[4] == 4 and k[5] == 5                # isolated keep selves


def test_minhash_signatures_concurrency_invariant(ray_session):
    """Signatures are row-pure: the actor-pool size (and therefore the
    cluster-sized default introduced in r5m) is scheduling-only — the
    output rows are bit-identical at ANY concurrency and block layout.
    This is the value-invariance contract behind the gate's accepted
    outside-window entry (tests/test_gate_rotation.py)."""
    docs = _docs_with_dups()

    def rows(concurrency, blocks):
        ds = rd.from_arrow(docs).repartition(blocks)
        sig = minhash_signatures(ds, num_perm=64, concurrency=concurrency)
        out = [(r["doc_id"], tuple(r["sig"])) for r in sig.take_all()]
        return sorted(out)

    ref = rows(1, 1)
    assert rows(2, 3) == ref
    assert rows(8, 9) == ref
    assert rows(None, 4) == ref  # cluster-sized default path


def test_verify_pairs_demand_routing_matches_reference(ray_session):
    """Randomized check of the r5m demand-routed verify against a
    driver-side per-pair reference: arbitrary signature tables and
    arbitrary candidate pair sets (including pairs whose agreement
    straddles the threshold, multi-partner docs, and cross-partition
    endpoints) must produce exactly the reference's kept set and
    estimates, at several num_groups."""
    rng = np.random.default_rng(7)
    n_docs, num_perm = 120, 16
    sigs_np = rng.integers(0, 5, size=(n_docs, num_perm))  # small
    # domain -> plenty of partial agreement around any threshold
    ids = np.arange(n_docs, dtype=np.int64)
    sig_tbl = pa.table({
        "doc_id": pa.array(ids),
        "sig": pa.array([row.tolist() for row in sigs_np],
                        pa.list_(pa.int64())),
    })
    m = 400
    a = rng.integers(0, n_docs - 1, m)
    b = a + 1 + rng.integers(0, n_docs - 1 - a, m)  # a < b
    pairs_tbl = pa.table({"a": pa.array(a, pa.int64()),
                          "b": pa.array(b, pa.int64())})
    thr = 0.5
    agree = (sigs_np[a] == sigs_np[b]).mean(axis=1)
    keep = agree >= thr
    expected = sorted(zip(a[keep].tolist(), b[keep].tolist(),
                          agree[keep].tolist()))

    for G in (1, 3, 16):
        got = verify_pairs_by_signature(
            rd.from_arrow(pairs_tbl).repartition(5),
            rd.from_arrow(sig_tbl).repartition(4),
            threshold=thr, num_perm=num_perm, num_groups=G,
        ).take_all()
        got_t = sorted((r["a"], r["b"], r["est_jaccard"]) for r in got)
        assert got_t == expected, f"num_groups={G}"
