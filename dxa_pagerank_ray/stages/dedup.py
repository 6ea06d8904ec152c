"""Deduplication operators for training-data pipelines (graft-added).

- exact: content-hash partition + per-group min-id keeper.
- MinHash + LSH: shingle -> minhash signature -> banded bucket groupby
  -> candidate pairs -> signature-similarity verify.
- SimHash: 64-bit signature, banded buckets, Hamming verify.
- n-gram Jaccard: exact verification kernel (used on LSH candidates).
- embedding cosine near-dup: blocked matmul vs broadcast matrix.

Scale shape: every family is (vectorized per-batch signature) ->
(groupby on a bucket key) -> (verify within small groups) — the
all-to-all is always on the compact bucket keys, never on raw text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — avalanches the weak polynomial shingle
    hash into a uniform 64-bit value (vectorized, wraparound uint64)."""
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _base_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Unique 64-bit hashes of the k-byte (UTF-8) shingles of ``text``.

    Fully vectorized: sliding byte windows -> polynomial hash (uint64
    wraparound) -> splitmix64 mix.  No per-shingle Python calls — this
    is the hot kernel of the minhash stage."""
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    kk = min(k, len(b))
    win = np.lib.stride_tricks.sliding_window_view(b, kk).astype(np.uint64)
    pows = np.uint64(0x100000001B3) ** np.arange(kk, dtype=np.uint64)
    return np.unique(_mix64(win @ pows))


def minhash_signature(text: str, num_perm: int = 64, k: int = 5,
                      seed: int = 1) -> np.ndarray:
    """num_perm-wide minhash via the multiply-shift family
    ``h_i(x) = a_i*x + b_i (mod 2^64)``, odd ``a_i`` (vectorized native
    uint64 wraparound — the standard practical min-wise family)."""
    a, b = _perm_coeffs(num_perm, seed)
    return _signature(_base_shingle_hashes(text, k), a, b, num_perm)


def _perm_coeffs(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64) * np.uint64(2) \
        + np.uint64(1)  # odd multipliers
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


def _signature(base: np.ndarray, a: np.ndarray, b: np.ndarray,
               num_perm: int) -> np.ndarray:
    if len(base) == 0:
        return np.zeros(num_perm, dtype=np.uint64)
    vals = base[:, None] * a[None, :] + b[None, :]  # (S, P) wraparound
    return vals.min(axis=0)


class _MinHasher:
    """Actor-pool stage: permutation coefficients drawn once per actor."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 1,
                 text_col: str = "text", id_col: str = "doc_id") -> None:
        self.a, self.b = _perm_coeffs(num_perm, seed)
        self.num_perm, self.k = num_perm, k
        self.text_col, self.id_col = text_col, id_col

    def signature(self, text: str) -> np.ndarray:
        return _signature(_base_shingle_hashes(text, self.k),
                          self.a, self.b, self.num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if texts else (
            np.zeros((0, self.num_perm), dtype=np.uint64)
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "sig": pa.array(list(sigs.astype(np.int64)),
                                pa.list_(pa.int64(), self.num_perm)),
            }
        )


def minhash_signatures(docs_ds, num_perm: int = 64, k: int = 5, seed: int = 1,
                       text_col: str = "text", id_col: str = "doc_id",
                       concurrency: int = 4):
    return docs_ds.map_batches(
        _MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, k=k, seed=seed,
                                   text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=(1, concurrency), batch_size=512)


def _pairs_within_buckets(banded_ds, id_col: str, num_coarse: int = 64):
    """(band, bucket, id) rows -> unique candidate pairs (a < b).

    The shuffle groups on a COARSE key (``bucket % num_coarse``), not on
    each of the millions of tiny buckets: ``map_groups`` pays per-group
    overhead, so pair enumeration runs once per coarse partition with a
    vectorized (lexsort + boundaries) sweep over all its buckets.  Hub
    buckets (a boilerplate band shared by everyone) still cost O(m^2)
    pairs — inherent to LSH; callers bound it with more selective bands.
    """

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["bucket"].to_numpy(zero_copy_only=False) % num_coarse
        return batch.append_column("part", pa.array(part, pa.int64()))

    def pairs_fn(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False)
        bucket = t["bucket"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bucket, band))
        band, bucket, ids = band[order], bucket[order], ids[order]
        starts = np.flatnonzero(
            np.r_[True, (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])]
        )
        ends = np.r_[starts[1:], len(band)]
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            ii, jj = np.triu_indices(m, k=1)
            a_out.append(ids[s:e][ii])  # ids sorted per bucket -> a < b
            b_out.append(ids[s:e][jj])
        if not a_out:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(a_out), pa.int64()),
                         "b": pa.array(np.concatenate(b_out), pa.int64())})

    pairs = (
        banded_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_fn, batch_format="pyarrow")
    )
    from ..pipelines.testdata_graph import dedup_edges_like

    return dedup_edges_like(pairs, ["a", "b"])


def lsh_candidate_pairs(sigs_ds, num_perm: int = 64, bands: int = 16,
                        id_col: str = "doc_id"):
    """signatures -> (band_id, band_hash, doc_id) -> bucket groupby ->
    unique candidate pairs (a < b)."""
    rows_per_band = num_perm // bands
    pows = np.uint64(0x100000001B3) ** np.arange(rows_per_band,
                                                 dtype=np.uint64)

    def bandize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = np.stack(
            [np.asarray(s, dtype=np.int64) for s in batch["sig"].to_pylist()]
        ) if batch.num_rows else np.zeros((0, num_perm), dtype=np.int64)
        out_band, out_hash, out_id = [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            # vectorized polynomial hash + splitmix64 (stable across
            # worker processes, unlike Python hash())
            h = (_mix64(chunk.astype(np.uint64) @ pows)
                 & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)
            out_band.append(np.full(len(ids), b, dtype=np.int64))
            out_hash.append(h)
            out_id.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band), pa.int64()),
                "bucket": pa.array(np.concatenate(out_hash), pa.int64()),
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
            }
        )

    banded = sigs_ds.map_batches(bandize, batch_format="pyarrow")
    return _pairs_within_buckets(banded, id_col)


def verify_pairs_by_signature(pairs_tbl: pa.Table, sigs_tbl: pa.Table,
                              threshold: float = 0.7,
                              id_col: str = "doc_id") -> pa.Table:
    """Estimate Jaccard as signature agreement; keep pairs >= threshold.
    (Driver-side: candidate sets are small by construction.)"""
    ids = sigs_tbl[id_col].to_numpy(zero_copy_only=False)
    sigs = np.stack(
        [np.asarray(s, dtype=np.int64) for s in sigs_tbl["sig"].to_pylist()]
    ) if sigs_tbl.num_rows else np.zeros((0, 1), dtype=np.int64)
    index = {int(v): i for i, v in enumerate(ids)}
    a = pairs_tbl["a"].to_numpy(zero_copy_only=False)
    b = pairs_tbl["b"].to_numpy(zero_copy_only=False)
    keep_a, keep_b, est = [], [], []
    for x, y in zip(a, b):
        sa, sb = sigs[index[int(x)]], sigs[index[int(y)]]
        sim = float(np.mean(sa == sb))
        if sim >= threshold:
            keep_a.append(int(x))
            keep_b.append(int(y))
            est.append(sim)
    return pa.table({"a": pa.array(keep_a, pa.int64()),
                     "b": pa.array(keep_b, pa.int64()),
                     "est_jaccard": pa.array(est, pa.float64())})


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard (verification kernel)."""
    sa = set(_base_shingle_hashes(text_a, k).tolist())
    sb = set(_base_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def jaccard_verified_pairs(docs_ds, threshold: float = 0.8, k: int = 5,
                           num_perm: int = 64, bands: int = 16,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """n-gram Jaccard near-dup pairs: MinHash-LSH candidate generation
    (distributed) followed by **exact** k-shingle Jaccard verification
    of each candidate — the full precision variant of the signature-
    estimate path.

    Verification is a broadcast semi-join: the candidate id set (small
    by construction — LSH has already pruned the N^2 space) is shipped
    via ``ray.put`` and each batch re-shingles only its candidate docs;
    the per-pair intersection runs on the driver over the collected
    shingle sets (sorted-array intersect, no Python sets).
    """
    import ray

    sigs = minhash_signatures(docs_ds, num_perm=num_perm, k=k,
                              text_col=text_col, id_col=id_col).materialize()
    pair_batches = list(
        lsh_candidate_pairs(sigs, num_perm=num_perm, bands=bands,
                            id_col=id_col)
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    ) if sigs.count() else []
    pairs = pa.concat_tables(pair_batches) if pair_batches else pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )
    a = pairs["a"].to_numpy(zero_copy_only=False) if pairs.num_rows else \
        np.array([], dtype=np.int64)
    b = pairs["b"].to_numpy(zero_copy_only=False) if pairs.num_rows else \
        np.array([], dtype=np.int64)
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if len(a) == 0:
        return empty
    cand_ids = np.unique(np.concatenate([a, b]))
    cand_ref = ray.put(cand_ids)

    def shingles_of_candidates(batch: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(np.isin(ids, wanted))
        out_id, out_sh = [], []
        for i in keep:
            sh = _base_shingle_hashes(batch[text_col][int(i)].as_py(), k)
            out_id.append(int(ids[i]))
            out_sh.append(sh.astype(np.int64))
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "shingles": pa.array(out_sh,
                                              pa.list_(pa.int64()))})

    sh_tbl = pa.concat_tables(
        list(
            docs_ds.map_batches(shingles_of_candidates, batch_format="pyarrow")
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
    )
    by_id = {
        int(v): np.asarray(s, dtype=np.int64)
        for v, s in zip(sh_tbl[id_col].to_pylist(),
                        sh_tbl["shingles"].to_pylist())
    }
    keep_a, keep_b, jac = [], [], []
    for x, y in zip(a, b):
        sa, sb = by_id[int(x)], by_id[int(y)]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 1.0
        if j >= threshold:
            keep_a.append(int(x))
            keep_b.append(int(y))
            jac.append(j)
    return pa.table({"a": pa.array(keep_a, pa.int64()),
                     "b": pa.array(keep_b, pa.int64()),
                     "jaccard": pa.array(jac, pa.float64())})


# ---- SimHash ---------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (stable blake2b word hashes)."""
    import re

    words = re.findall(r"\w+", (text or "").lower())
    if not words:
        return 0
    hs = np.array(
        [
            int.from_bytes(
                hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "big"
            )
            for w in words
        ],
        dtype=np.uint64,  # explicit uint64: hashes >= 2^63 must not
    )                     # coerce to Python-object arrays
    shifts = np.arange(64, dtype=np.uint64)
    bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)  # (W, 64)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << shifts).sum())


def simhash_near_dups(docs_ds, max_hamming: int = 3, bands: int = 4,
                      text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(a, b, hamming) pairs with Hamming distance <= max_hamming.
    Banding: split the 64-bit signature into ``bands`` chunks; a pair
    within distance ``bands-1`` shares at least one exact chunk
    (pigeonhole), so bucket-group on (band, chunk) and verify."""
    from ..pipelines.testdata_graph import dedup_edges_like

    width = 64 // bands
    mask = (1 << width) - 1

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sigs = np.array([simhash64(t) for t in batch[text_col].to_pylist()],
                        dtype=np.uint64)
        out = {
            "band": [], "bucket": [], id_col: [], "sig": []
        }
        for b in range(bands):
            out["band"].append(np.full(len(ids), b, dtype=np.int64))
            out["bucket"].append(((sigs >> np.uint64(b * width)) &
                                  np.uint64(mask)).astype(np.int64))
            out[id_col].append(ids)
            out["sig"].append(sigs.astype(np.int64))
        return pa.table({k: pa.array(np.concatenate(v), pa.int64())
                         for k, v in out.items()})

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["bucket"].to_numpy(zero_copy_only=False) % 64
        return batch.append_column("part", pa.array(part, pa.int64()))

    def pairs_fn(t: pa.Table) -> pa.Table:
        """Vectorized in-bucket pair sweep (see _pairs_within_buckets);
        Hamming verify via xor + bitcount, all numpy."""
        band = t["band"].to_numpy(zero_copy_only=False)
        bucket = t["bucket"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sigs = t["sig"].to_numpy(zero_copy_only=False).astype(np.int64) \
            .view(np.uint64)
        order = np.lexsort((ids, bucket, band))
        band, bucket = band[order], bucket[order]
        ids, sigs = ids[order], sigs[order]
        starts = np.flatnonzero(
            np.r_[True, (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])]
        )
        ends = np.r_[starts[1:], len(band)]
        a_out, b_out, h_out = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            ii, jj = np.triu_indices(m, k=1)
            x = sigs[s:e][ii] ^ sigs[s:e][jj]
            d = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                              axis=1).sum(axis=1)
            keep = d <= max_hamming
            a_out.append(ids[s:e][ii][keep])
            b_out.append(ids[s:e][jj][keep])
            h_out.append(d[keep].astype(np.int64))
        if not a_out:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(a_out), pa.int64()),
                         "b": pa.array(np.concatenate(b_out), pa.int64()),
                         "hamming": pa.array(np.concatenate(h_out), pa.int64())})

    banded = docs_ds.map_batches(sig_batch, batch_format="pyarrow")
    pairs = (
        banded.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_fn, batch_format="pyarrow")
    )
    return dedup_edges_like(pairs, ["a", "b", "hamming"])


# ---- exact dedup -----------------------------------------------------------


def exact_dedup_keepers(docs_ds, text_col: str = "text",
                        id_col: str = "doc_id"):
    """-> (doc_id = min id per distinct content, n_copies).  Hash the
    content per batch (stable blake2b), then a compact groupby on the
    16-byte hash — raw text never shuffles."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.blake2b((t or "").encode("utf-8"), digest_size=16).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table({id_col: batch[id_col],
                         "content_hash": pa.array(hs, pa.string())})

    hashed = docs_ds.map_batches(add_hash, batch_format="pyarrow")
    return (
        hashed.groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col),
                   Count(alias_name="n_copies"))
        .select_columns([id_col, "n_copies"])
    )


# ---- embedding near-dup ----------------------------------------------------


def embedding_near_dups(emb_ds, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> pa.Table:
    """(a, b) pairs with cosine >= threshold — blocked matmul: each
    batch scores against the broadcast full matrix (fine to ~1e5
    vectors; beyond that, bucket with `ann.lsh_topk`'s planes first)."""
    import ray

    from .ann import _normalize, _to_matrix

    full = pa.concat_tables(
        list(emb_ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )
    all_ids = full[id_col].to_numpy(zero_copy_only=False)
    m = _normalize(_to_matrix(full[vec_col]))
    ref = ray.put((all_ids, m))

    def score(batch: pa.Table) -> pa.Table:
        ids_all, mat = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mb = _normalize(_to_matrix(batch[vec_col]))
        sims = mb @ mat.T
        rows_a, rows_b, rows_s = [], [], []
        for i in range(len(ids)):
            hit = np.flatnonzero((sims[i] >= threshold) & (ids_all > ids[i]))
            rows_a.extend([int(ids[i])] * len(hit))
            rows_b.extend(ids_all[hit].tolist())
            rows_s.extend(sims[i, hit].tolist())
        return pa.table({"a": pa.array(rows_a, pa.int64()),
                         "b": pa.array(rows_b, pa.int64()),
                         "cosine": pa.array(rows_s, pa.float64())})

    batches = list(
        emb_ds.map_batches(score, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    )
    if not batches:  # no near-duplicate pairs anywhere
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    return pa.concat_tables(batches)
