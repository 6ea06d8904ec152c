"""Deduplication operators for training-data pipelines (graft-added).

- exact: content-hash partition + per-group min-id keeper.
- MinHash + LSH: shingle -> minhash signature -> banded bucket groupby
  -> candidate pairs -> distributed signature-similarity verify.
- SimHash: 64-bit signature, banded buckets, Hamming verify.
- n-gram Jaccard: exact verification of LSH candidates (distributed).
- embedding cosine near-dup: exact block-pair matmul (object-store
  blocks, no full-matrix broadcast) + LSH-bucketed approximate variant.

Scale shape: every family is (vectorized per-batch signature) ->
(groupby on a bucket key) -> (verify within small groups) — the
all-to-all is always on compact keys/signatures, never on raw text,
and candidate VERIFICATION is itself a distributed co-grouped join
(nothing is concatenated on the driver).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_FNV_PRIME = np.uint64(0x100000001B3)


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
    pows = _FNV_PRIME ** np.arange(kk, dtype=np.uint64)
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
        # plain (non-fixed-size) list type: fixed_size_list schemas are
        # unhashable for Ray's schema dedup and spam warnings per batch
        flat = pa.array(sigs.astype(np.int64).reshape(-1), pa.int64())
        offs = pa.array(
            np.arange(len(texts) + 1, dtype=np.int32) * self.num_perm
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "sig": pa.ListArray.from_arrays(offs, flat),
            }
        )


def _minhash_batch(batch: pa.Table, *, num_perm: int, k: int, seed: int,
                   text_col: str, id_col: str) -> pa.Table:
    """Task-pool body: one ``_MinHasher`` per task invocation — the
    coefficient setup is two rng draws of ``num_perm`` ints
    (microseconds), so there is no per-actor state worth pinning."""
    return _MinHasher(num_perm=num_perm, k=k, seed=seed,
                      text_col=text_col, id_col=id_col)(batch)


def minhash_signatures(docs_ds, num_perm: int = 64, k: int = 5, seed: int = 1,
                       text_col: str = "text", id_col: str = "doc_id",
                       concurrency: int | None = None):
    """Per-doc MinHash signatures as a plain TASK pool.

    The stage is embarrassingly parallel, row-pure, and its setup cost
    is microseconds, so tasks — which scale with input blocks and need
    no ramp-up — are the right Ray Data shape.  The previous
    autoscaling 4-actor pool flatlined a 100k-doc corpus at ~5 s
    whether the cluster had 8 or 32 CPUs (BASELINE.md round-5m):
    capped at 4, and below that bound by actor ramp-up from min=1 —
    both invisible at the 5k-doc gate scale.  ``concurrency`` caps
    concurrent tasks; ``None`` (default) lets the scheduler use every
    free CPU.  Scheduling-only knob: output rows are bit-identical at
    any setting (pinned by
    ``tests/test_dedup.py::test_minhash_signatures_concurrency_invariant``).
    """
    import functools

    fn = functools.partial(_minhash_batch, num_perm=num_perm, k=k,
                           seed=seed, text_col=text_col, id_col=id_col)
    kw = {} if concurrency is None else {"concurrency": concurrency}
    return docs_ds.map_batches(fn, batch_format="pyarrow",
                               batch_size=512, **kw)


from ..context import derive_num_groups  # noqa: E402  (shared helper)

import logging  # noqa: E402

_log = logging.getLogger(__name__)

# Per-bucket member cap for LSH pair enumeration.  A boilerplate band
# shared by m documents implies m(m-1)/2 candidate pairs; one degenerate
# hub bucket (every production near-dup corpus has some) would otherwise
# OOM a worker AND flood verification with garbage pairs.  Buckets above
# the cap are SKIPPED and logged — at 4096 members a kept bucket tops
# out at ~8.4M pairs (~134 MB of int64 pair ids), a safe per-task bound.
# Skipping only loses recall on content so boilerplate it collides with
# everything — the standard production trade (a doc in a hub bucket
# still pairs through its other, more selective bands).
_DEFAULT_MAX_BUCKET = 4096

# Pair-enumeration tile edge: transient memory per step is bounded by
# ~tile^2 pairs (x a few int64 arrays ~= 135 MB at 2048) regardless of
# bucket size — no O(m^2) triu_indices allocation ever happens.
_PAIR_TILE = 2048


def _tile_pairs(s: int, e: int, tile: int = _PAIR_TILE):
    """Yield (ii, jj) absolute-index arrays covering the strict upper
    triangle of ``range(s, e)`` in tiles of at most ``tile**2`` pairs —
    the bounded-memory replacement for ``np.triu_indices(e - s)``."""
    for i0 in range(s, e, tile):
        i1 = min(i0 + tile, e)
        for j0 in range(i0, e, tile):
            j1 = min(j0 + tile, e)
            ii, jj = np.meshgrid(np.arange(i0, i1), np.arange(j0, j1),
                                 indexing="ij")
            if i0 == j0:
                keep = ii < jj
                ii, jj = ii[keep], jj[keep]
            else:
                ii, jj = ii.ravel(), jj.ravel()
            if len(ii):
                yield ii, jj


def _log_skipped(where: str, n_buckets: int, n_members: int,
                 max_bucket: int) -> None:
    if n_buckets:
        _log.warning(
            "%s: skipped %d hub bucket(s) totalling %d members "
            "(> max_bucket=%d); recall on boilerplate-heavy content is "
            "reduced — raise max_bucket or use more selective bands",
            where, n_buckets, n_members, max_bucket,
        )


def _bucket_boundaries(t: pa.Table, id_col: str):
    """Lexsort a (band, bucket, id, ...) partition and return the
    per-bucket (starts, ends) plus the sorted column arrays."""
    band = t["band"].to_numpy(zero_copy_only=False)
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, bucket, band))
    band, bucket, ids = band[order], bucket[order], ids[order]
    starts = np.flatnonzero(
        np.r_[True, (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])]
    )
    ends = np.r_[starts[1:], len(band)]
    return starts, ends, band, bucket, ids, order


def _minhash_pairs_sweep(t: pa.Table, id_col: str,
                         max_bucket: int = _DEFAULT_MAX_BUCKET) -> pa.Table:
    """One coarse partition of (band, bucket, id) rows -> candidate
    pairs (a < b).  Pure function (module-level so tests can assert its
    memory bound directly); hub buckets above ``max_bucket`` are
    skipped + logged, kept buckets enumerate in ``_tile_pairs`` tiles."""
    starts, ends, _, _, ids, _ = _bucket_boundaries(t, id_col)
    a_out, b_out = [], []
    skipped_b = skipped_m = 0
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m > max_bucket:
            skipped_b += 1
            skipped_m += m
            continue
        for ii, jj in _tile_pairs(s, e):
            a_out.append(ids[ii])  # ids sorted per bucket -> a < b
            b_out.append(ids[jj])
    _log_skipped("lsh_candidate_pairs", skipped_b, skipped_m, max_bucket)
    if not a_out:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    return pa.table({"a": pa.array(np.concatenate(a_out), pa.int64()),
                     "b": pa.array(np.concatenate(b_out), pa.int64())})


def _pairs_within_buckets(banded_ds, id_col: str, num_groups: int = 64,
                          max_bucket: int = _DEFAULT_MAX_BUCKET):
    """(band, bucket, id) rows -> unique candidate pairs (a < b).

    The shuffle groups on a COARSE key (``bucket % num_groups``, sized
    by ``derive_num_groups``), not on each of the millions of tiny
    buckets: ``map_groups`` pays per-group overhead, so pair enumeration
    runs once per coarse partition with a vectorized (lexsort +
    boundaries) sweep over all its buckets.  Hub buckets are bounded:
    enumeration runs in fixed-size tiles (``_tile_pairs``) and buckets
    with more than ``max_bucket`` members are skipped + logged (see
    ``_DEFAULT_MAX_BUCKET`` for the rationale).
    """
    import functools

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["bucket"].to_numpy(zero_copy_only=False) % num_groups
        return batch.append_column("part", pa.array(part, pa.int64()))

    pairs = (
        banded_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            functools.partial(_minhash_pairs_sweep, id_col=id_col,
                              max_bucket=max_bucket),
            batch_format="pyarrow",
        )
    )
    from ..pipelines.testdata_graph import dedup_edges_like

    return dedup_edges_like(pairs, ["a", "b"])


def lsh_candidate_pairs(sigs_ds, num_perm: int = 64, bands: int = 16,
                        id_col: str = "doc_id",
                        num_groups: int | None = None,
                        max_bucket: int = _DEFAULT_MAX_BUCKET):
    """signatures -> (band_id, band_hash, doc_id) -> bucket groupby ->
    unique candidate pairs (a < b).  Buckets with more than
    ``max_bucket`` members are skipped + logged (hub-bucket bound)."""
    rows_per_band = num_perm // bands
    pows = _FNV_PRIME ** np.arange(rows_per_band, dtype=np.uint64)
    if num_groups is None:
        num_groups = derive_num_groups(sigs_ds)

    def bandize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = _list_matrix(batch["sig"], num_perm)
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
    return _pairs_within_buckets(banded, id_col, num_groups, max_bucket)


# ---- distributed candidate verification -------------------------------------


def _list_matrix(col, width: int) -> np.ndarray:
    """Fixed-width ``list<int64>`` column -> (n, width) int64 matrix
    (flatten + reshape, no per-row Python)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    if len(arr) == 0:
        return np.zeros((0, width), dtype=np.int64)
    return flat.reshape(len(arr), width)


def cogroup_attach(left_ds, key_col: str, lookup_ds, id_col: str,
                   val_col: str, out_col: str, left_schema: pa.Schema,
                   val_type: pa.DataType, num_groups: int = 64,
                   on_missing: str = "raise"):
    """Distributed equi-join that attaches ``lookup_ds[val_col]`` (keyed
    by a non-negative int64 ``id_col``, unique) to every left row whose
    ``key_col`` matches — the pattern behind distributed candidate-pair
    verification (and any small-side-too-big-to-broadcast lookup).

    Shape: both sides are tagged with a COARSE partition key
    (``key % num_groups``), unioned, and co-grouped ONCE; inside each
    partition a single vectorized sort + searchsorted resolves all left
    rows.  The (possibly list-typed) payload moves cluster-to-cluster
    through the shuffle — nothing lands on the driver.
    ``on_missing``: ``"raise"`` (default — callers guarantee coverage)
    or ``"drop"`` (inner-join semantics: left rows without a lookup
    match are filtered out, the distributed mirror of a broadcast
    semi-join + attach).
    """
    if on_missing not in ("raise", "drop"):
        raise ValueError(f"cogroup_attach: bad on_missing={on_missing!r}")
    import pyarrow.compute as pc

    left_cols = [f.name for f in left_schema]

    def tag_left(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        cols = {"part": pa.array(keys % num_groups, pa.int64()),
                "__key": pa.array(keys, pa.int64()),
                "__val": pa.nulls(b.num_rows, val_type)}
        for c in left_cols:
            cols[c] = b[c]
        return pa.table(cols)

    def tag_lookup(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        cols = {"part": pa.array(ids % num_groups, pa.int64()),
                "__key": pa.array(ids, pa.int64()),
                "__val": b[val_col]}
        for f in left_schema:
            cols[f.name] = pa.nulls(b.num_rows, f.type)
        return pa.table(cols)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        lookup_ds.map_batches(tag_lookup, batch_format="pyarrow")
    )

    def resolve(t: pa.Table) -> pa.Table:
        have = pc.is_valid(t["__val"])
        lookup = t.filter(have).sort_by("__key")
        left = t.filter(pc.invert(have))
        keys = lookup["__key"].to_numpy(zero_copy_only=False)
        probe = left["__key"].to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(keys, probe), 0,
                      max(len(keys) - 1, 0))
        hit = (keys[idx] == probe if len(keys)
               else np.zeros(len(probe), dtype=bool))
        if not hit.all():
            if on_missing == "raise":
                raise ValueError(
                    f"cogroup_attach({out_col}): left key missing from lookup"
                )
            left = left.filter(pa.array(hit))
            idx = idx[hit]
        vals = lookup["__val"].combine_chunks().take(
            pa.array(idx[: left.num_rows], pa.int64())
        )
        return left.select(left_cols).append_column(out_col, vals)

    return both.groupby("part").map_groups(resolve, batch_format="pyarrow")


_PAIRS_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def verify_pairs_by_signature(pairs_ds, sigs_ds, threshold: float = 0.7,
                              id_col: str = "doc_id", num_perm: int = 64,
                              num_groups: int | None = None):
    """Estimate Jaccard as signature agreement; keep pairs >= threshold.

    Fully distributed and DEMAND-ROUTED (round-5m): pairs are
    partitioned by the coarse key ``a % G`` and each doc's signature
    is shipped once per (doc, partition) that references it — NOT
    attached to every pair row.  The previous two-``cogroup_attach``
    shape re-shuffled ``sig_a`` (8 × num_perm bytes) on every pair
    through the second exchange: at the 100k-doc profile's 2.17M
    candidate pairs that is ~1.1 GB moved where the demand set needs
    ~0.1 GB (BASELINE.md round-5m).  Same routing mechanics as
    ``jaccard_verified_pairs``'s shingle shipping; the signature table
    never leaves the cluster (at 100 TB it alone dwarfs driver RAM).
    Returns a Dataset ``(a, b, est_jaccard)``.
    """
    import ray.data as rd

    from .agg import coarse_distinct

    if num_groups is None:
        num_groups = derive_num_groups(sigs_ds)
    G = num_groups
    sig_t = pa.list_(pa.int64())
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "est_jaccard": pa.array([], pa.float64())})
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() == 0:
        return rd.from_arrow(empty)

    def need_rows(b: pa.Table) -> pa.Table:
        av = b["a"].to_numpy(zero_copy_only=False)
        bv = b["b"].to_numpy(zero_copy_only=False)
        part = av % G
        # routing column named vpart: coarse_distinct adds its own
        # internal "part" key and the names must not collide
        return pa.table({
            id_col: pa.array(np.concatenate([av, bv]), pa.int64()),
            "vpart": pa.array(np.concatenate([part, part]), pa.int64()),
        })

    needs = coarse_distinct(
        pairs_ds.map_batches(need_rows, batch_format="pyarrow"),
        [id_col, "vpart"], num_groups=G,
    )
    needs_schema = pa.schema([(id_col, pa.int64()), ("vpart", pa.int64())])
    sig_routed = cogroup_attach(needs, id_col, sigs_ds, id_col, "sig",
                                "sig", needs_schema, sig_t, G)

    def tag_pairs(b: pa.Table) -> pa.Table:
        av = b["a"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vpart": pa.array(av % G, pa.int64()),
            "kind": pa.array(np.zeros(b.num_rows, np.int64)),
            "a": b["a"], "b": b["b"],
            id_col: pa.nulls(b.num_rows, pa.int64()),
            "sig": pa.nulls(b.num_rows, sig_t),
        })

    def tag_sigs(b: pa.Table) -> pa.Table:
        return pa.table({
            "vpart": b["vpart"],
            "kind": pa.array(np.ones(b.num_rows, np.int64)),
            "a": pa.nulls(b.num_rows, pa.int64()),
            "b": pa.nulls(b.num_rows, pa.int64()),
            id_col: b[id_col], "sig": b["sig"],
        })

    both = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow").union(
        sig_routed.map_batches(tag_sigs, batch_format="pyarrow")
    )

    def verify_group(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kmask = pc.equal(t["kind"], 1)
        sg = t.filter(kmask)
        prs = t.filter(pc.invert(kmask))
        if prs.num_rows == 0:
            return empty
        ids = sg[id_col].to_numpy(zero_copy_only=False)
        M = _list_matrix(sg["sig"], num_perm)
        order = np.argsort(ids, kind="stable")
        sid, M = ids[order], M[order]
        av = prs["a"].to_numpy(zero_copy_only=False)
        bv = prs["b"].to_numpy(zero_copy_only=False)
        ia = np.clip(np.searchsorted(sid, av), 0, max(len(sid) - 1, 0))
        ib = np.clip(np.searchsorted(sid, bv), 0, max(len(sid) - 1, 0))
        if len(sid) == 0 or not np.array_equal(sid[ia], av) \
                or not np.array_equal(sid[ib], bv):
            raise ValueError(
                "verify_pairs_by_signature: endpoint signature missing "
                "from its demand partition"
            )
        n = len(av)
        sim = np.empty(n, dtype=np.float64)
        step = 1 << 16  # bound transient (chunk, num_perm) compares
        for s in range(0, n, step):
            e = min(s + step, n)
            sim[s:e] = (M[ia[s:e]] == M[ib[s:e]]).mean(axis=1)
        keep = sim >= threshold
        return pa.table(
            {
                "a": prs["a"].filter(pa.array(keep)),
                "b": prs["b"].filter(pa.array(keep)),
                "est_jaccard": pa.array(sim[keep], pa.float64()),
            }
        )

    return both.groupby("vpart").map_groups(verify_group,
                                            batch_format="pyarrow")


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
                           id_col: str = "doc_id",
                           num_groups: int | None = None):
    """n-gram Jaccard near-dup pairs: MinHash-LSH candidate generation
    followed by **exact** k-shingle Jaccard verification of each
    candidate — the full-precision variant of the signature-estimate
    path.  Returns a Dataset ``(a, b, jaccard)``.

    Verification is distributed end to end: only the candidate id set
    (small by construction — LSH has already pruned the N^2 space) is
    broadcast so each batch re-shingles its candidate docs; pairs are
    partitioned by ``a % G`` and each candidate doc's shingle set is
    routed to exactly the partitions whose pairs reference it (the
    distinct (doc, partition) demand set) — once per partition, never
    once per pair — then intersected per partition (sorted-array
    intersect, C per pair).  No shingle set ever lands on the driver.
    """
    import ray
    import ray.data as rd

    sigs = minhash_signatures(docs_ds, num_perm=num_perm, k=k,
                              text_col=text_col, id_col=id_col).materialize()
    if num_groups is None:
        num_groups = derive_num_groups(sigs)
    pairs = lsh_candidate_pairs(sigs, num_perm=num_perm, bands=bands,
                                id_col=id_col,
                                num_groups=num_groups).materialize()
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if pairs.count() == 0:
        return rd.from_arrow(empty)
    # candidate id set: compact int64s, bounded by the LSH collision
    # count — the one artifact small enough to broadcast
    ab = pa.concat_tables(
        list(pairs.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )
    cand_ids = np.unique(np.concatenate(
        [ab["a"].to_numpy(zero_copy_only=False),
         ab["b"].to_numpy(zero_copy_only=False)]
    ))
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

    sh_ds = docs_ds.map_batches(shingles_of_candidates,
                                batch_format="pyarrow")
    sh_t = pa.list_(pa.int64())

    # Pair verification is partitioned by the PAIR's coarse key
    # (a % G); a doc's shingle set is shipped once per (doc, partition)
    # that references it — NOT once per pair (the old two-join shape
    # re-shuffled sh_a attached to every pair row, so a doc in j
    # candidate pairs moved its shingles j times).  `needs` is the
    # distinct (doc, partition) demand set, distributed end to end.
    from .agg import coarse_distinct

    G = num_groups

    def need_rows(b: pa.Table) -> pa.Table:
        av = b["a"].to_numpy(zero_copy_only=False)
        bv = b["b"].to_numpy(zero_copy_only=False)
        part = av % G
        # routing column is named vpart: coarse_distinct adds its own
        # internal "part" key and the names must not collide
        return pa.table({
            id_col: pa.array(np.concatenate([av, bv]), pa.int64()),
            "vpart": pa.array(np.concatenate([part, part]), pa.int64()),
        })

    needs = coarse_distinct(
        pairs.map_batches(need_rows, batch_format="pyarrow"),
        [id_col, "vpart"], num_groups=G,
    )
    needs_schema = pa.schema([(id_col, pa.int64()), ("vpart", pa.int64())])
    sh_routed = cogroup_attach(needs, id_col, sh_ds, id_col, "shingles",
                               "shingles", needs_schema, sh_t, G)

    def tag_pairs(b: pa.Table) -> pa.Table:
        av = b["a"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vpart": pa.array(av % G, pa.int64()),
            "kind": pa.array(np.zeros(b.num_rows, np.int64)),
            "a": b["a"], "b": b["b"],
            id_col: pa.nulls(b.num_rows, pa.int64()),
            "shingles": pa.nulls(b.num_rows, sh_t),
        })

    def tag_shingles(b: pa.Table) -> pa.Table:
        return pa.table({
            "vpart": b["vpart"],
            "kind": pa.array(np.ones(b.num_rows, np.int64)),
            "a": pa.nulls(b.num_rows, pa.int64()),
            "b": pa.nulls(b.num_rows, pa.int64()),
            id_col: b[id_col], "shingles": b["shingles"],
        })

    both = pairs.map_batches(tag_pairs, batch_format="pyarrow").union(
        sh_routed.map_batches(tag_shingles, batch_format="pyarrow")
    )
    empty_ref = empty

    def verify_group(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kmask = pc.equal(t["kind"], 1)
        sh = t.filter(kmask)
        prs = t.filter(pc.invert(kmask))
        if prs.num_rows == 0:
            return empty_ref
        ids = sh[id_col].to_numpy(zero_copy_only=False)
        lst = sh["shingles"].combine_chunks()
        # flatten() respects slice offsets (raw .values would not)
        flat = lst.flatten().to_numpy(zero_copy_only=False)
        off = np.r_[0, np.cumsum(
            pc.list_value_length(lst).to_numpy(zero_copy_only=False))]
        order = np.argsort(ids, kind="stable")
        sid = ids[order]
        av = prs["a"].to_numpy(zero_copy_only=False)
        bv = prs["b"].to_numpy(zero_copy_only=False)
        ia = np.clip(np.searchsorted(sid, av), 0, max(len(sid) - 1, 0))
        ib = np.clip(np.searchsorted(sid, bv), 0, max(len(sid) - 1, 0))
        if len(av) and (len(sid) == 0
                        or not np.array_equal(sid[ia], av)
                        or not np.array_equal(sid[ib], bv)):
            raise ValueError(
                "jaccard_verified_pairs: candidate doc missing from "
                "shingle partition"
            )
        ra, rb = order[ia], order[ib]
        n = len(av)
        # shingle lists are SORTED UNIQUE in UNSIGNED order (np.unique
        # on uint64 in _base_shingle_hashes) but stored as int64 — the
        # uint64 view restores the sort order searchsorted needs.
        # Pairs are processed GROUPED BY LEFT DOC (a doc averages many
        # partners in a near-dup corpus), so the Python-level loop runs
        # once per distinct left doc, not once per pair: one partner
        # concat + one binary search + one segment bincount per group.
        # The old per-pair intersect1d loop spent more time in loop
        # mechanics than in C at millions of candidates (~2.17M pairs:
        # 15 s of loop overhead at 32 CPUs, BASELINE.md round-5m).
        uflat = flat.view(np.uint64)
        porder = np.argsort(ra, kind="stable")
        ra_s, rb_s = ra[porder], rb[porder]
        la_s = off[ra_s + 1] - off[ra_s]
        lb_s = off[rb_s + 1] - off[rb_s]
        bounds = np.flatnonzero(np.r_[True, ra_s[1:] != ra_s[:-1]])
        seg_ends = np.r_[bounds[1:], n]
        inter = np.empty(n, dtype=np.int64)
        for s, e in zip(bounds, seg_ends):
            a0 = int(ra_s[s])
            sa = uflat[off[a0]:off[a0 + 1]]
            parts = [uflat[off[int(r)]:off[int(r) + 1]] for r in rb_s[s:e]]
            v = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
            seg = e - s
            if len(sa) == 0 or len(v) == 0:
                inter[s:e] = 0
                continue
            pos = np.minimum(np.searchsorted(sa, v), len(sa) - 1)
            hits = (sa[pos] == v)
            pair_of = np.repeat(np.arange(seg), lb_s[s:e])
            inter[s:e] = np.bincount(
                pair_of, weights=hits, minlength=seg
            ).astype(np.int64)
        union = la_s + lb_s - inter
        jac_s = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        jac = np.empty(n, dtype=np.float64)
        jac[porder] = jac_s
        keep = jac >= threshold
        return pa.table(
            {
                "a": prs["a"].filter(pa.array(keep)),
                "b": prs["b"].filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return (
        both.groupby("vpart")
        .map_groups(verify_group, batch_format="pyarrow")
    )


# ---- SimHash ---------------------------------------------------------------


def _word_hashes(text: str) -> np.ndarray:
    """64-bit hashes of the ASCII ``[0-9a-z_]+`` words of lowercased
    ``text`` — fully vectorized: byte classify -> segmented polynomial
    hash per word (``reduceat`` over contiguous word spans) ->
    splitmix64.  One hash per word occurrence (frequency-weighted, like
    the classic SimHash feature stream)."""
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8) \
        .astype(np.uint64)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    b = np.where((b >= 65) & (b <= 90), b + np.uint64(32), b)  # lower A-Z
    isw = (((b >= 97) & (b <= 122)) | ((b >= 48) & (b <= 57)) | (b == 95))
    if not isw.any():
        return np.zeros(0, dtype=np.uint64)
    starts = isw & ~np.r_[False, isw[:-1]]
    idx = np.arange(len(b))
    start_idx = np.maximum.accumulate(np.where(starts, idx, -1))
    posw = (idx - start_idx)[isw]  # char position within its word
    pows = np.multiply.accumulate(
        np.r_[np.uint64(1),
              np.full(int(posw.max()), _FNV_PRIME, dtype=np.uint64)]
    )  # P^0..P^max_pos, uint64 wraparound
    terms = b[isw] * pows[posw]
    bounds = np.flatnonzero(starts[isw])
    return _mix64(np.add.reduceat(terms, bounds))


def simhash64(text: str) -> int:
    """64-bit SimHash over ASCII word features (vectorized — no
    per-word Python loop; see ``_word_hashes``)."""
    hs = _word_hashes(text)
    if len(hs) == 0:
        return 0
    shifts = np.arange(64, dtype=np.uint64)
    bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)  # (W, 64)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << shifts).sum())


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) — constant-factor temporaries
    instead of the (n, 64)-byte blowup of ``np.unpackbits``."""
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * h01) >> np.uint64(56)).astype(np.int64)


def _simhash_pairs_sweep(t: pa.Table, id_col: str, max_hamming: int,
                         max_bucket: int = _DEFAULT_MAX_BUCKET) -> pa.Table:
    """One coarse partition of (band, bucket, id, sig) rows ->
    (a, b, hamming) pairs.  Pure function (module-level for direct
    memory-bound tests); Hamming verify via xor + bitcount per bounded
    tile, hub buckets above ``max_bucket`` skipped + logged."""
    starts, ends, _, _, ids, order = _bucket_boundaries(t, id_col)
    sigs = t["sig"].to_numpy(zero_copy_only=False).astype(np.int64) \
        .view(np.uint64)[order]
    a_out, b_out, h_out = [], [], []
    skipped_b = skipped_m = 0
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m > max_bucket:
            skipped_b += 1
            skipped_m += m
            continue
        for ii, jj in _tile_pairs(s, e):
            d = _popcount64(sigs[ii] ^ sigs[jj])
            keep = d <= max_hamming
            if not keep.any():
                continue
            a_out.append(ids[ii][keep])
            b_out.append(ids[jj][keep])
            h_out.append(d[keep].astype(np.int64))
    _log_skipped("simhash_near_dups", skipped_b, skipped_m, max_bucket)
    if not a_out:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    return pa.table({"a": pa.array(np.concatenate(a_out), pa.int64()),
                     "b": pa.array(np.concatenate(b_out), pa.int64()),
                     "hamming": pa.array(np.concatenate(h_out), pa.int64())})


def simhash_near_dups(docs_ds, max_hamming: int = 3, bands: int = 4,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_groups: int | None = None,
                      max_bucket: int = _DEFAULT_MAX_BUCKET):
    """(a, b, hamming) pairs with Hamming distance <= max_hamming.
    Banding: split the 64-bit signature into ``bands`` chunks; a pair
    within distance ``bands-1`` shares at least one exact chunk
    (pigeonhole), so bucket-group on (band, chunk) and verify.  Buckets
    above ``max_bucket`` members are skipped + logged; kept buckets
    enumerate in bounded tiles (``_tile_pairs``)."""
    from ..pipelines.testdata_graph import dedup_edges_like

    if num_groups is None:
        num_groups = derive_num_groups(docs_ds)
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
        part = batch["bucket"].to_numpy(zero_copy_only=False) % num_groups
        return batch.append_column("part", pa.array(part, pa.int64()))

    import functools

    banded = docs_ds.map_batches(sig_batch, batch_format="pyarrow")
    pairs = (
        banded.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            functools.partial(_simhash_pairs_sweep, id_col=id_col,
                              max_hamming=max_hamming,
                              max_bucket=max_bucket),
            batch_format="pyarrow",
        )
    )
    return dedup_edges_like(pairs, ["a", "b", "hamming"])


# ---- exact dedup -----------------------------------------------------------


def exact_dedup_keepers(docs_ds, text_col: str = "text",
                        id_col: str = "doc_id"):
    """-> (doc_id = min id per distinct content, n_copies).  Hash the
    content per batch (stable blake2b), then a coarse-partition combine
    on the 16-byte hash (stages/agg.py — one group per distinct doc
    would degenerate Ray's sort-aggregate at corpus scale) — raw text
    never shuffles."""
    from .agg import coarse_agg

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.blake2b((t or "").encode("utf-8"), digest_size=16).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table({id_col: batch[id_col],
                         "content_hash": pa.array(hs, pa.string())})

    hashed = docs_ds.map_batches(add_hash, batch_format="pyarrow")
    out = coarse_agg(hashed, ["content_hash"],
                     [(id_col, "min", id_col),
                      (id_col, "count", "n_copies")])
    return out.select_columns([id_col, "n_copies"])


# ---- embedding near-dup ----------------------------------------------------


_EMPTY_COSINE_PAIRS = pa.table({"a": pa.array([], pa.int64()),
                                "b": pa.array([], pa.int64()),
                                "cosine": pa.array([], pa.float64())})


def _score_blocks(x: pa.Table, y: pa.Table, same: bool, threshold: float,
                  id_col: str, vec_col: str) -> pa.Table:
    """One (block x block) exact cosine tile: emit (a, b, cosine) with
    a < b for every pair >= threshold."""
    from .ann import _normalize, _to_matrix

    ix = x[id_col].to_numpy(zero_copy_only=False)
    iy = y[id_col].to_numpy(zero_copy_only=False)
    mx = _normalize(_to_matrix(x[vec_col]))
    my = _normalize(_to_matrix(y[vec_col]))
    sims = mx @ my.T
    ii, jj = np.nonzero(sims >= threshold)
    if same:
        # mask by INDEX (upper triangle, no self-pairs) — zeroing cell
        # values would spuriously pass any threshold <= 0, which is a
        # valid cosine threshold
        keep = jj > ii
        ii, jj = ii[keep], jj[keep]
    if len(ii) == 0:
        return _EMPTY_COSINE_PAIRS
    a, b = ix[ii], iy[jj]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table({"a": pa.array(lo, pa.int64()),
                     "b": pa.array(hi, pa.int64()),
                     "cosine": pa.array(sims[ii, jj], pa.float64())})


def embedding_near_dups(emb_ds, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        block_rows: int = 8192) -> pa.Table:
    """EXACT (a, b, cosine) pairs with cosine >= threshold, a < b.

    Distributed block-pair matmul: the dataset's materialized blocks
    stay in the object store (``iter_internal_ref_bundles`` — the
    driver touches only refs) and every unordered block pair (i <= j)
    is scored by one remote task as a dense tile.  No full-matrix
    broadcast: peak per-task memory is two blocks.  O(B^2) tasks is
    inherent to exact all-pairs similarity; for web-scale inputs use
    ``embedding_near_dups_lsh`` (bucketed, approximate).
    """
    import ray

    blocks = emb_ds.select_columns([id_col, vec_col]) \
        .map_batches(lambda b: b, batch_format="pyarrow",
                     batch_size=block_rows).materialize()
    refs = [r for bundle in blocks.iter_internal_ref_bundles()
            for r in bundle.block_refs]
    if not refs:
        return _EMPTY_COSINE_PAIRS

    score = ray.remote(_score_blocks)
    out = ray.get(
        [
            score.remote(refs[i], refs[j], i == j, threshold, id_col, vec_col)
            for i in range(len(refs))
            for j in range(i, len(refs))
        ]
    )
    out = [t for t in out if t.num_rows]
    return pa.concat_tables(out) if out else _EMPTY_COSINE_PAIRS


def embedding_near_dups_lsh(emb_ds, threshold: float = 0.95,
                            n_planes: int = 8, n_tables: int = 6,
                            seed: int = 7, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            num_groups: int | None = None,
                            max_bucket: int = _DEFAULT_MAX_BUCKET):
    """APPROXIMATE near-dup pairs — the 100-TB path: random-hyperplane
    bucket keys -> coarse groupby -> within-bucket exact matmul.  A pair
    with cosine s collides in one table with prob (1 - arccos(s)/pi)^n_planes
    (~0.43 at s=0.95, n_planes=8), so n_tables=6 gives ~97% recall;
    candidates are verified exactly, so precision is 1.  The vector
    column is replicated n_tables times through ONE shuffle — never
    broadcast.  Returns a Dataset (a, b, cosine), dedup'd across tables.
    """
    import ray

    from .ann import _normalize, _to_matrix

    if num_groups is None:
        num_groups = derive_num_groups(emb_ds)
    rng = np.random.default_rng(seed)
    first = emb_ds.limit(1).take_all()
    if not first:
        import ray.data as rd

        return rd.from_arrow(_EMPTY_COSINE_PAIRS)
    planes = rng.standard_normal((n_tables, n_planes, len(first[0][vec_col])))
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(batch[vec_col]))
        pl = ray.get(planes_ref)
        outs = []
        for t in range(n_tables):
            sig = ((m @ pl[t].T > 0) @ (1 << np.arange(n_planes))).astype(
                np.int64
            )
            part = (sig * (t * 2 + 1) + t) % num_groups
            outs.append(pa.table(
                {
                    "part": pa.array(part, pa.int64()),
                    "tbl": pa.array(np.full(len(ids), t, dtype=np.int64)),
                    "bucket": pa.array(sig, pa.int64()),
                    id_col: pa.array(ids, pa.int64()),
                    vec_col: batch[vec_col],
                }
            ))
        return pa.concat_tables(outs)

    def pairs_fn(t: pa.Table) -> pa.Table:
        tbl = t["tbl"].to_numpy(zero_copy_only=False)
        bucket = t["bucket"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(t[vec_col]))
        order = np.lexsort((ids, bucket, tbl))
        tbl, bucket, ids, m = tbl[order], bucket[order], ids[order], m[order]
        starts = np.flatnonzero(
            np.r_[True, (tbl[1:] != tbl[:-1]) | (bucket[1:] != bucket[:-1])]
        )
        ends = np.r_[starts[1:], len(tbl)]
        outs = []
        skipped_b = skipped_m = 0
        for s, e in zip(starts, ends):
            mcnt = e - s
            if mcnt < 2:
                continue
            if mcnt > max_bucket:
                skipped_b += 1
                skipped_m += mcnt
                continue
            # bounded block-matmul tiles over the in-bucket upper
            # triangle: peak transient is one (tile x tile) sims matrix;
            # self/lower pairs masked by INDEX, never by zeroing values
            # (a threshold <= 0 is valid for cosine)
            for i0 in range(s, e, _PAIR_TILE):
                i1 = min(i0 + _PAIR_TILE, e)
                for j0 in range(i0, e, _PAIR_TILE):
                    j1 = min(j0 + _PAIR_TILE, e)
                    sims = m[i0:i1] @ m[j0:j1].T
                    ii, jj = np.nonzero(sims >= threshold)
                    if i0 == j0:
                        keep = jj > ii
                        ii, jj = ii[keep], jj[keep]
                    if len(ii) == 0:
                        continue
                    outs.append(pa.table(
                        {"a": pa.array(ids[i0:i1][ii], pa.int64()),
                         "b": pa.array(ids[j0:j1][jj], pa.int64()),
                         "cosine": pa.array(sims[ii, jj], pa.float64())}
                    ))
        _log_skipped("embedding_near_dups_lsh", skipped_b, skipped_m,
                     max_bucket)
        if not outs:
            return _EMPTY_COSINE_PAIRS
        return pa.concat_tables(outs)

    pairs = (
        emb_ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_fn, batch_format="pyarrow")
    )
    # a pair can collide in several tables -> exact dedup on (a, b)
    # (coarse-partition combine: pair cardinality scales with the data)
    from .agg import coarse_agg

    return coarse_agg(pairs, ["a", "b"], [("cosine", "min", "cosine")])


# ---- near-dup clustering (keeper per connected component) ------------------


# Driver fast-path cap for the near-dup keeper: pair sets at or under
# this row count (~64 MB of int64 pairs) label on the driver with a
# vectorized min-label sweep instead of the CC superstep engine.
_PAIR_DRIVER_LIMIT = 1 << 22


def _minlabel_components(edges_ds, num_docs: int) -> np.ndarray:
    """Min-label connected components of a SMALL pair set, driver-side:
    hash-min propagation + pointer jumping over numpy arrays — the
    same fixed point as the distributed CC superstep (minimum id per
    component; isolated ids keep themselves)."""
    parts = [b for b in edges_ds.iter_batches(batch_size=1 << 20,
                                              batch_format="pyarrow")
             if b.num_rows]
    lab = np.arange(num_docs, dtype=np.int64)
    if not parts:
        return lab
    t = pa.concat_tables(parts)
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    while True:
        m = np.minimum(lab[src], lab[dst])
        before = lab.copy()
        np.minimum.at(lab, src, m)
        np.minimum.at(lab, dst, m)
        lab = np.minimum(lab, lab[lab])  # pointer jump (path halving)
        if np.array_equal(lab, before):
            return lab


def near_dup_clusters(pairs_ds, num_docs: int,
                      a_col: str = "a", b_col: str = "b",
                      num_partitions: int | None = None,
                      keeper_limit: int | None = None,
                      labels_dir: str | None = None,
                      pair_driver_limit: int | None = None):
    """Near-dup PAIRS -> per-doc cluster keeper: ``(doc_id, keeper)``
    where ``keeper`` is the minimum doc id in the doc's connected
    component of the pair graph (docs in no pair keep themselves).

    This is the step production dedup actually ends with: pairwise
    near-dup relations are not transitive, so "drop every doc that
    appears as ``b``" over-deletes (a-b and b-c pairs would drop c even
    if a-c are unrelated) — the standard resolution (and the
    reference-free one) is to union pairs into clusters and keep one
    representative per cluster.

    Size dispatch on ``num_docs`` vs ``keeper_limit`` (default
    ``BROADCAST_VERTEX_LIMIT`` — the guard discipline of
    ``relational.BROADCAST_ROW_LIMIT`` / ``graph_stats``):

    - small tier -> in-memory ``pa.Table``, labels from the broadcast
      CC superstep (a dense int64 vector is fine below the limit);
    - above it -> the dense keeper array would be O(num_docs) on the
      driver (~8 TB at 1e12 docs), so the pinned ``LabelCSR`` shard
      pool runs hash-min CC with ``collect_state=False`` and each
      shard writes its owned partitions as Parquet
      (``labels_dir``, a fresh tmp dir by default); returns the
      ``(doc_id, keeper)`` **Dataset** read back from that partitioned
      output — nothing dense ever lands on the driver.  Downstream
      keep-steps join against it (``corpus.select_training_corpus``).

    Requires dense integer doc ids in ``[0, num_docs)`` — sparse or
    hashed id spaces go through ``stages.ids.assign_dense_ids`` first.
    """
    from ..context import BROADCAST_VERTEX_LIMIT
    from ..pipelines.superstep import undirect

    limit = BROADCAST_VERTEX_LIMIT if keeper_limit is None else keeper_limit

    def as_edges(b: pa.Table) -> pa.Table:
        return pa.table({"src": b[a_col], "dst": b[b_col]})

    edges = pairs_ds.select_columns([a_col, b_col]) \
        .map_batches(as_edges, batch_format="pyarrow")
    if num_docs <= limit:
        edges_m = edges.materialize()
        pair_limit = (_PAIR_DRIVER_LIMIT if pair_driver_limit is None
                      else pair_driver_limit)
        if edges_m.count() <= pair_limit:
            # near-dup pair sets are a tiny fraction of the corpus; at
            # or under the row cap (~64 MB of int64 pairs) a driver
            # min-label sweep beats spinning the CC superstep's
            # per-round Dataset executions (measured ~2 s of fixed
            # cost on 184 pairs).  Same fixed point: min doc id per
            # component, isolated docs keep themselves.
            labels = _minlabel_components(edges_m, num_docs)
        else:
            from ..pipelines.components import connected_components

            labels = connected_components(edges_m, num_docs).labels
        return pa.table({
            "doc_id": pa.array(np.arange(num_docs, dtype=np.int64),
                               pa.int64()),
            "keeper": pa.array(labels, pa.int64()),
        })

    import tempfile

    import ray.data as rd

    from ..pipelines.labels_csr import LabelCSR

    # lazy input into a pinned actor pool can deadlock at small CPU
    # counts (the pool holds every CPU; the upstream map needs one)
    eng = LabelCSR(undirect(edges).materialize(), num_docs,
                   num_partitions=num_partitions or 32)
    try:
        eng.connected_components(collect_state=False)
        out_dir = labels_dir or tempfile.mkdtemp(prefix="near_dup_keepers_")
        eng.write_labels(out_dir)
    finally:
        eng.shutdown()
    return rd.read_parquet(out_dir).map_batches(
        lambda b: pa.table({"doc_id": b["v"], "keeper": b["label"]}),
        batch_format="pyarrow",
    )
