"""Deterministic document sampling (graft-added training-data op).

Training pipelines need reproducible down-sampling and train/holdout
splitting that is independent of partitioning, execution order, and
cluster size — so no RNG state, no ``Dataset.random_sample``.  Both
ops here are pure functions of ``(id, seed)``: a splitmix64 hash of
the id keys a Bernoulli draw, exactly mirrorable in SQL (the oracle
emulates the same multiply/xor-shift chain in HUGEINT, the minhash-
oracle technique).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_INC = 0x9E3779B97F4A7C15


def sample_hash(ids: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 of ``id`` at stream position ``seed + 1`` — uniform
    uint64, vectorized, wraparound."""
    inc = np.uint64(((seed + 1) * _INC) % (1 << 64))
    z = ids.astype(np.uint64) + inc
    z = (z ^ (z >> np.uint64(30))) * _C1
    z = (z ^ (z >> np.uint64(27))) * _C2
    return z ^ (z >> np.uint64(31))


def hash_sample(ds, fraction: float, seed: int = 0, id_col: str = "doc_id"):
    """Keep each row iff ``sample_hash(id) < fraction * 2^64`` — a
    seeded Bernoulli sample with EXACTLY reproducible membership: the
    same (id, seed, fraction) keeps the same row on any cluster, any
    partitioning, any run.  Streaming filter; no shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = np.uint64(min(int(fraction * (1 << 64)), (1 << 64) - 1))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(sample_hash(ids, seed) < cut))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_split(ds, holdout_fraction: float, seed: int = 0,
               id_col: str = "doc_id", out_col: str = "split"):
    """Append ``out_col`` = 'holdout' | 'train' by the same
    deterministic draw — disjoint, exhaustive, reproducible."""
    if not 0.0 <= holdout_fraction <= 1.0:
        raise ValueError(
            f"holdout_fraction must be in [0, 1], got {holdout_fraction}")
    cut = np.uint64(min(int(holdout_fraction * (1 << 64)), (1 << 64) - 1))

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        hold = sample_hash(ids, seed) < cut
        return batch.append_column(
            out_col,
            pa.array(np.where(hold, "holdout", "train").tolist(),
                     pa.string()),
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def _group_headk(batch: pa.Table, group_col: str, id_col: str,
                 k: int, seed: int) -> pa.Table:
    """Keep the k hash-smallest (sample_hash(id), id) rows per group
    within ONE table — the pure per-batch/per-group cut shared by the
    partial and combine passes (idempotent: applying it twice gives
    the same rows, which is what makes the two-pass plan exact)."""
    if batch.num_rows == 0:
        return batch
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    hv = sample_hash(ids, seed)
    grp = batch[group_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, hv, grp))
    g = grp[order]
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    ends = np.r_[starts[1:], len(g)]
    kept = [order[s:min(s + k, e)] for s, e in zip(starts, ends)]
    idx = np.sort(np.concatenate(kept)) if kept else np.array([], np.int64)
    return batch.take(pa.array(idx))


def stratified_sample(ds, k: int, group_col: str = "source",
                      seed: int = 0, id_col: str = "doc_id"):
    """Keep the ``k`` hash-smallest ids PER GROUP — deterministic
    stratified down-sampling (domain/source balancing), a pure
    function of ``(id, group, seed)``: same rows on any cluster, any
    partitioning.  Plan: per-batch head-k cut (any global top-k member
    survives its own batch's cut), then a per-group combine applying
    the identical cut.  The combine uses the NATIVE groupby — group
    cardinality is source/domain-sized, not document-sized; a
    document-cardinality stratification key would need the coarse-key
    sweep pattern (stages/agg.py) instead."""
    import functools

    cut = functools.partial(_group_headk, group_col=group_col,
                            id_col=id_col, k=k, seed=seed)
    return (ds.map_batches(cut, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(cut, batch_format="pyarrow"))


def shard_assign(ds, num_shards: int, seed: int = 0,
                 id_col: str = "doc_id", out_col: str = "shard"):
    """Append ``out_col = sample_hash(id, seed) % num_shards`` — the
    DETERMINISTIC global shard key for training-corpus output.  A pure
    function of ``(id, seed, num_shards)``: the same document lands in
    the same shard on any cluster, any partitioning, any run — so a
    restarted writer can skip finished shards (resumable output), and
    the splitmix64 draw gives a uniform spread regardless of id
    clustering (sequential crawl ids stripe evenly).  Streaming map,
    no shuffle."""
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    S = np.uint64(num_shards)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        shard = (sample_hash(ids, seed) % S).astype(np.int64)
        return batch.append_column(out_col, pa.array(shard, pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow")


def write_corpus_shards(ds, out_dir: str, num_shards: int,
                        seed: int = 0, id_col: str = "doc_id") -> None:
    """Write a corpus as hive-partitioned Parquet keyed by the
    deterministic shard (``shard_assign``) — one ``shard=s/``
    directory per shard, the resumable training-corpus sink (the
    same idempotent-load protocol as
    ``pagerank_csr.write_edges_partitioned``: a failed run re-writes
    whole shard directories instead of appending).  A trainer reads
    one directory per data-parallel rank; ``num_shards`` should be a
    multiple of the rank count."""
    import json
    import os

    shard_assign(ds, num_shards, seed=seed,
                 id_col=id_col).write_parquet(
        out_dir, partition_cols=["shard"])
    with open(os.path.join(out_dir, "_shards_meta.json"), "w") as f:
        json.dump({"num_shards": num_shards, "seed": seed,
                   "id_col": id_col}, f)
