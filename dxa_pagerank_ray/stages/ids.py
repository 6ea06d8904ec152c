"""url -> vertex-id assignment (SURVEY.md §2.11).

The reference works on dense 1-based integer ids straight from its input
format (``/root/reference/README.md:50``); web graphs start from url
strings, so ingestion needs an id assignment:

1. ``hash_ids`` — stateless 64-bit content hash (blake2b/8B) per url.
   Deterministic across processes and runs, no shuffle, collision
   probability ~ N^2 / 2^65 (≈ 3e-6 at N = 1e7; at 1e12 vertices use the
   dense path).  Used by default for the streaming build.
2. ``assign_dense_ids`` — distributed sort-assign producing dense ids
   ``0..N-1``: sort the unique urls, then number rows with per-block
   offsets (block row-counts are reduced on the driver — P scalars, not
   data).  Dense ids enable array-indexed vertex state (the CSR engine)
   and mirror the reference's dense id space.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def hash64(values: pa.Array | list[str]) -> np.ndarray:
    """Stable 64-bit hash per string (blake2b digest, big-endian int64,
    top bit cleared so ids are non-negative)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    out = np.empty(len(values), dtype=np.int64)
    for i, s in enumerate(values):
        h = hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
        out[i] = np.int64(int.from_bytes(h, "big") & 0x7FFF_FFFF_FFFF_FFFF)
    return out


def with_hash_ids(ds, col: str, out_col: str):
    """Append ``out_col = hash64(col)`` via a stateless ``map_batches``."""

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, pa.array(hash64(batch[col]), pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def assign_dense_ids(unique_ds, col: str, id_col: str = "v"):
    """Distributed sort-assign: ``unique_ds`` (one row per distinct
    ``col`` value) -> same rows plus dense ``id_col`` in sorted order.

    Mechanics: ``sort(col)`` (range shuffle), materialize, collect ONLY
    per-block row counts on the driver (small), prefix-sum, then number
    each block with its offset.  Scales to any N: the driver never sees
    row data, just P counts.
    """
    import ray

    sorted_ds = unique_ds.sort(col).materialize()
    base_schema = sorted_ds.schema().base_schema
    out_schema = base_schema.append(pa.field(id_col, pa.int64()))
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _count(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_count.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    @ray.remote
    def _number(t: pa.Table, off: int) -> pa.Table:
        if t.num_rows == 0:
            # Ray's sort can emit empty blocks with NO columns; normalize
            # them to the full output schema so downstream joins see one
            # consistent schema.
            return out_schema.empty_table()
        ids = np.arange(off, off + t.num_rows, dtype=np.int64)
        return t.append_column(id_col, pa.array(ids, pa.int64()))

    import ray.data as rd

    numbered = [_number.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(numbered)
