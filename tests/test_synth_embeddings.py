"""Synthetic-embeddings source (scaling-bench input) invariants."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from dxa_pagerank_ray.sources.synth_embeddings import (
    embeddings_table_for_range,
    synthetic_embeddings,
    synthetic_embeddings_numpy,
)


def test_block_count_invariance(ray_session):
    import pyarrow as pa
    import ray

    ref = synthetic_embeddings_numpy(400).sort_by("vec_id")
    for blocks in (1, 7):
        ds = synthetic_embeddings(400, override_num_blocks=blocks)
        got = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by("vec_id")
        assert got.equals(ref), f"blocks={blocks} diverged"


def test_schema_matches_driver_embeddings():
    t = synthetic_embeddings_numpy(10)
    ref = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    assert t.schema.names == ref.schema.names
    assert [f.type for f in t.schema] == [ref.schema.field(n).type
                                          for n in t.schema.names]


def test_unit_norm_labels_and_planted_dups():
    t = synthetic_embeddings_numpy(2000)
    v = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    assert np.abs(np.linalg.norm(v, axis=1) - 1).max() < 1e-5
    lab = t["label"].to_numpy()
    assert set(lab) == set(range(10))
    # planted near-dups: stripe members whose coin fired sit at
    # cosine ~0.99+ of their stripe anchor
    hits = sum(
        1
        for i in range(0, 2000, 50)
        for j in range(i + 1, min(i + 50, 2000))
        if float(v[i] @ v[j]) > 0.98
    )
    assert hits > 100, hits  # dup_rate=0.1 over 40 stripes -> ~190


def test_range_generation_matches_full():
    full = synthetic_embeddings_numpy(300)
    part = embeddings_table_for_range(100, 200)
    assert part.equals(full.slice(100, 100))
