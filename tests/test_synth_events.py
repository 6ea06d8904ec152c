"""Synthetic-events source (scaling-bench input) invariants."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from dxa_pagerank_ray.sources.synth_events import (
    events_table_for_range,
    synthetic_events,
    synthetic_events_numpy,
)


def test_block_count_invariance(ray_session):
    import pyarrow as pa
    import ray

    ref = synthetic_events_numpy(600).sort_by("event_id")
    for blocks in (1, 7):
        ds = synthetic_events(600, override_num_blocks=blocks)
        got = pa.concat_tables(ray.get(ds.to_arrow_refs())) \
            .sort_by("event_id")
        assert got.equals(ref), f"blocks={blocks} diverged"


def test_schema_matches_driver_events():
    t = synthetic_events_numpy(50)
    ref = pq.read_table("/root/testdata/sf0.001/events.parquet")
    assert t.schema.names == ref.schema.names
    assert [f.type for f in t.schema] == [ref.schema.field(n).type
                                          for n in t.schema.names]


def test_domains_match_driver_statistics():
    t = synthetic_events_numpy(100_000)
    assert set(t["event_type"].to_pylist()) == {
        "click", "error", "purchase", "signup", "view"}
    users = t["user_id"].to_numpy()
    assert 1300 < len(np.unique(users)) <= 1492  # ~100k/67 users
    ts = t["ts"].to_numpy()
    assert str(ts.min())[:7] == "2024-01"
    assert (ts.max() - ts.min()) < np.timedelta64(31, "D")
    v = t["value"].to_numpy()
    assert v.min() >= 0 and v.max() <= 100  # round(99.999, 2) == 100.0
    assert t["props"][0].as_py().startswith('{"k": ')


def test_range_generation_matches_full():
    full = synthetic_events_numpy(5000)
    part = events_table_for_range(1000, 2000, n_total=5000)
    assert part.equals(full.slice(1000, 1000))
