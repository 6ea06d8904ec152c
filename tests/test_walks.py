"""Deterministic random-walk corpus engine vs its sequential replay."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dxa_pagerank_ray.pipelines.walks import WalkCSR, walks_reference


def _ds(src, dst, parts: int = 4):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ).repartition(parts).materialize()


def _canon(t: pa.Table) -> pd.DataFrame:
    return t.to_pandas().sort_values(["walk_id", "step"]) \
        .reset_index(drop=True)


def test_walks_match_reference_across_shard_counts():
    rng = np.random.default_rng(31)
    n, m = 400, 2500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    key = np.unique(src[keep] * n + dst[keep])  # dedup'd directed edges
    src, dst = key // n, key % n
    seeds = np.arange(0, n, 13, dtype=np.int64)
    exp = _canon(walks_reference(src, dst, n, seeds, length=10, seed=5))
    for a in (1, 4):
        eng = WalkCSR(_ds(src, dst), n, num_partitions=8, num_actors=a,
                      seed=5)
        eng.run(seeds, length=10)
        got = _canon(eng.collect())
        eng.shutdown()
        pd.testing.assert_frame_equal(got, exp, check_exact=True)
    # every walk has a step-0 row and steps are contiguous from 0
    g = exp.groupby("walk_id")["step"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.size()).all()


def test_walks_retire_at_dangling_vertices():
    # path 0 -> 1 -> 2, vertex 2 dangling: the walk from 0 logs steps
    # 0,1,2 and stops; the walk from 2 logs only step 0.
    src = np.array([0, 1])
    dst = np.array([1, 2])
    eng = WalkCSR(_ds(src, dst, parts=1), 3, num_partitions=2,
                  num_actors=1, seed=0)
    eng.run(np.array([0, 2]), length=5)
    got = _canon(eng.collect())
    eng.shutdown()
    exp = pd.DataFrame({"walk_id": [0, 0, 0, 2],
                        "step": [0, 1, 2, 0],
                        "v": [0, 1, 2, 2]})
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_walks_write_logs(tmp_path):
    import pyarrow.parquet as pq

    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 0])
    eng = WalkCSR(_ds(src, dst, parts=1), 3, num_partitions=2,
                  num_actors=2, seed=1)
    eng.run(np.array([0, 1, 2]), length=4)
    files = eng.write_logs(str(tmp_path / "walks"))
    expected = _canon(eng.collect())
    eng.shutdown()
    parts = [pq.read_table(str(tmp_path / "walks" / f)) for f in files]
    got = _canon(pa.concat_tables(parts))
    pd.testing.assert_frame_equal(got, expected, check_exact=True)
    assert (got.groupby("walk_id")["step"].max() == 4).all()  # cycle
