"""Unit tests for ``relational.events_retention`` (cohort triangle).

The sf0.01 oracle test already checks the query end to end; these pin
the kernel against an independent pandas reference on a hand-built
events table, and the layout-invariance contract (same rows, different
row order / row-group split -> identical triangle).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from dxa_pagerank_ray.pipelines.relational import events_retention

DAY_US = 86_400_000_000


def _write_events(path: str, ts_days: list[tuple[int, float]],
                  order: np.ndarray | None = None,
                  row_group_size: int | None = None) -> None:
    """(user_id, fractional day) pairs -> events.parquet with the full
    events schema (extra columns must be pruned by the read)."""
    uid = np.array([u for u, _ in ts_days], dtype=np.int64)
    ts = np.array([int(d * DAY_US) for _, d in ts_days], dtype=np.int64)
    if order is not None:
        uid, ts = uid[order], ts[order]
    n = len(uid)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array(np.zeros(n), pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    os.makedirs(path, exist_ok=True)
    pq.write_table(t, f"{path}/events.parquet",
                   row_group_size=row_group_size or max(n, 1))


def _reference(ts_days: list[tuple[int, float]]) -> pd.DataFrame:
    df = pd.DataFrame(ts_days, columns=["user_id", "fday"])
    df["day"] = (df["fday"] * DAY_US).astype(np.int64) // DAY_US
    days = df[["user_id", "day"]].drop_duplicates()
    coh = days.groupby("user_id")["day"].min().rename("cohort_day")
    j = days.merge(coh, on="user_id")
    j["day_offset"] = j["day"] - j["cohort_day"]
    out = (j.groupby(["cohort_day", "day_offset"]).size()
           .rename("n_users").reset_index()
           .sort_values(["cohort_day", "day_offset"])
           .reset_index(drop=True))
    return out.astype(np.int64)


def _run(path: str) -> pd.DataFrame:
    df = events_retention(path).to_pandas()  # Arrow table or Dataset
    return (df.sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True).astype(np.int64))


EVENTS = [
    # user 1: days 3, 3 (dup event same day), 5, 10
    (1, 3.2), (1, 3.9), (1, 5.0), (1, 10.5),
    # user 2: day 3 only (cohort peer of user 1, no return)
    (2, 3.0),
    # user 3: days 4, 5 — different cohort
    (3, 4.99), (3, 5.01),
    # user 4: many events one day
    (4, 7.1), (4, 7.2), (4, 7.3),
]


def test_retention_matches_pandas_reference(ray_session, tmp_path):
    p = str(tmp_path / "sf")
    _write_events(p, EVENTS)
    got = _run(p)
    exp = _reference(EVENTS)
    pd.testing.assert_frame_equal(got, exp)
    # hand-check a few cells: cohort day 3 = users {1, 2} at offset 0,
    # user 1 returns at offsets 2 and 7
    by = {(r.cohort_day, r.day_offset): r.n_users
          for r in got.itertuples()}
    assert by[(3, 0)] == 2
    assert by[(3, 2)] == 1
    assert by[(3, 7)] == 1
    assert by[(4, 0)] == 1 and by[(4, 1)] == 1
    assert by[(7, 0)] == 1


def test_retention_layout_invariant(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    events = [(int(u), float(d))
              for u, d in zip(rng.integers(0, 40, 400),
                              rng.uniform(0, 30, 400))]
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    _write_events(a, events)
    _write_events(b, events, order=rng.permutation(len(events)),
                  row_group_size=17)
    ga, gb = _run(a), _run(b)
    pd.testing.assert_frame_equal(ga, gb)
    pd.testing.assert_frame_equal(ga, _reference(events))
    # triangle mass == distinct (user, day) pairs
    assert ga["n_users"].sum() == len(
        {(u, int(d * DAY_US) // DAY_US) for u, d in events})
