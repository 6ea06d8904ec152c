"""Deterministic synthetic events table (scaling-bench input).

Same shape as the driver's ``events.parquet`` — ``(event_id:int64,
ts:timestamp[us], user_id:int64, event_type:string, value:double,
props:string)`` — at arbitrary row counts, for the
``bench.py --scaling-query`` evidence on the windowed/streaming
operators (sessions, funnel, retention, as-of, running totals,
rollups).  Determinism contract as the sibling ``synth_*`` sources:
counter-keyed splitmix64 draws; the user-id domain is derived from
the CORPUS size (passed explicitly), never from a batch's ids, so
generation is bit-identical at any block layout.

Matches the driver fixture's statistics: 5 uniform event types
(click/error/purchase/signup/view), a 30-day timestamp window from
2024-01-01, ~67 events per user (users scale with n), uniform values
in [0, 100), ``{"k": <0-99>}`` props.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .synth_graph import _splitmix64, _u01

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_TYPES = np.asarray(["click", "error", "purchase", "signup", "view"])
_BASE_US = np.int64(1704067200000000)  # 2024-01-01T00:00:00 in µs
_WINDOW_US = np.int64(30) * 86400_000_000  # 30 days
_EVENTS_PER_USER = 67


def _events_for_ids(ids: np.ndarray, seed: int,
                    n_users: int) -> pa.Table:
    ids = ids.astype(np.uint64)
    s = np.uint64(seed)

    h_u = _splitmix64(ids * _GOLD ^ s ^ np.uint64(1))
    user = np.floor(_u01(h_u) * n_users).astype(np.int64)
    h_t = _splitmix64(ids * _GOLD ^ s ^ np.uint64(2))
    ts_us = _BASE_US + np.floor(_u01(h_t) * float(_WINDOW_US)) \
        .astype(np.int64)
    h_e = _splitmix64(ids * _GOLD ^ s ^ np.uint64(3))
    etype = _TYPES[np.minimum(np.floor(_u01(h_e) * len(_TYPES))
                              .astype(np.int64), len(_TYPES) - 1)]
    h_v = _splitmix64(ids * _GOLD ^ s ^ np.uint64(4))
    value = np.round(_u01(h_v) * 100.0, 2)
    h_p = _splitmix64(ids * _GOLD ^ s ^ np.uint64(5))
    k = np.floor(_u01(h_p) * 100).astype(np.int64)
    props = np.char.add(np.char.add('{"k": ', k.astype("U3")), "}")

    return pa.table({
        "event_id": pa.array(ids.astype(np.int64), pa.int64()),
        "ts": pa.array(ts_us, pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(user, pa.int64()),
        "event_type": pa.array(etype, pa.string()),
        "value": pa.array(value, pa.float64()),
        "props": pa.array(props, pa.string()),
    })


def _n_users(n_total: int) -> int:
    return max(1, n_total // _EVENTS_PER_USER)


def synthetic_events(n: int, seed: int = 11,
                     override_num_blocks: int | None = None):
    """Distributed events Dataset — see module docstring."""
    import ray.data as rd

    users = _n_users(n)

    def gen(batch: dict) -> pa.Table:
        return _events_for_ids(np.asarray(batch["id"]), seed, users)

    return rd.range(n, override_num_blocks=override_num_blocks).map_batches(
        gen, batch_format="numpy"
    )


def synthetic_events_numpy(n: int, seed: int = 11) -> pa.Table:
    """Driver-side generation (oracle/test path) — identical rows."""
    return _events_for_ids(np.arange(n, dtype=np.uint64), seed,
                           _n_users(n))


def events_table_for_range(lo: int, hi: int, n_total: int,
                           seed: int = 11) -> pa.Table:
    """Rows ``event_id in [lo, hi)`` of an ``n_total``-row corpus —
    identical to the same slice of ``synthetic_events_numpy(n_total)``
    (chunked-writer helper)."""
    return _events_for_ids(np.arange(lo, hi, dtype=np.uint64), seed,
                           _n_users(n_total))
