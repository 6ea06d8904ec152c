"""Per-superstep checkpoint + resume (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

The reference keeps everything in volatile DXRAM memory and writes only
final outputs (SURVEY.md §4 "checkpoint: none").  Here every k-th
superstep writes the vertex-state vector as partitioned Parquet plus a
manifest:

    <dir>/iter=NNNNN/part=PPP.parquet   one file per vertex-id range
    <dir>/iter=NNNNN/MANIFEST.json      written LAST => completeness marker

The manifest carries the iteration metrics history (round, err, seconds
— the modernized ``statistics.out`` round table,
``PrStatisticsJob.java:85-91``) and the per-partition file list with row
counts and vertex-id ranges (the lineage needed to skip finished
partitions on rerun).  ``latest_checkpoint`` scans for the highest
complete iteration; a crash mid-write leaves no manifest and the
partial directory is ignored (and overwritten on resume).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


@dataclass
class RoundMetric:
    round: int
    err: float
    seconds: float


def _iter_dir(base: str, it: int) -> str:
    return os.path.join(base, f"iter={it:05d}")


def write_checkpoint(base: str, it: int, state: dict[str, np.ndarray],
                     scalars: dict, metrics: list[RoundMetric],
                     num_partitions: int = 8) -> None:
    """Write vertex-state arrays (equal length N) + manifest for ``it``."""
    d = _iter_dir(base, it)
    os.makedirs(d, exist_ok=True)
    n = len(next(iter(state.values())))
    bounds = np.linspace(0, n, num_partitions + 1).astype(np.int64)
    parts = []
    for p in range(num_partitions):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        cols = {"v": pa.array(np.arange(lo, hi, dtype=np.int64), pa.int64())}
        for name, arr in state.items():
            cols[name] = pa.array(arr[lo:hi])
        path = os.path.join(d, f"part={p:03d}.parquet")
        pq.write_table(pa.table(cols), path)
        parts.append({"part": p, "file": os.path.basename(path),
                      "rows": hi - lo, "v_lo": lo, "v_hi": hi})
    manifest = {
        "iter": it,
        "num_vertices": n,
        "columns": list(state.keys()),
        "scalars": scalars,
        "partitions": parts,
        "metrics": [m.__dict__ for m in metrics],
    }
    tmp = os.path.join(d, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(d, "MANIFEST.json"))


def latest_checkpoint(base: str) -> int | None:
    """Highest iteration with a complete manifest, or None."""
    if not os.path.isdir(base):
        return None
    best = None
    for name in os.listdir(base):
        if name.startswith("iter=") and os.path.exists(
            os.path.join(base, name, "MANIFEST.json")
        ):
            it = int(name.split("=", 1)[1])
            best = it if best is None else max(best, it)
    return best


def read_checkpoint(base: str, it: int):
    """-> (state dict of dense arrays, scalars dict, metrics list)."""
    d = _iter_dir(base, it)
    with open(os.path.join(d, "MANIFEST.json")) as f:
        manifest = json.load(f)
    n = manifest["num_vertices"]
    state: dict[str, np.ndarray] = {}
    tables = []
    for p in manifest["partitions"]:
        tables.append(pq.read_table(os.path.join(d, p["file"])))
    t = pa.concat_tables(tables)
    v = t["v"].to_numpy(zero_copy_only=False)
    for col in manifest["columns"]:
        arr = np.empty(n, dtype=t[col].type.to_pandas_dtype())
        arr[v] = t[col].to_numpy(zero_copy_only=False)
        state[col] = arr
    metrics = [RoundMetric(**m) for m in manifest["metrics"]]
    return state, manifest["scalars"], metrics
