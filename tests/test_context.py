"""derive_num_groups / estimate_size_bytes: sizing must come from
metadata only — calling ``size_bytes()`` on a lazy map_batches chain
executes the WHOLE upstream (Ray 2.49 fallback), which at 100 TB means
materializing the input once per call site just to pick a group count."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from dxa_pagerank_ray.context import derive_num_groups, estimate_size_bytes


def _poison(batch: pa.Table) -> pa.Table:  # pragma: no cover - must not run
    raise RuntimeError("derive_num_groups executed the upstream pipeline")


def test_derive_num_groups_does_not_execute_lazy_pipeline(tmp_path):
    path = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"x": np.arange(10_000, dtype=np.int64)}), path)
    ds = rd.read_parquet(path).map_batches(_poison, batch_format="pyarrow")
    # sizing a lazy chain must neither raise (via the poisoned fn) nor
    # hang — it reads parquet-footer / block metadata only
    n = derive_num_groups(ds)
    assert n >= 64
    # the chain really is poisoned: consuming it must blow up
    with pytest.raises(Exception):
        ds.materialize()


def test_estimate_size_bytes_sources():
    t = pa.table({"x": np.arange(50_000, dtype=np.int64)})
    est = estimate_size_bytes(rd.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow"))
    assert est is None or est > 0


def test_derive_num_groups_scales_with_bytes(tmp_path):
    path = str(tmp_path / "big.parquet")
    rng = np.random.default_rng(0)
    # incompressible payload so the footer size reflects real bytes
    pq.write_table(pa.table({
        "x": rng.integers(0, 2**62, size=600_000, dtype=np.int64),
        "y": rng.integers(0, 2**62, size=600_000, dtype=np.int64),
    }), path, compression="none")
    ds = rd.read_parquet(path)
    fine = derive_num_groups(ds, target_bytes=1 << 20, minimum=1)
    coarse = derive_num_groups(ds, target_bytes=1 << 30, minimum=1)
    assert fine >= (600_000 * 16) // (1 << 20)  # footer bytes seen
    assert coarse < fine  # finer target -> more groups
