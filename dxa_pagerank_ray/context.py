"""Engine-wide execution defaults and partitioning helpers.

The reference encodes its partitioning in the ChunkID key space
(``ReadLumpInEdgeListTask.java:142-147``: vertex ``v`` lives on slave
``(v-1) % numSlaves``).  Here partitioning is an explicit, documented
column/function per stage; the Ray object store owns placement.
"""

from __future__ import annotations

import numpy as np

# Default number of logical graph partitions.  Like the reference's slave
# count, this is fixed per *run* (pinned CSR actors depend on it) but
# independent of cluster size: more nodes just means more actors per node
# hosting fewer partitions each (SURVEY.md §4 "elasticity").
DEFAULT_NUM_PARTITIONS = 32

# Vertex-state broadcast threshold for the scatter step of a superstep.
# Below this many vertices the per-superstep rank vector is shipped to
# edge tasks via a single ``ray.put`` (a few MB); above it the engine
# uses the shuffle-join scatter path.  8 bytes * 3 arrays * 1e7 = ~240MB
# of worker-heap per task at the limit — acceptable on 4+ GB workers.
BROADCAST_VERTEX_LIMIT = 10_000_000


def part_of(v: np.ndarray, num_partitions: int) -> np.ndarray:
    """Partition id of vertex ids ``v`` (mirrors the reference's
    round-robin ``(v-1) % numSlaves`` discipline for dense ids, and is a
    plain modulo of the 64-bit hash for hashed ids)."""
    return (v % np.int64(num_partitions)).astype(np.int64)


def estimate_size_bytes(ds) -> int | None:
    """Best-effort size of ``ds`` WITHOUT executing it.

    ``Dataset.size_bytes()`` on a lazy dataset (any ``map_batches``
    chain — i.e. every mid-pipeline dataset in this engine) falls back
    to a full ``plan.execute()``, materializing the whole upstream just
    to read a number.  Instead: if the plan already has computed output,
    its metadata is free; otherwise walk the logical DAG to the leaf
    ops (``Read`` / ``InputData``) and sum their metadata estimates —
    parquet-footer numbers for reads, block metadata for in-memory
    sources.  This measures SOURCE size, not post-transform size, which
    is the right coarse proxy for group sizing (transforms in this
    engine shrink or roughly preserve volume).  Returns ``None`` when
    no estimate is available; never triggers execution."""
    try:
        if ds._plan.has_computed_output():
            return int(ds.size_bytes() or 0)  # snapshot metadata — free
    except Exception:  # pragma: no cover - internal API drift
        pass
    total, found = 0, False
    try:
        stack = [ds._plan._logical_plan.dag]
        while stack:
            op = stack.pop()
            deps = list(op.input_dependencies)
            if deps:
                stack.extend(deps)
                continue
            sz = None
            try:  # Read op: parquet footer / datasource estimate
                sz = op.infer_metadata().size_bytes
            except Exception:
                pass
            if sz is None:
                try:  # InputData / from_arrow: per-block metadata
                    sz = sum(
                        m.size_bytes or 0
                        for m in op.infer_metadata()  # type: ignore
                    )
                except Exception:
                    pass
            if sz is None:
                try:
                    sz = sum(
                        (b.size_bytes() if callable(
                            getattr(b, "size_bytes", None)) else 0)
                        for b in getattr(op, "input_data", []) or []
                    )
                except Exception:
                    pass
            if sz:
                total += int(sz)
                found = True
    except Exception:  # pragma: no cover - internal API drift
        return None
    return total if found else None


def derive_num_groups(*dss, target_bytes: int = 64 << 20,
                      minimum: int | None = None) -> int:
    """Coarse-group count for the co-group/pair-sweep pattern, derived
    from input size instead of a hardcoded constant: one group should
    hold ~``target_bytes`` so a ``map_groups`` partition fits a worker
    heap at ANY data scale, while the floor (2x cluster CPUs, >=64)
    keeps small inputs from paying per-group overhead on thousands of
    tiny groups.  Sizing uses :func:`estimate_size_bytes` — metadata
    only, never an upstream execution (a lazy ``size_bytes()`` call
    here previously materialized the whole input once per call site)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() \
        else 8
    floor = minimum if minimum is not None else max(64, 2 * cpus)
    total = 0
    for ds in dss:
        est = estimate_size_bytes(ds)
        if est:
            total += est
    return max(floor, -(-total // target_bytes))


def read_parquet_clean(path: str, **kw):
    """``rd.read_parquet`` with file-level schema metadata stripped:
    the pandas metadata dict written into parquet footers makes
    ``pa.Schema`` unhashable, which defeats Ray's block-schema dedup
    and logs a warning on every multi-block batch concat.  The strip is
    zero-copy and fuses with the read."""
    import ray.data as rd

    return rd.read_parquet(path, **kw).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )


def quiet_data_context() -> None:
    """Apply the engine's DataContext defaults (idempotent).

    Order never matters for keyed dataflow (all joins/aggregates key on
    vertex id, never row order), so ``preserve_order`` stays off and the
    streaming executor is free to pipeline.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.execution_options.preserve_order = False
    ctx.enable_progress_bars = False
    try:  # present on Ray >= 2.40
        ctx.execution_options.verbose_progress = False
    except AttributeError:  # pragma: no cover
        pass
    # Per-operator CPU reservation starves the hot stage of a long
    # streaming DAG when the cluster is small: a 6-operator pipeline
    # (read -> map -> sort -> map_groups -> distinct) measured 16.0 s
    # at 8 CPUs with reservation on vs 2.85 s with it off — the busy
    # map stage was granted ~1 CPU while idle downstream operators
    # held reservations (BASELINE.md round-5m; neutral at 32 CPUs,
    # where the shared pool has slack).  Our operators are skinny
    # Arrow columns with bounded per-task memory, so memory-based
    # backpressure (a separate mechanism) still protects the object
    # store.
    try:  # knob present on Ray >= 2.10
        ctx.op_resource_reservation_enabled = False
    except AttributeError:  # pragma: no cover
        pass
