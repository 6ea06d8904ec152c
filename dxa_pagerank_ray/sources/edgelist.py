"""Reader for the reference's edge-list text format (FIXTURES.md F4).

Format (``/root/reference/README.md:49-59``): line *i* (1-based) holds
the space-separated in-neighbors of vertex *i*; the literal token ``0``
means "no in-edges".  So token ``u`` on line ``i`` is the edge
``u -> i``.  Ids are dense and 1-based in the file; this reader emits
0-based dense ids.

The format is inherently line-number addressed (vertex identity = line
position), so parsing is a single sequential pass — appropriate for the
micro-fixture scale this format exists at.  Unlike the reference, which
reads the whole file TWICE (pass 1 out-degrees, pass 2 vertex build,
``ReadLumpInEdgeListTask.java:53-128``), the parsed edge table is
produced once and degrees derive from it.

Duplicate tokens on a line are preserved (the reference counts them
twice in the out-degree tally, ``ReadLumpInEdgeListTask.java:69-71``);
the engine's dedup stage collapses them downstream — both behaviors are
asserted separately in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def parse_edgelist(path: str) -> tuple[pa.Table, int]:
    """-> (edges table ``(src:int64, dst:int64)`` 0-based with duplicates
    preserved, num_vertices)."""
    src: list[int] = []
    dst: list[int] = []
    n = 0
    with open(path, "r") as f:
        for i, line in enumerate(f, start=1):
            n = i
            toks = line.split()
            if toks == ["0"] or not toks:
                continue  # the 0 sentinel: no in-edges
            for t in toks:
                u = int(t)
                src.append(u - 1)
                dst.append(i - 1)
    return (
        pa.table(
            {
                "src": pa.array(np.asarray(src, dtype=np.int64), pa.int64()),
                "dst": pa.array(np.asarray(dst, dtype=np.int64), pa.int64()),
            }
        ),
        n,
    )


def edgelist_dataset(path: str):
    """Edge Dataset from an edge-list file (duplicates preserved)."""
    import ray.data as rd

    t, n = parse_edgelist(path)
    return rd.from_arrow(t), n


README7 = "2 3 4\n3 4\n5 6 7\n0\n4 6\n4\n4\n"
"""The 7-vertex example graph verbatim from the reference README
(``/root/reference/README.md:51-59``) — known-answer fixture."""
