"""Connected components: hash-min label exchange (north_star; graft op,
no reference file — skeleton shared with PageRank, SURVEY.md §7 step 7).

Iterative supersteps on the symmetrized edge set: every vertex starts
labeled with its own id; per round each vertex takes the min of its own
label and its neighbors' labels (message = label along each undirected
edge, aggregate = Min via ``groupby(dst).min`` with map-side combine).
Converged when no label changes.  Labels canonicalize to the minimum
member id — exact-match contract vs the oracle (north_rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .superstep import put_vector, sparse_min_gather, undirect


@dataclass
class ComponentsResult:
    labels: np.ndarray
    rounds: int
    changed_per_round: list[int] = field(default_factory=list)


def connected_components(
    edges_ds,
    num_vertices: int,
    max_rounds: int = 200,
    batch_size: int | None = None,
    symmetrized: bool = False,
) -> ComponentsResult:
    """``edges_ds``: dense-id edge Dataset (direction ignored; pass
    ``symmetrized=True`` if it already contains both directions)."""
    und = edges_ds if symmetrized else undirect(edges_ds)
    n = num_vertices
    labels = np.arange(n, dtype=np.int64)
    changed_hist: list[int] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        ref = put_vector(labels)
        mins = sparse_min_gather(und, ref, n, batch_size)
        cand = np.minimum(labels, mins)
        changed = int(np.sum(cand != labels))
        changed_hist.append(changed)
        labels = cand
        if changed == 0:
            break
    return ComponentsResult(labels=labels, rounds=rounds,
                            changed_per_round=changed_hist)
