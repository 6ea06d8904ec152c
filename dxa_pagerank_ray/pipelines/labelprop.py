"""Synchronous label propagation (north_star graft op; shares the
superstep skeleton — different message aggregate, SURVEY.md §2.10).

Per round every vertex with at least one neighbor takes the *mode* of
its neighbors' labels (ties -> lowest label, deterministic); fixed
round cap; early stop when stable.  The aggregate is a two-level
``groupby((dst, label)).sum`` count shuffle (`superstep.mode_gather`) —
the same degree-aware two-level shape that handles hub skew for
PageRank handles the (dst, label) pair counts here.

Exact-match contract vs the oracle at every round (synchronous LP can
oscillate; determinism, not convergence, is the contract).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .superstep import mode_gather, put_vector, undirect


@dataclass
class LabelPropResult:
    labels: np.ndarray
    rounds: int
    changed_per_round: list[int] = field(default_factory=list)


def label_propagation(
    edges_ds,
    num_vertices: int,
    rounds: int = 10,
    batch_size: int | None = None,
    symmetrized: bool = False,
) -> LabelPropResult:
    und = edges_ds if symmetrized else undirect(edges_ds)
    n = num_vertices
    labels = np.arange(n, dtype=np.int64)
    changed_hist: list[int] = []
    done = 0
    for done in range(1, rounds + 1):
        ref = put_vector(labels)
        modes = mode_gather(und, ref, n, batch_size)
        new_labels = np.where(modes >= 0, modes, labels)
        changed = int(np.sum(new_labels != labels))
        changed_hist.append(changed)
        if changed == 0:
            labels = new_labels
            break
        labels = new_labels
    return LabelPropResult(labels=labels, rounds=done,
                           changed_per_round=changed_hist)
