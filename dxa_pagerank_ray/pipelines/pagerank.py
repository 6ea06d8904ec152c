"""Lump PageRank over an edge Dataset (the reference's core algorithm).

Semantics match ``RunLumpPrRoundTask.java`` / ``MainPR.java`` exactly
(SURVEY.md §3.2): per normal round only non-dangling vertices update as

    PR'(v) = (1-d)/N + d * sum_{u->v} PR(u)/outdeg(u) + d * danglingPR/N

dangling vertices stay frozen; their mass rides the lumped scalar
``danglingPR = 1 - sum_nondangling PR'`` (``MainPR.java:156-167``);
convergence is the L1 delta over updated vertices vs a threshold
(``MainPR.java:179-181``); a final restore round applies the formula to
dangling vertices only (``MainPR.java:185-197``).  One documented
deviation: the initial dangling mass is the correct ``|dangling|/N``
rather than the reference's MetaChunk-init ``1/N`` quirk
(``MetaChunk.java:20``) — same fixed point (survey-verified <1e-13).

Engine: broadcast gather-scatter supersteps (`pipelines.superstep`) —
per round the contribution vector is one ``ray.put``, the edge Dataset
is mapped with a map-side combine, and ``groupby(dst).sum`` performs
the message-exchange shuffle.  The driver holds only O(N) vectors and
the loop scalars (the MetaChunk reduce/broadcast of ``MainPR.java``
collapses into plain Python floats).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from ..state.checkpoint import (
    RoundMetric,
    latest_checkpoint,
    read_checkpoint,
    write_checkpoint,
)
from .superstep import dense_out_degrees, put_vector, sparse_sum_gather


@dataclass
class PageRankResult:
    pr: np.ndarray
    rounds: int
    errs: list[float] = field(default_factory=list)
    round_seconds: list[float] = field(default_factory=list)
    converged: bool = False
    resumed_from: int | None = None

    def metrics(self) -> list[RoundMetric]:
        return [
            RoundMetric(round=i + 1, err=e, seconds=s)
            for i, (e, s) in enumerate(zip(self.errs, self.round_seconds))
        ]


def pagerank(
    edges_ds,
    num_vertices: int,
    damping: float = 0.85,
    threshold: float = 1e-6,
    max_rounds: int = 100,
    batch_size: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    outdeg: np.ndarray | None = None,
) -> PageRankResult:
    """Broadcast-engine lump PageRank.  ``edges_ds`` must be a
    materialized deduplicated Dataset with dense ids in
    ``0..num_vertices-1``."""
    n = num_vertices
    d = damping
    if outdeg is None:
        outdeg = dense_out_degrees(edges_ds, n)
    nondangling = outdeg != 0
    inv_outdeg = np.where(nondangling, 1.0 / np.maximum(outdeg, 1), 0.0)

    pr = np.full(n, 1.0 / n, dtype=np.float64)
    dangling_pr = float(np.sum(~nondangling)) / n
    errs: list[float] = []
    seconds: list[float] = []
    start_round = 0
    resumed_from = None
    if resume and checkpoint_dir is not None:
        it = latest_checkpoint(checkpoint_dir)
        if it is not None:
            state, scalars, metrics = read_checkpoint(checkpoint_dir, it)
            pr = state["pr"]
            dangling_pr = float(scalars["dangling_pr"])
            errs = [m.err for m in metrics]
            seconds = [m.seconds for m in metrics]
            start_round = it
            resumed_from = it

    rounds = start_round
    converged = len(errs) > 0 and errs[-1] <= threshold
    while rounds < max_rounds and not converged:
        t0 = time.perf_counter()
        rounds += 1
        # scatter value = PR(u)/outdeg(u); zero for dangling (they send
        # nothing — their mass is the lumped scalar)
        contrib_ref = put_vector(pr * inv_outdeg)
        gathered = sparse_sum_gather(edges_ds, contrib_ref, n, batch_size)
        new_pr = (1.0 - d) / n + d * gathered + d * dangling_pr / n
        err = float(np.sum(np.abs(new_pr[nondangling] - pr[nondangling])))
        pr = np.where(nondangling, new_pr, pr)
        dangling_pr = 1.0 - float(np.sum(pr[nondangling]))
        errs.append(err)
        seconds.append(time.perf_counter() - t0)
        converged = err <= threshold
        if (
            checkpoint_dir is not None
            and checkpoint_every > 0
            and rounds % checkpoint_every == 0
        ):
            write_checkpoint(
                checkpoint_dir,
                rounds,
                {"pr": pr},
                {"dangling_pr": dangling_pr, "damping": d, "threshold": threshold},
                [RoundMetric(i + 1, e, s)
                 for i, (e, s) in enumerate(zip(errs, seconds))],
            )

    # Dangling restore round (``MainPR.java:185-197``): dangling
    # vertices only, same formula, then both "buffers" hold the value
    # (here: the single vector).
    if not nondangling.all():
        contrib_ref = put_vector(pr * inv_outdeg)
        gathered = sparse_sum_gather(edges_ds, contrib_ref, n, batch_size)
        restored = (1.0 - d) / n + d * gathered + d * dangling_pr / n
        pr = np.where(nondangling, pr, restored)

    res = PageRankResult(pr=pr, rounds=rounds, errs=errs,
                         round_seconds=seconds, converged=converged,
                         resumed_from=resumed_from)
    return res
