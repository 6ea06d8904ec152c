"""Single-process numpy oracles for the graph algorithms (FIXTURES.md F5).

These are the conformance surface standing in for the unrunnable DXRAM
reference: the PageRank oracle implements the reference's "lump"
recurrence exactly (SURVEY.md §3.2; ``RunLumpPrRoundTask.java:101-112``,
``MainPR.java:156-197``, ``Vertex.java:65-67``), with the one documented
deviation that the initial dangling mass is the *correct*
``|dangling|/N`` rather than the reference's MetaChunk-init quirk of
``1/N`` (``MetaChunk.java:20``) — both reach the same fixed point (the
survey verified agreement to <1e-13 at convergence).

All oracles take a dense-id edge array ``(src, dst)`` with vertices
``0..n-1`` and run in O(E) numpy; they are deliberately simple (<100 LoC
each) and independent of any engine code.
"""

from __future__ import annotations

import numpy as np


def out_degrees(src: np.ndarray, n: int) -> np.ndarray:
    return np.bincount(src, minlength=n).astype(np.int64)


def pagerank_lump(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    damping: float = 0.85,
    threshold: float = 1e-6,
    max_rounds: int = 200,
    weights: np.ndarray | None = None,
    teleport: np.ndarray | None = None,
):
    """Reference-semantics lump PageRank.

    With ``weights`` (per-edge, positive), contributions distribute
    proportionally: ``PR(u) * w(u,v) / W(u)`` with ``W(u)`` the out-edge
    weight sum — the weighted PageRank of Xing & Ghorbani 2004
    ("Weighted PageRank Algorithm", public literature); dangling =
    zero out-strength.

    With ``teleport`` (a length-n distribution summing to 1),
    personalized PageRank: init, the (1-d) term and the dangling lump
    all use ``t(v)`` in place of 1/N (topic-sensitive PageRank,
    Haveliwala 2002).

    Per normal round, only non-dangling vertices update
    (``RunLumpPrRoundTask.java:71-76``):

        PR'(v) = (1-d)/N + d * sum_{u->v} PR(u)/outdeg(u) + d * danglingPR/N

    dangling vertices stay frozen at their init value; their mass rides
    the lumped scalar ``danglingPR = 1 - sum_nondangling PR'``
    (``MainPR.java:156-167``).  Error = L1 delta over updated vertices;
    stop at ``err <= threshold`` or ``max_rounds``.  A final
    dangling-restore round applies the same formula to dangling vertices
    only (``MainPR.java:185-197``, ``RunLumpPrRoundTask.java:77-83``).

    Returns ``(pr, rounds, errs)``.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if weights is not None:
        w = np.asarray(weights, dtype=np.float64)
        wsum = np.bincount(src, weights=w, minlength=n)
        nondangling = wsum != 0
        wdiv = np.where(nondangling, wsum, 1.0)
    else:
        outdeg = out_degrees(src, n)
        nondangling = outdeg != 0
    if teleport is not None:
        t = np.asarray(teleport, dtype=np.float64)
        pr = t.copy()
        dangling_pr = float(t[~nondangling].sum())
    else:
        pr = np.full(n, 1.0 / n, dtype=np.float64)
        dangling_pr = float(np.sum(~nondangling)) / n  # initial mass
    d = damping
    errs: list[float] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        if weights is not None:
            # per-vertex ratio FIRST, then per-edge multiply — the same
            # association as the CSR engine and the SQL oracle
            contrib = (pr / wdiv)[src] * w
        else:
            contrib = pr[src] / outdeg[src]
        gathered = np.bincount(dst, weights=contrib, minlength=n)
        if teleport is not None:
            new_pr = (1.0 - d) * t + d * gathered + d * dangling_pr * t
        else:
            new_pr = (1.0 - d) / n + d * gathered + d * dangling_pr / n
        err = float(np.sum(np.abs(new_pr[nondangling] - pr[nondangling])))
        pr = np.where(nondangling, new_pr, pr)
        dangling_pr = 1.0 - float(np.sum(pr[nondangling]))
        errs.append(err)
        if err <= threshold:
            break
    # Dangling restore: same formula, dangling vertices only, using the
    # post-loop dangling mass.
    if weights is not None:
        contrib = (pr / wdiv)[src] * w
    else:
        contrib = pr[src] / outdeg[src]
    gathered = np.bincount(dst, weights=contrib, minlength=n)
    if teleport is not None:
        restored = (1.0 - d) * t + d * gathered + d * dangling_pr * t
    else:
        restored = (1.0 - d) / n + d * gathered + d * dangling_pr / n
    pr = np.where(nondangling, pr, restored)
    return pr, rounds, errs


def hits(src: np.ndarray, dst: np.ndarray, n: int,
         threshold: float = 1e-9, max_rounds: int = 100):
    """HITS hubs & authorities (Kleinberg 1999), synchronous power
    iteration with L2 normalization after each half-step; hub init = 1.
    Returns ``(auth, hub, rounds, errs)`` with err = L1 delta of both
    vectors per round."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    hub = np.ones(n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    errs: list[float] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        raw_a = np.bincount(dst, weights=hub[src], minlength=n)
        na = float(np.sqrt(np.sum(raw_a * raw_a)))
        new_auth = raw_a / na if na > 0 else raw_a
        raw_h = np.bincount(src, weights=new_auth[dst], minlength=n)
        nh = float(np.sqrt(np.sum(raw_h * raw_h)))
        new_hub = raw_h / nh if nh > 0 else raw_h
        errs.append(float(np.sum(np.abs(new_auth - auth)))
                    + float(np.sum(np.abs(new_hub - hub))))
        auth, hub = new_auth, new_hub
        if errs[-1] <= threshold:
            break
    return auth, hub, rounds, errs


def salsa(src: np.ndarray, dst: np.ndarray, n: int,
          threshold: float = 1e-9, max_rounds: int = 100):
    """SALSA (Lempel & Moran 2000): HITS with degree-normalized sends
    and L1 normalization — the alternating random walk on the
    bipartite hub/authority graph.  hub init = 1/N.  Returns
    ``(auth, hub, rounds, errs)``, err = L1 delta per round."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    od = np.bincount(src, minlength=n).astype(np.float64)
    ind = np.bincount(dst, minlength=n).astype(np.float64)
    hub = np.full(n, 1.0 / n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    errs: list[float] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        send = np.divide(hub, od, out=np.zeros(n), where=od > 0)
        raw_a = np.bincount(dst, weights=send[src], minlength=n)
        na = float(np.sum(raw_a))
        new_auth = raw_a / na if na > 0 else raw_a
        send = np.divide(new_auth, ind, out=np.zeros(n), where=ind > 0)
        raw_h = np.bincount(src, weights=send[dst], minlength=n)
        nh = float(np.sum(raw_h))
        new_hub = raw_h / nh if nh > 0 else raw_h
        errs.append(float(np.sum(np.abs(new_auth - auth)))
                    + float(np.sum(np.abs(new_hub - hub))))
        auth, hub = new_auth, new_hub
        if errs[-1] <= threshold:
            break
    return auth, hub, rounds, errs


def connected_components(src: np.ndarray, dst: np.ndarray, n: int,
                         max_rounds: int = 10_000) -> np.ndarray:
    """Hash-min label exchange on the *undirected* edge set; labels
    canonicalize to the minimum member vertex id.  Exact-match contract
    (north_rule)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_rounds):
        # candidate = min over incoming neighbor labels (plus own)
        cand = labels.copy()
        np.minimum.at(cand, v, labels[u])
        if np.array_equal(cand, labels):
            break
        labels = cand
    return labels


def label_propagation(src: np.ndarray, dst: np.ndarray, n: int,
                      rounds: int = 10) -> np.ndarray:
    """Synchronous label propagation on the undirected edge set:
    per round every vertex with >=1 neighbor takes the *mode* of its
    neighbors' labels, ties broken by the lowest label (deterministic).
    Fixed round cap; exact-match contract."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    labels = np.arange(n, dtype=np.int64)
    for _ in range(rounds):
        new_labels = labels.copy()
        if len(u):
            neigh = labels[u]
            # count (receiver, neighbor_label) pairs; mode w/ min tie-break
            order = np.lexsort((neigh, v))
            rv, rl = v[order], neigh[order]
            grp = np.flatnonzero(np.r_[True, (rv[1:] != rv[:-1]) | (rl[1:] != rl[:-1])])
            counts = np.diff(np.r_[grp, len(rv)])
            gv, gl = rv[grp], rl[grp]
            # per receiver pick label with max count, then min label:
            # lexsort makes gl ascending within gv, so stable argmax on
            # counts gives the lowest label among maxima.
            best = {}
            for a, b, c in zip(gv, gl, counts):
                cur = best.get(a)
                if cur is None or c > cur[1]:
                    best[a] = (b, c)
            for a, (b, _) in best.items():
                new_labels[a] = b
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    return labels


def core_numbers(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Exact core number per vertex of the undirected simple graph
    underlying ``(src, dst)`` — textbook min-degree peeling (Batagelj &
    Zaveršnik, "An O(m) Algorithm for Cores Decomposition of
    Networks"), vectorized in waves: repeatedly remove every vertex
    whose remaining degree is <= the current peel level k; a removed
    vertex's core number is k.  Deliberately a DIFFERENT algorithm from
    the engine's distributed h-index iteration, so agreement is a real
    cross-check, not a reimplementation."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    keep = src != dst
    a = np.concatenate([src[keep], dst[keep]])
    b = np.concatenate([dst[keep], src[keep]])
    # simple graph: dedup directed pairs of the symmetrized multiset
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    if len(a):
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        a, b = a[first], b[first]
    deg = np.bincount(a, minlength=n).astype(np.int64)
    core = np.zeros(n, dtype=np.int64)
    alive_v = np.ones(n, dtype=bool)
    alive_e = np.ones(len(a), dtype=bool)
    k = 0
    while alive_v.any():
        k = max(k, int(deg[alive_v].min()))
        while True:
            rem = alive_v & (deg <= k)
            if not rem.any():
                break
            core[rem] = k
            alive_v[rem] = False
            em = alive_e & rem[a]
            if em.any():
                deg -= np.bincount(b[em], minlength=n)
                alive_e[em] = False
            # (deg of dead vertices may go stale/negative — never read)
    return core


def triangle_count(src: np.ndarray, dst: np.ndarray, n: int) -> int:
    """Exact triangle count of the undirected simple graph underlying
    ``(src, dst)`` (direction dropped, self-loops and duplicates
    removed): dense adjacency trace method — fine for oracle scales."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    keep = src != dst
    a, b = src[keep], dst[keep]
    adj = np.zeros((n, n), dtype=np.int8)
    adj[a, b] = 1
    adj[b, a] = 1
    a2 = (adj.astype(np.int64) @ adj.astype(np.int64))
    return int((a2 * adj).sum() // 6)


def strongly_connected_components(src: np.ndarray, dst: np.ndarray,
                                  n: int) -> np.ndarray:
    """Per-vertex SCC id = minimum member of the SCC.  Iterative
    Tarjan (explicit stack — no recursion limit), then remap each
    component to its minimum vertex id so the labeling is canonical
    and engine-comparable."""
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    indptr = np.searchsorted(s, np.arange(n + 1))
    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    counter = 0
    ncomp = 0
    for root in range(n):
        if index[root] != -1:
            continue
        # (vertex, next-edge-offset) work stack
        work = [(root, indptr[root])]
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            v, ei = work[-1]
            if ei < indptr[v + 1]:
                work[-1] = (v, ei + 1)
                w = int(d[ei])
                if index[w] == -1:
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    on_stack[w] = True
                    work.append((w, int(indptr[w])))
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            else:
                work.pop()
                if work:
                    pv = work[-1][0]
                    low[pv] = min(low[pv], low[v])
                if low[v] == index[v]:
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        comp[w] = ncomp
                        if w == v:
                            break
                    ncomp += 1
    # canonical id = min member
    mins = np.full(ncomp, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(mins, comp, np.arange(n, dtype=np.int64))
    return mins[comp]

def _hyperball_replay(src: np.ndarray, dst: np.ndarray, n: int,
                      depth: int, num_registers: int, seed: int):
    """Shared sequential register evolution behind the HyperBall
    oracles (``hyperball_harmonic`` / ``hyperball_nf``): the engine's
    exact ``hll_seed`` splitmix64 seeding and per-round register
    max-merge along OUT-edges (caller passes ORIGINAL src/dst; the
    engine runs on reversed edges, which gathers the same direction).
    Yields (d, regs, changed) for d = 0 (seeded state, changed = -1)
    then each round 1..depth, stopping AFTER the first changed == 0
    round — one definition of the register contract for every oracle,
    mirroring ``LabelCSR`` bit-for-bit."""
    from ..stages.sampling import sample_hash

    R = num_registers
    ids = np.arange(n, dtype=np.int64)
    h = sample_hash(ids, seed)
    bucket = (h % np.uint64(R)).astype(np.int64)
    x = h // np.uint64(R)
    low = x & (~x + np.uint64(1))
    maxrho = 64 - int(np.log2(R)) + 1
    rho = np.where(
        x == 0, maxrho,
        np.log2(np.maximum(low, 1).astype(np.float64)).astype(np.int64)
        + 1).astype(np.uint8)
    regs = np.zeros((n, R), dtype=np.uint8)
    regs[ids, bucket] = rho

    # one sorted out-edge view: for orig edge (s, d), B(s) merges B(d)
    order = np.argsort(src, kind="stable")
    s_sorted, d_sorted = src[order], dst[order]
    bd = np.flatnonzero(np.r_[True, s_sorted[1:] != s_sorted[:-1]]) \
        if len(s_sorted) else np.array([], dtype=np.int64)
    tgt = s_sorted[bd] if len(s_sorted) else s_sorted

    yield 0, regs, -1
    for d in range(1, depth + 1):
        new = regs.copy()
        if len(tgt):
            merged = np.maximum.reduceat(regs[d_sorted], bd, axis=0)
            new[tgt] = np.maximum(new[tgt], merged)
        changed = int(np.count_nonzero(np.any(new != regs, axis=1)))
        regs = new
        yield d, regs, changed
        if changed == 0:
            break


def hyperball_harmonic(src: np.ndarray, dst: np.ndarray, n: int,
                       depth: int, num_registers: int,
                       seed: int) -> np.ndarray:
    """Sequential single-batch replay of ``LabelCSR.harmonic_centrality``
    (HyperBall harmonic estimates, Boldi & Vigna 2013/2014): the same
    register evolution (``_hyperball_replay``), the same shard-local
    HLL estimate (``_ball_est_dense``, reused — the registers
    themselves are SQL-oracled by ``hyperball_registers``) and the
    same (|B(v,d)| - |B(v,d-1)|) / d accumulation — all row-local
    float64 ops in identical order, so the distributed run must match
    BIT-FOR-BIT; a hash match proves partition- and execution-order-
    independence of the register exchange."""
    from ..pipelines.labels_csr import _ball_est_dense

    hc = np.zeros(n, dtype=np.float64)
    prev = None
    for d, regs, changed in _hyperball_replay(src, dst, n, depth,
                                              num_registers, seed):
        cur = _ball_est_dense(regs)
        if d > 0:
            hc += (cur - prev) / float(d)
        prev = cur
    return hc


def hyperball_lin(src: np.ndarray, dst: np.ndarray, n: int,
                  depth: int, num_registers: int,
                  seed: int) -> tuple:
    """Sequential single-batch replay of ``LabelCSR.lin_centrality``
    (HyperBall Lin's-index inputs, Boldi & Vigna 2014): the shared
    register evolution, the same per-depth delta accumulation
    sd += (|B(v,d)| - |B(v,d-1)|) * d and the final reachable-ball
    estimate — all row-local float64 in identical order, so the
    distributed run must match BIT-FOR-BIT.  Returns (sumdist [n],
    reach [n])."""
    from ..pipelines.labels_csr import _ball_est_dense

    sd = np.zeros(n, dtype=np.float64)
    prev = None
    for d, regs, changed in _hyperball_replay(src, dst, n, depth,
                                              num_registers, seed):
        cur = _ball_est_dense(regs)
        if d > 0:
            sd += (cur - prev) * float(d)
        prev = cur
    return sd, prev


def hyperball_nf(src: np.ndarray, dst: np.ndarray, n: int,
                 depth: int, num_registers: int,
                 seed: int) -> tuple:
    """Sequential replay of ``LabelCSR.neighborhood_function``
    (HyperANF, Boldi, Rosa & Vigna 2011): the shared register
    evolution with per-depth integer-micro-quantized estimate sums —
    exact Python-int sums (``int_sum_exact``, the engine's helper) are
    order-free, so the full-array sum here equals the engine's
    shard-partial + driver sum exactly at ANY scale (a wrapping int64
    sum would break that, and wrap differently per partitioning).
    Returns (nf_micro list for depth 0..rounds, rounds)."""
    from ..pipelines.labels_csr import _ball_est_dense, int_sum_exact

    nf, rounds = [], 0
    for d, regs, changed in _hyperball_replay(src, dst, n, depth,
                                              num_registers, seed):
        nf.append(int_sum_exact(
            (_ball_est_dense(regs) * 1e6).astype(np.int64)))
        rounds = d
    return nf, rounds
