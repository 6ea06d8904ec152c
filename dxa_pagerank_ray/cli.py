"""CLI driver — the ``ray job submit`` entry point (north_rule).

The reference's single entry point is ``MainPR.main`` with positional
args (``MainPR.java:38-49``); here each algorithm is a subcommand over
a pages-Parquet (or edges-Parquet) input:

    ray job submit -- python -m dxa_pagerank_ray pagerank \
        --pages /data/pages --out /out/run1 --partitions 64 \
        --checkpoint-dir /out/run1/ckpt --checkpoint-every 5 [--resume]

Outputs under ``--out``:

    ranks/part=*.parquet   (or labels/ for cc/labelprop)  — partitioned
    statistics.json        — the modernized ``statistics.out``
                             (``PrStatisticsJob.java:66-91``): config,
                             INPUT_TIME / EXECUTION_TIME split, and the
                             per-round  Round/Error/Time table

This module owns ``ray.init`` (guarded) — the library never does.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import pyarrow as pa


def _statistics(out_dir: str, fields: dict, rounds_table=None) -> None:
    stats = dict(fields)
    if rounds_table is not None:
        stats["rounds_table"] = rounds_table
    with open(os.path.join(out_dir, "statistics.json"), "w") as f:
        json.dump(stats, f, indent=2)


def _load_graph(args):
    """pages-Parquet -> link graph, or a prebuilt edges-Parquet."""
    import ray.data as rd

    from .pipelines.graph_build import build_link_graph

    t0 = time.perf_counter()
    if args.pages or getattr(args, "warc", None):
        if args.pages:
            # prune at the read: the link-graph build consumes only
            # (url, html) — pulling text/lang/warc_ts too would roughly
            # double the scan I/O at corpus scale
            pages = rd.read_parquet(args.pages, columns=["url", "html"])
        else:
            from .sources.warc import read_warc_pages

            # materialize BEFORE any engine exists (1-CPU shard pools
            # can hold every cluster CPU; a lazy upstream deadlocks)
            pages = read_warc_pages(args.warc).materialize()
        g = build_link_graph(pages, num_partitions=args.partitions)
        edges, n = g.edges, g.num_vertices
        url_ids = g.url_ids
    else:
        edges = rd.read_parquet(args.edges).materialize()
        n = args.num_vertices
        if n is None:
            mx = -1
            for b in edges.iter_batches(batch_size=1 << 20,
                                        batch_format="pyarrow"):
                if b.num_rows:
                    mx = max(mx,
                             int(pa.compute.max(b["src"]).as_py()),
                             int(pa.compute.max(b["dst"]).as_py()))
            n = mx + 1
        url_ids = None
    return edges, n, url_ids, time.perf_counter() - t0


def _edges_meta(path: str | None) -> dict | None:
    """The _edges_meta.json of a ``write_edges_partitioned`` layout,
    or None for a plain edges dir / non-edges input."""
    if not path:
        return None
    mf = os.path.join(path, "_edges_meta.json")
    return json.load(open(mf)) if os.path.exists(mf) else None


def cmd_pagerank(args) -> None:
    from .pipelines.pagerank_csr import PageRankCSR

    meta = _edges_meta(getattr(args, "edges", None))
    if meta is not None and meta["num_partitions"] == args.partitions:
        # partitioned layout: skip the Dataset load + routing fan-out
        # entirely — each shard actor reads its own part=p dirs (the
        # idempotent per-shard load)
        edges, n, url_ids = None, meta["num_vertices"], None
        edges_path, input_time = args.edges, 0.0
    else:
        edges, n, url_ids, input_time = _load_graph(args)
        edges_path = None
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    eng = PageRankCSR(edges, n, num_partitions=args.partitions,
                      damping=args.damping,
                      weighted=getattr(args, "weighted", False),
                      edges_path=edges_path)
    if getattr(args, "seeds", None):
        eng.personalize([int(s) for s in args.seeds.split(",")])
    res = eng.run(threshold=args.threshold, max_rounds=args.max_rounds,
                  checkpoint_dir=args.checkpoint_dir,
                  checkpoint_every=args.checkpoint_every,
                  resume=args.resume, collect_state=False)
    num_edges = eng.num_edges
    # shards write their own partitions (K1 sink); the dense rank
    # vector never touches the driver
    eng.write_ranks(os.path.join(args.out, "ranks"), fmt=args.format)
    eng.shutdown()  # release actor CPUs before the Ray Data writes below
    exec_time = time.perf_counter() - t0
    if url_ids is not None:
        url_ids.write_parquet(os.path.join(args.out, "url_ids"))
    _statistics(
        args.out,
        {
            "ALGORITHM": "pagerank",
            "NUM_PARTITIONS": args.partitions,
            "NUM_VERTICES": n,
            "NUM_EDGES": num_edges,
            "DAMPING_FACTOR": args.damping,
            "ERROR_THRESHOLD": args.threshold,
            "NUM_ROUNDS": res.rounds,
            "CONVERGED": res.converged,
            "RESUMED_FROM": res.resumed_from,
            "INPUT_TIME_S": round(input_time, 3),
            "EXECUTION_TIME_S": round(exec_time, 3),
        },
        [{"round": i + 1, "error": e, "seconds": round(s, 4)}
         for i, (e, s) in enumerate(zip(res.errs, res.round_seconds))],
    )
    print(json.dumps({"out": args.out, "rounds": res.rounds,
                      "converged": res.converged,
                      "execution_time_s": round(exec_time, 3)}))


def _run_label_alg(args, alg: str) -> None:
    from .pipelines.labels_csr import LabelCSR
    from .pipelines.superstep import simple_undirect, undirect

    edges, n, _, input_time = _load_graph(args)
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    # k-core requires the SIMPLE symmetrized graph (no self-loops/dups)
    und = (simple_undirect(edges) if alg == "core_decomposition"
           else undirect(edges))
    eng = LabelCSR(und, n, num_partitions=args.partitions)
    kw = dict(checkpoint_dir=args.checkpoint_dir,
              checkpoint_every=args.checkpoint_every, resume=args.resume,
              collect_state=False)
    if alg == "connected_components":
        res = eng.connected_components(max_rounds=args.max_rounds, **kw)
    elif alg == "core_decomposition":
        res = eng.core_decomposition(max_rounds=args.max_rounds, **kw)
    else:
        res = eng.label_propagation(rounds=args.max_rounds, **kw)
    labs, _sizes = eng.label_sizes()
    eng.write_labels(os.path.join(args.out, "labels"))
    eng.shutdown()
    exec_time = time.perf_counter() - t0
    _statistics(args.out, {
        "ALGORITHM": alg, "NUM_VERTICES": n,
        "NUM_LABELS": int(len(labs)),
        "NUM_ROUNDS": res.rounds,
        "INPUT_TIME_S": round(input_time, 3),
        "EXECUTION_TIME_S": round(exec_time, 3),
        "CHANGED_PER_ROUND": res.changed_per_round,
    })
    print(json.dumps({"out": args.out, "rounds": res.rounds,
                      "num_labels": int(len(labs))}))


def cmd_components(args) -> None:
    _run_label_alg(args, "connected_components")


def cmd_labelprop(args) -> None:
    _run_label_alg(args, "label_propagation")


def cmd_scc(args) -> None:
    """Strongly connected components over the DIRECTED edge set
    (forward-backward coloring with trim); per-partition (v, label=
    scc id) Parquet under labels/."""
    from .pipelines.labels_csr import LabelCSR

    edges, n, _, input_time = _load_graph(args)
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    eng = LabelCSR(edges, n, num_partitions=args.partitions)
    res = eng.strongly_connected_components(
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, resume=args.resume,
        collect_state=False)
    labs, _sizes = eng.label_sizes()
    eng.write_labels(os.path.join(args.out, "labels"))
    eng.shutdown()
    exec_time = time.perf_counter() - t0
    _statistics(args.out, {
        "ALGORITHM": "strongly_connected_components", "NUM_VERTICES": n,
        "NUM_LABELS": int(len(labs)),
        "NUM_OUTER_ROUNDS": res.rounds,
        "INPUT_TIME_S": round(input_time, 3),
        "EXECUTION_TIME_S": round(exec_time, 3),
        "ASSIGNED_PER_ROUND": res.changed_per_round,
    })
    print(json.dumps({"out": args.out, "rounds": res.rounds,
                      "num_labels": int(len(labs))}))


def cmd_kcore(args) -> None:
    _run_label_alg(args, "core_decomposition")


def cmd_bfs(args) -> None:
    """Multi-source depth-bounded BFS (crawl depth) over the DIRECTED
    edge set; per-partition (v, label=distance) Parquet, sentinel
    NUM_VERTICES for vertices unreached within --max-depth."""
    from .pipelines.labels_csr import LabelCSR

    edges, n, _, input_time = _load_graph(args)
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    eng = LabelCSR(edges, n, num_partitions=args.partitions)
    res = eng.bfs_distances(
        [int(s) for s in args.seeds.split(",")], max_depth=args.max_depth,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, resume=args.resume,
        collect_state=False)
    eng.write_labels(os.path.join(args.out, "depths"))
    eng.shutdown()
    exec_time = time.perf_counter() - t0
    _statistics(args.out, {
        "ALGORITHM": "bfs_distances", "NUM_VERTICES": n,
        "MAX_DEPTH": args.max_depth, "NUM_ROUNDS": res.rounds,
        "INPUT_TIME_S": round(input_time, 3),
        "EXECUTION_TIME_S": round(exec_time, 3),
        "CHANGED_PER_ROUND": res.changed_per_round,
    })
    print(json.dumps({"out": args.out, "rounds": res.rounds}))


def cmd_stats(args) -> None:
    """Whole-graph crawl diagnostics in one pass over the edge set:
    vertex/edge counts, out-degree histogram (Parquet), degree
    assortativity (integer moments + the float coefficient) and edge
    reciprocity — the numbers you look at before running anything
    iterative on a new crawl."""
    from .pipelines.graph_build import out_degree_table
    from .pipelines.graph_stats import (
        assortativity_from_moments,
        degree_moment_sums,
        reciprocity_counts,
    )

    edges, n, _, input_time = _load_graph(args)
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    od = out_degree_table(edges)
    od.write_parquet(os.path.join(args.out, "out_degrees"))
    moments = degree_moment_sums(edges)
    recip = reciprocity_counts(edges)
    exec_time = time.perf_counter() - t0
    n_edges = int(recip["n_edges"][0].as_py())
    _statistics(args.out, {
        "ALGORITHM": "graph_stats", "NUM_VERTICES": n,
        "NUM_EDGES": n_edges,
        "ASSORTATIVITY_MOMENTS": {
            c: int(moments[c][0].as_py()) for c in moments.column_names},
        "DEGREE_ASSORTATIVITY": assortativity_from_moments(moments),
        "N_RECIPROCAL_EDGES": int(recip["n_reciprocal"][0].as_py()),
        "RECIPROCITY": (int(recip["n_reciprocal"][0].as_py()) / n_edges
                        if n_edges else 0.0),
        "INPUT_TIME_S": round(input_time, 3),
        "EXECUTION_TIME_S": round(exec_time, 3),
    })
    print(json.dumps({"out": args.out, "num_edges": n_edges,
                      "assortativity": assortativity_from_moments(moments)}))


def cmd_hyperball(args) -> None:
    """HyperBall out-ball sketches: per-shard Parquet registers plus
    per-vertex ball-size estimates; engine runs on the reversed edge
    set (out-balls merge out-neighbors' balls)."""
    import numpy as np
    import pyarrow.parquet as pq

    from .pipelines.labels_csr import LabelCSR, hll_estimates

    edges, n, _, input_time = _load_graph(args)
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["dst"], "dst": b["src"]})

    rev_ds = edges.map_batches(rev, batch_format="pyarrow").materialize()
    eng = LabelCSR(rev_ds, n, num_partitions=args.partitions)
    # ONE register run serves both sinks: harmonic_centrality converges
    # the same register state hyperball() would (it accumulates the
    # per-depth deltas in-loop), so --harmonic no longer re-runs the
    # whole depth-bounded superstep loop a second time
    if args.harmonic:
        hc, rounds, hist = eng.harmonic_centrality(
            depth=args.depth, num_registers=args.registers,
            seed=args.hll_seed)
        t = eng.emit_registers()
        pq.write_table(
            pa.table({"v": pa.array(np.arange(n, dtype=np.int64),
                                    pa.int64()),
                      "harmonic_est": pa.array(hc, pa.float64())}),
            os.path.join(args.out, "harmonic_estimates.parquet"))
    else:
        t, rounds, hist = eng.hyperball(depth=args.depth,
                                        num_registers=args.registers,
                                        seed=args.hll_seed)
    eng.write_hyperball(os.path.join(args.out, "registers"))
    eng.shutdown()
    est = hll_estimates(t, n, args.registers)
    pq.write_table(
        pa.table({"v": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                  "ball_est": pa.array(est, pa.float64())}),
        os.path.join(args.out, "ball_estimates.parquet"))
    exec_time = time.perf_counter() - t0
    _statistics(args.out, {
        "ALGORITHM": "hyperball", "NUM_VERTICES": n,
        "DEPTH": args.depth, "NUM_REGISTERS": args.registers,
        "NUM_ROUNDS": rounds, "CHANGED_PER_ROUND": hist,
        "NEIGHBORHOOD_FUNCTION_EST": float(est.sum()),
        "INPUT_TIME_S": round(input_time, 3),
        "EXECUTION_TIME_S": round(exec_time, 3),
    })
    print(json.dumps({"out": args.out, "rounds": rounds,
                      "mean_ball_est": round(float(est.mean()), 2)}))


def cmd_walks(args) -> None:
    """Deterministic random-walk corpus (DeepWalk-style) — walks of
    --length from every --stride'th vertex, per-shard Parquet logs."""
    import numpy as np

    from .pipelines.walks import WalkCSR

    edges, n, _, input_time = _load_graph(args)
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    eng = WalkCSR(edges, n, num_partitions=args.partitions,
                  seed=args.walk_seed, weighted=args.weighted)
    seeds = np.arange(0, n, args.stride, dtype=np.int64)
    eng.run(seeds, length=args.length)
    files = eng.write_logs(os.path.join(args.out, "walks"))
    eng.shutdown()
    exec_time = time.perf_counter() - t0
    _statistics(args.out, {
        "ALGORITHM": "random_walks", "NUM_VERTICES": n,
        "NUM_WALKS": int(len(seeds)), "WALK_LENGTH": args.length,
        "INPUT_TIME_S": round(input_time, 3),
        "EXECUTION_TIME_S": round(exec_time, 3),
    })
    print(json.dumps({"out": args.out, "walks": int(len(seeds)),
                      "files": len(files)}))


def cmd_hits(args) -> None:
    from .pipelines.hits_csr import HitsCSR

    edges, n, _, input_time = _load_graph(args)
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    eng = HitsCSR(edges, n, num_partitions=args.partitions)
    run = eng.run_salsa if args.salsa else eng.run
    res = run(threshold=args.threshold, max_rounds=args.max_rounds,
              collect_state=False)
    eng.write_scores(os.path.join(args.out, "scores"))
    eng.shutdown()
    exec_time = time.perf_counter() - t0
    _statistics(args.out, {
        "ALGORITHM": "salsa" if args.salsa else "hits", "NUM_VERTICES": n,
        "NUM_ROUNDS": res.rounds, "CONVERGED": res.converged,
        "INPUT_TIME_S": round(input_time, 3),
        "EXECUTION_TIME_S": round(exec_time, 3),
        "ERR_PER_ROUND": res.errs,
    })
    print(json.dumps({"out": args.out, "rounds": res.rounds,
                      "converged": res.converged}))


def cmd_triangles(args) -> None:
    from .pipelines.triangles import triangle_count

    edges, n, _, input_time = _load_graph(args)
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    count = triangle_count(edges, n)
    exec_time = time.perf_counter() - t0
    _statistics(args.out, {
        "ALGORITHM": "triangle_count", "NUM_VERTICES": n,
        "NUM_TRIANGLES": int(count),
        "INPUT_TIME_S": round(input_time, 3),
        "EXECUTION_TIME_S": round(exec_time, 3),
    })
    print(json.dumps({"out": args.out, "triangles": int(count)}))


def cmd_dedup(args) -> None:
    """Training-data dedup over a documents Parquet (doc_id, text):
    exact keepers or near-dup pairs, written as partitioned Parquet."""
    from .context import read_parquet_clean

    docs = read_parquet_clean(args.docs, columns=["doc_id", "text"])
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    if args.method == "exact":
        from .stages.dedup import exact_dedup_keepers

        res, name = exact_dedup_keepers(docs), "keepers"
    elif args.method == "minhash":
        from .stages.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
            verify_pairs_by_signature,
        )

        sigs = minhash_signatures(docs, num_perm=args.num_perm).materialize()
        pairs = lsh_candidate_pairs(sigs, num_perm=args.num_perm,
                                    bands=args.bands)
        res = verify_pairs_by_signature(pairs, sigs,
                                        threshold=args.threshold,
                                        num_perm=args.num_perm)
        name = "pairs"
    elif args.method == "simhash":
        from .stages.dedup import simhash_near_dups

        res = simhash_near_dups(docs, max_hamming=args.max_hamming)
        name = "pairs"
    elif args.method == "cluster":
        # minhash pairs -> connected-component keepers (one row per doc)
        from .stages.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
            near_dup_clusters,
            verify_pairs_by_signature,
        )

        n_docs = docs.count()
        sigs = minhash_signatures(docs, num_perm=args.num_perm).materialize()
        pairs = lsh_candidate_pairs(sigs, num_perm=args.num_perm,
                                    bands=args.bands)
        verified = verify_pairs_by_signature(pairs, sigs,
                                             threshold=args.threshold,
                                             num_perm=args.num_perm)
        res, name = near_dup_clusters(verified, n_docs), "clusters"
    else:  # jaccard
        from .stages.dedup import jaccard_verified_pairs

        res = jaccard_verified_pairs(docs, threshold=args.threshold)
        name = "pairs"
    dest = os.path.join(args.out, name)
    import shutil

    shutil.rmtree(dest, ignore_errors=True)
    if isinstance(res, pa.Table):
        import ray.data as rd

        res = rd.from_arrow(res)
    res.write_parquet(dest)
    n = sum(f.metadata.num_rows for f in _pq_files(dest))
    exec_time = time.perf_counter() - t0
    _statistics(args.out, {
        "ALGORITHM": f"dedup_{args.method}", "ROWS": n,
        "EXECUTION_TIME_S": round(exec_time, 3),
    })
    print(json.dumps({"out": args.out, "method": args.method, "rows": n}))


def cmd_ann(args) -> None:
    """Cosine top-k over an embeddings Parquet (vec_id, embedding):
    query vectors are the rows named by --query-ids."""
    import numpy as np

    from .context import read_parquet_clean
    from .stages import ann

    emb = read_parquet_clean(args.embeddings,
                             columns=["vec_id", "embedding"])
    qids = np.array([int(x) for x in args.query_ids.split(",")],
                    dtype=np.int64)
    import pyarrow.parquet as pq_mod

    t = pq_mod.read_table(args.embeddings, columns=["vec_id", "embedding"])
    mask = np.isin(t["vec_id"].to_numpy(zero_copy_only=False), qids)
    sel = t.filter(pa.array(mask))
    order = np.argsort(sel["vec_id"].to_numpy(zero_copy_only=False))
    q = ann._to_matrix(sel["embedding"])[order]
    ids = sel["vec_id"].to_numpy(zero_copy_only=False)[order]
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    fn = {"brute": ann.brute_force_topk, "lsh": ann.lsh_topk,
          "ivf": ann.ivf_topk}[args.method]
    res = fn(emb, q, ids, k=args.k)
    exec_time = time.perf_counter() - t0
    import pyarrow.parquet as pqw

    pqw.write_table(res, os.path.join(args.out, "neighbors.parquet"))
    _statistics(args.out, {
        "ALGORITHM": f"ann_{args.method}", "K": args.k,
        "NUM_QUERIES": len(ids), "ROWS": res.num_rows,
        "EXECUTION_TIME_S": round(exec_time, 3),
    })
    print(json.dumps({"out": args.out, "method": args.method,
                      "rows": res.num_rows}))


def cmd_textops(args) -> None:
    """Text-analysis sweep over a documents Parquet: one partitioned
    Parquet output per requested op."""
    from .context import read_parquet_clean
    from .stages import textops

    ops = args.ops.split(",")
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    counts = {}
    import shutil

    for op in ops:
        docs = read_parquet_clean(args.docs, columns=["doc_id", "text"])
        if op == "tokens":
            res = textops.token_counts(docs)
        elif op == "quality":
            res = textops.quality_scores(docs)
        elif op == "lang":
            res = textops.lang_id(docs).select_columns(
                ["doc_id", "lang_pred"])
        elif op == "fingerprint":
            res = textops.fingerprints(docs)
        elif op == "terms":
            import ray.data as rd

            res = rd.from_arrow(textops.top_terms(docs, k=args.top_k))
        elif op == "pii":
            res = textops.pii_scrub(docs)
        elif op == "ttr":
            res = textops.ttr_scores(docs)
        elif op == "repetition":
            res = textops.repetition_scores(docs)
        elif op == "normalize":
            res = textops.normalize_text(docs)
        elif op == "bpe":
            res = textops.bpe_token_counts(docs)
        elif op == "paradedup":
            from .stages.paradedup import paragraph_dedup

            res = paragraph_dedup(docs)
        else:
            raise SystemExit(f"unknown op {op!r}")
        dest = os.path.join(args.out, op)
        shutil.rmtree(dest, ignore_errors=True)
        res.write_parquet(dest)
        counts[op] = sum(f.metadata.num_rows for f in _pq_files(dest))
    exec_time = time.perf_counter() - t0
    _statistics(args.out, {
        "ALGORITHM": "textops", "OPS": ops, "ROWS": counts,
        "EXECUTION_TIME_S": round(exec_time, 3),
    })
    print(json.dumps({"out": args.out, "rows": counts}))


def _pq_files(d: str):
    import pyarrow.parquet as pq_mod

    for f in sorted(os.listdir(d)):
        if f.endswith(".parquet"):
            yield pq_mod.ParquetFile(os.path.join(d, f))


def cmd_partition_edges(args) -> None:
    """Write the edge list in the ``write_edges_partitioned`` layout
    (hive part=p dirs + meta manifest) — the idempotent per-shard load
    for ``pagerank --edges <out>`` at the same --partitions."""
    from .pipelines.pagerank_csr import write_edges_partitioned

    edges, n, _, input_time = _load_graph(args)
    write_edges_partitioned(edges, args.out, n,
                            num_partitions=args.partitions)
    print(json.dumps({"out": args.out, "num_vertices": n,
                      "num_partitions": args.partitions,
                      "input_time_s": round(input_time, 3)}))


def cmd_canonicalize(args) -> None:
    """URL canonicalization over a pages (or any url-column) Parquet:
    writes ``(url, canonical_url)`` partitioned Parquet — the pre-dedup
    normalization pass (``functions/urls.py`` shared RE2 rule list).
    Stateless vectorized map; only the url column leaves storage."""
    import shutil

    from .context import read_parquet_clean
    from .functions.urls import canonicalize_urls

    t0 = time.perf_counter()
    ds = read_parquet_clean(args.pages, columns=[args.column])

    def canon(b):
        u = b[args.column].combine_chunks()
        return pa.table({args.column: u,
                         "canonical_url": canonicalize_urls(u)})

    # clear only OUR named subdir (the repo-wide CLI contract — an
    # --out pointing at a directory with other runs' outputs must
    # never be wiped wholesale)
    dest = os.path.join(args.out, "canonical")
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    res = ds.map_batches(canon, batch_format="pyarrow")
    res.write_parquet(dest)
    rows = sum(f.metadata.num_rows for f in _pq_files(dest))
    print(json.dumps({"out": dest, "rows": rows,
                      "execution_time_s":
                          round(time.perf_counter() - t0, 3)}))


def cmd_synth_pages(args) -> None:
    from .sources.pages import write_pages_parquet

    write_pages_parquet(args.out, args.n, seed=args.seed,
                        override_num_blocks=args.partitions)
    print(json.dumps({"out": args.out, "n_pages": args.n}))


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="dxa_pagerank_ray",
        description="Ray-Data-native link-graph analytics engine",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add_common(p, graph=True):
        if graph:
            src = p.add_mutually_exclusive_group(required=True)
            src.add_argument("--pages", help="pages Parquet dir "
                             "(url, warc_ts, html, text, lang)")
            src.add_argument("--warc", help="WARC file/dir "
                             "(Common-Crawl response records)")
            src.add_argument("--edges", help="prebuilt edges Parquet dir "
                             "(src, dst int64)")
            p.add_argument("--num-vertices", type=int, default=None,
                           help="with --edges: vertex count "
                           "(default: max id + 1)")
            p.add_argument("--max-rounds", type=int, default=100)
            p.add_argument("--checkpoint-dir", default=None)
            p.add_argument("--checkpoint-every", type=int, default=0)
            p.add_argument("--resume", action="store_true")
        p.add_argument("--out", required=True)
        p.add_argument("--partitions", type=int, default=8)

    p = sub.add_parser("pagerank", help="lump PageRank (CSR actor engine)")
    add_common(p)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--threshold", type=float, default=1e-6)
    p.add_argument("--weighted", action="store_true",
                   help="with --edges: distribute contributions by the "
                   "per-edge 'w' column (PR(u)*w/W(u))")
    p.add_argument("--seeds", default=None,
                   help="personalized PageRank: comma-separated seed "
                   "vertex ids (teleport uniform over the set)")
    p.add_argument("--format", choices=["parquet", "text"],
                   default="parquet",
                   help="text = '<v> <pr>' plain-decimal lines per "
                   "partition (the reference's .pageRank files)")
    p.set_defaults(fn=cmd_pagerank)

    p = sub.add_parser("components", help="hash-min connected components")
    add_common(p)
    p.set_defaults(fn=cmd_components)

    p = sub.add_parser("kcore", help="k-core decomposition "
                       "(distributed h-index iteration)")
    add_common(p)
    p.set_defaults(fn=cmd_kcore)

    p = sub.add_parser("scc", help="strongly connected components "
                       "(forward-backward coloring with trim)")
    add_common(p)
    p.set_defaults(fn=cmd_scc)

    p = sub.add_parser("labelprop", help="synchronous label propagation")
    add_common(p)
    p.set_defaults(fn=cmd_labelprop)

    p = sub.add_parser("hits", help="HITS hubs & authorities "
                       "(bidirectional CSR engine)")
    add_common(p)
    p.add_argument("--threshold", type=float, default=1e-9)
    p.add_argument("--salsa", action="store_true",
                   help="SALSA: degree-normalized sends, L1 norms "
                   "(stationary distribution of the bipartite walk)")
    p.set_defaults(fn=cmd_hits)

    p = sub.add_parser("bfs", help="multi-source depth-bounded BFS "
                       "(crawl depth over the directed edge set)")
    add_common(p)
    p.add_argument("--seeds", default="0",
                   help="comma-separated seed vertex ids")
    p.add_argument("--max-depth", type=int, default=32)
    p.set_defaults(fn=cmd_bfs)

    p = sub.add_parser("hyperball", help="HyperBall out-ball sketches "
                       "(per-vertex HLL registers + size estimates)")
    add_common(p)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--registers", type=int, default=64)
    p.add_argument("--hll-seed", type=int, default=13)
    p.add_argument("--harmonic", action="store_true",
                   help="also estimate harmonic centrality "
                   "(per-depth ball deltas)")
    p.set_defaults(fn=cmd_hyperball)

    p = sub.add_parser("stats", help="whole-graph crawl diagnostics: "
                       "degree histogram, assortativity, reciprocity")
    add_common(p)
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("walks", help="deterministic random-walk corpus "
                       "(DeepWalk-style node sentences)")
    add_common(p)
    p.add_argument("--length", type=int, default=10)
    p.add_argument("--stride", type=int, default=1,
                   help="walk from every stride'th vertex")
    p.add_argument("--walk-seed", type=int, default=0)
    p.add_argument("--weighted", action="store_true",
                   help="with --edges: draw next hop proportional to "
                   "the integer 'w' column (P(edge) = w / W(v))")
    p.set_defaults(fn=cmd_walks)

    p = sub.add_parser("triangles", help="triangle count")
    add_common(p)
    p.set_defaults(fn=cmd_triangles)

    p = sub.add_parser("partition-edges", help="write edges in the "
                       "partitioned per-shard layout (idempotent "
                       "engine load for pagerank --edges)")
    add_common(p)
    p.set_defaults(fn=cmd_partition_edges)

    p = sub.add_parser("synth-pages", help="write the deterministic "
                       "synthetic pages fixture")
    add_common(p, graph=False)
    p.add_argument("--n", type=int, required=True)
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(fn=cmd_synth_pages)

    p = sub.add_parser("dedup", help="document dedup: exact keepers, "
                       "near-dup pairs (minhash / simhash / jaccard), or "
                       "cluster = minhash pairs unioned into "
                       "connected-component keepers")
    p.add_argument("--docs", required=True,
                   help="documents Parquet dir (doc_id, text)")
    p.add_argument("--out", required=True)
    p.add_argument("--method", required=True,
                   choices=["exact", "minhash", "simhash", "jaccard",
                            "cluster"])
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--num-perm", type=int, default=64)
    p.add_argument("--bands", type=int, default=16)
    p.add_argument("--max-hamming", type=int, default=3)
    p.set_defaults(fn=cmd_dedup)

    p = sub.add_parser("ann", help="cosine top-k neighbors "
                       "(brute / lsh / ivf)")
    p.add_argument("--embeddings", required=True,
                   help="embeddings Parquet dir/file (vec_id, embedding)")
    p.add_argument("--out", required=True)
    p.add_argument("--method", default="brute",
                   choices=["brute", "lsh", "ivf"])
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--query-ids", default="0,1,2",
                   help="comma-separated vec_ids used as queries")
    p.set_defaults(fn=cmd_ann)

    p = sub.add_parser("textops", help="text analysis sweep (tokens / "
                       "quality / lang / fingerprint / terms / pii / "
                       "paradedup)")
    p.add_argument("--docs", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--ops", default="tokens,quality,lang,fingerprint")
    p.add_argument("--top-k", type=int, default=50,
                   help="k for the 'terms' corpus top-k op")
    p.set_defaults(fn=cmd_textops)

    p = sub.add_parser("canonicalize", help="URL canonicalization: "
                       "(url, canonical_url) Parquet from a pages dir")
    p.add_argument("--pages", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--column", default="url")
    p.set_defaults(fn=cmd_canonicalize)
    return ap


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from .context import quiet_data_context

    quiet_data_context()
    try:
        args.fn(args)
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    main()
