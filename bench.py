#!/usr/bin/env python
"""Bench harness (driver-run per round; see BASELINE.md for protocol).

Headline: lump PageRank to 1e-6 convergence on the deterministic
synthetic link graph (FIXTURES.md F3 analogue; seeded, cached as
Parquet under /tmp so every run — and both scaling levels — reads the
identical input).  Reported per BASELINE.md: superstep throughput
excludes ingestion (input_time reported separately, mirroring the
reference's INPUT_TIME vs per-round split, README.md:73,78-88) and the
first warm round.

Also times the operator suite over $GRAFT_SF_DIR and the pages
extraction -> graph build path on the synthetic pages fixture.

``--scaling``: runs the same job in fresh processes at num_cpus=8 and
num_cpus=32 and reports both throughputs + scaling efficiency
(the sandbox evidence for the N-vs-4N cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_N = int(os.environ.get("GRAFT_BENCH_N", 2_000_000))
BENCH_MEAN = 8.0
BENCH_SEED = 21
PAGES_N = int(os.environ.get("GRAFT_BENCH_PAGES", 20_000))
CACHE = "/tmp/dxa_bench_cache"


def _cache_graph(n: int, parts: int) -> str:
    """Generate + dedup the bench graph once, cached in the
    ``write_edges_partitioned`` layout (hive ``part=p`` dirs keyed by
    the owning logical partition) so the engine loads it with the
    idempotent per-shard parquet read — no routing fan-out."""
    from dxa_pagerank_ray.pipelines.graph_build import dedup_edges
    from dxa_pagerank_ray.pipelines.pagerank_csr import write_edges_partitioned
    from dxa_pagerank_ray.sources.synth_graph import synthetic_edges

    path = f"{CACHE}/graph_n{n}_m{BENCH_MEAN}_s{BENCH_SEED}_p{parts}"
    marker = f"{path}/_COMPLETE"
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        raw = synthetic_edges(n, mean_indeg=BENCH_MEAN, seed=BENCH_SEED,
                              override_num_blocks=64)
        write_edges_partitioned(dedup_edges(raw), path, n, parts)
        open(marker, "w").write("ok")
    return path


def _cache_pages(n: int) -> str:
    from dxa_pagerank_ray.sources.pages import write_pages_parquet

    path = f"{CACHE}/pages_n{n}_s42"
    marker = f"{path}/_COMPLETE"
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        write_pages_parquet(path, n, seed=42, override_num_blocks=64)
        open(marker, "w").write("ok")
    return path


def _cache_docs(n: int) -> str:
    """Synthetic documents table at n rows (sources/synth_docs.py),
    cached as ``documents.parquet/`` chunked files so the dir slots in
    as a GRAFT_SF_DIR for documents-only queries.  Driver-side chunked
    generation (50k docs per file) — no Ray session needed, so the
    parent --scaling-query process can pre-build it and keep the cost
    out of every child's timed window."""
    import pyarrow.parquet as pq

    from dxa_pagerank_ray.sources.synth_docs import documents_table_for_range

    # 4k docs (~3.4 MB) per file: enough read blocks that map-side
    # parallelism is input-layout-limited the way a real many-file
    # corpus is, not capped at files-per-read like one fat file.
    # v2: paragraph structure + source-keyed boilerplate headers
    step = 4_000
    path = f"{CACHE}/docs_n{n}_s7_c{step}_v2"
    marker = f"{path}/_COMPLETE"
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        tbl_dir = f"{path}/documents.parquet"
        os.makedirs(tbl_dir)
        for i, lo in enumerate(range(0, n, step)):
            t = documents_table_for_range(lo, min(lo + step, n))
            pq.write_table(t, f"{tbl_dir}/part-{i:05d}.parquet")
        open(marker, "w").write("ok")
    return path


def _cache_embs(n: int) -> str:
    """Synthetic embeddings table at n rows (sources/synth_embeddings
    .py), cached as chunked ``embeddings.parquet/`` so the dir slots
    in as GRAFT_SF_DIR for embeddings-only queries."""
    import pyarrow.parquet as pq

    from dxa_pagerank_ray.sources.synth_embeddings import (
        embeddings_table_for_range,
    )

    step = 20_000  # ~5.3 MB per file at dim=64
    path = f"{CACHE}/embs_n{n}_s9_c{step}"
    marker = f"{path}/_COMPLETE"
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        tbl_dir = f"{path}/embeddings.parquet"
        os.makedirs(tbl_dir)
        for i, lo in enumerate(range(0, n, step)):
            t = embeddings_table_for_range(lo, min(lo + step, n))
            pq.write_table(t, f"{tbl_dir}/part-{i:05d}.parquet")
        open(marker, "w").write("ok")
    return path


def _cache_events(n: int) -> str:
    """Synthetic events table at n rows (sources/synth_events.py),
    cached as chunked ``events.parquet/`` so the dir slots in as
    GRAFT_SF_DIR for events-only queries."""
    import pyarrow.parquet as pq

    from dxa_pagerank_ray.sources.synth_events import events_table_for_range

    step = 100_000  # ~6 MB per file
    path = f"{CACHE}/events_n{n}_s11_c{step}"
    marker = f"{path}/_COMPLETE"
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        tbl_dir = f"{path}/events.parquet"
        os.makedirs(tbl_dir)
        for i, lo in enumerate(range(0, n, step)):
            t = events_table_for_range(lo, min(lo + step, n), n_total=n)
            pq.write_table(t, f"{tbl_dir}/part-{i:05d}.parquet")
        open(marker, "w").write("ok")
    return path


def run_bench(ncpus: int, sf_dir: str) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from dxa_pagerank_ray.context import quiet_data_context

    quiet_data_context()
    import ray.data as rd

    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    queries: dict[str, float] = {}
    out: dict = {"num_cpus": ncpus}

    # ---- headline: PageRank supersteps on the cached synthetic graph
    # Partition count is FIXED across parallelism levels (BASELINE.md:
    # "identical seeds, partition count, and batch sizes"), mirroring
    # the reference's fixed slave count; only the CPU grant varies.
    parts = int(os.environ.get("GRAFT_BENCH_PARTS", 32))
    msg_dtype = os.environ.get("GRAFT_BENCH_MSG_DTYPE", "float64")
    idx_dtype = os.environ.get("GRAFT_BENCH_IDX_DTYPE", "auto")
    graph_path = _cache_graph(BENCH_N, parts)
    t0 = time.perf_counter()
    eng = PageRankCSR(None, BENCH_N, num_partitions=parts, damping=0.85,
                      message_dtype=msg_dtype, index_dtype=idx_dtype,
                      edges_path=graph_path)
    num_edges = eng.num_edges
    input_time = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = eng.run(threshold=1e-6, max_rounds=100)
    superstep_time = time.perf_counter() - t0
    eng.shutdown()  # release the pool's CPU reservation for the suite below
    warm = res.round_seconds[1:] if len(res.round_seconds) > 1 else res.round_seconds
    per_round = sorted(warm)[len(warm) // 2]
    out.update(
        num_vertices=BENCH_N,
        num_edges=num_edges,
        message_dtype=msg_dtype,
        rounds=res.rounds,
        converged=res.converged,
        input_time_s=round(input_time, 3),
        # input_time is now one phase: actor spawn + concurrent
        # per-shard parquet reads + CSR block build (the idempotent
        # partitioned-layout load; the r3 routing fan-out cost ~7 s
        # of the old 10-12 s input window at N=2M)
        input_mode="partitioned_parquet_per_shard",
        pagerank_total_s=round(superstep_time, 3),
        median_round_s=round(per_round, 4),
        edges_per_sec_per_superstep=round(num_edges / per_round, 1),
    )
    queries["pagerank_supersteps"] = round(superstep_time, 3)

    if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        ray.shutdown()
        out["queries"] = queries
        out["pages_n"] = 0
        out["pages_graph_edges"] = 0
        return out

    # ---- pages extraction -> link graph build
    from dxa_pagerank_ray.pipelines.graph_build import build_link_graph

    pages_path = _cache_pages(PAGES_N)
    pages = rd.read_parquet(pages_path)
    pages.count()  # warm page cache; measure compute not first disk read
    t0 = time.perf_counter()
    g = build_link_graph(pages, num_partitions=ncpus)
    queries["extract_and_build_graph"] = round(time.perf_counter() - t0, 3)
    out["pages_n"] = PAGES_N
    out["pages_graph_edges"] = g.edges.count()

    # ---- operator suite over the sf dir
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    for name in ["q1_pricing_summary", "top_customers_revenue", "events_hourly",
                 "doc_token_counts", "docs_exact_dedup", "ann_cosine_top10",
                 "triangle_count", "cc_sizes", "pagerank_top20",
                 "kcore_numbers", "degree_distribution",
                 "indegree_distribution", "hits_fixed4",
                 "ppr_fixed4", "host_pagerank_weighted", "anchor_texts",
                 "cc_sizes_star", "random_walks", "bfs_depths",
                 "cocitation_top20", "coupling_top20",
                 "degree_assortativity", "edge_reciprocity",
                 "hyperball_registers", "harmonic_top20",
                 "closeness_top20", "host_top_pages",
                 "effective_diameter", "salsa_fixed4",
                 "random_walks_weighted", "doc_repetition",
                 "doc_contamination", "sssp_costs", "bowtie_regions",
                 "jaccard_related_top20",
                 "minhash_dup_pairs", "top_terms", "docs_sample",
                 "training_corpus", "semantic_dedup_keepers",
                 "paragraph_dedup", "pii_scrub", "doc_oov_counts",
                 "trustrank_fixed4", "scc_ids", "link_prediction_top20",
                 "resource_allocation_top20", "q3_shipping_priority",
                 "q6_forecast_revenue", "doc_length_quantiles",
                 "events_funnel", "doc_bigram_familiarity",
                 "duplicated_ngrams",
                 "postings_top25", "tfidf_top3_per_doc",
                 "customers_order_stats", "events_type_daily_rollup",
                 "events_retention", "longest_docs_per_lang",
                 "corpus_composition",
                 "doc_length_quantiles_by_lang", "vocab_stats",
                 "dup_cluster_histogram", "distinct_users_daily",
                 "scc_condensation_edges", "dag_levels",
                 "doc_chunks", "corpus_shard_stats",
                 "url_canonical_dups", "doc_ttr",
                 "q5_local_supplier_volume",
                 # full-registry coverage (every remaining queries() entry,
                 # so BENCH_r* carries a timing for all 105 oracled queries)
                 "pagerank_fixed4", "labelprop_sizes", "out_degrees",
                 "dangling_vertices", "edges_dedup", "host_graph",
                 "host_pagerank_fixed4", "triangle_count_shuffle",
                 "triangle_per_vertex", "clustering_coefficients",
                 "global_clustering", "doc_quality", "doc_lang_id",
                 "doc_fingerprints", "doc_bpe_token_counts",
                 "docs_normalized", "docs_split_counts",
                 "docs_stratified_sample", "lang_doc_stats",
                 "ann_lsh_top10", "ann_ivf_top10", "embedding_clusters",
                 "embedding_near_dups", "embedding_near_dups_lsh",
                 "near_dup_clusters", "simhash_dup_pairs",
                 "ngram_jaccard_dup_pairs", "paragraph_dedup_keep_first",
                 "events_sessions", "events_running_totals",
                 "events_asof_last_error", "media_decode",
                 "media_audio_features", "media_frame_sample"]:
        t0 = time.perf_counter()
        r = qs[name](sf_dir)
        if hasattr(r, "materialize"):
            r = r.materialize()
        queries[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    out["queries"] = queries
    return out


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    # GRAFT_DOCS_N: swap the input for the cached synthetic documents
    # corpus at that row count (documents-only queries; the driver's
    # sf0.1 table is 5k rows — too small to exercise parallelism)
    if os.environ.get("GRAFT_DOCS_N"):
        sf_dir = _cache_docs(int(os.environ["GRAFT_DOCS_N"]))
    # GRAFT_EMBS_N / GRAFT_EVENTS_N: same, for the embeddings-only /
    # events-only queries
    if os.environ.get("GRAFT_EMBS_N"):
        sf_dir = _cache_embs(int(os.environ["GRAFT_EMBS_N"]))
    if os.environ.get("GRAFT_EVENTS_N"):
        sf_dir = _cache_events(int(os.environ["GRAFT_EVENTS_N"]))

    if os.environ.get("GRAFT_QUERY_BENCH"):
        # child mode for --scaling-query: time ONE registry query in a
        # fresh Ray session (init/import excluded — superstep-style
        # compute timing; the input parquet sits in the OS page cache
        # after the first level, so both levels read identical bytes)
        name = os.environ["GRAFT_QUERY_BENCH"]
        import ray

        ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
        from dxa_pagerank_ray.context import quiet_data_context

        quiet_data_context()
        import __ray_entry__ as entrymod

        fn = entrymod.queries()[name]
        t0 = time.perf_counter()
        r = fn(sf_dir)
        if hasattr(r, "materialize"):
            r = r.materialize()
        sec = time.perf_counter() - t0
        rows = int(r.count() if hasattr(r, "count")
                   else getattr(r, "num_rows", len(r)))
        ray.shutdown()
        print(json.dumps({"query": name, "sec": round(sec, 3),
                          "rows": rows, "num_cpus": ncpus}))
        return

    if "--scaling-query" in sys.argv:
        # per-query N-vs-4N evidence (same protocol as --scaling:
        # fresh process per level, interleaved repeats, best-of-k —
        # here best = MIN seconds).  Registry queries derive their
        # shuffle partitioning from the INPUT size, not the CPU grant,
        # so the plan is identical across levels; only parallelism
        # varies — the criterion shape, applied to the data operators.
        name = sys.argv[sys.argv.index("--scaling-query") + 1]
        levels = [int(x) for x in os.environ.get(
            "GRAFT_SCALING_LEVELS", "8,32").split(",")]
        repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
        best: dict[int, dict] = {}
        for _ in range(repeats):
            for lvl in levels:
                env = dict(os.environ, RAY_GRAFT_CPUS=str(lvl),
                           GRAFT_QUERY_BENCH=name)
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, capture_output=True, text=True)
                if p.returncode != 0:
                    sys.stderr.write(p.stderr[-2000:])
                    raise SystemExit(p.returncode)
                r = json.loads(p.stdout.strip().splitlines()[-1])
                if lvl not in best or r["sec"] < best[lvl]["sec"]:
                    best[lvl] = r
        out = {
            "query": name,
            "sf": os.path.basename(sf_dir),
            "levels": {str(l): {"sec": best[l]["sec"]} for l in levels},
            "rows": best[levels[-1]]["rows"],
            "repeats_per_level": repeats,
            "statistic": "best-of-k = min sec (one-sided VM noise)",
        }
        for lo, hi in zip(levels, levels[1:]):
            eff = (best[lo]["sec"] / best[hi]["sec"]) / (hi / lo)
            out[f"scaling_efficiency_{lo}_to_{hi}"] = round(eff, 3)
        if len(levels) > 1:
            out["scaling_pair"] = [levels[0], levels[1]]
            out["scaling_efficiency"] = out[
                f"scaling_efficiency_{levels[0]}_to_{levels[1]}"]
        else:
            out["scaling_pair"] = [levels[0], levels[0]]
            out["scaling_efficiency"] = 1.0
        print(json.dumps(out))
        return

    if "--scaling" in sys.argv:
        # N-vs-4N protocol (BASELINE.md): fresh process per parallelism
        # level, same cached input, fixed partition count.  The primary
        # pair keeps per-level resources unsaturated so it models
        # adding NODES (each node brings its own memory bandwidth and
        # raylet); the widest pair on this single box runs into the
        # shared-memory ceiling and is reported alongside for honesty.
        levels = [int(x) for x in os.environ.get(
            "GRAFT_SCALING_LEVELS", "8,32").split(",")]
        scaling_n = os.environ.get("GRAFT_SCALING_N", "32000000")
        # this sandbox VM's DRAM bandwidth swings >3x between identical
        # runs (measured 0.5-5 GB/s numpy triad); slowdowns are
        # one-sided, so best-of-k per level is the comparable statistic
        repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
        dtypes = os.environ.get("GRAFT_SCALING_DTYPES", "float64").split(",")

        def sweep(msg_dtype: str) -> dict:
            # INTERLEAVED repeats (8,32,8,32,...): the host throttles
            # memory bandwidth in multi-minute windows, so consecutive
            # same-level repeats would let one level soak up an entire
            # slow window; interleaving samples both levels across the
            # same windows before best-of-k picks per level.
            results = {}
            for _ in range(repeats):
                for lvl in levels:
                    env = dict(os.environ, RAY_GRAFT_CPUS=str(lvl),
                               GRAFT_BENCH_N=scaling_n,
                               GRAFT_BENCH_MSG_DTYPE=msg_dtype,
                               GRAFT_BENCH_HEADLINE_ONLY="1")
                    p = subprocess.run(
                        [sys.executable, os.path.abspath(__file__)],
                        env=env, capture_output=True, text=True)
                    line = p.stdout.strip().splitlines()[-1]
                    r = json.loads(line)
                    best = results.get(lvl)
                    if best is None or (r["edges_per_sec_per_superstep"]
                                        > best["edges_per_sec_per_superstep"]):
                        results[lvl] = r
            s = {
                "levels": {
                    str(lvl): {
                        "edges_per_sec_per_superstep":
                            results[lvl]["edges_per_sec_per_superstep"],
                        "median_round_s": results[lvl]["median_round_s"],
                    }
                    for lvl in levels
                },
                "num_edges": results[levels[-1]]["num_edges"],
                "num_vertices": results[levels[-1]]["num_vertices"],
                "repeats_per_level": repeats,
                "statistic": "best-of-k (one-sided VM noise)",
            }
            for lo, hi in zip(levels, levels[1:]):
                eff = (results[hi]["edges_per_sec_per_superstep"]
                       / results[lo]["edges_per_sec_per_superstep"]) / (hi / lo)
                s[f"scaling_efficiency_{lo}_to_{hi}"] = round(eff, 3)
            return s

        out = sweep(dtypes[0])
        for dt in dtypes[1:]:
            out[f"message_{dt}"] = sweep(dt)
        # the N-vs-4N criterion figure: first pair (unsaturated levels)
        lo, hi = levels[0], levels[1] if len(levels) > 1 else levels[0]
        out["scaling_pair"] = [lo, hi]
        out["scaling_efficiency"] = out.get(
            f"scaling_efficiency_{lo}_to_{hi}", 1.0)
        print(json.dumps(out))
        return

    out = run_bench(ncpus, sf_dir)
    print(json.dumps({
        "metric": "edges/sec per superstep (lump PageRank to 1e-6 convergence, "
                  f"synthetic link graph N={out['num_vertices']} "
                  f"E={out['num_edges']})",
        "value": out["pagerank_total_s"],
        "unit": "sec",
        "queries": out["queries"],
        "sf": os.path.basename(os.environ.get("GRAFT_SF_DIR",
                                              "/root/testdata/sf0.1")),
        "num_cpus": out["num_cpus"],
        "edges_per_sec_per_superstep": out["edges_per_sec_per_superstep"],
        "median_round_s": out["median_round_s"],
        "rounds": out["rounds"],
        "converged": out["converged"],
        "input_time_s": out["input_time_s"],
        "input_mode": out["input_mode"],
        "num_edges": out["num_edges"],
        "num_vertices": out["num_vertices"],
        "pages_n": out["pages_n"],
        "pages_graph_edges": out["pages_graph_edges"],
    }))


if __name__ == "__main__":
    main()
