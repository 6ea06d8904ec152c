#!/usr/bin/env python
"""Multi-node-topology scaling evidence (ADVICE.md item 4).

``ray.cluster_utils.Cluster`` (Ray's public multi-node test harness)
starts k raylets on this machine, EACH with its own object store and
scheduler — the same topology a real k-node cluster presents to the
engine, minus the physical NIC (transfers cross object-store boundaries
through localhost instead of a network).  This substantiates two things
a single-raylet run cannot:

1. functional: the CSR shard engine runs unchanged when shards live on
   different nodes and every superstep's partials cross node
   boundaries (spread scheduling forces inter-node placement);
2. protocol: N-vs-4N *nodes* at fixed per-node CPUs, the literal shape
   of the criterion, rather than N-vs-4N cores under one raylet.

Caveat stated up front: all simulated nodes share ONE host's DRAM, so
aggregate bandwidth does NOT grow 4x as it would on real hardware —
the absolute efficiency number therefore remains a lower bound on real
multi-node behavior (see BASELINE.md for the host-throttling data).

Usage:  python bench_nodes.py            # 1x8 vs 4x8 nodes, N=32M
        GRAFT_NODES_N=8000000 python bench_nodes.py
Prints one JSON line per topology plus the pairwise efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N = int(os.environ.get("GRAFT_NODES_N", 32_000_000))
CPUS_PER_NODE = int(os.environ.get("GRAFT_NODES_CPUS", 8))


def run_one(num_nodes: int) -> dict:
    """Child-process entry: build a num_nodes-raylet cluster, run the
    cached bench graph, report median warm round."""
    import numpy as np  # noqa: F401
    import ray
    from ray.cluster_utils import Cluster

    # Cluster()'s test-harness default object store is 150 MB/node —
    # one superstep ships ~2.6 GB of partials at N=32M, so the default
    # spills to disk every round and measures the SSD, not the engine.
    store = int(os.environ.get("GRAFT_NODES_STORE_GB", 15)) << 30
    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": CPUS_PER_NODE,
                        "object_store_memory": store,
                        "include_dashboard": False},
    )
    for _ in range(num_nodes - 1):
        cluster.add_node(num_cpus=CPUS_PER_NODE, object_store_memory=store)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    from dxa_pagerank_ray.context import quiet_data_context

    quiet_data_context()
    from bench import _cache_graph
    from dxa_pagerank_ray.pipelines.pagerank_csr import PageRankCSR

    # partitioned cache (P=32 matches the engine) -> per-shard load;
    # on this simulated cluster every raylet shares the host's /tmp,
    # exactly like a real cluster's shared object store / FS mount
    path = _cache_graph(N, 32)
    eng = PageRankCSR(None, N, num_partitions=32, damping=0.85,
                      edges_path=path)
    num_edges = eng.num_edges
    res = eng.run(threshold=1e-6, max_rounds=100)
    eng.shutdown()
    warm = res.round_seconds[1:] or res.round_seconds
    med = sorted(warm)[len(warm) // 2]
    out = {
        "nodes": num_nodes,
        "cpus_per_node": CPUS_PER_NODE,
        "num_edges": num_edges,
        "rounds": res.rounds,
        "converged": res.converged,
        "median_round_s": round(med, 4),
        "edges_per_sec_per_superstep": round(num_edges / med, 1),
        "ray_nodes_seen": len([n for n in ray.nodes() if n["Alive"]]),
    }
    ray.shutdown()
    cluster.shutdown()
    return out


def run_one_query(num_nodes: int, query: str, sf_dir: str) -> dict:
    """Child-process entry: build a num_nodes-raylet cluster and run
    ONE registry query (a Ray Data map/shuffle pipeline) across it —
    functional evidence the data operators run unchanged when blocks
    live on different nodes and every exchange crosses object-store
    boundaries."""
    import ray
    from ray.cluster_utils import Cluster

    store = int(os.environ.get("GRAFT_NODES_STORE_GB", 8)) << 30
    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": CPUS_PER_NODE,
                        "object_store_memory": store,
                        "include_dashboard": False},
    )
    for _ in range(num_nodes - 1):
        cluster.add_node(num_cpus=CPUS_PER_NODE, object_store_memory=store)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    from dxa_pagerank_ray.context import quiet_data_context

    quiet_data_context()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    t0 = time.time()
    r = entrymod.queries()[query](sf_dir)
    if hasattr(r, "materialize"):
        r = r.materialize()
    sec = time.time() - t0
    rows = int(r.count() if hasattr(r, "count")
               else getattr(r, "num_rows", len(r)))
    out = {
        "nodes": num_nodes,
        "cpus_per_node": CPUS_PER_NODE,
        "query": query,
        "sec": round(sec, 3),
        "rows": rows,
        "ray_nodes_seen": len([n for n in ray.nodes() if n["Alive"]]),
    }
    ray.shutdown()
    cluster.shutdown()
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1].startswith("--child-query="):
        nodes = int(sys.argv[1].split("=")[1])
        print(json.dumps(run_one_query(
            nodes, os.environ["GRAFT_NODES_QUERY"],
            os.environ["GRAFT_NODES_SF"])))
        return
    if len(sys.argv) > 1 and sys.argv[1].startswith("--child="):
        print(json.dumps(run_one(int(sys.argv[1].split("=")[1]))))
        return
    if os.environ.get("GRAFT_NODES_QUERY"):
        # data-operator topology check: same query, 1 vs 4 raylets,
        # row counts must MATCH (the hard signal; timing is secondary
        # on one shared-DRAM host)
        results = {}
        for nodes in (1, 4):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 f"--child-query={nodes}"],
                capture_output=True, text=True, env=dict(os.environ))
            if p.returncode != 0:
                sys.stderr.write(p.stderr[-2000:])
                raise SystemExit(p.returncode)
            line = [ln for ln in p.stdout.strip().splitlines()
                    if ln.startswith("{")][-1]
            results[nodes] = json.loads(line)
            print(line)
        print(json.dumps({
            "pair": "1x%d vs 4x%d nodes" % (CPUS_PER_NODE, CPUS_PER_NODE),
            "rows_match": results[1]["rows"] == results[4]["rows"],
        }))
        return
    results = {}
    for nodes in (1, 4):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), f"--child={nodes}"],
            capture_output=True, text=True, env=dict(os.environ))
        line = [ln for ln in p.stdout.strip().splitlines()
                if ln.startswith("{")][-1]
        results[nodes] = json.loads(line)
        print(line)
    eff = (results[4]["edges_per_sec_per_superstep"]
           / results[1]["edges_per_sec_per_superstep"]) / 4.0
    print(json.dumps({
        "pair": "1x%d vs 4x%d nodes" % (CPUS_PER_NODE, CPUS_PER_NODE),
        "node_scaling_efficiency": round(eff, 3),
        "caveat": "simulated nodes share one host's DRAM; real nodes "
                  "add bandwidth per node - this is a lower bound",
    }))


if __name__ == "__main__":
    t0 = time.time()
    main()
    sys.stderr.write(f"total {time.time() - t0:.1f}s\n")
