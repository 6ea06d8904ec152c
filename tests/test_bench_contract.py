"""Output contracts of the two driver-graded bench artifacts.

``bench.py`` is the per-round performance record: the driver parses
its LAST stdout line as JSON (``BENCH_r*.json``), and the scaling
criterion (BASELINE.md: ≥0.8 efficiency N→4N) is evidenced by the
``--scaling`` sweep's output.  A key rename or a non-JSON trailing
line silently destroys the round's performance record, so pin both
schemas end-to-end at tiny N (real subprocesses, real Ray sessions,
same code path as the driver run — only the graph size differs).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, "bench.py")

_TINY = {
    "GRAFT_BENCH_N": "50000",       # ~400k edges; seconds per level
    "GRAFT_BENCH_PARTS": "8",
    "GRAFT_SCALING_N": "50000",
    "GRAFT_SCALING_LEVELS": "2,4",
    "GRAFT_SCALING_REPEATS": "1",
}


def _run(args: list[str], extra_env: dict[str, str]) -> dict:
    env = dict(os.environ, **_TINY, **extra_env)
    p = subprocess.run([sys.executable, BENCH, *args], env=env,
                       capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stderr[-2000:]
    # the driver contract: the LAST stdout line is the JSON record
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_bench_single_line_driver_contract():
    out = _run([], {"GRAFT_BENCH_HEADLINE_ONLY": "1",
                    "RAY_GRAFT_CPUS": "4"})
    # keys the task brief names for BENCH_r{N}.json
    for key in ("metric", "value", "unit", "queries", "sf", "num_cpus"):
        assert key in out, f"driver-contract key {key!r} missing"
    assert out["unit"] == "sec"
    assert out["num_cpus"] == 4
    assert isinstance(out["queries"], dict) and out["queries"]
    assert all(isinstance(v, (int, float)) for v in out["queries"].values())
    # headline metadata the judge reads against BASELINE.md
    assert out["edges_per_sec_per_superstep"] > 0
    assert out["median_round_s"] > 0
    assert out["converged"] is True
    assert out["num_vertices"] == 50000


def test_bench_scaling_criterion_contract():
    out = _run(["--scaling"], {})
    assert out["scaling_pair"] == [2, 4]
    assert isinstance(out["scaling_efficiency"], (int, float))
    assert out["scaling_efficiency"] > 0
    assert out["scaling_efficiency"] == out["scaling_efficiency_2_to_4"]
    levels = out["levels"]
    assert set(levels) == {"2", "4"}
    for lvl in ("2", "4"):
        assert levels[lvl]["edges_per_sec_per_superstep"] > 0
        assert levels[lvl]["median_round_s"] > 0
    assert out["num_vertices"] == 50000
    assert out["repeats_per_level"] == 1
    # efficiency definition: throughput ratio over CPU ratio
    eff = (levels["4"]["edges_per_sec_per_superstep"]
           / levels["2"]["edges_per_sec_per_superstep"]) / 2.0
    assert abs(eff - out["scaling_efficiency"]) < 5e-3
