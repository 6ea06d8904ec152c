#!/usr/bin/env python
"""Re-record gate fingerprints from the newest committed CORRECTNESS
file — run at the START of a round, BEFORE any code edits.

For every query the newest ``CORRECTNESS_r*.json`` proves green, the
current implementation fingerprint is recorded as "the code the gate
verified" (valid only while the working tree still matches the commit
the driver ran — hence the run-first rule).  Queries that failed, or
that sat outside the gate window, keep their previous record, so a
query changed-but-unchecked stays flagged until a green row lands.

    usage: python tools/refresh_gate.py [--bootstrap]

``--bootstrap`` (first run only) records fingerprints for EVERY
registry query, then re-marks the names listed in ``--stale`` (comma
separated) with the never-matching sentinel ``gate.STALE`` — for
queries known to have changed since their last green row before the
fingerprint file existed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _recorded_round(root: str) -> int:
    """``newest_round_seen`` from the committed fingerprint file, 0 if
    absent — which CORRECTNESS round the last refresh consumed."""
    path = os.path.join(root, "GATE_FINGERPRINTS.json")
    if not os.path.exists(path):
        return 0
    return int(json.load(open(path)).get("newest_round_seen", 0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bootstrap", action="store_true")
    ap.add_argument("--stale", default="",
                    help="comma-separated query names to force-mark "
                         "changed (bootstrap only)")
    args = ap.parse_args()

    import __ray_entry__ as entry
    from dxa_pagerank_ray import gate

    registry = entry.queries()
    oracles = entry.oracle_sql()
    cur = gate.current_fingerprints(registry, oracles)
    last, newest = gate.gate_history(ROOT)
    rec = gate.recorded_fingerprints(ROOT)

    if args.bootstrap:
        out = dict(cur)
        for q in filter(None, args.stale.split(",")):
            if q not in out:
                raise SystemExit(f"--stale names unknown query {q!r}")
            out[q] = gate.STALE
        updated = sorted(out)
    else:
        # IDEMPOTENCY GUARD: the green-re-record step is only valid
        # ONCE per round, at round start, while the working tree still
        # matches the commit the driver verified.  If the recorded
        # file already saw this round, the source may have been edited
        # since — re-recording would stamp UNVERIFIED code as green
        # (observed in r5: a mid-round re-run would have cleared the
        # changed flag on 14 edited queries).  Then only NEW queries
        # are added, as STALE.
        prev_round = _recorded_round(ROOT)
        out = dict(rec)
        updated = []
        for q, fp in cur.items():
            if (last.get(q) == newest and newest > 0
                    and prev_round < newest):
                # proven green by the NEWEST round and this is the
                # first refresh since — the current source is the
                # source that round verified
                if out.get(q) != fp:
                    updated.append(q)
                out[q] = fp
            elif q not in out:
                out[q] = gate.STALE  # new query: changed by definition
                updated.append(q)

    path = os.path.join(ROOT, "GATE_FINGERPRINTS.json")
    with open(path, "w") as fh:
        json.dump({"note": ("fingerprint of each query's implementation "
                            "as of its last driver-green row; refresh "
                            "with tools/refresh_gate.py at round start "
                            "BEFORE editing code"),
                   "newest_round_seen": newest,
                   "fingerprints": out}, fh, indent=1, sort_keys=True)
        fh.write("\n")
    changed = gate.changed_queries(registry, oracles, ROOT)
    print(f"recorded {len(out)} fingerprints -> {path}")
    print(f"updated this run ({len(updated)}): {', '.join(updated) or '-'}")
    print(f"currently changed-since-green ({len(changed)}): "
          f"{', '.join(sorted(changed)) or '-'}")


if __name__ == "__main__":
    main()
