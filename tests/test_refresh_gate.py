"""Behavioral tests for ``tools/refresh_gate.py`` — the tool that
re-records gate fingerprints from the newest committed CORRECTNESS
file.  The rotation INVARIANTS live in ``test_gate_rotation.py``;
these pin the refresh tool's own contract against a sandbox repo root
(tmpdir with fabricated CORRECTNESS history), in particular the
idempotency guard: a second refresh in the same round must NOT stamp
possibly-edited source as green (``refresh_gate.py:66-88``).

No Ray involved — pure file/fingerprint logic over the real registry.
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __ray_entry__ as entry  # noqa: E402
from dxa_pagerank_ray import gate  # noqa: E402


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "refresh_gate", os.path.join(ROOT, "tools", "refresh_gate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def fixture_state():
    """Current fingerprints + history, computed once (the fingerprint
    walk imports every package module)."""
    registry = entry._registry()
    oracles = entry.oracle_sql()
    cur = gate.current_fingerprints(registry, oracles)
    last, newest = gate.gate_history(ROOT)
    return registry, oracles, cur, last, newest


def _sandbox(tmp_path, newest: int, green: list[str],
             fingerprints: dict[str, str]) -> str:
    """A repo-root stand-in: real CORRECTNESS history copied in, plus a
    fabricated CORRECTNESS_r{newest}.json marking ``green`` green, plus
    a GATE_FINGERPRINTS.json holding ``fingerprints`` recorded as of
    round ``newest - 1`` (i.e. this round's refresh has NOT run yet)."""
    root = str(tmp_path)
    for f in os.listdir(ROOT):
        if f.startswith("CORRECTNESS_r") and f.endswith(".json"):
            shutil.copy(os.path.join(ROOT, f), os.path.join(root, f))
    rows = {q: {"rows_match": True, "schema_match": True,
                "hash_match": True, "err": None} for q in green}
    # one explicit red row so the green filter is exercised
    rows["__red__"] = {"rows_match": False, "schema_match": True,
                       "hash_match": False, "err": "boom"}
    with open(os.path.join(root, f"CORRECTNESS_r{newest:02d}.json"),
              "w") as fh:
        json.dump(rows, fh)
    with open(os.path.join(root, "GATE_FINGERPRINTS.json"), "w") as fh:
        json.dump({"newest_round_seen": newest - 1,
                   "fingerprints": fingerprints}, fh)
    return root


def _run(tool, root: str, argv: list[str] | None = None,
         monkeypatch=None) -> dict:
    monkeypatch.setattr(tool, "ROOT", root)
    monkeypatch.setattr(sys, "argv", ["refresh_gate.py"] + (argv or []))
    tool.main()
    with open(os.path.join(root, "GATE_FINGERPRINTS.json")) as fh:
        return json.load(fh)


def test_refresh_records_only_newest_green(tmp_path, monkeypatch,
                                           fixture_state):
    """A query green in the NEWEST round gets its current fingerprint
    recorded; a query NOT in that round's green set keeps its previous
    record (stays changed)."""
    registry, oracles, cur, _, newest = fixture_state
    names = list(registry)
    proven, unproven = names[0], names[1]
    root = _sandbox(tmp_path, newest + 1, green=[proven],
                    fingerprints={proven: gate.STALE,
                                  unproven: gate.STALE})
    tool = _load_tool()
    out = _run(tool, root, monkeypatch=monkeypatch)
    assert out["fingerprints"][proven] == cur[proven]
    assert out["fingerprints"][unproven] == gate.STALE
    assert out["newest_round_seen"] == newest + 1
    changed = gate.changed_queries(registry, oracles, root)
    assert proven not in changed
    assert unproven in changed


def test_red_row_is_not_green(tmp_path, monkeypatch, fixture_state):
    """A row with err / rows_match=False never re-records — the
    fabricated __red__ row plus a real query marked red."""
    registry, oracles, cur, _, newest = fixture_state
    victim = list(registry)[2]
    root = _sandbox(tmp_path, newest + 1, green=[],
                    fingerprints={victim: gate.STALE})
    # overwrite victim's row as red in the fabricated file
    path = os.path.join(root, f"CORRECTNESS_r{newest + 1:02d}.json")
    rows = json.load(open(path))
    rows[victim] = {"rows_match": True, "schema_match": True,
                    "hash_match": False, "err": None}
    json.dump(rows, open(path, "w"))
    tool = _load_tool()
    out = _run(tool, root, monkeypatch=monkeypatch)
    assert out["fingerprints"][victim] == gate.STALE
    assert victim in gate.changed_queries(registry, oracles, root)


def test_second_refresh_same_round_is_inert(tmp_path, monkeypatch,
                                            fixture_state):
    """The idempotency guard: once the fingerprint file has seen round
    N, a re-run must NOT re-record — otherwise mid-round source edits
    would be stamped as driver-verified.  Simulated by tampering a
    recorded fingerprint between run 1 and run 2: run 2 must keep the
    tampered value, not 'fix' it to the current source."""
    registry, oracles, cur, _, newest = fixture_state
    proven = list(registry)[0]
    root = _sandbox(tmp_path, newest + 1, green=[proven],
                    fingerprints={proven: gate.STALE})
    tool = _load_tool()
    out1 = _run(tool, root, monkeypatch=monkeypatch)
    assert out1["fingerprints"][proven] == cur[proven]

    # simulate "code edited after round-start refresh": the recorded
    # value now differs from current source
    out1["fingerprints"][proven] = "TAMPERED-MID-ROUND"
    json.dump(out1, open(os.path.join(root, "GATE_FINGERPRINTS.json"),
                         "w"))
    out2 = _run(tool, root, monkeypatch=monkeypatch)
    assert out2["fingerprints"][proven] == "TAMPERED-MID-ROUND", (
        "refresh re-recorded inside the same round — the idempotency "
        "guard must block green re-records once newest_round_seen == "
        "the newest CORRECTNESS round")
    assert proven in gate.changed_queries(registry, oracles, root)


def test_new_query_added_as_stale(tmp_path, monkeypatch, fixture_state):
    """A registry query with no recorded fingerprint is added with the
    STALE sentinel (changed by definition) even when the green
    re-record step is blocked by the idempotency guard."""
    registry, oracles, cur, _, newest = fixture_state
    names = list(registry)
    missing = names[3]
    fingerprints = {q: cur[q] for q in names if q != missing}
    root = _sandbox(tmp_path, newest + 1, green=[],
                    fingerprints=fingerprints)
    # mark the file as having already seen the newest round -> green
    # re-record blocked, only the new-query path runs
    path = os.path.join(root, "GATE_FINGERPRINTS.json")
    data = json.load(open(path))
    data["newest_round_seen"] = newest + 1
    json.dump(data, open(path, "w"))
    tool = _load_tool()
    out = _run(tool, root, monkeypatch=monkeypatch)
    assert out["fingerprints"][missing] == gate.STALE
    assert missing in gate.changed_queries(registry, oracles, root)
    # everyone else untouched
    for q in names:
        if q != missing:
            assert out["fingerprints"][q] == cur[q]


def test_bootstrap_records_everything_and_stale_marks(tmp_path,
                                                      monkeypatch,
                                                      fixture_state):
    registry, oracles, cur, _, newest = fixture_state
    names = list(registry)
    stale_q = names[4]
    root = _sandbox(tmp_path, newest + 1, green=[], fingerprints={})
    os.remove(os.path.join(root, "GATE_FINGERPRINTS.json"))
    tool = _load_tool()
    out = _run(tool, root, argv=["--bootstrap", "--stale", stale_q],
               monkeypatch=monkeypatch)
    assert set(out["fingerprints"]) == set(names)
    assert out["fingerprints"][stale_q] == gate.STALE
    assert out["fingerprints"][names[5]] == cur[names[5]]
