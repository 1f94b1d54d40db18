"""Unit tests for the computed gate-window rotation (r9, rotation-as-code).

The live composition/staleness properties are pinned in test_plans.py;
these tests drive gate_history/compute_gate_window against SYNTHETIC
histories so the mechanics (never-gated fronting, least-recent ordering,
tie-breaks, local-file exclusion, next-round shift) are verified
independently of the real CORRECTNESS_r*.json files.
"""

import json

from vunnel_spark.queries import (
    GATE_PRIORITY,
    WINDOW_SIZE,
    compute_gate_window,
    gate_history,
)
from vunnel_spark.registry import REGISTRY


def _write(root, fname, names):
    (root / fname).write_text(json.dumps({n: {"hash_match": True} for n in names}))


def test_gate_history_reads_rounds_and_ignores_local_files(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", ["a", "b"])
    _write(tmp_path, "CORRECTNESS_r03.json", ["b", "c"])
    # local evidence files must NOT count as external gates
    _write(tmp_path, "CORRECTNESS_local_r7.json", ["z"])
    _write(tmp_path, "CORRECTNESS_local_r7_sf01.json", ["z"])
    last, current = gate_history(tmp_path)
    assert last == {"a": 1, "b": 3, "c": 3}
    assert current == 4
    assert "z" not in last


def test_gate_history_empty_root(tmp_path):
    last, current = gate_history(tmp_path)
    assert last == {} and current == 1


def test_compute_window_fronts_priority_then_least_recent(tmp_path):
    names = list(REGISTRY)
    # synthetic: everything gated round 5 except three stragglers at r2
    # and two never-gated
    stale = [n for n in names if n not in GATE_PRIORITY][:3]
    never = [n for n in names if n not in GATE_PRIORITY][3:5]
    gated_r5 = [n for n in names if n not in set(stale) | set(never)]
    _write(tmp_path, "CORRECTNESS_r02.json", stale)
    _write(tmp_path, "CORRECTNESS_r05.json", gated_r5)
    window = compute_gate_window(tmp_path)
    assert len(window) == WINDOW_SIZE
    assert window[: len(GATE_PRIORITY)] == GATE_PRIORITY
    # never-gated sort before the r2 stragglers, which sort before r5
    fill = window[len(GATE_PRIORITY) :]
    assert fill[: len(never)] == never
    assert fill[len(never) : len(never) + len(stale)] == stale


def test_compute_window_shifts_when_next_round_lands(tmp_path):
    """Simulate the driver committing this round's gate report: the
    queries it contains drop to the back of the rotation next round."""
    names = [n for n in REGISTRY if n not in GATE_PRIORITY]
    _write(tmp_path, "CORRECTNESS_r08.json", names)  # all equally old
    w1 = compute_gate_window(tmp_path)
    # the driver gates w1 in round 9:
    _write(tmp_path, "CORRECTNESS_r09.json", w1)
    w2 = compute_gate_window(tmp_path)
    # the non-priority fill of round 10's window avoids round-9's fill
    fill1 = set(w1) - set(GATE_PRIORITY)
    fill2 = set(w2) - set(GATE_PRIORITY)
    assert not (fill1 & fill2)


def test_tie_break_is_registry_order(tmp_path):
    window = compute_gate_window(tmp_path)  # empty history: all never-gated
    fill = window[len(GATE_PRIORITY) :]
    order = [n for n in REGISTRY if n not in set(GATE_PRIORITY)]
    assert fill == order[: len(fill)]


def test_priority_round_stamp_warns_when_stale(monkeypatch):
    """GATE_PRIORITY carries an explicit round stamp; a stamp behind the
    upcoming round (max committed gate report + 1) is last round's
    leftover re-burning window slots and must warn (r9 ADVICE: the
    skipped-manual-step failure mode rotation-as-code was built to
    remove)."""
    import warnings

    import vunnel_spark.queries as Q

    upcoming = gate_history()[1]

    monkeypatch.setattr(Q, "GATE_PRIORITY_ROUND", upcoming)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        Q.compute_gate_window()
    assert not [x for x in w if "GATE_PRIORITY" in str(x.message)]

    monkeypatch.setattr(Q, "GATE_PRIORITY_ROUND", upcoming - 1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        Q.compute_gate_window()
    hits = [x for x in w if "GATE_PRIORITY" in str(x.message)]
    assert len(hits) == 1 and "bump" in str(hits[0].message)
