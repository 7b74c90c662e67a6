"""Bench-regression gate tests (round-6 verdict item 6). Pure-python — no
Spark session: the gate's comparison logic is pinned on synthetic frames
and on the COMMITTED BENCH_HISTORY.jsonl (the last two recorded rounds must
satisfy the invariant the verdicts have been asserting by hand). The live
gate runs at round end: ``python bench.py > /tmp/bench.json && python
tools/bench_gate.py /tmp/bench.json``.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from bench_gate import find_regressions, last_history_line, pick_timings  # noqa: E402


def test_gate_flags_real_regressions():
    ref = {"queries": {"a": 1.0, "b": 0.1, "c": 2.0}}
    # a: 2x AND +1.0s -> flagged; b: 3x but only +0.2s -> jitter, pass;
    # c: +0.4s but only 1.2x -> pass; d: no reference -> skipped
    new = {"queries": {"a": 2.0, "b": 0.3, "c": 2.4, "d": 9.9}}
    regs = find_regressions(new, ref, ratio=1.5, abs_sec=0.3)
    assert [r[0] for r in regs] == ["a"]
    assert regs[0][1:] == (1.0, 2.0)


def test_gate_prefers_min_of_repeats_when_both_sides_have_it():
    ref = {"queries": {"a": 1.0}, "queries_min": {"a": 1.0}}
    new = {"queries": {"a": 5.0}, "queries_min": {"a": 1.1}}  # median noisy, min steady
    assert find_regressions(new, ref) == []
    # but when the reference predates queries_min, medians are compared
    ref_old = {"queries": {"a": 1.0}}
    assert [r[0] for r in find_regressions(new, ref_old)] == ["a"]


def test_gate_ignores_new_and_removed_queries():
    ref = {"queries": {"gone": 1.0}}
    new = {"queries": {"fresh": 50.0}}
    assert find_regressions(new, ref) == []


def test_committed_history_last_two_rounds_hold_the_invariant():
    """The r5 -> r6 transition the round-6 verdict graded as 'zero
    regressions' must pass the gate mechanically — if this ever fails, the
    history file and the gate disagree about what a regression is."""
    path = os.path.join(ROOT, "BENCH_HISTORY.jsonl")
    lines = [json.loads(ln) for ln in open(path) if ln.strip()]
    if len(lines) < 2:
        pytest.skip("fewer than two bench rounds recorded")
    if lines[-1].get("new_instance"):
        # a line recorded on a different VM instance declares itself (the
        # round-7 close-out measured ~1.5x cross-instance variance on
        # untouched query families); the same-machine invariant is only
        # meaningful between consecutive same-instance lines
        pytest.skip("latest line declares a VM instance change (see its note)")
    regs = find_regressions(lines[-1], lines[-2])
    assert regs == [], f"history says these regressed: {regs}"


def test_last_history_line_reads_tail():
    path = os.path.join(ROOT, "BENCH_HISTORY.jsonl")
    last = last_history_line(path)
    assert "queries" in last and isinstance(pick_timings(last), dict)
