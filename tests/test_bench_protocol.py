"""BASELINE_FLOOR growth protocol (round-8 verdict item 8): the per-query
floor file may only GROW — new queries append floors measured isolated
min-of-3; recorded floors never change in either direction (raising one
quietly loosens the 2x gate, lowering one rewrites judged history).
"""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import BENCH_QUERIES, adjudicate_violations, merge_floors  # noqa: E402


def test_adjudicate_violations_reports_both_numbers_and_verdict():
    """Round-9 verdict item 2: a floor violator is re-measured
    min-of-3 in the same process and the artifact carries BOTH
    numbers. A re-measure clearing the 2x gate reads host_contention;
    one that does not reads regression — so a judge acting on the
    artifact alone can tell the two apart."""
    floor = {"fast": 1.0, "slow": 1.0}
    violations = {"fast": 3.1, "slow": 2.6}  # the sweep's ratios
    calls: dict = {"fast": 0, "slow": 0}
    # fast: contention cleared (samples 1.5, 1.2, 1.4 → min 1.2 = 1.2x)
    # slow: genuinely regressed (all samples ~2.6x the floor)
    samples = {"fast": [1.5, 1.2, 1.4], "slow": [2.7, 2.6, 2.65]}

    def measure_once(q):
        calls[q] += 1
        return samples[q][calls[q] - 1]

    got = adjudicate_violations(measure_once, violations, floor)
    assert calls == {"fast": 3, "slow": 3}  # min-of-3 each
    assert got["fast"] == {
        "sweep_ratio": 3.1,
        "remeasured_sec": 1.2,
        "remeasured_ratio": 1.2,
        "verdict": "host_contention",
    }
    assert got["slow"]["verdict"] == "regression"
    assert got["slow"]["remeasured_ratio"] == 2.6
    assert adjudicate_violations(measure_once, {}, floor) == {}


def test_merge_floors_appends_new_queries():
    old = {"q1": 1.0, "q2": 2.5}
    merged = merge_floors(old, {"q3": 0.7})
    assert merged == {"q1": 1.0, "q2": 2.5, "q3": 0.7}
    assert old == {"q1": 1.0, "q2": 2.5}  # input untouched


def test_merge_floors_rejects_any_overwrite():
    old = {"q1": 1.0}
    with pytest.raises(ValueError, match="append-only"):
        merge_floors(old, {"q1": 0.5})  # downward: rewrites judged history
    with pytest.raises(ValueError, match="append-only"):
        merge_floors(old, {"q1": 2.0})  # upward: loosens the 2x gate
    assert merge_floors(old, {"q1": 1.0}) == old  # identical re-state ok


def test_merge_floors_rejects_nonpositive():
    with pytest.raises(ValueError, match="positive"):
        merge_floors({}, {"q": 0})
    with pytest.raises(ValueError, match="positive"):
        merge_floors({}, {"q": -1.2})


def test_floor_file_covers_registry_or_reports_unfloored():
    """Every bench query is either floored or known-new: the floor file
    must be a SUBSET of the registry (a floor for a deleted query would
    mask a rename slipping past the gate), and the floors themselves
    must be positive seconds."""
    floor_path = Path(__file__).resolve().parents[1] / "BASELINE_FLOOR.json"
    floors = json.loads(floor_path.read_text())["queries"]
    extinct = set(floors) - set(BENCH_QUERIES)
    assert not extinct, f"floors for queries no longer benched: {extinct}"
    assert all(
        isinstance(v, (int, float)) and v > 0 for v in floors.values()
    )
