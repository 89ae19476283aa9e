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

from bench import BENCH_QUERIES, merge_floors  # noqa: E402


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
