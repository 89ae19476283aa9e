"""Registry ordering contract.

The driver's correctness gate hash-checks exactly the first 50 entries of
``queries()``. Round 1 shipped three oracle-backed queries past position 50
— they silently received no correctness row at all. These tests make that
class of silent skip impossible: every oracle-backed query must sit inside
the first 50 positions, ahead of every no-oracle entry.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod

DRIVER_CORRECTNESS_CAP = 50


def test_every_oracle_backed_query_within_driver_cap():
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    missing = set(oracles) - set(names)
    assert not missing, f"oracle keys without a queries() entry: {missing}"
    late = [
        n for i, n in enumerate(names) if n in oracles and i >= DRIVER_CORRECTNESS_CAP
    ]
    assert not late, (
        f"oracle-backed queries past position {DRIVER_CORRECTNESS_CAP} would "
        f"silently lose their hash check: {late}"
    )


def test_no_oracle_entries_trail_the_registry():
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    last_oracle = max(i for i, n in enumerate(names) if n in oracles)
    early_unoracled = [
        n for i, n in enumerate(names) if n not in oracles and i < last_oracle
    ]
    assert not early_unoracled, (
        "no-oracle entries interleaved before oracle-backed ones "
        f"(wastes cap slots): {early_unoracled}"
    )
