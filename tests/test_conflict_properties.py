"""Property-based checks (hypothesis) for the round-12 logical-conflict
algebra — the pieces whose soundness arguments are set-theoretic and
deserve adversarial inputs, not just example tests:

1. ``_where_read_spans`` over-approximates: any row satisfying the FULL
   conjunctive predicate lies inside the extracted region (so a racer
   add excluded by the region provably holds no row the operation read).
2. ``_entry_in_read_spans`` never false-negatives: an entry whose
   min/max stats bracket a row inside the region is always flagged.
3. ``_reconcile_dv_entries`` merges exactly the disjoint-position cases
   and the merged entry's accounting equals base + both deltas; any
   overlap, accounting drift, or non-DV difference refuses.

All driver-side (no SparkSession) — DV parquet built with pyarrow.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    FileEntry,
    ManagedTable,
    _dc_replace,
    _entry_in_read_spans,
    _where_read_spans,
)

_OPS = ["=", "<", "<=", ">", ">="]


def _row_satisfies(row: dict, where) -> bool:
    for c, op, v in where:
        x = row[c]
        if op == "=":
            ok = x == v
        elif op == "<":
            ok = x < v
        elif op == "<=":
            ok = x <= v
        elif op == ">":
            ok = x > v
        elif op == ">=":
            ok = x >= v
        else:
            ok = x in v
        if not ok:
            return False
    return True


@st.composite
def _where_and_rows(draw):
    cols = ["a", "b"]
    n_conj = draw(st.integers(0, 4))
    where = []
    for _ in range(n_conj):
        c = draw(st.sampled_from(cols))
        op = draw(st.sampled_from(_OPS + ["in"]))
        if op == "in":
            vals = draw(st.lists(st.integers(-50, 50), min_size=1, max_size=4))
            where.append((c, op, vals))
        else:
            where.append((c, op, draw(st.integers(-50, 50))))
    rows = draw(
        st.lists(
            st.fixed_dictionaries(
                {c: st.integers(-60, 60) for c in cols}
            ),
            min_size=1,
            max_size=8,
        )
    )
    return where, rows


@given(_where_and_rows())
@settings(max_examples=300, deadline=None)
def test_read_region_over_approximates_the_predicate(wr):
    """Rows the predicate ACCEPTS always fall inside the extracted
    region (the region may be wider — never narrower)."""
    where, rows = wr
    spans = _where_read_spans(where)
    matching = [r for r in rows if _row_satisfies(r, where)]
    if not matching:
        return
    entry = {
        "path": "p",
        "rows": len(matching),
        "stats": {
            c: [min(r[c] for r in matching), max(r[c] for r in matching)]
            for c in ("a", "b")
        },
    }
    assert _entry_in_read_spans(entry, spans), (where, spans, matching)


@given(
    st.lists(st.integers(-60, 60), min_size=1, max_size=6),
    st.dictionaries(
        st.sampled_from(["a", "b"]),
        st.tuples(
            st.one_of(st.none(), st.integers(-50, 50)),
            st.one_of(st.none(), st.integers(-50, 50)),
        ),
        max_size=2,
    ),
)
@settings(max_examples=300, deadline=None)
def test_entry_in_spans_no_false_negative(vals, spans):
    """If SOME value per span column lies inside its span, the entry
    whose stats bracket those values must be flagged as overlapping."""
    inside = {}
    for c, (lo, hi) in spans.items():
        cands = [
            v
            for v in vals
            if (lo is None or v >= lo) and (hi is None or v <= hi)
        ]
        if not cands:
            return  # no witness row constructible: nothing to assert
        inside[c] = cands[0]
    entry = {
        "path": "p",
        "rows": 1,
        "stats": {
            c: [min(vals + [inside.get(c, vals[0])]),
                max(vals + [inside.get(c, vals[0])])]
            for c in ("a", "b")
        },
    }
    assert _entry_in_read_spans(entry, spans)


def _mk_dv(root: Path, name: str, data_path: str, positions) -> str:
    rel = f"_dv/{name}"
    p = root / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "file_uri": pa.array(
                    [f"file:/x/{data_path}"] * len(positions)
                ),
                "file_path": pa.array([data_path] * len(positions)),
                "pos": pa.array(list(positions), type=pa.int64()),
            }
        ),
        str(p),
    )
    return rel


@given(
    st.sets(st.integers(0, 49), min_size=1, max_size=10),
    st.sets(st.integers(0, 49), min_size=1, max_size=10),
    st.sets(st.integers(0, 49), max_size=5),
)
@settings(max_examples=60, deadline=None)
def test_dv_reconcile_merges_iff_disjoint(tmp_path_factory, ours_pos, racer_pos, base_pos):
    """Reconciliation succeeds exactly when the two writers' position
    DELTAS (beyond the shared base DV) are disjoint, and the merged
    accounting equals base + both deltas."""
    root = tmp_path_factory.mktemp("dvprop")
    t = ManagedTable(None, root)
    data_path = "data/c0/f.parquet"
    ours_pos = ours_pos - base_pos
    racer_pos = racer_pos - base_pos
    if not ours_pos or not racer_pos:
        return
    base_dvs = ()
    if base_pos:
        base_dvs = (_mk_dv(root, "base.parquet", data_path, base_pos),)
    dv_o = _mk_dv(root, "ours.parquet", data_path, ours_pos)
    dv_r = _mk_dv(root, "racer.parquet", data_path, racer_pos)
    base_entry = FileEntry(
        path=data_path,
        partition=None,
        rows=100,
        stats={"k": [0, 99]},
        dv_paths=base_dvs,
        dv_rows=len(base_pos),
    )
    ours = _dc_replace(
        base_entry,
        dv_paths=base_entry.dv_paths + (dv_o,),
        dv_rows=base_entry.dv_rows + len(ours_pos),
    )
    racer = dict(
        path=data_path,
        partition=None,
        rows=100,
        stats={"k": [0, 99]},
        dv_paths=list(base_entry.dv_paths + (dv_r,)),
        dv_rows=base_entry.dv_rows + len(racer_pos),
    )
    merged = t._reconcile_dv_entries(data_path, ours, racer)
    if ours_pos & racer_pos:
        assert merged is None  # overlapping rows: genuine conflict
    else:
        assert merged is not None
        assert merged.dv_rows == len(base_pos) + len(ours_pos) + len(
            racer_pos
        )
        assert set(merged.dv_paths) == set(base_dvs) | {dv_o, dv_r}


def test_dv_reconcile_refuses_non_dv_difference(tmp_path):
    """Anything beyond pure DV growth (different rows/stats) refuses."""
    t = ManagedTable(None, tmp_path)
    data_path = "data/c0/f.parquet"
    dv_o = _mk_dv(tmp_path, "o.parquet", data_path, {1})
    dv_r = _mk_dv(tmp_path, "r.parquet", data_path, {2})
    ours = FileEntry(
        path=data_path, partition=None, rows=100,
        stats={"k": [0, 99]}, dv_paths=(dv_o,), dv_rows=1,
    )
    racer = dict(
        path=data_path, partition=None, rows=101,  # rows differ
        stats={"k": [0, 99]}, dv_paths=[dv_r], dv_rows=1,
    )
    assert t._reconcile_dv_entries(data_path, ours, racer) is None
    # accounting drift (claimed dv_rows disagrees with positions) refuses
    racer2 = dict(
        path=data_path, partition=None, rows=100,
        stats={"k": [0, 99]}, dv_paths=[dv_r], dv_rows=7,
    )
    assert t._reconcile_dv_entries(data_path, ours, racer2) is None
