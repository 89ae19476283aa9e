"""Property-based convergence tests (SURVEY.md §5.4): for random mutation
sets and windows, the copy+update pipeline converges the target to the
source for every row whose insert-day OR update-day falls in the window,
and re-running the same window is a no-op."""

from __future__ import annotations

from datetime import date, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_warehouse_copy_spark.operators.copy import copy_table
from data_warehouse_copy_spark.operators.upsert import update_table
from data_warehouse_copy_spark.sources.managed_table import ManagedTable

BASE = date(2024, 1, 1)
SCHEMA = "pk bigint, ins timestamp_ntz, upd timestamp_ntz, val double"


def _mk_df(spark, rows):
    return spark.createDataFrame(
        [
            (
                pk,
                _ts(ins_off),
                _ts(upd_off),
                float(val),
            )
            for pk, ins_off, upd_off, val in rows
        ],
        SCHEMA,
    )


def _ts(day_offset):
    from datetime import datetime, time

    d = BASE + timedelta(days=day_offset)
    return datetime.combine(d, time(12, 0))


row_strategy = st.tuples(
    st.integers(0, 30),  # insert-day offset
    st.integers(0, 30),  # update-day offset
    st.integers(0, 1000),  # value
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(row_strategy, min_size=1, max_size=25),
    win_start=st.integers(0, 25),
    win_len=st.integers(0, 8),
)
def test_copy_plus_update_converges(spark, tmp_path_factory, rows, win_start, win_len):
    tmp = tmp_path_factory.mktemp("prop")
    src_rows = [(i, *r) for i, r in enumerate(rows)]
    old_rows = [(pk, ins, upd, val - 10000.0) for pk, ins, upd, val in src_rows]
    d1 = BASE + timedelta(days=win_start)
    d2 = d1 + timedelta(days=win_len)
    f, t = d1.isoformat(), d2.isoformat()

    src = _mk_df(spark, src_rows)
    target = ManagedTable.create(spark, str(tmp / "t"))
    target.overwrite(_mk_df(spark, old_rows))  # stale target

    copy_table(src, target, "t", f, t, use_truncate=False, date_column="ins")
    update_table(src, target, "t", f, t, "ins", "upd", "pk")

    got = {r["pk"]: r["val"] for r in target.read().collect()}
    for pk, ins_off, upd_off, val in src_rows:
        ins_d = BASE + timedelta(days=ins_off)
        upd_d = BASE + timedelta(days=upd_off)
        touched = (d1 <= ins_d <= d2) or (d1 <= upd_d <= d2)
        expected = float(val) if touched else float(val) - 10000.0
        assert got[pk] == expected, (pk, touched)

    # idempotence: running the same window again changes nothing
    before = sorted(map(tuple, target.read().collect()))
    copy_table(src, target, "t", f, t, use_truncate=False, date_column="ins")
    update_table(src, target, "t", f, t, "ins", "upd", "pk")
    assert sorted(map(tuple, target.read().collect())) == before


# ---------------------------------------------------------------------------
# Data-skipping soundness: for ANY predicate list, read(where=) must return
# exactly what a full scan + the same filters returns — pruning can drop
# files, never rows.
# ---------------------------------------------------------------------------

_ops = st.sampled_from(["=", "<", "<=", ">", ">="])
_pred = st.tuples(st.sampled_from(["k", "v"]), _ops, st.integers(-50, 1100))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(preds=st.lists(_pred, min_size=1, max_size=3))
def test_read_where_equals_full_filter(spark, tmp_path_factory, preds):
    tmp = tmp_path_factory.mktemp("skip")
    t = ManagedTable.create(spark, tmp / "t", cluster_col="k")
    t.append(
        spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 7 % 311).alias("v")
        )
    )
    got = {
        tuple(r) for r in t.read(where=list(preds)).collect()
    }
    full = t.read()
    for c, op, val in preds:
        col = F.col(c)
        full = full.filter(
            {"=": col == val, "<": col < val, "<=": col <= val,
             ">": col > val, ">=": col >= val}[op]
        )
    assert got == {tuple(r) for r in full.collect()}


# ---------------------------------------------------------------------------
# Predicate-delete soundness: for ANY predicate list, delete(where=) must
# leave exactly the rows a full scan + NOT(conjunction) keeps (NULL-predicate
# rows survive), and report exactly the dropped count — regardless of which
# files the stats pruning chose to rewrite.
# ---------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(preds=st.lists(_pred, min_size=1, max_size=3))
def test_delete_where_equals_full_antifilter(spark, tmp_path_factory, preds):
    tmp = tmp_path_factory.mktemp("del")
    t = ManagedTable.create(spark, tmp / "t", cluster_col="k")
    base = spark.range(1000).select(
        F.col("id").alias("k"),
        # every 9th v is NULL so NULL-predicate survival is exercised
        F.when(F.col("id") % 9 == 0, None)
        .otherwise(F.col("id") * 7 % 311)
        .alias("v"),
    )
    t.append(base)
    pred = None
    for c, op, val in preds:
        col = F.col(c)
        p = {"=": col == val, "<": col < val, "<=": col <= val,
             ">": col > val, ">=": col >= val}[op]
        pred = p if pred is None else (pred & p)
    expected_keep = base.filter(~F.coalesce(pred, F.lit(False)))
    n_expected_del = 1000 - expected_keep.count()

    n = t.delete(list(preds))
    assert n == n_expected_del
    assert {tuple(r) for r in t.read().collect()} == {
        tuple(r) for r in expected_keep.collect()
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(preds=st.lists(_pred, min_size=1, max_size=3), delta=st.integers(1, 500))
def test_update_where_equals_case_projection(spark, tmp_path_factory, preds, delta):
    """For ANY predicate list and SET delta, update(where=, set=) must equal
    the CASE WHEN projection over the original rows: matched rows get the
    new value, NULL-predicate rows keep theirs, cardinality never changes
    — independent of which files stats pruning rewrote."""
    tmp = tmp_path_factory.mktemp("upd")
    t = ManagedTable.create(spark, tmp / "t", cluster_col="k")
    base = spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 9 == 0, None)
        .otherwise(F.col("id") * 7 % 311)
        .alias("v"),
    )
    t.append(base)
    pred = None
    for c, op, val in preds:
        col = F.col(c)
        p = {"=": col == val, "<": col < val, "<=": col <= val,
             ">": col > val, ">=": col >= val}[op]
        pred = p if pred is None else (pred & p)
    hit = F.coalesce(pred, F.lit(False))
    expected = base.select(
        "k", F.when(hit, F.col("v") + delta).otherwise(F.col("v")).alias("v")
    )
    n_expected = base.filter(pred).count()

    n = t.update(list(preds), {"v": F.col("v") + delta})
    assert n == n_expected
    assert t.read().count() == 1000
    assert {tuple(r) for r in t.read().collect()} == {
        tuple(r) for r in expected.collect()
    }


# ---------------------------------------------------------------------------
# managed_table declarative writer ≡ native append/overwrite
# ---------------------------------------------------------------------------

_ds_op = st.tuples(
    st.sampled_from(["w_append", "w_overwrite", "n_append"]),
    st.integers(0, 40),   # range start
    st.integers(1, 15),   # range length
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_ds_op, min_size=1, max_size=5))
def test_datasource_writer_interleaves_with_native(
    spark, tmp_path_factory, ops
):
    """Any interleaving of declarative writes (df.write.format) and native
    ManagedTable.append must equal the same multiset of rows replayed on a
    plain list — the two write protocols share one log, so neither may
    drop, duplicate, or resurrect the other's rows."""
    from data_warehouse_copy_spark.sources.datasource import register
    from data_warehouse_copy_spark.sources.managed_table import ManagedTable

    register(spark)
    tmp = tmp_path_factory.mktemp("dsw_prop")
    root = str(tmp / "t")
    t = ManagedTable.create(spark, root)
    expected: list[tuple] = []
    for kind, lo, n in ops:
        rows = [(lo + i, (lo + i) * 2) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v long")
        if kind == "w_append":
            df.write.format("managed_table").mode("append").save(root)
            expected.extend(rows)
        elif kind == "w_overwrite":
            df.write.format("managed_table").mode("overwrite").save(root)
            expected = list(rows)
        else:
            t.append(df)
            expected.extend(rows)
    native = sorted(map(tuple, t.read().collect()))
    via_ds = sorted(
        map(tuple, spark.read.format("managed_table").load(root).collect())
    )
    assert native == via_ds == sorted(expected)


# ---------------------------------------------------------------- round-10
# WHERE-classifier semantics: for RANDOM boolean expressions, the mixed
# classifier's (sargable tuples + residual exprs) conjunction must filter
# exactly like Spark evaluating the whole original text — the property
# that makes general-predicate SQL DELETE/UPDATE safe to ship.

_PRED_COLS = ("pa", "pb", "pc")


def _pred_strategy():
    leaf = st.one_of(
        st.tuples(
            st.sampled_from(_PRED_COLS),
            st.sampled_from(("=", "<", "<=", ">", ">=", "!=")),
            st.integers(0, 20),
        ).map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
        st.tuples(st.sampled_from(_PRED_COLS), st.integers(0, 9)).map(
            lambda t: f"{t[0]} IN ({t[1]}, {t[1] + 2})"
        ),
        st.sampled_from(_PRED_COLS).map(lambda c: f"{c} IS NULL"),
        st.tuples(
            st.sampled_from(_PRED_COLS), st.integers(0, 10), st.integers(0, 10)
        ).map(lambda t: f"{t[0]} BETWEEN {min(t[1], t[2])} AND {max(t[1], t[2])}"),
        st.sampled_from(("ps LIKE 's1%'", "ps LIKE '%3'", "length(ps) > 2")),
    )

    def combine(children):
        a, b = children
        op = "AND" if (len(a) + len(b)) % 2 else "OR"
        wrap_a = f"({a})" if " OR " in a else a
        wrap_b = f"({b})" if " OR " in b else b
        return f"{wrap_a} {op} {wrap_b}"

    return st.recursive(
        leaf, lambda kids: st.tuples(kids, kids).map(combine), max_leaves=5
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(where=_pred_strategy())
def test_where_classifier_matches_whole_expression(spark, where):
    from data_warehouse_copy_spark.sources.managed_table import (
        _where_predicate,
    )
    from data_warehouse_copy_spark.sources.sql_dml import parse_dml

    df = spark.createDataFrame(
        [
            (
                i,
                None if i % 7 == 0 else i % 13,
                None if i % 11 == 0 else (i * 3) % 17,
                i % 5,
                f"s{i % 23}",
            )
            for i in range(120)
        ],
        "rid int, pa int, pb int, pc int, ps string",
    ).cache()
    st_ = parse_dml(f"DELETE FROM db.t WHERE {where}")
    classified = sorted(
        r.rid for r in df.filter(_where_predicate(st_.where)).collect()
    )
    whole = sorted(r.rid for r in df.filter(where).collect())
    assert classified == whole, (
        f"classifier diverged for {where!r}: parsed {st_.where}"
    )
