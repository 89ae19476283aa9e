"""CREATE MATERIALIZED VIEW over the continuous-aggregate engine
(round-13 verdict item 5).

The stored SELECT becomes the rollup's aggregator (ContinuousAggregate's
``agg_fn`` hook), materialized day-partitioned; the grammar requires a
day-aligned ``window(ts, '<dur>')`` bucket plus a ``window_start`` output
column — the invariants that make per-day refresh exact. Reads are EXACT
at the raw head (rollup ∪ touched-days re-aggregate, touched from the
change feed past the cursor); REFRESH materializes exactly the touched
days and advances the persisted cursor; staleness surfaces in DESCRIBE
DETAIL / SHOW MATERIALIZED VIEWS.
"""

from __future__ import annotations

import datetime
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)
from data_warehouse_copy_spark.sources.names import NamedCatalog  # noqa: E402
from data_warehouse_copy_spark.sources.sql_dml import SqlDmlError  # noqa: E402


def _mk_raw(spark, tmp_path, days=3, rows_per_day=48):
    """Deterministic multi-day event table: rows every 30 min, two
    event types, value = a simple function of the row index."""
    rows = []
    for d in range(days):
        for i in range(rows_per_day):
            ts = datetime.datetime(2024, 3, 1 + d, 0, 0) + datetime.timedelta(
                minutes=30 * i
            )
            rows.append(
                (ts, "click" if i % 2 == 0 else "view", float(d * 100 + i))
            )
    raw = ManagedTable.create(spark, tmp_path / "raw")
    # one append per day -> per-day raw files, so the day-bounded
    # refresh/read scans are file-level prunable (and testable as such)
    for d in range(days):
        day = f"2024-03-0{1 + d}"
        raw.append(
            spark.createDataFrame(
                [r for r in rows if str(r[0].date()) == day],
                "ts timestamp_ntz, event_type string, value double",
            ).coalesce(1)
        )
    cat = NamedCatalog(tmp_path / "cat.json")
    cat.register("global_temp.mraw", str(tmp_path / "raw"))
    cat.attach(spark)
    return cat, raw


MV_DDL = (
    "CREATE MATERIALIZED VIEW global_temp.mmv LOCATION '{loc}' AS "
    "SELECT window.start AS window_start, event_type, COUNT(*) AS n, "
    "SUM(CAST(value AS DECIMAL(18,6))) AS tv "
    "FROM global_temp.mraw GROUP BY window(ts, '1 hour'), event_type"
)

RECOMPUTE = (
    "SELECT window.start AS window_start, event_type, COUNT(*) AS n, "
    "SUM(CAST(value AS DECIMAL(18,6))) AS tv "
    "FROM global_temp.mraw GROUP BY window(ts, '1 hour'), event_type"
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _recompute(spark, cat):
    """Fresh full recompute: re-attach first — an attached view pins the
    registration-time snapshot, so post-attach commits need a refresh."""
    cat.refresh(spark)
    return _rows(spark.sql(RECOMPUTE))


def test_matview_create_read_equals_recompute(spark, tmp_path):
    cat, _raw = _mk_raw(spark, tmp_path)
    r = cat.sql(spark, MV_DDL.format(loc=tmp_path / "mv")).first()
    assert r.operation == "CREATE MATERIALIZED VIEW" and r.rows_affected > 0
    got = _rows(cat.sql(spark, "SELECT * FROM global_temp.mmv"))
    want = _rows(spark.sql(RECOMPUTE))
    assert got == want and len(got) == 3 * 24 * 2
    # programmatic resolution too
    assert _rows(cat.table(spark, "global_temp.mmv")) == want
    # the store really is a day-partitioned managed table
    mv_store = ManagedTable(spark, tmp_path / "mv")
    assert mv_store.snapshot().partition_date_col == "window_start"


def test_matview_reads_exact_between_refreshes(spark, tmp_path):
    """Late DML (append AND a DV delete on an old day) is visible in MV
    reads BEFORE any refresh — the hybrid union re-aggregates exactly
    the touched days from the change feed."""
    cat, raw = _mk_raw(spark, tmp_path)
    cat.sql(spark, MV_DDL.format(loc=tmp_path / "mv"))
    raw.append(
        spark.createDataFrame(
            [(datetime.datetime(2024, 3, 2, 5, 15), "late", 7.0)],
            "ts timestamp_ntz, event_type string, value double",
        )
    )
    cat.sql(
        spark,
        "DELETE FROM global_temp.mraw WHERE event_type = 'view' "
        "AND value < 10",
    )
    d = cat.sql(spark, "DESCRIBE DETAIL global_temp.mmv").first()
    assert d.stale and d.pending_days == ["2024-03-01", "2024-03-02"]
    got = _rows(cat.sql(spark, "SELECT * FROM global_temp.mmv"))
    assert got == _recompute(spark, cat)  # exact pre-refresh
    # refresh folds it in, day-scoped, and clears staleness
    rr = cat.sql(
        spark, "REFRESH MATERIALIZED VIEW global_temp.mmv"
    ).first()
    assert rr.refreshed_days == ["2024-03-01", "2024-03-02"]
    d2 = cat.sql(spark, "DESCRIBE DETAIL global_temp.mmv").first()
    assert not d2.stale and d2.pending_days == []
    assert d2.cursor == rr.cursor
    assert _rows(
        cat.sql(spark, "SELECT * FROM global_temp.mmv")
    ) == _recompute(spark, cat)


def test_matview_refresh_cost_is_day_scoped(spark, tmp_path):
    """Touching ONE day leaves every other day's rollup files untouched
    (partition-level range overwrite): refresh cost ∝ changed days, not
    history — the 100 TB contract."""
    cat, raw = _mk_raw(spark, tmp_path, days=4)
    cat.sql(spark, MV_DDL.format(loc=tmp_path / "mv"))
    store = ManagedTable(spark, tmp_path / "mv")
    before = {
        f.path: f.partition for f in store.snapshot().files
    }
    raw.append(
        spark.createDataFrame(
            [(datetime.datetime(2024, 3, 3, 1, 0), "click", 1.0)],
            "ts timestamp_ntz, event_type string, value double",
        )
    )
    rr = cat.sql(
        spark, "REFRESH MATERIALIZED VIEW global_temp.mmv"
    ).first()
    assert rr.refreshed_days == ["2024-03-03"]
    assert rr.rows_deleted == 48  # one day's groups (24 h x 2 types)
    after = {f.path: f.partition for f in store.snapshot().files}
    kept = {p for p in before if p in after}
    lost = {p for p in before if p not in after}
    # every replaced file belonged to the touched day; the rest survive
    assert lost and all(before[p] == "2024-03-03" for p in lost)
    assert all(
        before[p] == after[p] for p in kept
    ) and any(before[p] != "2024-03-03" for p in kept)
    # idempotent: a refresh with no changes touches nothing
    rr2 = cat.sql(
        spark, "REFRESH MATERIALIZED VIEW global_temp.mmv"
    ).first()
    assert rr2.refreshed_days == [] and rr2.rows_deleted == 0
    # ... and the RAW-side re-aggregate scan is file-level pruned to
    # the touched day's span (a Python DS relation gets no pushed
    # filters, so this bound is what keeps refresh from opening the
    # whole history at 100 TB)
    import json as _json

    from data_warehouse_copy_spark.sources.datasource import (
        ManagedTableBatchReader,
    )
    from data_warehouse_copy_spark.streaming.rollup import _day_span_bounds

    bounds = _day_span_bounds("ts", ["2024-03-03"])
    rd = ManagedTableBatchReader(
        str(raw.root),
        {"where": _json.dumps([list(b) for b in bounds])},
        raw.read().schema,
    )
    n_raw_files = len(raw.snapshot().files)
    assert n_raw_files >= 4
    assert len(rd.partitions()) < n_raw_files


def test_matview_grammar_validation(spark, tmp_path):
    cat, _raw = _mk_raw(spark, tmp_path)
    loc = tmp_path / "mv"
    # no window bucket
    with pytest.raises(SqlDmlError, match="window"):
        cat.sql(
            spark,
            f"CREATE MATERIALIZED VIEW global_temp.bad LOCATION '{loc}' "
            f"AS SELECT event_type, COUNT(*) AS n, "
            f"CAST(NULL AS TIMESTAMP) AS window_start "
            f"FROM global_temp.mraw GROUP BY event_type",
        )
    # duration must divide 24 h
    with pytest.raises(SqlDmlError, match="divide 24"):
        cat.sql(
            spark,
            f"CREATE MATERIALIZED VIEW global_temp.bad LOCATION '{loc}' "
            f"AS SELECT window.start AS window_start, COUNT(*) AS n "
            f"FROM global_temp.mraw GROUP BY window(ts, '5 hours')",
        )
    # window_start output required
    with pytest.raises(SqlDmlError, match="window_start"):
        cat.sql(
            spark,
            f"CREATE MATERIALIZED VIEW global_temp.bad LOCATION '{loc}' "
            f"AS SELECT window.start AS ws, COUNT(*) AS n "
            f"FROM global_temp.mraw GROUP BY window(ts, '1 hour')",
        )
    # unregistered base
    with pytest.raises(SqlDmlError, match="registered"):
        cat.sql(
            spark,
            f"CREATE MATERIALIZED VIEW global_temp.bad LOCATION '{loc}' "
            f"AS SELECT window.start AS window_start, COUNT(*) AS n "
            f"FROM global_temp.nosuch GROUP BY window(ts, '1 hour')",
        )
    assert cat.matview_names() == []
    # a failed build never persists the MV
    assert "global_temp.bad" not in cat.matview_names()


def test_matview_name_clashes_and_drop(spark, tmp_path):
    cat, _raw = _mk_raw(spark, tmp_path)
    cat.sql(spark, MV_DDL.format(loc=tmp_path / "mv"))
    # duplicate CREATE
    with pytest.raises(SqlDmlError, match="already exists"):
        cat.sql(spark, MV_DDL.format(loc=tmp_path / "mv2"))
    # a view cannot shadow it, nor a table registration
    with pytest.raises(Exception, match="MATERIALIZED"):
        cat.sql(
            spark,
            "CREATE VIEW global_temp.mmv AS SELECT 1 AS one",
        )
    with pytest.raises(ValueError, match="MATERIALIZED"):
        cat.register("global_temp.mmv", str(tmp_path / "raw"))
    # write guard
    with pytest.raises(SqlDmlError, match="read-only"):
        cat.sql(spark, "DELETE FROM global_temp.mmv WHERE n > 0")
    # SHOW lists it with staleness
    row = cat.sql(spark, "SHOW MATERIALIZED VIEWS").first()
    assert row.name == "global_temp.mmv" and row.pending_days == []
    # drop; IF EXISTS tolerates a rerun; store data survives on disk
    cat.sql(spark, "DROP MATERIALIZED VIEW global_temp.mmv")
    assert cat.matview_names() == []
    cat.sql(spark, "DROP MATERIALIZED VIEW IF EXISTS global_temp.mmv")
    with pytest.raises(SqlDmlError, match="not in catalog"):
        cat.sql(spark, "DROP MATERIALIZED VIEW global_temp.mmv")
    assert ManagedTable(spark, tmp_path / "mv").read().count() > 0


def test_matview_show_create_reruns(spark, tmp_path):
    """SHOW CREATE TABLE on an MV emits the CREATE MATERIALIZED VIEW
    DDL, and (after a DROP) the emitted text re-runs verbatim,
    rebuilding the store at the same location."""
    cat, _raw = _mk_raw(spark, tmp_path)
    cat.sql(spark, MV_DDL.format(loc=tmp_path / "mv"))
    ddl = cat.sql(
        spark, "SHOW CREATE TABLE global_temp.mmv"
    ).first().createtab_stmt
    assert ddl.startswith("CREATE MATERIALIZED VIEW global_temp.mmv")
    assert "window(ts, '1 hour')" in ddl
    cat.sql(spark, "DROP MATERIALIZED VIEW global_temp.mmv")
    cat.sql(spark, ddl)  # re-runs verbatim
    assert cat.matview_names() == ["global_temp.mmv"]
    assert _rows(
        cat.sql(spark, "SELECT * FROM global_temp.mmv")
    ) == _recompute(spark, cat)


def test_view_composes_over_matview(spark, tmp_path):
    """A plain SQL view may SELECT from a materialized view: the MV
    reference resolves at read time (after view inlining), so the view
    stays LIVE — late base DML shows through both layers, exactly."""
    cat, raw = _mk_raw(spark, tmp_path)
    cat.sql(spark, MV_DDL.format(loc=tmp_path / "mv"))
    cat.sql(
        spark,
        "CREATE VIEW global_temp.vtop AS SELECT event_type, "
        "SUM(n) AS total FROM global_temp.mmv GROUP BY event_type",
    )
    got = sorted(
        map(tuple, cat.sql(spark, "SELECT * FROM global_temp.vtop").collect())
    )
    assert got == [("click", 72), ("view", 72)]
    raw.append(
        spark.createDataFrame(
            [(datetime.datetime(2024, 3, 1, 9, 0), "click", 2.0)],
            "ts timestamp_ntz, event_type string, value double",
        )
    )
    got2 = sorted(
        map(tuple, cat.sql(spark, "SELECT * FROM global_temp.vtop").collect())
    )
    assert got2 == [("click", 73), ("view", 72)]  # live through BOTH layers
    # programmatic view resolution composes too
    assert sorted(
        map(tuple, cat.table(spark, "global_temp.vtop").collect())
    ) == got2


def test_matview_name_in_string_literal_not_replaced(spark, tmp_path):
    """Adversarial identifier collision (the r12 verdict's watch item for
    text rewriting): the MV name inside a STRING LITERAL must survive
    resolution untouched — only ident tokens are swapped."""
    cat, _raw = _mk_raw(spark, tmp_path)
    cat.sql(spark, MV_DDL.format(loc=tmp_path / "mv"))
    r = cat.sql(
        spark,
        "SELECT 'global_temp.mmv' AS lit, COUNT(*) AS n "
        "FROM global_temp.mmv",
    ).first()
    assert r.lit == "global_temp.mmv" and r.n == 144
    # ... and a column alias shaped like the short name stays intact
    r2 = cat.sql(
        spark,
        "SELECT mmv.event_type, COUNT(*) AS n FROM global_temp.mmv "
        "GROUP BY mmv.event_type ORDER BY mmv.event_type",
    ).collect()
    assert [x.event_type for x in r2] == ["click", "view"]


def test_matview_persists_across_catalog_reopen(spark, tmp_path):
    cat, raw = _mk_raw(spark, tmp_path)
    cat.sql(spark, MV_DDL.format(loc=tmp_path / "mv"))
    cat2 = NamedCatalog(tmp_path / "cat.json")
    assert cat2.matview_names() == ["global_temp.mmv"]
    raw.append(
        spark.createDataFrame(
            [(datetime.datetime(2024, 3, 1, 9, 0), "click", 2.0)],
            "ts timestamp_ntz, event_type string, value double",
        )
    )
    got = _rows(cat2.sql(spark, "SELECT * FROM global_temp.mmv"))
    assert got == _recompute(spark, cat2)  # cursor + text survived
