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
    # no GROUP BY at all (global aggregate): loud — neither kind
    with pytest.raises(SqlDmlError, match="GROUP BY"):
        cat.sql(
            spark,
            f"CREATE MATERIALIZED VIEW global_temp.bad LOCATION '{loc}' "
            f"AS SELECT COUNT(*) AS n FROM global_temp.mraw",
        )
    # expression grouping key without a window bucket: loud (round-14:
    # a windowless GROUP BY is the dims kind, which needs plain refs)
    with pytest.raises(SqlDmlError, match="plain column"):
        cat.sql(
            spark,
            f"CREATE MATERIALIZED VIEW global_temp.bad LOCATION '{loc}' "
            f"AS SELECT upper(event_type) AS e, COUNT(*) AS n "
            f"FROM global_temp.mraw GROUP BY upper(event_type)",
        )
    # dims kind: every grouping column must be a plain select item
    with pytest.raises(SqlDmlError, match="plain select item"):
        cat.sql(
            spark,
            f"CREATE MATERIALIZED VIEW global_temp.bad LOCATION '{loc}' "
            f"AS SELECT COUNT(*) AS n "
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


# ---------------------------------------------------------------------------
# Round-14 (verdict item 3): dims-kind materialized views — plain
# ``GROUP BY dims`` rollups with KEY-scoped CDC refresh (the touched
# group keys come from the change feed; exactly that region of the store
# is swapped for its re-aggregate in one atomic replace_where).
# ---------------------------------------------------------------------------


def _mk_dims_raw(spark, tmp_path):
    raw = ManagedTable.create(spark, tmp_path / "draw")
    raw.append(
        spark.createDataFrame(
            [("eu", "ok", 10), ("eu", "ok", 5), ("eu", "err", 1),
             ("us", "ok", 7), ("ap", "ok", 2), ("ap", "err", 3)],
            "region string, status string, amount int",
        )
    )
    cat = NamedCatalog(tmp_path / "cat.json")
    cat.register("global_temp.draw", str(tmp_path / "draw"))
    cat.attach(spark)
    return cat, raw


DIMS_DDL = (
    "CREATE MATERIALIZED VIEW global_temp.dmv LOCATION '{loc}' AS "
    "SELECT region, status AS st, COUNT(*) AS n, SUM(amount) AS total "
    "FROM global_temp.draw GROUP BY region, status"
)

DIMS_RECOMPUTE = (
    "SELECT region, status AS st, COUNT(*) AS n, SUM(amount) AS total "
    "FROM global_temp.draw GROUP BY region, status"
)


def test_matview_dims_create_read_refresh_exact(spark, tmp_path):
    """Create / exact pre-refresh reads under late DML (new group, grown
    group, VANISHED group) / key-scoped refresh / staleness surfaces.
    The store key uses the select-list ALIAS (status AS st)."""
    cat, raw = _mk_dims_raw(spark, tmp_path)
    r = cat.sql(spark, DIMS_DDL.format(loc=tmp_path / "dmv")).first()
    assert r.operation == "CREATE MATERIALIZED VIEW" and r.rows_affected == 5

    def recompute():
        cat.refresh(spark)
        return _rows(spark.sql(DIMS_RECOMPUTE))

    got = _rows(cat.sql(spark, "SELECT * FROM global_temp.dmv"))
    assert got == recompute() and len(got) == 5
    # late DML: grow eu-ok, add a brand-new group, vanish us entirely
    raw.append(
        spark.createDataFrame(
            [("eu", "ok", 100), ("sa", "new", 9)],
            "region string, status string, amount int",
        )
    )
    raw.delete([("region", "=", "us")])
    d = cat.sql(spark, "DESCRIBE DETAIL global_temp.dmv").first()
    assert d.stale and sorted(d.pending_days) == [
        "region=eu,status=ok", "region=sa,status=new",
        "region=us,status=ok",
    ]
    assert _rows(
        cat.sql(spark, "SELECT * FROM global_temp.dmv")
    ) == recompute()  # exact BEFORE any refresh
    rr = cat.sql(spark, "REFRESH MATERIALIZED VIEW global_temp.dmv").first()
    assert sorted(rr.refreshed_days) == [
        "region=eu,status=ok", "region=sa,status=new",
        "region=us,status=ok",
    ]
    # touched region = region IN (eu,sa,us) x status IN (ok,new):
    # deletes eu-ok + us-ok (eu-err is outside the region and stays),
    # re-inserts eu-ok + sa-new; the vanished us-ok group is NOT
    # re-inserted
    assert rr.rows_deleted == 2 and rr.rows_inserted == 2
    d2 = cat.sql(spark, "DESCRIBE DETAIL global_temp.dmv").first()
    assert not d2.stale and d2.pending_days == []
    want = recompute()
    assert _rows(cat.sql(spark, "SELECT * FROM global_temp.dmv")) == want
    # the persisted store alone (no hybrid) now equals the recompute
    assert _rows(ManagedTable(spark, tmp_path / "dmv").read()) == want
    assert not any(r[0] == "us" for r in want)  # group really vanished


def test_matview_dims_refresh_leaves_untouched_files_alone(spark, tmp_path):
    """Key-scoped refresh cost pin: replace_where's DV strategy keeps
    every store file whose stats provably miss the touched region —
    untouched groups' files survive REFRESH byte-identical."""
    cat, raw = _mk_dims_raw(spark, tmp_path)
    cat.sql(spark, DIMS_DDL.format(loc=tmp_path / "dmv"))
    store = ManagedTable(spark, tmp_path / "dmv")
    before = {f.path for f in store.snapshot().files}
    assert before
    raw.append(
        spark.createDataFrame(
            [("zz", "ok", 1)], "region string, status string, amount int"
        )
    )
    cat.sql(spark, "REFRESH MATERIALIZED VIEW global_temp.dmv")
    after = {f.path for f in store.snapshot().files}
    # 'zz' sorts past every pre-existing region: the original files'
    # stats exclude the touched region, so they all survive
    assert before <= after and len(after) > len(before)


def test_matview_dims_null_group_keys_stay_exact(spark, tmp_path):
    """NULL group keys are legal GROUP BY output: the hybrid read joins
    null-SAFELY (a null-unsafe semi/anti pair would serve the stale
    store row for the NULL group), and refresh detects NULL keys and
    falls back to one atomic full rebuild (in-lists cannot express
    NULL)."""
    cat, raw = _mk_dims_raw(spark, tmp_path)
    cat.sql(spark, DIMS_DDL.format(loc=tmp_path / "dmv"))

    def nrows(df):
        # None-tolerant row sort (NULL group keys are the point here)
        return sorted(
            map(tuple, df.collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    def recompute():
        cat.refresh(spark)
        return nrows(spark.sql(DIMS_RECOMPUTE))

    raw.append(
        spark.createDataFrame(
            [(None, "ok", 50), (None, None, 4), ("eu", "ok", 1)],
            "region string, status string, amount int",
        )
    )
    assert nrows(
        cat.sql(spark, "SELECT * FROM global_temp.dmv")
    ) == recompute()
    rr = cat.sql(spark, "REFRESH MATERIALIZED VIEW global_temp.dmv").first()
    assert rr.refreshed_days == ["<full-rebuild>"]
    assert nrows(
        cat.sql(spark, "SELECT * FROM global_temp.dmv")
    ) == recompute()
    # and NULL-group updates after the rebuild stay exact too
    raw.append(
        spark.createDataFrame(
            [(None, "ok", 7)], "region string, status string, amount int"
        )
    )
    assert nrows(
        cat.sql(spark, "SELECT * FROM global_temp.dmv")
    ) == recompute()


def test_matview_auto_refresh_policy(spark, tmp_path, monkeypatch):
    """Round-14 (verdict item 7): ``matview.autoRefresh`` drives a
    best-effort post-commit refresh through the catalog-SQL surface —
    a mutating statement on the base leaves the MV's cursor at head
    (store fresh, no pending work) without any explicit REFRESH.
    Toggleable via ALTER TABLE SET/UNSET TBLPROPERTIES on the MV name;
    SHOW CREATE TABLE emits the property and the emitted DDL re-runs;
    hook failures are swallowed (the triggering commit already
    succeeded)."""
    cat, raw = _mk_dims_raw(spark, tmp_path)
    cat.sql(
        spark,
        DIMS_DDL.format(loc=tmp_path / "dmv").replace(
            "AS SELECT",
            "TBLPROPERTIES ('matview.autoRefresh' = 'true') AS SELECT",
        ),
    )
    assert cat.matview("global_temp.dmv")["auto_refresh"] is True
    cat.sql(
        spark, "DELETE FROM global_temp.draw WHERE region = 'us'"
    )
    d = cat.sql(spark, "DESCRIBE DETAIL global_temp.dmv").first()
    assert not d.stale and d.pending_days == []  # hook already folded it
    assert not any(
        r.region == "us"
        for r in ManagedTable(spark, tmp_path / "dmv").read().collect()
    )
    # UNSET turns the policy off: the next DML leaves the MV stale
    cat.sql(
        spark,
        "ALTER TABLE global_temp.dmv UNSET TBLPROPERTIES "
        "('matview.autoRefresh')",
    )
    cat.sql(spark, "DELETE FROM global_temp.draw WHERE region = 'ap'")
    assert cat.sql(spark, "DESCRIBE DETAIL global_temp.dmv").first().stale
    # SET turns it back on; SHOW CREATE emits it and the DDL re-runs
    cat.sql(
        spark,
        "ALTER TABLE global_temp.dmv SET TBLPROPERTIES "
        "('matview.autoRefresh' = 'true')",
    )
    ddl = cat.sql(
        spark, "SHOW CREATE TABLE global_temp.dmv"
    ).first().createtab_stmt
    assert "TBLPROPERTIES ('matview.autoRefresh' = 'true')" in ddl
    cat.sql(spark, "DROP MATERIALIZED VIEW global_temp.dmv")
    cat.sql(spark, ddl)
    assert cat.matview("global_temp.dmv")["auto_refresh"] is True
    # unknown MV property: loud
    with pytest.raises(SqlDmlError, match="matview.autoRefresh"):
        cat.sql(
            spark,
            "ALTER TABLE global_temp.dmv SET TBLPROPERTIES "
            "('autoCompact' = 'true')",
        )
    # best-effort: a hook failure never fails the triggering commit
    from data_warehouse_copy_spark.streaming import matview as mv_mod

    def boom(self):
        raise RuntimeError("synthetic refresh failure")

    monkeypatch.setattr(mv_mod.MaterializedView, "refresh", boom)
    r = cat.sql(
        spark, "DELETE FROM global_temp.draw WHERE region = 'eu'"
    ).first()
    assert r.operation == "DELETE" and r.rows_affected > 0
    monkeypatch.undo()
    # ... and the MV read is STILL exact (hybrid) despite the dead hook
    cat.refresh(spark)
    assert _rows(cat.sql(spark, "SELECT * FROM global_temp.dmv")) == _rows(
        spark.sql(DIMS_RECOMPUTE)
    )


def test_view_over_matview_mirror_staleness_contract(spark, tmp_path):
    """Round-14 (advice item): a catalog view whose body references an
    MV serves, through PLAIN spark.sql over its session mirror, the MV
    state pinned at the LAST resolution (view creation, any cat.sql
    read of the MV, attach/refresh) — the same attach-pinning contract
    table views carry. The exactness contract: cat.sql stays exact with
    no refresh at all, and cat.refresh(spark) re-pins the mirror."""
    cat, raw = _mk_dims_raw(spark, tmp_path)
    cat.sql(spark, DIMS_DDL.format(loc=tmp_path / "dmv"))
    cat.sql(
        spark,
        "CREATE VIEW global_temp.vmv AS SELECT region, SUM(total) AS t "
        "FROM global_temp.dmv GROUP BY region",
    )
    before = _rows(spark.sql("SELECT * FROM global_temp.vmv"))
    assert before == _rows(cat.sql(spark, "SELECT * FROM global_temp.vmv"))

    def oracle():
        return sorted(
            (r.region, r.t)
            for r in raw.read()
            .groupBy("region")
            .agg({"amount": "sum"})
            .withColumnRenamed("sum(amount)", "t")
            .collect()
        )

    raw.append(
        spark.createDataFrame(
            [("eu", "ok", 1000)], "region string, status string, amount int"
        )
    )
    # plain SQL over the mirror: pinned at the LAST resolution (the
    # CREATE) — the documented staleness boundary
    assert _rows(spark.sql("SELECT * FROM global_temp.vmv")) == before
    # cat.sql re-resolves per statement: exact with NO refresh
    got = _rows(cat.sql(spark, "SELECT * FROM global_temp.vmv"))
    assert got != before and got == oracle()
    # a SECOND base write with no intervening resolution: the mirror
    # serves the previous resolution's state, until refresh re-pins
    raw.append(
        spark.createDataFrame(
            [("ap", "ok", 500)], "region string, status string, amount int"
        )
    )
    assert _rows(spark.sql("SELECT * FROM global_temp.vmv")) == got
    cat.refresh(spark)
    assert _rows(spark.sql("SELECT * FROM global_temp.vmv")) == oracle()


# ---------------------------------------------------------------- star-join


def _mk_star(spark, tmp_path):
    """Fact table (the _mk_raw events) + a small dim keyed by
    event_type, both registered — the star-join MV fixture."""
    cat, raw = _mk_raw(spark, tmp_path)
    dim = ManagedTable.create(spark, tmp_path / "dim")
    dim.append(
        spark.createDataFrame(
            [("click", "engage"), ("view", "passive"), ("late", "other")],
            "event_type string, category string",
        )
    )
    cat.register("global_temp.mdim", str(tmp_path / "dim"))
    cat.attach(spark)
    return cat, raw, dim


STAR_DDL = (
    "CREATE MATERIALIZED VIEW global_temp.msv LOCATION '{loc}' AS "
    "SELECT window.start AS window_start, d.category AS category, "
    "COUNT(*) AS n, SUM(CAST(f.value AS DECIMAL(18,6))) AS tv "
    "FROM global_temp.mraw f JOIN global_temp.mdim d "
    "ON f.event_type = d.event_type "
    "GROUP BY window(f.ts, '1 hour'), d.category"
)

STAR_RECOMPUTE = (
    "SELECT window.start AS window_start, d.category AS category, "
    "COUNT(*) AS n, SUM(CAST(f.value AS DECIMAL(18,6))) AS tv "
    "FROM global_temp.mraw f JOIN global_temp.mdim d "
    "ON f.event_type = d.event_type "
    "GROUP BY window(f.ts, '1 hour'), d.category"
)


def _star_recompute(spark, cat):
    cat.refresh(spark)
    return _rows(spark.sql(STAR_RECOMPUTE))


def test_matview_star_create_read_equals_recompute(spark, tmp_path):
    cat, _raw, _dim = _mk_star(spark, tmp_path)
    r = cat.sql(spark, STAR_DDL.format(loc=tmp_path / "msv")).first()
    assert r.operation == "CREATE MATERIALIZED VIEW" and r.rows_affected > 0
    got = _rows(cat.sql(spark, "SELECT * FROM global_temp.msv"))
    assert got == _rows(spark.sql(STAR_RECOMPUTE))
    # the catalog carries the star metadata: joined dims + their pins
    meta = cat.matview("global_temp.msv")
    assert meta["join_dims"] == ["global_temp.mdim"]
    assert "global_temp.mdim" in (meta.get("dim_cursors") or {})
    # SHOW CREATE round-trips the join body
    ddl = cat.sql(
        spark, "SHOW CREATE TABLE global_temp.msv"
    ).first().createtab_stmt
    assert "JOIN global_temp.mdim" in ddl


def test_matview_star_fact_churn_stays_day_scoped(spark, tmp_path):
    """Fact-only late DML keeps the window machinery: exact hybrid
    reads pre-refresh, day-scoped REFRESH (touched days only, other
    days' store files byte-identical), no full rebuild."""
    cat, raw, _dim = _mk_star(spark, tmp_path)
    cat.sql(spark, STAR_DDL.format(loc=tmp_path / "msv"))
    store = ManagedTable(spark, tmp_path / "msv")
    before = {f.path for f in store.snapshot().files}
    raw.append(
        spark.createDataFrame(
            [(datetime.datetime(2024, 3, 2, 5, 15), "late", 7.0)],
            "ts timestamp_ntz, event_type string, value double",
        )
    )
    d = cat.sql(spark, "DESCRIBE DETAIL global_temp.msv").first()
    assert d.stale and d.pending_days == ["2024-03-02"]
    assert _rows(
        cat.sql(spark, "SELECT * FROM global_temp.msv")
    ) == _star_recompute(spark, cat)
    rr = cat.sql(
        spark, "REFRESH MATERIALIZED VIEW global_temp.msv"
    ).first()
    assert rr.refreshed_days == ["2024-03-02"]
    after = {f.path for f in store.snapshot().files}
    # day-partitioned range overwrite: the other days' files survive
    kept = {p for p in before if "2024-03-02" not in p}
    assert kept <= after
    assert _rows(
        cat.sql(spark, "SELECT * FROM global_temp.msv")
    ) == _star_recompute(spark, cat)


def test_matview_star_dim_change_degrades_then_rebuilds(spark, tmp_path):
    """A dim write past the pinned cursor (1) surfaces as a
    <dim-changed:...> staleness marker, (2) degrades reads to an exact
    full recompute against the NEW dim, (3) makes the next REFRESH a
    full rebuild that re-pins, after which (4) fact churn is day-scoped
    again."""
    cat, raw, _dim = _mk_star(spark, tmp_path)
    cat.sql(spark, STAR_DDL.format(loc=tmp_path / "msv"))
    cat.sql(
        spark,
        "UPDATE global_temp.mdim SET category = 'boosted' "
        "WHERE event_type = 'click'",
    )
    d = cat.sql(spark, "DESCRIBE DETAIL global_temp.msv").first()
    assert d.stale
    assert "<dim-changed:global_temp.mdim>" in d.pending_days
    # reads are EXACT vs the new dim despite the stale store
    got = _rows(cat.sql(spark, "SELECT * FROM global_temp.msv"))
    assert got == _star_recompute(spark, cat)
    assert any(t[1] == "boosted" for t in got)
    rr = cat.sql(
        spark, "REFRESH MATERIALIZED VIEW global_temp.msv"
    ).first()
    assert rr.refreshed_days == ["<full-rebuild:dim-changed>"]
    d2 = cat.sql(spark, "DESCRIBE DETAIL global_temp.msv").first()
    assert not d2.stale and d2.pending_days == []
    assert _rows(
        cat.sql(spark, "SELECT * FROM global_temp.msv")
    ) == _star_recompute(spark, cat)
    # back on the day-scoped path for fact churn
    raw.append(
        spark.createDataFrame(
            [(datetime.datetime(2024, 3, 1, 9, 45), "click", 3.0)],
            "ts timestamp_ntz, event_type string, value double",
        )
    )
    rr2 = cat.sql(
        spark, "REFRESH MATERIALIZED VIEW global_temp.msv"
    ).first()
    assert rr2.refreshed_days == ["2024-03-01"]
    assert _rows(
        cat.sql(spark, "SELECT * FROM global_temp.msv")
    ) == _star_recompute(spark, cat)


def test_matview_star_grammar_rejections(spark, tmp_path):
    cat, _raw, _dim = _mk_star(spark, tmp_path)
    loc = tmp_path / "msv"

    def ddl(body):
        return (
            f"CREATE MATERIALIZED VIEW global_temp.msv LOCATION "
            f"'{loc}' AS {body}"
        )

    sel = (
        "SELECT window.start AS window_start, COUNT(*) AS n "
        "FROM global_temp.mraw f {join} "
        "GROUP BY window(f.ts, '1 hour')"
    )
    with pytest.raises(SqlDmlError, match="must be INNER"):
        cat.sql(spark, ddl(sel.format(
            join="LEFT JOIN global_temp.mdim d ON f.event_type = "
                 "d.event_type"
        )))
    with pytest.raises(SqlDmlError, match="not a registered table"):
        cat.sql(spark, ddl(sel.format(
            join="JOIN global_temp.nope d ON f.event_type = d.e"
        )))
    with pytest.raises(SqlDmlError, match="self-join"):
        cat.sql(spark, ddl(sel.format(
            join="JOIN global_temp.mraw g ON f.event_type = g.event_type"
        )))
    with pytest.raises(SqlDmlError, match="must come from the base"):
        cat.sql(spark, ddl(
            "SELECT window.start AS window_start, COUNT(*) AS n "
            "FROM global_temp.mraw f "
            "JOIN global_temp.mdim d ON f.event_type = d.event_type "
            "GROUP BY window(d.ts, '1 hour')"
        ))
    with pytest.raises(SqlDmlError, match="window"):
        cat.sql(spark, ddl(
            "SELECT d.category AS category, COUNT(*) AS n "
            "FROM global_temp.mraw f "
            "JOIN global_temp.mdim d ON f.event_type = d.event_type "
            "GROUP BY d.category"
        ))
    # nothing half-registered after the rejections
    assert "global_temp.msv" not in cat.matview_names()


def test_matview_dims_refresh_confinement_validates_under_flag(
    spark, tmp_path, monkeypatch
):
    """Round-15 insurance (r14 verdict item 3): the dims refresh ships
    replace_where(validate=False) on the strength of by-construction
    confinement. This test re-runs a real key-scoped refresh with the
    module debug flag ON, so the commit-time confinement proof stays
    exercised — a future refactor of the region-frame construction that
    breaks confinement fails HERE (replace_where raises), not silently
    in production."""
    from data_warehouse_copy_spark.streaming import matview as mv

    monkeypatch.setattr(mv, "VALIDATE_DIMS_REFRESH", True)
    cat, raw = _mk_dims_raw(spark, tmp_path)
    cat.sql(spark, DIMS_DDL.format(loc=tmp_path / "dmv"))
    raw.append(
        spark.createDataFrame(
            [("eu", "ok", 100), ("sa", "new", 9)],
            "region string, status string, amount int",
        )
    )
    rr = cat.sql(spark, "REFRESH MATERIALIZED VIEW global_temp.dmv").first()
    assert sorted(rr.refreshed_days) == [
        "region=eu,status=ok", "region=sa,status=new",
    ]
    cat.refresh(spark)
    assert _rows(
        cat.sql(spark, "SELECT * FROM global_temp.dmv")
    ) == _rows(spark.sql(DIMS_RECOMPUTE))
