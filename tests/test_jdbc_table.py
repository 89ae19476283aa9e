"""JdbcTable: the ManagedTable write protocol against a real database
(embedded Derby) — and the configured pipeline running the reference's
actual deployment shape, database→database.

The reference's transactional unit (O16) wraps DELETE + bulk insert in one
SQL transaction; JdbcTable reproduces it with stage-and-swap (parallel
staging write, then one server-side DELETE+INSERT transaction).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

import data_warehouse_copy_spark as dwcs
from data_warehouse_copy_spark.plans.pipeline import run
from data_warehouse_copy_spark.sources.catalog import load_table, write_jdbc_table
from data_warehouse_copy_spark.sources.jdbc_table import JdbcTable
from data_warehouse_copy_spark.window import day_bounds

W_FROM, W_TO = "1995-03-01", "1995-03-07"


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )


def _window_count(df):
    start, end = day_bounds(W_FROM, W_TO)
    return df.filter(F.col("l_shipdate").between(F.lit(start), F.lit(end))).count()


def test_overwrite_range_swaps_window_atomically(spark, lineitem):
    url = "jdbc:derby:memory:jt_range;create=true"
    t = JdbcTable(spark, url, "li")
    t.append(lineitem)
    n_before = t.read().count()
    n_window = _window_count(lineitem)

    windowed = lineitem.filter(
        F.col("l_shipdate").between(*map(F.lit, day_bounds(W_FROM, W_TO)))
    )
    deleted, inserted = t.overwrite_range(windowed, W_FROM, W_TO, "l_shipdate")
    assert deleted == n_window and inserted == n_window
    assert t.read().count() == n_before
    # idempotent: rerunning the same window is a no-op on counts
    deleted2, inserted2 = t.overwrite_range(windowed, W_FROM, W_TO, "l_shipdate")
    assert (deleted2, inserted2) == (deleted, inserted)
    assert t.read().count() == n_before


def test_merge_by_key_converges_to_source(spark, lineitem):
    url = "jdbc:derby:memory:jt_merge;create=true"
    t = JdbcTable(spark, url, "li")
    sample = lineitem.filter(F.col("l_orderkey") <= 1000)
    t.append(sample)
    # source mutates: quantities of some keys change
    changed = sample.filter(F.col("l_orderkey") % 7 == 0).withColumn(
        "l_quantity", F.col("l_quantity") + 100.0
    )
    n_keys = changed.select("l_orderkey").distinct().count()
    assert t.merge_by_key(changed, "l_orderkey") == n_keys
    got = t.read()
    assert got.count() == sample.count()  # replaced, not duplicated
    bumped = got.filter(F.col("L_QUANTITY") > 100.0).count()
    assert bumped == changed.count()
    assert t.merge_by_key(changed.limit(0), "l_orderkey") == 0  # empty set


def test_pipeline_parquet_to_jdbc_and_jdbc_to_jdbc(spark, sf_dir, tmp_path):
    """Stage 1: parquet -> Derby (populates the 'source database').
    Stage 2: Derby -> Derby — the reference's deployment shape end-to-end,
    fact range copy + dim truncate reload, audited."""
    src_url = "jdbc:derby:memory:jt_srcdb;create=true"
    tgt_url = "jdbc:derby:memory:jt_tgtdb;create=true"
    tables = [
        {"table_name": "lineitem", "table_type": "fact", "date_column": "l_shipdate"},
        {"table_name": "customer", "table_type": "dim"},
    ]
    cfg1 = dwcs.load_config(
        {
            "source": sf_dir, "target": src_url,
            "date_from": W_FROM, "date_to": W_TO,
            "tables": tables,
            "audit_table": str(tmp_path / "audit1"),
        }
    )
    res1 = run(spark, cfg1, now=datetime(2026, 8, 13, 12, 0))
    assert not res1.failed, [o.error for o in res1.failed]

    cfg2 = dwcs.load_config(
        {
            "source": src_url, "target": tgt_url,
            "date_from": W_FROM, "date_to": W_TO,
            "tables": [
                {
                    "table_name": "lineitem",
                    "table_type": "fact",
                    "date_column": "L_SHIPDATE",
                },
                {"table_name": "customer", "table_type": "dim"},
            ],
            "audit_table": str(tmp_path / "audit2"),
        }
    )
    res2 = run(spark, cfg2, now=datetime(2026, 8, 13, 12, 0))
    assert not res2.failed, [o.error for o in res2.failed]
    # rerun: the target now EXISTS, so the fact path takes the raw
    # transactional DELETE+INSERT swap (with the config's column case
    # resolved against the stored case) and must stay idempotent
    res2b = run(spark, cfg2, now=datetime(2026, 8, 13, 12, 0))
    assert not res2b.failed, [o.error for o in res2b.failed]

    li_src = JdbcTable(spark, src_url, "lineitem").read().count()
    li_tgt = JdbcTable(spark, tgt_url, "lineitem").read().count()
    assert li_src == li_tgt > 0
    cust = JdbcTable(spark, tgt_url, "customer").read()
    assert cust.count() == load_table(spark, sf_dir, "customer").count()
    # excluded-columns contract holds through the JDBC path too
    assert not {c.lower() for c in cust.columns} & {"id", "insert_datetime"}


def test_audit_default_requires_path_for_jdbc_target():
    cfg = dwcs.load_config(
        {
            "source": "/tmp/x", "target": "jdbc:derby:memory:jt_cfg;create=true",
            "date_from": W_FROM, "date_to": W_TO, "tables": [],
        }
    )
    with pytest.raises(ValueError, match="audit_table must be set"):
        _ = cfg.audit_table_path


def test_jdbc_sproc_executes_on_target_database(spark, sf_dir, tmp_path):
    """O11 for a database target: the registered statement runs server-side
    over raw JDBC with the window bound as parameters, and its failure
    aborts the run (rethrow asymmetry vs swallowed copy errors)."""
    from data_warehouse_copy_spark.plans.sprocs import SprocRegistry

    url = "jdbc:derby:memory:jt_sproc;create=true"
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
        "CREATE TABLE sproc_log (win_start VARCHAR(10), win_end VARCHAR(10))"
    )
    conn.close()

    reg = SprocRegistry()
    reg.register_jdbc(
        "refresh_summary", url, "INSERT INTO sproc_log VALUES (?, ?)"
    )
    cfg = dwcs.load_config(
        {
            "source": sf_dir, "target": str(tmp_path / "tgt"),
            "date_from": W_FROM, "date_to": W_TO,
            "tables": [{"table_name": "refresh_summary", "table_type": "sproc"}],
        }
    )
    res = run(spark, cfg, now=datetime(2026, 8, 13, 12, 0), sprocs=reg, audit=False)
    assert [o.status for o in res.outcomes] == ["Completed"]

    conn = jvm.java.sql.DriverManager.getConnection(url)
    rs = conn.createStatement().executeQuery("SELECT * FROM sproc_log")
    rows = []
    while rs.next():
        rows.append((rs.getString(1), rs.getString(2)))
    conn.close()
    assert rows == [(W_FROM, W_TO)]

    # failure rethrows and aborts (reference StoreProcRunService.cs:32-36)
    reg.register_jdbc("bad", url, "INSERT INTO missing_table VALUES (?, ?)")
    cfg_bad = dwcs.load_config(
        {
            "source": sf_dir, "target": str(tmp_path / "tgt2"),
            "date_from": W_FROM, "date_to": W_TO,
            "tables": [{"table_name": "bad", "table_type": "sproc"}],
        }
    )
    with pytest.raises(Exception):
        run(spark, cfg_bad, now=datetime(2026, 8, 13, 12, 0), sprocs=reg, audit=False)
