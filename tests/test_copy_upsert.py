"""Operator tests: copy (O1-O6), change detection (O7), upsert (O9/O10) —
convergence verified against DuckDB as oracle where it matters."""

import duckdb
import pytest
from pyspark.sql import functions as F

from data_warehouse_copy_spark.operators.copy import (
    copy_table,
    exclude_columns,
    windowed_scan,
)
from data_warehouse_copy_spark.operators.upsert import changed_keys, update_table
from data_warehouse_copy_spark.sources.managed_table import ManagedTable

WIN_FROM, WIN_TO = "1995-03-01", "1995-03-07"


@pytest.fixture()
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture()
def orders_mut(spark, sf_dir):
    """orders + derived update_datetime (FIXTURES.md derived fixture):
    deterministic — update day = o_orderdate + (o_orderkey % 40) days."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.withColumn(
        "update_datetime",
        F.timestamp_add("DAY", (F.col("o_orderkey") % 40).cast("int"), F.col("o_orderdate")),
    )


def test_exclude_columns_case_insensitive(spark, lineitem):
    df = lineitem.withColumn("Id", F.lit(1)).withColumn("INSERT_DATETIME", F.lit("x"))
    out = exclude_columns(df)
    assert "Id" not in out.columns and "INSERT_DATETIME" not in out.columns
    assert set(out.columns) == set(lineitem.columns)


def test_windowed_scan_997_bound(spark, sf_dir, lineitem):
    out = windowed_scan(lineitem, "l_shipdate", WIN_FROM, WIN_TO)
    got = out.agg(F.min("l_shipdate"), F.max("l_shipdate")).first()
    assert got[0] is None or got[0].strftime("%Y-%m-%d") >= WIN_FROM
    assert got[1] is None or got[1].strftime("%Y-%m-%d") <= WIN_TO
    # oracle row count
    con = duckdb.connect()
    expected = con.sql(
        f"""SELECT count(*) FROM '{sf_dir}/lineitem.parquet'
        WHERE l_shipdate BETWEEN TIMESTAMP '1995-03-01 00:00:00'
        AND TIMESTAMP '1995-03-07 23:59:59.997'"""
    ).fetchone()[0]
    assert out.count() == expected


def test_range_copy_converges(spark, tmp_path, lineitem):
    target = ManagedTable.create(
        spark, tmp_path / "li", partition_date_col="l_shipdate"
    )
    # preload stale window data (will be range-deleted) + out-of-window rows
    stale = windowed_scan(lineitem, "l_shipdate", WIN_FROM, WIN_TO).withColumn(
        "l_quantity", F.lit(-1.0)
    )
    outside = lineitem.filter(
        ~F.col("l_shipdate").between(WIN_FROM, "1995-03-07 23:59:59.997")
    )
    target.append(stale.unionByName(outside))

    res = copy_table(
        lineitem, target, "lineitem", WIN_FROM, WIN_TO, False, "l_shipdate"
    )
    assert res.mode == "range"
    after = target.read()
    assert after.filter(F.col("l_quantity") == -1.0).count() == 0  # stale gone
    assert after.count() == lineitem.count()


def test_truncate_reload_idempotent(spark, tmp_path, sf_dir):
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    target = ManagedTable.create(spark, tmp_path / "cust")
    for _ in range(2):
        res = copy_table(customer, target, "customer", None, None, True, None)
        assert res.mode == "truncate"
        assert target.read().count() == customer.count()


def test_fact_without_date_column_appends(spark, tmp_path, sf_dir):
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    target = ManagedTable.create(spark, tmp_path / "r")
    copy_table(region, target, "region", WIN_FROM, WIN_TO, False, None)
    copy_table(region, target, "region", WIN_FROM, WIN_TO, False, None)
    # reference fidelity: no delete happens, rerun duplicates
    assert target.read().count() == region.count() * 2


def test_changed_keys_matches_not_in_oracle(spark, sf_dir, orders_mut):
    got = changed_keys(
        orders_mut, "o_orderdate", "update_datetime", "o_orderkey", WIN_FROM, WIN_TO
    )
    con = duckdb.connect()
    expected = con.sql(
        f"""
        WITH src AS (
          SELECT *, o_orderdate + INTERVAL ((o_orderkey % 40)::int) DAY AS update_datetime
          FROM '{sf_dir}/orders.parquet'
        )
        SELECT o_orderkey FROM src
        WHERE CAST(update_datetime AS DATE) BETWEEN DATE '{WIN_FROM}' AND DATE '{WIN_TO}'
        AND o_orderkey NOT IN (
          SELECT o_orderkey FROM src
          WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '{WIN_FROM}' AND DATE '{WIN_TO}'
        )
        """
    ).fetchall()
    assert sorted(r[0] for r in got.collect()) == sorted(r[0] for r in expected)
    assert got.count() > 0, "fixture window must exercise the anti-join"


def test_update_table_converges_target_to_source(spark, tmp_path, orders_mut):
    """The §3.3 contract: after CopyTable+UpdateTable, target == source for
    all rows whose date_column OR update_date_column day is in the window."""
    target = ManagedTable.create(
        spark, tmp_path / "ord", partition_date_col="o_orderdate"
    )
    # target starts as yesterday's source: updated rows still have old values
    stale = orders_mut.withColumn(
        "o_orderstatus",
        F.when(
            F.to_date("update_datetime").between(WIN_FROM, WIN_TO), F.lit("OLD")
        ).otherwise(F.col("o_orderstatus")),
    )
    target.append(stale)

    # source mutated: those rows now carry status 'NEW'
    source = orders_mut.withColumn(
        "o_orderstatus",
        F.when(
            F.to_date("update_datetime").between(WIN_FROM, WIN_TO), F.lit("NEW")
        ).otherwise(F.col("o_orderstatus")),
    )

    copy_table(source, target, "orders", WIN_FROM, WIN_TO, False, "o_orderdate")
    n_keys = update_table(
        source, target, "orders", WIN_FROM, WIN_TO,
        "o_orderdate", "update_datetime", "o_orderkey",
    )
    assert n_keys > 0
    after = target.read()
    assert after.count() == source.count()
    assert after.filter(F.col("o_orderstatus") == "OLD").count() == 0
    # exact convergence
    assert (
        after.exceptAll(source).count() == 0
        and source.exceptAll(after).count() == 0
    )


def test_update_table_idempotent(spark, tmp_path, orders_mut):
    target = ManagedTable.create(
        spark, tmp_path / "ord", partition_date_col="o_orderdate"
    )
    target.append(orders_mut)
    for _ in range(2):
        update_table(
            orders_mut, target, "orders", WIN_FROM, WIN_TO,
            "o_orderdate", "update_datetime", "o_orderkey",
        )
        assert target.read().count() == orders_mut.count()
