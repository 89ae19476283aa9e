"""JDBC source/sink round-trips against embedded Derby.

The reference's entire deployment shape is JDBC on both sides (SQL Server
reader ``TableCopyService.cs:125-140``, SqlBulkCopy writer ``:144-169``).
The container has no server database, but Spark ships Derby (its Hive
metastore backend) — a real embedded SQL database with a JDBC driver — so
the option plumbing (pushdown, truncate mode, batchsize) is exercised
against a live JDBC endpoint, not mocks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_copy_spark.sources.catalog import (
    load_jdbc_table,
    load_table,
    write_jdbc_table,
)

URL = "jdbc:derby:memory:dwcs_test;create=true"


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_jdbc_append_roundtrip(spark, nation):
    """O5 bulk insert: write over JDBC, read back, values survive (Derby
    uppercases identifiers, so compare case-insensitively)."""
    write_jdbc_table(nation, URL, "nation_rt", mode="overwrite")
    back = load_jdbc_table(spark, URL, "nation_rt")
    assert back.count() == nation.count()
    assert [c.lower() for c in back.columns] == [c.lower() for c in nation.columns]
    orig = {tuple(r) for r in nation.select("n_nationkey", "n_name").collect()}
    got = {tuple(r) for r in back.select("N_NATIONKEY", "N_NAME").collect()}
    assert got == orig


def test_jdbc_predicate_pushdown(spark, nation):
    """The window predicate must reach the remote SELECT (the reference
    hand-builds the same WHERE at TableCopyService.cs:127) — visible as
    PushedFilters on the JDBC scan node."""
    write_jdbc_table(nation, URL, "nation_pd", mode="overwrite")
    df = load_jdbc_table(spark, URL, "nation_pd", predicate="N_REGIONKEY = 0")
    assert df.count() == nation.filter(F.col("n_regionkey") == 0).count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(n_regionkey,0)" in plan.replace(
        "N_REGIONKEY", "n_regionkey"
    )


def test_jdbc_truncate_reload(spark, nation):
    """O4 dim truncate+reload: overwrite with truncate=True keeps the table
    definition (Derby TRUNCATE TABLE) and replaces the rows."""
    write_jdbc_table(nation, URL, "nation_tr", mode="overwrite")
    write_jdbc_table(
        nation.limit(7), URL, "nation_tr", mode="overwrite", truncate=True
    )
    assert load_jdbc_table(spark, URL, "nation_tr").count() == 7


def test_jdbc_append_accumulates(spark, nation):
    write_jdbc_table(nation, URL, "nation_ap", mode="overwrite")
    write_jdbc_table(nation.limit(3), URL, "nation_ap", mode="append")
    assert load_jdbc_table(spark, URL, "nation_ap").count() == nation.count() + 3


def test_jdbc_option_plumbing(spark, nation):
    """batchsize and extra options must reach the writer (a bad option value
    fails fast — proves the wiring, not just defaults)."""
    write_jdbc_table(
        nation, URL, "nation_opt", mode="overwrite", batch_size=2,
        options={"isolationLevel": "READ_COMMITTED"},
    )
    assert load_jdbc_table(spark, URL, "nation_opt").count() == nation.count()
    with pytest.raises(Exception):
        write_jdbc_table(
            nation, URL, "nation_bad", mode="overwrite",
            options={"isolationLevel": "NOT_A_LEVEL"},
        )


def test_jdbc_partitioned_read(spark, nation):
    """Parallel JDBC scan: partitionColumn splits the read into numPartitions
    remote cursors (the 100 TB shape — the reference reads one cursor)."""
    write_jdbc_table(nation, URL, "nation_pp", mode="overwrite")
    df = load_jdbc_table(
        spark, URL, "nation_pp",
        partition_options={
            "partitionColumn": "N_NATIONKEY",
            "lowerBound": "0",
            "upperBound": "24",
            "numPartitions": "4",
        },
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == nation.count()
