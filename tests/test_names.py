"""NamedCatalog (sources/names.py): the reference addresses tables as
schema_name.table_name against SQL Server's catalog (appsettings.json
TableConfig); here a persistent name→root mapping makes
spark.table("<db>.<name>") and pure SQL resolve ManagedTables by name.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.sources.managed_table import ManagedTable  # noqa: E402
from data_warehouse_copy_spark.sources.names import NamedCatalog  # noqa: E402


@pytest.fixture()
def cat(spark, tmp_path):
    c = NamedCatalog(tmp_path / "catalog.json")
    t = ManagedTable.create(spark, tmp_path / "orders")
    t.append(
        spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")
        )
    )
    c.register("global_temp.orders", tmp_path / "orders")
    yield c, t
    c.detach(spark)


def test_catalog_roundtrip_persists(spark, tmp_path, cat):
    """register → (re-open the catalog file) → table(): the mapping is the
    persisted JSON, not process state, and the read is live."""
    c, t = cat
    c2 = NamedCatalog(c.path)  # a different process would do exactly this
    assert c2.names() == ["global_temp.orders"]
    assert c2.table(spark, "global_temp.orders").count() == 100
    t.append(spark.range(100, 150).selectExpr("id AS k", "id % 3 AS v"))
    # table() is LIVE: a fresh relation per call sees the new head
    assert c2.table(spark, "global_temp.orders").count() == 150
    t.delete([("k", "<", 10)])
    assert c2.table(spark, "global_temp.orders").count() == 140


def test_spark_table_resolves_names(spark, cat):
    """attach() makes spark.table('<db>.<name>') and raw SQL resolve; the
    view pins the attach-time snapshot and refresh() re-resolves — the
    documented python-DS relation-cache boundary."""
    c, t = cat
    assert c.attach(spark) == ["global_temp.orders"]
    assert spark.table("global_temp.orders").count() == 100
    assert (
        spark.sql(
            "SELECT v, count(*) AS n FROM global_temp.orders GROUP BY v"
        ).count()
        == 3
    )
    t.append(spark.range(100, 120).selectExpr("id AS k", "id % 3 AS v"))
    c.refresh(spark)
    assert spark.table("global_temp.orders").count() == 120


def test_sql_surface_joins_named_tables(spark, tmp_path, cat):
    """The SQL surface over NAMES, not paths: a join across two catalog
    tables matches the same join through the programmatic path."""
    c, t = cat
    dim = ManagedTable.create(spark, tmp_path / "dim")
    dim.append(
        spark.createDataFrame(
            [(0, "zero"), (1, "one"), (2, "two")], "v long, label string"
        )
    )
    c.register("global_temp.dim", tmp_path / "dim")
    c.attach(spark)
    sql_out = spark.sql(
        "SELECT o.k, d.label FROM global_temp.orders o "
        "JOIN global_temp.dim d ON o.v = d.v WHERE o.k < 10 ORDER BY o.k"
    ).collect()
    prog = (
        c.table(spark, "global_temp.orders")
        .alias("o")
        .join(c.table(spark, "global_temp.dim").alias("d"), "v")
        .filter(F.col("k") < 10)
        .select("k", "label")
        .orderBy("k")
        .collect()
    )
    assert [tuple(r) for r in sql_out] == [tuple(r) for r in prog]
    assert len(sql_out) == 10


def test_catalog_guards(spark, tmp_path, cat):
    c, _ = cat
    with pytest.raises(ValueError, match="db.*table"):
        c.register("flatname", tmp_path / "orders")
    with pytest.raises(ValueError, match="no managed table"):
        c.register("global_temp.ghost", tmp_path / "nowhere")
    with pytest.raises(KeyError, match="not in catalog"):
        c.root_of("global_temp.ghost")
    with pytest.raises(KeyError):
        c.drop("global_temp.ghost")
    # names in a foreign db are rejected at attach, not silently rewired
    t2 = ManagedTable.create(spark, tmp_path / "t2")
    t2.append(spark.range(3).selectExpr("id AS k", "id AS v"))
    c.register("bronze.t2", tmp_path / "t2")
    with pytest.raises(ValueError, match="globalTempDatabase"):
        c.attach(spark)
    c.drop("bronze.t2")


def test_dropping_name_keeps_data(spark, cat):
    c, t = cat
    c.drop("global_temp.orders")
    assert c.names() == []
    assert t.read().count() == 100  # the NAME died, the table did not
