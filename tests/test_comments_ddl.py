"""COMMENT ON TABLE/COLUMN, ALTER COLUMN COMMENT, SHOW COLUMNS and
CREATE TABLE LIKE (round-10 verdict item 7). Column comments live in the
schema's FIELD METADATA (the Delta slot) so they ride every commit,
clone, restore and checkpoint and survive rename/widen; the table
comment is a _log sidecar carried by clones. SHOW CREATE TABLE emits
both and the emitted DDL re-runs verbatim.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)
from data_warehouse_copy_spark.sources.names import NamedCatalog  # noqa: E402


@pytest.fixture()
def cat(spark, tmp_path):
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col="k")
    t.append(
        spark.range(20).selectExpr("CAST(id AS INT) AS k", "id % 3 AS v")
    )
    c = NamedCatalog(tmp_path / "cat.json")
    c.register("db.t", str(tmp_path / "t"))
    return c, t


def test_comment_on_table_and_column_roundtrip(spark, cat):
    c, t = cat
    c.sql(spark, "COMMENT ON TABLE db.t IS 'orders fact'")
    c.sql(spark, "COMMENT ON COLUMN db.t.k IS 'the key'")
    assert t.table_comment() == "orders fact"
    assert t.column_comments() == {"k": "the key"}
    # IS NULL clears
    c.sql(spark, "COMMENT ON TABLE db.t IS NULL")
    c.sql(spark, "COMMENT ON COLUMN db.t.k IS NULL")
    assert t.table_comment() is None
    assert t.column_comments() == {}
    with pytest.raises(ValueError, match="db.table.column"):
        c.sql(spark, "COMMENT ON COLUMN nodots IS 'x'")
    with pytest.raises(ValueError, match="no such column"):
        c.sql(spark, "COMMENT ON COLUMN db.t.zz IS 'x'")


def test_alter_column_comment(spark, cat):
    c, t = cat
    c.sql(spark, "ALTER TABLE db.t ALTER COLUMN v COMMENT 'value mod 3'")
    assert t.column_comments() == {"v": "value mod 3"}
    c.sql(spark, "ALTER TABLE db.t ALTER COLUMN v COMMENT NULL")
    assert t.column_comments() == {}


def test_comments_survive_rename_widen_and_time_travel(spark, cat):
    c, t = cat
    t.set_column_comment("v", "it''s the value")
    v_commented = t._head_version()
    t.rename_column("v", "val")
    t.widen_column("k", "long")
    assert t.column_comments() == {"val": "it''s the value"}
    # time travel shows the comment state AT that version
    import json as _json

    from pyspark.sql import types as T

    old = T.StructType.fromJson(
        _json.loads(t.snapshot(v_commented).schema_json)
    )
    assert {f.name: (f.metadata or {}).get("comment") for f in old.fields}[
        "v"
    ] == "it''s the value"


def test_show_create_emits_and_reruns_with_comments(spark, cat, tmp_path):
    c, t = cat
    c.sql(spark, "COMMENT ON TABLE db.t IS 'the ''fact'' table'")
    c.sql(spark, "COMMENT ON COLUMN db.t.k IS 'key col'")
    ddl = c.sql(spark, "SHOW CREATE TABLE db.t").first().createtab_stmt
    assert "COMMENT 'key col'" in ddl
    assert "COMMENT 'the ''fact'' table'" in ddl
    # the emitted DDL re-runs verbatim in a fresh catalog at a new spot
    c2 = NamedCatalog(tmp_path / "cat2.json")
    ddl2 = ddl.replace(str(t.root), str(tmp_path / "t2"))
    c2.sql(spark, ddl2)
    t2 = ManagedTable(spark, tmp_path / "t2")
    assert t2.table_comment() == "the 'fact' table"
    assert t2.column_comments() == {"k": "key col"}


def test_clones_carry_comments(spark, cat, tmp_path):
    c, t = cat
    t.set_table_comment("bronze")
    t.set_column_comment("k", "key")
    shallow = t.clone_to(tmp_path / "sc")
    deep = t.deep_clone_to(tmp_path / "dc")
    for clone in (shallow, deep):
        assert clone.table_comment() == "bronze"
        assert clone.column_comments() == {"k": "key"}


def test_show_columns(spark, cat):
    c, t = cat
    rows = c.sql(spark, "SHOW COLUMNS IN db.t").collect()
    assert [r.col_name for r in rows] == ["k", "v"]
    t.rename_column("v", "val")
    rows = c.sql(spark, "SHOW COLUMNS FROM db.t").collect()
    assert [r.col_name for r in rows] == ["k", "val"]


def test_create_table_with_comments_ddl(spark, tmp_path):
    c = NamedCatalog(tmp_path / "cat.json")
    c.sql(
        spark,
        f"CREATE TABLE db.n (a INT COMMENT 'alpha', b STRING) "
        f"USING managed_table LOCATION '{tmp_path / 'n'}' "
        f"COMMENT 'notes'",
    )
    t = ManagedTable(spark, tmp_path / "n")
    assert t.column_comments() == {"a": "alpha"}
    assert t.table_comment() == "notes"
    # 'comment' / 'like' stay valid column names
    c.sql(
        spark,
        f"CREATE TABLE db.w (comment STRING, like INT) "
        f"USING managed_table LOCATION '{tmp_path / 'w'}'",
    )
    rows = c.sql(spark, "SHOW COLUMNS IN db.w").collect()
    assert [r.col_name for r in rows] == ["comment", "like"]


def test_create_table_like(spark, cat, tmp_path):
    c, t = cat
    t.set_table_comment("src")
    t.set_column_comment("k", "key")
    t.add_constraint("k_pos", "k >= 0")
    t.set_auto_compact(max_files_per_partition=4)
    c.sql(
        spark,
        f"CREATE TABLE db.t2 LIKE db.t LOCATION '{tmp_path / 't2'}'",
    )
    t2 = ManagedTable(spark, tmp_path / "t2")
    assert t2.count() == 0  # empty, schema only
    assert [f.name for f in t2.read().schema.fields] == ["k", "v"]
    assert t2.snapshot().cluster_col == "k"
    assert t2.table_comment() == "src"
    assert t2.column_comments() == {"k": "key"}
    assert t2.snapshot().constraints == {"k_pos": "k >= 0"}
    assert t2.auto_compact_policy()["max_files_per_partition"] == 4
    # constraints ENFORCE on the copy
    with pytest.raises(Exception, match="k_pos"):
        t2.append(
            spark.range(1).selectExpr(
                "CAST(-id - 1 AS INT) AS k", "id AS v"
            )
        )
    with pytest.raises(ValueError, match="already exists"):
        c.sql(spark, f"CREATE TABLE db.t2 LIKE db.t")
    with pytest.raises(ValueError, match="not a registered"):
        c.sql(spark, "CREATE TABLE db.t3 LIKE db.nosuch")


def test_unregistered_names_pass_through_to_spark(spark, cat):
    """SHOW COLUMNS / COMMENT ON over a SESSION table is Spark's
    statement, not ours — an unregistered name must pass through, never
    KeyError."""
    c, _t = cat
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW sess_v AS SELECT 1 AS a")
    rows = c.sql(spark, "SHOW COLUMNS IN sess_v").collect()
    assert [r.col_name for r in rows] == ["a"]
    import pyspark.errors

    with pytest.raises(pyspark.errors.AnalysisException):
        # Spark's own error for commenting a temp view — OUR error would
        # be a KeyError from the catalog lookup
        c.sql(spark, "COMMENT ON TABLE sess_v IS 'x'")


def test_or_replace_resets_table_comment(spark, cat):
    c, t = cat
    t.set_table_comment("old notes")
    c.sql(
        spark,
        "CREATE OR REPLACE TABLE db.t USING managed_table AS "
        "SELECT 1 AS k",
    )
    assert t.table_comment() is None  # full new-definition semantics
    c.sql(
        spark,
        "CREATE OR REPLACE TABLE db.t USING managed_table "
        "COMMENT 'new notes' AS SELECT 2 AS k",
    )
    assert t.table_comment() == "new notes"
