"""SQL views (round-12 verdict item 1): CREATE [OR REPLACE] VIEW /
DROP VIEW / SHOW VIEWS / SHOW CREATE VIEW in the NamedCatalog.

A view is persisted catalog metadata (its SELECT text in the catalog
JSON) resolved by TEXTUAL INLINING in execute_sql, so every text-level
rewrite composes: time travel inside bodies, views as MERGE sources,
dynamic file pruning firing THROUGH a view (the flatten fast-path
hands the prune parser the same star-join text it already knows).
Views are read-only; writes and DDL against them fail loudly, as does
use of a view whose base table was dropped.
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
from data_warehouse_copy_spark.sources.sql_dml import (  # noqa: E402
    SqlDmlError,
    inline_views,
    try_dynamic_prune,
)


@pytest.fixture()
def vcat(spark, tmp_path):
    c = NamedCatalog(tmp_path / "catalog.json")
    t = ManagedTable.create(spark, tmp_path / "base")
    t.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, "c", 5.0)],
            "k int, g string, v double",
        )
    )
    c.register("global_temp.base", tmp_path / "base")
    c.attach(spark)
    yield c, t
    c.detach(spark)


def test_create_select_drop_roundtrip(spark, vcat):
    c, _t = vcat
    out = c.sql(
        spark,
        "CREATE VIEW global_temp.v AS "
        "SELECT g, v FROM global_temp.base WHERE v > 6",
    ).first()
    assert (out.operation, out.rows_affected) == ("CREATE VIEW", 0)
    assert c.view_names() == ["global_temp.v"]
    rows = sorted(
        map(tuple, c.sql(spark, "SELECT * FROM global_temp.v").collect())
    )
    assert rows == [("a", 10.0), ("a", 30.0), ("b", 20.0)]
    # tail composition over the flattened body
    assert (
        c.sql(
            spark, "SELECT * FROM global_temp.v WHERE g = 'a'"
        ).count()
        == 2
    )
    # aggregation through the general (subquery) inline
    agg = c.sql(
        spark,
        "SELECT g, SUM(v) AS s FROM global_temp.v GROUP BY g ORDER BY g",
    ).collect()
    assert [tuple(r) for r in agg] == [("a", 40.0), ("b", 20.0)]
    c.sql(spark, "DROP VIEW global_temp.v")
    assert c.view_names() == []
    # IF EXISTS is a no-op, bare DROP is loud
    c.sql(spark, "DROP VIEW IF EXISTS global_temp.v")
    with pytest.raises(SqlDmlError, match="not in catalog"):
        c.sql(spark, "DROP VIEW global_temp.v")


def test_view_reads_are_live_and_persist_across_reopen(spark, vcat):
    c, t = vcat
    c.sql(
        spark,
        "CREATE VIEW global_temp.live AS "
        "SELECT k FROM global_temp.base WHERE v >= 10",
    )
    c2 = NamedCatalog(c.path)  # fresh process would do exactly this
    assert c2.view_names() == ["global_temp.live"]
    assert c2.sql(spark, "SELECT * FROM global_temp.live").count() == 3
    t.append(spark.createDataFrame([(9, "z", 99.0)], "k int, g string, v double"))
    # the inlined body reads the ATTACHED base view, which pins the
    # attach-time snapshot (names.py's documented SQL-surface boundary)
    # — refresh() is the read-your-writes knob, same as for direct SQL
    c2.refresh(spark)
    assert c2.sql(spark, "SELECT * FROM global_temp.live").count() == 4


def test_or_replace_and_duplicate_create(spark, vcat):
    c, _t = vcat
    c.sql(spark, "CREATE VIEW global_temp.r AS SELECT k FROM global_temp.base")
    with pytest.raises(SqlDmlError, match="already exists"):
        c.sql(
            spark, "CREATE VIEW global_temp.r AS SELECT g FROM global_temp.base"
        )
    c.sql(
        spark,
        "CREATE OR REPLACE VIEW global_temp.r AS "
        "SELECT g FROM global_temp.base WHERE v > 25",
    )
    assert [tuple(r) for r in c.sql(spark, "SELECT * FROM global_temp.r").collect()] == [
        ("a",)
    ]


def test_view_on_view_and_cycle_guard(spark, vcat):
    c, _t = vcat
    c.sql(
        spark,
        "CREATE VIEW global_temp.v1 AS "
        "SELECT g, v FROM global_temp.base WHERE v > 6",
    )
    c.sql(
        spark,
        "CREATE VIEW global_temp.v2 AS "
        "SELECT g, v * 2 AS v2 FROM global_temp.v1 WHERE v < 25",
    )
    rows = sorted(
        map(tuple, c.sql(spark, "SELECT * FROM global_temp.v2").collect())
    )
    assert rows == [("a", 20.0), ("b", 40.0)]
    # a synthetic cycle (hand-edited catalog) trips the depth cap loudly
    c.register_view("global_temp.c1", "SELECT * FROM global_temp.c2")
    c.register_view("global_temp.c2", "SELECT * FROM global_temp.c1")
    with pytest.raises(SqlDmlError, match="cycle"):
        c.sql(spark, "SELECT * FROM global_temp.c1")


def test_views_are_read_only(spark, vcat):
    c, _t = vcat
    c.sql(spark, "CREATE VIEW global_temp.ro AS SELECT * FROM global_temp.base")
    for q, msg in [
        ("DELETE FROM global_temp.ro WHERE k = 1", "read-only"),
        ("UPDATE global_temp.ro SET v = 0 WHERE k = 1", "read-only"),
        ("INSERT INTO global_temp.ro (k) VALUES (9)", "read-only"),
        (
            "MERGE INTO global_temp.ro t USING global_temp.base s "
            "ON t.k = s.k WHEN MATCHED THEN DELETE",
            "read-only",
        ),
        ("TRUNCATE TABLE global_temp.ro", "read-only"),
        ("OPTIMIZE global_temp.ro", "read-only"),
        ("ALTER TABLE global_temp.ro RENAME TO global_temp.x", "read-only"),
        ("DROP TABLE global_temp.ro", "use DROP VIEW"),
    ]:
        with pytest.raises(SqlDmlError, match=msg):
            c.sql(spark, q)
    # and a view name cannot shadow a table / vice versa
    with pytest.raises(SqlDmlError, match="TABLE"):
        c.sql(spark, "DROP VIEW global_temp.base")
    with pytest.raises(ValueError, match="VIEW"):
        c.register("global_temp.ro", _t.root)


def test_view_on_dropped_table_fails_loudly(spark, vcat, tmp_path):
    c, _t = vcat
    t2 = ManagedTable.create(spark, tmp_path / "other")
    t2.append(spark.createDataFrame([(1,)], "x int"))
    c.register("global_temp.other", tmp_path / "other")
    c.attach(spark)
    c.sql(
        spark,
        "CREATE VIEW global_temp.vd AS SELECT x FROM global_temp.other",
    )
    c.drop("global_temp.other")
    with pytest.raises(SqlDmlError, match="no longer in the catalog"):
        c.sql(spark, "SELECT * FROM global_temp.vd")
    # re-registering the base heals the view
    c.register("global_temp.other", tmp_path / "other")
    assert c.sql(spark, "SELECT * FROM global_temp.vd").count() == 1


def test_view_as_merge_source(spark, vcat, tmp_path):
    c, _t = vcat
    tgt = ManagedTable.create(spark, tmp_path / "tgt")
    tgt.append(spark.createDataFrame([(1, 0.0), (9, 9.0)], "k int, v double"))
    c.register("global_temp.tgt", tmp_path / "tgt")
    c.sql(
        spark,
        "CREATE VIEW global_temp.src AS "
        "SELECT k, v FROM global_temp.base WHERE v > 6",
    )
    c.sql(
        spark,
        "MERGE INTO global_temp.tgt t USING global_temp.src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)",
    )
    rows = sorted(map(tuple, tgt.read().collect()))
    assert rows == [(1, 10.0), (2, 20.0), (3, 30.0), (9, 9.0)]


def test_show_views_and_show_create(spark, vcat):
    c, _t = vcat
    body = "SELECT g FROM global_temp.base WHERE v > 6"
    c.sql(spark, f"CREATE VIEW global_temp.sv AS {body}")
    shown = c.sql(spark, "SHOW VIEWS").collect()
    assert [(r.name, r.view_sql) for r in shown] == [
        ("global_temp.sv", body)
    ]
    ddl = c.sql(spark, "SHOW CREATE VIEW global_temp.sv").first().createtab_stmt
    assert ddl == f"CREATE OR REPLACE VIEW global_temp.sv AS {body}"
    # the emitted DDL re-runs verbatim
    c.sql(spark, ddl)
    # SHOW CREATE TABLE also resolves a view name
    assert (
        c.sql(spark, "SHOW CREATE TABLE global_temp.sv").first().createtab_stmt
        == ddl
    )
    with pytest.raises(SqlDmlError, match="not in catalog"):
        c.sql(spark, "SHOW CREATE VIEW global_temp.nope")


def test_create_view_validates_body(spark, vcat):
    c, _t = vcat
    with pytest.raises(SqlDmlError, match="does not resolve"):
        c.sql(
            spark,
            "CREATE VIEW global_temp.bad AS "
            "SELECT no_such_col FROM global_temp.base",
        )
    with pytest.raises(SqlDmlError, match="SELECT"):
        c.sql(spark, "CREATE VIEW global_temp.bad AS VACUUM global_temp.base")
    assert c.view_names() == []


def test_create_view_rejects_wrong_database(spark, vcat):
    """Round-13 (advice fix): a view under a non-global-temp db used to
    persist fine and then poison EVERY later attach() — of unrelated
    tables too — until dropped; now CREATE VIEW fails upfront and the
    catalog stays fully attachable."""
    c, _t = vcat
    with pytest.raises(SqlDmlError, match="global-temp database"):
        c.sql(
            spark,
            "CREATE VIEW otherdb.v AS SELECT k FROM global_temp.base",
        )
    assert c.view_names() == []
    assert "global_temp.base" in c.attach(spark)  # not wedged


def test_column_evolution_guarded_by_view_dependencies(spark, vcat):
    """Round-13 (verdict item 3): RENAME/DROP COLUMN on a table
    referenced by a view fails LOUDLY naming the dependent views
    (previously the view silently broke until query time); CASCADE
    drops them with the column; columns no view touches evolve freely."""
    c, t = vcat
    c.sql(
        spark,
        "CREATE VIEW global_temp.v1 AS "
        "SELECT k, v FROM global_temp.base WHERE v > 5",
    )
    c.sql(
        spark,
        "CREATE VIEW global_temp.v2 AS "  # view-on-view: transitive dep
        "SELECT k FROM global_temp.v1",
    )
    for ddl in (
        "ALTER TABLE global_temp.base RENAME COLUMN v TO val",
        "ALTER TABLE global_temp.base DROP COLUMN v",
    ):
        with pytest.raises(SqlDmlError, match=r"v1.*v2|global_temp\.v1"):
            c.sql(spark, ddl)
    # the guard names BOTH views (v2 via the transitive closure)
    try:
        c.sql(spark, "ALTER TABLE global_temp.base DROP COLUMN v")
    except SqlDmlError as e:
        assert "global_temp.v1" in str(e) and "global_temp.v2" in str(e)
    # a column no view touches evolves freely
    c.sql(spark, "ALTER TABLE global_temp.base RENAME COLUMN g TO grp")
    assert "grp" in [f.name for f in t.read().schema.fields]
    # ... and the views still resolve value-exact after it
    assert c.sql(spark, "SELECT * FROM global_temp.v2").count() == 3
    # CASCADE drops the dependent views, then the evolution lands
    c.sql(
        spark,
        "ALTER TABLE global_temp.base RENAME COLUMN v TO val CASCADE",
    )
    assert c.view_names() == []
    assert "val" in [f.name for f in t.read().schema.fields]
    # CASCADE is rename/drop-only
    with pytest.raises(SqlDmlError, match="CASCADE"):
        c.sql(
            spark,
            "ALTER TABLE global_temp.base ADD COLUMN extra INT CASCADE",
        )


def test_select_star_view_blocks_any_column_evolution(spark, vcat):
    """A SELECT * view touches every column — any rename/drop under it
    is guarded."""
    c, _t = vcat
    c.sql(
        spark,
        "CREATE VIEW global_temp.star AS SELECT * FROM global_temp.base",
    )
    with pytest.raises(SqlDmlError, match="star"):
        c.sql(spark, "ALTER TABLE global_temp.base RENAME COLUMN g TO x")
    c.sql(spark, "DROP VIEW global_temp.star")
    c.sql(spark, "ALTER TABLE global_temp.base RENAME COLUMN g TO x")


def test_time_travel_through_a_view(spark, vcat):
    c, t = vcat
    v0 = t._head_version()
    t.append(spark.createDataFrame([(8, "d", 70.0)], "k int, g string, v double"))
    c.sql(
        spark,
        f"CREATE VIEW global_temp.tt AS "
        f"SELECT k FROM global_temp.base VERSION AS OF {v0}",
    )
    assert c.sql(spark, "SELECT * FROM global_temp.tt").count() == 4
    assert c.sql(spark, "SELECT COUNT(*) AS n FROM global_temp.base").first().n == 5


def test_dynamic_prune_fires_through_a_view(spark, tmp_path):
    """The flatten fast-path hands try_dynamic_prune the view's own
    star-join text: SELECT * FROM db.v probes the dim and pushes the
    key in-list into the fact scan, exactly as the inlined SQL would."""
    c = NamedCatalog(tmp_path / "cat.json")
    fact = ManagedTable.create(spark, tmp_path / "fact", cluster_col="ck")
    fact.append(
        spark.range(0, 4000).selectExpr(
            "CAST(id % 40 AS INT) AS ck", "id AS amount"
        ),
        cluster_partitions=8,
    )
    dim = ManagedTable.create(spark, tmp_path / "dim")
    dim.append(
        spark.range(0, 40).selectExpr(
            "CAST(id AS INT) AS ck",
            "CASE WHEN id < 3 THEN 'hot' ELSE 'cold' END AS seg",
        )
    )
    fact.analyze()
    dim.analyze()
    c.register("global_temp.vfact", tmp_path / "fact")
    c.register("global_temp.vdim", tmp_path / "dim")
    c.attach(spark)
    c.sql(
        spark,
        "CREATE VIEW global_temp.hot AS "
        "SELECT f.amount FROM global_temp.vfact f "
        "JOIN global_temp.vdim d ON f.ck = d.ck "
        "WHERE d.seg = 'hot'",
    )
    inlined = inline_views(c, "SELECT * FROM global_temp.hot")
    info: dict = {}
    df = try_dynamic_prune(spark, c, inlined, info)
    assert df is not None and info.get("n_keys") == 3
    got = c.sql(spark, "SELECT * FROM global_temp.hot")
    expect = sorted(
        r.amount
        for r in spark.createDataFrame(
            [(i,) for i in range(4000) if i % 40 < 3], "amount long"
        ).collect()
    )
    assert sorted(r.amount for r in got.collect()) == expect


def test_describe_detail_and_tblproperties_on_views(spark, vcat):
    c, _t = vcat
    c.sql(
        spark,
        "CREATE VIEW global_temp.dd AS SELECT g FROM global_temp.base",
    )
    row = c.sql(spark, "DESCRIBE DETAIL global_temp.dd").first()
    assert (row["name"], row["type"]) == ("global_temp.dd", "VIEW")
    assert row["view_sql"] == "SELECT g FROM global_temp.base"
    assert row["base_references"] == ["global_temp.base"]
    props = c.sql(spark, "SHOW TBLPROPERTIES global_temp.dd")
    assert props.count() == 0 and props.columns == ["key", "value"]


def test_create_view_column_list_and_alter_view(spark, vcat):
    c, _t = vcat
    c.sql(
        spark,
        "CREATE VIEW global_temp.cl (id, label) AS "
        "SELECT k, g FROM global_temp.base WHERE v > 6",
    )
    rows = sorted(
        map(tuple, c.sql(spark, "SELECT * FROM global_temp.cl").collect())
    )
    assert rows == [(1, "a"), (2, "b"), (3, "a")]
    assert (
        c.sql(
            spark,
            "SELECT label FROM global_temp.cl WHERE id = 2",
        ).first().label
        == "b"
    )
    # ALTER VIEW ... AS replaces the body; the view must already exist
    c.sql(
        spark,
        "ALTER VIEW global_temp.cl AS "
        "SELECT k AS id, v AS val FROM global_temp.base WHERE v > 25",
    )
    assert [tuple(r) for r in c.sql(spark, "SELECT * FROM global_temp.cl").collect()] == [
        (3, 30.0)
    ]
    with pytest.raises(SqlDmlError, match="not in catalog"):
        c.sql(spark, "ALTER VIEW global_temp.none AS SELECT 1")


def test_programmatic_table_resolves_views(spark, vcat):
    c, _t = vcat
    c.sql(
        spark,
        "CREATE VIEW global_temp.pt AS "
        "SELECT g, v FROM global_temp.base WHERE v > 6",
    )
    df = c.table(spark, "global_temp.pt")
    assert sorted(map(tuple, df.collect())) == [
        ("a", 10.0),
        ("a", 30.0),
        ("b", 20.0),
    ]
    with pytest.raises(ValueError, match="view"):
        c.table(spark, "global_temp.pt", versionAsOf="0")


def test_ctas_and_insert_compose_through_views(spark, vcat, tmp_path):
    """The inliner runs before every statement parse, so CTAS and
    INSERT ... SELECT read through views like any SELECT."""
    c, _t = vcat
    c.sql(
        spark,
        "CREATE VIEW global_temp.cv2 AS "
        "SELECT k, v FROM global_temp.base WHERE v > 6",
    )
    c.sql(
        spark,
        f"CREATE TABLE global_temp.ct USING managed_table LOCATION "
        f"'{tmp_path / 'ct'}' AS SELECT * FROM global_temp.cv2",
    )
    t2 = ManagedTable(spark, tmp_path / "ct")
    assert t2.read().count() == 3
    c.sql(
        spark,
        "INSERT INTO global_temp.ct SELECT k + 100, v FROM global_temp.cv2",
    )
    assert t2.read().count() == 6
