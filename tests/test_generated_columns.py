"""GENERATED ALWAYS AS columns (Delta's generated-column model):
writes that OMIT the column compute it from its expression; writes that
PROVIDE it are validated by the automatic ``gen_<col>`` CHECK constraint
on every write path. The expression lives in the schema's field metadata
(comments' slot), so clones, time travel and SHOW CREATE carry it.
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
def gen_table(spark, tmp_path):
    c = NamedCatalog(tmp_path / "cat.json")
    c.sql(
        spark,
        f"CREATE TABLE db.g (a INT, b INT GENERATED ALWAYS AS (a + 1), "
        f"note STRING) USING managed_table LOCATION '{tmp_path / 'g'}'",
    )
    return c, ManagedTable(spark, tmp_path / "g")


def _rows(t):
    return sorted(map(tuple, t.read().collect()))


def test_insert_computes_omitted_generated_column(spark, gen_table):
    c, t = gen_table
    assert t.generated_columns() == {"b": "a + 1"}
    c.sql(spark, "INSERT INTO db.g (a, note) VALUES (1, 'x'), (5, 'y')")
    assert _rows(t) == [(1, 2, "x"), (5, 6, "y")]


def test_provided_value_is_validated(spark, gen_table):
    c, t = gen_table
    c.sql(spark, "INSERT INTO db.g (a, b, note) VALUES (1, 2, 'ok')")
    with pytest.raises(Exception, match="gen_b"):
        c.sql(spark, "INSERT INTO db.g (a, b, note) VALUES (1, 99, 'bad')")
    assert _rows(t) == [(1, 2, "ok")]


def test_python_append_computes_when_absent(spark, gen_table):
    _c, t = gen_table
    t.append(spark.createDataFrame([(10, "z")], "a int, note string"))
    assert _rows(t) == [(10, 11, "z")]
    # and validates when present
    with pytest.raises(Exception, match="gen_b"):
        t.append(
            spark.createDataFrame([(1, 0, "w")], "a int, b int, note string")
        )


def test_dml_paths_keep_the_invariant(spark, gen_table):
    c, t = gen_table
    c.sql(spark, "INSERT INTO db.g (a, note) VALUES (1, 'x')")
    # an UPDATE changing the SOURCE recomputes the generated column
    # (Delta semantics) — two-phase: a evaluates over the OLD row, then
    # b over the updated value
    c.sql(spark, "UPDATE db.g SET a = a + 99 WHERE note = 'x'")
    assert _rows(t) == [(100, 101, "x")]
    # an explicit INCONSISTENT assignment is refused by the constraint
    with pytest.raises(Exception, match="gen_b"):
        c.sql(spark, "UPDATE db.g SET a = 5, b = 99 WHERE note = 'x'")
    # an explicit consistent one passes
    c.sql(spark, "UPDATE db.g SET a = 5, b = 6 WHERE note = 'x'")
    assert _rows(t) == [(5, 6, "x")]
    # updates NOT touching the source leave the generated value alone
    c.sql(spark, "UPDATE db.g SET note = 'y' WHERE a = 5")
    assert _rows(t) == [(5, 6, "y")]
    # Python-API scalar assignment recomputes too (literal substitution)
    t.update(where=[("note", "=", "y")], set_exprs={"a": 7})
    assert _rows(t) == [(7, 8, "y")]
    # a Column-object assignment to the source cannot substitute: loud
    with pytest.raises(ValueError, match="assign b explicitly"):
        t.update(where=[("note", "=", "y")], set_exprs={"a": F.lit(1) + 1})


def test_show_create_emits_and_reruns(spark, gen_table, tmp_path):
    c, t = gen_table
    ddl = c.sql(spark, "SHOW CREATE TABLE db.g").first().createtab_stmt
    assert "GENERATED ALWAYS AS (a + 1)" in ddl
    c2 = NamedCatalog(tmp_path / "cat2.json")
    c2.sql(spark, ddl.replace(str(t.root), str(tmp_path / "g2")))
    t2 = ManagedTable(spark, tmp_path / "g2")
    assert t2.generated_columns() == {"b": "a + 1"}
    assert t2.snapshot().constraints == {"gen_b": "b <=> CAST((a + 1) AS int)"}


def test_clone_and_like_carry_generation(spark, gen_table, tmp_path):
    c, t = gen_table
    clone = t.clone_to(tmp_path / "cl")
    assert clone.generated_columns() == {"b": "a + 1"}
    c.sql(spark, f"CREATE TABLE db.g3 LIKE db.g LOCATION '{tmp_path/'g3'}'")
    t3 = ManagedTable(spark, tmp_path / "g3")
    assert t3.generated_columns() == {"b": "a + 1"}
    t3.append(spark.createDataFrame([(7, "q")], "a int, note string"))
    assert _rows(t3) == [(7, 8, "q")]


def test_bad_expression_fails_create_cleanly(spark, tmp_path):
    c = NamedCatalog(tmp_path / "cat.json")
    with pytest.raises(ValueError, match="does not resolve"):
        c.sql(
            spark,
            f"CREATE TABLE db.bad (a INT, b INT GENERATED ALWAYS AS "
            f"(nosuch + 1)) USING managed_table "
            f"LOCATION '{tmp_path / 'bad'}'",
        )
    assert "db.bad" not in c.names()


def test_generated_referencing_generated_refused(spark, tmp_path):
    c = NamedCatalog(tmp_path / "cat.json")
    with pytest.raises(ValueError, match="references generated"):
        c.sql(
            spark,
            f"CREATE TABLE db.gg (a INT, "
            f"b INT GENERATED ALWAYS AS (a + 1), "
            f"d INT GENERATED ALWAYS AS (b + 1)) "
            f"USING managed_table LOCATION '{tmp_path / 'gg'}'",
        )


def test_generated_composes_with_comment_clause(spark, tmp_path):
    c = NamedCatalog(tmp_path / "cat.json")
    c.sql(
        spark,
        f"CREATE TABLE db.gc (a INT, b INT GENERATED ALWAYS AS (a * 2) "
        f"COMMENT 'twice a') USING managed_table "
        f"LOCATION '{tmp_path / 'gc'}'",
    )
    t = ManagedTable(spark, tmp_path / "gc")
    assert t.generated_columns() == {"b": "a * 2"}
    assert t.column_comments() == {"b": "twice a"}
    # rename of the referenced column is blocked by the constraint
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("a", "alpha")


def test_insert_by_name_binds_and_computes(spark, gen_table):
    """INSERT INTO t BY NAME SELECT ...: source columns bind to
    same-named table columns in any order; omitted generated columns
    compute, omitted plain columns null-backfill."""
    c, t = gen_table
    c.sql(
        spark,
        "INSERT INTO db.g BY NAME SELECT 'n' AS note, 3 AS a",
    )
    assert _rows(t) == [(3, 4, "n")]
    # unknown source column is loud
    with pytest.raises(Exception, match="unknown columns"):
        c.sql(spark, "INSERT INTO db.g BY NAME SELECT 1 AS zz")
    # BY NAME + column list is contradictory
    with pytest.raises(ValueError, match="column list"):
        c.sql(spark, "INSERT INTO db.g (a) BY NAME SELECT 1 AS a")
    # 'by' / 'name' outside this position stay usable (positional insert
    # of a source whose columns are named differently still works)
    c.sql(spark, "INSERT INTO db.g (a, note) SELECT 9 AS x, 'p' AS y")
    assert (9, 10, "p") in _rows(t)


def test_update_rhs_sees_old_values_simultaneous_substitution(
    spark, tmp_path
):
    """SQL UPDATE semantics: every assignment RHS evaluates over the OLD
    row. With g GENERATED ALWAYS AS (a + b) and UPDATE SET a = b + 1,
    b = 0, the recompute must be (old_b + 1) + 0 — sequential text
    substitution would corrupt it to ((0) + 1) + (0)."""
    c = NamedCatalog(tmp_path / "cat.json")
    c.sql(
        spark,
        f"CREATE TABLE db.s (a INT, b INT, "
        f"g INT GENERATED ALWAYS AS (a + b)) "
        f"USING managed_table LOCATION '{tmp_path / 's'}'",
    )
    c.sql(spark, "INSERT INTO db.s (a, b) VALUES (10, 7)")
    t = ManagedTable(spark, tmp_path / "s")
    t.update([("b", "=", 7)], {"a": "b + 1", "b": "0"})
    # new a = old_b + 1 = 8, new b = 0, g = 8 + 0 = 8
    assert _rows(t) == [(8, 0, 8)]


def test_generated_narrowing_cast_checks_the_stored_value(spark, tmp_path):
    """A generated column whose declared type NARROWS the expression's
    natural type (FLOAT from a DOUBLE product): the engine stores
    cast(expr AS float), so the auto CHECK must compare against the same
    cast — otherwise every insert on the table rejects its own value."""
    c = NamedCatalog(tmp_path / "cat.json")
    c.sql(
        spark,
        f"CREATE TABLE db.nw (a DOUBLE, "
        f"b FLOAT GENERATED ALWAYS AS (a * 0.1)) "
        f"USING managed_table LOCATION '{tmp_path / 'nw'}'",
    )
    c.sql(spark, "INSERT INTO db.nw (a) VALUES (3.0), (7.7)")
    t = ManagedTable(spark, tmp_path / "nw")
    got = {r["a"]: r["b"] for r in t.read().collect()}
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    assert got == {3.0: f32(0.30000000000000004), 7.7: f32(0.77)}
    # UPDATE through the recompute path keeps the same cast contract
    t.update([("a", "=", 3.0)], {"a": "4.0"})
    got = {r["a"]: r["b"] for r in t.read().collect()}
    assert got[4.0] == f32(0.4)
