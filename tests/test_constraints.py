"""CHECK constraints (Delta's ALTER TABLE ... ADD CONSTRAINT): a
metadata-recorded boolean SQL expression that every row-introducing
write proves before committing. One aggregate job covers all
constraints over the INCOMING rows only; maintenance rewrites
(compact/recluster) never re-check rows that already passed, and
unconstrained tables pay nothing anywhere. The reference has no
constraint surface at all (SQL Server enforced its own); this is
forward lakehouse surface."""

import pytest
from pyspark.sql import functions as F

from data_warehouse_copy_spark.sources.managed_table import ManagedTable


def _mk(spark, root, n=10):
    t = ManagedTable.create(spark, root)
    t.append(
        spark.range(n).selectExpr(
            "cast(id as int) as k",
            "cast(id * 1.0 as double) as v",
            "concat('n', id) as name",
        )
    )
    return t


def test_add_validates_existing_data(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="existing data violates"):
        t.add_constraint("k_small", "k < 5")
    t.add_constraint("k_sane", "k < 100")
    assert t.snapshot().constraints == {"k_sane": "k < 100"}
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint("k_sane", "k < 50")
    with pytest.raises(ValueError, match="identifier"):
        t.add_constraint("bad name", "k < 50")


def test_writes_enforce_atomically(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.add_constraint("v_nonneg", "v >= 0")
    bad = spark.createDataFrame(
        [(99, -1.0, "bad")], "k int, v double, name string"
    )
    for op in ("append", "overwrite", "replace_where", "merge_by_key"):
        with pytest.raises(ValueError, match="violates CHECK"):
            if op == "append":
                t.append(bad)
            elif op == "overwrite":
                t.overwrite(bad)
            elif op == "replace_where":
                t.replace_where(bad, [("k", "=", 99)])
            else:
                t.merge_by_key(bad, "k")
    assert t.count() == 10  # nothing committed by any failed attempt
    with pytest.raises(ValueError, match="update violates"):
        t.update([("k", "=", 3)], {"v": -7.0})
    assert t.read(where=[("k", "=", 3)]).select("v").first()[0] == 3.0
    # expression MERGE enforces the post-assignment rows too
    src = spark.createDataFrame([(3, 0.0, "s")], "k int, v double, name string")
    with pytest.raises(ValueError, match="merge violates"):
        t.merge(src, on="k", when_matched_update={"v": "-1.0"})
    ok = spark.createDataFrame([(50, 5.0, "ok")], "k int, v double, name string")
    assert t.append(ok) == 1


def test_null_passes_sql_check_semantics(spark, tmp_path):
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.createDataFrame([(1, 2.0)], "k int, v double"))
    t.add_constraint("v_pos", "v > 0")
    t.append(spark.createDataFrame([(2, None)], "k int, v double"))
    assert t.count() == 2


def test_evolution_of_referenced_column_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.add_constraint("v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        t.rename_column("v", "val")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        t.drop_column("v")
    t.rename_column("name", "title")  # unreferenced columns evolve freely
    t.drop_constraint("v_nonneg")
    t.rename_column("v", "val")
    assert t.read().columns == ["k", "val", "title"]
    with pytest.raises(ValueError, match="no such constraint"):
        t.drop_constraint("v_nonneg")


def test_constraints_survive_checkpoint_and_bounded_paths(
    spark, tmp_path, monkeypatch
):
    import data_warehouse_copy_spark.sources.managed_table as mt

    t = _mk(spark, tmp_path / "t")
    t.add_constraint("v_nonneg", "v >= 0")
    t._write_checkpoint(t.snapshot())
    monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
    # bounded ingest path sees the constraint from the header fold
    with pytest.raises(ValueError, match="violates CHECK"):
        t.append(
            spark.createDataFrame(
                [(99, -1.0, "bad")], "k int, v double, name string"
            )
        )
    with pytest.raises(ValueError, match="update violates"):
        t.update([("k", "=", 3)], {"v": -7.0})
    assert t._constraints_at() == {"v_nonneg": "v >= 0"}


def test_declarative_writer_enforces_portable_constraints(spark, tmp_path):
    """Round-7 item 1: portable CHECK constraints are PROVEN over the
    staged bytes by the session-less commit hook (DuckDB over the exact
    parquet the commit references) — a violating declarative write fails
    atomically, a valid one lands."""
    from data_warehouse_copy_spark.sources.datasource import (
        ManagedTableDataSource,
    )

    spark.dataSource.register(ManagedTableDataSource)
    t = _mk(spark, str(tmp_path / "t"))
    t.add_constraint("v_nonneg", "v >= 0 AND length(name) > 0")
    ok = spark.createDataFrame([(1, 1.0, "d")], "k int, v double, name string")
    ok.write.format("managed_table").mode("append").save(str(tmp_path / "t"))
    assert t.count() == 11
    bad = spark.createDataFrame(
        [(2, 2.0, "e"), (3, -1.0, "f")], "k int, v double, name string"
    )
    with pytest.raises(Exception, match="violates CHECK"):
        bad.write.format("managed_table").mode("append").save(
            str(tmp_path / "t")
        )
    assert t.count() == 11  # the violating write committed NOTHING


def test_declarative_writer_rejects_nonportable_constraints(spark, tmp_path):
    """A constraint OUTSIDE the portable ANSI subset (here: a regex)
    cannot be proven session-lessly — the declarative write rejects
    loudly at plan time, never silently skips enforcement."""
    from data_warehouse_copy_spark.sources.datasource import (
        ManagedTableDataSource,
    )

    spark.dataSource.register(ManagedTableDataSource)
    t = _mk(spark, str(tmp_path / "t"))
    t.add_constraint("name_shape", "name rlike '^n[0-9]+$'")
    df = spark.createDataFrame([(1, 1.0, "n1")], "k int, v double, name string")
    with pytest.raises(Exception, match="portable ANSI subset"):
        df.write.format("managed_table").mode("append").save(
            str(tmp_path / "t")
        )
    # the native session-backed path still enforces and accepts it
    t.append(df)
    assert t.count() == 11


def test_sql_constraint_ddl(spark, tmp_path):
    from data_warehouse_copy_spark.sources.names import NamedCatalog
    from data_warehouse_copy_spark.sources.sql_dml import SqlDmlError

    t = _mk(spark, str(tmp_path / "t"))
    c = NamedCatalog(tmp_path / "cat.json")
    c.register("db.t", str(tmp_path / "t"))
    r = c.sql(
        spark,
        "ALTER TABLE db.t ADD CONSTRAINT v_rng "
        "CHECK (v >= 0 AND length(name) > 0)",
    ).first()
    assert r.operation == "ALTER ADD_CONSTRAINT"
    with pytest.raises(ValueError, match="violates CHECK"):
        c.sql(spark, "INSERT INTO db.t VALUES (100, -2.0, 'x')")
    c.sql(spark, "INSERT INTO db.t VALUES (100, 2.0, 'x')")
    assert t.count() == 11
    c.sql(spark, "ALTER TABLE db.t DROP CONSTRAINT v_rng")
    c.sql(spark, "INSERT INTO db.t VALUES (101, -2.0, 'y')")
    assert t.count() == 12
    with pytest.raises(SqlDmlError, match="requires an expression"):
        c.sql(spark, "ALTER TABLE db.t ADD CONSTRAINT e CHECK ()")


def test_restore_rolls_constraints(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")  # v1
    t.add_constraint("v_nonneg", "v >= 0")  # v2
    t.restore(1)  # pre-constraint state
    t.append(
        spark.createDataFrame([(99, -1.0, "ok")], "k int, v double, name string")
    )
    assert t.count() == 11


def test_unconstrained_tables_pay_nothing(spark, tmp_path):
    # the enforcement helper returns immediately when no constraints
    t = _mk(spark, tmp_path / "t")
    assert t.snapshot().constraints is None
    t._enforce_constraints(None, None, "noop")  # df never touched


def test_constraint_commits_never_rebase(spark, tmp_path):
    """Concurrency: an add_constraint validated the data AT ITS BASE, so
    it must not silently rebase over a racer's (unvalidated) rows; and a
    WRITE whose rows were proven against the old constraint set must not
    rebase over a constraint change. Both directions reject cleanly."""
    from data_warehouse_copy_spark.sources.managed_table import (
        ConcurrentWriteError,
    )

    t = _mk(spark, tmp_path / "t")
    stale_head = t._head_version()
    t.append(
        spark.createDataFrame([(99, -1.0, "racer")],
                              "k int, v double, name string")
    )
    # constraint commit from the stale base: the racer's -1.0 row was
    # never validated -> clean rejection, not a silent rebase
    with pytest.raises(ConcurrentWriteError, match="exclusive"):
        t._commit_bounded(
            stale_head, (), set(), "add_constraint",
            constraints={"v_nonneg": "v >= 0"}, exclusive=True,
        )
    # write from a stale base racing a constraint change: rejected too
    m_stale = t.snapshot()
    t.add_constraint("k_pos", "k >= 0")
    new = t._write_files(
        spark.createDataFrame([(50, 1.0, "w")],
                              "k int, v double, name string"),
        None, None,
    )
    with pytest.raises(ConcurrentWriteError, match="constraint"):
        t._commit_files(
            m_stale, tuple(m_stale.files) + new, None, "append"
        )


def test_check_covers_exactly_the_written_rows(spark, tmp_path):
    """Round-7 advisor finding: _enforce_constraints used to run as a
    separate action BEFORE the write re-computed the incoming frame —
    check-then-act. A non-deterministic source could pass the check and
    then materialize DIFFERENT (violating) rows for the write. The fix
    pins the frame (lazy localCheckpoint) so the validation aggregate
    and the write read the same rows: here a source that yields valid
    values on its FIRST evaluation and violating ones on any re-run
    must land its first-evaluation rows (and only evaluate once)."""
    t = _mk(spark, tmp_path / "t")
    t.add_constraint("v_nonneg", "v >= 0")

    marker = tmp_path / "evals"
    marker.write_text("0")

    def unstable(batches):
        import pandas as pd

        n = int(marker.read_text()) + 1
        marker.write_text(str(n))
        v = 5.0 if n == 1 else -5.0
        for b in batches:
            yield pd.DataFrame(
                {"k": b["id"] + 100, "v": v, "name": "gen"}
            )

    src = (
        spark.range(3, numPartitions=1)
        .mapInPandas(unstable, "k long, v double, name string")
        .selectExpr("cast(k as int) as k", "v", "name")
    )
    t.append(src)
    got = t.read(where=[("k", ">=", 100)]).select("v").collect()
    assert [r["v"] for r in got] == [5.0, 5.0, 5.0]
    # and the source was evaluated exactly once (the pinned check)
    assert marker.read_text() == "1"


def test_constraint_portability_gate_units():
    """The tokenizer gate behind session-less declarative enforcement:
    fails CLOSED on anything whose Spark/DuckDB semantics are unproven
    (regex operators, casts, unknown functions, comments, bare words),
    admits the portable ANSI core."""
    from data_warehouse_copy_spark.sources.datasource import (
        _constraint_portable as p,
    )

    cols = {"k", "v", "name"}
    assert p("v >= 0", cols)
    assert p("v >= 0 AND length(name) > 0", cols)
    assert p("name LIKE 'a%'", cols)
    assert p("k IN (1, 2, 3)", cols)
    assert p("v IS NOT NULL", cols)
    assert p("k BETWEEN 1 AND 9", cols)
    assert p("coalesce(v, 0) > -1 OR abs(v) < 1e6", cols)
    assert p("upper(name) = 'X'", cols)
    assert not p("name rlike '^n'", cols)      # dialect operator word
    assert not p("cast(v as int) > 0", cols)   # unknown function
    assert not p("rand() < v", cols)           # non-deterministic
    assert not p("year(d) > 2000", cols)       # unknown fn + column
    assert not p("v > 0 -- cmt", cols)         # untokenizable tail
    assert not p("k div 2 = 0", cols)          # dialect operator word
    assert not p("nosuchcol > 0", cols)        # not a column


# ------------------------------------------ differential proof parity


_SWEEP_SCHEMA = "k long, v double, s string"

# (expr, accepted rows, rejected rows) — each case appends `accepted`
# (must land in BOTH paths) then `rejected` (must fail atomically in
# BOTH paths). NULL rows exercise SQL CHECK's NULL-passes semantics.
_SWEEP_CASES = [
    ("k >= 0", [(0, 1.0, "a"), (None, 1.0, "a")], [(-1, 1.0, "a")]),
    ("v * 2 >= k - 1", [(3, 1.0, "a")], [(10, 1.0, "a")]),
    ("s IN ('a', 'b', 'c')", [(1, 1.0, "b"), (2, 1.0, None)], [(1, 1.0, "z")]),
    ("length(s) <= 3", [(1, 1.0, "abc"), (1, 1.0, None)], [(1, 1.0, "abcd")]),
    ("s LIKE 'a%'", [(1, 1.0, "ax")], [(1, 1.0, "bx")]),
    ("k BETWEEN 0 AND 100", [(100, 1.0, "a")], [(101, 1.0, "a")]),
    ("coalesce(v, 0.0) >= 0", [(1, None, "a"), (1, 2.0, "a")], [(1, -0.5, "a")]),
    ("abs(k) < 1000 AND (v > 0 OR s IS NULL)", [(999, 0.1, "a"), (5, -1.0, None)],
     [(1000, 1.0, "a"), (1, -1.0, "a")]),
    ("NOT (k = 13)", [(12, 1.0, "a")], [(13, 1.0, "a")]),
    ("CASE WHEN k > 10 THEN v > 0 ELSE v <= 0 END",
     [(11, 0.5, "a"), (1, -0.5, "a")], [(11, -0.5, "a"), (1, 0.5, "a")]),
    ("greatest(k, 0) <= 50 OR upper(s) = 'BIG'",
     [(40, 1.0, "x"), (60, 1.0, "big")], [(60, 1.0, "x")]),
]


def test_constraint_proof_paths_agree(spark, tmp_path):
    """Round-9 (verdict item 7): the native Spark-aggregate proof
    (``_enforce_constraints``) and the declarative DuckDB-over-staged-
    bytes proof (``_enforce_staged_constraints``) are two evaluators of
    ONE semantic — sweep a library of CHECK expressions (arithmetic,
    IN-lists, CASE, string predicates, NULL edges) through BOTH paths
    and assert accept/reject parity on identical rows."""
    from data_warehouse_copy_spark.sources.datasource import (
        ManagedTableDataSource,
        _constraint_portable,
    )

    spark.dataSource.register(ManagedTableDataSource)
    for i, (expr, good, bad) in enumerate(_SWEEP_CASES):
        assert _constraint_portable(expr, {"k", "v", "s"}), expr
        roots = []
        for path_name in ("native", "declar"):
            root = tmp_path / f"c{i}_{path_name}"
            t = ManagedTable.create(spark, root)
            # seed with a row the expression accepts (constraints demand
            # a pinned schema and validate existing data on add)
            t.append(spark.createDataFrame(good[:1], _SWEEP_SCHEMA))
            t.add_constraint("chk", expr)
            roots.append((path_name, t, root))
        for path_name, t, root in roots:
            def write(rows):
                df = spark.createDataFrame(rows, _SWEEP_SCHEMA)
                if path_name == "native":
                    t.append(df)
                else:
                    df.write.format("managed_table").mode("append").save(
                        str(root)
                    )
            write(good)  # both paths must accept
            assert t.count() == 1 + len(good), (expr, path_name)
            with pytest.raises(Exception, match="violates CHECK"):
                write(bad)  # both paths must reject atomically
            assert t.count() == 1 + len(good), (expr, path_name)


def test_constraint_nonportable_fails_closed_declaratively(spark, tmp_path):
    """The portability gate's failure mode is LOUD, never silent: an
    expression outside the proven subset (a cast, a regex, an unknown
    function) is enforced natively but makes the declarative write
    reject with a pointer to the native path — a constraint is never
    recorded-and-skipped."""
    from data_warehouse_copy_spark.sources.datasource import (
        ManagedTableDataSource,
        _constraint_portable,
    )

    spark.dataSource.register(ManagedTableDataSource)
    for expr in (
        "CAST(k AS STRING) <> '13'",
        "s RLIKE '^a'",
        "my_udf(k) > 0",
        "k DIV 2 = 0",
    ):
        assert not _constraint_portable(expr, {"k", "v", "s"}), expr
    root = tmp_path / "np"
    t = ManagedTable.create(spark, root)
    t.append(spark.createDataFrame([(1, 1.0, "a")], _SWEEP_SCHEMA))
    t.add_constraint("chk", "CAST(k AS STRING) <> '13'")
    # native path enforces it
    with pytest.raises(ValueError, match="violates CHECK"):
        t.append(spark.createDataFrame([(13, 1.0, "a")], _SWEEP_SCHEMA))
    # declarative path fails closed, naming the workaround
    ok = spark.createDataFrame([(2, 1.0, "a")], _SWEEP_SCHEMA)
    with pytest.raises(Exception, match="cannot enforce|portable"):
        ok.write.format("managed_table").mode("append").save(str(root))
    assert t.count() == 1


def test_sql_not_null_constraint_surface(spark, tmp_path):
    """ALTER TABLE ... ALTER COLUMN c SET NOT NULL / DROP NOT NULL
    (round-10, Delta's nullability DDL): rides the CHECK machinery as
    constraint nn_<col> — existing rows validated at SET (a present
    NULL rejects it), every later write proves its rows, DROP lifts it;
    TYPE / SET DATA TYPE keep parsing beside the new forms."""
    from data_warehouse_copy_spark.sources.names import NamedCatalog

    t = _mk(spark, tmp_path / "t")
    cat = NamedCatalog(tmp_path / "cat.json")
    cat.register("db.t", tmp_path / "t")
    res = cat.sql(
        spark, "ALTER TABLE db.t ALTER COLUMN name SET NOT NULL"
    ).collect()
    assert res[0].operation == "ALTER SET_NOT_NULL"
    with pytest.raises(ValueError, match="nn_name"):
        cat.sql(spark, "INSERT INTO db.t VALUES (99, 9.0, NULL)")
    assert t.count() == 10  # the violating insert landed nothing
    # the widen forms still parse next to the nullability forms
    cat.sql(spark, "ALTER TABLE db.t ALTER COLUMN k SET DATA TYPE bigint")
    cat.sql(spark, "ALTER TABLE db.t ALTER COLUMN k TYPE bigint")
    cat.sql(spark, "ALTER TABLE db.t ALTER COLUMN name DROP NOT NULL")
    cat.sql(spark, "INSERT INTO db.t VALUES (99, 9.0, NULL)")
    assert t.count() == 11
    # SET NOT NULL over data that already holds a NULL is refused
    with pytest.raises(ValueError, match="existing data violates"):
        cat.sql(spark, "ALTER TABLE db.t ALTER COLUMN name SET NOT NULL")
    cat.detach(spark)
