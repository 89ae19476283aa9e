"""Shallow clone (ManagedTable.clone_to, Delta CLONE semantics): a
metadata-only commit referencing the source's files by absolute path —
zero bytes copied — with full write isolation in both directions and a
compact() escape hatch that re-materializes the clone self-contained."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)


def _mk(spark, root, n=1000, bloom=False):
    t = ManagedTable.create(
        spark, root, bloom_cols=["k"] if bloom else None
    )
    base = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    for i in range(2):
        t.append(base.filter(F.col("k") % 2 == i).coalesce(1))
    return t


def _data_files(root: Path) -> list[Path]:
    d = root / "data"
    return list(d.rglob("*.parquet")) if d.exists() else []


def test_clone_is_zero_copy_and_reads_equal(spark, tmp_path):
    src = _mk(spark, tmp_path / "src")
    c = src.clone_to(tmp_path / "clone")
    assert _data_files(tmp_path / "clone") == []  # no bytes copied
    assert sorted(map(tuple, c.read().collect())) == sorted(
        map(tuple, src.read().collect())
    )
    assert c.count() == 1000  # metadata-only count too


def test_clone_is_snapshot_anchored(spark, tmp_path):
    src = _mk(spark, tmp_path / "src")
    c = src.clone_to(tmp_path / "clone")
    src.append(spark.range(5000, 5100).selectExpr("id AS k", "id % 7 AS v"))
    assert src.count() == 1100
    assert c.count() == 1000  # later source commits never appear


def test_clone_writes_are_isolated_both_ways(spark, tmp_path):
    src = _mk(spark, tmp_path / "src")
    c = src.clone_to(tmp_path / "clone")
    src_before = {str(p): p.stat().st_size for p in _data_files(tmp_path / "src")}
    # clone-side DML on a REFERENCED file: DV delete, source untouched
    assert c.delete(where=[("k", "=", 123)]) == 1
    assert c.count() == 999
    assert src.count() == 1000
    assert {
        str(p): p.stat().st_size for p in _data_files(tmp_path / "src")
    } == src_before
    # clone-side append stays clone-local
    c.append(spark.range(9000, 9010).selectExpr("id AS k", "id % 7 AS v"))
    assert c.count() == 1009 and src.count() == 1000
    assert len(_data_files(tmp_path / "clone")) > 0
    # update through the clone as well — rewrite lands clone-local
    assert c.update(where=[("k", "=", 500)], set_exprs={"v": F.lit(99)}) == 1
    assert c.read().filter("k = 500").collect()[0]["v"] == 99
    assert src.read().filter("k = 500").collect()[0]["v"] == 500 % 7


def test_clone_vacuum_never_touches_source(spark, tmp_path):
    src = _mk(spark, tmp_path / "src")
    c = src.clone_to(tmp_path / "clone")
    c.append(spark.range(9000, 9010).selectExpr("id AS k", "id % 7 AS v"))
    src_files = set(map(str, _data_files(tmp_path / "src")))
    c.vacuum(retention_seconds=0.0)
    assert set(map(str, _data_files(tmp_path / "src"))) == src_files
    assert c.count() == 1010


def test_clone_compact_materializes_self_contained(spark, tmp_path):
    src = _mk(spark, tmp_path / "src")
    c = src.clone_to(tmp_path / "clone")
    before = sorted(map(tuple, c.read().collect()))
    c.compact()
    m = c.snapshot()
    clone_root = str((tmp_path / "clone").resolve())
    # every live entry is now clone-local (relative path)
    assert all(
        not Path(f.path).is_absolute()
        or str(Path(f.path)).startswith(clone_root)
        for f in m.files
    )
    assert sorted(map(tuple, c.read().collect())) == before
    # source vacuum after a source rewrite can no longer break the clone
    src.overwrite(spark.range(3).selectExpr("id AS k", "id % 7 AS v"))
    src.vacuum(retention_seconds=0.0)
    assert sorted(map(tuple, c.read().collect())) == before


def test_source_vacuum_breaks_unmaterialized_clone_loudly(spark, tmp_path):
    src = _mk(spark, tmp_path / "src")
    c = src.clone_to(tmp_path / "clone")
    src.overwrite(spark.range(3).selectExpr("id AS k", "id % 7 AS v"))
    src.vacuum(retention_seconds=0.0)  # referenced bytes now gone
    with pytest.raises(Exception):  # FileNotFound at scan — never silent
        c.read().count()


def test_clone_keeps_bloom_pruning(spark, tmp_path):
    src = _mk(spark, tmp_path / "src", bloom=True)
    c = src.clone_to(tmp_path / "clone")
    df = c.read(where=[("k", "=", 123)])
    # 123 is odd -> lives in the second appended file only; the clone
    # must bloom-prune the other referenced file via the dual-keyed
    # sidecar lookup
    assert len(df.inputFiles()) == 1
    assert [r["k"] for r in df.collect()] == [123]


def test_clone_of_clone(spark, tmp_path):
    src = _mk(spark, tmp_path / "src")
    c1 = src.clone_to(tmp_path / "c1")
    c2 = c1.clone_to(tmp_path / "c2")
    assert c2.count() == 1000
    assert sorted(map(tuple, c2.read().collect())) == sorted(
        map(tuple, src.read().collect())
    )
    assert _data_files(tmp_path / "c2") == []


def test_clone_refuses_existing_dest(spark, tmp_path):
    src = _mk(spark, tmp_path / "src")
    ManagedTable.create(spark, tmp_path / "other")
    with pytest.raises(FileExistsError):
        src.clone_to(tmp_path / "other")


def test_clone_declarative_read_honors_source_dv(spark, tmp_path):
    """Regression: a clone's manifest references source files by ABSOLUTE
    path, but the source's DV parquets key file_path relative to the
    SOURCE root — the declarative reader must match on file_uri too, or
    deleted rows silently resurrect on clone reads."""
    from data_warehouse_copy_spark.sources.datasource import register

    register(spark)
    src = _mk(spark, tmp_path / "src")
    assert src.delete(where=[("k", "<", 10)]) == 10  # DV on source files
    c = src.clone_to(tmp_path / "clone")
    assert c.read().count() == 990  # JVM path (URI anti-join) — baseline
    via_ds = spark.read.format("managed_table").load(str(c.root))
    assert via_ds.count() == 990  # declarative path must agree
    assert sorted(r["k"] for r in via_ds.collect()) == sorted(
        r["k"] for r in src.read().collect()
    )


def test_clone_declarative_merge_honors_source_dv(spark, tmp_path):
    """Regression twin for the write side: a declarative mergeKey upsert
    into a clone must honor the source's prior DVs. Re-tombstoning
    already-dead positions inflates dv_rows past the file's row count and
    evicts a file that still holds live rows — silent data loss."""
    from data_warehouse_copy_spark.sources.datasource import register

    register(spark)
    src = _mk(spark, tmp_path / "src")  # two files: evens, odds, 500 rows each
    # DV-kill 499 of 500 rows in each file; only k=998 and k=999 live
    assert src.delete(where=[("k", "<", 998)]) == 998
    c = src.clone_to(tmp_path / "clone")
    assert c.count() == 2
    # upsert two keys that are ALREADY dead in the evens file: honoring
    # prior DVs must find zero positions to tombstone (0 and 2 are dead),
    # so dv_rows stays 499 < 500 and live row k=998 survives
    up = spark.createDataFrame([(0, 100), (2, 100)], "k long, v long")
    (
        up.write.format("managed_table")
        .mode("append")
        .option("mergeKey", "k")
        .save(str(c.root))
    )
    got = {r["k"]: r["v"] for r in c.read().collect()}
    assert got == {998: 998 % 7, 999: 999 % 7, 0: 100, 2: 100}
    assert max(f.dv_rows for f in c.snapshot().files) == 499  # not inflated


def test_clone_carries_constraints_and_properties(spark, tmp_path):
    """Delta clones carry the source's CHECK constraints and table
    properties (round-10): both clone flavors keep enforcing on
    clone-local writes, and the auto-compact policy follows."""
    import pytest

    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.range(1, 10).selectExpr("id AS k"))
    t.add_constraint("k_pos", "k > 0")
    t.set_auto_compact(max_files_per_partition=8)
    s = t.clone_to(tmp_path / "s")
    d = t.deep_clone_to(tmp_path / "d")
    for clone in (s, d):
        assert clone.snapshot().constraints == {"k_pos": "k > 0"}
        assert clone.auto_compact_policy()["max_files_per_partition"] == 8
        with pytest.raises(ValueError, match="k_pos"):
            clone.append(spark.range(-3, -1).selectExpr("id AS k"))
    # the source's own state is untouched by the clones' existence
    assert t.snapshot().constraints == {"k_pos": "k > 0"}
