"""Row-level change data feed (VERDICT r5 item 2): read_cdf() and the
declarative changesFrom read reconstruct exact _change_type rows —
insert / delete / update_preimage / update_postimage — from the DV
position files DML commits already write. Pure DV deletes, previously
invisible to cursors, must surface their rows."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)


def _mk(spark, root, n=100):
    t = ManagedTable.create(spark, root)
    t.append(
        spark.range(0, n).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
    )
    return t


def _feed(df) -> set:
    return {
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in df.collect()
    }


def test_cdf_append_is_insert(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=5)
    t.append(spark.createDataFrame([(100, 1)], "k long, v long"))
    assert _feed(t.read_cdf(1)) == {(100, 1, "insert", 2)}
    # full-history feed includes the first append
    assert _feed(t.read_cdf(0)) == {
        (k, k % 7, "insert", 1) for k in range(5)
    } | {(100, 1, "insert", 2)}


def test_cdf_dv_delete_surfaces_rows(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    assert t.delete(where=[("k", "<", 3)]) == 3
    assert _feed(t.read_cdf(1)) == {
        (0, 0, "delete", 2), (1, 1, "delete", 2), (2, 2, "delete", 2)
    }


def test_cdf_second_delete_excludes_first(spark, tmp_path):
    """A second DV on the same file must emit ONLY its own positions."""
    t = _mk(spark, tmp_path / "t")
    t.delete(where=[("k", "<", 3)])
    t.delete(where=[("k", "<", 5)])  # kills 3, 4 (0-2 already dead)
    assert _feed(t.read_cdf(2)) == {
        (3, 3, "delete", 3), (4, 4, "delete", 3)
    }


def test_cdf_update_pre_and_postimage(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.update(where=[("k", "=", 10)], set_exprs={"v": F.lit(99)})
    assert _feed(t.read_cdf(1)) == {
        (10, 10 % 7, "update_preimage", 2),
        (10, 99, "update_postimage", 2),
    }


def test_cdf_overwrite_emits_deletes_and_inserts(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=3)
    t.delete(where=[("k", "=", 0)])  # prior DV: dead rows must NOT re-die
    t.overwrite(spark.createDataFrame([(7, 7)], "k long, v long"))
    assert _feed(t.read_cdf(2)) == {
        (1, 1, "delete", 3),
        (2, 2, "delete", 3),
        (7, 7, "insert", 3),
    }


def test_cdf_merge_renders_delete_plus_insert(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=5)
    t.merge_by_key(
        spark.createDataFrame([(2, 50), (9, 90)], "k long, v long"), "k"
    )
    assert _feed(t.read_cdf(1)) == {
        (2, 2, "delete", 2),  # matched preimage (delete+reinsert contract)
        (2, 50, "insert", 2),
        (9, 90, "insert", 2),
    }


def test_cdf_skips_maintenance_commits(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10)
    t.delete(where=[("k", "=", 0)])
    v = t.snapshot().version
    t.compact()
    assert _feed(t.read_cdf(v)) == set()  # byte motion is not change


def test_cdf_empty_range_schema(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=3)
    df = t.read_cdf(1)
    assert df.count() == 0
    assert df.columns == ["k", "v", "_change_type", "_commit_version"]


def test_declarative_changes_carry_change_type(spark, tmp_path):
    from data_warehouse_copy_spark.sources.datasource import register

    register(spark)
    t = _mk(spark, tmp_path / "t")
    t.delete(where=[("k", "<", 3)])
    t.update(where=[("k", "=", 50)], set_exprs={"v": F.lit(-1)})
    via_ds = (
        spark.read.format("managed_table")
        .option("changesFrom", "1")
        .load(str(t.root))
    )
    got = {
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in via_ds.collect()
    }
    want = _feed(t.read_cdf(1))
    assert got == want == {
        (0, 0, "delete", 2),
        (1, 1, "delete", 2),
        (2, 2, "delete", 2),
        (50, 50 % 7, "update_preimage", 3),
        (50, -1, "update_postimage", 3),
    }


def test_declarative_changes_where_prunes_but_stays_superset(spark, tmp_path):
    from data_warehouse_copy_spark.sources.datasource import register

    register(spark)
    t = _mk(spark, tmp_path / "t")
    t.delete(where=[("k", "<", 3)])
    df = (
        spark.read.format("managed_table")
        .option("changesFrom", "1")
        .option("where", '[["k", "=", 1]]')
        .load(str(t.root))
        .filter("k = 1")
    )
    assert {(r["k"], r["_change_type"]) for r in df.collect()} == {
        (1, "delete")
    }


def test_streaming_change_feed(spark, tmp_path):
    """option("changeFeed","true") on readStream: the tail delivers
    row-level _change_type batches — DV deletes surface (a plain tail
    must either raise or skip them), updates arrive as pre+postimage."""
    from data_warehouse_copy_spark.sources.datasource import register

    register(spark)
    t = _mk(spark, tmp_path / "t", n=10)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = (
        spark.readStream.format("managed_table")
        .option("changeFeed", "true")
        .load(str(t.root))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.read.parquet(str(out))
        assert first.count() == 10  # opening snapshot = the feed's inserts
        assert {r["_change_type"] for r in first.collect()} == {"insert"}
        t.delete(where=[("k", "<", 3)])
        t.update(where=[("k", "=", 5)], set_exprs={"v": F.lit(-1)})
        q.processAllAvailable()
        tail = {
            (r["k"], r["v"], r["_change_type"])
            for r in spark.read.parquet(str(out)).collect()
        } - {(k, k % 7, "insert") for k in range(10)}
        assert tail == {
            (0, 0, "delete"),
            (1, 1, "delete"),
            (2, 2, "delete"),
            (5, 5 % 7, "update_preimage"),
            (5, -1, "update_postimage"),
        }
    finally:
        q.stop()


def test_streaming_change_feed_restart_exactly_once(spark, tmp_path):
    from data_warehouse_copy_spark.sources.datasource import register

    register(spark)
    t = _mk(spark, tmp_path / "t", n=5)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    def start():
        return (
            spark.readStream.format("managed_table")
            .option("changeFeed", "true")
            .load(str(t.root))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    t.delete(where=[("k", "=", 0)])  # lands while the stream is DOWN
    q2 = start()
    try:
        q2.processAllAvailable()
        df = spark.read.parquet(str(out))
        assert df.count() == 6 == df.distinct().count()  # delivered ONCE
        assert df.filter("_change_type = 'delete'").count() == 1
    finally:
        q2.stop()


def test_change_feed_option_validation(spark, tmp_path):
    from data_warehouse_copy_spark.sources.datasource import register

    register(spark)
    t = _mk(spark, tmp_path / "t", n=3)
    with pytest.raises(Exception, match="STREAMING option"):
        spark.read.format("managed_table").option("changeFeed", "true").load(
            str(t.root)
        ).collect()
    # the stream reader is constructed at query start (in the planning
    # worker), so validate the option clash on the class directly
    from pyspark.sql import types as T

    from data_warehouse_copy_spark.sources.datasource import (
        ManagedTableStreamReader,
    )

    with pytest.raises(ValueError, match="do not combine"):
        ManagedTableStreamReader(
            str(t.root),
            {"changefeed": "true", "skipchangecommits": "true"},
            T.StructType([]),
        )


def test_change_feed_composes_with_selective_where(spark, tmp_path):
    """changeFeed + the relation-scoped where option: a key-range
    subscriber's change stream prunes files on manifest stats (the
    conservative-superset contract) — every IN-RANGE change row must
    arrive, tagged correctly, across snapshot AND tail batches."""
    from data_warehouse_copy_spark.sources.datasource import register

    register(spark)
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col="k")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.append(
            spark.range(1000).selectExpr("id AS k", "id % 7 AS v")
            .repartition(4)
        )
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = (
        spark.readStream.format("managed_table")
        .option("changeFeed", "true")
        .option("where", '[["k", "<", 100]]')
        .load(str(t.root))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()  # snapshot batch, pruned
        first = spark.read.parquet(str(out))
        got = {(r["k"], r["_change_type"]) for r in first.collect()}
        assert {(k, "insert") for k in range(100)} <= got
        t.delete(where=[("k", "<", 5)])
        t.update(where=[("k", "=", 50)], set_exprs={"v": F.lit(-1)})
        t.delete(where=[("k", ">=", 900)])  # out-of-range churn
        q.processAllAvailable()  # tail, pruned
        rows = spark.read.parquet(str(out)).collect()
        tail = {
            (r["k"], r["v"], r["_change_type"])
            for r in rows
            if r["_change_type"] != "insert"
        }
        # every in-range change arrived with its exact row
        for k in range(5):
            assert (k, k % 7, "delete") in tail
        assert (50, 50 % 7, "update_preimage") in tail
        assert (50, -1, "update_postimage") in tail
    finally:
        q.stop()
