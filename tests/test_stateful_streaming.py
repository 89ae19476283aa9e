"""applyInPandasWithState: per-user running profile accumulates correctly
across multiple micro-batches and matches the batch aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from data_warehouse_copy_spark.sources.catalog import load_table

    return load_table(spark, sf_dir, "events").cache()


def test_stateful_profile_matches_batch_across_batches(spark, events, tmp_path):
    from data_warehouse_copy_spark.streaming.stateful import running_user_profile

    # split the fixture into 4 files -> 4 micro-batches with state carryover
    src = str(tmp_path / "src")
    events.withColumn("ts", F.col("ts").cast("timestamp")).repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        running_user_profile(stream)
        .writeStream.format("memory")
        .queryName("user_profile")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 4, "expected one micro-batch per input file"

    # update mode appends one row per user per batch; the final state is the
    # row with the highest n_events per user
    sink = spark.table("user_profile")
    final = (
        sink.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
            F.max("last_ts").alias("last_ts"),
        )
        .collect()
    )
    expected = {
        r["user_id"]: r
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max(F.col("ts").cast("timestamp")).alias("last_ts"),
        )
        .collect()
    }
    assert len(final) == len(expected)
    for r in final:
        e = expected[r["user_id"]]
        assert r["n_events"] == e["n_events"]
        assert r["total_value"] == pytest.approx(e["total_value"], rel=1e-9)
        assert r["last_ts"] == e["last_ts"]




def test_transform_with_state_matches_apply_in_pandas_twin(spark, events, tmp_path):
    """The Spark 4 transformWithStateInPandas profile must accumulate the
    same final per-user state across micro-batches as the
    applyInPandasWithState twin and the batch aggregate."""
    from data_warehouse_copy_spark.streaming.stateful import (
        running_user_profile_tws,
    )

    if running_user_profile_tws is None:
        pytest.skip("transformWithStateInPandas requires Spark >= 4.0")
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "transformWithStateInPandas's state-server protocol needs the "
            "protobuf package at runtime (absent in this container); the "
            "applyInPandasWithState twin is the verified path here"
        )

    src = str(tmp_path / "src")
    events.withColumn("ts", F.col("ts").cast("timestamp")).repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        running_user_profile_tws(stream)
        .writeStream.format("memory")
        .queryName("user_profile_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 3

    sink = spark.table("user_profile_tws")
    final = (
        sink.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
            F.max("last_ts").alias("last_ts"),
        )
        .collect()
    )
    expected = {
        r["user_id"]: r
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max(F.col("ts").cast("timestamp")).alias("last_ts"),
        )
        .collect()
    }
    assert len(final) == len(expected) > 0
    for r in final:
        e = expected[r["user_id"]]
        assert r["n_events"] == e["n_events"]
        assert abs(r["total_value"] - e["total_value"]) < 1e-6
        assert r["last_ts"] == e["last_ts"]
