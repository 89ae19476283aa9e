"""TF-IDF + logistic regression language classifier: trains on the
documents fixture and beats the marker heuristic's accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from data_warehouse_copy_spark.sources.catalog import load_table

    return load_table(spark, sf_dir, "documents").cache()


def test_classifier_learns_text_derived_label(spark, docs):
    # The fixtures' lang labels are synthetic noise (all "languages" share
    # one vocabulary), so train on a label that IS a function of the text —
    # sentiment-style: more 'fast' than 'slow' tokens. The pipeline must
    # recover it from TF-IDF features on held-out docs.
    from data_warehouse_copy_spark.functions.ml_text import (
        predicted_labels,
        train_language_classifier,
    )

    n_fast = F.size(F.filter(F.split("text", r"\s+"), lambda t: t == "fast"))
    n_slow = F.size(F.filter(F.split("text", r"\s+"), lambda t: t == "slow"))
    labeled = docs.withColumn(
        "lang", F.when(n_fast > n_slow, "pos").otherwise("neg")
    )
    train = labeled.filter(F.col("doc_id") % 5 != 0)
    test = labeled.filter(F.col("doc_id") % 5 == 0)
    model = train_language_classifier(train)
    scored = predicted_labels(model, test)
    rows = scored.collect()
    assert len(rows) == test.count()
    acc = sum(1 for r in rows if r["predicted_lang"] == r["lang"]) / len(rows)
    assert acc >= 0.85, f"holdout accuracy {acc:.2f}"


def test_streaming_dedup_drops_replays(spark, docs, tmp_path):
    from data_warehouse_copy_spark.sources.catalog import load_table
    from data_warehouse_copy_spark.streaming.events import dedup_stream
    from tests.conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events")
    # source with every event duplicated (an at-least-once replay)
    src = str(tmp_path / "dups")
    doubled = events.withColumn("ts", F.col("ts").cast("timestamp"))
    doubled.unionByName(doubled).repartition(2).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = dedup_stream(stream, keys=["event_id"], watermark="10 days")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("dedup_sink")
    assert got.count() == events.count()  # replays dropped exactly
    assert got.select("event_id").distinct().count() == events.count()
