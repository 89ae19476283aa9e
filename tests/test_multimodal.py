"""Multimodal column plumbing tests (schema, batch shape, determinism).

The decode step is a deterministic stub (no codecs in this container);
these tests verify the real Spark-side contract: schemas, mapInPandas
batch iteration, 1->N frame explode, and stable results across runs.
"""

import pytest
from pyspark.sql import functions as F

from data_warehouse_copy_spark.functions.multimodal import (
    FEATURE_SCHEMA,
    binarize_documents,
    extract_features,
    resize_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    return binarize_documents(docs).cache()


def test_binarize_schema_and_counts(media):
    assert set(media.columns) == {"media_id", "payload", "metadata"}
    rows = media.select(
        "media_id",
        F.col("metadata.n_bytes").alias("nb"),
        F.octet_length("payload").alias("ob"),
    ).collect()
    assert len(rows) == 60
    for r in rows:
        assert r.nb == r.ob > 0


def test_extract_features_deterministic(media):
    feats = extract_features(media, bins=8)
    assert feats.schema == FEATURE_SCHEMA
    a = {r.media_id: (r.mean_pixel, r.histogram) for r in feats.collect()}
    b = {r.media_id: (r.mean_pixel, r.histogram) for r in feats.collect()}
    assert a == b
    assert len(a) == 60
    for mean_px, hist in a.values():
        assert 0 <= mean_px <= 255
        assert len(hist) == 8


def test_resize_changes_dims_and_payload_size(media):
    out = resize_media(media, out_w=16, out_h=8)
    rows = out.select(
        "metadata.width", "metadata.height", F.octet_length("payload").alias("nb")
    ).collect()
    assert len(rows) == 60
    for r in rows:
        assert (r.width, r.height, r.nb) == (16, 8, 128)


def test_sample_frames_explodes_videos_only(media):
    n_videos = media.filter(F.col("metadata.mime").startswith("video")).count()
    frames = sample_frames(media, n_samples=4)
    got = frames.groupBy("media_id").count().collect()
    assert len(got) == n_videos
    for r in got:
        assert 1 <= r["count"] <= 4
    idx = frames.select("frame_idx").distinct().collect()
    assert all(r.frame_idx >= 0 for r in idx)
