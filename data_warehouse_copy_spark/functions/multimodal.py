"""Multimodal (image/audio/video) column handling (extension surface).

Convention: media travel as opaque ``binary`` payload columns plus a typed
metadata struct (``mime``, ``width``, ``height``, ``n_frames``, ``n_bytes``)
— the path-reference/bytes pattern of ``spark.read.format("binaryFile")``.
Heavy per-item work (decode, feature extraction, resize, frame sampling)
runs as Arrow-batched ``mapInPandas`` operators: the Spark-side plumbing
(schemas, batch iteration, partition parallelism) is real and tested.

STUB NOTE: this container has no image/audio codecs (no PIL/cv2/ffmpeg), so
the innermost decode is a clearly-marked deterministic fake
(:func:`_decode_stub`) — it derives pixel statistics from the payload bytes
so results are stable and assertable. Swap ``_decode_stub`` for a real
decoder in production; every signature and schema stays the same.

At 100 TB: payloads should be stored in their own column (parquet columnar
pruning keeps metadata-only queries from reading bytes); ``mapInPandas``
processes Arrow record batches so decode parallelism = partition count ×
executor cores, and ``spark.sql.files.maxPartitionBytes`` bounds per-task
memory (payload column dominates row size — size partitions accordingly).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def binarize_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a synthetic multimodal table from the documents fixture: the
    text bytes become the opaque payload, metadata is derived
    deterministically. (Stands in for a real ingest of image/video files.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    n_bytes = F.octet_length(payload)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image/png")
            .when(F.col("doc_id") % 3 == 1, "video/mp4")
            .otherwise("audio/wav")
            .alias("mime"),
            ((F.col("doc_id") % 16 + 1) * 64).cast("int").alias("width"),
            ((F.col("doc_id") % 9 + 1) * 64).cast("int").alias("height"),
            (F.col("doc_id") % 120 + 1).cast("int").alias("n_frames"),
            n_bytes.cast("long").alias("n_bytes"),
        ).alias("metadata"),
    )


def _decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC FAKE DECODER (no codecs in this container).

    Produces a (height, width) uint8 'image' whose content is a stable
    function of the payload bytes (sha256-seeded tiling), so downstream
    feature extraction is reproducible. A real deployment replaces this
    with PIL/cv2 decode; nothing else changes.
    """
    digest = hashlib.sha256(payload).digest()
    seed = np.frombuffer(digest, dtype=np.uint8)
    reps = (width * height) // len(seed) + 1
    return np.tile(seed, reps)[: width * height].reshape(height, width)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("std_pixel", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.LongType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_features(media: DataFrame, bins: int = 8) -> DataFrame:
    """Per-item image features via Arrow-batched ``mapInPandas``.

    Batch shape contract: each pandas batch carries the payload bytes and
    metadata; output is one feature row per media item.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # zip over columns, not iterrows: per-row Series construction would
        # dominate the batch loop
        for pdf in batches:
            rows = []
            for media_id, payload, metadata in zip(
                pdf["media_id"], pdf["payload"], pdf["metadata"]
            ):
                img = _decode_stub(
                    bytes(payload), metadata["width"], metadata["height"]
                )
                hist, _ = np.histogram(img, bins=bins, range=(0, 256))
                rows.append(
                    {
                        "media_id": media_id,
                        "mean_pixel": float(img.mean()),
                        "std_pixel": float(img.std()),
                        "histogram": hist.astype("int64").tolist(),
                        "n_bytes": len(bytes(payload)),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, FEATURE_SCHEMA)


def resize_media(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """'Resize' every image to (out_w, out_h) — decode stub + nearest-
    neighbor subsampling (pure numpy, deterministic), re-emitting the payload
    column and updated metadata. Schema/partition plumbing identical to a
    real resize."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("metadata", METADATA_TYPE),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["metadata"]
            ):
                img = _decode_stub(bytes(payload), meta["width"], meta["height"])
                ys = np.linspace(0, img.shape[0] - 1, out_h).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, out_w).astype(int)
                resized = img[np.ix_(ys, xs)]
                rows.append(
                    {
                        "media_id": media_id,
                        "payload": resized.tobytes(),
                        "metadata": {
                            "mime": meta["mime"],
                            "width": out_w,
                            "height": out_h,
                            "n_frames": meta["n_frames"],
                            "n_bytes": out_w * out_h,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, out_schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, n_samples: int = 4) -> DataFrame:
    """Uniform frame sampling from 'video' payloads: emits up to
    ``n_samples`` frame rows per item (a 1->N mapInPandas, the row-exploding
    batch shape a real ffmpeg sampler would use)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["metadata"]
            ):
                total = int(meta["n_frames"])
                take = min(n_samples, total)
                idxs = np.linspace(0, total - 1, take).astype(int)
                for i in idxs:
                    # stub frame = per-index slice of the decoded payload
                    img = _decode_stub(
                        bytes(payload) + int(i).to_bytes(4, "little"),
                        meta["width"],
                        meta["height"],
                    )
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": int(i),
                            "frame_payload": img[:8].tobytes(),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.filter(F.col("metadata.mime").startswith("video")).mapInPandas(
        op, FRAME_SCHEMA
    )
