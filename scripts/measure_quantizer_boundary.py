"""Measure the unclamped k ∝ n quantizer PAST the round-9 clamp boundary.

Round-9 verdict weak mark: `kmeans_bucket_near_dup_pairs` clamped k at
sample_size//4 = 1024, so past n ≈ target_cluster · 1024 ≈ 260k expected
bucket size grew with the corpus again. Round 10 trains the quantizer
distributed (pyspark.ml KMeans) past that boundary; this script produces
the measured evidence the fix claims:

- a synthetic corpus with PLANTED ground-truth pairs (truth known by
  construction, so no quadratic exact sweep is needed at 500k rows):
  250k base vectors (dim 64, seeded normal) each paired with one planted
  near-duplicate at an exact target cosine drawn uniform in
  [0.82, 0.98]; measurement threshold 0.80, where the random background
  (cosine std 1/8 at dim 64 → 0.8 = 6.4σ) contributes ~nothing, so the
  planted set IS the truth set;
- two runs of the REGISTERED configuration (defaults: target_cluster=256,
  sample_size=4096, target_recall=0.995): n=100k (k=390 — below the old
  clamp, driver-sample Lloyd's arm) and n=500k (k=1953 — 1.9× past the
  old clamp of 1024, distributed pyspark.ml arm);
- per run: wall time, chosen (k, m), MEASURED avg/max bucket size, and
  recall over the planted pairs.

Done-bar (round-9 verdict item 1): avg bucket size ≈ target_cluster·m at
BOTH scales (constant per-bucket work → linear total), recall ≥ 0.99.

Usage: python scripts/measure_quantizer_boundary.py [--skip-gen]
Writes the fixture to .scaling/quantizer_500k/embeddings.parquet and
prints one JSON line per run plus a summary line.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
DST = ROOT / ".scaling" / "quantizer_500k"
N_BASE = 250_000
DIM = 64
THRESHOLD = 0.80
SEED = 20260815


def generate() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    DST.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)
    base = rng.normal(size=(N_BASE, DIM)).astype(np.float64)
    u = base / np.linalg.norm(base, axis=1, keepdims=True)
    # exact-cosine construction: dup_i = cos_t·u_i + sin_t·v_i with v_i a
    # random unit vector orthogonal to u_i → cosine(base_i, dup_i) = cos_t
    noise = rng.normal(size=(N_BASE, DIM))
    v = noise - (noise * u).sum(axis=1, keepdims=True) * u
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    cos_t = rng.uniform(0.82, 0.98, size=(N_BASE, 1))
    dup = cos_t * u + np.sqrt(1.0 - cos_t**2) * v
    mat = np.vstack([u, dup]).astype(np.float32)
    ids = np.arange(2 * N_BASE, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(mat), pa.list_(pa.float32())),
            }
        ),
        DST / "embeddings.parquet",
    )


def run(spark, n: int) -> dict:
    from pyspark.sql import functions as F

    from data_warehouse_copy_spark.functions.similarity import (
        kmeans_bucket_near_dup_pairs,
    )

    n_planted = n // 2
    df = (
        spark.read.parquet(str(DST / "embeddings.parquet"))
        .filter(
            (F.col("vec_id") < n_planted)
            | (
                (F.col("vec_id") >= N_BASE)
                & (F.col("vec_id") < N_BASE + n_planted)
            )
        )
        .repartition(32)
        .cache()
    )
    assert df.count() == n
    stats: dict = {}
    t0 = time.monotonic()
    pairs = {
        (r.id_a, r.id_b)
        for r in kmeans_bucket_near_dup_pairs(
            df, threshold=THRESHOLD, n_rows=n, stats=stats
        ).collect()
    }
    wall = time.monotonic() - t0
    planted = {(i, i + N_BASE) for i in range(n_planted)}
    extra = pairs - planted  # background pairs above the bar (should be ~0)
    out = {
        "n": n,
        "wall_sec": round(wall, 2),
        "recall_planted": round(len(pairs & planted) / len(planted), 5),
        "background_pairs": len(extra),
        **stats,
        "bucket_vs_target": round(stats["avg_bucket"] / (256 * stats["m"]), 3),
    }
    df.unpersist()
    return out


def main() -> None:
    if "--skip-gen" not in sys.argv and not (DST / "embeddings.parquet").exists():
        t0 = time.monotonic()
        generate()
        print(f"generated fixture in {time.monotonic() - t0:.1f}s", flush=True)
    from data_warehouse_copy_spark.session import get_spark

    spark = get_spark(shuffle_partitions=32)
    results = [run(spark, 100_000)]
    print(json.dumps(results[-1]), flush=True)
    results.append(run(spark, 500_000))
    print(json.dumps(results[-1]), flush=True)
    a, b = results
    print(
        json.dumps(
            {
                "summary": "bucket-size constancy across the old clamp",
                "avg_bucket_100k_driver_arm": a["avg_bucket"],
                "avg_bucket_500k_distributed_arm": b["avg_bucket"],
                "old_clamp_expected_bucket_500k": round(
                    b["n"] * b["m"] / 1024, 1
                ),
                "recall_ok": a["recall_planted"] >= 0.99
                and b["recall_planted"] >= 0.99,
            }
        )
    )


if __name__ == "__main__":
    main()
