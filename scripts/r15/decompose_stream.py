"""Round-15 item 2: decompose the curation stream's per-batch addBatch.

Four ladder rungs, same bronze fixture, 2 triggers each (cold + steady);
report batch-1 (steady) durationMs per rung:
  1. source-only        readStream(managed_table) -> noop
  2. + transforms       scrub/fp/scores/filter    -> noop
  3. + dropDuplicates   full curated DAG          -> noop
  4. + managed sink     full entry DAG            -> managed_table sink
"""

from __future__ import annotations

import json
import os
import sys
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from data_warehouse_copy_spark.session import get_spark  # noqa: E402


def run_stream(spark, build_writer, bronze_append, docs):
    q = build_writer()
    out = []
    try:
        q.processAllAvailable()
        bronze_append(docs)
        q.processAllAvailable()
        for p in q.recentProgress:
            out.append({"batchId": p["batchId"], "durationMs": p["durationMs"]})
    finally:
        q.stop()
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from data_warehouse_copy_spark.functions.text import (
        repetition_score_columns,
        scrub_pii,
    )
    from data_warehouse_copy_spark.sources.datasource import register
    from data_warehouse_copy_spark.sources.managed_table import ManagedTable
    from data_warehouse_copy_spark.streaming.curation import CURATED_COLUMNS

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dwcs-decomp-r15")
    register(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scores = repetition_score_columns("text")

    def fixture():
        tmp = f"/tmp/dwcs_dec_{uuid.uuid4().hex}"
        bronze = ManagedTable.create(spark, f"{tmp}/bronze")
        bronze.append(docs.filter(F.col("doc_id") % 2 == 0))
        return tmp, bronze

    def curated_from(src, with_dedup=True, with_transforms=True):
        df = src
        if with_transforms:
            df = (
                df.withColumn("text", scrub_pii(F.col("text")))
                .withColumn("fp", F.md5(F.col("text")))
                .withColumns({n: c for n, c in scores.items()})
                .filter((F.col("dup_line_frac") <= 0.3) & (F.col("n_tokens") >= 5))
            )
            if with_dedup:
                df = df.dropDuplicates(["fp"])
            df = df.filter(F.col("top_bigram_frac") <= 0.11).select(
                *CURATED_COLUMNS, "n_tokens", "dup_line_frac", "top_bigram_frac"
            )
        return df

    spark.conf.set("spark.sql.shuffle.partitions", "1")

    # rung 1: source only -> noop
    tmp, bronze = fixture()
    src = spark.readStream.format("managed_table").load(f"{tmp}/bronze")
    r1 = run_stream(
        spark,
        lambda: src.writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .start(),
        lambda d: bronze.append(d.filter(F.col("doc_id") % 2 == 1)),
        docs,
    )
    print(json.dumps({"rung": "1_source_noop", "batches": r1}), flush=True)

    # rung 2: + transforms, no dedup -> noop
    tmp, bronze = fixture()
    src = spark.readStream.format("managed_table").load(f"{tmp}/bronze")
    df = curated_from(src, with_dedup=False)
    r2 = run_stream(
        spark,
        lambda: df.writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .start(),
        lambda d: bronze.append(d.filter(F.col("doc_id") % 2 == 1)),
        docs,
    )
    print(json.dumps({"rung": "2_transforms_noop", "batches": r2}), flush=True)

    # rung 3: + dropDuplicates -> noop
    tmp, bronze = fixture()
    src = spark.readStream.format("managed_table").load(f"{tmp}/bronze")
    df = curated_from(src, with_dedup=True)
    r3 = run_stream(
        spark,
        lambda: df.writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .start(),
        lambda d: bronze.append(d.filter(F.col("doc_id") % 2 == 1)),
        docs,
    )
    print(json.dumps({"rung": "3_dedup_noop", "batches": r3}), flush=True)

    # rung 4: full entry DAG -> managed sink
    tmp, bronze = fixture()
    src = spark.readStream.format("managed_table").load(f"{tmp}/bronze")
    df = curated_from(src, with_dedup=True)
    r4 = run_stream(
        spark,
        lambda: df.writeStream.format("managed_table")
        .option("txnAppId", "decomp")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .start(f"{tmp}/silver"),
        lambda d: bronze.append(d.filter(F.col("doc_id") % 2 == 1)),
        docs,
    )
    print(json.dumps({"rung": "4_full_managed", "batches": r4}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
