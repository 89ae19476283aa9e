"""Round-15 item 4: parquet codec / file-size sweep on the rewrite-heavy
maintenance entries (compaction_roundtrip, recluster_roundtrip,
recluster_incremental_roundtrip).

One warmed session; per codec: set spark.sql.parquet.compression.codec
(runtime-settable SQL conf; zstd level via the hadoop conf
parquet.compression.codec.zstd.level), run each entry min-of-3 through
the bench's noop-sink methodology, and record the managed-table bytes a
representative compaction writes (storage side of the trade).

Run on an IDLE box: python scripts/r15/codec_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from data_warehouse_copy_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dwcs-codec-sweep-r15")
    from pyspark.sql import functions as F

    from data_warehouse_copy_spark.queries import QUERIES
    from data_warehouse_copy_spark.sources.managed_table import ManagedTable

    entries = [
        "compaction_roundtrip",
        "recluster_roundtrip",
        "recluster_incremental_roundtrip",
    ]
    # warm: one pass of each at the default codec
    for name in entries:
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def bytes_written(codec_tag: str) -> int:
        """One representative compaction rewrite; returns output bytes."""
        root = f"/tmp/dwcs_codec_{codec_tag}_{uuid.uuid4().hex}"
        t = ManagedTable.create(spark, root, cluster_col="l_orderkey")
        for i in range(8):  # 8 small appends -> compaction input
            t.append(lineitem.filter(F.col("l_orderkey") % 8 == i))
        t.compact()
        total = sum(
            (Path(root) / f.path).stat().st_size
            for f in t.snapshot().files
        )
        return total

    codecs = [
        ("snappy", None),
        ("zstd", 1),
        ("zstd", 3),
        ("lz4", None),
    ]
    for codec, level in codecs:
        tag = codec if level is None else f"{codec}-{level}"
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        if codec == "zstd" and level is not None:
            spark.sparkContext._jsc.hadoopConfiguration().set(
                "parquet.compression.codec.zstd.level", str(level)
            )
        row = {"codec": tag}
        for name in entries:
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            row[name] = round(best, 3)
        row["compact_bytes"] = bytes_written(tag)
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
