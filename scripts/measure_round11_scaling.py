"""Round-11 scaling measurement (round-10 verdict item 8): sf10 points
for the round-10 maintenance surfaces.

1. Executor-side auto-compact merge (the lifted driver byte ceiling is
   the claim): orders land as 32 deliberately-small files, the policy
   triggers one maybe_auto_compact() pass, and we record wall, merged
   input MB/s, and the live-file count bound after the pass — at sf0.1
   (150k rows) vs .scaling/sf1.0 (1.5M rows, 10x).
2. ANALYZE ... FOR ALL COLUMNS on the WIDEST fixture table (lineitem,
   16 columns): one distributed aggregate pass computing count/nulls/
   min/max/NDV (+max_len for strings) per column, at 600k vs 6M rows.

Run: python scripts/measure_round11_scaling.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import types as T  # noqa: E402

from data_warehouse_copy_spark.session import get_spark  # noqa: E402
from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)


def measure(sf_dir: str, tag: str, tmp_root: str) -> dict:
    spark = get_spark(app_name=f"r11-scaling-{tag}")
    out: dict = {"tag": tag}
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        out["orders_rows"] = orders.count()

        # --- 1. executor-side auto-compact merge --------------------
        def compact_once(i: int) -> dict:
            root = f"{tmp_root}/{tag}_ac_{i}"
            t = ManagedTable.create(spark, root)
            t.append(orders.repartition(32))  # 32 small files, one commit
            t.set_auto_compact(
                max_files_per_partition=4, max_merge_files=128
            )
            files0 = list(t.snapshot().files)
            bytes0 = sum(t._file_size(f.path) or 0 for f in files0)
            t0 = time.perf_counter()
            merged = t.maybe_auto_compact()
            wall = time.perf_counter() - t0
            files1 = list(t.snapshot().files)
            rows1 = t.read().count()
            return {
                "files_before": len(files0),
                "files_after": len(files1),
                "merged_away": merged,
                "input_mb": round(bytes0 / 1e6, 1),
                "wall_s": round(wall, 3),
                "mb_per_s": round(bytes0 / 1e6 / wall, 1),
                "rows_intact": rows1 == out["orders_rows"],
            }

        runs = [compact_once(i) for i in range(2)]
        out["auto_compact"] = min(runs, key=lambda r: r["wall_s"])

        # --- 2. ANALYZE FOR ALL COLUMNS on lineitem (16 cols) --------
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        out["lineitem_rows"] = li.count()
        root = f"{tmp_root}/{tag}_li"
        t = ManagedTable.create(spark, root)
        t.append(li)
        cols = [
            f.name
            for f in T.StructType.fromJson(
                json.loads(t.snapshot().schema_json)
            ).fields
        ]
        out["lineitem_cols"] = len(cols)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            stats = t.analyze(cols)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out["analyze_all_s"] = round(best, 3)
        out["analyze_row_count_ok"] = (
            stats["row_count"] == out["lineitem_rows"]
        )
    finally:
        spark.stop()
    return out


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="r11scale_")
    for sf_dir, tag in (
        ("/root/testdata/sf0.1", "sf0.1"),
        (str(Path(__file__).resolve().parents[1] / ".scaling/sf1.0"),
         "sf1.0"),
    ):
        print(json.dumps(measure(sf_dir, tag, tmp)))


if __name__ == "__main__":
    main()
