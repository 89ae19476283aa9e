"""Round-11 scaling point: CDF replica maintenance at 10×.

The claim to verify: replica cost per drain is O(changed rows per
trigger), never O(table). Upstream = the March lineitem window (scales
with sf), DML = one DV delete + one merge-on-read update + one append;
we measure (a) the BOOTSTRAP drain (snapshot-as-inserts — linear in the
table by nature) and (b) the INCREMENTAL drain of the three DML commits
(the steady-state cost — should scale with CHANGED rows, far below the
table's growth only if the changes themselves grow slower; here the
changes scale with the table too, so ~linear-in-changes is the pass
bar, NOT super-linear).

Run: python scripts/measure_round11_replica_scaling.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_copy_spark.session import get_spark  # noqa: E402
from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)
from data_warehouse_copy_spark.streaming.cdf_sync import (  # noqa: E402
    stream_replicate,
)

KEYS = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]


def measure(sf_dir: str, tag: str, tmp_root: str) -> dict:
    spark = get_spark(app_name=f"r11-replica-{tag}")
    out: dict = {"tag": tag}
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        window = li.filter(
            (F.col("l_shipdate") >= F.lit("1995-03-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1995-03-31").cast("timestamp"))
        )
        src = ManagedTable.create(spark, f"{tmp_root}/{tag}_src")
        out["window_rows"] = src.append(window)
        q = stream_replicate(
            spark,
            f"{tmp_root}/{tag}_src",
            f"{tmp_root}/{tag}_rep",
            f"{tmp_root}/{tag}_ckpt",
            key_cols=KEYS,
        )
        try:
            t0 = time.perf_counter()
            q.processAllAvailable()  # bootstrap: the whole snapshot
            out["bootstrap_s"] = round(time.perf_counter() - t0, 3)
            n_del = src.delete(where=[("l_quantity", "<", 5.0)])
            n_upd = src.update(
                where=[("l_quantity", "<", 10.0)],
                set_exprs={"l_extendedprice": F.lit(0.0)},
            )
            n_app = src.append(
                li.filter(
                    F.col("l_shipdate").between(
                        F.lit("1995-04-01").cast("timestamp"),
                        F.lit("1995-04-07").cast("timestamp"),
                    )
                )
            )
            out["changed_rows"] = n_del + 2 * n_upd + n_app
            t0 = time.perf_counter()
            q.processAllAvailable()  # the steady-state incremental drain
            out["incremental_s"] = round(time.perf_counter() - t0, 3)
        finally:
            q.stop()
        rep = ManagedTable(spark, f"{tmp_root}/{tag}_rep")
        out["replica_matches"] = (
            rep.read().count() == src.read().count()
        )
    finally:
        spark.stop()
    return out


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="r11rep_")
    for sf_dir, tag in (
        ("/root/testdata/sf0.1", "sf0.1"),
        (str(Path(__file__).resolve().parents[1] / ".scaling/sf1.0"),
         "sf1.0"),
    ):
        print(json.dumps(measure(sf_dir, tag, tmp)))


if __name__ == "__main__":
    main()
