"""Python-callsite attribution of Spark actions for one registry query.

Wraps DataFrame.collect/count/toPandas and DataFrameWriter.save/parquet plus
SparkSession.createDataFrame, records (engine call site, wall seconds) for
each, and prints them in execution order — mapping every fixed per-action
round-trip to the engine line that issued it (guide §1: measure first).

Usage: python scripts/trace_actions_r14.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Spark 4: the concrete (classic) classes override the pyspark.sql bases,
# so wrap the classic ones — the engine runs on them in local mode.
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

from data_warehouse_copy_spark.queries import QUERIES  # noqa: E402
from data_warehouse_copy_spark.session import get_spark  # noqa: E402

EVENTS: list[tuple[str, str, float]] = []
REPO = str(Path(__file__).resolve().parent.parent)


def _site() -> str:
    for f in reversed(traceback.extract_stack()):
        fn = f.filename
        if fn.startswith(REPO) and "trace_actions" not in fn:
            return f"{fn.replace(REPO + '/', '')}:{f.lineno} {f.name}"
    return "?"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def wrapper(self, *a, **k):
        t0 = time.perf_counter()
        out = orig(self, *a, **k)
        EVENTS.append((name, _site(), time.perf_counter() - t0))
        return out

    setattr(cls, name, wrapper)


for n in ("collect", "count", "toPandas", "persist"):
    _wrap(DataFrame, n)
for n in ("save", "parquet", "csv", "json"):
    _wrap(DataFrameWriter, n)
_wrap(SparkSession, "createDataFrame")


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dwcs-actiontrace-r14")
    materialize(QUERIES["windowed_range_scan"](spark, sf_dir))
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    materialize(spark.range(1000).select(_warm("id")))

    for name in names:
        t0 = time.perf_counter()
        materialize(QUERIES[name](spark, sf_dir))
        warm = time.perf_counter() - t0
        EVENTS.clear()
        t0 = time.perf_counter()
        materialize(QUERIES[name](spark, sf_dir))
        dur = time.perf_counter() - t0
        print(f"\n=== {name}: warm={warm:.2f}s traced={dur:.2f}s "
              f"n_actions={len(EVENTS)} ===")
        tot = 0.0
        for kind, site, sec in EVENTS:
            tot += sec
            print(f"  {sec:7.3f}s  {kind:<16} {site}")
        print(f"  sum(action seconds)={tot:.2f}s  other={dur - tot:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
