"""cProfile one registry query end-to-end (build + noop materialize) on a
warmed session: splits driver-side Python time (manifest JSON, pyarrow,
py4j socket waits = JVM job time) per call site.

Usage: python scripts/profile_r14.py <query> [<query> ...]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_warehouse_copy_spark.queries import QUERIES  # noqa: E402
from data_warehouse_copy_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dwcs-profile-r14")
    materialize(QUERIES["windowed_range_scan"](spark, sf_dir))
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    materialize(spark.range(1000).select(_warm("id")))

    for name in names:
        # one unprofiled warm pass, then the profiled one
        t0 = time.perf_counter()
        materialize(QUERIES[name](spark, sf_dir))
        warm = time.perf_counter() - t0
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        materialize(QUERIES[name](spark, sf_dir))
        pr.disable()
        dur = time.perf_counter() - t0
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(45)
        print(f"==== {name}: warm={warm:.2f}s profiled={dur:.2f}s ====")
        print(s.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
