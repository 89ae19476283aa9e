"""cProfile one registry entry's driver-side Python (round-15 §1).

Usage: python scripts/r15/profile_entry.py <query> [topN]
Runs the entry once warm, then profiles a second run and prints the top
cumulative-time functions — separates driver-side Python cost (visible
here) from JVM planning/job gaps (not visible).
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from data_warehouse_copy_spark.queries import QUERIES  # noqa: E402
from data_warehouse_copy_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    name = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dwcs-profile-r15")
    materialize(QUERIES["windowed_range_scan"](spark, sf_dir))
    t0 = time.perf_counter()
    materialize(QUERIES[name](spark, sf_dir))
    print(f"warm pass: {time.perf_counter() - t0:.2f}s", flush=True)
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    materialize(QUERIES[name](spark, sf_dir))
    pr.disable()
    print(f"profiled pass: {time.perf_counter() - t0:.2f}s", flush=True)
    buf = io.StringIO()
    st = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
    st.print_stats(top)
    out = buf.getvalue()
    # drop the boilerplate header lines
    print("\n".join(out.splitlines()[:top + 8]))
    spark.stop()


if __name__ == "__main__":
    main()
