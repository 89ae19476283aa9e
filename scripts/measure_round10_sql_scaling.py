"""Round-10 scaling measurement: the new SQL surfaces at 10x.

Measures (fresh local[32] session, min-of-2 per point, sf0.1 orders =
150k rows vs .scaling/sf1.0 orders = 1.5M rows):

1. general-predicate DELETE, whole-clause residual (top-level OR + LIKE:
   no sargable conjunct, so every file is a candidate — the WORST case:
   full scan + F.expr filter + DV write, expected ~linear);
2. general-predicate UPDATE, mixed (one sargable equality conjunct that
   prunes candidates + BETWEEN/length() residuals — expected sublinear
   vs the table because pruning scopes the scan);
3. table_changes CDF read over the two DML commits (O(commits touched
   + changed bytes), never O(table history));
4. ANALYZE ... FOR COLUMNS (one distributed aggregate pass, ~linear).

Run: python scripts/measure_round10_sql_scaling.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.session import get_spark  # noqa: E402
from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)
from data_warehouse_copy_spark.sources.names import NamedCatalog  # noqa: E402


def measure(sf_dir: str, tag: str, tmp_root: str) -> dict:
    spark = get_spark(app_name=f"r10-sql-scaling-{tag}")
    out = {}
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        n = orders.count()
        out["rows"] = n

        def best_of(k, fn, passes=2):
            best = None
            for _ in range(passes):
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[k] = round(best, 3)

        # fresh table per pass so the DML has identical work each time
        cnt = [0]

        def fresh():
            cnt[0] += 1
            root = f"{tmp_root}/{tag}_{cnt[0]}"
            t = ManagedTable.create(spark, root, cluster_col="o_orderkey")
            t.append(orders)
            cat = NamedCatalog(f"{root}.cat.json")
            cat.register("global_temp.sct", root)
            return t, cat

        t1, c1 = fresh()
        best_of(
            "delete_residual_or_like",
            lambda: c1.sql(
                spark,
                "DELETE FROM global_temp.sct WHERE o_orderpriority "
                "LIKE '3%' OR o_totalprice < 1000.0",
            ).collect(),
            passes=1,  # destructive; measure twice on two fresh tables
        )
        t1b, c1b = fresh()
        t0 = time.perf_counter()
        c1b.sql(
            spark,
            "DELETE FROM global_temp.sct WHERE o_orderpriority "
            "LIKE '3%' OR o_totalprice < 1000.0",
        ).collect()
        out["delete_residual_or_like"] = round(
            min(out["delete_residual_or_like"], time.perf_counter() - t0), 3
        )

        t2, c2 = fresh()
        t0 = time.perf_counter()
        c2.sql(
            spark,
            "UPDATE global_temp.sct SET o_totalprice = o_totalprice + 1.0 "
            "WHERE o_totalprice BETWEEN 50000.0 AND 150000.0 "
            "AND o_orderstatus = 'O' AND length(o_orderpriority) >= 8",
        ).collect()
        out["update_mixed_pruned"] = round(time.perf_counter() - t0, 3)

        # CDF over the delete+update commits of table t2 (v1 append,
        # v2 update): use t1b (v1 append, v2 delete) + t2's update
        best_of(
            "table_changes_feed",
            lambda: c2.sql(
                spark,
                "SELECT COUNT(*) AS n, COUNT(DISTINCT _change_type) AS k "
                "FROM table_changes('global_temp.sct', 2)",
            ).collect(),
        )
        best_of(
            "analyze_two_columns",
            lambda: c2.sql(
                spark,
                "ANALYZE TABLE global_temp.sct COMPUTE STATISTICS "
                "FOR COLUMNS o_custkey, o_orderstatus",
            ).collect(),
        )
    finally:
        spark.stop()
    return out


def main() -> None:
    import json
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="r10sqlsc_")
    try:
        small = measure("/root/testdata/sf0.1", "sf01", tmp)
        repo = Path(__file__).resolve().parents[1]
        big = measure(str(repo / ".scaling" / "sf1.0"), "sf10x", tmp)
        print(json.dumps({"sf0.1": small, "sf1.0": big}, indent=1))
        for k in small:
            if k == "rows":
                continue
            print(f"{k}: {small[k]}s -> {big[k]}s  ratio {big[k]/small[k]:.2f}x for 10x rows")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
