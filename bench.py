"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit": "sec", "queries": {...}, "sf"}.

Each query is fully materialized through the noop sink (same execution work
as a real write, zero sink cost). A warmup query first absorbs session/JIT
startup so per-query numbers reflect steady-state plan execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_warehouse_copy_spark.queries import QUERIES  # noqa: E402
from data_warehouse_copy_spark.session import get_spark  # noqa: E402

# Headline set: every operator family, weighted toward the scans/joins/aggs
# that dominate at 100 TB.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    "q4_order_priority",
    "q8_market_share",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q21_sole_blame_supplier",
    "q22_global_sales_opportunity",
    "top_customers_per_nation",
    "orders_rollup",
    "windowed_range_scan",
    "changed_keys_antijoin",
    "orders_without_lineitems",
    "range_copy_roundtrip",
    "pipeline_e2e_audit",
    "upsert_roundtrip",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk_bruteforce",
    "similarity_cosine_near_dup",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "text_stats",
    "text_language_id",
    "text_fingerprints",
    "training_data_prep",
    "events_hourly",
    "events_hourly_hybrid",
    "events_sliding",
    "events_sessionize",
    "events_asof_last_purchase",
    "events_purchase_attribution",
    "events_json_extract",
    "embedding_component_stats",
    "set_ops_customers",
    "events_pivot_by_type",
    "orders_cube",
    "orders_grouping_sets",
    "lineitem_percentiles",
    "scalar_functions_demo",
    "customers_with_urgent_orders",
    "approx_analytics",
    "multimodal_features",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="dwcs-bench")

    # warmup: absorb JVM/codegen startup on a small scan
    materialize(QUERIES["windowed_range_scan"](spark, sf_dir))

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        materialize(QUERIES[name](spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
