"""Round-13 full-registry sf1.0 scale sweep (round-12 verdict item 6).

Per-feature harnesses measure their own 10x points; this sweep runs the
TPC-H entries + the heaviest lakehouse/dedup/streaming entries through
the REGISTRY surface (exactly what bench.py times) at sf0.1 and at the
replicated .scaling/sf1.0 (10x rows, constant near-dup/cosine density —
see make_scaling_data.py), one fresh session per scale, warmed up, one
pass per entry. The point is the RATIO: a fixture-dominated entry sits
well under 10x, a scan-bound one near 10x, and anything far above 10x
is a cliff the per-feature harnesses missed (driver-side collects,
probe caps, fixpoint costs).

Run (idle box): python scripts/measure_round13_sf1_sweep.py
Writes .scaling/round13_sf1_sweep.json; the committed table lives in
SCALING.md §round-13.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from data_warehouse_copy_spark.queries import QUERIES  # noqa: E402
from data_warehouse_copy_spark.session import get_spark  # noqa: E402

TPCH = [n for n in QUERIES if n[0] == "q" and n[1].isdigit()]
HEAVY = [
    "stream_curation_roundtrip",
    "stream_cdf_replica_sync",
    "dedup_semantic_incremental_ivf",
    "dedup_semantic_clusters_lsh",
    "dedup_semantic_clusters",
    "rollup_cdc_refresh",
    "stream_cdf_roundtrip",
    "catalog_sql_merge",
    "similarity_topk_ivf_pq",
    "dedup_minhash_lsh",
    "catalog_sql_dynamic_prune",
    "catalog_sql_view",
    "catalog_sql_matview",
]
ENTRIES = TPCH + HEAVY


def sweep(sf_dir: str, tag: str) -> dict:
    spark = get_spark(app_name=f"r13-sf1-sweep-{tag}")
    out: dict = {}
    try:
        QUERIES["windowed_range_scan"](spark, sf_dir).collect()  # warmup
        QUERIES["text_stats"](spark, sf_dir).collect()
        for name in ENTRIES:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            out[name] = round(time.perf_counter() - t0, 3)
            print(f"{tag} {name}: {out[name]}s", flush=True)
    finally:
        spark.stop()
    return out


def main() -> None:
    sf01 = sweep("/root/testdata/sf0.1", "sf0.1")
    sf1 = sweep(str(REPO / ".scaling" / "sf1.0"), "sf1.0")
    rows = {
        n: {
            "sf01_sec": sf01[n],
            "sf1_sec": sf1[n],
            "ratio": round(sf1[n] / max(sf01[n], 1e-9), 2),
        }
        for n in ENTRIES
    }
    res = {
        "round": 13,
        "entries": rows,
        "total_sf01": round(sum(sf01.values()), 1),
        "total_sf1": round(sum(sf1.values()), 1),
    }
    out = REPO / ".scaling" / "round13_sf1_sweep.json"
    out.write_text(json.dumps(res, indent=1, sort_keys=True))
    print(json.dumps({k: v for k, v in res.items() if k != "entries"}))
    worst = sorted(rows.items(), key=lambda kv: -kv[1]["ratio"])[:5]
    for n, r in worst:
        print("worst:", n, r)


if __name__ == "__main__":
    main()
