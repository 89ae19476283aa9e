"""Round-12 scaling point: GENERATED ALWAYS AS IDENTITY allocation at
10x. The allocator is ONE mapInPandas pass (strided per-partition ids,
no shuffle, no extra jobs) plus a constant number of watermark-chain
objects per append — so the wall should grow sub-linearly with rows
(fixed session/commit costs amortize) and the chain traffic must stay
O(1) per append regardless of row count.

Run: python scripts/measure_round12_identity_scaling.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.session import get_spark  # noqa: E402
from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)


def measure(spark, tmp_root: str, n_rows: int, tag: str) -> dict:
    root = f"{tmp_root}/{tag}"
    t = ManagedTable.create(spark, root)
    t.append(spark.createDataFrame([], "id bigint, payload string"))
    t.set_identity("id")
    src = spark.range(n_rows).selectExpr(
        "repeat('x', 64) AS payload"
    )
    best = None
    for _ in range(2):
        t2 = ManagedTable.create(spark, f"{root}_{_}")
        t2.append(spark.createDataFrame([], "id bigint, payload string"))
        t2.set_identity("id")
        t0 = time.time()
        rows = t2.append(src)
        wall = time.time() - t0
        assert rows == n_rows
        best = wall if best is None else min(best, wall)
        chain = list(
            (Path(f"{root}_{_}") / "_log" / "_idseq_id").glob("0*.json")
        )
        n_chain = len(chain)
        # collision-free by construction; verify distinctness anyway
        n_ids = t2.read().selectExpr("count(distinct id) AS n").first().n
        assert n_ids == n_rows, (n_ids, n_rows)
    return {
        "rows": n_rows,
        "wall_s": round(best, 2),
        "chain_objects_per_append": n_chain,
        "rows_per_sec": int(n_rows / best),
    }


def main() -> None:
    spark = get_spark(app_name="r12-identity-scaling")
    tmp = tempfile.mkdtemp(prefix="dwcs_idscale_")
    small = measure(spark, tmp, 600_000, "sf01")
    big = measure(spark, tmp, 6_000_000, "sf10x")
    out = {
        "small": small,
        "big": big,
        "wall_ratio_for_10x_rows": round(big["wall_s"] / small["wall_s"], 2),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
