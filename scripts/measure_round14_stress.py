"""Round-14 stress points (r13 verdict item 5): 100x-shaped evidence
for the round-12/13/14 surfaces that only had 10x (or no) measurements.

1. DFP probe at dim cardinalities around _DFP_MAX_KEYS (20k): the probe
   cost just under the cap, and the fallback cost when a dim overflows
   it (the probe must stop at cap+1 rows — never collect the full dim);
   partial pruning when ONE of two dims overflows.
2. Window-MV REFRESH with O(100) touched days: contiguous runs collapse
   into ONE range overwrite; scattered days pay one overwrite per run —
   both must stay proportional to touched data, never history.
3. BY DEFAULT identity mixed-writer storm at 10x row counts: concurrent
   cross-process appends mixing provided ids (> 2^53) with NULL slots —
   collision-free, bit-exact passthrough, CAS-retry bounded.
4. Dims-MV refresh at large touched-key counts (new round-14 surface):
   key-scoped replace_where under the 10k/column cap vs the full-rebuild
   fallback just past it; hybrid read with thousands of pending keys.

Run: python scripts/measure_round14_stress.py   (idle box; ~5-10 min)
Appends results to SCALING.md by hand — see the round-14 section.
"""

from __future__ import annotations

import datetime
import json
import subprocess
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
from data_warehouse_copy_spark.sources.names import NamedCatalog  # noqa: E402
from data_warehouse_copy_spark.sources.sql_dml import (  # noqa: E402
    try_dynamic_prune,
)


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 2), out


def stress_dfp_probe(spark, root: Path) -> list[dict]:
    """Probe cost at ~cap, and the overflow fallback cost."""
    fact = ManagedTable.create(spark, root / "fact", cluster_col="k")
    fact.append(
        spark.range(2_000_000).selectExpr("id AS k", "id % 97 AS v")
        .repartition(16)
    )
    out = []
    cases = [("under_cap", 19_000), ("at_cap", 20_000), ("over_cap", 25_000)]
    cat = NamedCatalog(root / "cat.json")
    cat.register("global_temp.sfact", str(root / "fact"))
    for tag, card in cases:
        dname = f"global_temp.sdim_{tag}"
        d = ManagedTable.create(spark, root / f"dim_{tag}")
        # over_cap: the filter keeps EVERY key, so the probe really
        # overflows _DFP_MAX_KEYS and must stop at cap+1 rows
        tiers = 1 if tag == "over_cap" else 5
        d.append(
            spark.range(card).selectExpr(
                "id * 7 AS dk", f"CAST(id % {tiers} AS STRING) AS tier"
            )
        )
        cat.register(dname, str(root / f"dim_{tag}"))
        cat.attach(spark)
        q = (
            f"SELECT f.k, f.v FROM global_temp.sfact f "
            f"JOIN {dname} d ON f.k = d.dk WHERE d.tier = '0'"
        )
        info: dict = {}
        wall, df = timed(lambda: try_dynamic_prune(spark, cat, q, info))
        n = df.count() if df is not None else None
        expect = spark.sql(q).count()
        assert n is None or n == expect, (tag, n, expect)
        out.append(
            {
                "case": f"dfp_{tag}",
                "dim_rows": card,
                "probe_fired": df is not None,
                "n_keys": info.get("n_keys"),
                "rewrite_wall_s": wall,
                "rows": expect,
            }
        )
    # two dims, one overflowing: partial prune must still fire on the
    # small dim and simply skip the huge one
    q2 = (
        "SELECT f.k FROM global_temp.sfact f "
        "JOIN global_temp.sdim_under_cap a ON f.k = a.dk "
        "JOIN global_temp.sdim_over_cap b ON f.k = b.dk "
        "WHERE a.tier = '0' AND b.tier = '0'"
    )
    info2: dict = {}
    wall2, df2 = timed(lambda: try_dynamic_prune(spark, cat, q2, info2))
    expect2 = spark.sql(q2).count()
    assert df2 is None or df2.count() == expect2
    out.append(
        {
            "case": "dfp_partial_one_dim_overflows",
            "probe_fired": df2 is not None,
            "dims_probed": sorted((info2.get("dims") or {})),
            "rewrite_wall_s": wall2,
            "rows": expect2,
        }
    )
    return out


def stress_matview_days(spark, root: Path) -> list[dict]:
    """REFRESH with ~120 touched days, contiguous vs scattered."""
    rows = []
    base_day = datetime.datetime(2023, 1, 1)
    n_days = 120
    for d in range(n_days):
        for i in range(200):
            rows.append(
                (base_day + datetime.timedelta(days=d, minutes=7 * i),
                 "a" if i % 2 else "b", float(i))
            )
    raw = ManagedTable.create(spark, root / "mraw")
    raw.append(
        spark.createDataFrame(
            rows, "ts timestamp_ntz, event_type string, value double"
        ).repartition(8)
    )
    cat = NamedCatalog(root / "mcat.json")
    cat.register("global_temp.smraw", str(root / "mraw"))
    cat.attach(spark)
    wall_create, _ = timed(lambda: cat.sql(
        spark,
        f"CREATE MATERIALIZED VIEW global_temp.smv LOCATION "
        f"'{root}/smv' AS SELECT window.start AS window_start, "
        f"event_type, COUNT(*) AS n, SUM(value) AS tv "
        f"FROM global_temp.smraw GROUP BY window(ts, '1 hour'), "
        f"event_type",
    ))
    out = [{"case": "mv_build_120_days", "wall_s": wall_create}]
    # touch every day (contiguous run -> ONE range overwrite)
    late = [
        (base_day + datetime.timedelta(days=d, hours=1), "late", 1.0)
        for d in range(n_days)
    ]
    raw.append(spark.createDataFrame(
        late, "ts timestamp_ntz, event_type string, value double"
    ))
    wall_c, res = timed(lambda: cat.sql(
        spark, "REFRESH MATERIALIZED VIEW global_temp.smv"
    ).first())
    out.append(
        {"case": "mv_refresh_120_contiguous_days",
         "days": len(res.refreshed_days), "wall_s": wall_c,
         "rows_replaced": res.rows_deleted}
    )
    # touch every OTHER day (60 scattered runs -> 60 overwrites)
    late2 = [
        (base_day + datetime.timedelta(days=d, hours=2), "late2", 1.0)
        for d in range(0, n_days, 2)
    ]
    raw.append(spark.createDataFrame(
        late2, "ts timestamp_ntz, event_type string, value double"
    ))
    wall_s, res2 = timed(lambda: cat.sql(
        spark, "REFRESH MATERIALIZED VIEW global_temp.smv"
    ).first())
    out.append(
        {"case": "mv_refresh_60_scattered_days",
         "days": len(res2.refreshed_days), "wall_s": wall_s,
         "rows_replaced": res2.rows_deleted}
    )
    return out


_STORM_WORKER = r"""
import sys
sys.path.insert(0, sys.argv[4])
from data_warehouse_copy_spark.session import get_spark
from data_warehouse_copy_spark.sources.managed_table import ManagedTable
root, w, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(shuffle_partitions=8, app_name=f"storm{w}")
t = ManagedTable(spark, root)
# half provided (unique per worker, beyond 2^53), half NULL slots;
# payload tags which is which so the invariants can tell them apart
df = spark.range(n).selectExpr(
    f"CASE WHEN id % 2 = 0 THEN 9007199254740993 + {w} * {n} + id "
    "ELSE NULL END AS id",
    f"CASE WHEN id % 2 = 0 THEN concat('prov_{w}_', id) "
    f"ELSE concat('null_{w}_', id) END AS payload",
)
rows = t.append(df.coalesce(4))
assert rows == n
"""


def stress_identity_storm(root: Path) -> list[dict]:
    """6 cross-process writers x 200k rows, mixed big-id/NULL frames.

    Invariants match the ENGINE contract (see _append_with_identity's
    docstring): (1) every row survives; (2) ALLOCATED ids are unique
    among themselves — the CAS-retry guarantee; (3) provided ids
    round-trip bit-exact (unique by construction here). Provided ids
    CAN equal allocated ids (the documented Delta explicit-insert
    boundary — the same duplicates arise in a serial schedule), so the
    cross-kind collision count is REPORTED, not asserted zero."""
    spark = get_spark(shuffle_partitions=16, app_name="storm_setup")
    t = ManagedTable.create(spark, root / "ids")
    t.append(spark.createDataFrame([], "id bigint, payload string"))
    t.set_identity("id", always=False)
    n_workers, n_rows = 6, 200_000
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _STORM_WORKER, str(root / "ids"),
             str(w), str(n_rows), str(Path(__file__).resolve().parents[1])],
        )
        for w in range(n_workers)
    ]
    codes = [p.wait(timeout=900) for p in procs]
    wall = round(time.time() - t0, 2)
    assert all(c == 0 for c in codes), codes
    total = n_workers * n_rows
    got = t.read().selectExpr("id", "payload",
                              "substr(payload, 1, 4) AS kind")
    n_all = got.count()
    assert n_all == total, (n_all, total)
    alloc = got.where("kind = 'null'")
    n_alloc = alloc.count()
    n_alloc_distinct = alloc.selectExpr(
        "count(distinct id) AS n"
    ).first().n
    assert n_alloc == n_alloc_distinct == total // 2, (
        n_alloc, n_alloc_distinct
    )  # allocated ids collision-free among themselves
    prov = got.where("kind = 'prov'")
    n_prov_exact = prov.where(
        (F.col("id") >= 9007199254740993)
        & (F.col("id") < 9007199254740993 + n_workers * n_rows)
    ).selectExpr("count(distinct id) AS n").first().n
    assert n_prov_exact == total // 2, n_prov_exact  # bit-exact pass-through
    cross = (
        alloc.select("id").join(prov.select("id"), "id").count()
    )
    return [
        {"case": "identity_bydefault_storm_6x200k", "rows": total,
         "wall_s": wall, "allocated_distinct": n_alloc_distinct,
         "provided_bitexact": n_prov_exact,
         "provided_vs_allocated_overlap_documented_boundary": cross}
    ]


def stress_dims_mv_keys(spark, root: Path) -> list[dict]:
    """Key-scoped dims-MV refresh under/over the 10k-per-column cap."""
    raw = ManagedTable.create(spark, root / "draw")
    raw.append(
        spark.range(2_000_000).selectExpr(
            "id % 50000 AS g", "id % 7 AS sub", "id AS amount"
        ).repartition(16)
    )
    cat = NamedCatalog(root / "dcat.json")
    cat.register("global_temp.sdraw", str(root / "draw"))
    cat.attach(spark)
    wall_b, _ = timed(lambda: cat.sql(
        spark,
        f"CREATE MATERIALIZED VIEW global_temp.sdmv LOCATION "
        f"'{root}/sdmv' AS SELECT g, COUNT(*) AS n, SUM(amount) AS total "
        f"FROM global_temp.sdraw GROUP BY g",
    ))
    out = [{"case": "dims_mv_build_50k_groups", "wall_s": wall_b}]
    # touch 5k groups (in-cap): key-scoped replace_where
    cat.sql(
        spark,
        "DELETE FROM global_temp.sdraw WHERE g < 5000 AND sub = 3",
    )
    # hybrid read with 5k pending keys (no refresh yet)
    wall_read, n_read = timed(lambda: cat.sql(
        spark, "SELECT COUNT(*) AS n FROM global_temp.sdmv"
    ).first().n)
    out.append(
        {"case": "dims_mv_hybrid_read_5k_pending", "wall_s": wall_read,
         "groups": n_read}
    )
    wall_r, res = timed(lambda: cat.sql(
        spark, "REFRESH MATERIALIZED VIEW global_temp.sdmv"
    ).first())
    out.append(
        {"case": "dims_mv_refresh_5k_touched_keys", "wall_s": wall_r,
         "rows_replaced": res.rows_deleted}
    )
    # touch 12k groups (over the 10k cap): atomic full-rebuild fallback
    cat.sql(
        spark,
        "DELETE FROM global_temp.sdraw WHERE g >= 20000 AND g < 32000 "
        "AND sub = 5",
    )
    wall_f, res2 = timed(lambda: cat.sql(
        spark, "REFRESH MATERIALIZED VIEW global_temp.sdmv"
    ).first())
    out.append(
        {"case": "dims_mv_refresh_12k_touched_full_rebuild",
         "wall_s": wall_f,
         "full_rebuild": list(res2.refreshed_days) == ["<full-rebuild>"]}
    )
    # exactness spot-check after both refresh shapes
    got = cat.sql(
        spark,
        "SELECT COUNT(*) AS n, SUM(total) AS s FROM global_temp.sdmv",
    ).first()
    cat.refresh(spark)
    want = spark.sql(
        "SELECT COUNT(*) AS n, SUM(t) AS s FROM (SELECT g, SUM(amount) "
        "AS t FROM global_temp.sdraw GROUP BY g)"
    ).first()
    assert (got.n, got.s) == (want.n, want.s), (got, want)
    return out


def main() -> None:
    results: list = []
    with tempfile.TemporaryDirectory(prefix="dwcs_r14_stress_") as td:
        root = Path(td)
        spark = get_spark(shuffle_partitions=32, app_name="r14stress")
        # warm-up (JIT) — the floor protocol's standard prelude
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        results += stress_dfp_probe(spark, root / "dfp")
        results += stress_matview_days(spark, root / "mv")
        results += stress_dims_mv_keys(spark, root / "dmv")
        spark.stop()
        results += stress_identity_storm(root / "storm")
    print(json.dumps(results, indent=1))
    Path(".scaling").mkdir(exist_ok=True)
    Path(".scaling/round14_stress.json").write_text(
        json.dumps(results, indent=1)
    )


if __name__ == "__main__":
    main()
