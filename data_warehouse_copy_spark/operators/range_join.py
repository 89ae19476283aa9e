"""Range (interval-containment) join — points matched to the intervals that
contain them, without an equi-key.

The reference has no joins beyond one anti-join (SURVEY.md §2.1); this is
the second time-series operator family (with :mod:`asof`) a training-data /
telemetry engine needs: "which maintenance window / promo period / session
does this event fall into?".

Spark executes a bare inequality join (``p.ts BETWEEN i.start AND i.end``)
as BroadcastNestedLoopJoin — O(|points| x |intervals|), dead at scale. The
scalable re-expression is **time-bucket banding** (the same idea behind
Databricks' range-join bin optimization, here built from public primitives):

1. choose a bucket granularity ``G``;
2. explode each interval to every bucket it overlaps
   (``sequence(floor(start/G), floor(end/G))``);
3. each point belongs to exactly ONE bucket (``floor(ts/G)``), so an
   equi-join on bucket followed by the exact containment filter yields each
   matching (point, interval) pair exactly once — no dedup pass needed.

Cost: one hash-shuffle on the bucket key. Blow-up is bounded by
``avg(interval span / G)`` copies per interval — pick ``G`` near the median
interval length so intervals explode to O(1) buckets while buckets stay
selective. Skew appears if one bucket holds many intervals (hot hour);
AQE skew-join or a finer ``G`` splits it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET_SECONDS = {"15 minutes": 900, "1 hour": 3600, "6 hours": 21600, "1 day": 86400}


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_ts <= end_col`` (closed bounds, matching SQL
    ``BETWEEN``). Column sets must be disjoint. ``how`` is ``inner`` or
    ``left`` (``left`` keeps unmatched points with NULL interval columns).

    Scale: one equi-shuffle on the time bucket; never a nested loop.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner|left, got {how!r}")
    g = _BUCKET_SECONDS.get(bucket)
    if g is None:
        raise ValueError(f"bucket must be one of {sorted(_BUCKET_SECONDS)}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column sets must be disjoint; both sides have {overlap}")

    # floor (not cast) so pre-1970 timestamps bucket correctly
    p = points.withColumn(
        "_pb", F.floor(F.unix_timestamp(F.col(point_ts)) / F.lit(g))
    )
    i = intervals.withColumn(
        "_ib",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / F.lit(g)),
                F.floor(F.unix_timestamp(F.col(end_col)) / F.lit(g)),
            )
        ),
    )
    cond = (
        (F.col("_pb") == F.col("_ib"))
        & (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    if how == "inner":
        return p.join(i, cond).drop("_pb", "_ib")
    # left: bucket-join keeps only matches; recover unmatched points with an
    # anti-join on the same (cheap, reused) bucketed sides
    matched = p.join(i, cond)
    unmatched = p.join(i, cond, "left_anti")
    null_ivl = unmatched.select(
        "*", *[F.lit(None).cast(f.dataType).alias(f.name) for f in intervals.schema.fields]
    )
    return matched.unionByName(null_ivl.withColumn("_ib", F.lit(None).cast("long"))).drop(
        "_pb", "_ib"
    )
