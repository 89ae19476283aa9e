"""As-of (nearest-prior) join — an operator family the reference lacks
entirely (SURVEY.md §2.1: no joins beyond one anti-join) but that any
time-series-capable engine needs.

Spark has no native ASOF JOIN; the classic scalable re-expression is the
**union + last-non-null window** trick:

1. tag left rows (probe) and right rows (reference) and union them on a
   common (key, ts) spine;
2. sort within each key by (ts, right-first-on-ties) and carry the last
   seen right-row payload forward with ``last(..., ignorenulls=True)``;
3. keep only left rows — each now annotated with the most recent right row
   at-or-before its timestamp.

Cost: ONE shuffle on the key (the window sort), no range explosion, no
driver involvement — at 100 TB this beats an inequality join (which Spark
would execute as a broadcast-nested-loop) by orders of magnitude. Ties
(right.ts == left.ts) match, same as DuckDB/kdb ``ASOF JOIN`` with ``>=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row of
    the same ``key`` with ``right_ts <= left_ts`` (NULLs when none exists).

    Output: all left columns plus ``<col><suffix>`` for each value column
    and ``<right_ts><suffix>`` (the matched row's timestamp).
    """
    carried = [right_ts, *value_cols]
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*carried).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*carried).alias("_r"),
    )
    # right rows sort BEFORE left rows at equal ts -> ties match (>= asof)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    annotated = (
        l_tag.unionByName(r_tag)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"_match.{right_ts}").alias(f"{right_ts}{suffix}"))
    out_cols.extend(F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in value_cols)
    return annotated.select(*out_cols)
