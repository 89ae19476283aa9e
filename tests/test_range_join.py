"""Range join: banded equi-join must equal the naive inequality join."""

import pytest
from pyspark.sql import functions as F

from data_warehouse_copy_spark.operators.range_join import range_join


@pytest.fixture(scope="module")
def sides(spark, sf_dir):
    from data_warehouse_copy_spark.sources.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    points = events.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("event_type").alias("p_type"),
    )
    intervals = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 5 MINUTES")).alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("w_end"),
    )
    return points.cache(), intervals.cache()


def test_matches_naive_inequality_join(sides):
    points, intervals = sides
    got = range_join(points, intervals, "p_ts", "w_start", "w_end", "15 minutes")
    naive = points.crossJoin(intervals).filter(
        (F.col("p_ts") >= F.col("w_start")) & (F.col("p_ts") <= F.col("w_end"))
    )
    key = lambda r: (r["p_id"], r["purchase_id"])
    assert sorted(map(key, got.collect())) == sorted(map(key, naive.collect()))
    assert got.count() > 0  # fixture actually exercises matches


def test_no_duplicate_pairs_across_buckets(sides):
    """An interval spanning several buckets must still yield each matching
    pair exactly once (the point's single bucket dedups structurally)."""
    points, intervals = sides
    wide = intervals.withColumn(
        "w_end", F.col("w_end") + F.expr("INTERVAL 3 HOURS")
    )
    got = range_join(points, wide, "p_ts", "w_start", "w_end", "1 hour")
    assert got.groupBy("p_id", "purchase_id").count().filter("count > 1").count() == 0


def test_left_join_keeps_unmatched_points(sides):
    points, intervals = sides
    got = range_join(points, intervals, "p_ts", "w_start", "w_end",
                     "15 minutes", how="left")
    inner = range_join(points, intervals, "p_ts", "w_start", "w_end", "15 minutes")
    matched_ids = {r.p_id for r in inner.select("p_id").distinct().collect()}
    rows = got.collect()
    # every point appears; unmatched ones carry NULL interval columns
    assert {r.p_id for r in rows} == {r.p_id for r in points.collect()}
    for r in rows:
        if r.p_id not in matched_ids:
            assert r.purchase_id is None


def test_rejects_bad_args(sides):
    points, intervals = sides
    with pytest.raises(ValueError, match="bucket"):
        range_join(points, intervals, "p_ts", "w_start", "w_end", "7 minutes")
    with pytest.raises(ValueError, match="disjoint"):
        range_join(points, points, "p_ts", "p_ts", "p_ts")
    with pytest.raises(ValueError, match="inner|left"):
        range_join(points, intervals, "p_ts", "w_start", "w_end", how="full")


def test_plan_is_equi_join_not_nested_loop(sides):
    import contextlib
    import io

    points, intervals = sides
    df = range_join(points, intervals, "p_ts", "w_start", "w_end", "15 minutes")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
