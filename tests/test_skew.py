"""salted_join equals the plain join on a pathologically skewed key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_copy_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0; dim has keys 0..9 plus 99 (no match)
    left = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise((F.col("id") % 7) + 1).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame(
        [(k, f"dim_{k}") for k in [*range(10), 99]], "k bigint, label string"
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain(spark, skewed, how):
    left, right = skewed
    plain = left.join(right, ["k"], how)
    salted = salted_join(left, right, ["k"], how=how, salt=8)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_spreads_hot_key(spark, skewed):
    left, right = skewed
    from data_warehouse_copy_spark.operators.skew import SALT_COL

    salted_left = left.withColumn(
        SALT_COL, F.floor(F.rand(42) * 8).cast("int")
    )
    per_salt = (
        salted_left.filter(F.col("k") == 0)
        .groupBy(SALT_COL)
        .count()
        .collect()
    )
    assert len(per_salt) == 8  # hot key split across all salt buckets
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 2 * min(counts)  # roughly uniform
