"""Bucketed co-located joins: same results as plain joins, with the
shuffle provably gone from the physical plan."""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from data_warehouse_copy_spark.sources.bucketed import read_bucketed, write_bucketed
from data_warehouse_copy_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    yield li, orders
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def _n_exchanges(df) -> int:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return len(re.findall(r"^\(\d+\) Exchange", buf.getvalue(), re.MULTILINE))


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    li, orders = bucketed_pair
    bl, bo = read_bucketed(spark, "b_lineitem"), read_bucketed(spark, "b_orders")
    # disable auto-broadcast so the plan decision is bucketing, not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        assert _n_exchanges(joined) == 0, "bucketed join must not shuffle"
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert _n_exchanges(plain) >= 2, "sanity: unbucketed join shuffles"
        # identical results
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_aggregation_skips_exchange(spark, bucketed_pair):
    bl = read_bucketed(spark, "b_lineitem")
    agg = bl.groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert _n_exchanges(agg) == 0, "groupBy on the bucket key must not shuffle"
