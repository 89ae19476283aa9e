"""Generic source/sink round-trips for csv/json/orc alongside parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_copy_spark.sources.catalog import (
    load_table,
    read_source,
    write_sink,
)


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(200)
        .cache()
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, sample, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_sink(sample, path, fmt=fmt)
    back = read_source(spark, path, fmt=fmt, schema=sample.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))


def test_csv_infers_header(spark, sample, tmp_path):
    path = str(tmp_path / "c")
    write_sink(sample, path, fmt="csv")
    back = read_source(spark, path, fmt="csv")
    assert set(back.columns) == set(sample.columns)
    assert back.count() == sample.count()


def test_partitioned_sink(spark, sample, tmp_path):
    path = str(tmp_path / "p")
    write_sink(sample, path, fmt="parquet", partition_by=["o_orderstatus"])
    back = read_source(spark, path)
    assert back.count() == sample.count()
    # partition pruning: filter on the partition column prunes directories
    one = back.filter(F.col("o_orderstatus") == "F")
    assert one.count() == sample.filter(F.col("o_orderstatus") == "F").count()
