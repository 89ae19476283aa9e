"""ManagedTable: atomic commits, partition pruning, range overwrite, merge."""

import threading

import pytest
from pyspark.sql import functions as F

from data_warehouse_copy_spark.sources.managed_table import ManagedTable


@pytest.fixture()
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_create_append_read_roundtrip(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, tmp_path / "t")
    sample = lineitem.limit(100)
    assert t.append(sample) == 100
    assert t.read().count() == 100
    assert t.count() == 100  # metadata count, no Spark job
    assert set(t.read().columns) == set(lineitem.columns)


def test_overwrite_replaces_atomically(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(50))
    v1 = t.snapshot().version
    t.overwrite(lineitem.limit(10))
    assert t.read().count() == 10
    # time travel: the pre-overwrite version is still readable
    assert t.read(version=v1).count() == 50


def test_empty_table_read_has_schema(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(5))
    t.overwrite(lineitem.limit(0))
    df = t.read()
    assert df.count() == 0
    assert "l_orderkey" in df.columns


def test_partitioned_write_and_prune(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, tmp_path / "t", partition_date_col="l_shipdate")
    t.append(lineitem.filter(F.col("l_shipdate") < "1995-03-01"))
    m = t.snapshot()
    assert all(f.partition is not None for f in m.files)
    # partition pruning at manifest level
    one_day = t.read(partition_min="1995-01-05", partition_max="1995-01-05")
    expected = lineitem.filter(
        F.to_date("l_shipdate") == F.lit("1995-01-05").cast("date")
    ).count()
    assert one_day.count() == expected
    # original date column survives in the data files
    assert "l_shipdate" in one_day.columns


def test_overwrite_range_is_partition_scoped(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, tmp_path / "t", partition_date_col="l_shipdate")
    base = lineitem.filter(F.col("l_shipdate").between("1995-01-01", "1995-02-01"))
    t.append(base)
    files_before = {
        f.path for f in t.snapshot().files if f.partition and f.partition < "1995-01-10"
    }

    window = lineitem.filter(
        F.col("l_shipdate").between("1995-01-10 00:00:00", "1995-01-15 23:59:59.997")
    )
    deleted, written = t.overwrite_range(window, "1995-01-10", "1995-01-15")
    assert written == window.count()
    # untouched partitions keep their exact files (no full rewrite)
    files_after = {
        f.path for f in t.snapshot().files if f.partition and f.partition < "1995-01-10"
    }
    assert files_before == files_after
    # total state converges to base outside window + window data
    assert t.read().count() == base.count()


def test_overwrite_range_removes_vanished_partitions(spark, tmp_path, lineitem):
    """A day present in target but absent from the new window data must be
    deleted (SQL DELETE semantics — dynamic partition overwrite alone would
    leave it)."""
    t = ManagedTable.create(spark, tmp_path / "t", partition_date_col="l_shipdate")
    t.append(lineitem.filter(F.col("l_shipdate").between("1995-01-01", "1995-01-31")))
    empty_window = lineitem.filter(F.lit(False))
    deleted, written = t.overwrite_range(empty_window, "1995-01-01", "1995-01-10")
    assert written == 0 and deleted > 0
    assert (
        t.read(partition_min="1995-01-01", partition_max="1995-01-10").count() == 0
    )
    assert t.read().count() > 0  # rest of January intact


def test_overwrite_range_keeps_end_of_day_tail(spark, tmp_path):
    """The reference's DELETE bound is D2 23:59:59.997 (TableCopyService.cs:112)
    — rows in the last ~3 ms of the final day must survive a range reload,
    even on the partitioned path where whole day partitions are swapped."""
    from datetime import datetime

    rows = [
        ("in_window", datetime(1995, 1, 10, 12, 0, 0)),
        ("at_bound", datetime(1995, 1, 15, 23, 59, 59, 997000)),
        ("tail", datetime(1995, 1, 15, 23, 59, 59, 999000)),
        ("outside", datetime(1995, 1, 20, 0, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    t = ManagedTable.create(spark, tmp_path / "t", partition_date_col="ts")
    t.append(df)

    window = df.filter(F.col("k") == "in_window").withColumn("k", F.lit("reloaded"))
    deleted, written = t.overwrite_range(
        window, "1995-01-10", "1995-01-15", date_column="ts"
    )
    keys = {r.k for r in t.read().collect()}
    # at_bound (== 23:59:59.997) is inside the DELETE range -> gone;
    # tail (> .997) survives; outside untouched; window row reloaded
    assert keys == {"reloaded", "tail", "outside"}
    # in_window + at_bound logically deleted; only the reloaded row was
    # copied from source (the surviving tail row counts as neither)
    assert deleted == 2 and written == 1


def test_overwrite_range_unpartitioned_keeps_null_dates(spark, tmp_path):
    """SQL `BETWEEN` is NULL for NULL dates, so the reference's DELETE never
    removes NULL-date rows; the unpartitioned fallback must match."""
    from datetime import datetime

    rows = [
        ("in_window", datetime(1995, 1, 10, 12, 0, 0)),
        ("null_date", None),
        ("outside", datetime(1995, 2, 1, 0, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(df)
    window = df.filter(F.col("k") == "in_window").withColumn("k", F.lit("reloaded"))
    deleted, written = t.overwrite_range(
        window, "1995-01-10", "1995-01-15", date_column="ts"
    )
    keys = {r.k for r in t.read().collect()}
    assert keys == {"reloaded", "null_date", "outside"}
    assert deleted == 1 and written == 1


def test_overwrite_range_rejects_out_of_window_data(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, tmp_path / "t", partition_date_col="l_shipdate")
    with pytest.raises(ValueError, match="outside"):
        t.overwrite_range(lineitem.limit(1000), "1995-01-01", "1995-01-02")


def test_merge_by_key_upserts(spark, tmp_path, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = ManagedTable.create(spark, tmp_path / "t", partition_date_col="o_orderdate")
    t.append(orders)
    v_before = t.snapshot().version

    changed = (
        orders.filter(F.col("o_orderkey") % 100 == 0)
        .withColumn("o_orderstatus", F.lit("X"))
    )
    n = t.merge_by_key(changed, "o_orderkey")
    assert n == changed.count()

    after = t.read()
    assert after.count() == orders.count()  # delete+reinsert, no dup keys
    assert after.filter(F.col("o_orderstatus") == "X").count() == changed.count()
    # only partitions containing changed keys were rewritten
    before_files = {f.path for f in t.snapshot(v_before).files}
    after_files = {f.path for f in t.snapshot().files}
    assert before_files & after_files, "untouched partitions must keep their files"


def test_merge_by_key_inserts_new_keys(spark, tmp_path, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = ManagedTable.create(spark, tmp_path / "t", partition_date_col="o_orderdate")
    t.append(orders.filter(F.col("o_orderkey") > 100))
    newrows = orders.filter(F.col("o_orderkey") <= 100)
    t.merge_by_key(newrows, "o_orderkey")
    assert t.read().count() == orders.count()


def test_merge_empty_keyset_commits_noop(spark, tmp_path, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = ManagedTable.create(spark, tmp_path / "t", partition_date_col="o_orderdate")
    t.append(orders)
    v = t.snapshot().version
    assert t.merge_by_key(orders.filter(F.lit(False)), "o_orderkey") == 0
    assert t.snapshot().version == v + 1  # still commits (reference :167-172)
    assert t.snapshot().op == "merge_noop"


def test_concurrent_appends_lose_nothing(spark, tmp_path, sf_dir):
    """Parallel dim loads append to the shared audit table (reference
    Parallel.ForEach); the commit lock must serialize manifest versions."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    t = ManagedTable.create(spark, tmp_path / "t")
    threads = [
        threading.Thread(target=lambda: ManagedTable(spark, tmp_path / "t").append(region))
        for _ in range(4)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert t.read().count() == region.count() * 4


def test_vacuum_removes_dead_files(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(10))
    t.overwrite(lineitem.limit(5))
    removed = t.vacuum(retention_seconds=0.0)
    assert removed > 0
    assert t.read().count() == 5


def test_compact_unpartitioned_merges_files(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, str(tmp_path / "c1"))
    part = lineitem.limit(100)
    for _ in range(4):
        t.append(part)
    before_rows = sorted(map(tuple, t.read().collect()))
    v_before = t.snapshot().version
    n_before, n_after = t.compact()
    assert n_before >= 4 and n_after == 1
    assert sorted(map(tuple, t.read().collect())) == before_rows
    # time travel: the pre-compaction version still reads identically
    assert sorted(map(tuple, t.read(version=v_before).collect())) == before_rows


def test_compact_partitioned_one_file_per_day(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, str(tmp_path / "c2"), "l_shipdate")
    from pyspark.sql import functions as F

    window = lineitem.filter(
        F.col("l_shipdate").between("1995-03-01", "1995-03-03")
    )
    t.append(window)
    t.append(window)  # duplicate appends -> >=2 files per day
    rows_before = t.read().count()
    n_before, n_after = t.compact()
    assert n_before > n_after
    per_part = {}
    for f in t.snapshot().files:
        per_part[f.partition] = per_part.get(f.partition, 0) + 1
    assert all(n == 1 for n in per_part.values()), per_part
    assert t.read().count() == rows_before
    # partition pruning still works after compaction
    assert (
        t.read(partition_min="1995-03-02", partition_max="1995-03-02").count() > 0
    )


def test_append_pylist_guards(spark, tmp_path):
    from datetime import datetime

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    t = ManagedTable.create(spark, str(tmp_path / "meta"))
    t.append_pylist([{"k": "a", "n": 1, "ts": datetime(2026, 1, 1)}], schema)
    assert t.read().count() == 1
    # schema mismatch rejected
    bad = T.StructType([T.StructField("other", T.StringType())])
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append_pylist([{"other": "x"}], bad)
    # unsupported type rejected with a useful message
    rich = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("ts", T.ArrayType(T.LongType())),
        ]
    )
    with pytest.raises(ValueError, match="does not support field"):
        t.append_pylist([{"k": "a", "n": 1, "ts": [1]}], rich)
    # partitioned tables rejected
    tp = ManagedTable.create(spark, str(tmp_path / "part"), "ts")
    with pytest.raises(ValueError, match="unpartitioned"):
        tp.append_pylist([{"k": "a", "n": 1, "ts": datetime(2026, 1, 1)}], schema)


def test_append_rejects_type_divergence(spark, tmp_path, lineitem):
    """Same column names but a divergent type must be rejected: parquet
    readers take the first file's schema, so a silently-written
    type-incompatible file poisons every later read."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(10))
    retyped = lineitem.limit(5).withColumn(
        "l_quantity", F.col("l_quantity").cast("string")
    )
    with pytest.raises(ValueError, match="type mismatch.*l_quantity"):
        t.append(retyped)
    # realigned-but-identical schema still appends fine
    reordered = lineitem.limit(5).select(*reversed(lineitem.columns))
    assert t.append(reordered) == 5


def test_append_tolerates_nested_nullability_divergence(spark, tmp_path):
    """Nested containsNull flips are parquet-compatible; only genuine type
    divergence is poisoning. A frame whose array column says
    containsNull=false must append onto a containsNull=true table."""
    from pyspark.sql import types as T

    t = ManagedTable.create(spark, tmp_path / "t")
    nullable = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType(), True)),
        ]
    )
    t.append(spark.createDataFrame([(1, ["a", "b"])], nullable))
    # F.split/F.array expressions produce containsNull=false arrays
    dense = spark.range(2, 4).select(
        F.col("id").alias("k"), F.split(F.lit("x,y"), ",").alias("tags")
    )
    assert not dense.schema["tags"].dataType.containsNull
    assert t.append(dense) == 2
    assert t.read().count() == 3


def test_data_skipping_prunes_files_and_keeps_results_exact(spark, tmp_path):
    """File-level data skipping: footer-harvested min/max must drop files a
    predicate cannot touch from the scan plan, and read(where=) must equal
    a full scan + filter exactly."""
    t = ManagedTable.create(spark, tmp_path / "t")
    # three appends with disjoint key ranges -> three files with disjoint stats
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 500).select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("v")
            )
        )
    m = t.snapshot()
    assert all(f.stats and "k" in f.stats for f in m.files)

    def expected_files(pred):
        return {f.path for f in m.files if pred(*f.stats["k"])}

    # point lookup: only files whose [min, max] contains the key survive
    got = t.read(where=[("k", "=", 1250)])
    want = expected_files(lambda lo, hi: lo <= 1250 <= hi)
    assert len(got.inputFiles()) == len(want) < len(m.files)
    assert [r.k for r in got.collect()] == [1250]
    # range predicate spanning two appends (the key space has gaps:
    # 400-499 from the first append + 1000-1099 from the second)
    got = t.read(where=[("k", ">=", 400), ("k", "<", 1100)])
    want = expected_files(lambda lo, hi: hi >= 400 and lo < 1100)
    assert len(got.inputFiles()) == len(want) < len(m.files)
    assert got.count() == 200
    # predicate matching nothing -> empty frame, correct schema, no files
    got = t.read(where=[("k", ">", 99999)])
    assert got.count() == 0 and set(got.columns) == {"k", "v"}
    # results equal full scan + filter
    full = t.read().filter((F.col("k") >= 900) & (F.col("k") < 1100))
    assert sorted(r.k for r in full.collect()) == sorted(
        r.k for r in t.read(where=[("k", ">=", 900), ("k", "<", 1100)]).collect()
    )


def test_data_skipping_is_conservative(spark, tmp_path):
    """Missing stats (pre-stats manifests), unknown columns, type-mismatched
    values, and unsupported ops must never prune — pruning returns a
    superset or raises, never silently drops rows."""
    import pytest as _pytest

    from data_warehouse_copy_spark.sources.managed_table import (
        _file_may_match,
    )

    assert _file_may_match(None, "k", "=", 5)  # pre-stats manifest
    assert _file_may_match({}, "k", "=", 5)
    assert _file_may_match({"v": [0, 9]}, "k", "=", 5)  # unknown column
    assert _file_may_match({"k": [0, 9]}, "k", "=", "text")  # type mismatch
    assert _file_may_match({"k": [0, 9]}, "k", "=", [1, 2])  # unsupported value
    with _pytest.raises(ValueError, match="unsupported where op"):
        _file_may_match({"k": [0, 9]}, "k", "!=", 5)
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.range(5).select(F.col("id").alias("k")))
    # strip stats to simulate an old manifest; read must still be exact
    m = t.snapshot()
    from dataclasses import replace
    stripped = tuple(replace(f, stats=None) for f in m.files)
    t._commit(replace(m, version=m.version + 1, files=stripped))
    got = t.read(where=[("k", "<=", 2)])
    assert sorted(r.k for r in got.collect()) == [0, 1, 2]


def test_data_skipping_on_timestamps(spark, tmp_path):
    """Timestamp stats are stored as fixed-width strings; day-prefix
    predicate values must prune conservatively and filter exactly."""
    from datetime import datetime

    t = ManagedTable.create(spark, tmp_path / "t")
    for day in (10, 11, 12):
        t.append(
            spark.range(24).select(
                F.expr(
                    f"TIMESTAMP '2024-01-{day:02d} 00:00:00' + make_interval(0,0,0,0,id)"
                ).alias("ts"),
                F.col("id").alias("h"),
            )
        )
    m = t.snapshot()
    with_stats = [f for f in m.files if f.stats and "ts" in f.stats]
    assert with_stats, "timestamp columns must carry footer stats (INT64)"
    got = t.read(where=[("ts", ">=", "2024-01-11"), ("ts", "<", "2024-01-12")])
    day11 = {f.path for f in with_stats if f.stats["ts"][1] >= "2024-01-11"
             and f.stats["ts"][0] < "2024-01-12"}
    assert len(got.inputFiles()) == len(day11) < len(m.files)
    assert got.count() == 24
    # datetime predicate values work the same way
    got2 = t.read(where=[("ts", ">=", datetime(2024, 1, 12, 5))])
    assert len(got2.inputFiles()) < len(m.files)
    assert got2.count() == 19


def test_cluster_col_gives_disjoint_file_spans(spark, tmp_path):
    """A cluster_col table range-repartitions writes so files carry tight,
    disjoint spans of the cluster column — a point lookup then reads
    exactly one file even when the input arrives shuffled."""
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col="k")
    shuffled = (
        spark.range(10_000)
        .select(F.col("id").alias("k"), (F.col("id") * 17 % 1000).alias("v"))
        .repartition(16)  # arrives in arbitrary order
    )
    # AQE would rightly coalesce 10k tiny rows into one file; pin the range
    # shuffle width so the test materializes multiple cluster spans
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.append(shuffled)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    m = t.snapshot()
    assert m.cluster_col == "k"
    spans = sorted(tuple(f.stats["k"]) for f in m.files)
    assert len(spans) > 1
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next, "cluster spans must be disjoint"
    got = t.read(where=[("k", "=", 4321)])
    assert len(got.inputFiles()) == 1
    assert [r.k for r in got.collect()] == [4321]
    # cluster_col survives commits: a second append stays clustered (AQE
    # may coalesce it into one file; it must still skip the first append's)
    t.append(shuffled.withColumn("k", F.col("k") + 10_000))
    got2 = t.read(where=[("k", "=", 14321)])
    assert len(got2.inputFiles()) < len(t.snapshot().files)
    assert got2.count() == 1


def test_merge_on_clustered_table_rewrites_only_span_files(spark, tmp_path):
    """Unpartitioned merge with pk stats: only files whose key span admits
    an affected key are rewritten; the rest keep their exact paths
    (Delta-style merge pruning off the manifest stats)."""
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col="k")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.append(
            spark.range(10_000).select(
                F.col("id").alias("k"), F.lit("orig").alias("v")
            )
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    before = {f.path for f in t.snapshot().files}
    assert len(before) > 2
    # update a narrow key band + insert brand-new keys
    updates = spark.range(100, 160).select(
        F.col("id").alias("k"), F.lit("new").alias("v")
    )
    inserts = spark.range(20_000, 20_010).select(
        F.col("id").alias("k"), F.lit("ins").alias("v")
    )
    n = t.merge_by_key(updates.unionByName(inserts), "k")
    assert n == 70
    after = {f.path for f in t.snapshot().files}
    # most files untouched: only span-hit files were replaced
    assert len(before & after) >= len(before) - 2
    got = t.read()
    assert got.count() == 10_010
    assert got.filter(F.col("v") == "new").count() == 60
    assert got.filter(F.col("v") == "ins").count() == 10
    assert got.filter((F.col("k") == 100) & (F.col("v") == "orig")).count() == 0


def test_merge_without_stats_still_correct(spark, tmp_path):
    """Pre-stats manifests (stats=None) fall back to the full rewrite and
    stay correct."""
    from dataclasses import replace

    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.range(100).select(F.col("id").alias("k"), F.lit("a").alias("v")))
    m = t.snapshot()
    t._commit(
        replace(m, version=m.version + 1,
                files=tuple(replace(f, stats=None) for f in m.files))
    )
    t.merge_by_key(
        spark.range(5).select(F.col("id").alias("k"), F.lit("b").alias("v")),
        "k",
    )
    got = t.read()
    assert got.count() == 100
    assert got.filter(F.col("v") == "b").count() == 5


def test_compact_preserves_clustering(spark, tmp_path):
    """Compaction rewrites crowded partitions through the same clustered
    write path, so file spans on the cluster column stay disjoint and
    point lookups keep skipping after the maintenance pass."""
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col="k")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        for lo in (0, 2000, 4000):  # three appends -> crowded unpartitioned set
            t.append(
                spark.range(lo, lo + 2000).select(
                    F.col("id").alias("k"), (F.col("id") % 13).alias("v")
                )
            )
        before, after = t.compact()
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert after < before
    spans = sorted(tuple(f.stats["k"]) for f in t.snapshot().files)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next, "compaction must keep cluster spans disjoint"
    got = t.read(where=[("k", "=", 2500)])
    assert len(got.inputFiles()) == 1
    assert [r.k for r in got.collect()] == [2500]
    assert t.read().count() == 6000


def test_file_may_match_boundary_soundness():
    """Pruning soundness at type-cast boundaries: a bare-day string predicate
    must keep a file whose timestamp stats start exactly at that midnight
    (Spark casts the string to a timestamp, so '=' / '<=' match the
    instant), and float stats must never prune '>' / '>=' (a hidden NaN row
    satisfies them)."""
    from data_warehouse_copy_spark.sources.managed_table import _file_may_match

    day_file = {"ts": ["2024-01-11 00:00:00.000000", "2024-01-11 12:00:00.000000"]}
    assert _file_may_match(day_file, "ts", "<=", "2024-01-11")
    assert _file_may_match(day_file, "ts", "=", "2024-01-11")
    assert not _file_may_match(day_file, "ts", "<", "2024-01-11")
    # floats: NaN is above every value in Spark's ordering
    fstats = {"x": [1.0, 2.0]}
    assert _file_may_match(fstats, "x", ">", 100.0)
    assert _file_may_match(fstats, "x", ">=", 100.0)
    assert not _file_may_match(fstats, "x", "<", 0.5)
    assert _file_may_match(fstats, "x", "=", float("nan"))
    assert not _file_may_match(fstats, "x", "=", 50.0)


def test_merge_with_reserved_and_float_pk(spark, tmp_path):
    """The stats-scoped merge must not break on a pk named like its internal
    span columns, and float pks (NaN-capable) must fall back to the full
    rewrite and still converge."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.range(50).select(F.col("id").alias("lo"), F.lit("a").alias("v")))
    t.merge_by_key(
        spark.range(5).select(F.col("id").alias("lo"), F.lit("b").alias("v")), "lo"
    )
    got = t.read()
    assert got.count() == 50 and got.filter(F.col("v") == "b").count() == 5

    tf = ManagedTable.create(spark, tmp_path / "tf")
    rows = [(float(i), "a") for i in range(10)] + [(float("nan"), "a")]
    tf.append(spark.createDataFrame(rows, "k double, v string"))
    upd = spark.createDataFrame([(float("nan"), "b"), (3.0, "b")], "k double, v string")
    tf.merge_by_key(upd, "k")
    got = tf.read()
    assert got.count() == 11  # NaN key replaced, not duplicated
    assert got.filter(F.col("v") == "b").count() == 2


def test_compact_converges_on_clustered_table(spark, tmp_path):
    """Compacting a clustered table must reach a state compact() calls a
    no-op — the clustered write path pins the output width, otherwise every
    pass re-emits shuffle-width files and the table stays crowded forever."""
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col="k")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        for lo in (0, 1000):
            t.append(spark.range(lo, lo + 1000).select(F.col("id").alias("k")))
        b1, a1 = t.compact()
        b2, a2 = t.compact()
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert a1 < b1
    assert (b2, a2) == (a1, a1), "second compact must be a no-op"
    assert t.read().count() == 2000


# ------------------------------------------------------- concurrent writers


def _mt_no_spark(root):
    """ManagedTable handle without a SparkSession — the manifest protocol
    (snapshot/_commit_files) and append_pylist are pure driver-side code,
    which lets subprocess tests hammer the commit path without a JVM each."""
    return ManagedTable(None, root)


_WORKER_SCRIPT = r"""
import sys
from pyspark.sql import types as T
from data_warehouse_copy_spark.sources.managed_table import ManagedTable

root, wid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
t = ManagedTable(None, root)
schema = T.StructType([
    T.StructField("writer", T.LongType()),
    T.StructField("seq", T.LongType()),
])
for i in range(n):
    t.append_pylist([{"writer": wid, "seq": i}], schema)
print("OK")
"""


def test_concurrent_cross_process_appends_lose_nothing(spark, tmp_path):
    """N processes × K appends each: every commit must survive (the O_EXCL
    version-file commit + rebase). Before round 3 this was last-wins and
    silently lost updates."""
    import subprocess
    import sys

    from pyspark.sql import types as T

    root = str(tmp_path / "t")
    t = ManagedTable.create(spark, root)
    schema = T.StructType(
        [T.StructField("writer", T.LongType()), T.StructField("seq", T.LongType())]
    )
    t.append_pylist([{"writer": -1, "seq": -1}], schema)  # seed the schema

    n_procs, n_appends = 4, 6
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_SCRIPT, root, str(w), str(n_appends)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in range(n_procs)
    ]
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err
        assert "OK" in out

    m = t.snapshot()
    assert m.total_rows == 1 + n_procs * n_appends  # no lost update
    assert m.version == 1 + n_procs * n_appends  # every commit got a version
    assert t.read().count() == 1 + n_procs * n_appends


def test_stale_base_append_rebases(spark, tmp_path, lineitem):
    """An append computed against a stale snapshot must land on the new head
    without losing the interleaved commit (the in-process analogue of two
    processes racing)."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(10))
    stale = t.snapshot()
    t.append(lineitem.limit(5))  # interleaved commit -> stale base
    new_files = t._write_files(lineitem.limit(3), None, None)
    t._commit_files(stale, tuple(stale.files) + new_files, None, "append")
    assert t.snapshot().total_rows == 18
    assert t.snapshot().version == stale.version + 2


def test_conflicting_rewrite_cleanly_rejected(spark, tmp_path, lineitem):
    """Two writers rewriting the SAME files: the loser must get
    ConcurrentWriteError, not silently clobber the winner."""
    from data_warehouse_copy_spark.sources.managed_table import (
        ConcurrentWriteError,
    )

    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(10))
    stale = t.snapshot()
    t.overwrite(lineitem.limit(5))  # winner rewrites (removes) the old files
    new_files = t._write_files(lineitem.limit(3), None, None)
    with pytest.raises(ConcurrentWriteError):
        # loser also removes the (now-gone) old files
        t._commit_files(stale, new_files, None, "overwrite")
    assert t.snapshot().total_rows == 5  # winner's data intact


def test_append_racing_compact_keeps_both(spark, tmp_path, lineitem):
    """Compaction computed against a stale base rebases over an interleaved
    append: the appended rows survive, the compacted files land."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(4))
    t.append(lineitem.limit(4))
    stale = t.snapshot()
    # compaction plan against `stale`: all current files -> one file
    compacted = t._write_files(t.read().coalesce(1), None, None)
    t.append(lineitem.limit(7))  # interleaved ingest
    t._commit_files(stale, compacted, None, "compact")
    assert t.snapshot().total_rows == 8 + 7
    names = {f.path for f in t.snapshot().files}
    assert {f.path for f in compacted} <= names


def test_latest_pointer_lag_is_tolerated(spark, tmp_path, lineitem):
    """snapshot() probes past a stale _LATEST hint to the real head."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(5))
    t.append(lineitem.limit(5))
    head = t.snapshot().version
    (t.root / "_log" / "_LATEST").write_text("0")  # simulate a lost flip race
    assert t.snapshot().version == head
    t.append(lineitem.limit(5))  # next commit re-advances the pointer
    assert int((t.root / "_log" / "_LATEST").read_text()) == head + 1


def test_vacuum_retention_spares_young_files(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(5))
    t.overwrite(lineitem.limit(3))  # orphans the first commit's files
    assert t.vacuum(retention_seconds=3600) == 0  # young orphans spared
    assert t.vacuum() == 0  # the DEFAULT is a safe 7-day retention
    assert t.vacuum(retention_seconds=0.0) >= 1  # explicit quiesced opt-in
    assert t.read().count() == 3


# --------------------------------------------------------- schema evolution


def test_merge_schema_add_column(spark, tmp_path, lineitem):
    """Additive evolution: new column widens the table; old files read back
    with typed nulls; type changes stay rejected."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.select("l_orderkey", "l_quantity").limit(10))
    widened = (
        lineitem.select("l_orderkey", "l_quantity")
        .limit(4)
        .withColumn("source_tag", F.lit("r3"))
    )
    # without the opt-in it still rejects
    with pytest.raises(ValueError, match="merge_schema"):
        t.append(widened)
    assert t.append(widened, merge_schema=True) == 4
    df = t.read()
    assert df.columns == ["l_orderkey", "l_quantity", "source_tag"]
    assert df.count() == 14
    assert df.filter(F.col("source_tag").isNull()).count() == 10  # backfill
    assert df.filter(F.col("source_tag") == "r3").count() == 4
    # plain append must now supply the union schema
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(lineitem.select("l_orderkey", "l_quantity").limit(1))


def test_merge_schema_missing_column_backfilled_on_write(spark, tmp_path, lineitem):
    """merge_schema also accepts a frame MISSING table columns: they are
    written as typed nulls (additive both directions, never destructive)."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.select("l_orderkey", "l_quantity", "l_shipdate").limit(6))
    t.append(
        lineitem.select("l_orderkey").limit(3).withColumn("extra", F.lit(1)),
        merge_schema=True,
    )
    df = t.read()
    assert df.columns == ["l_orderkey", "l_quantity", "l_shipdate", "extra"]
    assert df.filter(F.col("l_quantity").isNull()).count() == 3
    assert df.filter(F.col("extra").isNull()).count() == 6


def test_merge_schema_rejects_type_change(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.select("l_orderkey", "l_quantity").limit(5))
    mutated = lineitem.select(
        "l_orderkey", F.col("l_quantity").cast("string").alias("l_quantity")
    ).limit(2)
    with pytest.raises(ValueError, match="type mismatch"):
        t.append(mutated, merge_schema=True)


def test_merge_by_key_after_evolution(spark, tmp_path, lineitem):
    """Key-merge over a mix of pre- and post-evolution files reconciles to
    the union schema (the stats-scoped file read is schema-explicit)."""
    t = ManagedTable.create(spark, tmp_path / "t")
    base = lineitem.select("l_orderkey", "l_quantity").dropDuplicates(
        ["l_orderkey"]
    ).limit(20)
    t.append(base)
    t.append(
        base.limit(2).withColumn("flag", F.lit("new")), merge_schema=True
    )
    src = base.limit(5).withColumn("l_quantity", F.lit(999.0)).withColumn(
        "flag", F.lit("merged")
    )
    t.merge_by_key(src, "l_orderkey")
    df = t.read()
    assert set(df.columns) == {"l_orderkey", "l_quantity", "flag"}
    assert df.filter(F.col("flag") == "merged").count() == 5


# ------------------------------------------------------- incremental reads


def test_read_changes_append_only_is_exact_cdc(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, tmp_path / "t")
    a = lineitem.limit(10)
    t.append(a)                                     # v1
    v1 = t.snapshot().version
    t.append(lineitem.limit(30).subtract(a))        # v2
    t.compact()                                     # v3: rewrite, no logic
    t.append(lineitem.limit(35).subtract(lineitem.limit(30)))  # v4
    head = t.snapshot().version
    assert head == v1 + 3
    assert t.read_changes(0).count() == 35          # everything, no replay
    assert t.read_changes(v1).count() == 25         # v2 + v4 adds only
    assert t.read_changes(v1, v1 + 1).count() == 20 # just v2
    assert t.read_changes(v1 + 1, v1 + 2).count() == 0  # compact = no change
    assert t.read_changes(head, head).count() == 0  # empty cursor advance
    with pytest.raises(ValueError):
        t.read_changes(head + 1)


def test_read_changes_after_evolution_backfills(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.select("l_orderkey").limit(5))
    v1 = t.snapshot().version
    t.append(
        lineitem.select("l_orderkey").limit(2).withColumn("tag", F.lit("x")),
        merge_schema=True,
    )
    full = t.read_changes(0)
    assert full.columns == ["l_orderkey", "tag"]
    assert full.filter(F.col("tag").isNull()).count() == 5
    assert t.read_changes(v1).count() == 2


def test_where_on_evolved_column_stays_sound(spark, tmp_path, lineitem):
    """Data skipping on a post-evolution column: old files lack stats for
    it (conservative keep -> they survive pruning) and their backfilled
    nulls are then filtered exactly."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.select("l_orderkey").limit(10))
    t.append(
        lineitem.select("l_orderkey").limit(3).withColumn("v", F.lit(7)),
        merge_schema=True,
    )
    assert t.read(where=[("v", "=", 7)]).count() == 3
    assert t.read(where=[("v", ">", 7)]).count() == 0
    assert t.read().count() == 13


# ------------------------------------------------------ idempotent commits


def test_txn_append_is_idempotent(spark, tmp_path, lineitem):
    """Same (app, version) presented twice -> second append is a no-op
    (the foreachBatch-retry shape); a later version lands normally and
    per-app watermarks are independent."""
    t = ManagedTable.create(spark, tmp_path / "t")
    assert t.append(lineitem.limit(10), txn=("streamA", 0)) == 10
    assert t.append(lineitem.limit(10), txn=("streamA", 0)) == 0  # retry
    assert t.read().count() == 10
    assert t.append(lineitem.limit(5), txn=("streamA", 1)) == 5
    assert t.append(lineitem.limit(3), txn=("streamB", 0)) == 3  # other app
    assert t.read().count() == 18
    # stale epoch (lower than watermark) is also skipped
    assert t.append(lineitem.limit(7), txn=("streamA", 0)) == 0
    assert t.read().count() == 18


def test_txn_survives_interleaved_commits_and_rebase(spark, tmp_path, lineitem):
    """txn watermarks carry forward through non-txn commits and through the
    cross-process rebase path."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(4), txn=("s", 0))
    t.append(lineitem.limit(4))          # plain commit must not drop txns
    t.compact()
    assert t.snapshot().txns == {"s": 0}
    # stale-base txn commit racing an interleaved commit: rebase re-checks
    # the watermark against the new head and still skips the duplicate
    stale = t.snapshot()
    t.append(lineitem.limit(2), txn=("s", 1))
    new_files = t._write_files(lineitem.limit(9), None, None)
    assert (
        t._commit_files(stale, tuple(stale.files) + new_files, None, "append", txn=("s", 1))
        is False
    )
    assert t.read().count() == 10  # 4 + 4 + 2, duplicate epoch rejected


# ------------------------------------------------------------------ zorder


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    """cluster_col=[a, b] z-orders writes: file-level stats prune on EITHER
    column, and results stay exact. A single-column range cluster can only
    ever skip on its one column; z-order is the multi-dimension variant."""
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col=["x", "y"])
    # two independent dimensions: x ascending, y decorrelated via bit-mix
    data = spark.range(20_000).select(
        F.col("id").alias("x"),
        ((F.col("id") * 2654435761) % 20_000).alias("y"),
        (F.col("id") % 13).alias("payload"),
    ).repartition(16)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.append(data)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    m = t.snapshot()
    assert m.cluster_col == ["x", "y"]
    assert len(m.files) > 4, "need several files for pruning to be visible"

    for col in ("x", "y"):
        got = t.read(where=[(col, ">=", 100), (col, "<", 600)])
        assert len(got.inputFiles()) < len(m.files), f"no pruning on {col}"
        assert got.count() == 500
        assert sorted(r[col] for r in got.collect()) == list(range(100, 600))
    # point lookup on the second dimension also skips
    got = t.read(where=[("y", "=", 77)])
    assert len(got.inputFiles()) < len(m.files)
    assert got.count() == 1


def test_zorder_survives_compaction(spark, tmp_path):
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col=["x", "y"])
    for lo in (0, 5000, 10000):
        t.append(
            spark.range(lo, lo + 5000).select(
                F.col("id").alias("x"),
                ((F.col("id") * 2654435761) % 15_000).alias("y"),
            )
        )
    before = t.read().count()
    t.compact(max_files_per_partition=2)
    assert t.read().count() == before
    assert t.snapshot().cluster_col == ["x", "y"]
    got = t.read(where=[("x", "=", 7777)])
    assert got.count() == 1


def test_zorder_string_dimension_prunes(spark, tmp_path):
    """Z-ORDER over a (string, numeric) pair — the clustering keys an LLM
    corpus actually has (source host × time): order-preserving string
    cut points from a bounded sample give a codegen bucket ladder, and
    string min/max footer stats prune point lookups exactly like
    numerics."""
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col=["host", "seq"])
    df = spark.range(20_000).selectExpr(
        "concat('host-', lpad(cast(id % 64 as string), 3, '0')) AS host",
        "id AS seq",
        "id * 1.5 AS v",
    )
    t.append(df, cluster_partitions=16)
    m = t.snapshot()
    assert len(m.files) > 4
    got = t.read(where=[("host", "=", "host-031")])
    assert len(got.inputFiles()) < len(m.files)  # string-dim file skip
    assert got.count() == 20_000 // 64 + (1 if 31 < 20_000 % 64 else 0)
    got2 = t.read(where=[("seq", "=", 12_345)])
    assert len(got2.inputFiles()) < len(m.files)  # numeric dim still skips
    assert got2.count() == 1


def test_zorder_rejects_unorderable_columns(spark, tmp_path):
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col=["a", "b"])
    df = spark.range(5).selectExpr(
        "id AS a", "array(id) AS b"
    )
    with pytest.raises(ValueError, match="zorder"):
        t.append(df)


# ------------------------------------------------- review-fix regressions


def test_missing_latest_pointer_is_recovered(spark, tmp_path, lineitem):
    """A creator that died between linking version 0 and writing _LATEST
    must not brick the table: snapshot() probes from 0, and create()
    repairs the pointer."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(5))
    (t.root / "_log" / "_LATEST").unlink()  # simulate the crash window
    assert t.snapshot().total_rows == 5  # probe-from-zero fallback
    t2 = ManagedTable.create(spark, tmp_path / "t")  # repairs the pointer
    assert (t2.root / "_log" / "_LATEST").exists()
    assert t2.read().count() == 5


def test_rebase_tolerates_nullability_only_schema_variants(spark, tmp_path):
    """A plain append of a literal-built (non-nullable) frame must not read
    as a schema change: a stale-base commit racing it should rebase, not
    raise ConcurrentWriteError."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.range(10).select(F.col("id").alias("k")))  # non-nullable
    stale = t.snapshot()
    # interleaved append with a NULLABLE variant of the same logical schema
    nullable = spark.range(5).select(
        F.when(F.col("id") >= 0, F.col("id")).alias("k")
    )
    t.append(nullable)
    new_files = t._write_files(spark.range(3).select(F.col("id").alias("k")), None, None)
    t._commit_files(stale, tuple(stale.files) + new_files, None, "append")
    assert t.snapshot().total_rows == 18


def test_plain_append_does_not_drift_manifest_schema_text(spark, tmp_path):
    """Same-shape appends keep the table's canonical schema JSON verbatim;
    only a genuine widen updates it."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.range(4).select(F.when(F.col("id") >= 0, F.col("id")).alias("k")))
    canonical = t.snapshot().schema_json
    t.append(spark.range(2).select(F.col("id").alias("k")))  # non-nullable variant
    assert t.snapshot().schema_json == canonical
    t.append(
        spark.range(1).select(F.col("id").alias("k"), F.lit(1).alias("w")),
        merge_schema=True,
    )
    assert t.snapshot().schema_json != canonical  # widen DOES update


def test_read_changes_schema_pinned_to_to_version(spark, tmp_path, lineitem):
    """read_changes(from, to) returns to_version's shape even after later
    evolutions — a cursor consumer's downstream schema must not drift."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.select("l_orderkey").limit(4))
    v1 = t.snapshot().version
    t.append(lineitem.select("l_orderkey").limit(2))
    v2 = t.snapshot().version
    t.append(
        lineitem.select("l_orderkey").limit(1).withColumn("extra", F.lit(1)),
        merge_schema=True,
    )
    delta = t.read_changes(v1, v2)
    assert delta.columns == ["l_orderkey"]  # no post-hoc widening
    assert delta.count() == 2
    assert t.read_changes(v2).columns == ["l_orderkey", "extra"]


def test_concurrent_appends_with_live_compaction(spark, tmp_path):
    """The VERDICT-mandated shape: a compactor running BESIDE ingest.
    Subprocess appenders race in-process compaction cycles; every append
    must survive and compaction must converge without lost updates."""
    import subprocess
    import sys

    from pyspark.sql import types as T

    root = str(tmp_path / "t")
    t = ManagedTable.create(spark, root)
    schema = T.StructType(
        [T.StructField("writer", T.LongType()), T.StructField("seq", T.LongType())]
    )
    t.append_pylist([{"writer": -1, "seq": -1}], schema)

    n_procs, n_appends = 3, 5
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_SCRIPT, root, str(w), str(n_appends)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in range(n_procs)
    ]
    # compact continuously while the appenders run
    while any(p.poll() is None for p in procs):
        t.compact(max_files_per_partition=2)
    for p in procs:
        out, err = p.communicate(timeout=60)
        assert p.returncode == 0, err
    t.compact(max_files_per_partition=2)  # final converge
    m = t.snapshot()
    assert m.total_rows == 1 + n_procs * n_appends  # nothing lost
    assert t.read().count() == 1 + n_procs * n_appends
    assert len(m.files) <= 2  # compaction converged


def test_restore_rolls_back_as_new_commit(spark, tmp_path, lineitem):
    """RESTORE semantics: contents return to the old version, history is
    preserved (the rollback is itself a commit), and vacuuming the old
    files first makes restore fail loudly instead of losing data."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(10))
    v_good = t.snapshot().version
    t.overwrite(lineitem.limit(3))  # the "bad deploy"
    new_head = t.restore(v_good)
    assert t.read().count() == 10
    assert new_head == v_good + 2  # history preserved, not rewritten
    assert t.snapshot().op == f"restore_v{v_good}"
    assert t.read(version=v_good + 1).count() == 3  # bad version still readable
    # restore target destroyed by vacuum -> loud failure
    t.overwrite(lineitem.limit(2))
    t.vacuum(retention_seconds=0.0)  # drops the 10-row files (quiesced)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.restore(v_good)
    assert t.read().count() == 2  # table unharmed


# ------------------------------------------------- incremental action log


def _mini_schema():
    from pyspark.sql import types as T

    return T.StructType([T.StructField("k", T.LongType())])


def _commit_n(spark, root, n, start=0):
    """n tiny commits via the pyarrow fast path (full commit protocol,
    no Spark job per append)."""
    t = ManagedTable.create(spark, root)
    for i in range(start, start + n):
        t.append_pylist([{"k": i}], _mini_schema())
    return t


def test_commit_payload_is_o_of_files_touched(spark, tmp_path):
    """The log record of a commit lists only the files it touched — its
    size must NOT grow with the table (the pre-checkpoint design wrote the
    full file list per commit: O(total files) write amplification, the one
    real 100 TB scale-killer)."""
    import json

    t = _commit_n(spark, tmp_path / "t", 30)
    head = t.snapshot().version
    raw_small = json.loads((t.root / "_log" / "00000000000000000005.json").read_text())
    raw_big = json.loads((t.root / "_log" / f"{head:020d}.json").read_text())
    for raw in (raw_small, raw_big):
        assert "files" not in raw  # incremental action, not a full manifest
        assert len(raw["add"]) == 1 and raw["remove"] == []
    # 25 commits later the payload is the same shape and size class
    assert len(json.dumps(raw_big)) < 2 * len(json.dumps(raw_small))
    assert t.read().count() == 30  # and the reconstructed state is right


def test_snapshot_reads_checkpoint_plus_tail(spark, tmp_path):
    """A fresh reader of a long-history table parses one checkpoint plus
    at most _CKPT_EVERY action files — never the whole log."""
    from data_warehouse_copy_spark.sources import managed_table as mt

    t = _commit_n(spark, tmp_path / "t", 45)
    assert t._ckpt_path(20).exists() and t._ckpt_path(40).exists()
    mt._SNAP_CACHE.clear()  # simulate a brand-new process
    t2 = ManagedTable(spark, tmp_path / "t")
    m = t2.snapshot()
    assert m.version == 45 and m.total_rows == 45
    first_reads = t2._last_log_reads
    assert first_reads <= mt._CKPT_EVERY + 1
    # warm path: a repeat snapshot is a cache hit — no _reconstruct at all,
    # so the instrumentation counter is untouched
    assert t2.snapshot().version == 45
    assert t2._last_log_reads == first_reads


def test_snapshot_cache_survives_table_recreation(spark, tmp_path):
    """The per-process manifest cache must not serve state from a table
    that was deleted and recreated at the same root."""
    import shutil

    t = _commit_n(spark, tmp_path / "t", 3)
    assert t.snapshot().total_rows == 3  # cache primed at v3
    shutil.rmtree(tmp_path / "t")
    t2 = ManagedTable.create(spark, tmp_path / "t")
    assert t2.snapshot().total_rows == 0  # not the cached v3 state
    t2.append_pylist([{"k": 99}], _mini_schema())
    assert t2.snapshot().total_rows == 1


def test_legacy_full_manifest_log_still_reads(spark, tmp_path):
    """Tables written by the pre-action-log format (a full manifest per
    version) must keep working: snapshot, time travel, read_changes and
    history all accept full-state records anywhere in the chain."""
    import json

    from data_warehouse_copy_spark.sources import managed_table as mt

    t = _commit_n(spark, tmp_path / "t", 5)
    # Rewrite every version file as a legacy full-state manifest
    for v in range(6):
        m = t.snapshot(version=v)
        (t.root / "_log" / f"{v:020d}.json").write_text(
            json.dumps(mt._full_payload(m), indent=1)
        )
    for p in (t.root / "_log").glob("*.checkpoint.json"):
        p.unlink()
    mt._SNAP_CACHE.clear()
    t2 = ManagedTable(spark, tmp_path / "t")
    assert t2.snapshot().total_rows == 5
    assert t2.snapshot(version=2).total_rows == 2  # time travel
    assert t2.read_changes(2).count() == 3
    assert [h.total_rows for h in t2.history()] == [0, 1, 2, 3, 4, 5]
    # and a NEW action commit on top of the legacy chain replays cleanly
    t2.append_pylist([{"k": 100}], _mini_schema())
    mt._SNAP_CACHE.clear()
    assert ManagedTable(spark, tmp_path / "t").snapshot().total_rows == 6


def test_read_changes_skips_restore_replay(spark, tmp_path, lineitem):
    """A restore re-references files a cursor consumer already processed —
    CDC must not double-deliver them (same contract as the compact skip)."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(10))  # v1
    v1 = t.snapshot().version
    t.overwrite(lineitem.limit(4))  # v2: the "bad deploy"
    v2 = t.snapshot().version
    t.restore(v1)  # v3: rollback re-adds v1's files
    assert t.read_changes(v2).count() == 0  # restore commit replays nothing
    assert t.read_changes(v1).count() == 4  # just the overwrite's adds


def test_commit_fails_clearly_without_hardlinks(spark, tmp_path, monkeypatch):
    """On a filesystem without hard-link support the commit protocol cannot
    be atomic — the error must say so instead of an opaque OSError."""
    import errno
    import os as _os

    t = ManagedTable.create(spark, tmp_path / "t")

    def no_link(src, dst):
        raise OSError(errno.EPERM, "Operation not permitted")

    monkeypatch.setattr(_os, "link", no_link)
    with pytest.raises(OSError, match="hard-link support"):
        t.append_pylist([{"k": 1}], _mini_schema())

def test_timestamp_time_travel(spark, tmp_path, lineitem):
    """timestampAsOf semantics: each commit's own timestamp resolves to
    that commit, mid-gap timestamps resolve backward, pre-table timestamps
    error, and far-future timestamps read the head."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(10))
    t.append(lineitem.limit(20))
    t.overwrite(lineitem.limit(5))
    hist = t.history()
    counts = {0: 0, 1: 10, 2: 30, 3: 5}
    for info in hist:
        assert t.version_at(info.ts) == info.version
        assert t.read(timestamp=info.ts).count() == counts[info.version]
    # a timestamp strictly between v1 and v2 resolves to v1
    between = hist[1].ts + "x"  # sorts just after v1, before v2
    if between < hist[2].ts:
        assert t.version_at(between) == 1
    assert t.version_at("2999-01-01") == hist[-1].version
    assert t.read(timestamp="2999-01-01").count() == 5
    with pytest.raises(ValueError, match="predates"):
        t.version_at("1999-01-01")
    with pytest.raises(ValueError, match="not both"):
        t.snapshot(version=1, timestamp=hist[1].ts)
    # datetime objects are accepted too
    from datetime import datetime, timezone

    assert t.version_at(datetime(2999, 1, 1, tzinfo=timezone.utc)) == 3

def test_delete_where_removes_exact_rows_and_keeps_nulls(spark, tmp_path):
    """Predicate delete drops exactly the TRUE-predicate rows; rows whose
    predicate evaluates to NULL survive (SQL DELETE semantics)."""
    t = ManagedTable.create(spark, tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") % 7).alias("v"),
    )
    t.append(df)
    n = t.delete([("v", "=", 3)])
    expect_deleted = df.filter(F.col("v") == 3).count()
    assert n == expect_deleted > 0
    remaining = t.read()
    assert remaining.count() == 100 - expect_deleted
    assert remaining.filter(F.col("v") == 3).count() == 0
    # NULL-v rows all survive
    assert remaining.filter(F.col("v").isNull()).count() == 10
    assert t.snapshot().op == "delete"


def test_residual_expr_predicate_read_and_dml(spark, tmp_path):
    """The ``("", "expr", <sql>)`` residual conjunct (round-10): any
    Spark SQL boolean rides the same where-list through read / delete /
    update — exact row filtering, sargable siblings still prune, and a
    projection (``columns=``) auto-widens to the residual's referenced
    columns before selecting them away."""
    t = ManagedTable.create(spark, tmp_path / "t")
    df = spark.range(0, 200).selectExpr(
        "CAST(id AS int) k",
        "CONCAT('w', id % 13) tag",
        "CAST(id * 1.5 AS double) x",
    )
    t.append(df)
    # read: residual + sargable mix
    got = t.read(where=[("k", "<", 100), ("", "expr", "tag LIKE 'w1%'")])
    exp = df.filter("k < 100 AND tag LIKE 'w1%'")
    assert got.count() == exp.count() > 0
    # projection: columns=['x'] while the residual needs tag, k
    got = t.read(
        where=[("", "expr", "tag = 'w3' AND k < 50")], columns=["x"]
    )
    assert got.columns == ["x"]
    assert sorted(r.x for r in got.collect()) == sorted(
        r.x for r in df.filter("tag = 'w3' AND k < 50").select("x").collect()
    )
    # delete / update take the same form
    n = t.delete([("", "expr", "tag IN ('w0', 'w1') OR x > 270.0")])
    assert n == df.filter("tag IN ('w0', 'w1') OR x > 270.0").count()
    n = t.update([("", "expr", "length(tag) = 2 AND k % 2 = 1")], {"x": "x + 1000"})
    assert n > 0
    twin = (
        df.filter("NOT (tag IN ('w0', 'w1') OR x > 270.0)")
        .withColumn(
            "x",
            F.when(
                F.expr("length(tag) = 2 AND k % 2 = 1"), F.col("x") + 1000
            ).otherwise(F.col("x")),
        )
    )
    assert {(r.k, r.x) for r in t.read().collect()} == {
        (r.k, r.x) for r in twin.collect()
    }


def test_delete_prunes_untouched_files_by_stats(spark, tmp_path):
    """A delete keyed inside one append's key span must leave the other
    appends' files byte-identical (same paths in the manifest) — the
    copy-on-write rewrite is scoped by file stats, not the whole table."""
    t = ManagedTable.create(spark, tmp_path / "t")
    for lo in (0, 1000, 2000):
        t.append(spark.range(lo, lo + 500).select(F.col("id").alias("k")))
    before = {f.path for f in t.snapshot().files}
    n = t.delete([("k", ">=", 1100), ("k", "<", 1200)])
    assert n == 100
    after = {f.path for f in t.snapshot().files}
    # the 0-499 and 2000-2499 files are untouched; only the middle rewrote
    untouched = before & after
    assert len(untouched) >= 2
    assert t.read().count() == 1400
    assert t.read(where=[("k", ">=", 1100), ("k", "<", 1200)]).count() == 0


def test_delete_noop_paths(spark, tmp_path):
    """No stats-admissible file, or admissible files with no matching rows:
    both commit a delete_noop that keeps every file identical."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.range(0, 500).select(F.col("id").alias("k")))
    before = {f.path for f in t.snapshot().files}
    assert t.delete([("k", "=", 99999)]) == 0      # pruned by stats
    assert t.snapshot().op == "delete_noop"
    assert {f.path for f in t.snapshot().files} == before
    # stats admit the range but the rows don't exist (gap inside the span)
    t2 = ManagedTable.create(spark, tmp_path / "t2")
    t2.append(
        spark.range(0, 100).select((F.col("id") * 2).alias("k"))  # evens only
    )
    b2 = {f.path for f in t2.snapshot().files}
    assert t2.delete([("k", "=", 51)]) == 0
    assert {f.path for f in t2.snapshot().files} == b2
    with pytest.raises(ValueError, match="predicate"):
        t2.delete([])


def test_delete_is_time_travelable(spark, tmp_path, lineitem):
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(100))
    v = t.snapshot().version
    n = t.delete([("l_quantity", "<=", 10.0)])
    assert n > 0
    assert t.read(version=v).count() == 100
    assert t.read().count() == 100 - n


def test_update_where_sets_exact_rows(spark, tmp_path):
    t = ManagedTable.create(spark, tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") % 7).alias("v"),
        F.lit(1.0).alias("w"),
    )
    t.append(df)
    n = t.update([("v", "=", 3)], {"w": F.lit(9), "v": "v + 100"})
    expect = df.filter(F.col("v") == 3).count()
    assert n == expect > 0
    out = t.read()
    assert out.count() == 100  # UPDATE never changes cardinality
    assert out.filter(F.col("w") == 9.0).count() == expect
    assert out.filter(F.col("v") >= 100).count() == expect
    # NULL-predicate rows untouched; w cast to the column's double type
    assert out.filter(F.col("v").isNull() & (F.col("w") == 1.0)).count() == 10
    assert dict(out.dtypes)["w"] == "double"
    assert t.snapshot().op == "update"


def test_update_prunes_and_noops(spark, tmp_path):
    t = ManagedTable.create(spark, tmp_path / "t")
    for lo in (0, 1000, 2000):
        t.append(spark.range(lo, lo + 500).select(F.col("id").alias("k")))
    before = {f.path for f in t.snapshot().files}
    assert t.update([("k", "=", 99999)], {"k": F.lit(0)}) == 0
    assert t.snapshot().op == "update_noop"
    assert {f.path for f in t.snapshot().files} == before
    n = t.update([("k", ">=", 1100), ("k", "<", 1105)], {"k": "k + 100000"})
    assert n == 5
    assert len(before & {f.path for f in t.snapshot().files}) >= 2
    assert t.read().count() == 1500
    with pytest.raises(ValueError, match="unknown columns"):
        t.update([("k", "=", 1)], {"nope": F.lit(1)})
    with pytest.raises(ValueError, match="predicate"):
        t.update([], {"k": F.lit(1)})
    with pytest.raises(ValueError, match="assignment"):
        t.update([("k", "=", 1)], {})


def test_version_at_running_max_under_clock_skew(spark, tmp_path, monkeypatch, lineitem):
    """Concurrent writers can stamp commits with skewed wall clocks; the
    as-of key is the running-max EFFECTIVE timestamp written at commit, so
    a commit stamped in the past never lets time travel return data from
    commits effectively later than the requested instant."""
    import data_warehouse_copy_spark.sources.managed_table as mt

    stamps = iter([
        "2026-01-01T00:00:00.000000Z",  # v0 create
        "2026-01-01T00:00:05.000000Z",  # v1 append
        "2026-01-01T00:00:03.000000Z",  # v2 append (clock skewed back)
        "2026-01-01T00:00:06.000000Z",  # v3 append
    ])
    monkeypatch.setattr(mt, "_utcnow", lambda: next(stamps))
    t = ManagedTable.create(spark, tmp_path / "t")
    for n in (10, 20, 30):
        t.append(lineitem.limit(n))
    # v2's record carries ets = max(own ts, v1 ts) = v1's 00:00:05
    assert t._raw(2)["ets"] == "2026-01-01T00:00:05.000000Z"
    # at 00:00:04, v1 (effective 00:00:05) has NOT happened yet -> v0
    assert t.version_at("2026-01-01T00:00:04") == 0
    assert t.read(timestamp="2026-01-01T00:00:04").count() == 0
    # at 00:00:05, both v1 and v2 are effective -> rightmost is v2
    assert t.version_at("2026-01-01T00:00:05.000000Z") == 2
    assert t.read(timestamp="2026-01-01T00:00:05.000000Z").count() == 30
    assert t.version_at("2026-01-01T00:00:06.000000Z") == 3


def test_version_at_naive_datetime_is_utc(spark, tmp_path, lineitem):
    """A tz-naive datetime must be read as UTC (commit stamps are UTC);
    interpreting it in the host zone would skew travel by the UTC offset."""
    from datetime import datetime, timedelta, timezone

    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(lineitem.limit(5))
    hist = t.history()
    ts = datetime.strptime(hist[1].ts, "%Y-%m-%dT%H:%M:%S.%fZ")  # naive UTC
    assert t.version_at(ts) == 1
    aware = ts.replace(tzinfo=timezone.utc).astimezone(
        timezone(timedelta(hours=9))
    )
    assert t.version_at(aware) == 1  # same instant, any zone


def test_delete_and_update_on_partitioned_table(spark, tmp_path, lineitem):
    """DML on a day-partitioned table: rewritten rows keep their partition
    assignment, partitions without matches keep their exact files, and
    partition-level reads stay consistent afterwards."""
    t = ManagedTable.create(spark, tmp_path / "t", partition_date_col="l_shipdate")
    base = lineitem.filter(F.col("l_shipdate").between("1995-01-01", "1995-01-31"))
    t.append(base)
    n0 = base.count()
    jan5 = {f.path for f in t.snapshot().files if f.partition == "1995-01-05"}

    n_del = t.delete([("l_quantity", "<=", 5.0), ("l_shipdate", ">=", "1995-01-10")])
    expect_del = base.filter(
        (F.col("l_quantity") <= 5.0) & (F.col("l_shipdate") >= "1995-01-10")
    ).count()
    assert n_del == expect_del > 0
    assert t.read().count() == n0 - n_del
    m = t.snapshot()
    assert all(f.partition is not None for f in m.files)  # layout preserved
    # partitions the predicate cannot touch keep their exact files
    assert jan5 == {f.path for f in m.files if f.partition == "1995-01-05"}
    n_upd = t.update(
        [("l_quantity", ">=", 49.0)], {"l_extendedprice": "l_extendedprice * 2"}
    )
    assert n_upd > 0
    assert t.read().count() == n0 - n_del
    # partition pruning still works over the DML-rewritten layout
    one_day = t.read(partition_min="1995-01-05", partition_max="1995-01-05")
    expect_day = (
        base.filter(F.to_date("l_shipdate") == F.lit("1995-01-05").cast("date"))
        .count()
    )
    assert one_day.count() == expect_day  # Jan 5 predates the delete window


def test_files_df_and_detail_are_metadata_only(spark, tmp_path, lineitem):
    """Layout inspection: files_df/detail must reflect the manifest exactly
    (counts, partitions, clustering) and answer from metadata."""
    t = ManagedTable.create(spark, tmp_path / "t", partition_date_col="l_shipdate")
    base = lineitem.filter(F.col("l_shipdate").between("1995-01-01", "1995-01-10"))
    t.append(base)
    m = t.snapshot()
    fdf = t.files_df()
    rows = fdf.collect()
    assert len(rows) == len(m.files)
    assert sum(r.rows for r in rows) == base.count()
    assert {r.partition for r in rows} == {f.partition for f in m.files}
    # layout questions in plain SQL: rows per partition
    per_part = fdf.groupBy("partition").sum("rows").count()
    assert per_part == len({f.partition for f in m.files})
    d = t.detail()
    assert d["version"] == m.version and d["op"] == "append"
    assert d["total_rows"] == base.count()
    assert d["partition_date_col"] == "l_shipdate"
    assert d["n_files"] == len(m.files)
    # time travel applies to the inspection surface too
    t.overwrite(base.limit(5))
    assert t.files_df(version=m.version).count() == len(m.files)


def test_read_changes_over_dml_commits(spark, tmp_path):
    """Documented CDC semantics over the DML triad: delete/update commits
    are rewrite commits, so their added files replay the SURVIVING rows
    (an over-approximation — every new row IS included), and a noop DML
    commit contributes nothing to the cursor."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.range(0, 100).select(F.col("id").alias("k")))  # v1
    t.delete([("k", ">=", 90)])                                   # v2
    t.update([("k", "<", 5)], {"k": "k + 1000"})                  # v3
    t.delete([("k", "=", 424242)])                                # v4 noop
    hist = {h.version: h for h in t.history()}
    ch = t.read_changes(1)
    # the cursor sees exactly the rows the DML rewrites re-added
    assert ch.count() == hist[2].rows_added + hist[3].rows_added
    if len(t.snapshot(1).files) > 1:
        # multi-file layout: stats pruning keeps the rewrites FILE-scoped,
        # so the replay is far smaller than a whole-table rewrite's
        assert ch.count() < 100
    # every row the update changed is visible to the cursor
    assert ch.filter(F.col("k") >= 1000).count() == 5
    # the noop contributed nothing
    assert t.read_changes(3).count() == 0
    # full-history cursor = the original append plus both rewrites
    assert (
        t.read_changes(0).count()
        == 100 + hist[2].rows_added + hist[3].rows_added
    )


class TestRecluster:
    """recluster(): OPTIMIZE ZORDER BY — re-layout under a new clustering
    spec as one commit whose spec change rides the action log."""

    def _mk(self, spark, root):
        t = ManagedTable.create(spark, root)  # unclustered ingest order
        df = spark.range(4000).selectExpr(
            "id AS k", "CAST(id % 50 AS long) AS cat", "id * 2 AS v"
        )
        for i in range(4):  # arrival-order files: k interleaves everywhere
            t.append(df.filter(F.col("k") % 4 == i).coalesce(1))
        return t

    def test_recluster_enables_skip_reads_and_preserves_rows(
        self, spark, tmp_path
    ):
        t = self._mk(spark, tmp_path / "t")
        before = sorted(map(tuple, t.read().collect()))
        # pre-recluster: a k-range read must open every file
        assert len(t.read(where=[("k", "<", 100)]).inputFiles()) == 4
        nb, na = t.recluster("k", target_files=4)
        assert nb == 4 and na >= 2
        m = t.snapshot()
        assert m.cluster_col == "k" and m.op == "recluster"
        assert sorted(map(tuple, t.read().collect())) == before
        # post-recluster: tight disjoint k spans -> pruned read
        assert len(t.read(where=[("k", "<", 100)]).inputFiles()) < na

    def test_spec_change_survives_log_replay(self, spark, tmp_path):
        from data_warehouse_copy_spark.sources.managed_table import (
            _SNAP_CACHE,
            _SNAP_CACHE_GUARD,
        )

        t = self._mk(spark, tmp_path / "t")
        t.recluster(["k", "cat"])  # Z-ORDER spec
        with _SNAP_CACHE_GUARD:
            _SNAP_CACHE.clear()
        m = ManagedTable(spark, tmp_path / "t").snapshot()
        assert m.cluster_col == ["k", "cat"]
        # future writes follow the new spec: appended file carries stats
        # for both z-order columns
        t.append(
            spark.range(9000, 9100).selectExpr(
                "id AS k", "CAST(id % 50 AS long) AS cat", "id * 2 AS v"
            )
        )
        assert ManagedTable(spark, tmp_path / "t").snapshot().cluster_col == [
            "k",
            "cat",
        ]

    def test_decluster_and_dv_folding(self, spark, tmp_path):
        t = self._mk(spark, tmp_path / "t")
        t.recluster("k", target_files=4)
        t.delete(where=[("k", "=", 7)])  # DV on the clustered layout
        assert t.count() == 3999
        nb, na = t.recluster(None, target_files=2)
        m = t.snapshot()
        assert m.cluster_col is None
        assert t.count() == 3999  # DVs folded into the rewrite
        assert all(not f.dv_rows for f in m.files)
        assert t.read().filter("k = 7").count() == 0


class TestReclusterIncremental:
    """Batched resumable OPTIMIZE (recluster_incremental): per-batch
    commits, mid-run interruption + resume, concurrent appends that must
    rebase instead of conflict-aborting, and CDC silence."""

    def _mk(self, spark, root, files=6, rows=1200):
        t = ManagedTable.create(spark, root)
        base = spark.range(0, rows).selectExpr("id AS k", "id % 7 AS v")
        for i in range(files):  # arrival-order files: k interleaves across all
            t.append(base.filter(F.col("k") % files == i).coalesce(1))
        return t

    def test_batches_commit_and_converge(self, spark, tmp_path):
        t = self._mk(spark, tmp_path / "t")
        before = sorted(map(tuple, t.read().collect()))
        res = t.recluster_incremental("k", batch_files=2, target_files=2)
        assert res["remaining"] == 0 and res["batches"] == 3
        m = t.snapshot()
        assert m.cluster_col == "k" and m.op == "recluster_batch"
        assert sorted(map(tuple, t.read().collect())) == before
        # point lookup prunes to <= one file per batch
        assert len(t.read(where=[("k", "=", 123)]).inputFiles()) <= 3

    def test_interrupt_and_resume(self, spark, tmp_path):
        t = self._mk(spark, tmp_path / "t")
        before = sorted(map(tuple, t.read().collect()))
        r1 = t.recluster_incremental("k", batch_files=2, max_batches=1)
        assert r1["batches"] == 1 and r1["remaining"] == 4
        # "crash" here: table is live and exact mid-run
        assert sorted(map(tuple, t.read().collect())) == before
        assert t.snapshot().cluster_col == "k"  # spec landed on batch 1
        r2 = t.recluster_incremental("k", batch_files=2)
        assert r2["remaining"] == 0
        assert r1["files_rewritten"] + r2["files_rewritten"] == 6
        assert sorted(map(tuple, t.read().collect())) == before

    def test_concurrent_append_rebases_not_aborts(self, spark, tmp_path):
        t = self._mk(spark, tmp_path / "t")
        t.recluster_incremental("k", batch_files=2, max_batches=1)
        # a writer lands BETWEEN batches (and during: disjoint files)
        t.append(
            spark.range(10_000, 10_050).selectExpr("id AS k", "id % 7 AS v")
        )
        res = t.recluster_incremental("k", batch_files=2)
        assert res["remaining"] == 0
        assert t.read().count() == 1200 + 50  # nothing lost, nothing doubled
        assert t.read().filter("k >= 10000").count() == 50

    def test_dv_rows_fold_away(self, spark, tmp_path):
        t = self._mk(spark, tmp_path / "t")
        t.delete(where=[("k", "<", 100)])
        t.recluster_incremental("k", batch_files=3)
        m = t.snapshot()
        assert all(not f.dv_paths for f in m.files if "recluster" not in f.path)
        assert t.read().count() == 1100
        assert t.read().filter("k < 100").count() == 0

    def test_recluster_is_cdc_silent(self, spark, tmp_path):
        t = self._mk(spark, tmp_path / "t", files=2, rows=100)
        v = t.snapshot().version
        t.recluster_incremental("k", batch_files=1)
        assert t.read_cdf(v).count() == 0  # byte motion is not change
        assert t.read_changes(v).count() == 0


# ------------------------------------------------- auto-compaction (r7 item 3)


def test_auto_compact_bounds_append_loop(spark, tmp_path):
    """20 native appends with the policy on: live file count stays
    bounded, rows exactly once, compact commits CDC-silent."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.set_auto_compact(max_files_per_partition=4)
    for i in range(20):
        t.append(spark.createDataFrame([(i, i * 10)], "k long, v long"))
    m = t.snapshot()
    assert t.count() == 20
    assert len(m.files) <= 5  # never drifts past threshold+1
    # the policy actually ran (history holds compact commits)
    ops = [ci.op for ci in t.history()]
    assert "compact" in ops
    # CDC silence: the cursor sees each row exactly once despite the
    # rewrites (compact adds are skipped by _cdc_skip)
    feed = t.read_changes(0).collect()
    assert sorted(r.k for r in feed) == list(range(20))


def test_auto_compact_clustered_resorts_and_partitioned_scopes(
    spark, tmp_path
):
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col="k")
    t.set_auto_compact(max_files_per_partition=2)
    import random

    ks = list(range(12))
    random.Random(7).shuffle(ks)
    for k in ks:
        t.append(spark.createDataFrame([(k, k)], "k long, v long"))
    m = t.snapshot()
    assert len(m.files) <= 3
    # the merged file is re-sorted on the cluster column
    import pyarrow.parquet as pq

    biggest = max(m.files, key=lambda f: f.rows)
    vals = pq.read_table(t.root / biggest.path, columns=["k"])["k"].to_pylist()
    assert vals == sorted(vals)
    assert t.read().count() == 12

    # partitioned: merging stays per-partition (files stay partition-pure)
    p = ManagedTable.create(spark, tmp_path / "p", partition_date_col="d")
    p.set_auto_compact(max_files_per_partition=2)
    for i in range(6):
        p.append(
            spark.sql(
                f"SELECT DATE'2024-01-0{i % 2 + 1}' AS d, {i} AS v"
            )
        )
    mp = p.snapshot()
    assert all(f.partition in ("2024-01-01", "2024-01-02") for f in mp.files)
    per = {}
    for f in mp.files:
        per[f.partition] = per.get(f.partition, 0) + 1
    assert all(n <= 3 for n in per.values())
    assert p.read(partitions={"2024-01-01"}).count() == 3


def test_auto_compact_zorder_merge_keeps_pruning(spark, tmp_path):
    """Round-10 (verdict item 6): a policy pass on a 2-col z-ordered
    table keeps selective reads cheap. The merged file is z-interleave
    sorted and written with bounded row groups, so footer min/max
    admits only a small fraction of its row groups for a point/range
    predicate on EITHER dimension — the same stats Spark's pushed
    parquet filters and the declarative reader's _matching_row_groups
    skip on. (File-level stats necessarily widen to the batch span —
    the merge IS one byte-capped file; the curve lives in the groups.)
    This pins the SESSION-LESS pyarrow merge — the declarative-hook
    path; the native session path merges through _write_files' own
    _zorder_column sort (pinned by the native-merge test below and
    test_zorder_prunes_on_both_columns)."""
    import pyarrow.parquet as pq

    from data_warehouse_copy_spark.sources.managed_table import (
        _file_may_match,
    )

    t = ManagedTable.create(spark, tmp_path / "t", cluster_col=["x", "y"])
    for lo in range(0, 20_000, 4_000):  # five 4k-row appends, no policy yet
        t.append(
            spark.range(lo, lo + 4_000).select(
                F.col("id").alias("x"),
                ((F.col("id") * 2654435761) % 20_000).alias("y"),
            )
        )
    t.set_auto_compact(max_files_per_partition=2, max_merge_files=8)
    # run the pass through a SESSION-LESS handle: the pyarrow merge path
    assert ManagedTable(None, tmp_path / "t").maybe_auto_compact() > 0
    m = t.snapshot()
    assert t.read().count() == 20_000
    merged = [f for f in m.files if f.path.startswith("data/ac-")]
    assert merged, "the policy must have produced a merged file"
    big = max(merged, key=lambda f: f.rows)
    md = pq.ParquetFile(t.root / big.path).metadata
    assert md.num_row_groups >= 8  # bounded groups, not one blob
    # per-dimension row-group admission: a selective predicate admits
    # only a small fraction of groups on EITHER z dimension
    for col, pred in (("x", ("x", "=", 7_777)), ("y", ("y", "=", 77))):
        ci = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == col
        )
        admitted = 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            stats = {col: [st.min, st.max]}
            if _file_may_match(stats, *pred):
                admitted += 1
        assert admitted <= max(2, md.num_row_groups // 4), (
            f"z-merge lost {col}-dimension locality: "
            f"{admitted}/{md.num_row_groups} groups admit {pred}"
        )
    # and results stay exact through the merged layout
    got = t.read(where=[("x", ">=", 100), ("x", "<", 600)])
    assert sorted(r.x for r in got.collect()) == list(range(100, 600))
    assert t.read(where=[("y", "=", 77)]).count() == 1


def test_auto_compact_native_spark_merge_lifts_byte_ceiling(
    spark, tmp_path
):
    """Round-10 (verdict item 3): with a SparkSession available (the
    native append path) the policy merges EXECUTOR-SIDE — selection is
    the same _select_small_batch, but the driver byte budget is lifted
    and the output splits into ceil(input_bytes / max_file_bytes)
    right-sized files. The session-less pyarrow path keeps the byte
    cap. Same commit op (compact → CDC-silent), cluster order kept."""
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col="k")
    # several small files whose TOTAL far exceeds the policy byte bar
    for lo in range(0, 8_000, 1_000):
        t.append(
            spark.range(lo, lo + 1_000).selectExpr("id AS k", "id*2 AS v")
        )
    sizes = [(t.root / f.path).stat().st_size for f in t.snapshot().files]
    bar = int(sum(sizes) / 3)  # all files small; total needs ~3 outputs
    assert all(sz < bar for sz in sizes)
    t.set_auto_compact(
        max_files_per_partition=2, max_merge_files=64, max_file_bytes=bar
    )
    v0 = t._head_version()
    assert t.maybe_auto_compact() > 0
    assert t._raw(t._head_version())["op"] == "compact"  # CDC-silent op
    m = t.snapshot()
    assert t.read().count() == 8_000
    # the byte ceiling did NOT limit the batch: all 8 inputs merged in
    # ONE pass into ~3 right-sized files (the pyarrow path would have
    # stopped at the first byte-budget batch)
    assert len(m.files) <= 4
    # outputs carry disjoint cluster spans (range-partitioned write):
    # a selective read skips files
    got = t.read(where=[("k", "=", 7_777)])
    assert len(got.inputFiles()) < len(m.files)
    assert got.count() == 1
    # rows inside each merged file stay cluster-sorted
    import pyarrow.parquet as pq

    big = max(m.files, key=lambda f: f.rows)
    vals = pq.read_table(t.root / big.path, columns=["k"])["k"].to_pylist()
    assert vals == sorted(vals)
    # CDC consumers stay silent through the merge: the change feed over
    # the compact commit delivers nothing
    assert t.read_cdf(v0, t._head_version()).count() == 0


def test_auto_compact_folds_dv_files_and_respects_clear(spark, tmp_path):
    """Round-9 (verdict item 5): the policy FOLDS deletion vectors —
    a DV'd small file merges with its deleted positions dropped, so a
    deletes-heavy streaming table stays file-bounded under the policy
    alone (round 8 left DV'd files to scheduled compact())."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.range(10).selectExpr("id AS k", "id AS v").coalesce(1))
    t.delete([("k", "=", 3)])  # grows a DV on the single 10-row file
    t.set_auto_compact(max_files_per_partition=1)
    dv_file = next(f.path for f in t.snapshot().files if f.dv_rows)
    for i in range(3):
        t.append(spark.createDataFrame([(100 + i, 0)], "k long, v long"))
    m = t.snapshot()
    # the DV'd file was merged away and its tombstoned row dropped for
    # real: no surviving entry carries a DV, values are exact
    assert dv_file not in {f.path for f in m.files}
    assert all(not f.dv_paths for f in m.files)
    assert t.count() == 12
    got = {r.k for r in t.read().collect()}
    assert got == (set(range(10)) - {3}) | {100, 101, 102}
    t.clear_auto_compact()
    assert t.auto_compact_policy() is None
    n = len(t.snapshot().files)
    t.append(spark.createDataFrame([(200, 0)], "k long, v long"))
    assert len(t.snapshot().files) == n + 1  # policy off: no merging


def test_auto_compact_byte_gate_never_recopies_large_files(spark, tmp_path):
    """Round-9 (advisor finding): the policy gates on BYTES, not just
    count — files at/above ``max_file_bytes`` are never selected (they
    are IO-efficient already; re-copying them moves arbitrary bytes
    through driver memory), and a merge batch's total input bytes stay
    within the budget."""
    t = ManagedTable.create(spark, tmp_path / "t")
    # one "large" file (10k rows) and a burst of tiny ones
    t.append(spark.range(10_000).selectExpr("id AS k", "id AS v").coalesce(1))
    big = t.snapshot().files[0].path
    big_sz = (t.root / big).stat().st_size
    # smallness bar below the big file's size: it must never merge
    t.set_auto_compact(max_files_per_partition=2, max_file_bytes=big_sz)
    for i in range(6):
        t.append(spark.createDataFrame([(100_000 + i, 0)], "k long, v long"))
    m = t.snapshot()
    assert big in {f.path for f in m.files}  # large file untouched
    assert len(m.files) <= 3  # tiny files merged
    assert t.count() == 10_006

    # byte budget caps a batch ON THE SESSION-LESS (pyarrow) path —
    # that budget encodes DRIVER memory; the native Spark path lifts it
    # (round-10 item 3, pinned in the native-merge test): two files
    # whose sum exceeds the budget still merge (progress floor of 2), a
    # third stays for the next pass
    b = ManagedTable.create(spark, tmp_path / "b")
    b.append(spark.range(500).selectExpr("id AS k", "id AS v").coalesce(1))
    sz = (b.root / b.snapshot().files[0].path).stat().st_size
    b.append(spark.range(500, 1000).selectExpr("id AS k", "id AS v").coalesce(1))
    b.append(spark.range(1000, 1500).selectExpr("id AS k", "id AS v").coalesce(1))
    b.set_auto_compact(max_files_per_partition=1, max_file_bytes=sz + sz // 2)
    ManagedTable(None, b.root).maybe_auto_compact()
    m2 = b.snapshot()
    # 3 files -> exactly one merge of the 2-file progress batch
    assert len(m2.files) == 2
    assert b.count() == 1500


def test_auto_compact_rebuilds_bloom_sidecar(spark, tmp_path):
    """Round-9 (verdict item 5): the merged file's bloom sidecar is
    rebuilt, so point-lookup pruning survives an auto-compact pass."""
    t = ManagedTable.create(spark, tmp_path / "t", bloom_cols=["k"])
    t.set_auto_compact(max_files_per_partition=2)
    for i in range(6):
        t.append(
            spark.createDataFrame([(i * 1000, i)], "k long, v long")
        )
    m = t.snapshot()
    assert len(m.files) <= 3
    merged = max(m.files, key=lambda f: f.rows)
    assert merged.rows >= 4  # a real merge happened
    assert merged.bloom_path is not None  # sidecar rebuilt for the merge
    # bloom pruning still prunes: a key no file holds reads zero files
    from data_warehouse_copy_spark.sources.bloom import bloom_prune

    survivors = bloom_prune(t.root, list(m.files), [("k", "=", 123456789)])
    assert len(survivors) < len(m.files)
    # and a held key still reads its row
    assert t.read(where=[("k", "=", 3000)]).count() == 1


def test_auto_compact_swallows_unexpected_errors(spark, tmp_path, monkeypatch):
    """Round-9 (advisor finding): the post-commit hook is best-effort BY
    CONTRACT — an unexpected exception (cross-process vacuum race,
    arrow error) must never propagate out of a durably-committed
    append."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.set_auto_compact(max_files_per_partition=1)

    def boom(policy, touched_partitions=None):
        raise OSError("simulated cross-process vacuum race")

    monkeypatch.setattr(t, "_auto_compact_once", boom)
    # the ingest must report success: its commit is already durable
    assert t.append(spark.createDataFrame([(1, 1)], "k long, v long")) == 1
    assert t.count() == 1


def test_auto_compact_bounded_past_planning_gate(spark, tmp_path, monkeypatch):
    """Round-9 (verdict item 2): PAST the distributed-planning gate the
    policy keeps running — scoped to the partitions the triggering
    commit touched, planned from a filtered checkpoint stream, committed
    through the bounded diff path — so a 50k+-file streaming table
    (exactly the small-file victim at 100 TB) stays file-bounded. Here
    the gate is forced down so a small table takes that exact path."""
    import data_warehouse_copy_spark.sources.managed_table as mt

    t = ManagedTable.create(spark, tmp_path / "t", partition_date_col="d")
    for i in range(3):
        t.append(spark.sql(f"SELECT DATE'2024-01-01' AS d, {i} AS v"))
    t.append(spark.sql("SELECT DATE'2024-02-02' AS d, 99 AS v"))
    t._write_checkpoint(t.snapshot())
    monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
    assert t._past_planning_gate()  # every commit below is bounded-path
    t.set_auto_compact(max_files_per_partition=2)
    for i in range(10, 22):
        t.append(spark.sql(f"SELECT DATE'2024-01-01' AS d, {i} AS v"))
    # the ingested partition stays bounded; the untouched one is intact
    per: dict = {}
    for r in t.manifest_df().collect():
        per[r["partition"]] = per.get(r["partition"], 0) + 1
    assert per["2024-01-01"] <= 4
    assert per["2024-02-02"] == 1
    # a "compact" action landed through the bounded diff path
    raws = [t._raw(v) for v in range(1, t._head_version() + 1)]
    compacts = [r for r in raws if r.get("op") == "compact"]
    assert compacts and all("files" not in r for r in compacts)
    # values exact after the bounded merges
    got = sorted(r.v for r in t.read().collect())
    assert got == sorted(list(range(3)) + [99] + list(range(10, 22)))
    # DV folding holds on the bounded path too: tombstone a row in a
    # small file, ingest more — the merge drops the position for real
    assert t.delete([("v", "=", 11)]) == 1
    for i in range(30, 34):
        t.append(spark.sql(f"SELECT DATE'2024-01-01' AS d, {i} AS v"))
    assert sorted(r.v for r in t.read().collect()) == sorted(
        list(range(3)) + [99] + [v for v in range(10, 22) if v != 11]
        + list(range(30, 34))
    )
    per2: dict = {}
    for r in t.manifest_df().collect():
        per2[r["partition"]] = per2.get(r["partition"], 0) + 1
    assert per2["2024-01-01"] <= 4


def test_copy_into_idempotent_incremental_and_forced(spark, tmp_path):
    """COPY INTO (round-9 forward surface): file-level idempotent bulk
    ingestion — only never-loaded files load, the ledger rides the data
    commit itself (exactly-once across retries), new files load
    incrementally, FORCE reloads."""
    src = tmp_path / "landing"
    src.mkdir()
    spark.range(10).selectExpr("id AS k", "id*2 AS v").coalesce(1)\
        .write.parquet(str(src / "batch1"))
    spark.range(10, 15).selectExpr("id AS k", "id*2 AS v").coalesce(1)\
        .write.parquet(str(src / "batch2"))
    t = ManagedTable.create(spark, tmp_path / "t")
    files, rows = t.copy_into(src)
    assert files >= 2 and rows == 15
    assert t.count() == 15
    # idempotent: nothing new -> no commit, zero rows
    v = t.snapshot().version
    assert t.copy_into(src) == (0, 0)
    assert t.snapshot().version == v
    # incremental: only the new file loads
    spark.range(15, 18).selectExpr("id AS k", "id*2 AS v").coalesce(1)\
        .write.parquet(str(src / "batch3"))
    files, rows = t.copy_into(src)
    assert rows == 3 and t.count() == 18
    assert sorted(r.k for r in t.read().collect()) == list(range(18))
    # the ledger survives a lost cache (folds from the action log)
    import shutil

    shutil.rmtree(t.root / "_copy_history", ignore_errors=True)
    assert t.copy_into(src) == (0, 0)
    # FORCE reloads regardless of the ledger
    files, rows = t.copy_into(src, force=True)
    assert rows == 18 and t.count() == 36
    # unsupported formats raise loudly, never guess a parser
    with pytest.raises(ValueError, match="PARQUET"):
        t.copy_into(src, fileformat="csv")


def test_copy_into_single_file_and_sql_surface(spark, tmp_path):
    """The SQL form: COPY INTO db.t FROM '<path>' — parsed, dispatched,
    idempotent; PATTERN narrows the listing; a single-file source works."""
    from data_warehouse_copy_spark.sources.names import NamedCatalog

    src = tmp_path / "landing"
    src.mkdir()
    spark.range(7).selectExpr("id AS k", "id AS v").coalesce(1)\
        .write.parquet(str(src / "a"))
    one = next((src / "a").glob("*.parquet"))
    t = ManagedTable.create(spark, tmp_path / "t")
    assert t.copy_into(one)[1] == 7  # single-file source
    c = NamedCatalog(tmp_path / "cat.json")
    c.register("db.t", tmp_path / "t")
    r = c.sql(spark, f"COPY INTO db.t FROM '{src}'").first()
    assert r.operation == "COPY INTO"
    assert r.rows_affected == 0  # the file was already loaded directly
    spark.range(7, 9).selectExpr("id AS k", "id AS v").coalesce(1)\
        .write.parquet(str(src / "b"))
    r = c.sql(spark, f"COPY INTO db.t FROM '{src}'").first()
    assert r.rows_affected == 2
    r = c.sql(
        spark,
        f"COPY INTO db.t FROM '{src}' FILEFORMAT = PARQUET "
        f"PATTERN = '*.parquet' FORCE = TRUE",
    ).first()
    assert r.rows_affected == 9  # force reloads everything matched
    assert t.count() == 18
    from data_warehouse_copy_spark.sources.sql_dml import SqlDmlError

    with pytest.raises(SqlDmlError, match="FORCE takes"):
        c.sql(spark, f"COPY INTO db.t FROM '{src}' FORCE = MAYBE")
    # round-10 advice fix: a repeated option is a loud error, never a
    # silent last-wins (masks a typo'd second PATTERN)
    with pytest.raises(SqlDmlError, match="duplicate COPY INTO option"):
        c.sql(
            spark,
            f"COPY INTO db.t FROM '{src}' PATTERN = 'a' PATTERN = 'b'",
        )


def test_copy_into_watermark_blocks_double_load(spark, tmp_path):
    """Round-10 (verdict item 4): the read-ledger → commit window. A
    loader that folded the ledger BEFORE a racer's load landed must not
    commit the same source files again — the commit loop re-checks
    copy_sources against every commit past the ledger watermark and
    raises CopySourcesConflict; copy_into's retry then converges to a
    no-op."""
    from data_warehouse_copy_spark.sources.managed_table import (
        CopySourcesConflict,
    )

    src = tmp_path / "landing"
    src.mkdir()
    spark.range(12).selectExpr("id AS k", "id*2 AS v").coalesce(1)\
        .write.parquet(str(src / "a"))
    t = ManagedTable.create(spark, tmp_path / "t")
    candidates = sorted(str(p.resolve()) for p in src.rglob("*.parquet"))
    # loader B folds the (empty) ledger...
    watermark = t._head_version()
    assert t.copied_sources(watermark) == set()
    # ...then loader A lands the full load first
    t2 = ManagedTable(spark, tmp_path / "t")
    assert t2.copy_into(src)[1] == 12
    # B's commit with the stale watermark must refuse to double-load
    df = spark.read.parquet(*candidates)
    with pytest.raises(CopySourcesConflict, match="already loaded"):
        t.append(df, copy_sources=candidates, copy_ledger_version=watermark)
    assert t.count() == 12  # nothing landed twice
    # and the public retry loop converges to a clean no-op
    assert t.copy_into(src) == (0, 0)
    assert t.count() == 12
    # FORCE stays a deliberate reload (no watermark, no conflict)
    assert t.copy_into(src, force=True)[1] == 12
    assert t.count() == 24


def _copy_into_race_worker(args):
    """Top-level (picklable, spawn-safe) cross-PROCESS COPY INTO racer:
    each process builds its OWN SparkSession (spawn, never fork — a
    forked child would inherit the parent's JVM sockets) and races
    copy_into over the same landing dir. A latch-file rendezvous makes
    both loaders fold the ledger before either commit lands."""
    import time as _time
    from pathlib import Path as _Path

    root, src, latch_dir, wid, n_workers = args
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"copy-race-{wid}")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        from data_warehouse_copy_spark.sources.managed_table import (
            ManagedTable,
        )

        t = ManagedTable(spark, root)
        # rendezvous: session is up AND the ledger is folded empty
        pre = t.copied_sources()
        (_Path(latch_dir) / f"ready{wid}").write_text("1")
        deadline = _time.monotonic() + 120
        while len(list(_Path(latch_dir).glob("ready*"))) < n_workers:
            if _time.monotonic() > deadline:
                raise TimeoutError("rendezvous timed out")
            _time.sleep(0.05)
        files, rows = t.copy_into(src)
        return (len(pre), files, rows)
    finally:
        spark.stop()


def test_copy_into_cross_process_two_loader_storm(spark, tmp_path):
    """Round-10 (verdict item 4 done-bar): a cross-process two-loader
    storm where every source file lands exactly once. The per-root
    append lock is process-local, so cross-process loaders genuinely
    race the commit protocol itself — the loser's rebase (or its
    first-attempt watermark scan) must detect the winner's
    copy_sources and retry down to the remainder."""
    import multiprocessing as mp

    src = tmp_path / "landing"
    src.mkdir()
    for i in range(3):
        spark.range(i * 5, i * 5 + 5).selectExpr(
            "id AS k", "id*2 AS v"
        ).coalesce(1).write.parquet(str(src / f"b{i}"))
    ManagedTable.create(spark, tmp_path / "t")
    latch = tmp_path / "latch"
    latch.mkdir()
    jobs = [
        (str(tmp_path / "t"), str(src), str(latch), w, 2) for w in range(2)
    ]
    with mp.get_context("spawn").Pool(2) as pool:
        results = pool.map(_copy_into_race_worker, jobs)
    assert all(pre == 0 for pre, _f, _r in results)  # both folded empty
    assert sum(r for _p, _f, r in results) == 15  # rows exactly once
    check = ManagedTable(spark, tmp_path / "t")
    assert check.count() == 15
    assert sorted(r.k for r in check.read().collect()) == list(range(15))
    assert len(check.copied_sources()) == 3
    # idempotent after the storm
    assert check.copy_into(src) == (0, 0)


def test_copy_into_threaded_loader_storm_exactly_once(spark, tmp_path):
    """Two racing loaders (separate handles, real threads — the ledger
    fold happens OUTSIDE append's per-root lock, so the window is
    genuinely exercised) over the same landing dir: every source file
    lands exactly once, whichever loader wins each commit."""
    src = tmp_path / "landing"
    src.mkdir()
    for i in range(4):
        spark.range(i * 10, i * 10 + 10).selectExpr(
            "id AS k", "id*2 AS v"
        ).coalesce(1).write.parquet(str(src / f"b{i}"))
    ManagedTable.create(spark, tmp_path / "t")
    results, errors = [], []
    barrier = threading.Barrier(3)

    def loader():
        try:
            barrier.wait(timeout=60)
            t = ManagedTable(spark, tmp_path / "t")
            results.append(t.copy_into(src))
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    threads = [threading.Thread(target=loader) for _ in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors
    check = ManagedTable(spark, tmp_path / "t")
    assert sum(r[1] for r in results) == 40  # rows landed exactly once
    assert check.count() == 40
    assert sorted(r.k for r in check.read().collect()) == list(range(40))
    # the folded ledger holds each source file exactly once
    assert len(check.copied_sources()) == 4


def test_auto_compact_past_gate_stops_checkpoint_scan_early(
    spark, tmp_path, monkeypatch
):
    """Round-10 advice fix: the past-gate planner stops STREAMING the
    checkpoint once the stat budget is spent or the trigger fired with a
    full merge batch — a huge checkpoint must not pay full-scan IO per
    partition per trigger."""
    import data_warehouse_copy_spark.sources.managed_table as mt

    t = ManagedTable.create(spark, tmp_path / "t", partition_date_col="d")
    for i in range(40):  # 40 tiny live files, one partition
        t.append(spark.sql(f"SELECT DATE'2024-01-01' AS d, {i} AS v"))
    t._write_checkpoint(t.snapshot())
    policy = {
        "max_files_per_partition": 2,
        "max_file_bytes": 128 << 20,
        "max_merge_files": 2,
    }
    real_pf = mt.pq.ParquetFile
    seen = {"rows": 0}

    class CountingPF:
        def __init__(self, *a, **k):
            self._pf = real_pf(*a, **k)

        def __getattr__(self, name):
            return getattr(self._pf, name)

        def iter_batches(self, batch_size=65536, columns=None):
            # force 1-row batches so the break-out is observable at
            # test scale, and count what the planner actually consumed
            for bt in self._pf.iter_batches(batch_size=1, columns=columns):
                if columns == ["path", "partition", "dv_paths"]:
                    seen["rows"] += 1
                yield bt

    monkeypatch.setattr(mt.pq, "ParquetFile", CountingPF)
    merged = t._auto_compact_past_gate(policy, {"2024-01-01"})
    assert merged >= 1  # the trigger genuinely fired and merged
    # trigger condition (small_count > 2, cand full at 2) is decidable
    # after ~3 stats; generous bound still far below the 40 live rows
    assert seen["rows"] <= 10
    assert t.read().count() == 40  # merge preserved every row


def test_auto_compact_past_gate_spark_merge_lifts_byte_ceiling(
    spark, tmp_path, monkeypatch
):
    """Round-10: past the planning gate the policy ALSO merges
    executor-side when a session is available — header-folded state
    feeds _scan_with_pos directly (no Manifest materializes, the
    bounded plane holds) and the byte ceiling lifts like below the
    gate. Cluster order survives the bounded merge."""
    import data_warehouse_copy_spark.sources.managed_table as mt

    t = ManagedTable.create(spark, tmp_path / "t", cluster_col="k")
    for lo in range(0, 6_000, 1_000):
        t.append(
            spark.range(lo, lo + 1_000).selectExpr("id AS k", "id*2 AS v")
        )
    sizes = [(t.root / f.path).stat().st_size for f in t.snapshot().files]
    bar = int(sum(sizes) / 2)  # total needs ~2 outputs; each file small
    assert all(sz < bar for sz in sizes)
    t._write_checkpoint(t.snapshot())
    monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
    assert t._past_planning_gate()
    policy = {
        "max_files_per_partition": 2,
        "max_file_bytes": bar,
        "max_merge_files": 64,
    }
    merged = t._auto_compact_past_gate(policy, {None})
    # all six inputs merged in ONE bounded pass into ceil(total/bar)
    # right-sized outputs (2 or 3 by int rounding) — the pyarrow path's
    # byte budget would have stopped at the first ~2-file batch
    assert merged >= 3
    assert t._raw(t._head_version())["op"] == "compact"
    assert t.read().count() == 6_000
    assert len(t.snapshot().files) <= 3
    # cluster spans stay disjoint: selective reads keep skipping
    got = t.read(where=[("k", "=", 4_321)])
    assert got.count() == 1
    assert len(got.inputFiles()) < len(t.snapshot().files)


def test_auto_compact_past_gate_ignores_large_file_crowds(
    spark, tmp_path, monkeypatch
):
    """Round-9 review fix: past the planning gate the policy triggers on
    the SMALL-file count (the same semantic as below the gate) — a
    partition crowded with at-bar-or-larger files must not fire merge
    commits on every ingest."""
    import data_warehouse_copy_spark.sources.managed_table as mt

    t = ManagedTable.create(spark, tmp_path / "t", partition_date_col="d")
    # several "large" files (large relative to the policy bar below)
    for i in range(5):
        t.append(
            spark.sql(
                f"SELECT DATE'2024-01-01' AS d, id AS v FROM range({i*1000}, {i*1000+1000})"
            )
        )
    big_sz = min(
        (t.root / f.path).stat().st_size for f in t.snapshot().files
    )
    t._write_checkpoint(t.snapshot())
    monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
    assert t._past_planning_gate()
    # smallness bar below every existing file: none is mergeable
    t.set_auto_compact(max_files_per_partition=2, max_file_bytes=big_sz)
    v0 = t._head_version()
    # one more large append: no compact commit may follow
    t.append(
        spark.sql(
            "SELECT DATE'2024-01-01' AS d, id AS v FROM range(9000, 10000)"
        )
    )
    raws = [t._raw(v) for v in range(v0 + 1, t._head_version() + 1)]
    assert [r["op"] for r in raws] == ["append"]  # no compact churn
    # but genuine small files still merge past the gate
    for i in range(4):
        t.append(spark.sql(f"SELECT DATE'2024-01-01' AS d, {i} AS v"))
    ops = [
        t._raw(v)["op"] for v in range(1, t._head_version() + 1)
    ]
    assert "compact" in ops[-4:]
    assert t.read().count() == 6000 + 4
