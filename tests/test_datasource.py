"""managed_table Python Data Source (sources/datasource.py): batch reads
(snapshot parity, time travel, schema evolution, stats-based file pruning)
and Delta-style stream tailing (initial snapshot, incremental commits,
checkpoint recovery, change-commit guard)."""

import pytest
from pathlib import Path

from data_warehouse_copy_spark.sources.datasource import (
    ManagedTableBatchReader,
    ManagedTableDataSource,
    register,
)
from data_warehouse_copy_spark.sources.managed_table import ManagedTable


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    register(spark)


def _mk(spark, tmp_path, n=20, **create_kw):
    t = ManagedTable.create(spark, tmp_path / "t", **create_kw)
    t.append(
        spark.range(n).selectExpr("id", "id * 2 AS v", "concat('k', id) AS k")
    )
    return t


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------------------------ batch


def test_batch_read_matches_native(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.range(20, 35).selectExpr("id", "id*2 AS v", "concat('k',id) AS k"))
    via_ds = spark.read.format("managed_table").load(str(t.root))
    assert _rows(via_ds) == _rows(t.read())
    assert [f.name for f in via_ds.schema.fields] == ["id", "v", "k"]


def test_batch_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10)
    t.append(spark.range(10, 20).selectExpr("id", "id*2 AS v", "concat('k',id) AS k"))
    v1 = (
        spark.read.format("managed_table")
        .option("versionAsOf", "1")
        .load(str(t.root))
    )
    assert v1.count() == 10
    assert _rows(v1) == _rows(t.read(version=1))


def test_batch_schema_evolution_null_fills(spark, tmp_path):
    t = _mk(spark, tmp_path, n=5)
    t.append(
        spark.range(5, 8).selectExpr(
            "id", "id*2 AS v", "concat('k',id) AS k", "id + 100 AS extra"
        ),
        merge_schema=True,
    )
    df = spark.read.format("managed_table").load(str(t.root))
    got = {r.id: r.extra for r in df.collect()}
    assert got[1] is None and got[6] == 106


def test_where_option_prunes_files_by_stats(spark, tmp_path):
    # range-clustered on id -> disjoint per-file min/max spans; a point
    # predicate via the relation-scoped where option must open O(1)
    # files, not the whole table
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col="id")
    # AQE would coalesce 1k tiny rows into one file; pin the range-shuffle
    # width so multiple disjoint cluster spans materialize
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.append(spark.range(1000).selectExpr("id", "id * 2 AS v").repartition(8))
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    n_files = len(t.snapshot().files)
    assert n_files > 1
    reader = ManagedTableBatchReader(
        str(t.root), {"where": '[["id", "=", 3]]'}, t.read().schema
    )
    assert len(reader.partitions()) < n_files
    # end-to-end: pruned superset + matching filter = exact row
    df = (
        spark.read.format("managed_table")
        .option("where", '[["id", "=", 3]]')
        .load(str(t.root))
        .filter("id = 3")
    )
    assert df.collect() == [(3, 6)]
    # pruning to ZERO files must yield an empty frame, not a planner crash
    # (Spark plans one partitionless task when partitions() returns [])
    none = (
        spark.read.format("managed_table")
        .option("where", '[["id", "=", 5000]]')
        .load(str(t.root))
    )
    assert none.count() == 0
    with pytest.raises(Exception, match="JSON list"):
        spark.read.format("managed_table").option("where", "id = 3").load(
            str(t.root)
        ).collect()


def test_mixed_filtered_and_unfiltered_actions_stay_consistent(spark, tmp_path):
    """Regression for the Spark 4.1 readInfo cache: the JVM re-serves the
    last planned scan to later filterless plans, so filter-dependent
    partitions() (a pushFilters implementation) silently returns the
    pruned subset for a bare df.count() after df.filter(...).count().
    Pruning therefore lives in the relation-scoped where option only —
    a plain DataFrame must stay exact under any mix of actions."""
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col="id")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.append(spark.range(1000).selectExpr("id", "id * 2 AS v").repartition(8))
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    df = spark.read.format("managed_table").load(str(t.root))
    assert df.filter("id = 3").count() == 1
    assert df.filter("id = 999").count() == 1
    assert df.count() == 1000  # the poisoned-cache case: must be full
    assert df.filter("id = 3").count() == 1


def test_batch_requires_path():
    with pytest.raises(Exception):
        ManagedTableDataSource(options={}).schema()


# ----------------------------------------------------------------- stream


def _tail_query(spark, root, out, ckpt, **opts):
    reader = spark.readStream.format("managed_table")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return (
        reader.load(str(root))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .start()
    )


def test_stream_snapshot_then_tail_exactly_once(spark, tmp_path):
    t = _mk(spark, tmp_path, n=5)
    t.append(spark.range(5, 8).selectExpr("id", "id*2 AS v", "concat('k',id) AS k"))
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = _tail_query(spark, t.root, out, ckpt)
    try:
        q.processAllAvailable()
        assert spark.read.parquet(str(out)).count() == 8  # initial snapshot
        t.append(spark.range(8, 12).selectExpr("id", "id*2 AS v", "concat('k',id) AS k"))
        q.processAllAvailable()
        assert spark.read.parquet(str(out)).count() == 12  # tail only
    finally:
        q.stop()
    # restart from the checkpoint: the commit made while down arrives once
    t.append(spark.range(12, 15).selectExpr("id", "id*2 AS v", "concat('k',id) AS k"))
    q2 = _tail_query(spark, t.root, out, ckpt)
    try:
        q2.processAllAvailable()
        df = spark.read.parquet(str(out))
        assert df.count() == 15 == df.distinct().count()
    finally:
        q2.stop()


def test_stream_change_commit_raises_unless_opted_in(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = _tail_query(spark, t.root, out, ckpt)
    try:
        q.processAllAvailable()
        t.delete([("id", "<", 3)])  # rewrite commit
        with pytest.raises(Exception, match="rewrote data files"):
            q.processAllAvailable()
    finally:
        q.stop()
    # skipChangeCommits drops the rewrite but keeps later appends flowing
    t.append(spark.range(10, 12).selectExpr("id", "id*2 AS v", "concat('k',id) AS k"))
    q2 = _tail_query(spark, t.root, out, ckpt, skipChangeCommits="true")
    try:
        q2.processAllAvailable()
        df = spark.read.parquet(str(out))
        assert df.count() == 12 and df.agg({"id": "max"}).first()[0] == 11
    finally:
        q2.stop()


def test_batch_read_is_snapshot_isolated(spark, tmp_path):
    """The version is pinned when Spark plans the schema, so a batch frame
    is a consistent snapshot: commits landing between load() and the
    action neither appear in the results nor break the planned schema
    (a concurrent merge_schema widen would otherwise fail the scan)."""
    t = _mk(spark, tmp_path, n=10)
    df = spark.read.format("managed_table").load(str(t.root))
    t.append(
        spark.range(10, 20).selectExpr(
            "id", "id*2 AS v", "concat('k',id) AS k", "id AS late"
        ),
        merge_schema=True,
    )
    assert df.count() == 10  # the pre-append snapshot
    assert "late" not in df.columns
    # a fresh load sees the new version and column
    df2 = spark.read.format("managed_table").load(str(t.root))
    assert df2.count() == 20 and "late" in df2.columns


def test_batch_timestamp_as_of(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10)
    ts_v1 = t.history()[-1].ts
    t.append(spark.range(10, 15).selectExpr("id", "id*2 AS v", "concat('k',id) AS k"))
    df = (
        spark.read.format("managed_table")
        .option("timestampAsOf", ts_v1)
        .load(str(t.root))
    )
    assert df.count() == 10


def test_row_group_pruning_within_a_file(spark, tmp_path):
    """Second pruning tier: inside a kept file, row groups whose footer
    stats exclude the pushed predicate are skipped (a sorted multi-GB
    file serves a point lookup from one row group). Values stay exact —
    Spark re-applies the filter row-level."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_copy_spark.sources.datasource import (
        _matching_row_groups,
    )

    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.range(1000).orderBy("id").coalesce(1).selectExpr("id", "id*2 AS v"))
    # rewrite the single data file with small row groups (sorted -> tight
    # disjoint spans), keeping path and row count identical
    (rel,) = [f.path for f in t.snapshot().files]
    fpath = str(t.root / rel)
    tbl = pq.read_table(fpath)
    pq.write_table(tbl, fpath, row_group_size=100)
    pf = pq.ParquetFile(fpath)
    assert pf.metadata.num_row_groups == 10
    assert _matching_row_groups(pf, [("id", "=", 250)]) == [2]
    assert _matching_row_groups(pf, [("id", ">=", 850)]) == [8, 9]
    assert _matching_row_groups(pf, [("id", "=", 5000)]) == []
    assert _matching_row_groups(pf, []) is None  # no filters -> no pruning
    # e2e: where-option read over the rewritten file stays exact when
    # paired with the matching filter, and the plain read stays full
    df = (
        spark.read.format("managed_table")
        .option("where", '[["id", "=", 250]]')
        .load(str(t.root))
        .filter("id = 250")
    )
    assert df.collect() == [(250, 500)]
    assert spark.read.format("managed_table").load(str(t.root)).count() == 1000


def test_batch_user_supplied_schema_projects(spark, tmp_path):
    """An explicit .schema(...) (Spark then never calls schema()) must
    project every file to the user's schema instead of crashing on a
    declared-vs-batch mismatch."""
    t = _mk(spark, tmp_path, n=6)
    df = (
        spark.read.format("managed_table")
        .schema("id bigint, k string")
        .load(str(t.root))
    )
    assert df.columns == ["id", "k"]
    assert sorted((r.id, r.k) for r in df.collect()) == [
        (i, f"k{i}") for i in range(6)
    ]


def test_batch_columns_option_prunes_scan(spark, tmp_path):
    """option('columns', ...) narrows the declared schema — the Python DS
    API has no column-pruning hook, so this is how a projection avoids
    scanning the wide payload through the Python worker."""
    t = _mk(spark, tmp_path, n=10)
    df = (
        spark.read.format("managed_table")
        .option("columns", "k, id")
        .load(str(t.root))
    )
    assert df.columns == ["k", "id"]  # declared order, not table order
    assert sorted((r.k, r.id) for r in df.collect()) == sorted(
        (f"k{i}", i) for i in range(10)
    )
    with pytest.raises(Exception, match="absent from the table schema"):
        spark.read.format("managed_table").option("columns", "nope").load(
            str(t.root)
        ).collect()


# ----------------------------------------------------------------- write


def test_batch_write_append_and_overwrite(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id", "id * 3 AS v")
    # auto-creates the table on first write
    df.write.format("managed_table").mode("append").save(root)
    t = ManagedTable(spark, root)
    assert t.read().count() == 100
    df.write.format("managed_table").mode("append").save(root)
    assert t.read().count() == 200
    spark.range(5).selectExpr("id", "id*3 AS v").write.format(
        "managed_table"
    ).mode("overwrite").save(root)
    assert t.read().count() == 5
    # staged files carry footer stats -> native data skipping works on them
    got = t.read(where=[("id", "=", 3)])
    assert [r.id for r in got.collect()] == [3]


def test_batch_write_schema_mismatch_rejected(spark, tmp_path):
    root = str(tmp_path / "t")
    spark.range(5).selectExpr("id", "id*3 AS v").write.format(
        "managed_table"
    ).mode("append").save(root)
    with pytest.raises(Exception, match="schema mismatch"):
        spark.range(3).selectExpr(
            "id", "CAST(id AS STRING) AS v"
        ).write.format("managed_table").mode("append").save(root)
    assert ManagedTable(spark, root).read().count() == 5


def test_batch_write_partitioned_table_day_splits(spark, tmp_path):
    """Round-7 item 1: the declarative writer stages DAY-SPLIT,
    partition-tagged files on a day-partitioned table — the same files
    a native append produces — so partition-pruned reads and range
    overwrites see declaratively-written data."""
    root = str(tmp_path / "t")
    t = ManagedTable.create(spark, root, partition_date_col="d")
    df = spark.sql(
        "SELECT DATE'2024-01-01' + CAST(id % 3 AS INT) AS d, id AS v "
        "FROM range(30)"
    )
    df.write.format("managed_table").mode("append").save(root)
    m = t.snapshot()
    assert m.total_rows == 30
    # every file is partition-pure and tagged with its day
    tags = sorted({f.partition for f in m.files})
    assert tags == ["2024-01-01", "2024-01-02", "2024-01-03"]
    # partition-pruned read sees exactly one day
    got = t.read(partitions={"2024-01-02"})
    assert got.count() == 10
    assert got.select("d").distinct().first()[0].isoformat() == "2024-01-02"
    # and a partition-pruned range overwrite REPLACES the day's rows —
    # the exact operation untagged files would have been invisible to
    repl = spark.sql(
        "SELECT DATE'2024-01-02' AS d, CAST(-1 AS BIGINT) AS v FROM range(2)"
    )
    t.overwrite_range(repl, "2024-01-02", "2024-01-02", date_column="d")
    assert t.count() == 22
    assert t.read(partitions={"2024-01-02"}).count() == 2


def test_batch_write_partitioned_null_day(spark, tmp_path):
    """NULL partition values land in the null partition (partition=None),
    matching the native writer's Hive-null handling."""
    root = str(tmp_path / "t")
    t = ManagedTable.create(spark, root, partition_date_col="d")
    spark.sql(
        "SELECT IF(id < 3, DATE'2024-05-05', NULL) AS d, id AS v "
        "FROM range(5)"
    ).write.format("managed_table").mode("append").save(root)
    m = t.snapshot()
    per_part: dict = {}
    for f in m.files:  # one file per (task, day) — compact() merges later
        per_part[f.partition] = per_part.get(f.partition, 0) + f.rows
    assert per_part == {None: 2, "2024-05-05": 3}
    assert t.count() == 5


def test_stream_write_partitioned_fact(spark, tmp_path):
    """writeStream.format('managed_table') into a day-partitioned fact —
    the canonical layout of this design — exactly-once with tagged
    files (round-7 'Next round' item 1's streaming half)."""
    src = _mk(spark, tmp_path, n=6)
    sink_root = str(tmp_path / "fact")
    ManagedTable.create(spark, sink_root, partition_date_col="d")
    q = (
        spark.readStream.format("managed_table")
        .load(str(src.root))
        .selectExpr("DATE'2024-03-01' + CAST(id % 2 AS INT) AS d", "v")
        .writeStream.format("managed_table")
        .option("txnAppId", "q-part")
        .option("path", sink_root)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sk = ManagedTable(spark, sink_root)
    assert sk.count() == 6
    assert {f.partition for f in sk.snapshot().files} == {
        "2024-03-01", "2024-03-02"
    }
    assert sk.read(partitions={"2024-03-02"}).count() == 3


def test_stream_sink_exactly_once_and_retry_noop(spark, tmp_path):
    src = _mk(spark, tmp_path, n=10)
    sink_root = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.format("managed_table")
            .load(str(src.root))
            .writeStream.format("managed_table")
            .option("txnAppId", "q-test")
            .option("path", sink_root)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
        assert ManagedTable(spark, sink_root).read().count() == 10
        src.append(
            spark.range(10, 14).selectExpr("id", "id*2 AS v", "concat('k',id) AS k")
        )
        q.processAllAvailable()
        sk = ManagedTable(spark, sink_root)
        assert sk.read().count() == 14 == sk.read().distinct().count()
    finally:
        q.stop()
    # restart from the checkpoint: nothing new -> no duplicates
    q2 = start()
    try:
        q2.processAllAvailable()
        sk = ManagedTable(spark, sink_root)
        assert sk.read().count() == 14 == sk.read().distinct().count()
    finally:
        q2.stop()
    # a replayed commit (same txnAppId+batchId) is a no-op at the log level
    from data_warehouse_copy_spark.sources.datasource import (
        FileCommit,
        ManagedTableStreamWriter,
    )

    w = ManagedTableStreamWriter(
        sink_root,
        ManagedTable(spark, sink_root).read().schema,
        {"txnappid": "q-test"},
        overwrite=False,
    )
    before = ManagedTable(spark, sink_root).snapshot().version
    w.commit([FileCommit(path=None, rows=0, stats=None)], batchId=0)
    assert ManagedTable(spark, sink_root).snapshot().version == before


def test_stream_sink_requires_txn_app_id(spark, tmp_path):
    from data_warehouse_copy_spark.sources.datasource import (
        ManagedTableStreamWriter,
    )

    with pytest.raises(ValueError, match="txnAppId"):
        ManagedTableStreamWriter(str(tmp_path / "t"), None, {}, overwrite=False)


def test_stream_starting_timestamp(spark, tmp_path):
    """startingTimestamp (round-10, Delta parity): tail from the first
    commit at-or-after the timestamp — a mid-history stamp skips the
    commits before it, one before history replays everything, one past
    the head tails new commits only; exclusive with startingVersion."""
    import time
    from datetime import datetime, timezone

    def utc_now() -> str:
        return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%fZ")

    t = _mk(spark, tmp_path, n=5)  # v1 = ids 0..4
    time.sleep(0.05)
    mid = utc_now()
    time.sleep(0.05)
    t.append(spark.range(5, 8).selectExpr("id", "id*2 AS v", "concat('k',id) AS k"))  # v2
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = _tail_query(spark, t.root, out, ckpt, startingTimestamp=mid)
    try:
        q.processAllAvailable()
        df = spark.read.parquet(str(out))
        assert sorted(r.id for r in df.collect()) == [5, 6, 7]  # v2 only
    finally:
        q.stop()
    from data_warehouse_copy_spark.sources.datasource import (
        ManagedTableStreamReader,
    )

    # before the first commit: replay everything (anchor -1, no snapshot)
    r = ManagedTableStreamReader(
        str(t.root),
        {"startingtimestamp": "2000-01-01T00:00:00.000000Z"},
        t.read().schema,
    )
    assert r.initialOffset() == {"version": -1}
    # past the head: tail new commits only
    r2 = ManagedTableStreamReader(
        str(t.root), {"startingtimestamp": utc_now()}, t.read().schema
    )
    assert r2.initialOffset() == {"version": t._head_version()}
    # a commit stamped EXACTLY at the timestamp is included
    raw_ets = t._raw(2).get("ets") or t._raw(2)["ts"]
    r3 = ManagedTableStreamReader(
        str(t.root), {"startingtimestamp": raw_ets}, t.read().schema
    )
    assert r3.initialOffset() == {"version": 1}  # anchor v-1 -> v2 delivered
    # equivalent-instant spelling without fractional seconds / 'Z'
    # variants resolve the same boundary (normalization, review fix)
    head, frac = raw_ets[:-1].split(".")
    if frac == "000000":  # whole-second stamp: the short forms coincide
        for variant in (head + "Z", head, head + "+00:00"):
            rv = ManagedTableStreamReader(
                str(t.root), {"startingtimestamp": variant}, t.read().schema
            )
            assert rv.initialOffset() == {"version": 1}
    # an equal-ETS RUN anchors before its LEFTMOST member (clock-skewed
    # commits collapse onto one effective timestamp; anchoring at the
    # rightmost would silently skip the earlier ones — review fix)
    import json as _json

    raw1 = t._raw(1)
    raw1["ets"] = raw_ets  # forge: v1 and v2 share one effective stamp
    (t.root / "_log" / f"{1:020d}.json").write_text(_json.dumps(raw1))
    r4 = ManagedTableStreamReader(
        str(t.root), {"startingtimestamp": raw_ets}, t.read().schema
    )
    assert r4.initialOffset() == {"version": 0}  # v1 AND v2 delivered
    with pytest.raises(ValueError, match="exclusive"):
        ManagedTableStreamReader(
            str(t.root),
            {"startingversion": "1", "startingtimestamp": mid},
            t.read().schema,
        )


def test_stream_starting_version_latest_skips_history(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = _tail_query(spark, t.root, out, ckpt, startingVersion="latest")
    try:
        q.processAllAvailable()
        t.append(spark.range(10, 13).selectExpr("id", "id*2 AS v", "concat('k',id) AS k"))
        q.processAllAvailable()
        df = spark.read.parquet(str(out))
        assert df.count() == 3 and df.agg({"id": "min"}).first()[0] == 10
    finally:
        q.stop()


def test_stream_starting_version_is_inclusive(spark, tmp_path):
    """startingVersion=N delivers commit N itself (Delta parity), not
    N+1 onward; values beyond the head are rejected up front."""
    t = _mk(spark, tmp_path, n=5)  # v1 = ids 0..4
    t.append(spark.range(5, 8).selectExpr("id", "id*2 AS v", "concat('k',id) AS k"))  # v2
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = _tail_query(spark, t.root, out, ckpt, startingVersion="2")
    try:
        q.processAllAvailable()
        df = spark.read.parquet(str(out))
        assert sorted(r.id for r in df.collect()) == [5, 6, 7]  # v2 included
    finally:
        q.stop()
    from data_warehouse_copy_spark.sources.datasource import (
        ManagedTableStreamReader,
    )

    r = ManagedTableStreamReader(
        str(t.root), {"startingversion": "99"}, t.read().schema
    )
    with pytest.raises(ValueError, match="outside the table history"):
        r.initialOffset()
    r2 = ManagedTableStreamReader(
        str(t.root), {"startingversion": "soon"}, t.read().schema
    )
    with pytest.raises(ValueError, match="integer or 'latest'"):
        r2.initialOffset()


def test_stream_starting_version_zero_replays_from_creation(spark, tmp_path):
    """startingVersion=0 replays every data commit including the creating
    one — the v0 full-state record diffs against an EMPTY prior state, not
    snapshot(-1) (which does not exist)."""
    t = _mk(spark, tmp_path, n=5)  # v0 create, v1 append
    t.append(spark.range(5, 8).selectExpr("id", "id*2 AS v", "concat('k',id) AS k"))
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = _tail_query(spark, t.root, out, ckpt, startingVersion="0")
    try:
        q.processAllAvailable()
        assert sorted(r.id for r in spark.read.parquet(str(out)).collect()) == list(
            range(8)
        )
    finally:
        q.stop()


def test_batch_version_options_validated_up_front(spark, tmp_path):
    t = _mk(spark, tmp_path, n=3)
    for opts in (
        {"versionAsOf": "99"},
        {"changesFrom": "0", "changesTo": "99"},
        {"changesFrom": "99"},
    ):
        reader = spark.read.format("managed_table")
        for k, v in opts.items():
            reader = reader.option(k, v)
        with pytest.raises(Exception, match="outside the table history"):
            reader.load(str(t.root)).collect()


def test_stream_survives_mid_flight_schema_evolution(spark, tmp_path):
    """A merge_schema widen committed while the stream runs must not kill
    the query: batches project to the planning-time schema, and the new
    column appears only after a restart."""
    t = _mk(spark, tmp_path, n=4)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = _tail_query(spark, t.root, out, ckpt)
    try:
        q.processAllAvailable()
        t.append(
            spark.range(4, 7).selectExpr(
                "id", "id*2 AS v", "concat('k',id) AS k", "id AS late"
            ),
            merge_schema=True,
        )
        q.processAllAvailable()
        df = spark.read.parquet(str(out))
        assert sorted(r.id for r in df.collect()) == list(range(7))
        assert "late" not in df.columns
    finally:
        q.stop()


def test_stream_sink_complete_mode_truncates_per_batch(spark, tmp_path):
    """outputMode('complete') (overwrite=True) replaces the sink table
    each micro-batch instead of appending the full result again."""
    src = _mk(spark, tmp_path, n=6)
    sink_root = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    counts = (
        spark.readStream.format("managed_table")
        .load(str(src.root))
        .groupBy("k")
        .count()
    )
    q = (
        counts.writeStream.format("managed_table")
        .outputMode("complete")
        .option("txnAppId", "q-complete")
        .option("path", sink_root)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        assert ManagedTable(spark, sink_root).read().count() == 6
        src.append(
            spark.range(6, 9).selectExpr("id", "id*2 AS v", "concat('k',id) AS k")
        )
        q.processAllAvailable()
        got = ManagedTable(spark, sink_root).read()
        # 9 distinct keys, each exactly once — not 6 stale + 9 new
        assert got.count() == 9 == got.select("k").distinct().count()
    finally:
        q.stop()


def test_batch_cdc_read_tags_commit_version(spark, tmp_path):
    """option('changesFrom', N) is the declarative read_changes: files
    added by data commits in (N, changesTo]] tagged with _commit_version;
    compaction commits are replay-free, same as the native cursor."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.range(5).selectExpr("id", "id*2 AS v"))    # v1
    t.append(spark.range(5, 8).selectExpr("id", "id*2 AS v"))  # v2
    t.compact()                                                # v3: skipped
    t.append(spark.range(8, 10).selectExpr("id", "id*2 AS v"))  # v4
    df = (
        spark.read.format("managed_table")
        .option("changesFrom", "1")
        .load(str(t.root))
    )
    assert sorted((r.id, r._commit_version) for r in df.collect()) == [
        (5, 2), (6, 2), (7, 2), (8, 4), (9, 4)
    ]
    # same multiset as the native cursor
    assert sorted(r.id for r in df.collect()) == sorted(
        r.id for r in t.read_changes(1).collect()
    )
    bounded = (
        spark.read.format("managed_table")
        .option("changesFrom", "1")
        .option("changesTo", "2")
        .load(str(t.root))
    )
    assert sorted(r.id for r in bounded.collect()) == [5, 6, 7]
    with pytest.raises(Exception, match="cannot combine"):
        spark.read.format("managed_table").option("changesFrom", "0").option(
            "versionAsOf", "1"
        ).load(str(t.root)).collect()


def test_cdc_option_guards_and_column_projection(spark, tmp_path):
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.range(5).selectExpr("id", "id*2 AS v"))
    t.append(spark.range(5, 8).selectExpr("id", "id*2 AS v"))
    # a stream IS the change feed: batch CDC options are rejected loudly
    # (the reader is built inside the stream run, so the error surfaces on
    # the first micro-batch, not at start())
    q = (
        spark.readStream.format("managed_table")
        .option("changesFrom", "1")
        .load(str(t.root))
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt_cdc"))
        .start()
    )
    try:
        with pytest.raises(Exception, match="batch CDC options"):
            q.processAllAvailable()
            q.awaitTermination(30)
    finally:
        q.stop()
    # changesTo alone would silently fall through to a full read — reject
    with pytest.raises(Exception, match="changesTo requires changesFrom"):
        spark.read.format("managed_table").option("changesTo", "1").load(
            str(t.root)
        ).collect()
    # the _commit_version tag is projectable through the columns option
    df = (
        spark.read.format("managed_table")
        .option("changesFrom", "1")
        .option("columns", "id,_commit_version")
        .load(str(t.root))
    )
    assert df.columns == ["id", "_commit_version"]
    assert sorted(map(tuple, df.collect())) == [(5, 2), (6, 2), (7, 2)]


def test_explicit_schema_reader_pins_version(spark, tmp_path):
    """The explicit-.schema(...) path skips DataSource.schema(), so the
    reader itself must pin the head at construction — partitions() may
    not drift to commits made after planning."""
    t = _mk(spark, tmp_path, n=4)
    reader = ManagedTableBatchReader(str(t.root), {}, t.read().schema)
    assert reader.options.get("versionasof") == str(t.snapshot().version)
    n_pinned = len(t.snapshot().files)
    t.append(spark.range(4, 8).selectExpr("id", "id*2 AS v", "concat('k',id) AS k"))
    assert len(t.snapshot().files) > n_pinned
    assert len(reader.partitions()) == n_pinned  # the pinned version's files


def test_history_option_exposes_commit_log(spark, tmp_path):
    """option('history', 'true') is DESCRIBE HISTORY: the commit log as a
    DataFrame (and thus reachable from pure SQL), metadata-only."""
    t = _mk(spark, tmp_path, n=5)
    t.append(spark.range(5, 9).selectExpr("id", "id*2 AS v", "concat('k',id) AS k"))
    t.delete([("id", "<", 2)])
    h = (
        spark.read.format("managed_table")
        .option("history", "true")
        .load(str(t.root))
    )
    rows = sorted(h.collect(), key=lambda r: r.version)
    assert [r.op for r in rows] == ["create", "append", "append", "delete"]
    assert rows[-1].total_rows == 7 and rows[-1].rows_removed >= 2
    assert [tuple(r) for r in rows] == [
        (c.version, c.op, c.ts, c.n_files, c.total_rows, c.rows_added, c.rows_removed)
        for c in t.history()
    ]
    # SQL surface over the same option
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW mt_hist USING managed_table "
        f"OPTIONS (path '{t.root}', history 'true')"
    )
    assert spark.sql("SELECT count(*) FROM mt_hist").first()[0] == 4


def test_files_option_exposes_manifest(spark, tmp_path):
    """option('files', 'true') lists the live manifest (path, partition,
    rows, stats) — the table-layout inspection surface, metadata-only."""
    t = _mk(spark, tmp_path, n=10)
    f = (
        spark.read.format("managed_table")
        .option("files", "true")
        .load(str(t.root))
    )
    rows = f.collect()
    m = t.snapshot()
    assert sorted(r.path for r in rows) == sorted(x.path for x in m.files)
    assert sum(r.rows for r in rows) == 10
    assert all(r.stats_json is None or "id" in r.stats_json for r in rows)


def test_sql_view_over_managed_table(spark, tmp_path):
    """The format works from pure SQL too: CREATE TEMPORARY VIEW ... USING
    managed_table OPTIONS(path ...) — the surface a SQL-only consumer
    uses."""
    t = _mk(spark, tmp_path, n=8)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW mt_sql_view "
        f"USING managed_table OPTIONS (path '{t.root}')"
    )
    assert spark.sql("SELECT count(*) FROM mt_sql_view").first()[0] == 8
    assert spark.sql("SELECT v FROM mt_sql_view WHERE id = 3").first()[0] == 6


def test_stream_selective_tailing_with_where_option(spark, tmp_path):
    """A stream with option('where') subscribes to the matching subset:
    the initial snapshot and every tailed commit are pruned on manifest
    stats, so a key-range consumer never ships the rest of the table.
    Superset contract: rows are pruned at file/row-group granularity, so
    the consumer applies the exact filter downstream."""
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col="id")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.append(spark.range(400).selectExpr("id", "id*2 AS v").repartition(4))
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = (
        spark.readStream.format("managed_table")
        .option("where", '[["id", "<", 100]]')
        .load(str(t.root))
        .filter("id < 100")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.read.parquet(str(out)).count() == 100
        # tail commit entirely outside the subscription: nothing arrives
        t.append(spark.range(400, 500).selectExpr("id", "id*2 AS v"))
        # tail commit overlapping it: only the matching rows arrive
        t.append(spark.range(90, 110).selectExpr("id", "id*2 AS v"))
        q.processAllAvailable()
        df = spark.read.parquet(str(out))
        assert df.count() == 110 and df.agg({"id": "max"}).first()[0] == 99
    finally:
        q.stop()


def test_read_missing_table_fails_clearly(spark, tmp_path):
    with pytest.raises(Exception, match="no managed table at"):
        spark.read.format("managed_table").load(str(tmp_path / "nope")).collect()


_DSW_WORKER = r"""
import sys
import pyarrow as pa
from pyspark.sql import types as T
from data_warehouse_copy_spark.sources.datasource import (
    _commit_staged, _stage_batches,
)

root, wid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
schema = T.StructType([
    T.StructField("writer", T.LongType()),
    T.StructField("seq", T.LongType()),
])
for i in range(n):
    batch = pa.record_batch(
        {"writer": pa.array([wid], pa.int64()), "seq": pa.array([i], pa.int64())}
    )
    msg = _stage_batches(root, iter([batch]))
    _commit_staged(root, schema, [msg], "append")
print("OK")
"""


def test_concurrent_native_and_datasource_writers(spark, tmp_path):
    """Cross-process storm mixing the declarative writer's two-phase
    commit with native append_pylist on one log: both paths share
    _commit_files' exclusive-version + rebase protocol, so every commit
    from either side must survive."""
    import subprocess
    import sys as _sys

    from pyspark.sql import types as T

    root = str(tmp_path / "t")
    t = ManagedTable.create(spark, root)
    schema = T.StructType(
        [T.StructField("writer", T.LongType()), T.StructField("seq", T.LongType())]
    )
    t.append_pylist([{"writer": -1, "seq": -1}], schema)  # seed the schema

    native_worker = r"""
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
    n_each, n_appends = 2, 5
    procs = [
        subprocess.Popen(
            [_sys.executable, "-c", script, root, str(w), str(n_appends)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w, script in enumerate(
            [_DSW_WORKER] * n_each + [native_worker] * n_each
        )
    ]
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, err
        assert "OK" in out
    total = 1 + 2 * n_each * n_appends
    m = t.snapshot()
    assert m.total_rows == total and m.version == total - 1 + 1
    assert t.read().count() == total
    # both write paths visible through the declarative read too
    assert spark.read.format("managed_table").load(root).count() == total


class TestDeclarativeMerge:
    """option('mergeKey', pk): upsert through the declarative writer —
    DV-tombstone matched target rows (session-less pyarrow commit, stats-
    scoped), append staged source files, one atomic commit."""

    def _target(self, spark, tmp_path):
        t = ManagedTable.create(spark, tmp_path / "t", cluster_col="id")
        t.append(
            spark.range(0, 1000).selectExpr("id", "CAST(0.0 AS DOUBLE) AS v")
        )
        return t

    def test_merge_converges_and_rewrites_nothing(self, spark, tmp_path):
        t = self._target(spark, tmp_path)
        states = {
            str(p): (p.stat().st_size, p.stat().st_mtime)
            for p in (tmp_path / "t" / "data").rglob("*.parquet")
        }
        src = spark.range(100, 120).selectExpr(
            "id", "CAST(id * 1.5 AS DOUBLE) AS v"
        ).union(
            spark.range(5000, 5010).selectExpr(
                "id", "CAST(id * 1.5 AS DOUBLE) AS v"
            )
        )
        src.write.format("managed_table").mode("append").option(
            "mergeKey", "id"
        ).save(str(tmp_path / "t"))
        out = t.read()
        assert out.count() == 1010
        assert out.groupBy("id").count().filter("count > 1").count() == 0
        assert out.filter("id >= 100 AND id < 120 AND v = 0.0").count() == 0
        # no pre-existing data file was rewritten — merge wrote DV + adds
        assert all(
            (Path(p).stat().st_size, Path(p).stat().st_mtime) == s
            for p, s in states.items()
        )
        m = t.snapshot()
        assert m.op == "merge" and sum(f.dv_rows for f in m.files) == 20
        # stats-scoped: only files whose span admits a source key grew a DV
        assert all(
            f.dv_rows == 0 or f.stats is not None for f in m.files
        )
        # declarative read agrees with the native anti-join path
        decl = spark.read.format("managed_table").load(str(tmp_path / "t"))
        assert {tuple(r) for r in decl.collect()} == {
            tuple(r) for r in out.collect()
        }

    def test_merge_respects_prior_dvs_and_reconverges(self, spark, tmp_path):
        t = self._target(spark, tmp_path)
        t.delete([("id", ">=", 100), ("id", "<", 105)])  # prior DV
        src = spark.range(100, 110).selectExpr(
            "id", "CAST(7.0 AS DOUBLE) AS v"
        )
        for _ in range(2):  # re-merging the same keys must stay converged
            src.write.format("managed_table").mode("append").option(
                "mergeKey", "id"
            ).save(str(tmp_path / "t"))
        out = t.read()
        assert out.count() == 1000  # 995 survivors + 10 merged - 5 re-keyed
        assert out.filter("id >= 100 AND id < 110").count() == 10
        assert out.filter("id >= 100 AND id < 110 AND v = 7.0").count() == 10
        assert out.groupBy("id").count().filter("count > 1").count() == 0

    def test_merge_option_guards(self, spark, tmp_path):
        t = self._target(spark, tmp_path)
        src = spark.range(0, 5).selectExpr("id", "CAST(1.0 AS DOUBLE) AS v")
        with pytest.raises(Exception, match="mode\\('append'\\)"):
            src.write.format("managed_table").mode("overwrite").option(
                "mergeKey", "id"
            ).save(str(tmp_path / "t"))
        with pytest.raises(Exception, match="not a column"):
            src.write.format("managed_table").mode("append").option(
                "mergeKey", "nope"
            ).save(str(tmp_path / "t"))
        assert t.read().count() == 1000  # guards fired before any commit

    def test_merge_key_is_batch_only(self, spark, tmp_path):
        # streamWriter() is invoked on the async stream thread, so assert
        # on the factory directly (the guard fires before any batch runs)
        self._target(spark, tmp_path)
        from pyspark.sql import types as T

        ds = ManagedTableDataSource(
            {"path": str(tmp_path / "t"), "txnappid": "q", "mergekey": "id"}
        )
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.DoubleType()),
            ]
        )
        with pytest.raises(ValueError, match="batch-writer option"):
            ds.streamWriter(schema, False)


class TestDeclarativeReplaceWhere:
    """mode('overwrite').option('replaceWhere', json) — Delta's
    predicate-scoped atomic overwrite through the declarative writer,
    session-less DV tombstones + staged appends in one commit."""

    def _mk(self, spark, tmp_path, n=100):
        t = ManagedTable.create(spark, tmp_path / "t")
        t.append(
            spark.range(0, n).selectExpr("id AS k", "id % 7 AS v")
        )
        return t

    def test_roundtrip(self, spark, tmp_path, _registered):
        t = self._mk(spark, tmp_path)
        repl = spark.createDataFrame(
            [(5, 100), (7, 100)], "k long, v long"
        )
        (
            repl.write.format("managed_table")
            .mode("overwrite")
            .option("replaceWhere", '[["k", ">=", 5], ["k", "<", 10]]')
            .save(str(t.root))
        )
        got = {r["k"]: r["v"] for r in t.read().collect()}
        # slice [5,10) fully replaced by the two rows; everything else kept
        assert got[5] == 100 and got[7] == 100
        assert all(k not in got for k in (6, 8, 9))
        assert len(got) == 100 - 5 + 2
        assert t.snapshot().op == "replace_where"

    def test_retry_is_idempotent(self, spark, tmp_path, _registered):
        t = self._mk(spark, tmp_path)
        repl = spark.createDataFrame([(5, 100)], "k long, v long")
        for _ in range(2):  # a retried backfill converges
            (
                repl.write.format("managed_table")
                .mode("overwrite")
                .option("replaceWhere", '[["k", ">=", 5], ["k", "<", 8]]')
                .save(str(t.root))
            )
        got = {r["k"]: r["v"] for r in t.read().collect()}
        assert got[5] == 100 and 6 not in got and 7 not in got
        assert len(got) == 100 - 3 + 1

    def test_out_of_slice_rows_rejected(self, spark, tmp_path, _registered):
        t = self._mk(spark, tmp_path)
        bad = spark.createDataFrame([(50, 1)], "k long, v long")
        with pytest.raises(Exception, match="confined to the slice"):
            (
                bad.write.format("managed_table")
                .mode("overwrite")
                .option("replaceWhere", '[["k", "<", 10]]')
                .save(str(t.root))
            )
        # nothing committed, nothing lost
        assert t.read().count() == 100

    def test_option_validation(self, spark, tmp_path, _registered):
        t = self._mk(spark, tmp_path)
        df = spark.createDataFrame([(1, 1)], "k long, v long")
        with pytest.raises(Exception, match="OVERWRITE"):
            (
                df.write.format("managed_table")
                .mode("append")
                .option("replaceWhere", '[["k", "<", 10]]')
                .save(str(t.root))
            )
        with pytest.raises(Exception, match="exclusive"):
            (
                df.write.format("managed_table")
                .mode("append")
                .option("replaceWhere", '[["k", "<", 10]]')
                .option("mergeKey", "k")
                .save(str(t.root))
            )


def test_stream_sink_auto_compact_bounds_live_files(spark, tmp_path):
    """Round-7 item 3's 'Done' bar: a streaming ingest of 22
    micro-batches (maxFilesPerTrigger=1 over a file source) into a
    managed_table sink with auto-compaction on — the live file count
    stays bounded the whole run, rows land exactly once, and the
    compaction commits are silent to the change feed."""
    src_dir = tmp_path / "srcfiles"
    src_dir.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as papq

    for i in range(22):
        papq.write_table(
            pa.table({"id": pa.array([i], type=pa.int64())}),
            src_dir / f"f{i:03d}.parquet",
        )
    sink_root = str(tmp_path / "sink")
    t = ManagedTable.create(spark, sink_root)
    t.set_auto_compact(max_files_per_partition=4)
    q = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
        .writeStream.format("managed_table")
        .option("txnAppId", "q-ac")
        .option("path", sink_root)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    m = t.snapshot()
    assert t.count() == 22                       # exactly once
    assert len(m.files) <= 5                     # bounded, not 22
    ops = [ci.op for ci in t.history()]
    assert ops.count("append") >= 20 and "compact" in ops
    # change-feed silence: a cursor over the whole history sees each
    # row exactly once despite the rewrites
    feed = t.read_changes(0).collect()
    assert sorted(r.id for r in feed) == list(range(22))


def test_replace_where_on_partitioned_table_declarative(spark, tmp_path):
    """replaceWhere through the declarative writer on a day-partitioned
    table: staged files carry partition tags, the predicate-scoped
    tombstone + insert stays one atomic commit."""
    root = str(tmp_path / "t")
    t = ManagedTable.create(spark, root, partition_date_col="d")
    spark.sql(
        "SELECT DATE'2024-01-01' + CAST(id % 2 AS INT) AS d, id AS v "
        "FROM range(10)"
    ).write.format("managed_table").mode("append").save(root)
    v0 = t.snapshot().version
    spark.sql(
        "SELECT DATE'2024-01-02' AS d, CAST(id + 100 AS BIGINT) AS v "
        "FROM range(2)"
    ).write.format("managed_table").mode("overwrite").option(
        "replaceWhere", '[["v", ">=", 100]]'
    ).save(root)
    assert t.snapshot().version == v0 + 1
    got = sorted(r.v for r in t.read().collect())
    assert got == list(range(10)) + [100, 101]
    # new files are partition-tagged: day-pruned reads see them
    assert t.read(partitions={"2024-01-02"}).count() == 5 + 2


def test_merge_key_on_partitioned_table_declarative(spark, tmp_path):
    """mergeKey upsert through the declarative writer on a partitioned
    table: tombstone + tagged-file append, one commit."""
    root = str(tmp_path / "t")
    t = ManagedTable.create(spark, root, partition_date_col="d")
    spark.sql(
        "SELECT DATE'2024-02-01' AS d, id AS k, id * 10 AS v FROM range(6)"
    ).write.format("managed_table").mode("append").save(root)
    spark.sql(
        "SELECT DATE'2024-02-02' AS d, id AS k, CAST(-1 AS BIGINT) AS v "
        "FROM range(4, 8)"
    ).write.format("managed_table").mode("append").option(
        "mergeKey", "k"
    ).save(root)
    got = {r.k: (r.v, r.d.isoformat()) for r in t.read().collect()}
    assert len(got) == 8
    assert got[3] == (30, "2024-02-01")      # untouched
    assert got[4] == (-1, "2024-02-02")      # upserted, re-dated
    assert got[7] == (-1, "2024-02-02")      # inserted
    assert t.read(partitions={"2024-02-02"}).count() == 4


# ------------------------------------------------- streaming rate limits


def test_stream_max_commits_per_trigger(spark, tmp_path):
    """Round-9 (verdict item 3): ``maxCommitsPerTrigger`` caps how many
    commits one micro-batch covers — a long backfill tails in bounded
    batches instead of one giant catch-up batch — with exactly-once
    delivery preserved across a checkpoint restart."""
    t = _mk(spark, tmp_path, n=2)
    for i in range(10, 16):  # six 1-row commits to tail
        t.append(
            spark.range(i, i + 1).selectExpr(
                "id", "id*2 AS v", "concat('k',id) AS k"
            )
        )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = _tail_query(
        spark, t.root, out, ckpt,
        startingVersion="2", maxCommitsPerTrigger="2",
    )
    try:
        q.processAllAvailable()
        got = spark.read.parquet(str(out))
        assert got.count() == 6  # all six commits, exactly once
        # the six commits arrived over >= 3 capped batches of <= 2 rows
        progress = [
            p for p in q.recentProgress if p["numInputRows"] > 0
        ]
        assert len(progress) >= 3
        assert all(p["numInputRows"] <= 2 for p in progress)
    finally:
        q.stop()
    # restart: commits made while down arrive once; caps re-arm after
    # the first (documented-uncapped) trigger
    for i in range(30, 35):
        t.append(
            spark.range(i, i + 1).selectExpr(
                "id", "id*2 AS v", "concat('k',id) AS k"
            )
        )
    q2 = _tail_query(
        spark, t.root, out, ckpt,
        startingVersion="2", maxCommitsPerTrigger="2",
    )
    try:
        q2.processAllAvailable()
        vals = sorted(
            r.id for r in spark.read.parquet(str(out)).collect()
        )
        assert vals == list(range(10, 16)) + list(range(30, 35))
    finally:
        q2.stop()


def test_stream_max_files_per_trigger_splits_snapshot(spark, tmp_path):
    """Round-9 (verdict item 3): ``maxFilesPerTrigger`` splits the
    INITIAL SNAPSHOT into bounded segments — a 100 TB table's backfill
    no longer arrives as ONE micro-batch — and the stream then tails
    normally. Segment offsets pin the snapshot version, so a restart
    replays identical immutable segments (exactly-once)."""
    t = ManagedTable.create(spark, tmp_path / "t")
    for i in range(8):  # eight 1-row files in the initial snapshot
        t.append(
            spark.range(i, i + 1).selectExpr(
                "id", "id*2 AS v", "concat('k',id) AS k"
            )
        )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = _tail_query(
        spark, t.root, out, ckpt, maxFilesPerTrigger="3"
    )
    try:
        q.processAllAvailable()
        assert spark.read.parquet(str(out)).count() == 8
        progress = [
            p for p in q.recentProgress if p["numInputRows"] > 0
        ]
        assert len(progress) >= 3  # 3+3+2 segments
        assert all(p["numInputRows"] <= 3 for p in progress)
        # the stream tails new commits after the snapshot completes
        t.append(
            spark.range(100, 101).selectExpr(
                "id", "id*2 AS v", "concat('k',id) AS k"
            )
        )
        q.processAllAvailable()
        assert spark.read.parquet(str(out)).count() == 9
    finally:
        q.stop()
    vals = sorted(r.id for r in spark.read.parquet(str(out)).collect())
    assert vals == list(range(8)) + [100]  # every row exactly once


def test_stream_rate_limit_option_validation(spark, tmp_path):
    from data_warehouse_copy_spark.sources.datasource import (
        ManagedTableStreamReader,
    )

    t = _mk(spark, tmp_path, n=2)
    with pytest.raises(Exception, match=">= 1"):
        ManagedTableStreamReader(
            str(t.root), {"maxcommitspertrigger": "0"}, t.read().schema
        )
    with pytest.raises(Exception, match="positive integer"):
        ManagedTableStreamReader(
            str(t.root), {"maxfilespertrigger": "many"}, t.read().schema
        )


def test_stream_max_bytes_per_trigger(spark, tmp_path):
    """Round-10 (verdict item 5): ``maxBytesPerTrigger`` — the
    size-based rate limit real backfills want. The initial snapshot
    splits where cumulative file bytes reach the budget, the tail
    includes commits until their added bytes reach it, exactly-once is
    preserved across a checkpoint restart, and a single over-budget
    file still makes progress (at least one file per batch)."""
    t = ManagedTable.create(spark, tmp_path / "t")
    for i in range(8):  # eight ~equal 1-row files
        t.append(
            spark.range(i, i + 1).selectExpr(
                "id", "id*2 AS v", "concat('k',id) AS k"
            )
        )
    sizes = [
        (t.root / f.path).stat().st_size for f in t.snapshot().files
    ]
    budget = int(2.5 * max(sizes))  # 3 files reach it, 2 do not
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = _tail_query(
        spark, t.root, out, ckpt, maxBytesPerTrigger=str(budget)
    )
    try:
        q.processAllAvailable()
        assert spark.read.parquet(str(out)).count() == 8
        progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(progress) >= 3  # 3+3+2 segments
        assert all(p["numInputRows"] <= 3 for p in progress)
        # tail: two commits whose combined bytes exceed the budget
        # arrive as separate capped batches
        for i in (100, 101):
            t.append(
                spark.range(i, i + 1).selectExpr(
                    "id", "id*2 AS v", "concat('k',id) AS k"
                )
            )
        seen = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        q.processAllAvailable()
        assert spark.read.parquet(str(out)).count() == 10
        tail = [p for p in q.recentProgress if p["numInputRows"] > 0][seen:]
        assert all(p["numInputRows"] <= 1 for p in tail)
    finally:
        q.stop()
    # restart: commits made while down arrive exactly once
    for i in (200, 201, 202):
        t.append(
            spark.range(i, i + 1).selectExpr(
                "id", "id*2 AS v", "concat('k',id) AS k"
            )
        )
    q2 = _tail_query(
        spark, t.root, out, ckpt, maxBytesPerTrigger=str(budget)
    )
    try:
        q2.processAllAvailable()
        vals = sorted(r.id for r in spark.read.parquet(str(out)).collect())
        assert vals == list(range(8)) + [100, 101, 200, 201, 202]
    finally:
        q2.stop()
    # at-least-one floor: a 1-byte budget still advances, one file/batch
    out2, ckpt2 = tmp_path / "out2", tmp_path / "ckpt2"
    q3 = _tail_query(spark, t.root, out2, ckpt2, maxBytesPerTrigger="1")
    try:
        q3.processAllAvailable()
        assert spark.read.parquet(str(out2)).count() == 13
        progress = [p for p in q3.recentProgress if p["numInputRows"] > 0]
        assert all(p["numInputRows"] <= 1 for p in progress)
    finally:
        q3.stop()
    # validation matches the other caps
    from data_warehouse_copy_spark.sources.datasource import (
        ManagedTableStreamReader,
    )

    with pytest.raises(Exception, match=">= 1"):
        ManagedTableStreamReader(
            str(t.root), {"maxbytespertrigger": "0"}, t.read().schema
        )


def test_drain_available_fully_drains_capped_stream(spark, tmp_path):
    """Round-10 (verdict item 7): ``drain_available`` re-runs a capped
    availableNow query until a run advances no offsets — the
    Delta-parity one-call full drain — exactly-once across the runs."""
    from data_warehouse_copy_spark.sources.datasource import (
        drain_available,
    )

    t = ManagedTable.create(spark, tmp_path / "t")
    for i in range(8):
        t.append(
            spark.range(i, i + 1).selectExpr(
                "id", "id*2 AS v", "concat('k',id) AS k"
            )
        )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    def start():
        return (
            spark.readStream.format("managed_table")
            .option("maxFilesPerTrigger", "3")
            .load(str(t.root))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )

    runs = drain_available(start, timeout_sec=120)
    assert runs >= 3  # 3+3+2 capped steps before the proving run
    vals = sorted(r.id for r in spark.read.parquet(str(out)).collect())
    assert vals == list(range(8))  # drained to the head, exactly once
    # a drained stream converges in one proving run
    assert drain_available(start, timeout_sec=120) == 1
    # and new commits drain on the next call, still exactly once
    t.append(
        spark.range(50, 51).selectExpr(
            "id", "id*2 AS v", "concat('k',id) AS k"
        )
    )
    drain_available(start, timeout_sec=120)
    vals = sorted(r.id for r in spark.read.parquet(str(out)).collect())
    assert vals == list(range(8)) + [50]


def test_stream_rate_caps_with_available_now_drain_progressively(
    spark, tmp_path
):
    """Trigger.AvailableNow latches ONE latestOffset as its terminal
    target (the Python DS API has no prepareForTriggerAvailableNow
    pacing hook), so a rate-capped source drains ONE capped step per
    RUN — pinned here: each run advances the checkpoint exactly-once
    and repeated runs drain the table fully, never duplicating or
    skipping a row."""
    t = ManagedTable.create(spark, tmp_path / "t")
    for i in range(8):
        t.append(
            spark.range(i, i + 1).selectExpr(
                "id", "id*2 AS v", "concat('k',id) AS k"
            )
        )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    def run_once() -> int:
        q = (
            spark.readStream.format("managed_table")
            .option("maxFilesPerTrigger", "3")
            .load(str(t.root))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(str(out)).count()

    assert [run_once() for _ in range(4)] == [3, 6, 8, 8]
    vals = sorted(r.id for r in spark.read.parquet(str(out)).collect())
    assert vals == list(range(8))  # exactly once across all runs
