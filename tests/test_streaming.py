"""Structured Streaming tests over the events fixture.

Batch/stream parity is the core assertion: the same transform definition
must give identical results run as a batch DataFrame and fed incrementally
through readStream (watermark + append mode), modulo the documented
count_distinct -> approx_count_distinct substitution.
"""

import pytest
from pyspark.sql import functions as F

from data_warehouse_copy_spark.sources.managed_table import ManagedTable
from data_warehouse_copy_spark.streaming.events import (
    sessionize,
    stream_events_to_managed_table,
    tumbling_window_agg,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from data_warehouse_copy_spark.sources.catalog import load_table

    return load_table(spark, sf_dir, "events").cache()


def test_tumbling_window_batch(events):
    out = tumbling_window_agg(events, "1 hour").collect()
    assert len(out) > 0
    total = sum(r.n_events for r in out)
    assert total == events.count()
    for r in out:
        assert (r.window_end - r.window_start).total_seconds() == 3600
        assert r.n_users <= r.n_events


def test_session_window_matches_sessionize(events):
    from data_warehouse_copy_spark.streaming.events import session_window_agg

    native = session_window_agg(events, "30 minutes")
    rolled = sessionize(events, gap_minutes=30)
    # same session boundaries: compare (user, start, n_events, total_value)
    key = lambda r: (r["user_id"], r["session_start"], r["n_events"], r["total_value"])
    assert sorted(map(key, native.collect())) == sorted(map(key, rolled.collect()))


def test_sessionize_covers_all_events(events):
    sess = sessionize(events, gap_minutes=30)
    rows = sess.collect()
    assert sum(r.n_events for r in rows) == events.count()
    assert all(r.session_start <= r.session_end for r in rows)
    # session bounds of the same user never overlap
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 < s2


def test_stream_matches_batch(spark, events, sf_dir, tmp_path):
    target = ManagedTable.create(spark, str(tmp_path / "tbl"))
    q = stream_events_to_managed_table(
        spark,
        f"{sf_dir}/events.parquet",
        target,
        str(tmp_path / "ckpt"),
        window_duration="1 hour",
        watermark="0 seconds",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = target.read()
    # append mode only emits windows the watermark has passed; with a finite
    # fixture the final (max-ts) window may be withheld — compare on the
    # emitted windows only.
    batch = tumbling_window_agg(events, "1 hour")
    emitted = [r.window_start for r in got.select("window_start").distinct().collect()]
    assert len(emitted) > 0
    key = ["window_start", "event_type"]
    b = {
        tuple(r[k] for k in key): (r.n_events, r.total_value)
        for r in batch.filter(F.col("window_start").isin(emitted)).collect()
    }
    g = {tuple(r[k] for k in key): (r.n_events, r.total_value) for r in got.collect()}
    assert g == b


def test_watermark_drops_late_data(spark, events, tmp_path):
    """Late-data semantics: with a finite watermark, an event arriving far
    behind the stream's max timestamp is dropped from its (already closed)
    window; the aggregate emitted for that window excludes it."""
    from pyspark.sql import types as T

    from data_warehouse_copy_spark.sources.managed_table import ManagedTable
    from data_warehouse_copy_spark.streaming.events import (
        stream_events_to_managed_table,
    )

    src = str(tmp_path / "src")
    base = events.withColumn("ts", F.col("ts").cast("timestamp"))
    on_time = base.filter(F.col("event_id") != 0)
    # one event rewound to the very start of the stream = very late arrival
    min_ts = base.agg(F.min("ts")).collect()[0][0]
    late = base.filter(F.col("event_id") == 0).withColumn("ts", F.lit(min_ts))
    # phase 1: everything on time; phase 2 (strictly later micro-batch,
    # after the watermark has advanced): the late event
    on_time.coalesce(1).write.parquet(src)

    target = ManagedTable.create(spark, str(tmp_path / "tbl"))
    q = stream_events_to_managed_table(
        spark,
        src,
        target,
        str(tmp_path / "ckpt"),
        window_duration="1 hour",
        watermark="1 minute",
    )
    try:
        q.processAllAvailable()  # drain phase 1 -> watermark = max_ts - 1min
        late.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()  # phase 2: late event must be dropped
    finally:
        q.stop()
    got = target.read()
    # the late event's window already closed: its count excludes the event
    late_row = late.collect()[0]
    win_start = late_row["ts"].replace(minute=0, second=0, microsecond=0)
    emitted = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()
    }
    k = (win_start, late_row["event_type"])
    if k in emitted:
        expected_without_late = (
            on_time.filter(
                (F.col("ts") >= F.lit(win_start))
                & (F.col("ts") < F.lit(win_start) + F.expr("INTERVAL 1 HOUR"))
                & (F.col("event_type") == late_row["event_type"])
            ).count()
        )
        assert emitted[k] == expected_without_late


def test_sliding_window_batch(events):
    from data_warehouse_copy_spark.streaming.events import sliding_window_agg

    out = sliding_window_agg(events, "1 hour", "15 minutes").collect()
    # every event lands in exactly window/slide = 4 overlapping windows
    assert sum(r.n_events for r in out) == events.count() * 4
    for r in out:
        assert (r.window_end - r.window_start).total_seconds() == 3600
    # slide == window degenerates to the tumbling aggregate
    tumb = tumbling_window_agg(events, "1 hour")
    slid = sliding_window_agg(events, "1 hour", "1 hour")
    key = lambda r: (r["window_start"], r["event_type"], r["n_events"], r["total_value"])
    assert sorted(map(key, slid.collect())) == sorted(map(key, tumb.collect()))


def test_sliding_window_stream_matches_batch(spark, events, tmp_path):
    from data_warehouse_copy_spark.streaming.events import sliding_window_agg

    src = str(tmp_path / "src")
    base = events.withColumn("ts", F.col("ts").cast("timestamp"))
    base.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(base.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    agg = sliding_window_agg(stream, "1 hour", "15 minutes",
                             watermark="0 seconds", streaming=True)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("slide_par")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM slide_par")
    emitted = [r.window_start for r in got.select("window_start").distinct().collect()]
    assert emitted
    batch = sliding_window_agg(events, "1 hour", "15 minutes")
    key = ["window_start", "event_type"]
    b = {
        tuple(r[k] for k in key): (r.n_events, r.total_value)
        for r in batch.filter(F.col("window_start").isin(emitted)).collect()
    }
    g = {tuple(r[k] for k in key): (r.n_events, r.total_value) for r in got.collect()}
    assert g == b


def test_enrich_with_dim_batch(spark, events, sf_dir):
    from data_warehouse_copy_spark.sources.catalog import load_table
    from data_warehouse_copy_spark.streaming.events import enrich_with_dim

    customer = load_table(spark, sf_dir, "customer")
    out = enrich_with_dim(events, customer, {"user_id": "c_custkey"})
    # left outer: every event survives, dim attrs attached where keys match
    assert out.count() == events.count()
    assert "c_mktsegment" in out.columns and "c_custkey" not in out.columns
    matched = out.filter(F.col("c_mktsegment").isNotNull()).count()
    expected = (
        events.join(
            customer, events.user_id == customer.c_custkey, "left_semi"
        ).count()
    )
    assert matched == expected


def test_enrich_with_dim_stream(spark, events, sf_dir, tmp_path):
    from data_warehouse_copy_spark.sources.catalog import load_table
    from data_warehouse_copy_spark.streaming.events import enrich_with_dim

    customer = load_table(spark, sf_dir, "customer")
    src = str(tmp_path / "src")
    base = events.withColumn("ts", F.col("ts").cast("timestamp"))
    base.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(base.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        enrich_with_dim(stream, customer, {"user_id": "c_custkey"})
        .writeStream.outputMode("append")
        .format("memory").queryName("enriched")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM enriched")
    assert got.count() == events.count()
    assert "c_mktsegment" in got.columns


class TestContinuousAggregate:
    """Incremental rollup maintenance: refresh_day must cost one day's scan
    and keep the rollup exactly equal to the from-scratch aggregate."""

    @staticmethod
    def _full(events, upto=None):
        src = events if upto is None else events.filter(F.col("ts") < F.lit(upto))
        return {tuple(map(str, r)) for r in tumbling_window_agg(src).collect()}

    def test_successive_refreshes_equal_full_aggregate(
        self, spark, events, tmp_path
    ):
        from data_warehouse_copy_spark.streaming.rollup import ContinuousAggregate

        ca = ContinuousAggregate(spark, str(tmp_path / "rollup"))
        ca.backfill(events.filter(F.col("ts") < F.lit("2024-01-10")))
        # two closed days arrive, one refresh each — cost ∝ that day's data
        ca.refresh_day(events, "2024-01-10")
        ca.refresh_day(events, "2024-01-11")
        got = {tuple(map(str, r)) for r in ca.store.read().collect()}
        assert got == self._full(events, "2024-01-12")

    def test_refresh_is_idempotent_and_serve_is_exact(
        self, spark, events, tmp_path
    ):
        from data_warehouse_copy_spark.streaming.rollup import ContinuousAggregate

        ca = ContinuousAggregate(spark, str(tmp_path / "rollup"))
        ca.backfill(events.filter(F.col("ts") < F.lit("2024-01-10")))
        ca.refresh_day(events, "2024-01-10")
        deleted, inserted = ca.refresh_day(events, "2024-01-10")  # replay
        assert deleted == inserted  # replaced, not duplicated
        served = ca.serve(events.filter(F.col("ts") >= F.lit("2024-01-11")))
        got = {tuple(map(str, r)) for r in served.collect()}
        assert got == self._full(events)


def test_refresh_days_scattered_is_one_commit_and_exact(
    spark, events, tmp_path
):
    """Round-14: a scattered invalidation set refreshes as ONE aggregate
    pass + ONE atomic day-set commit (the old per-consecutive-run loop
    paid one commit per run — 60 scattered days = 60 commits, the 6x
    cost the r14 stress harness measured). Value-exactness: untouched
    days in between keep their files verbatim (set membership, never a
    range over-replace) and the store equals the from-scratch aggregate
    after the swap."""
    from data_warehouse_copy_spark.streaming.rollup import ContinuousAggregate

    ca = ContinuousAggregate(spark, str(tmp_path / "rollup"))
    ca.backfill(events.filter(F.col("ts") < F.lit("2024-01-12")))
    before_files = {
        f.path: f.partition for f in ca.store.snapshot().files
    }
    head_before = ca.store._head_version()
    # days 10 and... 08: scattered (a gap at 09 and 11)
    n_del, n_ins = ca.refresh_days(events, ["2024-01-10", "2024-01-08"])
    assert n_del > 0 and n_ins > 0
    # ONE commit for the whole scattered set
    assert ca.store._head_version() == head_before + 1
    after = ca.store.snapshot().files
    untouched = {
        p: d for p, d in before_files.items()
        if d not in ("2024-01-08", "2024-01-10")
    }
    # every untouched day's file (incl. the 09/11 gap days) survives verbatim
    assert untouched == {
        f.path: f.partition for f in after
        if f.partition not in ("2024-01-08", "2024-01-10")
    }
    got = {tuple(map(str, r)) for r in ca.store.read().collect()}
    full = {
        tuple(map(str, r))
        for r in tumbling_window_agg(
            events.filter(F.col("ts") < F.lit("2024-01-12"))
        ).collect()
    }
    assert got == full


def test_refresh_day_rewrites_only_that_days_files(spark, events, tmp_path):
    """The rollup store is partitioned by window_start's day, so refresh_day
    must be a metadata-only partition replace: every file belonging to other
    days survives the refresh untouched (cost ∝ the refreshed day, not
    history)."""
    from data_warehouse_copy_spark.streaming.rollup import ContinuousAggregate

    ca = ContinuousAggregate(spark, str(tmp_path / "rollup"))
    ca.backfill(events.filter(F.col("ts") < F.lit("2024-01-10")))
    before = {f.path for f in ca.store.snapshot().files}
    assert before  # backfill materialized something
    ca.refresh_day(events, "2024-01-10")
    after = ca.store.snapshot().files
    other_days = {f.path for f in after if f.partition != "2024-01-10"}
    # every pre-refresh file of other days is still referenced verbatim
    assert before <= {f.path for f in after}
    assert other_days == before
    assert any(f.partition == "2024-01-10" for f in after)


def test_stream_sink_hash_equals_batch_twin(spark, events, tmp_path):
    """FULL batch≡stream equivalence, same harness as the oracle checks:
    the whole events fixture goes through a real readStream + watermark +
    foreachBatch into a ManagedTable, then a sentinel event 2 h past max ts
    advances the watermark so append mode releases EVERY real window; the
    sink is then compared to the batch events_hourly twin row-for-row on
    sorted normalized values (not just on emitted-window subsets).

    n_users is exact count_distinct in batch but approx_count_distinct in
    streaming (exact isn't incremental); HLL++ is exact at the fixture's
    per-window cardinalities, so the comparison stays strict equality —
    asserted separately so a future fixture change points at the right
    cause."""
    from tests.test_entry_contract import _rows_to_set

    src = str(tmp_path / "src")
    base = events.withColumn("ts", F.col("ts").cast("timestamp"))
    base.coalesce(1).write.parquet(src)

    target = ManagedTable.create(spark, str(tmp_path / "tbl"))
    q = stream_events_to_managed_table(
        spark, src, target, str(tmp_path / "ckpt"),
        window_duration="1 hour", watermark="0 seconds",
    )
    try:
        q.processAllAvailable()
        max_ts = base.agg(F.max("ts")).collect()[0][0]
        sentinel = base.limit(1).select(
            (F.lit(max_ts) + F.expr("INTERVAL 2 HOURS")).alias("ts"),
            F.lit("__sentinel__").alias("event_type"),
            *[
                F.col(c)
                for c in base.columns
                if c not in ("ts", "event_type")
            ],
        ).select(*base.columns)
        sentinel.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = target.read().filter(F.col("event_type") != "__sentinel__")
    batch = tumbling_window_agg(events, "1 hour")

    cols = ["window_start", "window_end", "event_type", "n_events", "total_value"]
    g = _rows_to_set(cols, [tuple(r) for r in got.select(*cols).collect()])
    b = _rows_to_set(cols, [tuple(r) for r in batch.select(*cols).collect()])
    assert len(g) == len(b) and g == b  # every window, hash-equal

    # distinct users: approx (stream) must equal exact (batch) here
    key_cols = ["window_start", "event_type", "n_users"]
    gu = _rows_to_set(key_cols, [tuple(r) for r in got.select(*key_cols).collect()])
    bu = _rows_to_set(key_cols, [tuple(r) for r in batch.select(*key_cols).collect()])
    assert gu == bu


def test_stream_sink_retry_does_not_double_write(spark, events, tmp_path):
    """Simulated foreachBatch retry against the real stream sink: replaying
    an epoch that already committed must not change the table (the
    txn-watermark idempotence that closes the at-least-once gap between a
    micro-batch commit and its checkpoint write)."""
    from pathlib import Path

    src = str(tmp_path / "src")
    events.withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(src)
    target = ManagedTable.create(spark, str(tmp_path / "tbl"))
    q = stream_events_to_managed_table(
        spark, src, target, str(tmp_path / "ckpt"),
        window_duration="1 hour", watermark="0 seconds",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    txns = target.snapshot().txns or {}
    assert txns, "stream sink should record txn watermarks"
    before = sorted(map(tuple, target.read().collect()))
    app = f"stream:{Path(str(tmp_path / 'ckpt')).resolve()}"
    assert app in txns
    # replay an already-seen epoch through the same app id
    assert target.append(target.read().limit(3), txn=(app, 0)) == 0
    assert sorted(map(tuple, target.read().collect())) == before


def test_checkpoint_reset_against_kept_table_fails_loudly(spark, events, tmp_path):
    """Deleting the checkpoint while keeping the table would replay epochs
    from 0 under an old watermark — every batch silently skipped. The sink
    must refuse to start instead."""
    src = str(tmp_path / "src")
    events.withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(src)
    target = ManagedTable.create(spark, str(tmp_path / "tbl"))
    q = stream_events_to_managed_table(
        spark, src, target, str(tmp_path / "ckpt"),
        window_duration="1 hour", watermark="0 seconds",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import shutil

    shutil.rmtree(tmp_path / "ckpt")  # the operator resets the checkpoint
    with pytest.raises(ValueError, match="txn watermark"):
        stream_events_to_managed_table(
            spark, src, target, str(tmp_path / "ckpt"),
            window_duration="1 hour", watermark="0 seconds",
        )


class TestSketchRollup:
    def test_merged_sketches_match_exact_distinct(self, spark, events, tmp_path):
        """HLL sketches merged across days must estimate the true range
        distinct within the published error bound (and be exact at the
        fixture's small per-key cardinalities)."""
        from data_warehouse_copy_spark.streaming.rollup import SketchRollup

        ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
        sr = SketchRollup(spark, str(tmp_path / "sk"))
        sr.backfill(ev)
        lo, hi = "2024-01-05", "2024-01-12"
        got = {
            r.event_type: r.n_distinct for r in sr.distinct_over(lo, hi).collect()
        }
        in_range = ev.filter(
            (F.to_date("ts") >= F.lit(lo)) & (F.to_date("ts") <= F.lit(hi))
        )
        exact = {
            r.event_type: r.n
            for r in in_range.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n"))
            .collect()
        }
        assert set(got) == set(exact)
        for k, n in exact.items():
            assert abs(got[k] - n) <= max(1, 0.05 * n), (k, got[k], n)
        # rows covered must be exact (plain sum, not sketched)
        total_rows = sum(
            r.n_rows for r in sr.distinct_over(lo, hi).collect()
        )
        assert total_rows == in_range.count()

    def test_refresh_day_is_idempotent_and_incremental(self, spark, events, tmp_path):
        from data_warehouse_copy_spark.streaming.rollup import SketchRollup

        ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
        day = "2024-01-10"
        sr = SketchRollup(spark, str(tmp_path / "sk"))
        sr.backfill(ev.filter(F.to_date("ts") < F.lit(day)))
        v0 = sr.store.snapshot().version
        sr.refresh_day(ev, day)
        sr.refresh_day(ev, day)  # re-refresh replaces, never duplicates
        one_day = sr.distinct_over(day, day, by_key=False).collect()[0]
        exact = ev.filter(F.to_date("ts") == F.lit(day)).select(
            "user_id"
        ).distinct().count()
        assert abs(one_day.n_distinct - exact) <= max(1, 0.05 * exact)
        # the refresh touched only the one day partition (metadata check)
        m = sr.store.snapshot()
        assert m.version == v0 + 2
        days = {f.partition for f in m.files}
        assert day in days and len(days) > 1


def test_stream_stream_join_matches_batch(spark, events, tmp_path):
    """STREAM-STREAM windowed join parity: clicks and purchases arrive as
    two independent readStream sources (different micro-batches, so the
    join must buffer one side in the state store), and the drained result
    must equal the batch twin exactly — inner-join rows emit eagerly on
    match; the both-side watermarks only govern state eviction."""
    from data_warehouse_copy_spark.streaming.events import (
        stream_stream_click_attribution,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = events.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks_b = base.filter(F.col("event_type") == "click")
    purch_b = base.filter(F.col("event_type") == "purchase")
    c_src, p_src = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks_b.coalesce(1).write.parquet(c_src)
    purch_b.coalesce(1).write.parquet(p_src)

    c_stream = (
        spark.readStream.schema(clicks_b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(c_src)
    )
    p_stream = (
        spark.readStream.schema(purch_b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(p_src)
    )
    joined = stream_stream_click_attribution(
        c_stream, p_stream, max_delay="30 minutes", streaming=True
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_attr")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    key = lambda r: (
        r["user_id"],
        r["click_id"],
        r["purchase_id"],
        r["delay_seconds"],
        r["purchase_value"],
    )
    got = sorted(map(key, spark.sql("SELECT * FROM ss_attr").collect()))
    batch = sorted(
        map(
            key,
            stream_stream_click_attribution(
                clicks_b, purch_b, max_delay="30 minutes"
            ).collect(),
        )
    )
    assert len(got) > 0
    assert got == batch


def test_stream_stream_outer_join_matches_batch(spark, events, tmp_path):
    """LEFT-OUTER stream-stream parity: unattributed clicks must emit with
    NULL purchase columns, but only once the purchase watermark PROVES no
    match can arrive — so after draining the real data, sentinel events 10
    days past max ts advance both watermarks and flush every pending outer
    row. The flushed result (sentinels excluded) must equal the batch LEFT
    JOIN exactly, including the NULL rows."""
    from data_warehouse_copy_spark.streaming.events import (
        stream_stream_click_attribution,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = events.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks_b = base.filter(F.col("event_type") == "click")
    purch_b = base.filter(F.col("event_type") == "purchase")
    c_src, p_src = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks_b.coalesce(1).write.parquet(c_src)
    purch_b.coalesce(1).write.parquet(p_src)

    c_stream = (
        spark.readStream.schema(clicks_b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(c_src)
    )
    p_stream = (
        spark.readStream.schema(purch_b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(p_src)
    )
    joined = stream_stream_click_attribution(
        c_stream, p_stream, max_delay="30 minutes", streaming=True,
        how="left_outer",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_attr_outer")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        max_ts = base.agg(F.max("ts")).collect()[0][0]

        def sentinel(src_df):
            return src_df.limit(1).select(
                (F.lit(max_ts) + F.expr("INTERVAL 10 DAYS")).alias("ts"),
                F.lit(-1).cast(
                    dict(src_df.dtypes)["user_id"]
                ).alias("user_id"),
                *[
                    F.col(c)
                    for c in src_df.columns
                    if c not in ("ts", "user_id")
                ],
            ).select(*src_df.columns)

        sentinel(clicks_b).coalesce(1).write.mode("append").parquet(c_src)
        sentinel(purch_b).coalesce(1).write.mode("append").parquet(p_src)
        q.processAllAvailable()
    finally:
        q.stop()

    key = lambda r: (
        r["user_id"], r["click_id"], r["purchase_id"], r["delay_seconds"],
        r["purchase_value"],
    )
    got = sorted(
        key(r)
        for r in spark.sql("SELECT * FROM ss_attr_outer").collect()
        if r["user_id"] != -1
    )
    batch = sorted(
        map(
            key,
            stream_stream_click_attribution(
                clicks_b, purch_b, max_delay="30 minutes", how="left_outer"
            ).collect(),
        )
    )
    n_null = sum(1 for r in got if r[2] is None)
    assert n_null > 0, "outer rows must actually flush"
    assert len(got) > len([r for r in got if r[2] is not None]) > 0
    assert got == batch


def test_stream_curation_matches_sequential_batches(spark, sf_dir, tmp_path):
    """End-to-end streaming curation: scrub -> quality filter -> in-batch
    dedup -> corpus-incremental dedup -> exactly-once append, as two
    ordered micro-batches. The drained table must equal running
    curate_batch sequentially (batch 2 deduped against batch 1's curated
    fingerprints): planted PII is scrubbed, boilerplate docs are dropped,
    verbatim re-arrivals are dropped, and fingerprints are unique."""
    from data_warehouse_copy_spark.streaming.curation import (
        curate_batch,
        stream_curate_documents,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact someone"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.org now"),
            ),
        ).otherwise(F.col("text")),
    ).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.col("text"), F.lit("\nbuy now\nbuy now\nbuy now")),
        ).otherwise(F.col("text")),
    )
    b1 = planted.filter(F.col("doc_id") < 300)
    rearrivals = b1.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    b2 = planted.filter(F.col("doc_id") >= 300).unionByName(rearrivals)

    src = str(tmp_path / "src")
    b1.coalesce(1).write.parquet(src)
    target = ManagedTable.create(spark, str(tmp_path / "corpus"))
    q = stream_curate_documents(
        spark, src, target, str(tmp_path / "ckpt"), schema=b1.schema
    )
    try:
        q.processAllAvailable()  # batch 1 fully curated before batch 2 lands
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    c1 = curate_batch(b1)
    c2 = curate_batch(b2, c1.select("fp"))
    expected = sorted(map(tuple, c1.unionByName(c2).collect()))
    got_rows = target.read().collect()
    got = sorted(map(tuple, got_rows))
    assert len(got) > 0 and got == expected

    fps = [r.fp for r in got_rows]
    assert len(fps) == len(set(fps))                       # corpus-unique
    ids = {r.doc_id for r in got_rows}
    assert not any(i >= 10000 for i in ids)                # re-arrivals dropped
    assert not any(i % 11 == 0 for i in ids if i < 300)    # boilerplate dropped
    assert any(i % 7 == 0 for i in ids)                    # scrubbed docs kept…
    assert all("@" not in r.text for r in got_rows)        # …with PII redacted


def test_stream_curation_from_bronze_table(spark, sf_dir, tmp_path):
    """Bronze→silver medallion loop over the managed_table stream source:
    raw documents land in a bronze ManagedTable by ANY ingest path, the
    curation query tails its commit log (initial snapshot, then O(new
    commits) per trigger), and the silver table must equal sequential
    curate_batch over the same arrival order — including across a
    query restart from the checkpoint."""
    from data_warehouse_copy_spark.streaming.curation import (
        curate_batch,
        stream_curate_from_table,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    b1 = docs.filter(F.col("doc_id") < 300)
    rearrivals = b1.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    b2 = docs.filter(F.col("doc_id") >= 300).unionByName(rearrivals)

    bronze = ManagedTable.create(spark, str(tmp_path / "bronze"))
    bronze.append(b1)
    silver = ManagedTable.create(spark, str(tmp_path / "silver"))
    ckpt = str(tmp_path / "ckpt")
    q = stream_curate_from_table(spark, str(bronze.root), silver, ckpt)
    try:
        q.processAllAvailable()  # batch 1 curated before batch 2 lands
    finally:
        q.stop()
    bronze.append(b2)  # arrives while the query is down
    q2 = stream_curate_from_table(spark, str(bronze.root), silver, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    c1 = curate_batch(b1)
    c2 = curate_batch(b2, c1.select("fp"))
    expected = sorted(map(tuple, c1.unionByName(c2).collect()))
    got_rows = silver.read().collect()
    got = sorted(map(tuple, got_rows))
    assert len(got) > 0 and got == expected
    fps = [r.fp for r in got_rows]
    assert len(fps) == len(set(fps))             # corpus-unique across restart
    assert not any(r.doc_id >= 10000 for r in got_rows)  # re-arrivals dropped


def test_session_window_stream_matches_batch(spark, events, tmp_path):
    """Native session_window under a real readStream: sessions only emit
    once the watermark proves the gap closed, so a sentinel event 2 days
    past max ts flushes every real session; the drained result (sentinel
    excluded) must equal the batch twin exactly — including the merge of
    multi-batch fragments of the same session into one row."""
    from data_warehouse_copy_spark.streaming.events import session_window_agg

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = str(tmp_path / "src")
    base = events.withColumn("ts", F.col("ts").cast("timestamp"))
    base.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = session_window_agg(stream, "30 minutes", watermark="0 seconds",
                             streaming=True)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("sess_par")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        max_ts = base.agg(F.max("ts")).collect()[0][0]
        sentinel = base.limit(1).select(
            (F.lit(max_ts) + F.expr("INTERVAL 2 DAYS")).alias("ts"),
            F.lit(-1).cast(dict(base.dtypes)["user_id"]).alias("user_id"),
            *[F.col(c) for c in base.columns if c not in ("ts", "user_id")],
        ).select(*base.columns)
        sentinel.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    key = lambda r: (r["user_id"], r["session_start"], r["session_end"],
                     r["n_events"], r["total_value"])
    got = sorted(
        key(r)
        for r in spark.sql("SELECT * FROM sess_par").collect()
        if r["user_id"] != -1
    )
    batch = sorted(map(key, session_window_agg(base, "30 minutes").collect()))
    assert len(got) > 0
    assert got == batch


def test_curation_scores_by_content_not_id(spark):
    """Two DIFFERENT texts under one doc_id in a batch must be scored
    independently (fingerprint-keyed): the spammy version is dropped even
    though blending its bigrams with the clean version's would have
    slipped it under the bar."""
    from data_warehouse_copy_spark.streaming.curation import curate_batch

    clean = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    spam = "buy now " * 20
    df = spark.createDataFrame(
        [(42, clean, "en", "s0"), (42, spam.strip(), "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    rows = curate_batch(df).collect()
    assert len(rows) == 1 and rows[0].text == clean


def test_repetition_scores_rejects_colliding_columns(spark):
    from data_warehouse_copy_spark.functions.text import with_repetition_scores

    df = spark.createDataFrame(
        [(1, "a b c", 3)], "doc_id long, text string, n_tokens int"
    )
    with pytest.raises(ValueError, match="n_tokens"):
        with_repetition_scores(df)


def test_curation_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Losing the streaming checkpoint must not double-curate: a second run
    over the same source with a fresh checkpoint replays every micro-batch
    with the same epoch ids, and the per-(app, epoch) txn watermarks in the
    manifest turn each replayed append into a no-op."""
    from data_warehouse_copy_spark.streaming.curation import (
        stream_curate_documents,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    target = ManagedTable.create(spark, str(tmp_path / "corpus"))

    q = stream_curate_documents(
        spark, src, target, str(tmp_path / "ckpt1"), schema=docs.schema
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows_first = sorted(map(tuple, target.read().collect()))
    v_first = target.snapshot().version
    assert rows_first

    # checkpoint lost -> full replay from scratch against the SAME table
    q2 = stream_curate_documents(
        spark, src, target, str(tmp_path / "ckpt2"), schema=docs.schema
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert sorted(map(tuple, target.read().collect())) == rows_first
    # replayed epochs were skipped before writing, not appended-then-fixed
    assert target.read().count() == len(rows_first)
    assert target.snapshot().version == v_first


class TestDeclarativeCuration:
    """stream_curate_declarative: the foreachBatch-free curation DAG —
    managed_table source -> pure-projection curation -> stateful
    dropDuplicates -> managed_table exactly-once sink."""

    def test_drained_stream_equals_batch(self, spark, tmp_path, sf_dir):
        from data_warehouse_copy_spark.sources.managed_table import ManagedTable
        from data_warehouse_copy_spark.streaming.curation import (
            curate_batch,
            stream_curate_declarative,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        bronze = ManagedTable.create(spark, tmp_path / "bronze")
        bronze.append(docs.filter("doc_id % 2 = 0"))
        q = stream_curate_declarative(
            spark,
            str(tmp_path / "bronze"),
            str(tmp_path / "silver"),
            str(tmp_path / "ckpt"),
        )
        try:
            q.processAllAvailable()
            bronze.append(docs.filter("doc_id % 2 = 1"))
            q.processAllAvailable()
        finally:
            q.stop()
        silver = ManagedTable(spark, tmp_path / "silver").read()
        # fp-set equivalence with the batch pipeline over the whole corpus
        # (survivor doc_id may differ: engine dedup is arrival-order, the
        # batch operator picks min id — fp/text-derived columns cannot)
        batch = curate_batch(docs)
        assert {r.fp for r in silver.select("fp").collect()} == {
            r.fp for r in batch.select("fp").collect()
        }
        # exactly-once: a fresh query on the same checkpoint+appId replays
        # the committed range as txn no-ops — silver must not grow
        n = silver.count()
        q2 = stream_curate_declarative(
            spark,
            str(tmp_path / "bronze"),
            str(tmp_path / "silver"),
            str(tmp_path / "ckpt"),
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert ManagedTable(spark, tmp_path / "silver").read().count() == n

    def test_state_width_pinned_and_session_conf_restored(
        self, spark, tmp_path, sf_dir
    ):
        """Round-14: the stateful dedup's shuffle width is a per-stream
        knob (every micro-batch pays one state-store commit+fsync PER
        partition regardless of rows — width 32 measured 6.2 s addBatch
        vs 2.7 s at the default 8). The width must land in the
        checkpoint's offset metadata (the owner from then on), the
        session conf must come back untouched, and the curated fp set
        must be identical at any width (survivor choice was already
        arrival-order; emitted columns are text-derived)."""
        import glob
        import json

        from data_warehouse_copy_spark.sources.managed_table import (
            ManagedTable,
        )
        from data_warehouse_copy_spark.streaming.curation import (
            stream_curate_declarative,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        before_conf = spark.conf.get("spark.sql.shuffle.partitions")
        fps = {}
        for label, width in (("w8", 8), ("w3", 3)):
            bronze = ManagedTable.create(spark, tmp_path / f"bronze_{label}")
            bronze.append(docs)
            q = stream_curate_declarative(
                spark,
                str(tmp_path / f"bronze_{label}"),
                str(tmp_path / f"silver_{label}"),
                str(tmp_path / f"ckpt_{label}"),
                state_partitions=width,
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            assert (
                spark.conf.get("spark.sql.shuffle.partitions") == before_conf
            )
            off = sorted(glob.glob(str(tmp_path / f"ckpt_{label}/offsets/*")))
            pinned = None
            for line in open(off[0]):
                if "shuffle.partitions" in line:
                    pinned = json.loads(line)["conf"][
                        "spark.sql.shuffle.partitions"
                    ]
            assert pinned == str(width)
            fps[label] = {
                r.fp
                for r in ManagedTable(spark, tmp_path / f"silver_{label}")
                .read()
                .select("fp")
                .collect()
            }
        assert fps["w8"] == fps["w3"] and fps["w8"]

    def test_auto_state_width_derives_from_trigger_volume(
        self, spark, tmp_path, sf_dir
    ):
        """Round-15 (verdict item 6): the default width is no longer a
        constant — it derives from the declared first-trigger volume
        (the bronze manifest row count) at one store per 200k keys,
        floor 1, cap 1024. The small fixture must therefore pin width 1
        into the checkpoint, and the pure sizing function must scale up
        for large triggers instead of freezing small-trigger behavior
        into big deployments."""
        import glob
        import json

        from data_warehouse_copy_spark.sources.managed_table import (
            ManagedTable,
        )
        from data_warehouse_copy_spark.streaming.curation import (
            _STATE_KEYS_PER_PARTITION,
            _STATE_WIDTH_CAP,
            _auto_state_width,
            stream_curate_declarative,
        )

        # the sizing rule, both directions
        assert _auto_state_width(0) == 1
        assert _auto_state_width(2_500) == 1
        assert _auto_state_width(_STATE_KEYS_PER_PARTITION) == 1
        assert _auto_state_width(_STATE_KEYS_PER_PARTITION + 1) == 2
        assert _auto_state_width(100_000_000) == 500
        assert _auto_state_width(10**12) == _STATE_WIDTH_CAP

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        bronze = ManagedTable.create(spark, tmp_path / "bronze_auto")
        bronze.append(docs)
        before_conf = spark.conf.get("spark.sql.shuffle.partitions")
        q = stream_curate_declarative(
            spark,
            str(tmp_path / "bronze_auto"),
            str(tmp_path / "silver_auto"),
            str(tmp_path / "ckpt_auto"),
        )  # default state_partitions="auto"
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert spark.conf.get("spark.sql.shuffle.partitions") == before_conf
        off = sorted(glob.glob(str(tmp_path / "ckpt_auto/offsets/*")))
        pinned = None
        for line in open(off[0]):
            if "shuffle.partitions" in line:
                pinned = json.loads(line)["conf"][
                    "spark.sql.shuffle.partitions"
                ]
        assert pinned == "1"  # fixture volume << 200k keys
        # auto-width output identical to the batch twin's fp set
        from data_warehouse_copy_spark.streaming.curation import curate_batch

        silver = ManagedTable(spark, tmp_path / "silver_auto").read()
        assert {r.fp for r in silver.select("fp").collect()} == {
            r.fp for r in curate_batch(docs).select("fp").collect()
        }


def test_rollup_refresh_from_changes_converges_late_dml(spark, sf_dir, tmp_path):
    """VERDICT r6 item 6: a DV delete / in-place update on a CLOSED day
    leaves the heuristic rollup stale; the feed-driven refresh sees the
    change rows, invalidates exactly the touched days, and converges to
    the full recompute. The cursor advances and a replay is a no-op."""
    from data_warehouse_copy_spark.sources.managed_table import ManagedTable
    from data_warehouse_copy_spark.streaming.events import tumbling_window_agg
    from data_warehouse_copy_spark.streaming.rollup import ContinuousAggregate

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = ManagedTable.create(spark, tmp_path / "raw", partition_date_col="ts")
    raw.append(events)
    cursor = raw._head_version()
    ca = ContinuousAggregate(spark, str(tmp_path / "rollup"))
    ca.backfill(raw.read())

    def full():
        return {tuple(map(str, r)) for r in tumbling_window_agg(raw.read()).collect()}

    def rolled():
        return {tuple(map(str, r)) for r in ca.store.read().collect()}

    assert rolled() == full()
    # late DML on closed days
    n_del = raw.delete(
        [("event_type", "=", "error"), ("ts", "<", "2024-01-03 00:00:00")]
    )
    n_upd = raw.update(
        [("event_type", "=", "purchase"), ("ts", "<", "2024-01-02 00:00:00")],
        {"value": "value + 1000"},
    )
    assert n_del > 0 and n_upd > 0
    assert rolled() != full()  # the documented staleness, demonstrated
    res = ca.refresh_from_changes(raw, cursor)
    # only the touched days were invalidated (delete: days 1-2, update: day 1)
    assert res["days"] == ["2024-01-01", "2024-01-02"]
    assert rolled() == full()  # converged to the full recompute
    # cursor advances; replaying the SAME window is idempotent
    cursor = res["to_version"]
    again = ca.refresh_from_changes(raw, cursor)
    assert again["days"] == [] and again["to_version"] == cursor
    assert rolled() == full()
    # a fresh append on a NEW day flows through the same cursor
    extra = events.limit(50).withColumn(
        "ts", F.to_timestamp(F.lit("2024-02-01 12:00:00")).cast("timestamp_ntz")
    )
    raw.append(extra)
    res = ca.refresh_from_changes(raw, cursor)
    assert res["days"] == ["2024-02-01"]
    assert rolled() == full()
