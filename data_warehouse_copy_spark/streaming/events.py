"""Structured Streaming over the ``events`` table (extension surface).

The reference is batch-only (SURVEY.md §2.1 — no streaming surface at all);
this module is the Spark-native streaming slice the BASELINE mandates: the
same aggregations work identically as batch DataFrame transforms (for the
DuckDB oracle) and as incremental streaming queries with watermarked late-
data handling (for the streaming tests, which feed the parquet fixture
through ``readStream``).

Design: every transform takes and returns DataFrames, so one definition
serves batch and streaming (Structured Streaming's core promise). Sinks go
through ``foreachBatch`` into :class:`ManagedTable` so each micro-batch is
one atomic manifest commit — exactly-once per batch on top of checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_copy_spark.sources.managed_table import ManagedTable


def tumbling_window_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
    streaming: bool = False,
) -> DataFrame:
    """Tumbling-window per-event-type aggregate: count, sum(value), distinct
    users (exact in batch, approximate in streaming — count_distinct is not
    supported incrementally).

    Output columns: window_start, window_end, event_type, n_events,
    total_value, n_users.
    """
    src = events.withWatermark("ts", watermark) if streaming else events
    distinct_users = (
        F.approx_count_distinct("user_id") if streaming else F.count_distinct("user_id")
    )
    return (
        src.groupBy(F.window("ts", window_duration), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # decimal-stable sum: cast-per-row is deterministic, the decimal
            # sum is exact (order-independent), the final double cast is IEEE
            # — so the value matches any engine computing the same way.
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
            distinct_users.alias("n_users"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    streaming: bool = False,
) -> DataFrame:
    """Gap-based sessions via Spark's native ``session_window`` — the
    streaming-capable twin of :func:`sessionize` (same gap-merge semantics;
    window_end = last event + gap). Works on batch frames too."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
    streaming: bool = False,
) -> DataFrame:
    """Sliding (hopping) window aggregate: each event lands in
    ``window/slide`` overlapping windows. Same batch/stream duality as
    :func:`tumbling_window_agg`; state per key is bounded by the watermark
    horizon ÷ slide, so the overlap factor — not the stream length — sets
    the memory bill at scale.

    Output: window_start, window_end, event_type, n_events, total_value.
    """
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window_duration, slide), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, on: dict) -> DataFrame:
    """Stream-static enrichment join: attach slowly-changing dimension
    attributes to an event stream. The static side is broadcast to every
    task, so the stream never shuffles and no state store is involved —
    the canonical scale pattern for stream-side lookups (the stateful
    alternative, stream-stream join, costs a state store per key).

    ``on`` maps stream column -> dim column, e.g. ``{"user_id": "c_custkey"}``.
    Works identically on batch frames (Structured Streaming's duality).
    """
    cond = None
    for s_col, d_col in on.items():
        c = F.col(f"__ev.{s_col}") == F.col(f"__dim.{d_col}")
        cond = c if cond is None else (cond & c)
    return (
        events.alias("__ev")
        .join(F.broadcast(dim.alias("__dim")), cond, "left_outer")
        .drop(*[d for d in on.values()])
    )


def stream_stream_click_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "30 minutes",
    click_watermark: str = "2 hours",
    purchase_watermark: str = "1 hour",
    streaming: bool = False,
    how: str = "inner",
) -> DataFrame:
    """Windowed STREAM-STREAM inner join: every (click, purchase) pair of
    the same user where the purchase lands within ``max_delay`` after the
    click — the click→purchase attribution pair stream. (The reference is
    batch-only; this is the extension surface's two-stream join, the one
    streaming shape :func:`enrich_with_dim`'s stream-static broadcast
    cannot express.)

    Streaming shape: BOTH sides carry event-time watermarks, and the join
    condition bounds ``purchase_ts`` to ``[click_ts, click_ts +
    max_delay]``. That time-range predicate is what lets Spark's state
    store evict: a buffered click can be dropped once the purchase
    watermark passes ``click_ts + max_delay``, a buffered purchase once
    the click watermark passes ``purchase_ts`` — so state is bounded by
    watermark horizon × event rate, not by stream length. Inner-join rows
    emit eagerly on match in append mode (the watermark governs eviction,
    not emission), so a drained finite stream yields exactly the batch
    result — pinned by tests/test_streaming.py.

    Works identically on batch frames (``streaming=False``); the batch
    twin is the DuckDB-oracled ``events_click_attribution`` query.

    ``how="left_outer"`` additionally emits every UNATTRIBUTED click with
    NULL purchase columns — the abandonment stream. In streaming mode the
    NULL row for a click can only emit once the state store PROVES no
    purchase can still arrive, i.e. when the purchase watermark passes
    ``click_ts + max_delay`` — so outer results trail the watermark (an
    inherent property of watermarked outer joins, not a bug), and a
    drained-plus-sentinel stream equals the batch LEFT JOIN exactly
    (tests pin this). Same bounded state as the inner form."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if streaming:
        c = c.withWatermark("click_ts", click_watermark)
        p = p.withWatermark("purchase_ts", purchase_watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    return c.join(p, cond, how).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("delay_seconds"),
        "purchase_value",
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (batch form): a new session starts when the
    gap to the previous event of the same user exceeds ``gap_minutes``.

    Classic lag + conditional cumsum over a per-user window — one shuffle on
    user_id. (The streaming equivalent is ``session_window(ts, gap)``;
    see ``tests/test_streaming.py``.) Output: one row per session with
    bounds and event count.
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_s = gap_minutes * 60
    with_breaks = events.withColumn(
        "_new_session",
        F.when(
            (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
                > gap_s
            )
            | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    with_ids = with_breaks.withColumn(
        "session_seq",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_ids.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once dedup: drop rows whose ``keys`` were already
    seen within the watermark horizon (``dropDuplicatesWithinWatermark``) —
    the streaming twin of the batch exact dedup. State is bounded by the
    watermark, so it runs forever at 100 TB/day; an at-least-once upstream
    (e.g. Kafka replays) becomes exactly-once downstream."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def stream_events_to_managed_table(
    spark,
    source_dir: str,
    target: ManagedTable,
    checkpoint_dir: str,
    schema=None,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
):
    """Streaming ingest demo: parquet-source stream -> watermarked tumbling
    aggregate -> ``foreachBatch`` append into a ManagedTable (each
    micro-batch one atomic commit). Returns the StreamingQuery; callers
    ``processAllAvailable()`` + ``stop()`` to drain a finite fixture.

    The raw file schema is discovered via a batch read so TIMESTAMP(NANOS)
    columns (read as longs under nanosAsLong) are restored to timestamps
    before the watermark is applied."""
    from pathlib import Path

    from data_warehouse_copy_spark.sources.catalog import (
        ns_timestamp_columns,
        restore_ns_timestamps,
    )

    ns_cols = ns_timestamp_columns(Path(source_dir))
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # UTC so the NTZ<->TIMESTAMP casts below are identity on the instant
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = schema if schema is not None else spark.read.parquet(source_dir).schema
    if Path(source_dir).is_file():
        # FileStreamSource needs a directory; stage a symlink to single-file
        # fixtures next to the checkpoint.
        staged = Path(checkpoint_dir).parent / (Path(checkpoint_dir).name + "_src")
        staged.mkdir(parents=True, exist_ok=True)
        link = staged / Path(source_dir).name
        if not link.exists():
            link.symlink_to(source_dir)
        source_dir = str(staged)
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    stream = restore_ns_timestamps(stream, ns_cols)
    # Watermarks require TIMESTAMP (not NTZ); the sink casts window bounds
    # back to NTZ so streamed output is schema-identical to the batch form.
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = tumbling_window_agg(
        stream, window_duration, watermark, streaming=True
    )

    # Stable per-stream id: checkpoint identity == stream identity. With
    # txn=(app, epoch) the sink append is idempotent, closing the
    # foreachBatch at-least-once gap (a micro-batch retried after a crash
    # between commit and checkpoint presents the same epoch and is
    # skipped) — true end-to-end exactly-once into the ManagedTable.
    txn_app = f"stream:{Path(checkpoint_dir).resolve()}"
    # Guard the txnAppId footgun: deleting the checkpoint restarts epoch
    # numbering at 0, so a kept table's old watermark would silently
    # swallow every replayed micro-batch. Fail loudly instead and make the
    # operator choose (fresh table / fresh checkpoint path).
    fresh_checkpoint = not (Path(checkpoint_dir) / "offsets").exists()
    if (
        fresh_checkpoint
        and target.exists()
        and (target.snapshot().txns or {}).get(txn_app) is not None
    ):
        raise ValueError(
            f"checkpoint {checkpoint_dir} is new but target table already "
            f"holds a txn watermark for {txn_app!r}: replayed epochs would "
            f"be silently skipped. Reprocess into a fresh table, or use a "
            f"different checkpoint path."
        )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = batch_df
        for f in batch_df.schema.fields:
            if f.dataType.typeName() == "timestamp":
                out = out.withColumn(f.name, F.col(f.name).cast("timestamp_ntz"))
        target.append(out, txn=(txn_app, epoch_id))

    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )
