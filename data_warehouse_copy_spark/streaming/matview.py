"""Materialized views over the continuous-aggregate engine (round-13).

``CREATE MATERIALIZED VIEW db.mv LOCATION '<path>' AS SELECT ... FROM
db.raw GROUP BY window(ts, '1 hour') [, dims...]`` ties the SQL surface
(grammar + catalog persistence in ``sql_dml``/``names``) to
:class:`~data_warehouse_copy_spark.streaming.rollup.ContinuousAggregate`
(the TimescaleDB-style day-scoped maintenance engine): the stored SELECT
becomes the rollup's aggregator, materialized into a day-partitioned
ManagedTable, with a CDC refresh cursor persisted in the catalog JSON.

The read path is EXACT at the raw head, not stale-until-refresh: reads
serve ``rollup rows of untouched days ∪ re-aggregated touched days``
where "touched" comes from the raw table's change feed past the cursor —
O(changed rows) to discover, O(touched days' raw data) to re-aggregate.
``REFRESH MATERIALIZED VIEW`` materializes exactly those days
(``refresh_from_changes``) and advances the cursor, bounding future read
cost; between refreshes the hybrid union keeps answers exact. This works
because the grammar REQUIRES day-aligned buckets (window durations
dividing 24 h), so every output row is a pure function of one day's raw
rows — the invariant the whole per-day machinery rests on.

Not in the reference (it has no SQL at all — SURVEY.md §2.1); the design
follows public systems: TimescaleDB continuous aggregates (real-time
aggregation = materialized ∪ raw tail), Delta/Databricks MV refresh.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_copy_spark.sources.managed_table import ManagedTable
from data_warehouse_copy_spark.streaming.rollup import ContinuousAggregate


class MaterializedView:
    """Runtime half of ``CREATE MATERIALIZED VIEW``: wraps the catalog
    metadata (stored SELECT, base table, store location, ts column,
    cursor) and serves build/read/refresh/staleness."""

    def __init__(self, spark: SparkSession, catalog, name: str):
        self.spark = spark
        self.catalog = catalog
        self.name = name
        self.meta = catalog.matview(name)

    # ------------------------------------------------------------ plumbing

    def _raw(self) -> ManagedTable:
        return ManagedTable(
            self.spark, self.catalog.root_of(self.meta["base"])
        )

    def _rollup(self) -> ContinuousAggregate:
        return ContinuousAggregate(
            self.spark,
            self.meta["location"],
            agg_fn=self.aggregate,
            ts_col=self.meta["ts_col"],
        )

    def aggregate(self, events: DataFrame) -> DataFrame:
        """Run the stored SELECT with the base-table reference swapped
        for ``events`` — the aggregator the rollup engine calls on
        day-restricted slices. Exact for any slice that is a whole
        number of days (the grammar guarantees day-aligned buckets)."""
        from data_warehouse_copy_spark.sources.sql_dml import (
            _VIEW_CLAUSE_WORDS,
            _tokenize,
        )

        v = f"__dwcs_mvsrc_{uuid.uuid4().hex[:12]}"
        events.createOrReplaceTempView(v)
        try:
            toks = _tokenize(self.meta["sql"])
            base = self.meta["base"].lower()
            short = base.split(".")[-1]
            out = []
            for i, t in enumerate(toks):
                if t.kind == "ident" and t.text.lower() == base:
                    out.append(f"`{v}`")
                    nxt = toks[i + 1] if i + 1 < len(toks) else None
                    if nxt is None or (
                        nxt.kind == "ident"
                        and nxt.text.lower() in _VIEW_CLAUSE_WORDS
                    ) or nxt.kind == "punct":
                        # no alias follows: supply the table short name
                        # so qualified refs (raw.col) keep resolving
                        out.append(f"AS {short}")
                else:
                    out.append(t.text)
            df = self.spark.sql(" ".join(out))
        finally:
            # the analyzed plan holds the relation; dropping the temp
            # view after spark.sql returns is safe
            self.spark.catalog.dropTempView(v)
        return df

    # ------------------------------------------------------------- actions

    def build(self) -> int:
        """Initial materialization (the CREATE flow): aggregate the raw
        table pinned at its current head, one commit; cursor = that
        head."""
        raw = self._raw()
        head = raw._head_version()
        n = self._rollup().backfill(raw.read(version=head))
        self.catalog.set_matview_cursor(self.name, head)
        self.meta["cursor"] = head
        return n

    def refresh(self) -> dict:
        """``REFRESH MATERIALIZED VIEW``: CDC-driven day-scoped refresh
        (``refresh_from_changes`` — cost ∝ changed rows + touched days'
        raw data, never history), then advance the persisted cursor."""
        res = self._rollup().refresh_from_changes(
            self._raw(), int(self.meta["cursor"])
        )
        self.catalog.set_matview_cursor(self.name, res["to_version"])
        self.meta["cursor"] = res["to_version"]
        return res

    def pending_days(self) -> "tuple[int, list[str]]":
        """(raw head version, days touched past the cursor) — the
        staleness surface. O(changed rows), no aggregation."""
        raw = self._raw()
        head = raw._head_version()
        cursor = int(self.meta["cursor"])
        if head <= cursor:
            return head, []
        days = sorted(
            str(r["d"])
            for r in raw.read_cdf(cursor, head)
            .select(F.to_date(self.meta["ts_col"]).alias("d"))
            .where(F.col("d").isNotNull())
            .distinct()
            .collect()
        )
        return head, days

    def read(self) -> DataFrame:
        """EXACT read at the raw head: rollup rows for days untouched
        since the cursor ∪ the stored aggregate over the touched days'
        raw rows (version-pinned). Between refreshes this is the
        TimescaleDB real-time-aggregation shape; after a refresh the
        touched set is empty and the read is the plain rollup scan."""
        store = ManagedTable(self.spark, self.meta["location"])
        head, days = self.pending_days()
        if not days:
            return store.read()
        from data_warehouse_copy_spark.streaming.rollup import (
            _day_span_bounds,
        )

        raw = self._raw()
        ts = self.meta["ts_col"]
        # manifest-level day bounds prune the raw scan (a Python DS
        # relation gets no pushed filters); the exact day-set filter
        # applies on top
        tail = raw.read(
            version=head, where=_day_span_bounds(ts, days)
        ).where(F.to_date(F.col(ts)).isin(days))
        fresh = self.aggregate(tail)
        return (
            store.read()
            .where(~F.to_date(F.col("window_start")).isin(days))
            .unionByName(fresh)
        )
