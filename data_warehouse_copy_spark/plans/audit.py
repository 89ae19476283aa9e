"""Audit log — the reference's ``bronze.tbl_dw_copy_logs`` table
(``TableCopyService.cs:57-87,206-228``, ``TableUpdateService.cs:55-72,
194-214``) as an append-only managed table.

The reference inserts an "In Progress" row returning an identity ``Id``,
then updates that row with end time / status / row count in a ``finally``
block on a fresh connection. Spark appends cannot return identities and
in-place updates are anti-patterns on object storage, so the port is
event-sourced (SURVEY.md §7 risk 4): a client-generated run UUID keys a
*start* event and a *finish* event; ``current_status`` reconstructs the
reference's one-row-per-run view with a window function. Same observable
information, append-only writes.

Fidelity notes kept: the start row is written OUTSIDE the table's
transactional commit (reference ``:57`` precedes ``BeginTransaction`` at
``:89``) so failed runs leave a visible "Failed" record; the update path
reports the KEY count, not the row count (``TableUpdateService.cs:163``).
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_warehouse_copy_spark.sources.managed_table import ManagedTable

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),  # run UUID (not identity)
        T.StructField("event", T.StringType(), False),  # start | finish
        T.StructField("table_name", T.StringType(), False),
        T.StructField("start_time", T.TimestampType(), True),
        T.StructField("end_time", T.TimestampType(), True),
        T.StructField("start_date_param", T.StringType(), True),
        T.StructField("end_date_param", T.StringType(), True),
        T.StructField("date_column", T.StringType(), True),
        T.StructField("update_date_column", T.StringType(), True),
        T.StructField("primary_key", T.StringType(), True),
        T.StructField("process", T.StringType(), True),  # Copy | Update
        T.StructField("status", T.StringType(), True),  # In Progress | Completed | Failed
        T.StructField("records_copied", T.LongType(), True),
        T.StructField("error_message", T.StringType(), True),
    ]
)


class AuditLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.table = ManagedTable.create(spark, path)

    def start(
        self,
        table_name: str,
        process: str,
        start_date: str | None,
        end_date: str | None,
        date_column: str | None = None,
        update_date_column: str | None = None,
        primary_key: str | None = None,
    ) -> str:
        """Insert the 'In Progress' start event; returns the run UUID (the
        port of ``OUTPUT INSERTED.Id``, ``TableCopyService.cs:59``)."""
        run_id = str(uuid.uuid4())
        self._append(
            {
                "id": run_id,
                "event": "start",
                "table_name": table_name,
                "start_time": _now(),
                "start_date_param": start_date,
                "end_date_param": end_date,
                "date_column": date_column,
                "update_date_column": update_date_column,
                "primary_key": primary_key,
                "process": process,
                "status": "In Progress",
            }
        )
        return run_id

    def finish(
        self,
        run_id: str,
        table_name: str,
        process: str,
        status: str,
        records_copied: int,
        error_message: str | None = None,
    ) -> None:
        """Append the finish event (reference's finally-block UPDATE,
        ``TableCopyService.cs:206-228``)."""
        self._append(
            {
                "id": run_id,
                "event": "finish",
                "table_name": table_name,
                "end_time": _now(),
                "process": process,
                "status": status,
                "records_copied": records_copied,
                "error_message": error_message,
            }
        )

    def events(self) -> DataFrame:
        return self.table.read()

    def current_status(self) -> DataFrame:
        """One row per run, start fields merged with the latest finish fields
        — the shape of the reference's audit table."""
        ev = self.events()
        agg = ev.groupBy("id").agg(
            F.min("start_time").alias("start_time"),
            F.max("end_time").alias("end_time"),
            F.max_by(
                "status",
                F.struct((F.col("event") == "finish").alias("is_finish"), "end_time"),
            ).alias("status"),
            F.first("table_name").alias("table_name"),
            F.max("records_copied").alias("records_copied"),
            F.max("error_message").alias("error_message"),
            F.first("process", ignorenulls=True).alias("process"),
            F.first("start_date_param", ignorenulls=True).alias("start_date_param"),
            F.first("end_date_param", ignorenulls=True).alias("end_date_param"),
        )
        return agg

    def _append(self, row: dict) -> None:
        # Driver-side pyarrow write: audit events are single metadata rows;
        # a Spark job per event would dominate small-pipeline wall time.
        self.table.append_pylist([row], AUDIT_SCHEMA)


def _now() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)
