"""Job configuration and table classification.

Mirrors the reference's declarative job config (``appsettings.json:6-19``)
and its table-class dispatch (``BulkCopyManager.cs:87-104``): a job is a
source/target pair, a schedule mode or explicit date window, and a list of
table specs classified by ``(table_type, update_date_column, primary_key)``.

Spark-first differences: source/target are storage locations (parquet
directories / managed-table roots) or JDBC URLs instead of SqlConnection
strings; classification is a pure function over frozen dataclasses so it is
unit-testable without any I/O (the reference buries it inside ``Run()``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any


@dataclass(frozen=True)
class TableSpec:
    """One entry of the config's ``Tables`` list (``appsettings.json:13-18``).

    ``table_type`` is one of ``fact | dim | sproc | historical``
    (``BulkCopyManager.cs:100-104``).
    """

    table_name: str
    table_type: str
    date_column: str | None = None
    update_date_column: str | None = None
    primary_key: str | None = None


@dataclass(frozen=True)
class ClassifiedTables:
    """The five dispatch lists of ``BulkCopyManager.cs:100-104``.

    ``historical`` is classified but never processed — dead code in the
    reference (no loop consumes it; verified in SURVEY.md §1.1). We keep the
    same observable behavior: it is classified, logged, and skipped.
    """

    normal: tuple[TableSpec, ...]
    copy_update: tuple[TableSpec, ...]
    truncate: tuple[TableSpec, ...]
    sproc: tuple[TableSpec, ...]
    historical: tuple[TableSpec, ...]


def classify_tables(tables: list[TableSpec]) -> ClassifiedTables:
    """Partition table specs exactly as ``BulkCopyManager.cs:97-104``.

    - nameless entries are dropped (``:97``)
    - ``fact`` with NO update_date_column and NO primary_key -> normal
      (range delete + reload)
    - ``fact`` with BOTH -> copy_update (range reload + changed-PK upsert);
      a fact with only one of the two falls into NO list, same as reference
    - ``dim`` -> truncate (full reload, parallel)
    - ``sproc`` -> stored procedure passthrough
    - ``historical`` with update_date_column -> historical (never processed)
    """
    named = [t for t in tables if t.table_name]
    return ClassifiedTables(
        normal=tuple(
            t
            for t in named
            if t.table_type == "fact"
            and t.update_date_column is None
            and t.primary_key is None
        ),
        copy_update=tuple(
            t
            for t in named
            if t.table_type == "fact"
            and t.update_date_column is not None
            and t.primary_key is not None
        ),
        truncate=tuple(t for t in named if t.table_type == "dim"),
        sproc=tuple(t for t in named if t.table_type == "sproc"),
        historical=tuple(
            t
            for t in named
            if t.table_type == "historical" and t.update_date_column is not None
        ),
    )


@dataclass(frozen=True)
class JobConfig:
    """Full job config (reference ``appsettings.json`` + ``BulkCopyManager.cs:17-35``).

    ``source`` / ``target``: directory of per-table parquet files (source)
    and managed-table root (target). ``source_schema`` / ``target_schema``
    are kept for parity (they become subdirectory names when set, mirroring
    the reference's ``{schema}.{table}`` qualification).
    """

    source: str
    target: str
    source_schema: str = ""
    target_schema: str = ""
    schedule_mode: str | None = None
    date_from: str | None = None
    date_to: str | None = None
    tables: tuple[TableSpec, ...] = field(default_factory=tuple)
    # Columns never copied, case-insensitive (TableCopyService.cs:156-160).
    excluded_columns: tuple[str, ...] = ("id", "insert_datetime")
    # Path of the audit-log managed table (reference: bronze.tbl_dw_copy_logs,
    # TableCopyService.cs:57-60). Defaults to "<target>/_audit/tbl_dw_copy_logs".
    audit_table: str | None = None
    # Base dir for the month-bucketed dual log files (reference O20,
    # Program.cs:18-30); None disables file logging.
    log_dir: str | None = None

    def __post_init__(self) -> None:
        # Config validation per BulkCopyManager.cs:17-35: connection strings
        # (here: locations) and schemas are required -> throw on missing.
        if not self.source:
            raise ValueError("Source location missing in config.")
        if not self.target:
            raise ValueError("Target location missing in config.")

    @property
    def audit_table_path(self) -> str:
        if self.audit_table:
            return self.audit_table
        if self.target.lower().startswith("jdbc:"):
            raise ValueError(
                "audit_table must be set explicitly (a filesystem path) when "
                "the target is a jdbc: URL — the default derives from the "
                "target directory, which does not exist for database targets. "
                "Alternatively pass audit=False to run()."
            )
        return str(Path(self.target) / "_audit" / "tbl_dw_copy_logs")


def load_config(source: str | Path | dict[str, Any]) -> JobConfig:
    """Load a job config from a JSON file path or an already-parsed dict.

    Accepts both the reference's key layout (``ConnectionStrings`` +
    ``BulkCopyConfig`` with PascalCase keys, ``appsettings.json:1-20``) and a
    flat snake_case layout.
    """
    if isinstance(source, (str, Path)):
        raw = json.loads(Path(source).read_text())
    else:
        raw = source

    if "BulkCopyConfig" in raw:  # reference layout
        conn = raw.get("ConnectionStrings", {})
        bc = raw["BulkCopyConfig"]
        return JobConfig(
            source=conn.get("Source", ""),
            target=conn.get("Target", ""),
            source_schema=bc.get("SourceSchema", ""),
            target_schema=bc.get("TargetSchema", ""),
            schedule_mode=bc.get("ScheduleMode"),
            date_from=bc.get("DateFrom"),
            date_to=bc.get("DateTo"),
            tables=tuple(
                TableSpec(
                    table_name=t.get("table_name", ""),
                    table_type=t.get("table_type", ""),
                    date_column=t.get("date_column"),
                    update_date_column=t.get("update_date_column"),
                    primary_key=t.get("primary_key"),
                )
                for t in bc.get("Tables", [])
            ),
        )

    return JobConfig(
        source=raw.get("source", ""),
        target=raw.get("target", ""),
        source_schema=raw.get("source_schema", ""),
        target_schema=raw.get("target_schema", ""),
        schedule_mode=raw.get("schedule_mode"),
        date_from=raw.get("date_from"),
        date_to=raw.get("date_to"),
        tables=tuple(
            TableSpec(**t) if isinstance(t, dict) else t for t in raw.get("tables", [])
        ),
        excluded_columns=tuple(
            c.lower() for c in raw.get("excluded_columns", ("id", "insert_datetime"))
        ),
        audit_table=raw.get("audit_table"),
        log_dir=raw.get("log_dir"),
    )
