"""Copy operators — the reference's ``TableCopyService.CopyTable`` re-expressed
as declarative DataFrame pipelines over :class:`ManagedTable`.

Reference semantics preserved (``TableCopyService.cs:94-170``):

- *range mode* (fact with a date column, ``useTruncate=false``): delete
  target rows with ``date_column BETWEEN [D1 00:00:00, D2 23:59:59.997]``
  then insert the same window from the source — here a single atomic
  ``overwrite_range`` commit (partition-pruned, no full-table rewrite);
- *truncate mode* (dim): ``TRUNCATE`` + full reload — here one atomic
  ``overwrite`` commit;
- *fact with no date column*: the reference warns, skips the delete, and
  appends the full source (``TableCopyService.cs:121,125-126``) — kept
  bit-for-bit (rerunning duplicates rows, same as the reference);
- the excluded columns ``Id`` / ``insert_datetime`` are never copied,
  case-insensitively (``TableCopyService.cs:152-161``).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehouse_copy_spark.sources.managed_table import ManagedTable
from data_warehouse_copy_spark.window import day_bounds

log = logging.getLogger(__name__)

DEFAULT_EXCLUDED = ("id", "insert_datetime")


def exclude_columns(
    df: DataFrame, excluded: tuple[str, ...] = DEFAULT_EXCLUDED
) -> DataFrame:
    """Projection by column exclusion, case-insensitive (reference O6,
    ``TableCopyService.cs:156-160``). Catalyst's ColumnPruning pushes the
    narrowed schema into the parquet scan."""
    lowered = {c.lower() for c in excluded}
    keep = [c for c in df.columns if c.lower() not in lowered]
    return df.select(*keep)


def windowed_scan(
    df: DataFrame, date_column: str, date_from: str, date_to: str
) -> DataFrame:
    """Range-filtered scan (reference O2, ``TableCopyService.cs:127-138``):
    raw-datetime ``BETWEEN`` with the ``23:59:59.997`` end bound. The filter
    is a plain comparison on the column, so Catalyst pushes it into the
    parquet scan (PushedFilters) / remote JDBC ``WHERE``."""
    start, end = day_bounds(date_from, date_to)
    return df.filter(F.col(date_column).between(F.lit(start), F.lit(end)))


@dataclass(frozen=True)
class CopyResult:
    table: str
    rows_copied: int
    rows_deleted: int
    mode: str  # "range" | "truncate" | "append_full"


def copy_table(
    source_df: DataFrame,
    target: ManagedTable,
    table_name: str,
    date_from: str | None,
    date_to: str | None,
    use_truncate: bool,
    date_column: str | None,
    excluded_columns: tuple[str, ...] = DEFAULT_EXCLUDED,
) -> CopyResult:
    """One table copy, one atomic commit (reference entry point B, §3.2)."""
    data = exclude_columns(source_df, excluded_columns)

    if use_truncate:
        rows = target.overwrite(data)
        return CopyResult(table_name, rows, -1, "truncate")

    if date_column:
        assert date_from and date_to, "range copy requires a date window"
        windowed = windowed_scan(data, date_column, date_from, date_to)
        deleted, written = target.overwrite_range(
            windowed, date_from, date_to, date_column=date_column
        )
        return CopyResult(table_name, written, deleted, "range")

    # Reference: no date column on a fact -> warn, skip delete, append all
    # (TableCopyService.cs:121-126).
    log.warning("Skipped delete/truncate for %s — no date column.", table_name)
    rows = target.append(data)
    return CopyResult(table_name, rows, 0, "append_full")
