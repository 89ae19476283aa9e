"""Upsert operators — the reference's ``TableUpdateService.UpdateTable``
re-expressed as a join-based MERGE.

Reference semantics (``TableUpdateService.cs:76-172``):

1. *changed keys*: PKs whose ``update_date_column`` day falls in the window
   but whose ``date_column`` day does NOT — ``CAST(col AS DATE) BETWEEN``
   day-granularity on both sides, with a ``NOT IN`` anti-join
   (``TableUpdateService.cs:81-88``);
2. for those keys: delete from target + re-insert the *current* source rows
   (whole rows, not window-filtered) in 2000-key batches inside one
   transaction (``:108-161``);
3. the reported metric is the **key count**, not the row count (``:163``).

Spark-first re-expression: the key set stays a DataFrame end-to-end
(``left_anti`` / ``left_semi`` joins — reference O8's driver-side
``List<object>`` collect and O9/O10's per-2000 batches are deliberately not
ported; at 100 TB the key set may not fit on the driver and the join is one
shuffle instead of ``n/2000`` round trips). The delete+reinsert pair becomes
one atomic :meth:`ManagedTable.merge_by_key` commit that rewrites only the
partitions containing affected keys.

``NOT IN`` divergence (documented, SURVEY.md §7 risk 2): SQL's ``NOT IN``
returns zero rows if the inner set contains a NULL; ``left_anti`` treats
NULLs as non-matching. For primary keys (never NULL) the two agree; pass
``emulate_not_in_nulls=True`` for bit-exact SQL behavior on dirty data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehouse_copy_spark.operators.copy import DEFAULT_EXCLUDED, exclude_columns
from data_warehouse_copy_spark.sources.managed_table import ManagedTable


def changed_keys(
    source_df: DataFrame,
    date_column: str,
    update_date_column: str,
    primary_key: str,
    date_from: str,
    date_to: str,
    emulate_not_in_nulls: bool = False,
) -> DataFrame:
    """Anti-join change detection (reference O7, ``TableUpdateService.cs:81-88``).

    Returns a one-column DataFrame of primary keys updated in the window but
    not inserted in it. Day-granularity on BOTH predicates (``CAST(... AS
    DATE)``), unlike the copy path's raw-datetime BETWEEN — the reference has
    two subtly different granularities in the same pipeline and so do we.
    """
    d1, d2 = F.lit(date_from).cast("date"), F.lit(date_to).cast("date")
    updated = source_df.filter(
        F.to_date(F.col(update_date_column)).between(d1, d2)
    ).select(primary_key)
    inserted = source_df.filter(F.to_date(F.col(date_column)).between(d1, d2)).select(
        primary_key
    )
    anti = updated.join(inserted, on=primary_key, how="left_anti")
    if emulate_not_in_nulls:
        # SQL NOT IN: any NULL in the inner set poisons the whole predicate.
        has_null = inserted.filter(F.col(primary_key).isNull()).limit(1)
        anti = anti.join(
            has_null.select(F.lit(1).alias("_poison")), how="left"
        ).filter(F.col("_poison").isNull()).drop("_poison")
    return anti


def update_table(
    source_df: DataFrame,
    target: ManagedTable,
    table_name: str,
    date_from: str,
    date_to: str,
    date_column: str,
    update_date_column: str,
    primary_key: str,
    excluded_columns: tuple[str, ...] = DEFAULT_EXCLUDED,
) -> int:
    """Changed-key upsert (reference entry point C, §3.3): detect changed
    keys, then merge the source's current rows for those keys into the
    target as one atomic commit. Returns the KEY count (reference metric
    fidelity, ``TableUpdateService.cs:163``)."""
    keys = changed_keys(
        source_df, date_column, update_date_column, primary_key, date_from, date_to
    )
    # Reference re-selects full rows by key from the source (:131-134) —
    # a semi-join, not a window filter.
    rows = exclude_columns(
        source_df.join(keys, on=primary_key, how="left_semi"), excluded_columns
    )
    return target.merge_by_key(rows, primary_key)
