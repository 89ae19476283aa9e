"""JDBC target table — the reference's actual deployment shape.

The reference's sink is a SQL Server table behind one JDBC connection:
range ``DELETE`` (O3, ``TableCopyService.cs:106-117``), ``TRUNCATE`` (O4,
``:94-101``), streaming bulk insert (O5, ``:144-169``) and keyed
delete+reinsert (O9/O10, ``TableUpdateService.cs:108-161``), all inside a
per-table transaction (O16, ``TableCopyService.cs:89,170``).

:class:`JdbcTable` implements the same write protocol as
:class:`ManagedTable` (``append`` / ``overwrite`` / ``overwrite_range`` /
``merge_by_key``), so ``copy_table`` / ``update_table`` and the configured
pipeline work unchanged against a database target. The scale-correct shape
differs from the reference in one deliberate way: Spark's JDBC writer opens
one connection per partition, so a single wrapping transaction is
impossible for the parallel bulk load. Instead the mutating operations use
**stage-and-swap**: executors write a staging table in parallel, then ONE
server-side transaction does ``DELETE`` + ``INSERT INTO target SELECT FROM
stage`` and commits — readers see the delete and the reload atomically,
preserving the reference's all-or-nothing guarantee while the heavy data
movement stays distributed.

Identifier convention (matches Spark's JDBC writer): table names travel
unquoted (the database applies its case folding — Derby uppercases);
column names are written quoted by Spark and are therefore quoted here.

Exercised end-to-end against embedded Derby in tests/test_jdbc_table.py.
"""

from __future__ import annotations

import logging
import uuid

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_copy_spark.sources.catalog import (
    load_jdbc_table,
    write_jdbc_table,
)
from data_warehouse_copy_spark.window import day_bounds

log = logging.getLogger(__name__)


def _q(col: str) -> str:
    """Quote a column identifier the way Spark's JDBC writer created it."""
    return '"' + col.replace('"', '""') + '"'


def _resolve(df: DataFrame, col: str) -> str:
    """Map a config-supplied column name onto the DataFrame's actual
    (case-exact) column — Spark resolves case-insensitively but quoted
    identifiers in raw SQL do not, so the raw statements must use the case
    the table was created with (the DataFrame's)."""
    for c in df.columns:
        if c.lower() == col.lower():
            return c
    raise ValueError(f"column {col!r} not found in {df.columns}")


class JdbcTable:
    """A database-backed target table with ManagedTable's write protocol."""

    def __init__(self, spark: SparkSession, url: str, table: str, schema: str = ""):
        self.spark = spark
        self.url = url
        self.table = table
        self.schema = schema
        self.qualified = f"{schema}.{table}" if schema else table

    # ------------------------------------------------------------ plumbing

    def _connect(self):
        """Raw JDBC connection through the JVM gateway — same driver class
        Spark's reader/writer loads, used for the statements Spark cannot
        express (DELETE, transactional swap), exactly as the reference
        drives SqlCommand next to SqlBulkCopy."""
        jvm = self.spark.sparkContext._jvm
        return jvm.java.sql.DriverManager.getConnection(self.url)

    def exists(self) -> bool:
        conn = self._connect()
        try:
            md = conn.getMetaData()
            for candidate in (self.table, self.table.upper()):
                rs = md.getTables(None, self.schema.upper() or None, candidate, None)
                if rs.next():
                    return True
            return False
        finally:
            conn.close()

    def read(self) -> DataFrame:
        return load_jdbc_table(self.spark, self.url, self.table, self.schema)

    def _stage_swap(self, df: DataFrame, delete_sql: str, params: list) -> tuple[int, int]:
        """Parallel-write ``df`` to a staging table, then one transaction:
        run ``delete_sql`` (against the target) and insert the staged rows.
        Returns (rows_deleted, rows_inserted)."""
        stage = f"{self.table}_stg_{uuid.uuid4().hex[:8]}"
        stage_q = f"{self.schema}.{stage}" if self.schema else stage
        write_jdbc_table(df, self.url, stage, self.schema, mode="overwrite")
        cols = ", ".join(_q(c) for c in df.columns)
        conn = self._connect()
        try:
            conn.setAutoCommit(False)
            try:
                ps = conn.prepareStatement(delete_sql)
                for i, p in enumerate(params, start=1):
                    ps.setTimestamp(i, p)
                deleted = ps.executeUpdate()
                inserted = conn.createStatement().executeUpdate(
                    f"INSERT INTO {self.qualified} ({cols}) "
                    f"SELECT {cols} FROM {stage_q}"
                )
                conn.commit()
            except Exception:
                conn.rollback()  # reference O16 rollback-on-error
                raise
            finally:
                conn.setAutoCommit(True)
                conn.createStatement().executeUpdate(f"DROP TABLE {stage_q}")
        finally:
            conn.close()
        return deleted, inserted

    def _ts(self, dt) -> object:
        jvm = self.spark.sparkContext._jvm
        return jvm.java.sql.Timestamp.valueOf(
            dt.strftime("%Y-%m-%d %H:%M:%S.") + f"{dt.microsecond // 1000:03d}"
        )

    # ------------------------------------------------------------ protocol

    def append(self, df: DataFrame) -> int:
        """O5 streaming bulk insert; returns rows written (the reference
        counts rows through SqlRowsCopied — here one count pass)."""
        rows = df.count()
        write_jdbc_table(df, self.url, self.table, self.schema, mode="append")
        return rows

    def overwrite(self, df: DataFrame) -> int:
        """O4 truncate + reload. ``truncate=True`` keeps the table
        definition (TRUNCATE TABLE), like the reference's dim reload."""
        rows = df.count()
        write_jdbc_table(
            df, self.url, self.table, self.schema,
            mode="overwrite", truncate=self.exists(),
        )
        return rows

    def overwrite_range(
        self,
        df: DataFrame,
        date_from: str,
        date_to: str,
        date_column: str | None = None,
    ) -> tuple[int, int]:
        """O3+O5 range delete + reload, atomic to readers via stage-and-swap.
        The DELETE predicate is the reference's raw-datetime BETWEEN with
        the ``23:59:59.997`` end bound (``TableCopyService.cs:106-117``)."""
        assert date_column, "overwrite_range requires a date column"
        if not self.exists():
            return 0, self.append(df)
        start, end = day_bounds(date_from, date_to)
        delete_sql = (
            f"DELETE FROM {self.qualified} "
            f"WHERE {_q(_resolve(df, date_column))} BETWEEN ? AND ?"
        )
        return self._stage_swap(df, delete_sql, [self._ts(start), self._ts(end)])

    def merge_by_key(self, source_df: DataFrame, primary_key: str) -> int:
        """O9+O10 keyed delete + reinsert in ONE transaction (the reference
        batches 2000 keys per statement inside one transaction; the staged
        ``IN (SELECT ...)`` form is the set-based equivalent with no driver
        round-trips). Returns the KEY count (reference metric,
        ``TableUpdateService.cs:163``)."""
        if not self.exists():
            self.append(source_df)
            return source_df.select(primary_key).distinct().count()
        n_keys = source_df.select(primary_key).distinct().count()
        if n_keys == 0:
            return 0  # empty key set still "completes" (:167-172)
        stage = f"{self.table}_stg_{uuid.uuid4().hex[:8]}"
        stage_q = f"{self.schema}.{stage}" if self.schema else stage
        write_jdbc_table(source_df, self.url, stage, self.schema, mode="overwrite")
        cols = ", ".join(_q(c) for c in source_df.columns)
        pk = _q(_resolve(source_df, primary_key))
        conn = self._connect()
        try:
            conn.setAutoCommit(False)
            try:
                conn.createStatement().executeUpdate(
                    f"DELETE FROM {self.qualified} WHERE {pk} IN "
                    f"(SELECT {pk} FROM {stage_q})"
                )
                conn.createStatement().executeUpdate(
                    f"INSERT INTO {self.qualified} ({cols}) "
                    f"SELECT {cols} FROM {stage_q}"
                )
                conn.commit()
            except Exception:
                conn.rollback()
                raise
            finally:
                conn.setAutoCommit(True)
                conn.createStatement().executeUpdate(f"DROP TABLE {stage_q}")
        finally:
            conn.close()
        return n_keys
