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
            # Unquoted identifiers fold per-database (Derby/Oracle fold UP,
            # Postgres folds DOWN) — probe every folding of BOTH the schema
            # and the table so no combination yields a false negative.
            schemas = (
                {self.schema, self.schema.upper(), self.schema.lower()}
                if self.schema
                else {None}
            )
            tables = {self.table, self.table.upper(), self.table.lower()}
            for s in schemas:
                for t in tables:
                    rs = md.getTables(None, s, t, None)
                    if rs.next():
                        return True
            return False
        finally:
            conn.close()

    def read(self) -> DataFrame:
        return load_jdbc_table(self.spark, self.url, self.table, self.schema)

    def _stage_swap(
        self,
        df: DataFrame,
        build_delete_sql=None,
        params: list | None = None,
        scalar_sql=None,
    ) -> tuple[int, int, int]:
        """Parallel-write ``df`` to a staging table, then ONE server-side
        transaction: optional ``build_delete_sql(stage_qualified)`` DELETE
        against the target, then ``INSERT INTO target SELECT FROM stage``.
        ``scalar_sql(stage_qualified)``, when given, is evaluated inside the
        same transaction (e.g. a key count off the staged rows). Returns
        (rows_deleted, rows_inserted, scalar). The staged write is the only
        parallel step; readers of the target see the delete+reload
        atomically (reference O16)."""
        stage = f"{self.table}_stg_{uuid.uuid4().hex[:8]}"
        stage_q = f"{self.schema}.{stage}" if self.schema else stage
        write_jdbc_table(df, self.url, stage, self.schema, mode="overwrite")
        cols = ", ".join(_q(c) for c in df.columns)
        conn = self._connect()
        try:
            conn.setAutoCommit(False)
            deleted = scalar = 0
            try:
                if build_delete_sql is not None:
                    ps = conn.prepareStatement(build_delete_sql(stage_q))
                    for i, p in enumerate(params or [], start=1):
                        ps.setTimestamp(i, p)
                    deleted = ps.executeUpdate()
                if scalar_sql is not None:
                    rs = conn.createStatement().executeQuery(scalar_sql(stage_q))
                    rs.next()
                    scalar = rs.getLong(1)
                inserted = conn.createStatement().executeUpdate(
                    f"INSERT INTO {self.qualified} ({cols}) "
                    f"SELECT {cols} FROM {stage_q}"
                )
                conn.commit()
            except Exception:
                try:
                    conn.rollback()  # reference O16 rollback-on-error
                except Exception:
                    log.warning("rollback failed for %s", self.qualified)
                raise
            finally:
                # Cleanup must never mask the transaction's own exception
                # (a broken connection would throw here too); a leaked stage
                # table is logged, not raised.
                try:
                    conn.setAutoCommit(True)
                    conn.createStatement().executeUpdate(f"DROP TABLE {stage_q}")
                except Exception:
                    log.warning("stage cleanup failed; %s left behind", stage_q)
        finally:
            try:
                conn.close()
            except Exception:
                pass
        return deleted, inserted, scalar

    def _ts(self, dt) -> object:
        jvm = self.spark.sparkContext._jvm
        return jvm.java.sql.Timestamp.valueOf(
            dt.strftime("%Y-%m-%d %H:%M:%S.") + f"{dt.microsecond // 1000:03d}"
        )

    # ------------------------------------------------------------ protocol

    def _count(self) -> int:
        """Server-side ``COUNT(*)`` of the target — cheap relative to
        re-running the Spark lineage through a second remote scan."""
        conn = self._connect()
        try:
            rs = conn.createStatement().executeQuery(
                f"SELECT COUNT(*) FROM {self.qualified}"
            )
            rs.next()
            return rs.getLong(1)
        finally:
            conn.close()

    def append(self, df: DataFrame) -> int:
        """O5 streaming bulk insert; returns rows written (the reference
        counts rows through SqlRowsCopied — here the count comes from the
        server-side INSERT, so the Spark lineage runs exactly once)."""
        if not self.exists():
            # Creation load: no readers yet, plain parallel write; the
            # post-write count equals the insert (table was empty).
            write_jdbc_table(df, self.url, self.table, self.schema, mode="append")
            return self._count()
        _, inserted, _ = self._stage_swap(df)
        return inserted

    def overwrite(self, df: DataFrame) -> int:
        """O4 truncate + reload, atomic to readers: stage in parallel, then
        one transaction deletes every target row and inserts the staged
        reload — the reference's transactional dim reload. (A raw TRUNCATE
        commits immediately on most engines, so the swap uses DELETE.)"""
        if not self.exists():
            write_jdbc_table(df, self.url, self.table, self.schema, mode="append")
            return self._count()
        _, inserted, _ = self._stage_swap(
            df, lambda _stage: f"DELETE FROM {self.qualified}"
        )
        return inserted

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
        if not date_column:
            raise ValueError("overwrite_range requires a date column")
        if not self.exists():
            return 0, self.append(df)
        start, end = day_bounds(date_from, date_to)
        delete_sql = (
            f"DELETE FROM {self.qualified} "
            f"WHERE {_q(_resolve(df, date_column))} BETWEEN ? AND ?"
        )
        deleted, inserted, _ = self._stage_swap(
            df, lambda _stage: delete_sql, [self._ts(start), self._ts(end)]
        )
        return deleted, inserted

    def merge_by_key(self, source_df: DataFrame, primary_key: str) -> int:
        """O9+O10 keyed delete + reinsert in ONE transaction (the reference
        batches 2000 keys per statement inside one transaction; the staged
        ``IN (SELECT ...)`` form is the set-based equivalent with no driver
        round-trips). Returns the KEY count (reference metric,
        ``TableUpdateService.cs:163``), counted off the staged rows so the
        Spark lineage runs exactly once."""
        pk = _q(_resolve(source_df, primary_key))
        if not self.exists():
            self.append(source_df)
            conn = self._connect()
            try:
                rs = conn.createStatement().executeQuery(
                    f"SELECT COUNT(DISTINCT {pk}) FROM {self.qualified}"
                )
                rs.next()
                return rs.getLong(1)
            finally:
                conn.close()
        _, _, n_keys = self._stage_swap(
            source_df,
            lambda stage_q: (
                f"DELETE FROM {self.qualified} WHERE {pk} IN "
                f"(SELECT {pk} FROM {stage_q})"
            ),
            scalar_sql=lambda stage_q: f"SELECT COUNT(DISTINCT {pk}) FROM {stage_q}",
        )
        return n_keys
