"""Stored-procedure passthrough (reference O11, ``StoreProcRunService.cs:7-37``).

The reference EXECs a named server-side procedure with the date window and
no timeout, rethrowing failures (which aborts the whole run — the asymmetry
vs. swallowed copy errors, reference O18). A Spark engine has no server-side
procedures, so a "sproc" is a *named transform* registered as either

- a Spark SQL template (``{start}`` / ``{end}`` placeholders), or
- a Python callable ``(spark, start_date, end_date) -> None``.

For a genuine JDBC target a raw connection hook can be registered the same
way. Failures propagate (no catch here) exactly like the reference.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession

SprocFn = Callable[[SparkSession, str, str], None]


class SprocRegistry:
    def __init__(self) -> None:
        self._sprocs: dict[str, SprocFn] = {}

    def register(self, name: str, transform: SprocFn | str) -> None:
        if isinstance(transform, str):
            template = transform

            def run_sql(spark: SparkSession, start: str, end: str) -> None:
                spark.sql(template.format(start=start, end=end))

            self._sprocs[name] = run_sql
        else:
            self._sprocs[name] = transform

    def register_jdbc(self, name: str, url: str, statement: str) -> None:
        """Register a GENUINE server-side statement/procedure call executed
        over a raw JDBC connection on the target database — the reference's
        literal behavior (``EXEC sproc @StartDateParam, @EndDateParam`` with
        ``CommandTimeout=0``, ``StoreProcRunService.cs:17-30``).

        ``statement`` is any SQL the server accepts (``CALL proc(?, ?)``,
        ``UPDATE ...``, ...) with exactly two ``?`` parameters bound to the
        window's start and end date strings. Failures propagate, aborting
        the run, same as the Spark-side transforms."""

        def run_jdbc(spark: SparkSession, start: str, end: str) -> None:
            jvm = spark.sparkContext._jvm
            conn = jvm.java.sql.DriverManager.getConnection(url)
            try:
                ps = conn.prepareStatement(statement)
                ps.setString(1, start)
                ps.setString(2, end)
                ps.execute()
            finally:
                conn.close()

        self._sprocs[name] = run_jdbc

    def execute(self, name: str, spark: SparkSession, start: str, end: str) -> None:
        """Run a registered transform; raises on unknown name or failure —
        the reference rethrows and aborts the run (``StoreProcRunService.cs:
        32-36``), unlike per-table copy errors which are swallowed."""
        if name not in self._sprocs:
            raise KeyError(f"stored procedure {name!r} is not registered")
        self._sprocs[name](spark, start, end)

    def __contains__(self, name: str) -> bool:
        return name in self._sprocs
