"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-to-fact equi-join is the shuffle of
both sides. Spark bucketing (hash-clustered file layout registered in the
session catalog) makes the partitioning *persistent*: two tables bucketed
by the same key into the same bucket count join with ZERO exchange — each
task reads bucket i of both sides. Worth it whenever a big join key is hit
repeatedly (e.g. lineitem⋈orders on the order key in every report); the
one-time cost is the clustering write.

`spark.sql.sources.bucketing.enabled` is on by default; the session must
have a writable `spark.sql.warehouse.dir` (any scratch path in local mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _clear_orphaned_location(spark: SparkSession, table_name: str) -> None:
    """Remove a leftover warehouse directory for ``table_name``.

    The default in-memory catalog is per-session, but managed-table files
    persist on disk: a fresh session that re-creates the table hits
    LOCATION_ALREADY_EXISTS even in overwrite mode because the catalog has
    no entry to overwrite. Uses the Hadoop FileSystem API so it works on
    any warehouse scheme (local/HDFS/object store), not just local paths.
    """
    wh = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(wh, table_name.lower())
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str | list[str],
    n_buckets: int = 32,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    managed table in the session catalog. Sorting by the join key upgrades
    the bucket join from hash to merge without a sort step."""
    if mode == "overwrite":
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS `{table_name}`")
        _clear_orphaned_location(spark, table_name)
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_by is not None:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sorts)
    writer.format("parquet").saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table; Catalyst knows its output partitioning, so
    joins/aggregations on the bucket key skip their exchange."""
    return spark.table(table_name)
