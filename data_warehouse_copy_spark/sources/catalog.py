"""Source catalog: read the warehouse tables from a scale-factor directory.

The reference reads from SQL Server over ``SqlDataReader``
(``TableCopyService.cs:125-140``); here sources are columnar parquet (the
driver's fixtures) read through the DataFrame API so Catalyst keeps predicate
pushdown and column pruning all the way into the scan. A JDBC source reader
is provided behind the same interface for parity with the reference's
deployment shape, exercised against embedded Derby in tests/test_jdbc.py.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ns_timestamp_columns(path: Path) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's vectorized reader
    rejects these outright, so they need the nanosAsLong escape hatch plus an
    explicit ns→µs restore (see :func:`load_table`)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = path if path.is_file() else next(Path(path).glob("*.parquet"), None)
    if f is None:
        return []
    schema = pq.read_schema(str(f))
    return [
        field.name
        for field in schema
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns"
    ]


def restore_ns_timestamps(df: DataFrame, cols: list[str]) -> DataFrame:
    """Convert nanosAsLong-read epoch-nanos longs back to TIMESTAMP_NTZ
    (truncating to Spark's native µs precision). NTZ matches the file's
    timezone-naive semantics and the other fixtures (which Spark reads as
    NTZ via inferTimestampNTZ), independent of session timezone — callers
    should run with a UTC session so the intermediate cast is the identity.

    Only columns that actually loaded as longs are touched: INT96 files
    surface as ns in pyarrow metadata but Spark already reads them as
    timestamps (nanosAsLong applies only to annotated TIMESTAMP(NANOS))."""
    from pyspark.sql import types as T

    for c in cols:
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(
                c,
                F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz"),
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one source table. Accepts both ``<dir>/<name>.parquet`` (driver
    fixtures) and ``<dir>/<name>`` (directory-style parquet).

    Handles parquet TIMESTAMP(NANOS) columns (e.g. the events fixture's
    ``ts``) transparently: read as epoch-nanos longs, then restored to
    TimestampType — a pure projection, so pushdown/pruning are unaffected."""
    base = Path(sf_dir)
    for candidate in (base / f"{name}.parquet", base / name):
        if candidate.exists():
            ns_cols = ns_timestamp_columns(candidate)
            if ns_cols:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(str(candidate))
            return restore_ns_timestamps(df, ns_cols)
    raise FileNotFoundError(f"table {name!r} not found under {sf_dir}")


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register each table as a temp view for the SQL API."""
    for name in tables:
        try:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        except FileNotFoundError:
            pass


#: Canonical documents-table schema (matches the parquet fixture): the
#: shape every text-corpus ingestion path must land in so the downstream
#: dedup/quality/lang-id operators run unchanged.
DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def load_text_corpus(
    spark: SparkSession,
    path: str | list[str],
    schema: str | None = None,
) -> DataFrame:
    """JSONL / JSONL.gz corpus ingestion into the ``documents`` schema.

    Training corpora rarely arrive as parquet — the common interchange is
    newline-delimited JSON, usually gzip-compressed. Spark's JSON source
    handles ``.gz`` (and ``.zst`` where the codec is on the classpath)
    transparently via filename extension, splits uncompressed files by
    range, and with an EXPLICIT schema never runs the inference pre-pass
    (at 100 TB, schema inference is a full extra read of the corpus; a
    gzip member is also non-splittable, so production drops should arrive
    as many files — one task each — rather than one giant archive).

    Missing fields are null-backfilled; ``n_chars`` is recomputed from the
    text when absent so quality filters keep working. Corrupt lines land
    in ``_corrupt_record``-free PERMISSIVE nulls rather than failing the
    job (count them via ``doc_id IS NULL AND text IS NULL`` and quarantine
    upstream). Returns columns in canonical order."""
    target = T.StructType.fromDDL(schema or DOCUMENTS_SCHEMA)
    raw = spark.read.schema(target).json(path)
    out = raw
    if "n_chars" in raw.columns and "text" in raw.columns:
        out = out.withColumn(
            "n_chars",
            F.coalesce(
                F.col("n_chars"), F.length(F.col("text")).cast("long")
            ),
        )
    return out.select(*[f.name for f in target.fields])


def write_text_corpus(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    compression: str = "gzip",
) -> None:
    """Emit a corpus as sharded JSONL(.gz) — the inverse of
    :func:`load_text_corpus` and the standard interchange a training job
    consumes. ``shards`` controls output file count: gzip members are
    non-splittable, so the shard count IS the read parallelism of every
    downstream consumer — size shards so each lands in the 100 MB-1 GB
    range (10 TB of curated text → ~10⁴ shards), never one giant archive.
    ``repartition(shards)`` is a full shuffle by design: it also evens out
    skew from upstream filters so shards are uniform."""
    writer = df.repartition(shards) if shards else df
    writer.write.mode("overwrite").option("compression", compression).json(path)


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Generic file source (parquet/csv/json/orc/text). CSV/JSON default to
    header+schema-inference for ad-hoc use; pass an explicit ``schema`` in
    pipelines — at scale, inference is an extra full read of the data."""
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", "true")
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Generic file sink. ``mode="overwrite"`` reproduces the reference's
    truncate+load (O4); ``"append"`` its bulk insert (O5). For the
    transactional per-table guarantees use :class:`ManagedTable` instead —
    plain file sinks are not atomic against concurrent readers."""
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save(path)


def load_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    schema: str = "",
    predicate: str | None = None,
    partition_options: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC source for parity with the reference's SQL Server reader
    (``TableCopyService.cs:125-140``). Catalyst pushes filters into the
    remote ``SELECT`` (the reference hand-builds the same ``WHERE``); for big
    tables pass ``partitionColumn/lowerBound/upperBound/numPartitions`` so
    the scan parallelizes across executors instead of one cursor."""
    qualified = f"{schema}.{table}" if schema else table
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", qualified)
        .option("pushDownPredicate", "true")
    )
    for k, v in (partition_options or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    return df.where(predicate) if predicate else df


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    schema: str = "",
    mode: str = "append",
    truncate: bool = False,
    batch_size: int = 10000,
    options: dict[str, str] | None = None,
) -> None:
    """JDBC sink for parity with the reference's ``SqlBulkCopy`` writer
    (``TableCopyService.cs:144-169``), exercised against embedded Derby in
    tests/test_jdbc.py. ``mode="append"`` is the streaming bulk insert (O5);
    ``mode="overwrite", truncate=True`` reproduces the dim truncate+reload
    (O4: TRUNCATE keeps the table definition, as the reference's
    ``TRUNCATE TABLE`` does). Executors write partitions concurrently in
    ``batch_size`` row batches — the scalable analogue of the reference's
    single SqlBulkCopy stream."""
    qualified = f"{schema}.{table}" if schema else table
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", qualified)
        .option("truncate", str(truncate).lower())
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()
