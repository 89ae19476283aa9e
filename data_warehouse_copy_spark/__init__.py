"""data_warehouse_copy_spark — a PySpark-native warehouse copy/analytics engine.

A from-scratch engine with the query and data-processing capabilities of the
reference batch ETL tool ``DeemedS/Data-Warehouse-Copy`` (a config-driven
SQL Server -> SQL Server mover, see /root/reference), re-expressed Spark-first:

- config / window-derivation / table-classification (reference
  ``BulkCopyManager.cs:37-104``) as pure, clock-injectable Python,
- the copy / truncate-reload / upsert operator repertoire
  (``TableCopyService.cs``, ``TableUpdateService.cs``) as declarative
  DataFrame pipelines over an atomic, manifest-based managed parquet table
  (a lightweight lakehouse layer: partition-pruned range overwrite,
  join-based MERGE — no driver-side key collection, no 2000-row batches),
- an extension surface for large-scale training-data pipelines:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  similarity search (brute-force + LSH-bucketed top-k), text analysis
  (lang-id, quality, tokens, fingerprints), multimodal binary columns,
  and Structured Streaming over the events table.

Everything is stock DataFrame/SQL API; Catalyst does the optimization.
"""

from data_warehouse_copy_spark.config import (
    JobConfig,
    TableSpec,
    classify_tables,
    load_config,
)
from data_warehouse_copy_spark.window import (
    day_bounds,
    derive_window,
    midnight_override,
)

__all__ = [
    "JobConfig",
    "TableSpec",
    "classify_tables",
    "load_config",
    "derive_window",
    "day_bounds",
    "midnight_override",
]

__version__ = "0.1.0"
