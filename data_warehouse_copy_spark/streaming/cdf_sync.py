"""CDF replica maintenance: keep a downstream table ROW-EXACT with an
upstream managed table by consuming its streaming change feed — the
canonical reason the change feed exists. Without it, a downstream copy
of a table whose own dedup issues DV deletes either re-copies the world
(the reference's nightly full copy, ``TableCopyService.cs``) or silently
diverges (``skipChangeCommits`` drops the deletes).

Shape: ``readStream.format("managed_table").option("changeFeed","true")``
delivers row-level ``_change_type``/``_commit_version`` rows (inserts,
deletes, update pre/post-images — the snapshot arrives as the feed's
opening inserts, so a fresh replica bootstraps itself); each micro-batch
FOLDS to one net image per key (several upstream commits can land in one
batch — only the LAST change per key matters) and applies as ONE
idempotent :meth:`ManagedTable.merge` (``txn=(app_id, epoch)``): a
replayed micro-batch after a checkpoint restart is a no-op, so the
replica is exactly-once end to end.

Scale: the batch carries only CHANGED rows (never the table), the fold
is one window-agg shuffle over those rows, and the merge's candidate
files are span-probed from the source keys — at 100 TB the replica cost
is O(changed data per trigger), not O(table). Stream ≡ batch is pinned
in tests/test_cdf_sync.py: after any drain the replica equals
``source.read()`` value-exactly.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_warehouse_copy_spark.sources.managed_table import ManagedTable

#: change-feed helper columns the replica must not store
_CDF_COLS = ("_change_type", "_commit_version")


def fold_changes(batch_df, key_cols: list):
    """The net effect of a change batch, one row per key: order each
    key's changes by ``_commit_version`` and keep the LAST — a key
    inserted then deleted folds to a delete, updated twice folds to the
    final image. WITHIN one commit the rank encodes the commit's net
    effect: preimage < delete < insert/postimage — a preimage never wins
    (its commit also carries the postimage), and a replace_where commit
    that deletes AND reinserts the same key at ONE version folds to the
    insert (the key IS in that commit's post-state). Returns the folded
    frame with one extra column ``__is_delete``."""
    rank = (
        F.when(F.col("_change_type") == "update_preimage", 0)
        .when(F.col("_change_type") == "delete", 1)
        .otherwise(2)
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_commit_version").desc(), rank.desc()
    )
    return (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .withColumn(
            "__is_delete", F.col("_change_type") == F.lit("delete")
        )
        .drop("__rn", *_CDF_COLS)
    )


def apply_changes(
    replica: ManagedTable, batch_df, key_cols: list,
    txn: "tuple[str, int] | None" = None,
) -> dict:
    """Fold + merge one change batch into ``replica`` (batch-callable —
    the streaming sink calls exactly this, so stream ≡ batch is a
    testable property): deletes drop matched keys, everything else
    upserts its final image. One atomic commit; ``txn`` makes replays
    no-ops."""
    folded = fold_changes(batch_df, key_cols)
    data_cols = [c for c in folded.columns if c != "__is_delete"]
    has_rows = replica.snapshot().schema_json is not None
    if not has_rows:
        # first batch bootstraps the replica's schema: land the live
        # images, then fall through to the normal merge path next time
        n = replica.append(
            folded.filter(~F.col("__is_delete")).select(*data_cols),
            txn=txn,
        )
        return {"updated": 0, "deleted": 0, "inserted": n}
    return replica.merge(
        folded,
        on=key_cols,
        when_matched=[
            {"condition": "s.__is_delete", "delete": True},
            {
                "update": {
                    c: f"s.{c}" for c in data_cols if c not in key_cols
                }
            },
        ],
        when_not_matched_insert=[
            {
                "condition": "NOT s.__is_delete",
                "insert": {c: f"s.{c}" for c in data_cols},
            }
        ],
        txn=txn,
    )


def stream_replicate(
    spark,
    source_root: str,
    replica_root: str,
    checkpoint_dir: str,
    key_cols: "str | list[str]",
    app_id: str = "cdf-replica",
    **stream_options,
):
    """Start the replication query: change feed in, idempotent merges
    out. Returns the StreamingQuery — callers ``processAllAvailable()``
    + ``stop()`` to drain, or leave it running as a continuous sync.
    Extra ``stream_options`` pass through to the change-feed reader
    (``startingVersion``, ``maxCommitsPerTrigger``, ...)."""
    from data_warehouse_copy_spark.sources.datasource import register

    register(spark)
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    replica = ManagedTable(spark, replica_root)
    if not replica.exists():
        replica = ManagedTable.create(spark, replica_root)

    reader = spark.readStream.format("managed_table").option(
        "changeFeed", "true"
    )
    for k, v in stream_options.items():
        reader = reader.option(k, v)

    def sink(batch_df, epoch_id: int) -> None:
        apply_changes(replica, batch_df, keys, txn=(app_id, epoch_id))

    return (
        reader.load(source_root)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
