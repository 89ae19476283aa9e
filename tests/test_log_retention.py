"""Log + checkpoint retention (round-10 verdict item 2): ``clean_log``
(and ``vacuum(log_retention_seconds=)``) trims action records and
superseded checkpoints below the newest aged checkpoint, persists the
retention floor, and every read below the floor fails LOUDLY — time
travel, timestamp resolution, CDF ranges, restore, streaming
startingVersion. Without this a streaming table accumulates one tiny
metadata object per micro-batch commit forever.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
)


def _mk(spark, root, commits: int) -> ManagedTable:
    t = ManagedTable.create(spark, str(root))
    for i in range(commits):
        t.append_pylist([{"k": i, "v": i * 2}], SCHEMA)
    return t


def _log_objects(root) -> list[str]:
    return sorted(p.name for p in (Path(root) / "_log").iterdir())


def test_clean_log_trims_below_anchor_and_sets_floor(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", 45)  # head 45, checkpoints at 20, 40
    assert t.log_floor() == 0
    removed = t.clean_log(retention_seconds=0)
    assert removed > 0
    assert t.log_floor() == 40
    names = _log_objects(tmp_path / "t")
    # records below the anchor are gone, the anchor's record survives
    assert f"{39:020d}.json" not in names
    assert f"{40:020d}.json" in names
    assert not any(n.startswith(f"{20:020d}.checkpoint") for n in names)
    # head keeps reading: all 45 rows
    assert t.read().count() == 45
    # the anchor version reconstructs from its own checkpoint
    assert t.snapshot(40).version == 40
    # a second clean with nothing newer to anchor is a no-op
    assert t.clean_log(retention_seconds=0) == 0


def test_reads_below_floor_fail_loudly(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", 45)
    old_ts = t._raw(10)["ts"]
    t.clean_log(retention_seconds=0)
    with pytest.raises(ValueError, match="retention floor"):
        t.snapshot(10)
    with pytest.raises(ValueError, match="retention floor"):
        t.version_at(old_ts)
    with pytest.raises(ValueError, match="retention floor"):
        t.commit_deltas(10, 45)
    with pytest.raises(ValueError, match="retention floor"):
        t.restore(10)
    # a genuinely nonexistent version still reads as such, not as retention
    with pytest.raises(Exception, match="(?!.*retention)"):
        t.snapshot(999)


def test_cdf_from_floor_still_exact(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", 45)
    before = {
        (v, e["path"]) for v, _op, adds, _rm in t.commit_deltas(39, 45)
        for e in adds
    }
    t.clean_log(retention_seconds=0)  # floor 40
    # changesFrom=floor-1 delivers (39, 45] — exactly what it did before
    after = {
        (v, e["path"]) for v, _op, adds, _rm in t.commit_deltas(39, 45)
        for e in adds
    }
    assert after == before and len(after) == 6


def test_clean_log_noop_without_checkpoint(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", 5)  # below _CKPT_EVERY: no checkpoint
    assert t.clean_log(retention_seconds=0) == 0
    assert t.log_floor() == 0
    assert f"{0:020d}.json" in _log_objects(tmp_path / "t")


def test_clean_log_respects_retention_age(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", 25)
    # nothing is 10^9 seconds old: the aged-anchor search finds nothing
    assert t.clean_log(retention_seconds=1e9) == 0
    assert t.log_floor() == 0
    # dry run counts without deleting and without moving the floor
    would = t.clean_log(retention_seconds=0, dry_run=True)
    assert would > 0
    assert t.log_floor() == 0
    assert f"{0:020d}.json" in _log_objects(tmp_path / "t")
    assert t.clean_log(retention_seconds=0) == would


def test_vacuum_rides_log_retention(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", 25)
    t.overwrite(spark.range(3).select(F.col("id").alias("k"),
                                      F.col("id").alias("v")))
    # plain vacuum never touches the log
    t.vacuum(retention_seconds=0)
    assert t.log_floor() == 0
    n = t.vacuum(retention_seconds=0, log_retention_seconds=0)
    assert n > 0 and t.log_floor() > 0
    assert t.read().count() == 3


def test_churn_bounded_log_cardinality(spark, tmp_path):
    """The 100 TB streaming-ingest shape: 1000 commits, then retention.
    The log must come back to O(_CKPT_KEEP) objects — bounded metadata
    at ANY commit count — while the head stays fully readable."""
    t = _mk(spark, tmp_path / "t", 1000)
    grown = len(_log_objects(tmp_path / "t"))
    assert grown > 1000  # the unbounded-growth problem, demonstrated
    t.clean_log(retention_seconds=0)
    names = _log_objects(tmp_path / "t")
    assert len(names) <= 12, names  # anchor record+ckpt, tail, sidecars
    assert t.log_floor() == 1000
    assert t.read().count() == 1000
    assert t.snapshot().version == 1000
    # and the table keeps committing + checkpointing normally afterwards
    t.append_pylist([{"k": -1, "v": -1}], SCHEMA)
    assert t.read().count() == 1001
    assert [ci.version for ci in t.history()][:1] == [1000]


def test_history_starts_at_surviving_origin(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", 45)
    full = t.history()
    assert [ci.version for ci in full] == list(range(46))
    t.clean_log(retention_seconds=0)  # floor 40
    trimmed = t.history()
    assert [ci.version for ci in trimmed] == list(range(40, 46))
    # the surviving origin accounts the whole state as adds (v0 style)
    assert trimmed[0].version == 40
    assert trimmed[0].total_rows == 40
    # the tail's per-commit deltas are unchanged
    assert [ci.rows_added for ci in trimmed[1:]] == [1] * 5


def test_streaming_starting_version_below_floor_fails(spark, tmp_path):
    from data_warehouse_copy_spark.sources.datasource import register

    register(spark)
    t = _mk(spark, tmp_path / "t", 45)
    t.clean_log(retention_seconds=0)  # floor 40
    q = (
        spark.readStream.format("managed_table")
        .option("startingVersion", "10")
        .load(str(tmp_path / "t"))
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        with pytest.raises(Exception, match="retention floor"):
            q.processAllAvailable()
    finally:
        q.stop()
    # from the floor itself the stream delivers: commits 40..45 = 6 rows
    out = tmp_path / "out"
    q2 = (
        spark.readStream.format("managed_table")
        .option("startingVersion", "40")
        .load(str(tmp_path / "t"))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(str(out)).count() == 6


def test_sql_vacuum_log_retention(spark, tmp_path):
    """VACUUM db.t RETAIN 0 HOURS LOG RETENTION 0 HOURS trims both the
    data plane and the commit log through the SQL front-end; 'log' and
    'retention' remain valid column names elsewhere."""
    from data_warehouse_copy_spark.sources.names import NamedCatalog
    from data_warehouse_copy_spark.sources.sql_dml import SqlDmlError

    t = _mk(spark, tmp_path / "t", 25)
    c = NamedCatalog(tmp_path / "cat.json")
    c.register("db.t", str(tmp_path / "t"))
    # plain vacuum leaves the log alone
    c.sql(spark, "VACUUM db.t RETAIN 0 HOURS")
    assert t.log_floor() == 0
    r = c.sql(
        spark, "VACUUM db.t RETAIN 0 HOURS LOG RETENTION 0 HOURS DRY RUN"
    ).first()
    assert r.rows_affected > 0 and t.log_floor() == 0  # dry: counted only
    r = c.sql(
        spark, "VACUUM db.t RETAIN 0 HOURS LOG RETENTION 0 HOURS"
    ).first()
    assert r.rows_affected > 0 and t.log_floor() == 20
    assert t.read().count() == 25
    with pytest.raises(SqlDmlError, match="non-negative"):
        c.sql(spark, "VACUUM db.t LOG RETENTION -1 HOURS")


def test_log_retention_property_auto_cleans_at_checkpoints(spark, tmp_path):
    """TBLPROPERTIES ('logRetention.hours') — Delta's logRetentionDuration
    as a TABLE POLICY: once set, every checkpoint write also trims aged
    log records, so a streaming table's metadata stays bounded with NO
    operator VACUUM. UNSET stops the cleanup; clones carry the policy."""
    from data_warehouse_copy_spark.sources.names import NamedCatalog

    t = _mk(spark, tmp_path / "t", 2)
    c = NamedCatalog(tmp_path / "cat.json")
    c.register("db.t", str(tmp_path / "t"))
    c.sql(
        spark,
        "ALTER TABLE db.t SET TBLPROPERTIES ('logRetention.hours' = '0')",
    )
    assert t.log_retention_policy() == 0.0
    for i in range(43):  # cross the 20- and 40-commit checkpoints
        t.append_pylist([{"k": 100 + i, "v": 0}], SCHEMA)
    assert t.log_floor() == 40  # cleaned by the checkpoint hook itself
    assert f"{39:020d}.json" not in _log_objects(tmp_path / "t")
    assert t.read().count() == 45
    # property surfaces: SHOW TBLPROPERTIES + SHOW CREATE emit it
    props = {
        r.key: r.value
        for r in c.sql(spark, "SHOW TBLPROPERTIES db.t").collect()
    }
    assert props["logRetention.hours"] == "0.0"
    ddl = c.sql(spark, "SHOW CREATE TABLE db.t").first().createtab_stmt
    assert "'logRetention.hours' = '0.0'" in ddl
    # clones carry the policy
    clone = t.clone_to(str(tmp_path / "c"))
    assert clone.log_retention_policy() == 0.0
    # UNSET stops the cleanup: later checkpoints leave the floor alone
    c.sql(
        spark,
        "ALTER TABLE db.t UNSET TBLPROPERTIES ('logRetention.hours')",
    )
    assert t.log_retention_policy() is None
    for i in range(20):
        t.append_pylist([{"k": 200 + i, "v": 0}], SCHEMA)
    assert t.log_floor() == 40  # unchanged
    assert f"{41:020d}.json" in _log_objects(tmp_path / "t")
    with pytest.raises(ValueError, match="number"):
        c.sql(
            spark,
            "ALTER TABLE db.t SET TBLPROPERTIES "
            "('logRetention.hours' = 'soon')",
        )


def test_clone_and_restore_interplay(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", 45)
    t.clean_log(retention_seconds=0)  # floor 40
    # cloning the CURRENT state still works; cloning below the floor fails
    dst = str(tmp_path / "c")
    t.clone_to(dst)
    assert ManagedTable(spark, dst).read().count() == 45
    with pytest.raises(ValueError, match="retention floor"):
        t.clone_to(str(tmp_path / "c2"), version=10)
    # restore to a SURVIVING version works and re-extends history
    t.restore(42)
    assert t.read().count() == 42


def test_sweep_never_deletes_the_floor_anchor_checkpoint(spark, tmp_path):
    """clean_log's contract is that every SURVIVING version keeps
    working. After the floor lands at checkpoint c, later checkpoint
    churn (_CKPT_KEEP newest) must still retain c — it is the only
    reconstruction base for versions in [c, next-kept-checkpoint), whose
    log records survive but whose predecessors are gone."""
    t = _mk(spark, tmp_path / "t", 45)  # checkpoints at 20, 40
    t.clean_log(retention_seconds=0)
    assert t.log_floor() == 40
    # churn WAY past _CKPT_KEEP newer checkpoints: 60, 80, 100, 120
    for i in range(45, 125):
        t.append_pylist([{"k": i, "v": i * 2}], SCHEMA)
    names = _log_objects(tmp_path / "t")
    assert any(n.startswith(f"{40:020d}.checkpoint") for n in names)
    # every surviving version still resolves — the one just above the
    # floor needs checkpoint 40 as its base
    assert t.snapshot(41).version == 41
    assert t.snapshot(40).version == 40
    assert t.read().count() == 125
