"""Distributed manifest planning (VERDICT r5 item 1, the driver-memory
ceiling): past the gate, read()'s file pruning runs as a Spark job over a
PARQUET checkpoint + the action tail, and the driver materializes only the
pruned survivors — planning memory no longer scales with table file count
(the Delta/Iceberg metadata-as-data approach)."""

from __future__ import annotations

import json
import sys
import uuid
from datetime import datetime, timezone
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import data_warehouse_copy_spark.sources.managed_table as mt  # noqa: E402
from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    FileEntry,
    ManagedTable,
    Manifest,
)


def _mk(spark, root, n=1000):
    t = ManagedTable.create(spark, root)
    base = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    for i in range(4):
        t.append(base.filter(F.col("k") % 4 == i).coalesce(1))
    return t


def test_parquet_checkpoint_twin_written_on_cadence(spark, tmp_path):
    t = ManagedTable.create(spark, tmp_path / "t")
    df = spark.range(0, 10).selectExpr("id AS k", "id % 7 AS v")
    for _ in range(mt._CKPT_EVERY):
        t.append(df.coalesce(1))
    ck = t._ckpt_parquet_path(mt._CKPT_EVERY)
    assert ck.exists()
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(ck)
    assert pf.metadata.num_rows == mt._CKPT_EVERY  # one row per live file
    header = json.loads(pf.schema_arrow.metadata[b"dwcs_header"])
    assert header["version"] == mt._CKPT_EVERY
    assert header["schema_json"]  # table header rides the footer


def _synthetic_wide_manifest(spark, root, n_files: int):
    """A table whose parquet checkpoint carries ``n_files`` SYNTHETIC
    entries (the data files need not exist — planning never opens them).
    Each file i spans k in [i*10, i*10+9] and carries a day partition."""
    t = ManagedTable.create(spark, root)
    schema_json = t.snapshot().schema_json  # None for empty create
    entries = tuple(
        FileEntry(
            path=f"data/synth/{i:07d}.parquet",
            partition=f"2024-{(i % 12) + 1:02d}-01",
            rows=10,
            stats={"k": [i * 10, i * 10 + 9]},
        )
        for i in range(n_files)
    )
    m = Manifest(
        version=1,
        partition_date_col="d",
        schema_json=schema_json,
        files=entries,
        op="append",
        ts=datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%fZ"),
    )
    # land version 1 as an (empty-diff) action so the head probe finds it,
    # and the parquet checkpoint twin alongside
    (root / "_log" / f"{1:020d}.json").write_text(
        json.dumps(
            {
                "version": 1,
                "op": "append",
                "ts": m.ts,
                "ets": m.ts,
                "add": [],
                "remove": [],
                "schema_json": None,
                "txn": None,
            }
        )
    )
    t._write_checkpoint_parquet(m)
    return t


def test_wide_manifest_point_lookup_plans_distributed(spark, tmp_path):
    n = 100_001  # >= the VERDICT "done" bar of 1e5 entries
    t = _synthetic_wide_manifest(spark, tmp_path / "wide", n)
    planned = t._plan_distributed(1, None, None, None, [("k", "=", 123456)])
    assert planned is not None  # gate passed: this ran as a Spark job
    sel, _schema = planned
    # k=123456 lives in exactly file 12345's span [123450, 123459]
    assert [f.path for f in sel] == ["data/synth/0012345.parquet"]
    # driver materialized ONLY the survivor, not the 100k-entry manifest


def test_wide_manifest_partition_prune_distributed(spark, tmp_path):
    n = 60_000
    t = _synthetic_wide_manifest(spark, tmp_path / "wide2", n)
    planned = t._plan_distributed(
        1, "2024-03-01", "2024-03-31", None, [("k", "<", 1000)]
    )
    assert planned is not None
    sel, _ = planned
    # k<1000 -> files 0..99; March partition -> i % 12 == 2
    expect = {f"data/synth/{i:07d}.parquet" for i in range(100) if i % 12 == 2}
    assert {f.path for f in sel} == expect


def test_distributed_read_matches_classic(spark, tmp_path, monkeypatch):
    """End-to-end on REAL files: force the gate down so the distributed
    planner serves a small table, and verify reads (plain, pruned, after
    a tail DV delete and a tail append) are value-identical to the
    classic driver path."""
    t = _mk(spark, tmp_path / "t")
    t._write_checkpoint(t.snapshot())  # parquet ckpt at current head
    # tail past the checkpoint: an append and a DV delete (changed entries
    # ride the tail as remove + re-add; planning must fold them)
    t.append(
        spark.range(5000, 5050).selectExpr("id AS k", "id % 7 AS v").coalesce(1)
    )
    assert t.delete(where=[("k", "<", 10)]) == 10

    def both(**kw):
        monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 10**9)
        classic = sorted(map(tuple, t.read(**kw).collect()))
        monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
        assert (
            t._plan_distributed(
                None,
                kw.get("partition_min"),
                kw.get("partition_max"),
                kw.get("partitions"),
                kw.get("where"),
            )
            is not None
        )
        dist = sorted(map(tuple, t.read(**kw).collect()))
        assert dist == classic
        return dist

    rows = both()
    assert len(rows) == 1000 - 10 + 50
    assert both(where=[("k", "=", 123)]) == [(123, 123 % 7)]
    assert both(where=[("k", ">=", 5040)]) == [
        (k, k % 7) for k in range(5040, 5050)
    ]
    # deleted keys stay deleted through the distributed plan
    assert both(where=[("k", "<", 10)]) == []


def test_distributed_plan_falls_back_without_parquet_ckpt(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
    t = _mk(spark, tmp_path / "t")
    # no checkpoint at all: classic path must serve reads unchanged
    assert t._plan_distributed(None, None, None, None, None) is None
    assert t.read().count() == 1000


def test_manifest_df_matches_snapshot(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t._write_checkpoint(t.snapshot())
    t.append(spark.range(9000, 9010).selectExpr("id AS k", "id % 7 AS v"))
    t.delete(where=[("k", "=", 5)])
    m = t.snapshot()
    got = {
        r["path"]: (r["rows"], r["dv_rows"], tuple(r["dv_paths"] or []))
        for r in t.manifest_df().collect()
    }
    want = {f.path: (f.rows, f.dv_rows, tuple(f.dv_paths)) for f in m.files}
    assert got == want


def test_streamed_plan_matches_spark_job_plan(spark, tmp_path, monkeypatch):
    """A session-less handle (how the datasource planning worker sees the
    table) must produce the IDENTICAL plan through the streamed-pyarrow
    twin — including DV carriage and tail folding."""
    t = _mk(spark, tmp_path / "t")
    t._write_checkpoint(t.snapshot())
    t.append(spark.range(5000, 5050).selectExpr("id AS k", "id % 7 AS v"))
    t.delete(where=[("k", "<", 10)])
    monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
    for where in (None, [("k", "<", 100)], [("k", ">=", 5040)]):
        with_spark = t._plan_distributed(None, None, None, None, where)
        streamed = ManagedTable(None, t.root)._plan_distributed(
            None, None, None, None, where
        )
        assert with_spark is not None and streamed is not None
        key = lambda f: (  # noqa: E731
            f.path, f.partition, f.rows, f.dv_paths, f.dv_rows, f.bloom_path
        )
        assert sorted(map(key, streamed[0])) == sorted(map(key, with_spark[0]))
        assert streamed[1] == with_spark[1]


def test_declarative_partitions_stream_plan_on_wide_manifest(spark, tmp_path):
    """The datasource's partitions() at 100k+ manifest entries: the
    session-less streamed planner must serve it (the gate passes with no
    monkeypatching — proof the REAL declarative path scales), returning
    only the surviving partition."""
    from pyspark.sql import types as T

    from data_warehouse_copy_spark.sources.datasource import (
        ManagedTableBatchReader,
    )

    t = _synthetic_wide_manifest(spark, tmp_path / "wide3", 100_001)
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    reader = ManagedTableBatchReader(
        str(t.root),
        {"versionasof": "1", "where": '[["k", "=", 123456]]'},
        schema,
    )
    parts = reader.partitions()
    assert [Path(p.path).name for p in parts] == ["0012345.parquet"]


def test_checkpoint_retention_sweeps_old(spark, tmp_path):
    """Only the newest _CKPT_KEEP checkpoint versions survive; every
    historical version still reconstructs (v0 full state + replay)."""
    t = ManagedTable.create(spark, tmp_path / "t")
    df = spark.range(0, 5).selectExpr("id AS k", "id % 7 AS v")
    n_commits = mt._CKPT_EVERY * (mt._CKPT_KEEP + 2)
    for _ in range(n_commits):
        t.append(df.coalesce(1))
    log = (tmp_path / "t" / "_log")
    ck_versions = sorted(
        int(p.name[:20]) for p in log.glob("*.checkpoint.json")
    )
    assert len(ck_versions) == mt._CKPT_KEEP
    assert ck_versions[-1] == n_commits - (n_commits % mt._CKPT_EVERY)
    # parquet twins follow the same retention
    assert len(list(log.glob("*.checkpoint.parquet"))) == mt._CKPT_KEEP
    # an old version BELOW every surviving checkpoint still reconstructs
    old_v = mt._CKPT_EVERY  # its checkpoint was swept
    assert t.snapshot(old_v).total_rows == 5 * old_v
    assert t.snapshot().total_rows == 5 * n_commits


def test_distributed_vacuum_matches_classic(spark, tmp_path, monkeypatch):
    """The Spark-job vacuum must delete exactly what the classic sweep
    deletes (garbage from rewrites/compaction/DV folding) and leave the
    table byte-identical to read."""

    def build(root):
        t = _mk(spark, root)
        t.delete(where=[("k", "<", 100)])   # DV parquet garbage later
        t.compact()                          # folds DVs, orphans originals
        t.append(
            spark.range(5000, 5010).selectExpr("id AS k", "id % 7 AS v")
        )
        t._write_checkpoint(t.snapshot())
        return t

    a = build(tmp_path / "a")
    b = build(tmp_path / "b")
    before = sorted(map(tuple, a.read().collect()))
    n_classic = a.vacuum(retention_seconds=0.0, distributed=False)
    monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
    n_dist = b.vacuum(retention_seconds=0.0)  # auto-selects distributed
    assert n_dist == n_classic > 0
    assert sorted(map(tuple, b.read().collect())) == before
    # leftover files identical in count per directory
    for d in ("data", "_dv", "_bloom"):
        fa = len(list((tmp_path / "a" / d).rglob("*.parquet"))) if (
            tmp_path / "a" / d).exists() else 0
        fb = len(list((tmp_path / "b" / d).rglob("*.parquet"))) if (
            tmp_path / "b" / d).exists() else 0
        assert fa == fb
    # scratch listing cleaned up
    assert not list((tmp_path / "b" / "_staging").glob("vacuum_*"))


def test_distributed_vacuum_respects_retention(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
    t = _mk(spark, tmp_path / "t")
    t._write_checkpoint(t.snapshot())
    t.overwrite(spark.range(3).selectExpr("id AS k", "id % 7 AS v"))
    # young garbage is protected by the cutoff
    assert t.vacuum(retention_seconds=3600.0, distributed=True) == 0
    assert t.vacuum(retention_seconds=0.0, distributed=True) > 0
    assert t.read().count() == 3


class TestBoundedDmlCommit:
    """Write-side twin of distributed planning: past the gate, delete()
    plans candidates distributively and commits an action diff without
    ever materializing the full file list."""

    def _mk(self, spark, root):
        t = _mk(spark, root)
        t._write_checkpoint(t.snapshot())
        return t

    def test_bounded_delete_matches_classic(self, spark, tmp_path, monkeypatch):
        a = self._mk(spark, tmp_path / "a")
        b = self._mk(spark, tmp_path / "b")
        na = a.delete(where=[("k", "<", 10)])  # classic (gate stays high)
        monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
        nb = b.delete(where=[("k", "<", 10)])  # bounded
        assert na == nb == 10
        assert b.snapshot().op == "delete"
        assert sorted(map(tuple, b.read().collect())) == sorted(
            map(tuple, a.read().collect())
        )
        # re-versioned entries KEPT their stats (pruning power survives)
        m = b.snapshot()
        assert all(f.stats for f in m.files if f.dv_rows)
        assert [r["k"] for r in b.read(where=[("k", "=", 500)]).collect()] == [500]
        # second bounded delete excludes first's dead rows (prior DVs)
        assert b.delete(where=[("k", "<", 15)]) == 5
        assert b.read().count() == 1000 - 15

    def test_bounded_noop_and_eviction(self, spark, tmp_path, monkeypatch):
        t = self._mk(spark, tmp_path / "t")
        monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
        assert t.delete(where=[("k", "=", 10**9)]) == 0
        assert t.snapshot().op == "delete_noop"
        # gut one whole file (k % 4 == 0): entry must leave the manifest
        t2 = self._mk(spark, tmp_path / "t2")
        n_files_before = len(t2.snapshot().files)
        # file 0 holds k % 4 == 0; delete exactly those rows
        src_keys = [k for k in range(1000) if k % 4 == 0]
        assert t2.delete(where=[("k", "in", src_keys)]) == len(src_keys)
        m = t2.snapshot()
        assert len(m.files) == n_files_before - 1  # evicted outright
        assert t2.read().count() == 1000 - len(src_keys)

    def test_bounded_commit_rebases_disjoint_and_rejects_conflicts(
        self, spark, tmp_path, monkeypatch
    ):
        t = self._mk(spark, tmp_path / "t")
        monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
        base = t._head_version()
        f0 = t.snapshot().files[0]
        # a racer lands base+1 touching a DIFFERENT file
        other = t.snapshot().files[1]
        t._commit_bounded(
            base,
            (mt._dc_replace(other, dv_rows=other.dv_rows),),
            {other.path},
            "delete",
        )
        # our bounded commit from the SAME base must rebase cleanly
        t._commit_bounded(base, (f0,), {f0.path}, "delete")
        assert t._head_version() == base + 2
        # and a commit whose files the racer touched must be rejected
        with pytest.raises(mt.ConcurrentWriteError, match="re-read"):
            t._commit_bounded(base, (f0,), {f0.path}, "delete")

    def test_bounded_then_classic_interleave(self, spark, tmp_path, monkeypatch):
        """Bounded commits replay correctly under classic snapshots and
        vice versa (no cache poisoning, no checkpoint confusion)."""
        t = self._mk(spark, tmp_path / "t")
        monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
        t.delete(where=[("k", "<", 5)])       # bounded
        t.append(spark.range(2000, 2010).selectExpr("id AS k", "id % 7 AS v"))
        monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 10**9)
        t.delete(where=[("k", "=", 2005)])    # classic
        monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
        assert t.read().count() == 1000 - 5 + 10 - 1
        assert t.read(where=[("k", "<", 5)]).count() == 0
        assert {r["k"] for r in t.read(where=[("k", ">=", 2000)]).collect()} == (
            set(range(2000, 2010)) - {2005}
        )

    def test_bounded_update_matches_classic(self, spark, tmp_path, monkeypatch):
        a = self._mk(spark, tmp_path / "ua")
        b = self._mk(spark, tmp_path / "ub")
        na = a.update(where=[("k", "<", 10)], set_exprs={"v": 99})
        monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
        nb = b.update(where=[("k", "<", 10)], set_exprs={"v": 99})
        assert na == nb == 10
        assert b.snapshot().op == "update"
        assert sorted(map(tuple, b.read().collect())) == sorted(
            map(tuple, a.read().collect())
        )
        # rewritten rows present exactly once with the new value
        assert b.read(where=[("k", "<", 10)]).filter("v = 99").count() == 10
        # bounded noop
        assert b.update(where=[("k", "=", 10**9)], set_exprs={"v": 1}) == 0
        assert b.snapshot().op == "update_noop"
        with pytest.raises(ValueError, match="unknown columns"):
            b.update(where=[("k", "=", 1)], set_exprs={"zz": 1})


def test_bounded_count_matches_snapshot(spark, tmp_path, monkeypatch):
    """count() past the gate folds the checkpoint header total + tail —
    appends, DV deletes (re-versioned entries), and evictions must all
    reconcile exactly with the classic snapshot total."""
    t = _mk(spark, tmp_path / "t")
    t._write_checkpoint(t.snapshot())
    t.append(spark.range(5000, 5050).selectExpr("id AS k", "id % 7 AS v"))
    t.delete(where=[("k", "<", 10)])  # DV re-version in the tail
    monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", 1)
    assert t.count() == t.snapshot().total_rows == 1000 + 50 - 10
    # gut a whole file: eviction rides the tail as remove-without-readd
    src_keys = [k for k in range(10, 1000) if k % 4 == 0]
    t.delete(where=[("k", "in", src_keys)])
    assert t.count() == t.snapshot().total_rows == 1000 + 50 - 10 - len(src_keys)
