"""File-level bloom-filter index (sources/bloom.py + the
ManagedTable/declarative wiring): ``=`` lookups on a column the table is
NOT clustered on must skip files the bitmap proves empty — with zero
false negatives (a bloom may only KEEP a file it shouldn't, never skip
one it shouldn't), across the native reader, the declarative reader,
point DML, compaction, vacuum, and restore.

Reference anchor: the reference's point access is server-side indexed SQL
(``TableUpdateService.cs:117-134`` key lookups); the lakehouse twin's
equivalent is manifest-level skipping, which min/max spans alone cannot
provide on unclustered columns.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.sources.bloom import (  # noqa: E402
    _scalar_hash_pair,
    _sizing,
    _test_bits,
    bloom_prune,
    value_kind,
)
from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)


def _mk(spark, root, n=4000, files=4):
    """A table whose k-spans all overlap (k % files round-robins rows into
    every file) so min/max stats can never prune a point lookup — blooms
    are the only skip tier that can help."""
    t = ManagedTable.create(spark, root, bloom_cols=["k", "name"])
    base = spark.range(0, n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("user-"), F.col("id").cast("string")).alias("name"),
        (F.col("id") % 7).alias("v"),
    )
    for i in range(files):
        # one file per append: the holder of any key is exactly one file
        t.append(base.filter(F.col("k") % files == i).coalesce(1))
    return t


def test_point_lookup_prunes_files_and_stays_exact(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    m = t.snapshot()
    assert len(m.files) == 4
    assert all(f.bloom_path for f in m.files)
    df = t.read(where=[("k", "=", 1234)])
    # 1234 % 4 == 2: exactly one file holds it; the other three must be
    # bloom-pruned (min/max spans all cover [~0, ~4000] and cannot)
    assert len(df.inputFiles()) == 1
    assert [r["k"] for r in df.collect()] == [1234]


def test_absent_key_prunes_everything(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    df = t.read(where=[("k", "=", 10**9)])
    assert df.count() == 0
    assert not df.inputFiles()


def test_no_false_negatives_over_every_key(spark, tmp_path):
    """Soundness sweep: every stored key must come back — one bloom false
    negative anywhere is silent data loss."""
    t = _mk(spark, tmp_path / "t", n=2000)
    got = t.read(where=[("k", ">=", 0)]).count()
    assert got == 2000
    # per-key probe via the prune helper (driver-side, no Spark jobs)
    m = t.snapshot()
    for k in range(0, 2000, 17):
        kept = bloom_prune(t.root, list(m.files), [("k", "=", k)])
        assert kept, f"key {k} bloom-pruned to zero files"
        # the read (pruned + filtered) must return exactly the row
        rows = t.read(where=[("k", "=", k)]).collect()
        assert len(rows) == 1 and rows[0]["k"] == k


def test_string_bloom_lookup(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    df = t.read(where=[("name", "=", "user-321")])
    assert len(df.inputFiles()) == 1
    assert df.collect()[0]["k"] == 321
    assert t.read(where=[("name", "=", "nobody")]).count() == 0


def test_kind_mismatch_never_prunes_wrong(spark, tmp_path):
    """A str predicate on an int-bloomed column (Spark casts and still
    matches rows) must not consult the int bitmap — it would hash
    differently and wrongly prune."""
    t = _mk(spark, tmp_path / "t")
    assert t.read(where=[("k", "=", "1234")]).count() == 1
    # floats and bools are never bloomable predicate kinds
    assert value_kind(1.5) is None and value_kind(True) is None
    assert t.read(where=[("v", "=", 3)]).count() > 0  # unindexed col: fine


def test_in_predicate_batched_lookup(spark, tmp_path):
    """``("col", "in", values)`` = ONE scan of the bloom-surviving file
    union — the batched point lookup. A file survives iff ANY listed
    value may be present."""
    t = _mk(spark, tmp_path / "t")
    # keys 8 and 16 both land in file k%4==0 -> exactly one file survives
    df = t.read(where=[("k", "in", [8, 16])])
    assert len(df.inputFiles()) == 1
    assert sorted(r["k"] for r in df.collect()) == [8, 16]
    # keys across two mod classes -> two files
    df2 = t.read(where=[("k", "in", [8, 9])])
    assert len(df2.inputFiles()) == 2
    assert sorted(r["k"] for r in df2.collect()) == [8, 9]
    # all-absent list prunes everything
    df3 = t.read(where=[("k", "in", [10**9, 10**9 + 1])])
    assert df3.count() == 0 and not df3.inputFiles()
    # mixed present/absent keeps only the present key's holder
    df4 = t.read(where=[("k", "in", [8, 10**9])])
    assert len(df4.inputFiles()) == 1
    assert [r["k"] for r in df4.collect()] == [8]
    # a float in the list disables pruning for that conjunct but stays exact
    df5 = t.read(where=[("k", "in", [8, 2.5])])
    assert [r["k"] for r in df5.collect()] == [8]
    # empty list matches nothing
    assert t.read(where=[("k", "in", [])]).count() == 0
    # min/max spans still apply to in-lists independently of blooms
    df6 = t.read(where=[("name", "in", ["user-8", "user-9"])])
    assert sorted(r["k"] for r in df6.collect()) == [8, 9]


def test_range_predicates_ignore_blooms(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=1000)
    assert t.read(where=[("k", ">=", 990)]).count() == 10


def test_point_delete_touches_only_holder_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    m0 = t.snapshot()
    assert t.delete(where=[("k", "=", 77)]) == 1
    m1 = t.snapshot()
    # only the holder file's entry changed (grew a DV); 3 others untouched
    changed = [
        f.path for f in m1.files
        if {e.path: e for e in m0.files}.get(f.path) != f
    ]
    assert len(changed) == 1
    assert t.read(where=[("k", "=", 77)]).count() == 0
    assert t.count() == 4000 - 1


def test_point_update_scoped_and_exact(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    assert t.update(where=[("k", "=", 500)], set_exprs={"v": F.lit(99)}) == 1
    assert t.read(where=[("k", "=", 500)]).collect()[0]["v"] == 99
    assert t.read().filter(F.col("v") == 99).count() == 1


def test_compact_rebuilds_blooms_and_vacuum_keeps_live(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    old_sidecars = {f.bloom_path for f in t.snapshot().files}
    before, after = t.compact()
    assert after < before
    m = t.snapshot()
    assert all(f.bloom_path for f in m.files)
    new_sidecars = {f.bloom_path for f in m.files}
    assert new_sidecars.isdisjoint(old_sidecars)
    # pruning still works on the compacted layout (single file: lookup
    # keeps exactly it; absent key keeps none)
    assert t.read(where=[("k", "=", 123)]).count() == 1
    assert not t.read(where=[("k", "=", 10**9)]).inputFiles()
    removed = t.vacuum(retention_seconds=0.0)
    assert removed > 0
    for rel in new_sidecars:
        assert (t.root / rel).exists(), "live sidecar vacuumed"
    for rel in old_sidecars:
        assert not (t.root / rel).exists(), "dead sidecar survived vacuum"
    assert t.read(where=[("k", "=", 123)]).count() == 1


def test_restore_requires_sidecars(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", files=2)
    v1 = t.snapshot().version
    t.compact()
    t.vacuum(retention_seconds=0.0)  # v1's data files AND sidecars gone
    with pytest.raises(FileNotFoundError):
        t.restore(v1)


def test_declarative_reader_bloom_prunes(spark, tmp_path):
    import json

    from data_warehouse_copy_spark.sources import register_data_source

    register_data_source(spark)
    t = _mk(spark, tmp_path / "t")
    df = (
        spark.read.format("managed_table")
        .option("where", json.dumps([["k", "=", 1234]]))
        .load(str(tmp_path / "t"))
    )
    # the option is a conservative superset (pair with .filter for exact
    # rows); bloom pruning shows in the partition count: 1 surviving file
    assert df.rdd.getNumPartitions() == 1
    rows = df.filter(F.col("k") == 1234).collect()
    assert [r["k"] for r in rows] == [1234]
    empty = (
        spark.read.format("managed_table")
        .option("where", json.dumps([["k", "=", 10**9]]))
        .load(str(tmp_path / "t"))
    )
    assert empty.count() == 0
    # files observability surfaces the sidecar pointer
    files = (
        spark.read.format("managed_table")
        .option("files", "true")
        .load(str(tmp_path / "t"))
    )
    assert files.filter(F.col("bloom_path").isNull()).count() == 0


def test_declarative_in_option_batched_lookup(spark, tmp_path):
    """The ``in`` op through option("where") JSON: a value ARRAY —
    bloom-pruned partitions + exact rows with the paired filter."""
    import json

    from data_warehouse_copy_spark.sources import register_data_source

    register_data_source(spark)
    t = _mk(spark, tmp_path / "t")
    df = (
        spark.read.format("managed_table")
        .option("where", json.dumps([["k", "in", [8, 16]]]))
        .load(str(tmp_path / "t"))
    )
    assert df.rdd.getNumPartitions() == 1  # both keys live in file k%4==0
    rows = df.filter(F.col("k").isin([8, 16])).collect()
    assert sorted(r["k"] for r in rows) == [8, 16]


def test_cdc_and_stream_tail_bloom_prune(spark, tmp_path):
    """Selective tailing parity: a CDC cursor (and the stream source's
    tail, which shares the walk) with an ``=`` where-option must skip
    added files whose bloom excludes the key — and still deliver every
    matching row."""
    import json

    from data_warehouse_copy_spark.sources import register_data_source

    register_data_source(spark)
    t = _mk(spark, tmp_path / "t")  # 4 appends = versions 1..4
    # key 1234 (mod class 2) was added by exactly one commit's file
    df = (
        spark.read.format("managed_table")
        .option("changesFrom", "0")
        .option("where", json.dumps([["k", "=", 1234]]))
        .load(str(tmp_path / "t"))
    )
    assert df.rdd.getNumPartitions() == 1
    rows = df.filter(F.col("k") == 1234).collect()
    assert [r["k"] for r in rows] == [1234]
    # absent key: every added file bloom-pruned from the cursor
    none = (
        spark.read.format("managed_table")
        .option("changesFrom", "0")
        .option("where", json.dumps([["k", "=", 10**9]]))
        .load(str(tmp_path / "t"))
    )
    assert none.count() == 0


def test_schema_evolution_unbloomable_and_legacy_files_kept(spark, tmp_path):
    """Files written before a column existed (or with unbloomable types)
    have no bitmap for it — they must be KEPT by pruning."""
    t = ManagedTable.create(spark, tmp_path / "t", bloom_cols=["extra"])
    t.append(
        spark.range(5).coalesce(1).select(F.col("id").alias("k"))
    )  # no 'extra' yet
    t.append(
        spark.range(5, 10).coalesce(1).select(
            F.col("id").alias("k"),
            F.concat(F.lit("x"), F.col("id").cast("string")).alias("extra"),
        ),
        merge_schema=True,
    )
    df = t.read(where=[("extra", "=", "x7")])
    assert df.count() == 1
    # the pre-evolution file must survive pruning (its sidecar has no
    # 'extra' bitmap) even though none of its rows match
    assert len(df.inputFiles()) == 2


def test_unbloomable_config_degrades_to_no_index(spark, tmp_path):
    t = ManagedTable.create(spark, tmp_path / "t", bloom_cols=["f"])
    t.append(spark.range(5).coalesce(1).select((F.col("id") * 1.5).alias("f")))
    m = t.snapshot()
    assert all(f.bloom_path is None for f in m.files)  # float: not indexed
    assert t.read(where=[("f", "=", 3)]).count() == 1  # 3.0 — still exact


def test_bloom_survives_log_replay_and_checkpoint(spark, tmp_path):
    from data_warehouse_copy_spark.sources.managed_table import (
        _SNAP_CACHE,
        _SNAP_CACHE_GUARD,
    )

    t = _mk(spark, tmp_path / "t", n=400, files=2)
    with _SNAP_CACHE_GUARD:
        _SNAP_CACHE.clear()
    m = ManagedTable(spark, tmp_path / "t").snapshot()
    assert m.bloom_cols == ["k", "name"]
    assert all(f.bloom_path for f in m.files)
    assert t.read(where=[("k", "=", 399)]).count() == 1


def test_sizing_and_hash_determinism():
    assert _sizing(0) == 1 << 10
    assert _sizing(10**9) == 1 << 23
    assert _sizing(1000) % 8 == 0
    h1a, h2a = _scalar_hash_pair("i", 42)
    h1b, h2b = _scalar_hash_pair("i", 42)
    assert (h1a, h2a) == (h1b, h2b)
    assert h2a % 2 == 1  # odd stride: probe sequence never degenerates
    assert _scalar_hash_pair("s", "42") != (h1a, h2a)
    # all-ones bitmap: everything "may" be present
    assert _test_bits(b"\xff" * 128, h1a, h2a, 1024)
    # all-zeros bitmap: definite absence
    assert not _test_bits(b"\x00" * 128, h1a, h2a, 1024)


def test_distributed_build_under_url_encodable_root(spark, tmp_path, monkeypatch):
    """Regression: the distributed sidecar build parses
    _metadata.file_path, which Hadoop percent-encodes — a table root with
    a space failed relative_to executor-side on every >1M-row write.
    Force the distributed path (threshold 0) under a space-bearing root
    and verify the bloom still prunes exactly."""
    import data_warehouse_copy_spark.sources.bloom as bloom_mod

    monkeypatch.setattr(bloom_mod, "_LOCAL_BUILD_MAX_ROWS", 0)
    root = tmp_path / "with space" / "t"
    t = _mk(spark, root, n=2000, files=2)
    df = t.read(where=[("k", "=", 123)])
    assert len(df.inputFiles()) == 1  # bloom pruned the other file
    assert [r["k"] for r in df.collect()] == [123]
