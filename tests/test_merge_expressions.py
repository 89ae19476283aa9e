"""Expression-level MERGE (ManagedTable.merge, VERDICT r5 item 3):
partial-column whenMatchedUpdate with s./t. expressions, a match
condition, matched-delete, insert-only mode, the Delta cardinality
guard, and stats-pruned target candidates."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)


def _mk(spark, root, n=20, **kw):
    t = ManagedTable.create(spark, root, **kw)
    t.append(
        spark.range(0, n).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("a"),
            (F.col("id") % 3).alias("b"),
        )
    )
    return t


def _rows(t) -> dict:
    return {r["k"]: (r["a"], r["b"]) for r in t.read().collect()}


def test_partial_column_update_keeps_unassigned(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    src = spark.createDataFrame([(3, 999), (5, 555)], "k long, a long")
    res = t.merge(
        src, on="k",
        when_matched_update={"a": "s.a"},
        when_not_matched_insert=False,
    )
    assert res == {"updated": 2, "deleted": 0, "inserted": 0}
    got = _rows(t)
    assert got[3] == (999, 3 % 3) and got[5] == (555, 5 % 3)  # b untouched
    assert got[4] == (40, 4 % 3)  # unmatched untouched
    assert len(got) == 20


def test_update_expression_references_both_sides(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    src = spark.createDataFrame([(2, 7)], "k long, a long")
    t.merge(
        src, on="k",
        when_matched_update={"a": "t.a + s.a", "b": F.lit(100)},
        when_not_matched_insert=False,
    )
    assert _rows(t)[2] == (20 + 7, 100)


def test_match_condition_gates_update(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    # only rows where the source value EXCEEDS the target update
    src = spark.createDataFrame([(1, 5), (9, 500)], "k long, a long")
    res = t.merge(
        src, on="k",
        when_matched_update={"a": "s.a"},
        match_condition="s.a > t.a",
        when_not_matched_insert=False,
    )
    assert res["updated"] == 1
    got = _rows(t)
    assert got[1] == (10, 1)  # 5 < 10: untouched
    assert got[9] == (500, 0)


def test_matched_delete(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    src = spark.createDataFrame([(0,), (1,), (99,)], "k long")
    res = t.merge(
        src, on="k",
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    assert res == {"updated": 0, "deleted": 2, "inserted": 0}
    got = _rows(t)
    assert 0 not in got and 1 not in got and len(got) == 18


def test_insert_only_merge(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    src = spark.createDataFrame(
        [(1, -1, -1), (30, 300, 0), (31, 310, 1)], "k long, a long, b long"
    )
    res = t.merge(src, on="k")  # no matched clause: insert-only dedup
    assert res == {"updated": 0, "deleted": 0, "inserted": 2}
    got = _rows(t)
    assert got[1] == (10, 1)  # existing key untouched
    assert got[30] == (300, 0) and got[31] == (310, 1)


def test_upsert_update_plus_insert(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    src = spark.createDataFrame(
        [(4, 44, 4), (40, 400, 0)], "k long, a long, b long"
    )
    res = t.merge(src, on="k", when_matched_update={"a": "s.a"})
    assert res == {"updated": 1, "deleted": 0, "inserted": 1}
    got = _rows(t)
    assert got[4] == (44, 4 % 3) and got[40] == (400, 0)


def test_ambiguous_merge_raises(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    src = spark.createDataFrame([(3, 1), (3, 2)], "k long, a long")
    with pytest.raises(ValueError, match="ambiguous merge"):
        t.merge(
            src, on="k",
            when_matched_update={"a": "s.a"},
            when_not_matched_insert=False,
        )
    # duplicate DELETES are fine (position recorded once)
    res = t.merge(
        src, on="k", when_matched_delete=True, when_not_matched_insert=False
    )
    assert res["deleted"] == 1
    assert 3 not in _rows(t)


def test_merge_validations(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    src = spark.createDataFrame([(1, 2)], "k long, a long")
    with pytest.raises(ValueError, match="exclusive"):
        t.merge(src, on="k", when_matched_update={"a": 1}, when_matched_delete=True)
    with pytest.raises(ValueError, match="unknown columns"):
        t.merge(src, on="k", when_matched_update={"zz": 1},
                when_not_matched_insert=False)
    with pytest.raises(ValueError, match="key columns"):
        t.merge(src, on="k", when_matched_update={"k": 1},
                when_not_matched_insert=False)
    with pytest.raises(ValueError, match="every table column"):
        t.merge(src, on="k", when_matched_update={"a": "s.a"})  # src lacks b


def test_merge_target_stats_prunes_candidates(spark, tmp_path):
    """On a key-clustered table, only files whose key span admits a
    source key may gain a deletion vector — the merge must not touch
    (or scan) the rest."""
    t = ManagedTable.create(spark, tmp_path / "t", cluster_col="k")
    t.append(
        spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("a"),
            (F.col("id") % 3).alias("b"),
        ),
        cluster_partitions=8,
    )
    m0 = t.snapshot()
    assert len(m0.files) == 8
    src = spark.createDataFrame([(5, 1), (7, 2)], "k long, a long")
    res = t.merge(
        src, on="k",
        when_matched_update={"a": "s.a"},
        when_not_matched_insert=False,
    )
    assert res["updated"] == 2
    m1 = t.snapshot()
    dvd = [f.path for f in m1.files if f.dv_rows and f.path in
           {x.path for x in m0.files}]
    # both keys live in the lowest-span file; every other original file
    # is untouched (same entry, no DV)
    assert len(dvd) == 1
    untouched = {f.path: f for f in m0.files} | {}
    for f in m1.files:
        if f.path in untouched and f.path not in dvd:
            assert f == untouched[f.path]


def test_merge_multi_key(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    src = spark.createDataFrame([(3, 0, -1), (3, 2, -2)], "k long, b long, a long")
    res = t.merge(
        src, on=["k", "b"],
        when_matched_update={"a": "s.a"},
        when_not_matched_insert=False,
    )
    assert res["updated"] == 1  # only (3, b=0) exists (3 % 3 == 0)
    assert _rows(t)[3] == (-1, 0)


def test_bounded_expression_merge_matches_classic(spark, tmp_path, monkeypatch):
    """Past the planning gate the expression merge plans its candidates
    from the checkpoint-backed span probe and commits an action diff —
    values must equal the classic full-manifest path exactly, across
    update+insert, matched-delete, match conditions, and the noop."""
    import data_warehouse_copy_spark.sources.managed_table as mt

    def build(root, gate):
        t = ManagedTable.create(spark, root, cluster_col="k")
        t.append(
            spark.range(0, 40).select(
                F.col("id").alias("k"),
                (F.col("id") * 10).alias("a"),
                (F.col("id") % 3).alias("b"),
            ),
            cluster_partitions=4,
        )
        t._write_checkpoint(t.snapshot())
        monkeypatch.setattr(mt, "_DISTRIBUTED_PLAN_MIN_FILES", gate)
        src = spark.createDataFrame(
            [(5, 999, 1), (7, 888, 0), (100, 1, 1), (101, 2, 2)],
            "k long, a long, b long",
        )
        res1 = t.merge(
            src, on="k",
            when_matched_update={"a": "s.a"},
            match_condition="t.b = 1",
        )
        res2 = t.merge(
            spark.createDataFrame([(6, 0, 0)], "k long, a long, b long"),
            on="k", when_matched_delete=True,
            when_not_matched_insert=False,
        )
        res3 = t.merge(  # noop: no match, no insert clause
            spark.createDataFrame([(500, 0, 0)], "k long, a long, b long"),
            on="k", when_matched_delete=True, when_not_matched_insert=False,
        )
        rows = sorted(map(tuple, t.read().collect()))
        return res1, res2, res3, rows, t

    b1, b2, b3, bounded_rows, tb = build(tmp_path / "bounded", 1)
    c1, c2, c3, classic_rows, _ = build(tmp_path / "classic", 10**9)
    assert (b1, b2, b3) == (c1, c2, c3)
    assert b1 == {"updated": 1, "deleted": 0, "inserted": 2}
    assert b2 == {"updated": 0, "deleted": 1, "inserted": 0}
    assert b3 == {"updated": 0, "deleted": 0, "inserted": 0}
    assert bounded_rows == classic_rows
    # the bounded commits are action DIFFS (no full file list in the log)
    import json as _json

    raws = [
        _json.loads(
            (tb.root / "_log" / f"{v:020d}.json").read_text()
        )
        for v in range(3, tb._head_version() + 1)
    ]
    assert all("files" not in r for r in raws)
    assert any(r["op"] == "merge" for r in raws)
    assert any(r["op"] == "merge_noop" for r in raws)


# ------------------------------------------------- full clause surface (r7 item 2)


def test_multi_clause_first_match_wins(spark, tmp_path):
    """Two conditional WHEN MATCHED clauses: a row passing both is acted
    on by the FIRST only (Delta semantics)."""
    t = _mk(spark, tmp_path / "t")  # k 0..19, a = 10k, b = k%3
    src = spark.createDataFrame(
        [(3, -1), (5, 7), (7, -2)], "k long, sv long"
    )
    res = t.merge(
        src,
        on="k",
        when_matched=[
            {"condition": "s.sv < 0", "delete": True},
            {"condition": None, "update": {"a": "s.sv * 100"}},
        ],
        when_not_matched_insert=False,
    )
    assert res == {"updated": 1, "deleted": 2, "inserted": 0}
    got = _rows(t)
    assert 3 not in got and 7 not in got        # clause 0 (delete) won
    assert got[5] == (700, 2)                   # clause 1 updated, b kept
    assert len(got) == 18


def test_not_matched_by_source_update_and_delete(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10)
    src = spark.createDataFrame([(0,), (1,), (2,)], "k long")
    res = t.merge(
        src,
        on="k",
        when_matched=[{"condition": None, "update": {"a": "t.a + 1"}}],
        when_not_matched_by_source=[
            {"condition": "t.k >= 8", "delete": True},
            {"condition": "t.b = 1", "update": {"a": "-5"}},
        ],
        when_not_matched_insert=False,
    )
    # matched: k 0,1,2 → a+1; by source: k 8,9 deleted; k 4,7 (b==1,
    # k<8, unmatched) → a=-5; k 3,5,6 untouched
    assert res == {"updated": 5, "deleted": 2, "inserted": 0}
    got = _rows(t)
    assert got[0] == (1, 0) and got[1] == (11, 1) and got[2] == (21, 2)
    assert 8 not in got and 9 not in got
    assert got[4] == (-5, 1) and got[7] == (-5, 1)
    assert got[3] == (30, 0) and got[5] == (50, 2) and got[6] == (60, 0)
    assert len(got) == 8


def test_by_source_is_one_atomic_commit_and_cdc_shape(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=6)
    v0 = t.snapshot().version
    src = spark.createDataFrame([(0,), (99,)], "k long")
    t.merge(
        src,
        on="k",
        when_matched=[{"condition": None, "delete": True}],
        when_not_matched_by_source=[
            {"condition": "t.k = 5", "update": {"a": "0"}}
        ],
        when_not_matched_insert=False,
    )
    assert t.snapshot().version == v0 + 1
    # the DV recorded each position once: deleted + updated rows distinct
    assert t.count() == 5 and _rows(t)[5] == (0, 2)


def test_clause_validation_rejects_malformed(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=5)
    src = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="exactly one of"):
        t.merge(src, on="k", when_matched=[{"condition": "1=1"}])
    with pytest.raises(ValueError, match="exactly one of"):
        t.merge(
            src, on="k",
            when_matched=[{"update": {"a": "1"}, "delete": True}],
        )
    with pytest.raises(ValueError, match="not last"):
        t.merge(
            src, on="k",
            when_matched=[
                {"delete": True},
                {"condition": "s.k > 0", "update": {"a": "1"}},
            ],
        )
    with pytest.raises(ValueError, match="not both"):
        t.merge(
            src, on="k",
            when_matched=[{"delete": True}],
            when_matched_delete=True,
        )
    with pytest.raises(ValueError, match="unknown columns"):
        t.merge(
            src, on="k",
            when_matched=[{"update": {"zz": "1"}}],
            when_not_matched_insert=False,
        )
    with pytest.raises(ValueError, match="key columns"):
        t.merge(
            src, on="k",
            when_not_matched_by_source=[{"update": {"k": "1"}}],
            when_not_matched_insert=False,
        )


def test_multi_clause_cardinality_guard(spark, tmp_path):
    """Two source rows hitting one target row under an update clause set
    stay ambiguous — the guard fires across clause routing too."""
    t = _mk(spark, tmp_path / "t", n=5)
    src = spark.createDataFrame([(1, 5), (1, 9)], "k long, sv long")
    with pytest.raises(ValueError, match="ambiguous merge"):
        t.merge(
            src, on="k",
            when_matched=[
                {"condition": "s.sv > 6", "delete": True},
                {"condition": None, "update": {"a": "s.sv"}},
            ],
            when_not_matched_insert=False,
        )


def test_legacy_single_clause_args_unchanged(spark, tmp_path):
    """The legacy argument form is exactly a one-clause list — identical
    result, byte-for-byte."""
    t1 = _mk(spark, tmp_path / "t1")
    t2 = _mk(spark, tmp_path / "t2")
    src = spark.createDataFrame([(3, 42), (99, 7)], "k long, a long")
    src_full = src.withColumn("b", F.lit(0))
    r1 = t1.merge(
        src_full, on="k",
        when_matched_update={"a": "s.a"},
        match_condition="s.a > 10",
    )
    r2 = t2.merge(
        src_full, on="k",
        when_matched=[{"condition": "s.a > 10", "update": {"a": "s.a"}}],
    )
    assert r1 == r2 == {"updated": 1, "deleted": 0, "inserted": 1}
    assert _rows(t1) == _rows(t2)


def test_merge_schema_evolution(spark, tmp_path):
    """schema_evolution=True (Delta's MERGE WITH SCHEMA EVOLUTION):
    extra source columns are ADDED to the target (nullable,
    metadata-only) before the merge, so INSERT * carries them, matched
    UPDATEs may assign them, and pre-existing rows null-backfill.
    Default stays Delta's: extra source columns ignored."""
    t = _mk(spark, tmp_path / "t")
    src = spark.createDataFrame(
        [(3, 999, "x3"), (99, 555, "x99")], "k long, a long, extra string"
    )
    res = t.merge(
        src,
        on="k",
        when_matched=[{"condition": None, "update": {"a": "s.a", "extra": "s.extra"}}],
        schema_evolution=True,
    )
    assert res == {"updated": 1, "deleted": 0, "inserted": 1}
    assert t.read().columns == ["k", "a", "b", "extra"]
    got = {r.k: (r.a, r.extra) for r in t.read().collect()}
    assert got[3] == (999, "x3")       # matched update assigned the new col
    assert got[99] == (555, "x99")     # INSERT * carried it
    assert got[0] == (0, None)         # untouched row null-backfilled
    # target column 'b' absent from the source: inserted rows get NULL
    # (Delta's evolution contract), existing rows keep their value
    got_b = {r.k: r.b for r in t.read().collect()}
    assert got_b[99] is None and got_b[3] == 0
    # idempotent on re-merge (column already exists -> no re-add)
    t.merge(src, on="k", schema_evolution=True)
    assert t.read().columns == ["k", "a", "b", "extra"]
    # default: no evolution — INSERT * still demands every target column
    # (the strict contract), and the schema never grows
    t2 = _mk(spark, tmp_path / "t2")
    with pytest.raises(ValueError, match="every table column"):
        t2.merge(src, on="k")
    src_full = spark.createDataFrame(
        [(99, 555, 0, "x99")], "k long, a long, b long, extra string"
    )
    t2.merge(src_full, on="k")  # extra source column silently unused
    assert t2.read().columns == ["k", "a", "b"]
