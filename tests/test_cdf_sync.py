"""CDF replica maintenance (streaming/cdf_sync.py): a downstream table
kept row-exact with an upstream that receives DML, by folding each
change-feed micro-batch to one net image per key and applying ONE
idempotent txn-stamped merge. Stream ≡ batch, exactly-once across
restart, and the fold's last-writer-wins semantics are pinned here.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)
from data_warehouse_copy_spark.streaming.cdf_sync import (  # noqa: E402
    apply_changes,
    fold_changes,
    stream_replicate,
)


def _rows(t: ManagedTable):
    return sorted(map(tuple, t.read().collect()))


def _mk_src(spark, root, n=12):
    t = ManagedTable.create(spark, root)
    t.append(
        spark.range(n).selectExpr("id AS k", "id % 7 AS v")
    )
    return t


class TestFold:
    def _fold(self, spark, rows):
        df = spark.createDataFrame(
            rows, "k long, v long, _change_type string, _commit_version long"
        )
        return {
            (r["k"], r["v"], r["__is_delete"])
            for r in fold_changes(df, ["k"]).collect()
        }

    def test_last_writer_wins_per_key(self, spark):
        got = self._fold(
            spark,
            [
                (1, 10, "insert", 2),
                (1, 10, "update_preimage", 3),
                (1, 11, "update_postimage", 3),
                (2, 20, "insert", 2),
                (2, 20, "delete", 4),  # inserted then deleted -> delete
                (3, 30, "delete", 2),
            ],
        )
        assert got == {(1, 11, False), (2, 20, True), (3, 30, True)}

    def test_postimage_outranks_preimage_within_one_commit(self, spark):
        got = self._fold(
            spark,
            [
                (1, 10, "update_preimage", 5),
                (1, 99, "update_postimage", 5),
            ],
        )
        assert got == {(1, 99, False)}

    def test_replace_where_delete_plus_insert_same_version(self, spark):
        """A replace_where commit deletes AND reinserts a key at ONE
        _commit_version: the fold must pick the insert (the key is in
        that commit's post-state), deterministically — not a row_number
        coin flip between two rank-tied rows."""
        got = self._fold(
            spark,
            [
                (1, 10, "delete", 4),
                (1, 77, "insert", 4),
                (2, 20, "delete", 4),  # deleted, NOT reinserted
            ],
        )
        assert got == {(1, 77, False), (2, 20, True)}

    def test_double_update_folds_to_final(self, spark):
        got = self._fold(
            spark,
            [
                (1, 10, "update_preimage", 3),
                (1, 11, "update_postimage", 3),
                (1, 11, "update_preimage", 4),
                (1, 12, "update_postimage", 4),
            ],
        )
        assert got == {(1, 12, False)}


def test_stream_replica_tracks_dml_exactly(spark, tmp_path):
    src = _mk_src(spark, tmp_path / "src")
    src.delete(where=[("k", "<", 3)])  # pre-stream DML
    q = stream_replicate(
        spark, str(tmp_path / "src"), str(tmp_path / "rep"),
        str(tmp_path / "ckpt"), key_cols="k",
    )
    rep = ManagedTable(spark, tmp_path / "rep")
    try:
        q.processAllAvailable()  # bootstrap
        assert _rows(rep) == _rows(src)
        src.update(where=[("k", "=", 5)], set_exprs={"v": F.lit(-1)})
        src.append(spark.createDataFrame([(100, 0)], "k long, v long"))
        src.delete(where=[("k", "=", 7)])
        q.processAllAvailable()  # live tail: update + insert + delete
        assert _rows(rep) == _rows(src)
        assert (100, 0) in _rows(rep)
        assert not [r for r in _rows(rep) if r[0] == 7]
        # replace_where: delete+insert of the SAME keys in ONE commit —
        # the fold's same-version tie-break (insert wins) end to end
        src.replace_where(
            spark.createDataFrame([(4, 40), (5, 50)], "k long, v long"),
            where=[("k", ">=", 4), ("k", "<=", 5)],
        )
        q.processAllAvailable()
        assert _rows(rep) == _rows(src)
        assert (4, 40) in _rows(rep) and (5, 50) in _rows(rep)
    finally:
        q.stop()


def test_stream_replica_restart_exactly_once(spark, tmp_path):
    src = _mk_src(spark, tmp_path / "src", n=6)

    def start():
        return stream_replicate(
            spark, str(tmp_path / "src"), str(tmp_path / "rep"),
            str(tmp_path / "ckpt"), key_cols="k",
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    src.delete(where=[("k", "=", 0)])  # lands while the stream is DOWN
    src.append(spark.createDataFrame([(50, 1)], "k long, v long"))
    q2 = start()
    rep = ManagedTable(spark, tmp_path / "rep")
    try:
        q2.processAllAvailable()
        assert _rows(rep) == _rows(src)
    finally:
        q2.stop()
    # no duplicate keys ever (exactly-once application)
    rows = _rows(rep)
    assert len({r[0] for r in rows}) == len(rows)


def test_apply_changes_txn_replay_is_noop(spark, tmp_path):
    rep = ManagedTable.create(spark, tmp_path / "rep")
    rep.append(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    batch = spark.createDataFrame(
        [(1, 11, "update_postimage", 3), (2, 20, "delete", 3)],
        "k long, v long, _change_type string, _commit_version long",
    )
    out1 = apply_changes(rep, batch, ["k"], txn=("app", 7))
    assert out1.get("skipped") is not True
    state = _rows(rep)
    assert state == [(1, 11)]
    # the SAME epoch replayed: merge skips, state untouched
    out2 = apply_changes(rep, batch, ["k"], txn=("app", 7))
    assert out2.get("skipped") is True
    assert _rows(rep) == state
    # a LATER epoch applies normally
    batch2 = spark.createDataFrame(
        [(9, 90, "insert", 4)],
        "k long, v long, _change_type string, _commit_version long",
    )
    apply_changes(rep, batch2, ["k"], txn=("app", 8))
    assert _rows(rep) == [(1, 11), (9, 90)]


def test_merge_txn_is_idempotent_per_app(spark, tmp_path):
    """The ManagedTable.merge(txn=) surface itself (new r11): the Delta
    txnAppId/txnVersion contract extended from append/overwrite to
    MERGE — what a foreachBatch consumer needs for exactly-once."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.createDataFrame([(1, 10)], "k long, v long"))
    src = spark.createDataFrame([(1, 99), (2, 20)], "k long, v long")
    r1 = t.merge(src, on="k", when_matched_update={"v": "s.v"},
                 txn=("m", 1))
    assert r1 == {"updated": 1, "deleted": 0, "inserted": 1}
    r2 = t.merge(src, on="k", when_matched_update={"v": "s.v"},
                 txn=("m", 1))
    assert r2.get("skipped") is True
    assert _rows(t) == [(1, 99), (2, 20)]
    # an earlier epoch is also skipped (watermark, not equality)
    r3 = t.merge(src, on="k", when_matched_update={"v": "s.v"},
                 txn=("m", 0))
    assert r3.get("skipped") is True
