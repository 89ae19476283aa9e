"""Logical conflict resolution for concurrent DML (round-12 verdict
item 2): the rebase loops' compatibility check grows from file identity
to Delta's WriteSerializable conflict matrix —

- two commits GROWING the same file's deletion vector reconcile
  row-level when their position deltas are disjoint (Delta's DV
  row-level concurrency); overlapping positions still raise;
- a racer's genuine ADDS (merge inserts, update/delete rewrites,
  replace_where loads) conflict with a rebasing reader-writer iff they
  could fall inside its READ REGION (merge key span / predicate span);
  disjoint regions commute;
- blind appends and rewrite-only compaction stay exempt, exactly
  Delta's default isolation.

The deterministic tests drive the commit layer directly from a stale
base (the in-process `_lock_for` serializes full DML calls, so the
conflict path only fires cross-process or at this layer); the
cross-process storm runs two real subprocess mergers on disjoint key
spans of a day-partitioned table and asserts the serial result.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ConcurrentWriteError,
    ManagedTable,
    _dc_replace,
    _where_read_spans,
)


@pytest.fixture()
def one_file_table(spark, tmp_path):
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(
        spark.range(0, 100)
        .selectExpr("CAST(id AS INT) AS k", "CAST(0 AS INT) AS v")
        .coalesce(1)
    )
    assert len(t.snapshot().files) == 1
    return t


def _dv_growth(t, stale, lo, hi):
    """A writer's DV-growth diff against the ``stale`` manifest: real DV
    parquet for rows lo <= k < hi of the (single) file, plus the grown
    entry — exactly what delete/update/merge hand the commit layer."""
    hits = t._scan_with_pos(stale, list(stale.files)).filter(
        (F.col("k") >= lo) & (F.col("k") < hi)
    )
    dv_files, per_file = t._write_dv(hits)
    assert dv_files is not None
    (path, n) = next(iter(per_file.items()))
    f = next(e for e in stale.files if e.path == path)
    entry = _dc_replace(
        f, dv_paths=f.dv_paths + dv_files, dv_rows=f.dv_rows + n
    )
    return entry, path


def test_disjoint_dv_growth_reconciles_classic(spark, one_file_table):
    """Two writers deleting DISJOINT rows of the SAME file: the loser's
    rebase folds both deletion vectors — both commits land, the table
    equals the serial result."""
    t = one_file_table
    stale = t.snapshot()
    # writer A lands first through the normal path
    assert t.delete([("k", "<", 10)]) == 10
    # writer B planned against the stale base
    entry, path = _dv_growth(t, stale, 50, 60)
    assert t._commit_files(
        stale,
        (entry,),
        stale.schema_json,
        "delete",
        read_spans=_where_read_spans([("k", ">=", 50), ("k", "<", 60)]),
    )
    assert t.read().count() == 80
    ks = {r.k for r in t.read().collect()}
    assert not (ks & set(range(0, 10))) and not (ks & set(range(50, 60)))
    # the head entry carries BOTH writers' DV files
    (f,) = t.snapshot().files
    assert len(f.dv_paths) == 2 and f.dv_rows == 20


def test_disjoint_dv_growth_reconciles_bounded(spark, one_file_table):
    t = one_file_table
    stale = t.snapshot()
    assert t.delete([("k", "<", 10)]) == 10
    entry, path = _dv_growth(t, stale, 90, 100)
    assert t._commit_bounded(
        stale.version,
        (entry,),
        {path},
        "delete",
        read_spans={"k": (90, 99)},
    )
    assert t.read().count() == 80
    (f,) = t.snapshot().files
    assert len(f.dv_paths) == 2 and f.dv_rows == 20


def test_overlapping_dv_growth_still_conflicts(spark, one_file_table):
    """Two writers claiming the SAME row (overlapping positions) is a
    genuine lost-update — both commit paths must reject it."""
    t = one_file_table
    stale = t.snapshot()
    assert t.delete([("k", "<", 10)]) == 10
    entry, path = _dv_growth(t, stale, 5, 15)  # overlaps rows 5..9
    with pytest.raises(ConcurrentWriteError):
        t._commit_files(stale, (entry,), stale.schema_json, "delete")
    with pytest.raises(ConcurrentWriteError):
        t._commit_bounded(stale.version, (entry,), {path}, "delete")
    assert t.read().count() == 90  # only writer A's delete is in effect


def test_racer_dml_adds_inside_read_region_conflict(spark, tmp_path):
    """A racer MERGE's inserted rows land inside our read region → no
    serial order exists → conflict; outside it → the diffs commute and
    the rebase lands."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(
        spark.range(0, 100).selectExpr(
            "CAST(id AS INT) AS k", "CAST(0 AS INT) AS v"
        )
    )
    stale = t.snapshot()
    # racer: a merge that INSERTS keys 200..209 (genuine adds)
    t.merge(
        spark.range(200, 210).selectExpr(
            "CAST(id AS INT) AS k", "CAST(1 AS INT) AS v"
        ),
        on="k",
    )
    ours = t._write_files(
        spark.range(500, 510).selectExpr(
            "CAST(id AS INT) AS k", "CAST(2 AS INT) AS v"
        ),
        None,
        None,
    )
    # our merge read keys 195..205: the racer inserted rows in that span
    with pytest.raises(ConcurrentWriteError, match="read region"):
        t._commit_files(
            stale, tuple(stale.files) + ours, stale.schema_json, "merge",
            read_spans={"k": (195, 205)},
        )
    # disjoint read region: commutes, rebases
    ours2 = t._write_files(
        spark.range(510, 520).selectExpr(
            "CAST(id AS INT) AS k", "CAST(2 AS INT) AS v"
        ),
        None,
        None,
    )
    assert t._commit_files(
        stale, tuple(stale.files) + ours2, stale.schema_json, "merge",
        read_spans={"k": (510, 519)},
    )
    assert t.read().count() == 120


def test_blind_appends_and_compaction_stay_exempt(spark, tmp_path):
    """Delta's WriteSerializable relaxation: a BLIND append carries no
    read set, so it reorders after any reader-writer — overlapping read
    regions never conflict with it. Rewrite-only compaction likewise."""
    t = ManagedTable.create(spark, tmp_path / "t")
    for i in range(3):
        t.append(
            spark.range(i * 100, (i + 1) * 100).selectExpr(
                "CAST(id AS INT) AS k", "CAST(0 AS INT) AS v"
            )
        )
    stale = t.snapshot()
    t.append(  # racer blind append INSIDE our read region
        spark.range(0, 50).selectExpr(
            "CAST(id AS INT) AS k", "CAST(9 AS INT) AS v"
        )
    )
    t.compact()  # racer rewrite-only op
    ours = t._write_files(
        spark.range(1000, 1010).selectExpr(
            "CAST(id AS INT) AS k", "CAST(2 AS INT) AS v"
        ),
        None,
        None,
    )
    assert t._commit_bounded(
        stale.version, ours, set(), "merge", read_spans={"k": (0, 100)}
    )
    assert t.read().count() == 360


def test_where_read_spans_extraction():
    assert _where_read_spans([("k", "=", 5)]) == {"k": (5, 5)}
    assert _where_read_spans([("k", ">=", 2), ("k", "<", 9)]) == {
        "k": (2, 9)
    }
    assert _where_read_spans([("k", "in", [7, 3, 5])]) == {"k": (3, 7)}
    spans = _where_read_spans(
        [("d", "=", "2024-01-02"), ("", "expr", "lower(s) = 'x'")]
    )
    assert spans == {"d": ("2024-01-02", "2024-01-02")}
    # nothing extractable = reads everywhere
    assert _where_read_spans([("", "expr", "lower(s) = 'x'")]) == {}


_MERGER_SCRIPT = r"""
import sys, time
from pathlib import Path
from data_warehouse_copy_spark.session import get_spark
from data_warehouse_copy_spark.sources.managed_table import ManagedTable

root, wid, other, barrier = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
spark = get_spark(shuffle_partitions=2)
t = ManagedTable(spark, root)
orig = t._put_version
state = {"first": True}

def gated_put(version, payload):
    # both mergers plan against the SAME base: announce readiness, wait
    # for the other process's announcement, then race the real put
    if state["first"]:
        state["first"] = False
        Path(barrier + f".{wid}").write_text("ready")
        deadline = time.time() + 120
        while not Path(barrier + f".{other}").exists():
            if time.time() > deadline:
                raise RuntimeError("peer never reached the barrier")
            time.sleep(0.05)
    return orig(version, payload)

t._put_version = gated_put
lo = wid * 1000
src = spark.range(lo, lo + 500).selectExpr(
    "CAST(id AS INT) AS k",
    f"DATE'2024-01-0{wid + 1}' AS d",
    "CAST(%d AS INT) AS v" % (wid + 1),
)
out = t.merge(src, on="k", when_matched_update={"v": "s.v"})
print("RESULT", wid, out["updated"], out["inserted"])
"""


def test_cross_process_disjoint_partition_mergers_both_commit(
    spark, tmp_path
):
    """The round-12 storm: two real processes MERGE into disjoint day
    partitions / disjoint key spans of one table, gated so both plan
    against the same base and genuinely race the commit. Both must land
    (the loser rebases through the logical-conflict rules) and the table
    must equal the serial result."""
    import subprocess

    root = str(tmp_path / "t")
    t = ManagedTable.create(spark, root, partition_date_col="d")
    t.append(
        spark.sql(
            """
            SELECT CAST(id AS INT) AS k,
                   CASE WHEN id < 1000 THEN DATE'2024-01-01'
                        ELSE DATE'2024-01-02' END AS d,
                   CAST(0 AS INT) AS v
            FROM range(0, 2000)
            """
        )
    )
    # worker w updates keys [w*1000, w*1000+500) => day w+1, v=w+1
    barrier = str(tmp_path / "barrier")
    env = dict(__import__("os").environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _MERGER_SCRIPT, root, str(w), str(1 - w), barrier],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for w in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    assert "RESULT 0 500 0" in outs[0]
    assert "RESULT 1 500 0" in outs[1]
    rows = {(r.k, str(r.d), r.v) for r in t.read().collect()}
    expect = {
        (
            i,
            "2024-01-01" if i < 1000 else "2024-01-02",
            1 if i < 500 else (2 if 1000 <= i < 1500 else 0),
        )
        for i in range(2000)
    }
    assert rows == expect
    assert t._head_version() == 3  # append + two merge commits, no loss


def test_read_spans_keyed_by_physical_names_under_mapping(spark, tmp_path):
    """Column-mapping soundness: file-entry stats are keyed by PHYSICAL
    names, so the read region must be too — a rename chain that REUSES
    a logical name would otherwise compare the wrong column's range
    (a missed conflict)."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.createDataFrame([(1, 2)], "a int, v int"))
    t.rename_column("a", "b")
    t.add_column("a", "int")  # NEW column reusing the old logical name
    cols = t.snapshot().columns
    from data_warehouse_copy_spark.sources.managed_table import (
        _phys_map,
    )

    pmap = _phys_map(cols)
    assert pmap["b"] == "a"  # the rename kept the physical name
    assert pmap["a"] != "a"  # the reused logical name got a fresh one
    spans = _where_read_spans([("b", "=", 5), ("a", ">", 3)], cols)
    assert spans == {"a": (5, 5), pmap["a"]: (3, None)}
