"""Column DEFAULT values + IDENTITY columns (round-12 verdict item 3).

DEFAULT <expr> lives in the field metadata slot (like comments and
generation expressions): appends/INSERTs that OMIT the column compute
the default at the one align chokepoint every append path crosses;
provided values pass through; SET/DROP DEFAULT apply to future writes
only. GENERATED ALWAYS AS IDENTITY closes the reference's target-side
``Id`` regeneration (TableCopyService.cs:156-160 excludes the column;
SQL Server's identity re-assigns it): ids allocate from a per-column
CAS watermark chain under ``_log`` — ALLOCATED ids are collision-free
among themselves under any number of processes BY CONSTRUCTION (a lost
CAS discards the staged files and re-assigns), monotonic, gaps allowed
(Delta's documented contract). USER-PROVIDED ids are data and can
equal earlier allocations (Delta's explicit-insert caveat — see
test_identity_by_default_provided_vs_allocated_boundary).
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
from data_warehouse_copy_spark.sources.names import NamedCatalog  # noqa: E402
from data_warehouse_copy_spark.sources.sql_dml import SqlDmlError  # noqa: E402


def test_default_computes_when_omitted(spark, tmp_path):
    c = NamedCatalog(tmp_path / "cat.json")
    c.sql(
        spark,
        f"CREATE TABLE global_temp.d (k INT, s STRING DEFAULT 'n/a', "
        f"r DOUBLE DEFAULT (1.5 * 2)) USING managed_table "
        f"LOCATION '{tmp_path / 'd'}'",
    )
    c.sql(spark, "INSERT INTO global_temp.d (k) VALUES (1), (2)")
    c.sql(spark, "INSERT INTO global_temp.d (k, s) VALUES (3, 'given')")
    t = ManagedTable(spark, tmp_path / "d")
    assert sorted(map(tuple, t.read().collect())) == [
        (1, "n/a", 3.0),
        (2, "n/a", 3.0),
        (3, "given", 3.0),
    ]
    # the native append path honors the same chokepoint
    t.append(spark.createDataFrame([(4,)], "k int"))
    assert (4, "n/a", 3.0) in set(map(tuple, t.read().collect()))


def test_default_signed_and_niladic_function_forms(spark, tmp_path):
    """Round-13 (advice fix): unparenthesized ``DEFAULT -1`` and
    ``DEFAULT CURRENT_TIMESTAMP()`` parse (Delta accepts both); richer
    expressions still require parentheses, loudly."""
    c = NamedCatalog(tmp_path / "cat.json")
    c.sql(
        spark,
        f"CREATE TABLE global_temp.ds (k INT, n INT DEFAULT -1, "
        f"p DOUBLE DEFAULT +2.5, ts TIMESTAMP DEFAULT CURRENT_TIMESTAMP()) "
        f"USING managed_table LOCATION '{tmp_path / 'ds'}'",
    )
    c.sql(spark, "INSERT INTO global_temp.ds (k) VALUES (1)")
    r = ManagedTable(spark, tmp_path / "ds").read().first()
    assert (r.k, r.n, r.p) == (1, -1, 2.5) and r.ts is not None
    # richer unparenthesized expressions don't parse in this dialect —
    # the statement falls through to spark.sql, which rejects it loudly
    # (never a silently-wrong table)
    for bad in (
        f"CREATE TABLE global_temp.bad (k INT DEFAULT abs(-1)) "
        f"USING managed_table LOCATION '{tmp_path / 'bad'}'",
        f"CREATE TABLE global_temp.bad2 (k STRING DEFAULT -'x') "
        f"USING managed_table LOCATION '{tmp_path / 'bad2'}'",
    ):
        with pytest.raises(Exception):
            c.sql(spark, bad)
        assert not (tmp_path / "bad").exists()
        assert not (tmp_path / "bad2").exists()


def test_set_drop_default_future_writes_only(spark, tmp_path):
    c = NamedCatalog(tmp_path / "cat.json")
    c.sql(
        spark,
        f"CREATE TABLE global_temp.sd (k INT, s STRING) "
        f"USING managed_table LOCATION '{tmp_path / 'sd'}'",
    )
    c.sql(spark, "INSERT INTO global_temp.sd (k) VALUES (1)")
    c.sql(
        spark,
        "ALTER TABLE global_temp.sd ALTER COLUMN s SET DEFAULT 'later'",
    )
    c.sql(spark, "INSERT INTO global_temp.sd (k) VALUES (2)")
    c.sql(spark, "ALTER TABLE global_temp.sd ALTER COLUMN s DROP DEFAULT")
    c.sql(spark, "INSERT INTO global_temp.sd (k) VALUES (3)")
    t = ManagedTable(spark, tmp_path / "sd")
    assert sorted(map(tuple, t.read().collect())) == [
        (1, None),  # pre-default rows untouched
        (2, "later"),
        (3, None),
    ]


def test_default_show_create_reruns_verbatim(spark, tmp_path):
    c = NamedCatalog(tmp_path / "cat.json")
    c.sql(
        spark,
        f"CREATE TABLE global_temp.sc (k INT, s STRING DEFAULT 'x' "
        f"COMMENT 'why') USING managed_table LOCATION '{tmp_path / 'sc'}'",
    )
    ddl = c.sql(spark, "SHOW CREATE TABLE global_temp.sc").first().createtab_stmt
    assert "DEFAULT ('x')" in ddl
    c2 = NamedCatalog(tmp_path / "cat2.json")
    c2.sql(
        spark,
        ddl.replace(str(tmp_path / "sc"), str(tmp_path / "sc2")).replace(
            "global_temp.sc", "global_temp.sc2"
        ),
    )
    t2 = ManagedTable(spark, tmp_path / "sc2")
    assert t2.column_defaults() == {"s": "'x'"}
    assert t2.column_comments() == {"s": "why"}


def test_bad_default_fails_at_ddl_time(spark, tmp_path):
    c = NamedCatalog(tmp_path / "cat.json")
    with pytest.raises(SqlDmlError, match="DEFAULT"):
        c.sql(
            spark,
            f"CREATE TABLE global_temp.bd (k INT, s STRING DEFAULT "
            f"(no_such_fn(1))) USING managed_table "
            f"LOCATION '{tmp_path / 'bd'}'",
        )


def test_identity_allocates_unique_monotonic(spark, tmp_path):
    c = NamedCatalog(tmp_path / "cat.json")
    c.sql(
        spark,
        f"CREATE TABLE global_temp.i (id BIGINT GENERATED ALWAYS AS "
        f"IDENTITY (START WITH 100 INCREMENT BY 3), name STRING) "
        f"USING managed_table LOCATION '{tmp_path / 'i'}'",
    )
    c.sql(spark, "INSERT INTO global_temp.i (name) VALUES ('a'), ('b')")
    c.sql(spark, "INSERT INTO global_temp.i (name) VALUES ('c')")
    t = ManagedTable(spark, tmp_path / "i")
    rows = sorted((r.name, r.id) for r in t.read().collect())
    ids = [i for _n, i in rows]
    assert len(set(ids)) == 3  # collision-free
    assert min(ids) >= 100  # start respected
    assert all((i - 100) % 3 == 0 for i in ids)  # step respected
    # the later insert allocates strictly above the earlier watermark
    first_two = {i for n, i in rows if n in ("a", "b")}
    assert {i for n, i in rows if n == "c"} > {max(first_two)} or min(
        i for n, i in rows if n == "c"
    ) > max(first_two)
    # provided ids rejected on every surface (GENERATED ALWAYS)
    with pytest.raises(Exception, match="IDENTITY"):
        c.sql(spark, "INSERT INTO global_temp.i (id, name) VALUES (1, 'x')")
    with pytest.raises(ValueError, match="IDENTITY"):
        t.append(spark.createDataFrame([(1, "x")], "id bigint, name string"))
    # merge insert clauses cannot allocate — loud, not NULL ids
    with pytest.raises(ValueError, match="IDENTITY"):
        t.merge(
            spark.createDataFrame([(999, "z")], "id bigint, name string"),
            on="id",
        )
    ddl = c.sql(spark, "SHOW CREATE TABLE global_temp.i").first().createtab_stmt
    assert "GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 3)" in ddl
    c2 = NamedCatalog(tmp_path / "cat2.json")
    c2.sql(
        spark,
        ddl.replace(str(tmp_path / "i"), str(tmp_path / "i2")).replace(
            "global_temp.i", "global_temp.i2"
        ),
    )
    assert ManagedTable(spark, tmp_path / "i2").identity_columns() == {
        "id": {"start": 100, "step": 3, "always": True}
    }


def test_identity_watermark_survives_delete_and_restore(spark, tmp_path):
    """The watermark chain is independent of the data log on purpose:
    deleting the max row (or restoring an old version) must never let
    ids be reused."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity("id")
    t.append(spark.createDataFrame([("a",), ("b",)], "name string"))
    high = max(r.id for r in t.read().collect())
    t.delete([("id", "=", int(high))])
    t.append(spark.createDataFrame([("c",)], "name string"))
    ids = [r.id for r in t.read().collect()]
    assert len(set(ids)) == len(ids)
    assert max(ids) > high  # the deleted max id is never reissued


_IDENTITY_WORKER = r"""
import sys
from pyspark.sql import types as T
from data_warehouse_copy_spark.session import get_spark
from data_warehouse_copy_spark.sources.managed_table import ManagedTable

root, wid, n_appends = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(shuffle_partitions=2)
t = ManagedTable(spark, root)
for i in range(n_appends):
    t.append(
        spark.createDataFrame(
            [(f"w{wid}b{i}r{j}",) for j in range(5)], "name string"
        )
    )
print("OK", wid)
"""


def test_identity_collision_free_under_cross_process_storm(spark, tmp_path):
    """Two processes appending concurrently into an identity table: the
    CAS watermark chain serializes allocation (a lost CAS re-assigns),
    so EVERY committed id is unique — the round-12 'collision-free under
    the cross-process append storm' bar."""
    import subprocess

    root = str(tmp_path / "t")
    t = ManagedTable.create(spark, root)
    t.append(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity("id")
    env = dict(__import__("os").environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _IDENTITY_WORKER, root, str(w), "4"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for w in (0, 1)
    ]
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-2000:]
        assert "OK" in out
    rows = t.read().collect()
    assert len(rows) == 40  # 2 procs x 4 appends x 5 rows, nothing lost
    ids = [r.id for r in rows]
    assert len(set(ids)) == 40, "identity ids collided under the storm"
    assert len({r.name for r in rows}) == 40


def test_sync_identity_marks_preexisting_rows_safe(spark, tmp_path):
    """set_identity on a table with PREEXISTING rows auto-syncs the
    watermark above them (and ALTER TABLE ... SYNC IDENTITY re-runs it
    after any out-of-band backfill), so the first allocation can never
    collide with data that predates the marking."""
    c = NamedCatalog(tmp_path / "cat.json")
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(
        spark.createDataFrame(
            [(500, "old"), (900, "old2")], "id bigint, name string"
        )
    )
    t.set_identity("id")
    t.append(spark.createDataFrame([("new",)], "name string"))
    rows = sorted((r.id, r.name) for r in t.read().collect())
    ids = [i for i, _n in rows]
    assert len(set(ids)) == 3 and max(ids) > 900
    # SQL spelling is a no-op when already ahead, and returns a summary
    c.register("global_temp.sy", str(tmp_path / "t"))
    out = c.sql(spark, "ALTER TABLE global_temp.sy SYNC IDENTITY").first()
    assert out.operation == "ALTER SYNC_IDENTITY"
    assert t.sync_identity()["id"] >= max(ids)


def test_identity_watermark_rides_the_commit_protocol(spark, tmp_path):
    """The watermark chain resolves THROUGH the commit protocol (hint +
    probe-forward), never a filesystem glob — identity allocation works
    over the network object store exactly as on POSIX."""
    from data_warehouse_copy_spark.sources import commit_protocol as cp
    from data_warehouse_copy_spark.sources.http_store import (
        HttpObjectStore,
        HttpObjectStoreServer,
    )

    root = str(tmp_path / "t")
    with HttpObjectStoreServer() as srv:
        cp.register_commit_protocol(
            root,
            cp.ConditionalPutCommitProtocol(
                HttpObjectStore(srv.port, timeout=5)
            ),
        )
        try:
            t = ManagedTable.create(spark, root)
            t.append(spark.createDataFrame([], "id bigint, name string"))
            t.set_identity("id")
            t.append(
                spark.createDataFrame([("a",), ("b",)], "name string")
            )
            t.append(spark.createDataFrame([("c",)], "name string"))
            ids = [r.id for r in t.read().collect()]
            assert len(set(ids)) == 3
            # the chain lives in the HTTP bucket, not on the local FS
            assert any("_idseq_id" in k for k in srv.store._objects)
        finally:
            cp.unregister_commit_protocol(root)


def test_identity_chain_trimmed_by_clean_log(spark, tmp_path):
    """The watermark chain is bounded metadata too: clean_log trims it
    to the newest 64 entries, and allocation keeps working across the
    trim (it reads only the newest)."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity("id")
    t.append(spark.createDataFrame([("a",)], "name string"))
    # grow the chain the way 70 allocating appends would (one reserve
    # each), without paying 70 Spark jobs
    seq, high = t._identity_state("id", {"start": 1, "step": 1})
    for i in range(70):
        assert t._identity_reserve("id", seq + i, high + i + 1)
    d = Path(t.root) / "_log" / "_idseq_id"
    assert len(list(d.glob("0*.json"))) >= 70
    t.clean_log(retention_seconds=0)
    assert len(list(d.glob("0*.json"))) == 64
    # allocation still works and stays collision-free across the trim
    t.append(spark.createDataFrame([("post",)], "name string"))
    ids = [r.id for r in t.read().collect()]
    assert len(set(ids)) == len(ids) == 2
    assert max(ids) > high + 70  # above every reserved watermark


def test_identity_by_default_mixed_explicit_and_allocated(spark, tmp_path):
    """Round-13 (verdict item 2): GENERATED BY DEFAULT AS IDENTITY —
    explicit values PASS THROUGH, omitted frames and NULL slots
    allocate, and the watermark syncs past the provided max at commit
    so later allocations never collide (Delta's BY DEFAULT contract)."""
    c = NamedCatalog(tmp_path / "cat.json")
    c.sql(
        spark,
        f"CREATE TABLE global_temp.bd (id BIGINT GENERATED BY DEFAULT "
        f"AS IDENTITY (START WITH 10 INCREMENT BY 2), name STRING) "
        f"USING managed_table LOCATION '{tmp_path / 'bd'}'",
    )
    # explicit value ABOVE the watermark, then allocation resumes above
    c.sql(spark, "INSERT INTO global_temp.bd (id, name) VALUES (500, 'hi')")
    c.sql(spark, "INSERT INTO global_temp.bd (name) VALUES ('a1'), ('a2')")
    # NULL slot allocates inside a PROVIDED frame; low explicit passes
    c.sql(
        spark,
        "INSERT INTO global_temp.bd (id, name) "
        "VALUES (NULL, 'ns'), (3, 'low')",
    )
    t = ManagedTable(spark, tmp_path / "bd")
    rows = sorted((r.name, r.id) for r in t.read().collect())
    byname = dict(rows)
    ids = [i for _n, i in rows]
    assert len(set(ids)) == 5, rows
    assert byname["hi"] == 500 and byname["low"] == 3  # passthrough
    for n in ("a1", "a2", "ns"):
        assert byname[n] > 500, rows  # watermark outran the explicit max
        assert (byname[n] - 10) % 2 == 0  # start/step respected
    # SHOW CREATE renders BY DEFAULT and re-runs verbatim
    ddl = c.sql(
        spark, "SHOW CREATE TABLE global_temp.bd"
    ).first().createtab_stmt
    assert (
        "GENERATED BY DEFAULT AS IDENTITY (START WITH 10 INCREMENT BY 2)"
        in ddl
    )
    c2 = NamedCatalog(tmp_path / "cat2.json")
    c2.sql(
        spark,
        ddl.replace(str(tmp_path / "bd"), str(tmp_path / "bd2")).replace(
            "global_temp.bd", "global_temp.bd2"
        ),
    )
    spec = ManagedTable(spark, tmp_path / "bd2").identity_columns()["id"]
    assert (spec["start"], spec["step"], spec["always"]) == (10, 2, False)
    # the native append path accepts a provided frame too
    t.append(spark.createDataFrame([(9000, "big")], "id bigint, name string"))
    t.append(spark.createDataFrame([("after",)], "name string"))
    rows2 = dict((r.name, r.id) for r in t.read().collect())
    assert rows2["big"] == 9000 and rows2["after"] > 9000
    assert len(set(rows2.values())) == 7


def test_identity_by_default_merge_pk_upsert(spark, tmp_path):
    """The reference's PK-carrying upsert shape
    (TableUpdateService.cs:130-161): MERGE insert clauses may PROVIDE a
    BY DEFAULT identity column (never allocate), and the watermark
    syncs past the inserted max at commit."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity("id", always=False)
    t.append(spark.createDataFrame([("a",), ("b",)], "name string"))
    src = spark.createDataFrame(
        [(7000, "x"), (7010, "y")], "id bigint, name string"
    )
    res = t.merge(src, on="id")  # INSERT * carries the PK
    assert res["inserted"] == 2
    # post-merge allocation lands ABOVE the merged-in ids
    t.append(spark.createDataFrame([("post",)], "name string"))
    rows = dict((r.name, r.id) for r in t.read().collect())
    assert rows["x"] == 7000 and rows["y"] == 7010
    assert rows["post"] > 7010
    assert len(set(rows.values())) == 5
    # assignment-form insert clauses must still PROVIDE the column
    with pytest.raises(ValueError, match="PROVIDE"):
        t.merge(
            spark.createDataFrame([(1, "z")], "k bigint, name string"),
            on="name",
            when_not_matched_insert=[
                {"condition": None, "insert": {"name": "s.name"}}
            ],
        )
    # ... and ALWAYS tables keep rejecting insert clauses outright
    ta = ManagedTable.create(spark, tmp_path / "ta")
    ta.append(spark.createDataFrame([], "id bigint, name string"))
    ta.set_identity("id")
    with pytest.raises(ValueError, match="ALWAYS"):
        ta.merge(
            spark.createDataFrame([(1, "z")], "id bigint, name string"),
            on="id",
        )


def test_identity_merge_clauses_and_merge_by_key_contract(spark, tmp_path):
    """Round-13 hardening: MERGE update clauses cannot assign an ALWAYS
    identity column; assigning a BY DEFAULT one syncs the watermark.
    merge_by_key (the reference upsert) rejects ALWAYS identity tables
    outright, requires BY DEFAULT sources to carry the column, and
    syncs the watermark past the source max."""
    ta = ManagedTable.create(spark, tmp_path / "ta")
    ta.append(spark.createDataFrame([], "id bigint, k int, name string"))
    ta.set_identity("id")
    ta.append(spark.createDataFrame([(1, "a")], "k int, name string"))
    with pytest.raises(ValueError, match="cannot assign"):
        ta.merge(
            spark.createDataFrame([(1, "b")], "k int, name string"),
            on="k",
            when_matched_update={"id": "s.k"},
            when_not_matched_insert=False,
        )
    with pytest.raises(ValueError, match="merge_by_key"):
        ta.merge_by_key(
            spark.createDataFrame(
                [(9, 1, "b")], "id bigint, k int, name string"
            ),
            "k",
        )
    tb = ManagedTable.create(spark, tmp_path / "tb")
    tb.append(spark.createDataFrame([], "id bigint, k int, name string"))
    tb.set_identity("id", always=False)
    tb.append(spark.createDataFrame([(1, "a"), (2, "b")], "k int, name string"))
    # BY DEFAULT source must carry the column
    with pytest.raises(ValueError, match="PROVIDE"):
        tb.merge_by_key(
            spark.createDataFrame([(1, "c")], "k int, name string"), "k"
        )
    # PK-carrying upsert with an id ABOVE the watermark syncs it
    n = tb.merge_by_key(
        spark.createDataFrame(
            [(8000, 1, "upd"), (8010, 9, "new")],
            "id bigint, k int, name string",
        ),
        "k",
    )
    assert n == 2
    tb.append(spark.createDataFrame([(5, "post")], "k int, name string"))
    rows = dict((r.name, r.id) for r in tb.read().collect())
    assert rows["upd"] == 8000 and rows["new"] == 8010
    assert rows["post"] > 8010
    assert len(set(rows.values())) == 4
    # a matched-update raising the id syncs too
    tb.merge(
        spark.createDataFrame([(9, 9500)], "k int, newid bigint"),
        on="k",
        when_matched_update={"id": "s.newid"},
        when_not_matched_insert=False,
    )
    tb.append(spark.createDataFrame([(6, "post2")], "k int, name string"))
    rows2 = dict((r.name, r.id) for r in tb.read().collect())
    assert rows2["new"] == 9500 and rows2["post2"] > 9500
    assert len(set(rows2.values())) == 5


def test_identity_by_default_fill_preserves_big_ints(spark, tmp_path):
    """The fill pass never round-trips user values through pandas
    (round-14: pyarrow's to_pandas delivers nullable int64 as float64,
    so ANY pandas stage corrupts ids beyond 2^53 whenever a NULL shares
    the Arrow batch) — provided ids beyond 2^53 round-trip bit-exact
    even with NULL slots in the SAME single partition, NULL slots
    allocate unique ids, and the watermark outruns the provided max."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity("id", always=False)
    big = [(2**53 + 1, "b1"), (2**61 + 7, "b2"), (None, "n1"),
           (123, "small"), (None, "n2")]
    # coalesce(1): NULLs and >2^53 ids share one partition AND one
    # Arrow batch — the exact shape the float64 round-trip corrupted
    t.append(
        spark.createDataFrame(big, "id bigint, name string").coalesce(1)
    )
    rows = dict((r.name, r.id) for r in t.read().collect())
    assert rows["b1"] == 2**53 + 1  # a float64 stage would corrupt this
    assert rows["b2"] == 2**61 + 7
    assert rows["small"] == 123
    assert rows["n1"] is not None and rows["n2"] is not None
    assert len(set(rows.values())) == 5
    t.append(spark.createDataFrame([("post",)], "name string"))
    post = dict((r.name, r.id) for r in t.read().collect())["post"]
    assert post > 2**61 + 7  # watermark synced past the huge provided id
    # multi-partition: still unique, still bit-exact
    t2 = ManagedTable.create(spark, tmp_path / "t2")
    t2.append(spark.createDataFrame([], "id bigint, name string"))
    t2.set_identity("id", always=False)
    t2.append(
        spark.createDataFrame(
            [(2**53 + 1, "b1"), (None, "n1"), (2**53 + 3, "b3"),
             (None, "n2"), (None, "n3")],
            "id bigint, name string",
        ).repartition(3)
    )
    got = dict((r.name, r.id) for r in t2.read().collect())
    assert got["b1"] == 2**53 + 1 and got["b3"] == 2**53 + 3
    assert len(set(got.values())) == 5


def test_identity_by_default_merge_by_key_after_rename(spark, tmp_path):
    """Physical-name keying end-to-end: rename the BY DEFAULT identity
    column, then run the PK-carrying upsert — the watermark sync maps
    through the rename, so a post-merge append still clears the
    merged-in max."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.createDataFrame([], "id bigint, k int, name string"))
    t.set_identity("id", always=False)
    t.append(spark.createDataFrame([(1, "a")], "k int, name string"))
    t.rename_column("id", "doc_id")
    n = t.merge_by_key(
        spark.createDataFrame(
            [(7777, 1, "upd"), (7788, 2, "new")],
            "doc_id bigint, k int, name string",
        ),
        "k",
    )
    assert n == 2
    t.append(spark.createDataFrame([(3, "post")], "k int, name string"))
    rows = dict((r.name, r.doc_id) for r in t.read().collect())
    assert rows["upd"] == 7777 and rows["new"] == 7788
    assert rows["post"] > 7788
    assert len(set(rows.values())) == 3


def test_identity_update_contract(spark, tmp_path):
    """Round-13 hardening: UPDATE cannot assign an ALWAYS identity
    column (Delta semantics); an UPDATE that raises a BY DEFAULT
    identity value syncs the watermark so later allocations clear it."""
    ta = ManagedTable.create(spark, tmp_path / "ta")
    ta.append(spark.createDataFrame([], "id bigint, name string"))
    ta.set_identity("id")
    ta.append(spark.createDataFrame([("a",)], "name string"))
    with pytest.raises(ValueError, match="ALWAYS"):
        ta.update([("name", "=", "a")], {"id": 99})
    tb = ManagedTable.create(spark, tmp_path / "tb")
    tb.append(spark.createDataFrame([], "id bigint, name string"))
    tb.set_identity("id", always=False)
    tb.append(spark.createDataFrame([("a",), ("b",)], "name string"))
    assert tb.update([("name", "=", "a")], {"id": 5000}) == 1
    tb.append(spark.createDataFrame([("c",)], "name string"))
    rows = dict((r.name, r.id) for r in tb.read().collect())
    assert rows["a"] == 5000 and rows["c"] > 5000
    assert len(set(rows.values())) == 3


def test_matview_cursor_is_monotonic(tmp_path):
    """A slower concurrent REFRESH must not regress the persisted
    cursor below its racer's advance."""
    from data_warehouse_copy_spark.sources.names import NamedCatalog as NC

    c = NC(tmp_path / "cat.json")
    c.register_matview("global_temp.m", {"sql": "x", "base": "b",
                                         "location": "l", "ts_col": "ts",
                                         "duration": "1 hour", "cursor": 0})
    c.set_matview_cursor("global_temp.m", 6)
    c.set_matview_cursor("global_temp.m", 5)  # slow racer lands late
    assert c.matview("global_temp.m")["cursor"] == 6


_BYDEFAULT_WORKER = r"""
import sys
from data_warehouse_copy_spark.session import get_spark
from data_warehouse_copy_spark.sources.managed_table import ManagedTable

root, wid, n_appends = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(shuffle_partitions=2)
t = ManagedTable(spark, root)
for i in range(n_appends):
    if wid == 0:
        # explicit-PK writer: disjoint negative range, pure passthrough
        t.append(spark.createDataFrame(
            [(-(1000 * (i + 1) + j), f"w0b{i}r{j}") for j in range(5)],
            "id bigint, name string"))
    else:
        t.append(spark.createDataFrame(
            [(f"w1b{i}r{j}",) for j in range(5)], "name string"))
print("OK", wid)
"""


def test_identity_by_default_mixed_writer_storm(spark, tmp_path):
    """Cross-process storm with MIXED writers — one providing explicit
    PKs, one allocating: every committed id unique, nothing lost."""
    import subprocess

    root = str(tmp_path / "t")
    t = ManagedTable.create(spark, root)
    t.append(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity("id", always=False)
    env = dict(__import__("os").environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _BYDEFAULT_WORKER, root, str(w), "4"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for w in (0, 1)
    ]
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-2000:]
        assert "OK" in out
    rows = t.read().collect()
    assert len(rows) == 40
    ids = [r.id for r in rows]
    assert len(set(ids)) == 40, "ids collided under the mixed storm"
    assert sum(1 for i in ids if i < 0) == 20  # explicit PKs intact


def test_identity_survives_rename_column(spark, tmp_path):
    """Round-13 (advice fix): the watermark chain and the footer-stats
    harvest are keyed by the column's immutable PHYSICAL name, so
    rename_column neither orphans the chain (which would re-anchor at
    start and reissue live ids) nor stalls the watermark (which would
    let the NEXT append collide)."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity("id", start=10, step=2)
    t.append(spark.createDataFrame([("a",), ("b",)], "name string"))
    before = sorted(r.id for r in t.read().collect())
    t.rename_column("id", "doc_id")
    # chain stays at the physical name — no orphan dir appears
    log = Path(t.root) / "_log"
    assert (log / "_idseq_id").exists()
    assert not (log / "_idseq_doc_id").exists()
    t.append(spark.createDataFrame([("c",), ("d",)], "name string"))
    rows = sorted((r.name, r.doc_id) for r in t.read().collect())
    ids = [i for _n, i in rows]
    assert len(set(ids)) == 4, f"duplicate ids after rename: {rows}"
    # the post-rename batch allocates strictly ABOVE the pre-rename max
    post = [i for n, i in rows if n in ("c", "d")]
    assert min(post) > max(before)
    assert all((i - 10) % 2 == 0 for i in ids)
    # ... and the watermark ADVANCED from the post-rename append (the
    # stats harvest found the physical-keyed maxima): one more append
    # still allocates above everything
    t.append(spark.createDataFrame([("e",)], "name string"))
    ids2 = [r.doc_id for r in t.read().collect()]
    assert len(set(ids2)) == 5
    # sync_identity maps through the rename too
    assert t.sync_identity()["doc_id"] >= max(ids2)


def test_identity_trimmed_chain_lost_hint_self_heals(spark, tmp_path):
    """Round-13 (advice fix): losing the _LATEST hint on a TRIMMED
    chain must not re-anchor at start (reissuing live ids). The _FLOOR
    marker clean_log writes before trimming anchors the probe at the
    oldest kept entry, so the state self-heals to the true watermark."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity("id")
    t.append(spark.createDataFrame([("a",)], "name string"))
    seq, high = t._identity_state("id", {"start": 1, "step": 1})
    for i in range(70):
        assert t._identity_reserve("id", seq + i, high + i + 1)
    t.clean_log(retention_seconds=0)
    d = Path(t.root) / "_log" / "_idseq_id"
    assert (d / "_FLOOR").exists()
    (d / "_LATEST").unlink()
    s2, h2 = t._identity_state("id", {"start": 1, "step": 1})
    assert h2 == high + 70, "lost hint on trimmed chain must self-heal"
    # allocation resumes above every reserved watermark
    t.append(spark.createDataFrame([("post",)], "name string"))
    ids = [r.id for r in t.read().collect()]
    assert len(set(ids)) == len(ids) == 2 and max(ids) > high + 70


def test_identity_trimmed_chain_without_anchor_raises(spark, tmp_path):
    """Both anchors lost on a trimmed chain (pre-marker trims): the
    state must fail LOUDLY instead of silently re-anchoring at start."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity("id")
    t.append(spark.createDataFrame([("a",)], "name string"))
    seq, high = t._identity_state("id", {"start": 1, "step": 1})
    for i in range(70):
        assert t._identity_reserve("id", seq + i, high + i + 1)
    t.clean_log(retention_seconds=0)
    d = Path(t.root) / "_log" / "_idseq_id"
    (d / "_LATEST").unlink()
    (d / "_FLOOR").unlink()
    with pytest.raises(RuntimeError, match="no reachable anchor"):
        t._identity_state("id", {"start": 1, "step": 1})
    with pytest.raises(RuntimeError, match="no reachable anchor"):
        t.append(spark.createDataFrame([("b",)], "name string"))


def test_declarative_writer_rejects_identity_tables(spark, tmp_path):
    """The declarative writer ships caller-supplied values verbatim — on
    an identity table that would bypass allocation and collide with the
    watermark, so it must reject loudly (append/INSERT are the write
    paths that allocate)."""
    from data_warehouse_copy_spark.sources.datasource import register

    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity("id")
    register(spark)
    with pytest.raises(Exception, match="IDENTITY"):
        (
            spark.createDataFrame([(1, "x")], "id bigint, name string")
            .write.format("managed_table")
            .mode("append")
            .save(str(tmp_path / "t"))
        )
    assert t.read().count() == 0


def test_identity_by_default_provided_vs_allocated_boundary(spark, tmp_path):
    """Round-14 (found by the cross-process storm): the engine
    guarantees ALLOCATED ids are unique among themselves and above
    every previously-committed provided max — it does NOT deduplicate
    USER-PROVIDED ids against earlier allocations. The SERIAL schedule
    below produces the collision deterministically: a huge provided id
    jumps the watermark, the allocator allocates just above it, then a
    second append provides an id inside that allocated range —
    passthrough-below-watermark accepts it (Delta's documented
    explicit-insert identity caveat; uniqueness of provided values is
    the user's constraint)."""
    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity("id", always=False)
    # 1. provider jumps the watermark to 1_000_000
    t.append(
        spark.createDataFrame([(1_000_000, "jump")], "id bigint, name string")
    )
    # 2. allocator: NULL slots allocate above 1_000_000
    t.append(
        spark.createDataFrame([("a1",), ("a2",)], "name string")
    )
    rows = dict((r.name, r.id) for r in t.read().collect())
    assert rows["a1"] > 1_000_000 and rows["a2"] > 1_000_000
    assert rows["a1"] != rows["a2"]
    # 3. second provider re-uses an allocated id: passthrough accepts it
    taken = rows["a1"]
    t.append(
        spark.createDataFrame([(taken, "clash")], "id bigint, name string")
    )
    got = t.read().where(f"id = {taken}").count()
    assert got == 2  # the documented boundary: provided values are data
    # ... and later allocations STILL stay unique and above everything
    t.append(spark.createDataFrame([("post",)], "name string"))
    final = [(r.name, r.id) for r in t.read().collect()]
    post_id = dict(final)["post"]
    assert post_id > max(i for _n, i in final if _n != "post")
