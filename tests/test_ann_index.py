"""Persisted IVF-flat index (functions/ann_index.py): build → probe must
match the per-query IVF's recall contract while the probe-time plan
touches only the probed lists' files (the manifest-pruned serving path);
incremental add must keep search exact over the union."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.functions.ann_index import IvfIndex  # noqa: E402
from data_warehouse_copy_spark.functions.similarity import (  # noqa: E402
    brute_force_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _recall(exact_rows, approx_rows) -> float:
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    return len(exact & approx) / max(len(exact), 1)


def test_build_search_recall_vs_brute_force(spark, emb, tmp_path):
    idx = IvfIndex.build(
        spark, emb, tmp_path / "ivf", n_lists=8, sample_size=4096
    )
    qs = emb.filter(F.col("vec_id") < 10)
    approx = idx.search(qs, k=5, nprobe=3).collect()
    exact = brute_force_topk(emb, qs, k=5).collect()
    assert _recall(exact, approx) >= 0.5
    # contract shape: k rows per query, ranked, self excluded
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append(r)
        assert r["query_id"] != r["neighbor_id"]
    for rows in by_q.values():
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))


def test_probe_reads_only_probed_lists_files(spark, emb, tmp_path):
    idx = IvfIndex.build(
        spark, emb, tmp_path / "ivf", n_lists=8, sample_size=4096
    )
    t = idx._table()
    total = len(t.snapshot().files)
    assert total > 1, "list table must be multi-file for pruning to show"
    # a single probed list must open fewer files than the table has —
    # the range-clustered layout maps list -> few files in the manifest
    one = t.read(where=[("list_id", "in", [0])])
    assert 0 < len(one.inputFiles()) < total
    # values exact: the pruned read returns exactly list 0
    assert one.select("list_id").distinct().collect()[0]["list_id"] == 0


def test_incremental_add_serves_new_vectors(spark, emb, tmp_path):
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    idx = IvfIndex.build(
        spark, half, tmp_path / "ivf", n_lists=8, sample_size=4096
    )
    added = idx.add(rest)
    assert added == rest.count()
    # a vector added after build must be findable as its own nearest
    # neighbor when self-match is allowed
    probe = rest.limit(1)
    pid = probe.collect()[0]["vec_id"]
    hits = idx.search(probe, k=1, nprobe=1, exclude_self=False).collect()
    assert hits and hits[0]["neighbor_id"] == pid and hits[0]["rank"] == 1


def test_reopen_from_disk_no_rebuild(spark, emb, tmp_path):
    IvfIndex.build(spark, emb, tmp_path / "ivf", n_lists=8)
    idx2 = IvfIndex(spark, tmp_path / "ivf")  # fresh handle, no build
    qs = emb.filter(F.col("vec_id") < 3)
    rows = idx2.search(qs, k=3, nprobe=2).collect()
    assert len({r["query_id"] for r in rows}) == 3


def test_build_is_deterministic(spark, emb, tmp_path):
    a = IvfIndex.build(spark, emb, tmp_path / "a", n_lists=8, seed=7)
    b = IvfIndex.build(spark, emb, tmp_path / "b", n_lists=8, seed=7)
    assert np.array_equal(a._centroids(), b._centroids())
    qs = emb.filter(F.col("vec_id") < 5)
    ra = sorted(map(tuple, a.search(qs, k=5).collect()))
    rb = sorted(map(tuple, b.search(qs, k=5).collect()))
    assert ra == rb


def test_balance_fresh_build_has_zero_drift(spark, emb, tmp_path):
    idx = IvfIndex.build(
        spark, emb, tmp_path / "ivf", n_lists=8, sample_size=4096
    )
    b = idx.balance()
    assert b["drift"] == pytest.approx(0.0)
    assert b["empty_lists"] == 0
    assert b["imbalance"] >= 1.0
    assert sum(b["counts"].values()) == emb.count()


def test_drift_detected_and_rebuild_restores(spark, emb, tmp_path):
    """A drifted corpus (add() traffic concentrated far from every
    trained centroid) must move the balance metrics; rebuild() must
    restore the drift baseline and the pinned recall floor over the
    NEW distribution."""
    idx = IvfIndex.build(
        spark, emb, tmp_path / "ivf", n_lists=8, sample_size=4096
    )
    dim = len(emb.select("embedding").first()[0])
    # adversarial drift: 3x the corpus, all in one far-away direction
    n_new = emb.count() * 3
    drifted = (
        spark.range(1_000_000, 1_000_000 + n_new)
        .selectExpr("id AS vec_id")
        .withColumn(
            "embedding",
            F.array(
                *[
                    (F.lit(50.0) + F.rand(seed=7 + i)).cast("float")
                    for i in range(dim)
                ]
            ),
        )
        .withColumn("label", F.lit(0).cast("int"))
    )
    idx.add(drifted)
    b = idx.balance()
    assert b["drift"] > 0.5  # the frozen quantizer no longer fits
    after = idx.rebuild()
    assert after["drift"] == pytest.approx(0.0)  # fresh baseline
    assert after["empty_lists"] == 0
    assert sum(after["counts"].values()) == emb.count() + n_new
    # recall floor restored over the union corpus
    union = emb.unionByName(drifted)
    qs = union.filter(F.col("vec_id") < 10)
    approx = idx.search(qs, k=5, nprobe=3).collect()
    exact = brute_force_topk(union, qs, k=5).collect()
    assert _recall(exact, approx) >= 0.5


def test_rebuild_is_atomic_for_readers(spark, emb, tmp_path):
    idx = IvfIndex.build(
        spark, emb, tmp_path / "ivf", n_lists=8, sample_size=4096
    )
    t = idx._table()
    v_before = t.snapshot().version
    idx.rebuild(n_lists=4)
    m = t.snapshot()
    assert m.version == v_before + 1  # ONE overwrite commit
    assert m.total_rows == emb.count()
    assert idx._meta()["n_lists"] == 4
    # old version still readable until vacuum (snapshot isolation)
    assert t.read(version=v_before).count() == emb.count()


def test_maybe_rebuild_policy_hook(spark, emb, tmp_path):
    """VERDICT r6 item 8: the drift signal is operational, not advisory —
    add(auto_rebuild=...) triggers the rebuild when the threshold is
    crossed, the recall floor is restored, and a healthy index is left
    untouched."""
    idx = IvfIndex.build(
        spark, emb, tmp_path / "ivf", n_lists=8, sample_size=4096
    )
    # healthy index + thresholds: no rebuild (decision is recorded)
    out = idx.maybe_rebuild(drift_threshold=0.25, imbalance_threshold=4.0)
    assert out["rebuilt"] is False and out["reason"] is None
    assert out["before"]["drift"] == pytest.approx(0.0)

    dim = len(emb.select("embedding").first()[0])
    n_new = emb.count() * 3
    drifted = (
        spark.range(1_000_000, 1_000_000 + n_new)
        .selectExpr("id AS vec_id")
        .withColumn(
            "embedding",
            F.array(
                *[
                    (F.lit(50.0) + F.rand(seed=7 + i)).cast("float")
                    for i in range(dim)
                ]
            ),
        )
        .withColumn("label", F.lit(0).cast("int"))
    )
    # the opt-in hook: drifted traffic crosses the threshold in-line
    idx.add(drifted, auto_rebuild={"drift_threshold": 0.25})
    assert idx.last_maintenance["rebuilt"] is True
    assert "drift" in idx.last_maintenance["reason"]
    assert idx.last_maintenance["before"]["drift"] > 0.25
    assert idx.last_maintenance["after"]["drift"] == pytest.approx(0.0)
    # recall floor restored over the union corpus through the hook path
    union = emb.unionByName(drifted)
    qs = union.filter(F.col("vec_id") < 10)
    approx = idx.search(qs, k=5, nprobe=3).collect()
    exact = brute_force_topk(union, qs, k=5).collect()
    assert _recall(exact, approx) >= 0.5
    # and a subsequent small add under the same policy does NOT rebuild
    tiny = drifted.limit(5)
    idx.add(tiny, auto_rebuild={"drift_threshold": 0.25})
    assert idx.last_maintenance["rebuilt"] is False


# ----------------------------------------------------- IVF-PQ (r7 item 5)


def test_pq_recall_floor_and_probed_bytes(spark, emb, tmp_path):
    """PQ index at the existing fixture: recall floor vs brute force
    holds through the approx-shortlist + exact-re-rank pipeline, and
    the probed code column is ≥4× smaller on disk than the full-vector
    column — the measurable IO claim."""
    idx = IvfIndex.build(
        spark, emb, tmp_path / "ivfpq", n_lists=8, sample_size=4096,
        pq_m=8, pq_bits=8,
    )
    qs = emb.filter(F.col("vec_id") < 10)
    approx = idx.search(qs, k=5, nprobe=3).collect()
    exact = brute_force_topk(emb, qs, k=5).collect()
    assert _recall(exact, approx) >= 0.5
    # re-rank produces EXACT cosines: every returned cosine matches the
    # brute-force value for the same pair
    exact_by_pair = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact
    }
    for r in approx:
        pair = (r["query_id"], r["neighbor_id"])
        if pair in exact_by_pair:
            assert abs(r["cosine"] - exact_by_pair[pair]) < 1e-9
    # the IO claim: probing codes costs ≥4× less than probing vectors
    vec_bytes = idx.column_bytes("c_vec")
    code_bytes = idx.column_bytes("pq_code")
    assert code_bytes > 0 and vec_bytes >= 4 * code_bytes


def test_pq_matches_flat_on_same_shortlist(spark, emb, tmp_path):
    """With rerank covering the whole probed set, PQ search degenerates
    to the flat search exactly (the approx stage only orders the
    shortlist; the exact re-rank decides)."""
    flat = IvfIndex.build(
        spark, emb, tmp_path / "flat", n_lists=8, sample_size=4096
    )
    pq = IvfIndex.build(
        spark, emb, tmp_path / "pq", n_lists=8, sample_size=4096,
        pq_m=8, pq_bits=8,
    )
    qs = emb.filter(F.col("vec_id") < 5)
    a = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in flat.search(qs, k=3, nprobe=8).collect()
    )
    b = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq.search(qs, k=3, nprobe=8, rerank=10 ** 6).collect()
    )
    assert a == b


def test_pq_add_and_rebuild_keep_codes(spark, emb, tmp_path):
    """add() encodes with the frozen codebooks; rebuild() retrains them;
    the auto-rebuild policy path stays green on a PQ index."""
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    idx = IvfIndex.build(
        spark, half, tmp_path / "ivfpq", n_lists=8, sample_size=4096,
        pq_m=8, pq_bits=6,
    )
    added = idx.add(rest, auto_rebuild={"drift_threshold": 2.0})
    assert added == rest.count()
    assert idx.last_maintenance["rebuilt"] is False
    # every row carries an m-byte code after the incremental add
    t = idx._table()
    n_null = t.read().filter(F.col("pq_code").isNull()).count()
    assert n_null == 0
    lens = t.read().select(F.length("pq_code").alias("n")).distinct().collect()
    assert [r["n"] for r in lens] == [8]
    # a found-by-self probe flows through the PQ path
    probe = rest.limit(1)
    pid = probe.collect()[0]["vec_id"]
    hits = idx.search(probe, k=1, nprobe=1, exclude_self=False).collect()
    assert hits and hits[0]["neighbor_id"] == pid
    # explicit rebuild retrains codebooks and stays searchable
    idx.rebuild()
    qs = emb.filter(F.col("vec_id") < 10)
    approx = idx.search(qs, k=5, nprobe=3).collect()
    exact = brute_force_topk(emb, qs, k=5).collect()
    assert _recall(exact, approx) >= 0.5


def test_pq_rejects_bad_shapes(spark, emb, tmp_path):
    with pytest.raises(ValueError, match="divide"):
        IvfIndex.build(
            spark, emb, tmp_path / "bad", n_lists=4, pq_m=7
        )
    with pytest.raises(ValueError, match="pq_bits"):
        IvfIndex.build(
            spark, emb, tmp_path / "bad2", n_lists=4, pq_m=8, pq_bits=9
        )
