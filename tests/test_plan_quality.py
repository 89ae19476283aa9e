"""Physical-plan regression guards: the properties that make these plans
survive a 100×-scale-up must not silently regress — filters reach the
parquet scan (including the .997 day bound), scans are column-pruned,
dimension joins broadcast, and no query falls back to a cartesian product.
"""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as entrymod


def _plan(spark, sf_dir, name: str) -> str:
    df = entrymod.queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_windowed_scan_pushes_997_bound(spark, sf_dir):
    plan = _plan(spark, sf_dir, "windowed_range_scan")
    assert "PushedFilters" in plan
    assert "1995-03-07T23:59:59.997" in plan  # the day-end bound reaches the scan


def test_q1_scan_is_column_pruned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # 7 of 11 lineitem columns used; the scan must not read the rest
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_shipdate" in read
    assert "LessThanOrEqual(l_shipdate" in plan


def test_q5_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_local_supplier")
    assert plan.count("BroadcastHashJoin") >= 5  # customer+supplier+nation+region
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_anti_and_semi_joins_stay_hash_joins(spark, sf_dir):
    for name in ["orders_without_lineitems", "customers_with_urgent_orders"]:
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "Join" in plan, name


def test_dedup_band_joins_are_equi_joins(spark, sf_dir):
    # the LSH candidate joins must be hash-partitioned equi-joins on the
    # band keys, never nested-loop over all pairs
    for name in ["dedup_minhash_lsh", "dedup_simhash"]:
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_events_hourly_shuffle_count(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "events_hourly")
    # exact count_distinct needs a two-phase aggregate = 2 exchanges, but no
    # third shuffle may creep in (each node appears once as "(n) Exchange")
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_exchanges <= 2
    # partial (map-side) aggregation present before the first shuffle
    assert "HashAggregate" in plan


def test_q19_disjunction_is_not_cartesian(spark, sf_dir):
    """The OR-of-ANDs predicate must ride the l_partkey equi-join as a
    residual filter, never degrade to a nested loop over all pairs."""
    plan = _plan(spark, sf_dir, "q19_discounted_revenue")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q21_self_joins_stay_equi(spark, sf_dir):
    """EXISTS/NOT EXISTS self-joins carry a non-equi residual (suppkey <>)
    on top of the orderkey equi-key — they must stay hash joins."""
    plan = _plan(spark, sf_dir, "q21_sole_blame_supplier")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q13_outer_join_condition_stays_in_join(spark, sf_dir):
    """The o_orderpriority filter belongs in the LEFT OUTER join condition;
    if it slips into a post-join Filter the c_count=0 bucket vanishes."""
    plan = _plan(spark, sf_dir, "q13_customer_distribution")
    assert "LeftOuter" in plan
    # the priority predicate reaches the orders parquet scan (it's a filter
    # on the join's right side, so pushing it preserves null-extension)
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan


def test_q8_all_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 6
    assert "CartesianProduct" not in plan


def test_q17_qualifier_broadcast_back(spark, sf_dir):
    """The per-part average joins back to the fact as a broadcast — the
    fact must not be re-shuffled for the second pass."""
    plan = _plan(spark, sf_dir, "q17_small_quantity_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_single_exchange(spark, sf_dir):
    """bucketed_orders_revenue: the fact-to-fact join reads co-bucketed
    scans with NO join-side exchange; the only exchange is the tiny
    post-aggregation one on the 5-row grouped result."""
    import re

    plan = _plan(spark, sf_dir, "bucketed_orders_revenue")
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_exchanges == 1, plan
    assert "SortMergeJoin" in plan
    assert "SelectedBucketsCount" in plan  # both scans are bucket-pruned reads


def test_salted_join_stays_equi_no_bnlj(spark, sf_dir):
    """q18_salted_variant: the salt must keep the join an equi-join on
    (key, salt) — never a nested-loop/cartesian — and the big fact side
    must not be broadcast."""
    plan = _plan(spark, sf_dir, "q18_salted_variant")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "__salt" in plan  # the composite salted key is in the join


def test_partsupp_adapted_queries_no_cartesian(spark, sf_dir):
    # the five partsupp-adapted TPC-H completions: dims broadcast, never a
    # nested-loop fallback (q2's min-cost equality join and q11's windowed
    # total are the shapes most at risk)
    for name in [
        "q2_min_cost_supplier",
        "q9_product_profit",
        "q11_important_shipments",
        "q16_parts_supplier_counts",
        "q20_excess_shipments",
    ]:
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q9_filter_pushed_and_pruned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q9_product_profit")
    # p_name LIKE filter reaches the part scan; lineitem scan pruned to the
    # 6 columns the query touches
    assert "StringContains(p_name,widget)" in plan
    read = next(
        l for l in plan.splitlines()
        if "ReadSchema" in l and "l_orderkey" in l
    )
    assert "l_shipdate" not in read and "l_returnflag" not in read


def test_stream_stream_attribution_stays_equi_join(spark, sf_dir):
    """events_click_attribution: the time-range bound must ride the
    user_id equi-key as a residual condition — never a nested loop over
    clicks × purchases (the batch plan's shape is what the streaming
    state-store join inherits)."""
    plan = _plan(spark, sf_dir, "events_click_attribution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_contamination_is_broadcast_gram_join(spark, sf_dir):
    """The corpus×eval 5-gram match must probe a broadcast (the eval set
    is KBs by construction) — a shuffled join here would reshuffle the
    whole corpus at 100 TB — and nothing may fall back to a cartesian."""
    plan = _plan(spark, sf_dir, "text_contamination")
    assert plan.count("BroadcastHashJoin") >= 2  # gram match + n_eval attach
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_repetition_no_cartesian_single_agg_chain(spark, sf_dir):
    """Repetition scoring is projections plus per-doc aggregates — no
    cartesian, and every join stays an equi-join on doc_id."""
    plan = _plan(spark, sf_dir, "text_quality_repetition")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_dedup_antijoin_stays_hash_join(spark, sf_dir):
    """The arrivals-vs-corpus fingerprint anti-join must stay a hash/SMJ
    equi-join on the md5 key (a BNLJ here would pair every arrival with
    every corpus row at 100 TB)."""
    plan = _plan(spark, sf_dir, "dedup_incremental")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan


def test_split_assign_is_pure_projection(spark, sf_dir):
    """The train/valid/test assignment must ride the scan — zero
    exchanges: at 100 TB any shuffle here would move the whole corpus to
    compute a per-row md5 bucket."""
    plan = _plan(spark, sf_dir, "training_split_assign")
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan


def test_gap_fill_grid_joins_stay_equi(spark, sf_dir):
    """Gap fill is one hourly rollup plus window passes over the dense
    (type, hour) grid — the grid join must stay an equi-join (a BNLJ or
    cartesian would pair every grid cell with every rollup row) and the
    plan must not exceed the rollup+grid+window exchange budget."""
    import re

    plan = _plan(spark, sf_dir, "events_gap_fill")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # rollup agg + span agg/grid join + window repartition — nothing more
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_exchanges <= 4


def test_semantic_lsh_clusters_stay_equi(spark, sf_dir):
    """dedup_semantic_clusters_lsh replaces the O(n²) matmul with banded
    equi-joins — the whole plan (pair generation AND every closure round)
    must be hash joins, never a cartesian/nested-loop all-pairs stage."""
    plan = _plan(spark, sf_dir, "dedup_semantic_clusters_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_kmeans_arm_stays_equi(spark, sf_dir):
    """The k-means-bucketed arm (taken by the registered entry at corpus
    sizes where sign-LSH recall math can't reach the 0.4 bar) must also
    be bucket equi-joins end to end — applyInPandas per bucket, candidate
    rejoin on ids, closure rounds on labels; never an all-pairs stage."""
    import contextlib
    import io

    from data_warehouse_copy_spark.functions.dedup import connected_components
    from data_warehouse_copy_spark.functions.similarity import (
        kmeans_bucket_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    comp = connected_components(
        kmeans_bucket_near_dup_pairs(emb, threshold=0.4)
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        comp.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dv_read_stays_equi_anti_join(spark, sf_dir):
    """The canonical-path DV subtraction (round 6: scheme-strip +
    url_decode + prefix-strip expressions instead of raw-URI equality)
    must remain a hash/sort-merge EQUI anti-join — a nested-loop
    fallback here would scan rows x dv_rows on every DV-carrying read."""
    plan = _plan(spark, sf_dir, "predicate_delete_roundtrip")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cdf_delete_feed_stays_equi_semi_join(spark, tmp_path):
    """read_cdf's deleted-row reconstruction (scan ⋉ new-DV positions)
    must be an equi LEFT SEMI join on (canonical path, position). (The
    declarative changesFrom twin needs no JVM join at all — its
    positions mask executor-side in the arrow scan.)"""
    from pyspark.sql import functions as F

    from data_warehouse_copy_spark.sources.managed_table import ManagedTable

    t = ManagedTable.create(spark, tmp_path / "t")
    t.append(spark.range(100).select(F.col("id").alias("k")))
    t.delete(where=[("k", "<", 5)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        t.read_cdf(1).explain("formatted")
    plan = buf.getvalue()
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ccnet_tiers_lm_join_broadcasts(spark, sf_dir):
    """The tier query's scoring join must broadcast the vocabulary-sized
    LM onto the token stream — a shuffled LM join would re-shuffle the
    whole corpus per scoring pass."""
    plan = _plan(spark, sf_dir, "text_ccnet_tiers")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_capped_lm_broadcast_is_bounded(spark, sf_dir):
    """Round-7 weak-mark fix: the capped scorer's broadcast side is the
    top-K LIMIT (TakeOrderedAndProject — O(K) per partition, no global
    sort) and the scoring join broadcasts it; the corpus token stream
    never shuffles before the final per-document aggregate."""
    plan = _plan(spark, sf_dir, "text_unigram_logprob_capped")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # the K-bounded vocabulary
    assert "CartesianProduct" not in plan
    # the sampled tiers twin rides the same capped LM
    plan2 = _plan(spark, sf_dir, "text_ccnet_tiers_sampled")
    assert "BroadcastHashJoin" in plan2
    assert "TakeOrderedAndProject" in plan2


def test_declarative_curation_fold_evaluated_once(spark, sf_dir):
    """Round-14: the bigram run-length fold (interpreted aggregate lambda,
    no CSE) must appear exactly ONCE in the curation DAG's physical plan.
    A filter referencing top_bigram_frac placed BELOW the fp-dedup gets
    pushed into the projection by substitution and re-derives the fold
    per row (2 occurrences, measured 3.3x the composed cost); the
    blocking dropDuplicates materializes the column so the gate above it
    reads the stored value. Rows sharing an fp share every text-derived
    score, so the reordering is output-exact by commutation (pinned
    value-wise by the entry oracle and TestDeclarativeCuration)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from data_warehouse_copy_spark.functions.text import (
        repetition_score_columns,
        scrub_pii,
    )
    from data_warehouse_copy_spark.streaming.curation import CURATED_COLUMNS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scores = repetition_score_columns("text")
    # the batch twin of stream_curate_declarative's DAG: same Columns,
    # same operator order (the streaming plan only swaps the source/sink
    # and the stateful dedup implementation)
    df = (
        docs.withColumn("text", scrub_pii(F.col("text")))
        .withColumn("fp", F.md5(F.col("text")))
        .withColumns({name: col for name, col in scores.items()})
        .filter((F.col("dup_line_frac") <= 0.3) & (F.col("n_tokens") >= 5))
        .dropDuplicates(["fp"])
        .filter(F.col("top_bigram_frac") <= 0.11)
        .select(
            *CURATED_COLUMNS, "n_tokens", "dup_line_frac", "top_bigram_frac"
        )
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # round-14 (continued): the bigram mode is now the Arrow kernel —
    # the interpreted fold must be GONE from the hot DAG entirely, and
    # the kernel (asNondeterministic, so filter pushdown cannot clone
    # it below the gate — guide §4.4) must appear exactly once
    assert plan.count("aggregate(") == 0
    assert plan.count("_top_bigram_frac_vec") == 1
