"""Registry ordering contract.

The driver's correctness gate hash-checks exactly the first 50 entries of
``queries()``. Round 1 shipped three oracle-backed queries past position 50
— they silently received no correctness row at all. Since round 2 the
catalog holds MORE than 50 oracle-backed queries, so "every oracle-backed
query inside the cap" is no longer satisfiable; the invariant is now:

1. every one of the 50 checked slots is spent on an oracle-backed query
   (no slot wasted on a rows-only entry while a hash-checkable one waits);
2. entries past the cap are ordered oracle-backed first, then the
   no-oracle block, so the local side-by-side check
   (tests/test_entry_contract.py, which covers ALL entries) is the only
   verification the tail needs.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod

DRIVER_CORRECTNESS_CAP = 50


def test_oracle_keys_all_have_query_entries():
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    missing = set(oracles) - set(names)
    assert not missing, f"oracle keys without a queries() entry: {missing}"


def test_every_driver_slot_is_oracle_backed():
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    wasted = [
        n for n in names[:DRIVER_CORRECTNESS_CAP] if n not in oracles
    ]
    assert not wasted, (
        f"no-oracle entries occupy driver correctness slots that "
        f"oracle-backed queries could use: {wasted}"
    )


def test_round11_rotated_surfaces_hold_driver_slots():
    """Round-10 verdict item 3: the driver certified the same 50 queries
    since round 1 while the round-8/9/10 SQL plane was only locally
    hash-checked. The rotation puts the SQL surfaces + streaming CDF
    inside the cap (near-duplicate slots moved below it, where
    tests/test_entry_contract.py still hash-checks them)."""
    names = list(entrymod.queries())[:DRIVER_CORRECTNESS_CAP]
    for q in (
        "catalog_sql_merge",
        "catalog_sql_predicate_dml",
        "catalog_sql_table_changes",
        "catalog_sql_analyze",
        "catalog_sql_ctas",
        "catalog_sql_copy_into",
        "stream_cdf_roundtrip",
    ):
        assert q in names, f"{q} lost its driver correctness slot"
    # the demoted near-duplicates stay registered (local gate) but must
    # not burn driver slots that unique surfaces could use
    for q in ("q18_salted_variant", "events_hourly_hybrid", "orders_cube"):
        assert q in entrymod.queries() and q not in names


def test_no_oracle_entries_trail_the_registry():
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    last_oracle = max(i for i, n in enumerate(names) if n in oracles)
    early_unoracled = [
        n for i, n in enumerate(names) if n not in oracles and i < last_oracle
    ]
    assert not early_unoracled, (
        "no-oracle entries interleaved before oracle-backed ones "
        f"(wastes cap slots): {early_unoracled}"
    )


def test_round12_rotated_surfaces_hold_driver_slots():
    """Round-11 verdict item 6 + round-12 views: the dynamic-prune
    rewrite, schema evolution, and the new SQL-view surface deserve
    driver certification more than three TPC-H near-neighbors
    (q12≈q4, q14≈q19, q17≈q20 family), which rotate below the cap
    where tests/test_entry_contract.py still hash-checks them."""
    names = list(entrymod.queries())[:DRIVER_CORRECTNESS_CAP]
    for q in (
        "catalog_sql_view",
        "catalog_sql_dynamic_prune",
        "schema_evolution_roundtrip",
    ):
        assert q in names, f"{q} lost its driver correctness slot"
    for q in (
        "q12_priority_shipping",
        "q14_promo_revenue",
        "q17_small_quantity_revenue",
    ):
        assert q in entrymod.queries() and q not in names


def test_round13_rotated_surfaces_hold_driver_slots():
    """Round-12 verdict item 1: the round-12 flagship DDL surfaces —
    column DEFAULTs and GENERATED ALWAYS AS IDENTITY — take driver
    slots from two more TPC-H near-neighbors (q6 ≈ q14's promo-revenue
    family, q19 ≈ q17's small-quantity family), which stay hash-checked
    below the cap by tests/test_entry_contract.py."""
    names = list(entrymod.queries())[:DRIVER_CORRECTNESS_CAP]
    for q in (
        "catalog_sql_default_roundtrip",
        "catalog_sql_identity_roundtrip",
    ):
        assert q in names, f"{q} lost its driver correctness slot"
    for q in ("q6_forecast_revenue", "q19_discounted_revenue"):
        assert q in entrymod.queries() and q not in names
    # second round-13 rotation: the NEW round-13 surfaces themselves —
    # BY DEFAULT identity and the materialized-view pipeline — take
    # driver slots from two in-cap near-duplicates (orders_rollup ⊂
    # orders_grouping_sets; customers_with_urgent_orders ≈
    # changed_keys_antijoin's semi/anti twin)
    for q in (
        "catalog_sql_identity_bydefault_roundtrip",
        "catalog_sql_matview",
    ):
        assert q in names, f"{q} lost its driver correctness slot"
    for q in ("orders_rollup", "customers_with_urgent_orders"):
        assert q in entrymod.queries() and q not in names


def test_round14_rotated_surfaces_hold_driver_slots():
    """Round-13 verdict item 4: the streaming flagships — the CDF
    replica-sync consumer contract and the continuous-aggregate CDC
    refresh — plus the new dims-kind materialized view take driver
    slots from three in-cap near-neighbors (events_sliding ≈
    events_hourly's window twin; events_pivot_by_type ≈ the same
    grouped-agg family; embedding_component_stats ≈
    similarity_topk_bruteforce's vector plumbing), which stay
    hash-checked below the cap by tests/test_entry_contract.py."""
    names = list(entrymod.queries())[:DRIVER_CORRECTNESS_CAP]
    for q in (
        "stream_cdf_replica_sync",
        "rollup_cdc_refresh",
        "catalog_sql_matview_dims",
    ):
        assert q in names, f"{q} lost its driver correctness slot"
    for q in (
        "events_sliding",
        "events_pivot_by_type",
        "embedding_component_stats",
    ):
        assert q in entrymod.queries() and q not in names


def test_round14_star_matview_holds_driver_slot():
    """Round-14 second rotation: the star-join materialized view (dim
    version pins, dim-change degrade path) takes the driver slot of
    events_purchase_attribution, which composes the as-of machinery
    that events_asof_last_purchase already certifies in-cap; the
    displaced entry stays hash-checked below the cap by
    tests/test_entry_contract.py."""
    names = list(entrymod.queries())[:DRIVER_CORRECTNESS_CAP]
    assert "catalog_sql_matview_star" in names
    assert "events_asof_last_purchase" in names
    q = "events_purchase_attribution"
    assert q in entrymod.queries() and q not in names
