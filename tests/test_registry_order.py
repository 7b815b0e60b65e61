"""The driver's correctness gate truncates at ~50 registry entries.

These tests pin the guarantees the ordering in
sf_etl_spark/queries/__init__.py exists to provide: the surfaces that
were outside the window in round 1 (similarity/SOQL/streaming/as-of)
must now be inside it, and nothing silently falls out of the registry.
"""

from __future__ import annotations

from sf_etl_spark.queries import _PRIORITY_ORDER, all_queries

DRIVER_WINDOW = 50

# Queries whose driver CORRECTNESS row most needs refreshing THIS round
# (round 6 ordering) — they must sit inside the driver's ~50-row
# window. Rank is by information value (the r5 verdict's ask #1):
# (1) the 22 r1-vintage relational lanes and 14 r2-vintage TPC-H
# shapes whose only hash rows predate FOUR fixture regenerations,
# (2) fuzzy_name_match, whose blocking scheme CHANGED this round
# (sorted-neighborhood) so its old row proves the wrong semantics,
# (3) every lane registered in round 6 (never driver-verified).
# Everything re-proven fresh in r5 rotates behind the boundary.
MUST_BE_IN_WINDOW = [
    # (1) r1-vintage relational long tail
    "agg_having",
    "agg_stats_by_status",
    "approx_distinct_custkeys",
    "array_functions",
    "conditional_predicates",
    "cube_status_priority",
    "date_functions",
    "distinct_flags",
    "filter_project",
    "join_anti",
    "join_left_outer",
    "join_semi",
    "json_extract",
    "map_functions",
    "math_functions",
    "min_per_group_joinback",
    "order_limit_offset",
    "pivot_returnflag",
    "rollup_flags",
    "set_ops",
    "set_ops_all",
    "string_functions",
    # (1) r2-vintage TPC-H shapes
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_late_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q17_small_qty_revenue",
    "q18_large_volume",
    "q19_or_of_ands",
    "q21_waiting_suppliers",
    "q22_dormant_balance",
    # (2) semantics changed this round
    "fuzzy_name_match",
    # (3) round-6 lanes, never driver-verified
    "multimodal_decode_stats",
    "time_weighted_average",
    "cusum_drift_detection",
    "pareto_frontier_parts",
    "kmv_set_overlap",
    "keyword_textrank",
    "bfs_shortest_paths",
    "ivm_join_deltas",
    "zone_map_pruned_scan",
    "rolling_median_7d",
    "phrase_search_positional",
    "exact_median_histogram",
    "linkage_survivorship",
]


def test_unverified_surface_inside_driver_window():
    names = list(all_queries())
    window = set(names[:DRIVER_WINDOW])
    missing = [n for n in MUST_BE_IN_WINDOW if n not in window]
    assert not missing, f"outside driver window: {missing}"


def test_priority_prefix_is_respected():
    names = list(all_queries())
    listed = [n for n in _PRIORITY_ORDER if n in set(names)]
    assert names[: len(listed)] == listed


def test_reordering_drops_nothing():
    qs = all_queries()
    assert len(qs) == len(set(qs)) >= 66
    # every registered query still has its spec fields intact
    for name, spec in qs.items():
        assert spec.name == name
        assert callable(spec.fn)
