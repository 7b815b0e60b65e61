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
# (round 8 ordering) — they must sit inside the driver's ~50-row
# window. Rank is by information value (the r7 verdict's task 2):
# (1) the 8 round-7 second-batch lanes registered after the r7 window
# filled — never driver-hashed, two also changed this round;
# (2) the 2 rows-only lanes that have never appeared in ANY driver
# CORRECTNESS file; (3) the 5 lanes whose plans were rewritten for
# the unbounded-window fix (fresh hash re-proves the new code);
# (4) 35 r4-vintage rows, the stalest driver evidence. Everything
# re-proven in r5/r6/r7 rotates behind the boundary.
MUST_BE_IN_WINDOW = [
    # (1) round-7 second-batch lanes, never driver-verified
    "boolean_search_and",
    "weighted_sample_priority",
    "benford_first_digit",
    "chi_square_independence",
    "group_p90_twophase",
    "source_jdbc_roundtrip",
    "event_pattern_regex",
    "ratio_to_parent_share",
    # (2) rows-only lanes, never in any driver CORRECTNESS file
    "multimodal_features",
    "ann_ivf_kmeans_topk",
    # (3) plans rewritten this round (unbounded-window-sort fix)
    "decile_lift_table",
    "stratified_sample_exact",
    "sample_per_label_cap",
    "pack_token_shards",
    "topk_per_group",
    # (4) r4-vintage rows (stalest driver evidence)
    "events_hourly_ffill",
    "funnel_conversion",
    "soql_child_traversal",
    "redact_pii",
    "chunk_documents",
    "quality_percentile_filter",
    "sink_merge_cdc",
    "tfidf_top_terms",
    "histogram_totalprice",
    "zorder_roundtrip",
    "rollup_incremental_maintenance",
    "dq_observe_inflight",
    "scd2_dimension_history",
    "soql_orders_rollup",
    "soql_documents_filter",
    "soql_parent_traversal",
    "soql_rollup_traversal",
    "soql_child_subquery",
    "soql_child_subquery_where",
    "soql_multihop_traversal",
    "soql_in_subquery_semi",
    "soql_in_subquery_anti",
    "soql_cube_grouping",
    "soql_date_functions",
    "window_tumbling",
    "window_sliding",
    "window_session",
    "asof_purchase_click",
    "range_join_followups",
    "asof_pandas_merge",
    "stream_tumbling_1h",
    "stream_dedup_exactly_once",
    "stream_stateful_user_agg",
    "stream_stream_join_attribution",
    "sink_roundtrip_partitioned",
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
