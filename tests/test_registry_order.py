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
# (round 11 ordering) — they must sit inside the driver's ~50-row
# window. Rank is by information value (the r10 verdict's task 1):
# (1) the 11 lanes NEW or plan-reworked this round (stream->sfetl
# upsert sink, the salted-top-k ANN eval lanes, the capped cosine
# ground truth, the data-derived decile sentinel, the upsert-capable
# ingest writer, the retuned stream_* replays); (2) all 24 lanes
# whose newest driver evidence is r6 — the stalest block; (3) the
# first 15 r7-fresh rows. Everything re-proven in r8/r9/r10 rotates
# behind the boundary.
MUST_BE_IN_WINDOW = [
    "stream_sink_sfetl_upsert",
    "stream_sink_sfetl_native",
    "sink_sfetl_failed_results",
    "sink_sfetl_delete_roundtrip",
    "source_sfetl_stream_incremental",
    "triangle_count",
    "ann_matryoshka_recall",
    "ann_recall_metrics",
    "topk_per_group",
    "dedup_embedding_cosine",
    "decile_lift_table",
    "sink_sfetl_ingest_roundtrip",
    "stream_tumbling_1h",
    "stream_dedup_exactly_once",
    "stream_stateful_user_agg",
    "stream_stream_join_attribution",
    "bfs_shortest_paths",
    "cusum_drift_detection",
    "exact_median_histogram",
    "fuzzy_name_match",
    "ivm_join_deltas",
    "keyword_textrank",
    "kmv_set_overlap",
    "linkage_survivorship",
    "multimodal_decode_stats",
    "pareto_frontier_parts",
    "phrase_search_positional",
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
    "rolling_median_7d",
    "time_weighted_average",
    "zone_map_pruned_scan",
    "countmin_point_estimates",
    "seasonal_anomaly_slots",
    "asof_nearest_click",
    "funnel_time_to_convert",
    "multimodal_resize_stats",
    "agms_join_size",
    "target_encoding_smoothed",
    "forecast_feature_matrix",
    "group_median_twophase",
    "window_sliding_distinct",
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
