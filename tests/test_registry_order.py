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
# (round 16 ordering) — they must sit inside the driver's ~50-row
# window. Rank is by information value (the r15 verdict's task 8):
# (1) the 17 lanes the r16 optimization round TOUCHED (dedup-cluster
# pair, linkage_survivorship, ann_ivf_pq_trained_agreement,
# asof_pandas_merge, and the 11 sfetl lanes riding the mockserver
# teardown fix, plus triangle_count's reshaped pair derivation);
# (2) 33 lanes of the r11-stale block, filling to 50. 17+33 = 50.
# Everything re-proven in r12-r15 rotates behind the
# boundary.
MUST_BE_IN_WINDOW = [
    "triangle_count",
    "dedup_cluster_components",
    "dedup_cluster_bigstar",
    "linkage_survivorship",
    "ann_ivf_pq_trained_agreement",
    "asof_pandas_merge",
    "source_sfetl_roundtrip",
    "sink_sfetl_ingest_roundtrip",
    "sink_sfetl_failed_results",
    "sink_sfetl_successful_results",
    "source_sfetl_stream_incremental",
    "sink_sfetl_delete_roundtrip",
    "sink_sfetl_resume_unprocessed",
    "stream_sink_sfetl_upsert",
    "stream_sink_sfetl_native",
    "stream_sink_sfetl_failed_rows",
    "stream_sink_sfetl_failed_rows_fb",
    "ann_matryoshka_recall",
    "ann_recall_metrics",
    "asof_nearest_click",
    "bfs_shortest_paths",
    "countmin_point_estimates",
    "cusum_drift_detection",
    "decile_lift_table",
    "dedup_embedding_cosine",
    "exact_median_histogram",
    "forecast_feature_matrix",
    "funnel_time_to_convert",
    "fuzzy_name_match",
    "group_median_twophase",
    "ivm_join_deltas",
    "keyword_textrank",
    "kmv_set_overlap",
    "multimodal_decode_stats",
    "multimodal_resize_stats",
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
    "seasonal_anomaly_slots",
    "stream_dedup_exactly_once",
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
