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
# (round 14 ordering) — they must sit inside the driver's ~50-row
# window. Rank is by information value (the r13 verdict's task 2):
# (1) the 4 lanes NEW or behavior-changed this round (published-
# threshold Gopher preset; trained IVF-PQ agreement on sample-bounded
# training; foreachBatch reject twin on exact job-id correlation;
# FULL OUTER stream join with the strictly-restated purchase
# eviction); (2) zorder_roundtrip, the r8 straggler the r13 cut could
# not fit; (3) 45 of the 46 lanes whose newest driver evidence is r9
# (window_suite missed the 50-cut and rotates first in r15).
# 4+1+45 = 50. Everything re-proven in r10-r13 rotates behind the
# boundary.
MUST_BE_IN_WINDOW = [
    "quality_gopher_published",
    "ann_ivf_pq_trained_agreement",
    "stream_sink_sfetl_failed_rows_fb",
    "stream_stream_full_join_unmatched",
    "zorder_roundtrip",
    "ann_ivf_kmeans_agreement",
    "bigram_novelty",
    "bloom_semi_join_revenue",
    "bm25_topk",
    "cohort_retention",
    "column_profile",
    "dedup_exact",
    "dedup_incremental_ingest",
    "distribution_drift",
    "dpp_partitioned_join",
    "event_transitions",
    "ewma_user_value",
    "exists_correlated",
    "fk_integrity",
    "grouped_agg_trimmed_mean",
    "heavy_hitters_twopass",
    "hll_rollup_merge",
    "interval_coverage",
    "json_schema_on_read",
    "kll_quantile_merge",
    "market_basket_lift",
    "merge_change_feed",
    "merge_time_travel",
    "ngram_jaccard_pairs",
    "null_skew_outer_join",
    "pagerank_topk",
    "percentiles_by_flag",
    "q11_important_parts",
    "q14_promo_revenue",
    "q1_pricing_summary",
    "q20_promo_suppliers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "robust_outliers",
    "salted_join_revenue",
    "scalar_subquery",
    "scd2_point_in_time_join",
    "sessionize_events",
    "soql_fields_all",
    "soql_typeof",
    "source_csv_roundtrip",
    "spark_sql_front",
    "table_checksum",
    "timezone_local_hours",
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
