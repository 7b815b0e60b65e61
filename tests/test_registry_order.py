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
# (round 9 ordering) — they must sit inside the driver's ~50-row
# window. Rank is by information value (the r8 verdict's task 2):
# (1) the 14 r4-vintage leftover rows, the stalest driver evidence
# (one, percentiles_by_flag, also rewritten this round);
# (2) window_frames, rewritten this round (grandfathered-sort
# retirement); (3) the first 35 r5-fresh rows — stalest after the r4
# block — including this round's other rewrites (robust_outliers,
# equidepth_histogram). Everything re-proven in r6/r7/r8 rotates
# behind the boundary.
MUST_BE_IN_WINDOW = [
    # (1) r4-vintage leftovers
    "source_csv_roundtrip",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q14_promo_revenue",
    "salted_join_revenue",
    "window_suite",
    "exists_correlated",
    "scalar_subquery",
    "fk_integrity",
    "json_schema_on_read",
    "percentiles_by_flag",
    "dedup_exact",
    "ngram_jaccard_pairs",
    # (2) plan rewritten this round
    "window_frames",
    # (3) first 35 r5-fresh rows
    "ann_ivf_kmeans_agreement",
    "multimodal_features_checksum",
    "soql_typeof",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q20_promo_suppliers",
    "dedup_incremental_ingest",
    "sessionize_events",
    "cohort_retention",
    "robust_outliers",
    "bm25_topk",
    "bloom_semi_join_revenue",
    "merge_time_travel",
    "pagerank_topk",
    "heavy_hitters_twopass",
    "hll_rollup_merge",
    "kll_quantile_merge",
    "column_profile",
    "interval_coverage",
    "triangle_count",
    "merge_change_feed",
    "ewma_user_value",
    "bigram_novelty",
    "dpp_partitioned_join",
    "equidepth_histogram",
    "table_checksum",
    "soql_fields_all",
    "market_basket_lift",
    "event_transitions",
    "grouped_agg_trimmed_mean",
    "scd2_point_in_time_join",
    "distribution_drift",
    "spark_sql_front",
    "timezone_local_hours",
    "null_skew_outer_join",
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
