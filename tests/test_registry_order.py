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
# (round 10 ordering) — they must sit inside the driver's ~50-row
# window. Rank is by information value (the r9 verdict's task 2):
# (1) source_sfetl_roundtrip, NEW this round (first driver hash row
# for the custom-DataSource scan path); (2) the four lanes rewritten
# this round (equidepth_histogram, correlation_matrix, window_frames,
# decile_lift_table) so the driver verifies the NEW plans; (3) the 14
# r5-fresh leftovers — the stalest driver evidence; (4) the first 31
# r6-fresh rows. Everything re-proven in r7/r8/r9 rotates behind the
# boundary.
MUST_BE_IN_WINDOW = [
    "source_sfetl_roundtrip",
    "equidepth_histogram",
    "correlation_matrix",
    "window_frames",
    "decile_lift_table",
    "variant_extract_orders",
    "arrow_batch_textstats",
    "window_session_dynamic_gap",
    "sink_sfetl_ingest_roundtrip",
    "ann_matryoshka_recall",
    "feature_hashing",
    "user_behavior_profile",
    "session_paths",
    "doc_fingerprint",
    "text_quality",
    "token_counts",
    "lang_id",
    "embedding_stats",
    "ann_cosine_topk",
    "udtf_bigrams",
    "pandas_udf_zscore",
    "dispersion_stats",
    "multimodal_meta_stats",
    "multimodal_frame_sample",
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
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
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
