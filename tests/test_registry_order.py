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
# (round 15 ordering) — they must sit inside the driver's ~50-row
# window. Rank is by information value (the r14 verdict's task 1):
# (1) quality_gopher_repetition, the round's one NEW lane (the full
# published SA1.1 repetition battery); (2) window_suite, the r9
# straggler the r14 cut could not fit; (3) the ENTIRE 47-lane block
# whose newest driver evidence is r10; (4) agms_join_size, the first
# r11 lane, filling to 50. 1+1+47+1 = 50. Everything re-proven in
# r11-r14 rotates behind the boundary.
MUST_BE_IN_WINDOW = [
    "quality_gopher_repetition",
    "window_suite",
    "agg_having",
    "agg_stats_by_status",
    "ann_cosine_topk",
    "approx_distinct_custkeys",
    "array_functions",
    "arrow_batch_textstats",
    "conditional_predicates",
    "correlation_matrix",
    "cube_status_priority",
    "date_functions",
    "dispersion_stats",
    "distinct_flags",
    "doc_fingerprint",
    "embedding_stats",
    "equidepth_histogram",
    "feature_hashing",
    "filter_project",
    "join_anti",
    "join_left_outer",
    "join_semi",
    "json_extract",
    "lang_id",
    "map_functions",
    "math_functions",
    "min_per_group_joinback",
    "multimodal_frame_sample",
    "multimodal_meta_stats",
    "order_limit_offset",
    "pandas_udf_zscore",
    "pivot_returnflag",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "rollup_flags",
    "session_paths",
    "set_ops",
    "set_ops_all",
    "source_sfetl_roundtrip",
    "string_functions",
    "text_quality",
    "token_counts",
    "udtf_bigrams",
    "user_behavior_profile",
    "variant_extract_orders",
    "window_frames",
    "window_session_dynamic_gap",
    "agms_join_size",
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
