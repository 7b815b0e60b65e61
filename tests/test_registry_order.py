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
# (round 5) — they must sit inside the driver's window. The r5 rotation
# front-loads the 33 lanes whose only green row is r1-vintage (four
# fixture regenerations old), the two never-hashed lanes with their new
# verifiable companions, and the new round-5 surface.
MUST_BE_IN_WINDOW = [
    # r1-vintage text/embedding/multimodal/extension lanes
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
    # r1-vintage relational long tail
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
    # never-hashed lanes + round-5 verifiable companions
    "ann_ivf_kmeans_topk",
    "ann_ivf_kmeans_agreement",
    "multimodal_features",
    "multimodal_features_checksum",
    # new round-5 surface (first driver rows)
    "soql_typeof",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q20_promo_suppliers",
    "dedup_incremental_ingest",
    # new round-5 surface, second batch (first driver rows)
    "sessionize_events",
    "cohort_retention",
    "robust_outliers",
    "bm25_topk",
    "bloom_semi_join_revenue",
    "merge_time_travel",
    "pagerank_topk",
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
