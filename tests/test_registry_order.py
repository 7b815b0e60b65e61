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
# (round 7 ordering) — they must sit inside the driver's ~50-row
# window. Rank is by information value (the r6 verdict's ask #1):
# (1) the 12 late-round-6 lanes that landed past the r6 window
# boundary and have NEVER been driver-hashed — two of them also
# changed this round (attribution broadcast-hint drop; grouped-median
# null/budget hardening), so their first row verifies the NEW code;
# (2) the 29 r3-vintage rows, now the stalest evidence in the repo;
# (3) every lane registered in round 7 (never driver-verified).
# Everything re-proven fresh in r5/r6 rotates behind the boundary.
MUST_BE_IN_WINDOW = [
    # (1) late-round-6 lanes, never driver-verified
    "countmin_point_estimates",
    "seasonal_anomaly_slots",
    "asof_nearest_click",
    "funnel_time_to_convert",
    "multimodal_resize_stats",
    "agms_join_size",
    "ann_recall_metrics",
    "target_encoding_smoothed",
    "forecast_feature_matrix",
    "group_median_twophase",
    "window_sliding_distinct",
    "attribution_channels",
    # (2) r3-vintage rows (stalest driver evidence)
    "q6_forecast_revenue",
    "window_frames",
    "grouping_sets_flags",
    "vocab_top_terms",
    "unpivot_metrics",
    "null_semantics",
    "source_orc_roundtrip",
    "source_json_roundtrip",
    "dq_validation_report",
    "source_schema_evolution",
    "bucketed_join_colocated",
    "dedup_cluster_components",
    "dedup_cluster_bigstar",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_exact_substring",
    "decontaminate_ngram_overlap",
    "domain_mix_rebalance",
    "corpus_prep_pipeline",
    "split_train_test",
    "sample_per_label_cap",
    "pack_token_shards",
    "clean_text_normalize",
    "repetition_metrics",
    "dedup_embedding_cosine",
    "ann_ivf_topk",
    "ann_srp_lsh_pairs",
    "dedup_embedding_pipeline",
    "embedding_quantize_int8",
    # (3) new round-7 lanes (never verified)
    "snapshot_diff_cdc",
    "stratified_sample_exact",
    "gap_islands_activity",
    "mode_per_group",
    "regression_by_group",
    "geo_nearest_hub",
    "correlation_matrix",
    "ab_test_lift",
    "decile_lift_table",
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
