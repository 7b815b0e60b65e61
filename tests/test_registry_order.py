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
# (round 13 ordering) — they must sit inside the driver's ~50-row
# window. Rank is by information value (the r12 verdict's task 2):
# (1) the 10 lanes NEW or behavior-changed this round (trained IVF-PQ
# agreement, the two binary-quantization ANN lanes, the Gopher quality
# filter, the foreachBatch reject-capture twin, the resume-from-
# unprocessed retry lane, the FULL OUTER stream-stream join;
# chunk-splitting ingest roundtrip, byte_mean-folded multimodal
# checksum, the pyarrow.fs reject side table); (2) 40 of the 41 lanes
# whose newest driver evidence is r8 (multimodal_features was retired;
# zorder_roundtrip missed the 50-cut and rotates first in r14).
# 10+40 = 50. Everything re-proven in r9-r12 rotates behind the
# boundary.
MUST_BE_IN_WINDOW = [
    "sink_sfetl_ingest_roundtrip",
    "multimodal_features_checksum",
    "stream_sink_sfetl_failed_rows",
    "quality_gopher_filter",
    "ann_ivf_pq_trained_agreement",
    "ann_binary_hamming_topk",
    "ann_binary_recall_metrics",
    "stream_sink_sfetl_failed_rows_fb",
    "sink_sfetl_resume_unprocessed",
    "stream_stream_full_join_unmatched",
    "asof_purchase_click",
    "benford_first_digit",
    "boolean_search_and",
    "chi_square_independence",
    "chunk_documents",
    "dq_observe_inflight",
    "event_pattern_regex",
    "events_hourly_ffill",
    "funnel_conversion",
    "group_p90_twophase",
    "histogram_totalprice",
    "pack_token_shards",
    "quality_percentile_filter",
    "range_join_followups",
    "ratio_to_parent_share",
    "redact_pii",
    "rollup_incremental_maintenance",
    "sample_per_label_cap",
    "scd2_dimension_history",
    "sink_merge_cdc",
    "sink_roundtrip_partitioned",
    "soql_child_subquery",
    "soql_child_subquery_where",
    "soql_child_traversal",
    "soql_cube_grouping",
    "soql_date_functions",
    "soql_documents_filter",
    "soql_in_subquery_anti",
    "soql_in_subquery_semi",
    "soql_multihop_traversal",
    "soql_orders_rollup",
    "soql_parent_traversal",
    "soql_rollup_traversal",
    "source_jdbc_roundtrip",
    "stratified_sample_exact",
    "tfidf_top_terms",
    "weighted_sample_priority",
    "window_session",
    "window_sliding",
    "window_tumbling",
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
