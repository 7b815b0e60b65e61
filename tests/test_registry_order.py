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
# (round 12 ordering) — they must sit inside the driver's ~50-row
# window. Rank is by information value (the r11 verdict's task 2):
# (1) the 16 lanes NEW or behavior-changed this round (the streaming
# reject-capture lane, the SemDeDup and PQ-ADC vector lanes, the
# sfetl lanes restaged on real Bulk 2.0 semantics atop the chunked
# size-governed writer with round-robin commit polling, the
# single-trigger replays); (2) all 32 lanes whose newest driver
# evidence is r7 — the stalest block; (3) the first rows of the
# r8-fresh block. Everything re-proven in r9/r10/r11 rotates behind
# the boundary.
MUST_BE_IN_WINDOW = [
    "stream_sink_sfetl_failed_rows",
    "sink_sfetl_successful_results",
    "dedup_semdedup_prune",
    "ann_pq_adc_topk",
    "ann_ivf_pq_topk",
    "ann_pq_recall_metrics",
    "decontaminate_embedding_cosine",
    "sink_sfetl_ingest_roundtrip",
    "sink_sfetl_delete_roundtrip",
    "sink_sfetl_failed_results",
    "stream_sink_sfetl_native",
    "stream_sink_sfetl_upsert",
    "stream_tumbling_1h",
    "stream_stateful_user_agg",
    "stream_session_window",
    "stream_stream_left_join_unmatched",
    "ab_test_lift",
    "ann_ivf_topk",
    "ann_srp_lsh_pairs",
    "attribution_channels",
    "bucketed_join_colocated",
    "clean_text_normalize",
    "corpus_prep_pipeline",
    "decontaminate_ngram_overlap",
    "dedup_cluster_bigstar",
    "dedup_cluster_components",
    "dedup_embedding_pipeline",
    "dedup_exact_substring",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "domain_mix_rebalance",
    "dq_validation_report",
    "embedding_quantize_int8",
    "gap_islands_activity",
    "geo_nearest_hub",
    "grouping_sets_flags",
    "mode_per_group",
    "null_semantics",
    "q6_forecast_revenue",
    "regression_by_group",
    "repetition_metrics",
    "snapshot_diff_cdc",
    "source_json_roundtrip",
    "source_orc_roundtrip",
    "source_schema_evolution",
    "split_train_test",
    "unpivot_metrics",
    "vocab_top_terms",
    "ann_ivf_kmeans_topk",
    "asof_pandas_merge",
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
