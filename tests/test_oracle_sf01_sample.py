"""Bench-scale (sf0.1) oracle sweep over the cap/histogram-sensitive
lanes.

The driver's correctness gate runs at sf0.01 and the main oracle
suite at sf0.001 — scales where several lanes' bounds don't bind:
`dedup_embedding_cosine`'s ground-truth cap (binds at 2000 vectors,
not 500), the histogram/percentile lanes' bucket widths (driven by
data ranges), and the salted top-k phase-1 cut (more salt collisions
at volume). This sample re-verifies exactly those lanes against
DuckDB at sf0.1, so a bound that silently changes results only above
fixture scale cannot stay green.
"""

from __future__ import annotations

import duckdb
import pytest

from sf_etl_spark.queries import all_queries
from tests.oracle_compare import compare_query

SF01_DIR = "/root/testdata/sf0.1"

LANES = [
    "dedup_embedding_cosine",  # ground-truth cap binds only at sf0.1
    "equidepth_histogram",
    "percentiles_by_flag",
    "decile_lift_table",
    "exact_median_histogram",
    "group_median_twophase",
    "topk_per_group",  # salted two-phase cut under real collision rates
    "ann_matryoshka_recall",
    "ann_recall_metrics",
    "stratified_sample_exact",
    "window_frames",
    # r12: the chunked sfetl writer's _SFETL_KEY_CAP slices are
    # two-sided (engine + oracle), but the WRITE machinery under them
    # (chunk split points, job fan-out, round-robin commit) only sees
    # real volume at sf0.1 — re-verify the value hash where the
    # machinery actually exercises
    "sink_sfetl_ingest_roundtrip",
    "sink_sfetl_successful_results",
    "stream_sink_sfetl_failed_rows",
    # r12: vector lanes whose cut points only see contention at
    # volume — the PQ ADC shortlist boundary (top-50 of 2000 ADC
    # distances vs 500 at fixture scale) and SemDeDup's within-cell
    # dup graph (cells 4x as large at sf0.1)
    "ann_pq_adc_topk",
    "ann_ivf_pq_topk",
    "dedup_semdedup_prune",
    # r12: streaming emission boundaries are watermark-determined and
    # data-dependent — re-verify the session close rule and the outer
    # join's null-row eviction rule where the event horizon is densest
    "stream_session_window",
    "stream_stream_left_join_unmatched",
    # r13: the full-outer leg adds the purchase-side eviction rule —
    # re-verify BOTH null-emission boundaries at the dense horizon,
    # plus the binary Hamming shortlist boundary (top-50 of 2000
    # codes) and the trained-quantizer agreement at 4x corpus
    "stream_stream_full_join_unmatched",
    "ann_binary_hamming_topk",
    "ann_ivf_pq_trained_agreement",
]


@pytest.fixture(scope="module")
def oracle_sf01():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders "
        "lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF01_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", LANES)
def test_sf01_oracle_sample(spark, oracle_sf01, name):
    spec = all_queries()[name]
    compare_query(spark, oracle_sf01, spec.fn, spec.oracle, SF01_DIR)
