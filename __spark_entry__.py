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
#: ``queries()``, so the ordering is evidence steering.  The prefix is
#: SET-DERIVED (VERDICT r10 tasks #1/#6; see
#: tools/driver_ledger.py:prefix_rotation_ok and the meta-test):
#:   1    the pinned q169 ingest anchor (S4-S8 §2 proof, every round);
#:   next every never-driver-verified query (r12: the new two-level
#:        partitioned snapshot gate q345, plus any entry added later
#:        this round — regenerate via the ledger before freeze);
#:   rest an exact prefix of tools/driver_ledger.py --stale's
#:        stalest-first rotation order (r12: the r4 remnant q267/q269,
#:        then the ENTIRE r5 tier — which includes the
#:        reference-derived core q01-q08b, re-proven per VERDICT r11
#:        task #2 after 6 rounds without driver-grade evidence).
#: _REPROOF is empty this round: no committed query's RESULTS changed
#: (the r11 reproofs q338/q181 are now ordinary rotation citizens).
#: The per-slot tier rule was replaced in r11 by the
#: exact-prefix-of-rotation-order rule (stricter, always fillable) —
#: pinned post-round-stable by tests/test_tools_registry.py.
_REPROOF: list[str] = []

_PROMOTED = [
    "q169_ingest_lifecycle",
    "q344_dedup_ivf_capstone",
    "q345_two_level_snapshot_delete",
    "q346_rebase_concurrency",
    "q267_snapshot_isolation_join",
    "q269_snapshot_concurrency",
    "q01_week_count",
    "q02_weekly_counts",
    "q03_pricing_summary",
    "q04_recent_weeks",
    "q05_priority_ratio",
    "q06_cumulative_usage",
    "q07_top_nations",
    "q08a_segment_week_ratio",
    "q08b_top_bottom_nations",
    "q101_stream_dedup",
    "q10_dedup_exact",
    "q11_anti_join",
    "q12_semi_join",
    "q13_json_sentinel_clean",
    "q14_validation_split",
    "q23_balance_buckets",
    "q24_normalize_strings",
    "q25_date_parts",
    "q268_multiway_smj_revenue",
    "q26_union_append",
    "q270_zorder_pruning",
    "q271_neyman_allocation",
    "q272_pii_redaction",
    "q273_grouped_ols_trend",
    "q274_bmp_decode_quarantine",
    "q275_char_ngram_langid",
    "q276_power_iteration_pca",
    "q277_diversified_topk",
    "q278_psi_drift_monitor",
    "q279_golden_record_survivorship",
    "q27_idempotent_upsert",
    "q280_auc_rank_sum",
    "q281_incremental_view_maintenance",
    "q282_kaplan_meier_retention",
    "q283_blocking_quality",
    "q284_ks_two_sample",
    "q285_importance_resampling",
    "q286_group_kfold_assignment",
    "q287_score_quantile_normalization",
    "q288_greedy_source_coverage",
    "q289_split_conformal",
    "q45_asof_join",
    "q46_sessionize",
    "q49_salted_join",
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
