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
#: ``queries()``, so the ordering is evidence steering.  Round-10
#: policy (VERDICT r9 tasks #1/#2/#4/#6), slot by slot:
#:   1     q169 ingest anchor (S4-S8 §2 proof, pinned every round);
#:   2     q335, this round's one NEW entry (the persisted IVF index —
#:         task #4's stored==recompute==oracle twin for ANN serving);
#:   3-27  ALL 25 remaining never-driver-verified queries (task #1:
#:         ledger paydown to never-count 0 — the q71-q98 block);
#:   28-30 q238/q244/q56, the twice-deferred spares the verdict named
#:         (q56 additionally settles its r9 bench blip with
#:         driver-grade evidence);
#:   31-34 q76/q176/q179/q211 — the four max_bucket->pair_budget
#:         migrations whose RESULTS changed this round (task #2), so
#:         their old driver evidence no longer describes them (q77,
#:         the fifth migration, is already in the never block);
#:   35    q336, the JDBC federation entry (task #7: the S7 seam,
#:         end-to-end against embedded Derby — new, so never-verified
#:         by construction);
#:   36    q337, batched IVF serving (in-plan probe selection — the
#:         §8.13 batch shape; new, never-verified by construction);
#:   37    q338, the streaming vector-admission twin (q181's embedding
#:         sibling — streaming == batch == oracle as one hash; new,
#:         never-verified by construction);
#:   38    q339, snapshot DELETE WHERE (the right-to-be-forgotten
#:         primitive + its time-travel isolation proof; new, so
#:         never-verified by construction);
#:   39-50 the 12 stalest by driver evidence (task #6's rotation
#:         policy, first application: all from r2 — the q15-q48
#:         block), ordered oldest-first from tools/driver_ledger.py
#:         --stale.  Expected ledger after the r10 driver run:
#:         never-count 0 (25 + 5 new - 30) and max staleness r2
#:         (11 r2-era queries remain for the r11 rotation).
#: Prefix slots held for RE-PROOF rather than never/staleness rotation
#: (tests/test_tools_registry.py bounds this list at 8 and requires
#: each member to already carry driver evidence): q238/q244/q56 are the
#: verdict-named twice-deferred spares; q76/q176/q179/q211 changed
#: RESULTS this round (max_bucket -> pair_budget migration), so their
#: old driver evidence no longer describes them.
_REPROOF = [
    "q238_stream_stream_join",
    "q244_stream_outer_join",
    "q56_stateful_totals",
    "q76_dedup_clusters",
    "q176_soft_dedup_weights",
    "q179_quality_keeper",
    "q211_split_leakage_audit",
]

_PROMOTED = [
    "q169_ingest_lifecycle",
    "q335_ivf_search_stored",
    "q71_snapshot_diff",
    "q72_top_customer_share",
    "q73_ivf_built_search",
    "q74_tfidf_top_terms",
    "q75_range_frame_moving_sum",
    "q77_deduped_corpus",
    "q79_stratified_sample",
    "q80_count_min_sketch",
    "q81_hll_distinct",
    "q82_int8_cosine_topk",
    "q83_percent_rank",
    "q84_multimodal_resize",
    "q85_weighted_sample",
    "q86_quality_ratios",
    "q87_char_shingles",
    "q88_funnel_conversion",
    "q89_cohort_retention",
    "q90_grouped_median",
    "q91_corpus_pipeline",
    "q93_promo_revenue_share",
    "q94_referential_audit",
    "q95_drift_bins",
    "q96_incremental_rollup",
    "q97_pagerank_integer",
    "q98_hot_key_detector",
    "q238_stream_stream_join",
    "q244_stream_outer_join",
    "q56_stateful_totals",
    "q76_dedup_clusters",
    "q176_soft_dedup_weights",
    "q179_quality_keeper",
    "q211_split_leakage_audit",
    "q336_jdbc_federation",
    "q337_ivf_batch_search",
    "q338_stream_embedding_admission",
    "q339_snapshot_delete",
    "q15_orders_per_customer",
    "q16_topk_orders",
    "q17_top3_per_customer",
    "q18_running_user_totals",
    "q19_rollup_counts",
    "q20_distinct_per_segment",
    "q21_intersect",
    "q22_except",
    "q28_cube_counts",
    "q29_pivot",
    "q47_percentiles",
    "q48_stats_moments",
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
