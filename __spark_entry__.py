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
#: ``queries()``, so the ordering is evidence steering.  Round-11
#: policy (VERDICT r10 tasks #1/#6 — now SET-DERIVED, see
#: tools/driver_ledger.py:prefix_rotation_ok and the meta-test): the
#: prefix is exactly
#:   1    the pinned q169 ingest anchor (S4-S8 §2 proof, every round);
#:   2-5  every never-driver-verified query (q340/q342 partitioned
#:        snapshot delete/upsert, q341 Lloyd-IVF recall, q343 takedown
#:        erasure — all new this round, never by construction);
#:   6-7  the _REPROOF slots: q338/q181's RESULTS changed this round
#:        (the streaming admission cap is now derived corpus-side and
#:        stamped in store metadata — VERDICT r10 wrong #3 — replacing
#:        the hard-coded max_bucket=50), so their old driver evidence
#:        no longer describes them;
#:   8-50 the 43 STALEST queries by driver evidence — an exact prefix
#:        of tools/driver_ledger.py --stale's rotation order (the
#:        entire remaining r2 tier: 11 queries, the r3 tier: 14, and
#:        the r4 tier minus its two newest entries: 18).  Expected ledger after the r11
#:        driver run: never-count 0, oldest evidence tier r5.
#: The old per-slot tier rule ("within one round of the oldest tier")
#: could not fill the prefix once the never-backlog was paid down;
#: the exact-prefix-of-rotation-order rule is stricter (no mid-tier
#: cherry-picks) and always fillable — pinned post-round-stable by
#: tests/test_tools_registry.py.
_REPROOF = [
    "q338_stream_embedding_admission",
    "q181_stream_incremental_dedup",
]

_PROMOTED = [
    "q169_ingest_lifecycle",
    "q340_partitioned_snapshot_delete",
    "q341_ivf_lloyd_recall",
    "q342_partitioned_snapshot_upsert",
    "q343_takedown_erasure",
    "q338_stream_embedding_admission",
    "q181_stream_incremental_dedup",
    "q50_salted_agg",
    "q54_range_join",
    "q55_grouping_sets",
    "q58_frame_sample",
    "q62_stream_session_windows",
    "q63_hash_split",
    "q64_profile",
    "q66_pack_bins",
    "q67_corr_moments",
    "q68_ntile_buckets",
    "q69_levenshtein_pairs",
    "q100_embedding_lsh_pairs",
    "q105_lsh_topk_neighbors",
    "q141_prefix_jaccard_pairs",
    "q156_bm25_topk",
    "q158_integer_kmeans",
    "q162_simhash_banded",
    "q173_semantic_dedup",
    "q184_perplexity_buckets",
    "q186_dup_span_table",
    "q191_theil_sen_trend",
    "q194_containment_pairs",
    "q199_warehouse_profile",
    "q204_exactly_once_sink",
    "q212_content_defined_chunks",
    "q180_versioned_dedup_ingest",
    "q200_corpus_export",
    "q209_ann_recall_eval",
    "q221_fuzzy_match_fastss",
    "q222_heavy_hitters_mg",
    "q227_corpus_overlap_minhash",
    "q231_threshold_algorithm_topk",
    "q232_ndcg_retrieval_eval",
    "q233_graph_feature_propagation",
    "q234_partition_advisor",
    "q235_join_strategy_advisor",
    "q237_merkle_repair_plan",
    "q243_encoding_advisor",
    "q250_lsh_recall_eval",
    "q261_dedup_threshold_sweep",
    "q263_bucketed_join_exchange_free",
    "q265_clean_room_join",
    "q266_merge_composition",
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
