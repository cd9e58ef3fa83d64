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
#: ``queries()``, so the ordering is evidence steering.  Round-9 policy
#: (VERDICT r8 tasks #1/#2/#5): the prefix is the q169 ingest anchor
#: (S4-S8 §2 proof, pinned every round), then the round's three NEW
#: registry entries exercising the budget-derived caps (q329/q330:
#: §8.10b pair budgets, the r8 verdict's headline ask; q331: the
#: §8.11b ingest-side join budget, added after the wave measured the
#: absolute cap FALSELY ADMITTING 93% of near-boilerplate probes at
#: ingest; q332: the §8.12 persisted-store probe — the store is an
#: implementation detail so its oracle is q178's verbatim, and the
#: driver gates stored == recompute == relational truth as one hash;
#: q333/q334: the embedding-side ingest admission — SemDeDup-at-
#: ingest under the join budget, recompute and persisted-store twins
#: sharing one derivation-mirroring oracle), then 43 of the 68
#: remaining never-driver-verified queries in the verdict's order:
#: the q30-q44 text/vector foundations (the LLM-pipeline proof
#: queries), q99, the q306-q328 tail, and 5 middle-block fills in
#: registry order.  Ledger arithmetic: 68 never + 6 new = 74; 49
#: never-verified slots -> 25 remain for r10 (the verdict's <=19
#: target predates the new-entry unfreeze it also asked for; both
#: cannot fit one 50-slot prefix, so the new entries win 6 slots and
#: r10's 49 slots still close the remaining 25 with room).
#: r8 task #5 (q238/q244/q56) stays deferred with the same documented
#: arithmetic: all three already carry driver evidence (q238/q244 r4,
#: q56 r1-r5) and re-proving them would push never-count 3 higher.
_PROMOTED = [
    "q169_ingest_lifecycle",
    "q329_embedding_near_dup_budget",
    "q330_lsh_near_dup_budget",
    "q331_incremental_dedup_budget",
    "q332_incremental_dedup_stored",
    "q333_embedding_incremental_dedup",
    "q334_embedding_incremental_stored",
    "q30_token_stats",
    "q31_quality_scores",
    "q32_langid_heuristic",
    "q33_normalized_fingerprint",
    "q34_jaccard_pairs",
    "q35_minhash_signatures",
    "q36_lsh_buckets",
    "q37_simhash",
    "q38_cosine_topk",
    "q39_embedding_norms",
    "q40_ivf_topk",
    "q41_multimodal_meta",
    "q43_embedding_near_dup",
    "q44_rolling_hash",
    "q99_boilerplate_prefixes",
    "q306_l_diversity_audit",
    "q307_patch_grid_features",
    "q308_zipf_rank_frequency",
    "q309_rendezvous_routing",
    "q310_audio_vad_trim",
    "q311_aa_calibration",
    "q312_bitemporal_asof",
    "q313_recsys_holdout_eval",
    "q314_join_key_discovery",
    "q315_dbscan_core_labels",
    "q316_binary_segmentation",
    "q317_mutual_information_screen",
    "q318_text_kl_drift",
    "q319_matryoshka_truncation_eval",
    "q320_skipgram_pmi",
    "q321_grouped_theil_sen",
    "q322_anova_effect_size",
    "q323_voptimal_histogram",
    "q324_front_coding_estimate",
    "q325_postings_compression_estimate",
    "q326_oof_target_encoding",
    "q327_learned_index_bound",
    "q328_bloom_fpr_measured",
    "q52_simhash_near_pairs",
    "q59_full_outer_join",
    "q60_lag_lead",
    "q61_unpivot",
    "q70_sorted_collect",
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
