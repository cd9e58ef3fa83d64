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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle per query (omitted => rows-only check)."""
    return oracle_map()
