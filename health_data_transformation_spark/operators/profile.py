"""Single-pass column profiling (data-quality monitoring for pipelines).

One scan computes (rows, nulls, distincts) for every requested column —
Catalyst plans the multi-distinct aggregation with Expand, so the input
is read once regardless of column count — then the wide result is
unpivoted to one row per column.  At 100 TB swap exact distincts for
``approx_count_distinct`` (same plan shape, no Expand blowup); the exact
form is kept here so the DuckDB oracle can verify values.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """-> (column, n_rows, n_null, n_distinct), one row per column."""
    aggs = [F.count("*").alias("n_rows")]
    for c in columns:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = df.agg(*aggs)
    per_col = None
    for c in columns:
        row = wide.select(
            F.lit(c).alias("column"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
        )
        per_col = row if per_col is None else per_col.unionByName(row)
    return per_col
