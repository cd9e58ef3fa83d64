"""Top-k operators (SURVEY.md §2.4: LIMIT-4 recent weeks, top-20
states, top/bottom-10 ratings — /root/reference/Reporting.py:94,196,262-263).

``orderBy().limit(k)`` compiles to Catalyst's TakeOrderedAndProject:
each partition keeps a k-sized heap, only k rows per partition reach the
driver-side merge — no global sort, which is the correct physical shape
at any scale.  Grouped top-k uses a rank window, which shuffles once on
the group key.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. Callers must include a unique tiebreak column for
    deterministic results."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame, group_by: Sequence[str], order_by: Sequence[Column], k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k within each group via row_number (deterministic with tiebreak)."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def top_and_bottom(
    df: DataFrame, metric: str, tiebreak: str, k: int, side_col: str = "side"
) -> DataFrame:
    """Union of top-k and bottom-k (Reporting.py:262-263 head/tail shape)."""
    top = df.orderBy(F.col(metric).desc(), F.col(tiebreak)).limit(k).withColumn(
        side_col, F.lit("top")
    )
    bottom = df.orderBy(F.col(metric).asc(), F.col(tiebreak)).limit(k).withColumn(
        side_col, F.lit("bottom")
    )
    return top.unionAll(bottom)
