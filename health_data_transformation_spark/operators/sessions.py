"""Sessionization: split per-key event streams into sessions at
inactivity gaps — the batch twin of Structured Streaming's
session_window (streaming variant in streaming/windows.py).

One shuffle (the per-key window); gap detection and session numbering
are lag + running-sum over the same window, so Catalyst evaluates both
in a single Window physical node.  Timestamps compare in exact integer
microseconds (unix_micros) for engine-portable determinism.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    gap_minutes: int = 30,
    tiebreak: str | None = None,
) -> DataFrame:
    """Add a ``session_idx`` column (1-based per key)."""
    order = [F.col(time_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    micros = F.unix_micros(F.col(time_col))
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(micros).over(w)
    is_new = F.when(prev.isNull() | ((micros - prev) > gap_us), 1).otherwise(0)
    running = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(is_new).over(running).cast("int"))


def session_bounds(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    gap_minutes: int = 30,
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per session: (keys, session_idx, n_events, start, end)."""
    with_sessions = sessionize(df, keys, time_col, gap_minutes, tiebreak)
    return with_sessions.groupBy(*keys, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min(time_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max(time_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )
