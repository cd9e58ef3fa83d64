"""Bucketed range join: equi keys + a time-range predicate, without the
nested-loop blowup.

Spark turns `a JOIN b ON a.k = b.k AND b.ts BETWEEN a.ts+lo AND a.ts+hi`
into a hash/sort-merge join on `k` with the range as a post-filter —
fine until one key holds many rows, where the per-key cross product
dominates.  The scalable form used here (same idea as Databricks'
range-join bin hints and the interval-join in stream processors):

1. bucket the RIGHT side by `floor(epoch_sec / w)` with bucket width
   `w = hi - lo` (one bucket per row);
2. explode the LEFT side to the 2-3 buckets its window can touch
   (`sequence` + `explode` — bounded replication, never data-dependent);
3. equi-join on (keys..., bucket) — a plain shuffled hash join — and
   apply the exact microsecond-precision range predicate in the join
   condition.

Each right row lives in exactly one bucket, so a matching (left, right)
pair meets in exactly one joined row: no dedup pass is needed.  Outer
semantics (keep zero-match lefts) compose on top as an anti-join union
— see ``prior_events_count``.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    eq_keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Inner-join right rows whose ``right_ts`` falls in the half-open
    window ``[left_ts + lower_s, left_ts + upper_s)`` of a left row
    sharing ``eq_keys``.

    Column names of the two inputs must not collide except on
    ``eq_keys`` (rename before calling).
    """
    width = max(upper_s - lower_s, 1)
    # long literals: lo * 1_000_000 overflows int32 for windows > ~35 min
    lo, hi = F.lit(lower_s).cast("long"), F.lit(upper_s).cast("long")

    r = right.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(right_ts)) / width).cast("long")
    )
    left_sec = F.unix_timestamp(F.col(left_ts))
    l = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor((left_sec + lo) / width).cast("long"),
                F.floor((left_sec + hi) / width).cast("long"),
            )
        ),
    )
    exact = (
        F.unix_micros(F.col(right_ts)) >= F.unix_micros(F.col(left_ts)) + lo * 1_000_000
    ) & (F.unix_micros(F.col(right_ts)) < F.unix_micros(F.col(left_ts)) + hi * 1_000_000)

    return l.join(r, [*eq_keys, "_bucket"], "inner").filter(exact).drop("_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
    eq_keys: Sequence[str] = (),
) -> DataFrame:
    """Join interval pairs that overlap (closed intervals, integer
    endpoints: ``a.start <= b.end AND b.start <= a.end``) without a
    nested-loop cross product.

    Both sides explode each interval to every width-``bucket_width``
    bucket it touches (`sequence` + `explode`), meet in a plain
    equi-join on (eq_keys..., bucket), and apply the exact overlap
    predicate.  A pair that overlaps shares every bucket in the
    intersection of their spans, so to count each pair EXACTLY ONCE the
    join keeps only the bucket where the later-starting interval begins
    (``bucket == max(floor(a.start/w), floor(b.start/w))``) — the
    standard dedup-free attribution rule for interval joins (same
    family as the bucketed range join above; used by stream processors
    and Databricks' range-join binning).

    Replication per row is ceil(span / bucket_width) + 1 — bounded by
    data shape, not by the other side's size; pick ``bucket_width`` ~
    the typical span so replication stays O(1) per row.
    """
    w = max(bucket_width, 1)
    l = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / w).cast("long"),
                F.floor(F.col(left_end) / w).cast("long"),
            )
        ),
    )
    r = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / w).cast("long"),
                F.floor(F.col(right_end) / w).cast("long"),
            )
        ),
    )
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    once = F.col("_bucket") == F.greatest(
        F.floor(F.col(left_start) / w).cast("long"),
        F.floor(F.col(right_start) / w).cast("long"),
    )
    return (
        l.join(r, [*eq_keys, "_bucket"], "inner")
        .filter(overlap & once)
        .drop("_bucket")
    )


def prior_events_count(
    events: DataFrame,
    anchor_type: str,
    prior_type: str,
    window_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per anchor event: how many ``prior_type`` events the same user
    produced in the ``window_s`` seconds strictly before it.

    Inner bucketed range join + re-aggregation on the anchor id; anchors
    with zero priors are restored by a broadcast-friendly left anti
    pattern (union of matched counts and zero rows).
    """
    anchors = events.filter(F.col("event_type") == anchor_type).select(
        F.col(id_col).alias("anchor_id"),
        F.col(user_col),
        F.col(ts_col).alias("_anchor_ts"),
    )
    priors = events.filter(F.col("event_type") == prior_type).select(
        F.col(user_col), F.col(ts_col).alias("_prior_ts")
    )
    matched = bucketed_range_join(
        anchors, priors, [user_col], "_anchor_ts", "_prior_ts", -window_s, 0
    )
    counts = matched.groupBy("anchor_id", user_col).agg(
        F.count("*").alias("n_prior")
    )
    zeros = (
        anchors.join(counts.select("anchor_id"), "anchor_id", "left_anti")
        .select("anchor_id", user_col, F.lit(0).cast("long").alias("n_prior"))
    )
    return counts.unionByName(zeros)
