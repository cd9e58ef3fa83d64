"""As-of (nearest-prior-event) join — an operator Spark lacks natively.

Implemented as the scalable union+carry-forward pattern rather than a
range join:
  1. tag both inputs and union them on (keys, event-time)
  2. one window sorted by (time, side, tiebreak) per key carries the
     most recent right-side row forward (last ignorenulls over ONE
     struct, so every attached column comes from the same right row)
  3. keep only left rows

Cost: ONE shuffle on the key (the window partition), no row-pair
blowup — a naive `l JOIN r ON l.k = r.k AND l.ts >= r.ts` + max()
produces O(|matches|) intermediate rows, which explodes at 100 TB; this
stays O(|left| + |right|) with map-side-combinable sorting.  Equal
timestamps match (right sorts before left at the same instant).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    right_value_cols: Sequence[str],
    tiebreak: str | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach ``right_value_cols`` from the latest
    right row with right_time <= left_time and equal keys (NULLs if no
    prior right row exists).

    The whole right-side payload (its timestamp + every value column)
    travels as ONE struct filled by a single last(ignorenulls), so the
    attached columns always come from the same right row — a right row
    whose value column happens to be NULL attaches that NULL rather
    than resurrecting an older row's value (row semantics, matching
    pandas.merge_asof / DuckDB ASOF JOIN).

    ``tolerance_us`` bounds staleness (feature-store TTL semantics): a
    match older than the bound is nulled out, exactly as if no prior
    right row existed.  The struct's own timestamp is the age source,
    so TTL and values can never disagree about which row matched.
    """
    keys = list(keys)
    right_value_cols = list(right_value_cols)
    rtypes = dict(right.dtypes)
    payload_type = "struct<_ts:timestamp," + ",".join(
        f"`{c}`:{rtypes[c]}" for c in right_value_cols
    ) + ">"

    l_tagged = left.select(
        *left.columns,
        F.col(left_time).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(payload_type).alias("_asof_payload"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_time).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.struct(
            F.col(right_time).cast("timestamp").alias("_ts"),
            *[F.col(c) for c in right_value_cols],
        ).cast(payload_type).alias("_asof_payload"),
    ).select(*l_tagged.columns)  # align column order for unionByName safety

    unioned = l_tagged.unionByName(r_tagged)
    order = [F.col("_asof_ts"), F.col("_asof_side")]
    if tiebreak and tiebreak in left.columns:
        order.append(F.col(tiebreak))
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if c != "_asof_payload"],
        F.last("_asof_payload", ignorenulls=True).over(w).alias("_asof_payload"),
    )
    out = filled.filter(F.col("_asof_side") == 1)
    if tolerance_us is not None:
        age = F.unix_micros(F.col("_asof_ts")) - F.unix_micros(
            F.col("_asof_payload._ts")
        )
        out = out.withColumn(
            "_asof_payload",
            F.when(age <= F.lit(tolerance_us), F.col("_asof_payload")),
        )
    out = out.select(
        *[c for c in left.columns],
        *[F.col("_asof_payload").getField(c).alias(c) for c in right_value_cols],
    )
    return out
