"""As-of (nearest-prior-event) join — an operator Spark lacks natively.

Implemented as the scalable union+carry-forward pattern rather than a
range join:
  1. tag both inputs and union them on (keys, event-time)
  2. one window sorted by (time, side, tiebreak) per key carries the
     most recent right-side attributes forward (last ignorenulls)
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

    ``tolerance_us`` bounds staleness (feature-store TTL semantics): a
    match older than the bound is nulled out, exactly as if no prior
    right row existed.  Implemented by carrying the matched right-side
    timestamp through the same window — no extra shuffle.
    """
    keys = list(keys)
    carried = [f"_asof_{c}" for c in right_value_cols]
    if tolerance_us is not None:
        right = right.withColumn("_asof_src_ts", F.col(right_time))
        right_value_cols = [*right_value_cols, "_asof_src_ts"]
        carried = [*carried, "_asof__asof_src_ts"]

    l_tagged = left.select(
        *left.columns,
        F.col(left_time).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(a) for c, a in zip(right_value_cols, carried)],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_time).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        *[F.col(c).alias(a) for c, a in zip(right_value_cols, carried)],
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
        *[c for c in unioned.columns if c not in carried],
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in carried],
    )
    out = filled.filter(F.col("_asof_side") == 1)
    if tolerance_us is not None:
        age = F.unix_micros(F.col("_asof_ts")) - F.unix_micros(
            F.col("_asof__asof_src_ts")
        )
        within = F.col("_asof__asof_src_ts").isNotNull() & (age <= tolerance_us)
        for a in carried:
            if a != "_asof__asof_src_ts":
                out = out.withColumn(a, F.when(within, F.col(a)))
        out = out.drop("_asof__asof_src_ts")
        carried = [a for a in carried if a != "_asof__asof_src_ts"]
        right_value_cols = [c for c in right_value_cols if c != "_asof_src_ts"]
    out = out.drop("_asof_ts", "_asof_side")
    renames = dict(zip(carried, right_value_cols))
    return out.withColumnsRenamed(renames)
