"""Sketch operators: Count-Min heavy-hitter counts and HLL distincts.

Sketches are the 100 TB answer to "how many / how often" questions that
do not need exact answers: a Count-Min sketch summarizes an arbitrarily
large key stream into a fixed (depth x width) grid of counters that is
mergeable across partitions (counter addition commutes), and
HyperLogLog summarizes distinct counts into KB-sized registers.  Both
build with one map-side-combinable aggregation — no state proportional
to the key cardinality ever crosses the shuffle.

The Count-Min implementation here is deliberately *relational*: the
sketch IS a DataFrame of (row, bucket, cnt) cells built by a single
groupBy, and probing IS a broadcast join + min().  That keeps the whole
thing JVM-side, lets Catalyst fuse it with surrounding plans, and —
because the hash family is the engine's portable md5-based one
(functions/text.py:hex_hash64) — makes every counter bit-for-bit
reproducible by the DuckDB differential oracle, so even the *estimates*
are oracle-gated, not just bounded.

Generalizes the reference's exact COUNT(*) dashboards
(/root/reference/Reporting.py:29-41,182-196) to cardinalities where
exact counting would itself be the bottleneck.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text import hex_hash64, hex_hash64_sql


def _cms_salt(row: int) -> str:
    return f"cms{row}"


def count_min_build(
    df: DataFrame, key_col: str, width: int = 512, depth: int = 3
) -> DataFrame:
    """Build a Count-Min sketch over ``key_col`` as (row, bucket, cnt) cells.

    One explode (depth cells per input row) + one partial-aggregated
    groupBy: the shuffle carries at most depth*width counter partials
    per map task, independent of input size.  Returns at most
    depth*width rows.
    """
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(hex_hash64(key, _cms_salt(i)), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    width: int = 512,
    depth: int = 3,
) -> DataFrame:
    """Probe the sketch: estimate = min over rows of the key's counters.

    The sketch side is depth*width rows at most — a constant-size
    summary regardless of input scale — so it is always broadcastable:
    probing is a broadcast hash join with zero shuffle of the probe
    side, and the estimate for each key is a d-row min.  Count-Min
    guarantees estimate >= true count (counters only over-count on
    collision).
    """
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(hex_hash64(key, _cms_salt(i)), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    probe_cells = probes.select(
        F.col(key_col), F.explode(cells).alias("c")
    ).select(key_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


def count_min_cells_sql(source_sql: str, key_expr: str, width: int, depth: int) -> str:
    """DuckDB SQL reproducing count_min_build bit-for-bit."""
    parts = [
        f"""SELECT {i} AS row,
               {hex_hash64_sql(f"CAST({key_expr} AS VARCHAR)", _cms_salt(i))} % {width} AS bucket,
               count(*) AS cnt
        FROM ({source_sql}) GROUP BY 2"""
        for i in range(depth)
    ]
    return " UNION ALL ".join(parts)


def hll_distinct_bounded(
    df: DataFrame, key_col: str, group_col: str, rsd: float = 0.02, bound: float = 0.10
) -> DataFrame:
    """Exact distinct count per group plus a checked HLL error bound.

    HyperLogLog register values differ across engines, so the estimate
    itself is not oracle-portable; what IS portable is the accuracy
    contract.  Emits the exact count (oracle-matched) and a boolean
    that the HLL estimate landed within ``bound`` relative error —
    5-sigma wide for the requested rsd, so the gate is deterministic in
    practice while still failing loudly if the sketch ever breaks.
    """
    exact = F.count_distinct(F.col(key_col)).alias("exact_distinct")
    approx = F.approx_count_distinct(key_col, rsd)
    return df.groupBy(group_col).agg(
        exact,
        (
            F.abs(approx - F.count_distinct(F.col(key_col)))
            <= F.lit(bound) * F.count_distinct(F.col(key_col))
        ).alias("hll_within_bound"),
    )
