"""Grid-bucketed spatial radius self-join.

The reference schema carries a geocoded point per hospital
(``design_table_schema.ipynb`` cell 1, ``geocoded_hospital_address``,
parsed by ``operators.cleaning.parse_point``) but never joins on it.
This operator supplies the capability in the shape that survives 100 TB:
"all pairs of points within radius R" without the O(n^2) cross join.

Design (the standard fixed-grid spatial hash):

- bucket every point into a square cell of side R (integer division);
- replicate ONE side to its 3x3 cell neighborhood (a bounded, constant
  x9 expansion — never data-dependent);
- equi-join on the cell key (a plain shuffle-hash/sort-merge join
  Catalyst already knows how to distribute), then apply the exact
  integer squared-distance predicate.

Any pair within R is at most one cell apart in each axis, so the
neighborhood join finds it; it meets on exactly one (dx, dy) offset —
the difference of the two cells — so no dedup pass is needed.  The
``id_a < id_b`` filter keeps each unordered pair once.

Coordinates are integers (micro-degrees or abstract grid units) and the
predicate is integer d2 <= R^2 — no trig, no doubles, bit-portable to
any oracle.  For geographic data at scale the same shape works per
latitude band with a longitude-corrected cell width.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def grid_radius_pairs(
    pts: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All unordered point pairs with squared distance <= radius^2.

    Returns (id_a, id_b, d2).  Coordinates must be non-negative
    integers; cell side = ``radius``.
    """
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    spark = pts.sparkSession
    from ..functions.frames import literal_frame

    offsets = literal_frame(
        spark,
        "dx int, dy int",
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
    )
    a = pts.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
        F.expr(f"`{x_col}` div {radius}").alias("_cx"),
        F.expr(f"`{y_col}` div {radius}").alias("_cy"),
    )
    left = a.crossJoin(F.broadcast(offsets)).select(
        "_id",
        "_x",
        "_y",
        (F.col("_cx") + F.col("dx")).alias("_jx"),
        (F.col("_cy") + F.col("dy")).alias("_jy"),
    )
    # Task granularity: when the cell side is small enough to broadcast,
    # the pair join runs broadcast-hash and the probe side inherits the
    # SCAN partitioning — a handful of file-slices each producing
    # millions of pairs (output explodes ~pop(cell) per probe row).
    # The r6 skewed-wave straggler gate measured 6-14x task imbalance
    # from exactly this: coarse probe slices + quadratic output + GC.
    # A round-robin repartition to the session's reduce granularity
    # costs one linear shuffle of the x9-replicated points (narrow
    # rows) and balances the quadratic stage at any scale; correctness
    # is unaffected (the join needs no co-partitioning of the probe).
    # Guarded probe (shared with skew.widen_coarse_scan): the balancing
    # repartition is advisory, never load-bearing — on sessions where
    # the conf is non-numeric (Databricks AQE 'auto') it degrades to a
    # no-op instead of failing every consumer (q135, q315 DBSCAN).
    from .skew import session_reduce_width

    n_probe = session_reduce_width(pts.sparkSession)
    if n_probe > 0:
        left = left.repartition(n_probe)
    right = a.select(
        F.col("_id").alias("_id2"),
        F.col("_x").alias("_x2"),
        F.col("_y").alias("_y2"),
        F.col("_cx").alias("_jx"),
        F.col("_cy").alias("_jy"),
    )
    ddx = F.col("_x") - F.col("_x2")
    ddy = F.col("_y") - F.col("_y2")
    d2 = ddx * ddx + ddy * ddy
    return (
        left.join(right, ["_jx", "_jy"])
        .filter(F.col("_id") < F.col("_id2"))
        .filter(d2 <= F.lit(radius * radius))
        .select(
            F.col("_id").alias("id_a"),
            F.col("_id2").alias("id_b"),
            d2.cast("long").alias("d2"),
        )
    )
