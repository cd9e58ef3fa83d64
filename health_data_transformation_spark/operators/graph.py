"""Iterative graph algorithms over edge DataFrames.

Beyond connected components (dedup.py — the dedup-cluster collapse),
PageRank is the canonical "iterate a join+aggregate to fixpoint" shape.
Two design choices make it engine-portable and cluster-scalable:

- **Exact integer arithmetic.**  Ranks are parts-per-million integers;
  each step is `150000 + (850 * sum(contrib)) // 1000` with floor
  division.  Floating PageRank is shuffle-order-dependent (fp addition
  does not commute); the integer form gives bit-identical results on any
  engine — the DuckDB oracle reproduces every rank exactly, so a fixed
  iteration count is fully checkable, not just "close".
- **One shuffle per iteration.**  contribution = rank // out_degree
  flows along edges and is summed per destination (map-side partial
  aggregation); the plan never grows with iteration count because each
  round is checkpoint-free DataFrame-on-DataFrame (bounded rounds) —
  for unbounded rounds, localCheckpoint per round as in
  dedup.connected_components.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

INIT_PPM = 1_000_000
JUMP_PPM = 150_000  # (1 - damping) * 1e6
DAMP_NUM, DAMP_DEN = 850, 1000


def symmetrize(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Undirected edge list (both directions, distinct) from pairs."""
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    return fwd.unionByName(rev).distinct()


def pagerank_integer(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """PageRank in exact ppm integers over (src, dst) edges.

    Every node must have out-degree >= 1 (guaranteed for symmetrized
    graphs).  Returns (node, rank_ppm) after ``iterations`` rounds from
    a uniform 1e6 start.
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(INIT_PPM).cast("long").alias("r")
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(F.col("dst"), F.expr("r div d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("sc"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            F.expr(f"CAST({JUMP_PPM} + ({DAMP_NUM} * sc) div {DAMP_DEN} AS BIGINT)").alias("r"),
        )
    return ranks.select("node", F.col("r").alias("rank_ppm"))
