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


def symmetrize(
    pairs: DataFrame, a: str, b: str, distinct: bool = True
) -> DataFrame:
    """Undirected edge list (both directions) from pairs, in ONE pass.

    Each input row fans out to both directions via a 2-element
    explode instead of a two-branch union: a union of two selects
    over the same frame physically executes the upstream plan once
    PER BRANCH (the q315 checkpoint-double-execution class — an
    edge builder with a distinct/aggregate inside is replayed in
    full), while the explode reads it once and the x2 fanout is
    map-side.  Both columns must share a type (struct fields must
    agree across the two array elements).

    ``distinct=False`` skips the dedup shuffle — correct when the
    input is already a canonical ``a < b`` edge list, where the two
    directions cannot collide.
    """
    out = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(a).alias("src"), F.col(b).alias("dst")),
                F.struct(F.col(b).alias("src"), F.col(a).alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    return out.distinct() if distinct else out


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


def canonical_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected edge set as distinct (a < b) pairs, self-loops dropped."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count over an undirected graph.

    ``edges`` must be canonical (a < b, distinct — see
    :func:`canonical_edges`).  Algorithm: orient every edge from its
    lower- to its higher-(degree, id) endpoint ("compact-forward" /
    degree orientation).  Each oriented node then has out-degree
    O(sqrt(m)), so the wedge-building self-join — the quadratic step in
    any triangle algorithm — is bounded by sum(out_deg^2) = O(m^1.5)
    instead of sum(deg^2), which is what makes power-law graphs (the
    100 TB case: social/web graphs with celebrity nodes) tractable: the
    hot high-degree vertex never fans out its full neighborhood.  The
    closing edge is verified with one semi-join back to the oriented
    edge set.  Three shuffles total (degree agg, wedge join, closing
    semi-join); no iteration.

    Returns one row: (n_nodes, n_edges, n_triangles).
    """
    # materialize the (small: O(m)) edge list once — nodes, edge count,
    # and the wedge join all reuse it instead of recomputing upstream
    edges = edges.localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    # orient: lower (d, v) -> higher (d, v); total order so no edge is lost
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    oriented = (
        edges.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("s"), F.col("b").alias("t")),
            )
            .otherwise(F.struct(F.col("b").alias("s"), F.col("a").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
    )
    # wedges: two out-edges of the same source; close t1-t2 (ordered to
    # match the oriented edge exactly once)
    o1 = oriented.select(F.col("s"), F.col("t").alias("t1"))
    o2 = oriented.select(F.col("s"), F.col("t").alias("t2"))
    wedges = o1.join(o2, "s").filter(F.col("t1") != F.col("t2")).select(
        F.least("t1", "t2").alias("wa"), F.greatest("t1", "t2").alias("wb")
    )
    closing = edges.select(F.col("a").alias("wa"), F.col("b").alias("wb"))
    # fully lazy single-row result: three 1-row aggregates cross-joined,
    # so the caller's one action runs the whole thing as one job
    tri = wedges.join(closing, ["wa", "wb"], "inner").agg(
        F.expr("count(*) div 2").alias("n_triangles")
    )
    n_nodes = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    n_edges = edges.agg(F.count("*").cast("long").alias("n_edges"))
    return n_nodes.crossJoin(n_edges).crossJoin(tri)


def bfs_levels(edges: DataFrame, seed, max_depth: int = 3) -> DataFrame:
    """Minimum-hop BFS levels from ``seed`` over symmetric ``edges``.

    ``edges`` must contain both directions (see :func:`symmetrize`).
    Proper frontier BFS: each round expands only the newest frontier and
    anti-joins the visited set, so total work is O(edges * rounds) — in
    contrast to the path-enumerating recursive-CTE form (the DuckDB
    oracle), whose row count grows with the number of *walks* and is
    only viable at tiny depth.  ``localCheckpoint`` per round keeps the
    plan flat (same pattern as dedup.connected_components).

    Returns (node, lvl) for every node within ``max_depth`` hops.
    """
    spark = edges.sparkSession
    from ..functions.frames import literal_frame

    visited = literal_frame(spark, "node LONG, lvl INT", [(seed, 0)])
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .select("node", F.lit(depth).cast("int").alias("lvl"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited
