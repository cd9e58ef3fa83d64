"""Similarity search over embedding columns (LLM-pipeline extension).

Brute-force cosine top-k is the exact baseline: one narrow pass over N
vectors (the query side is broadcast), a per-row JVM expression for the
dot product, and TakeOrderedAndProject for the top-k — no shuffle of the
embedding table at all.

The scale path is IVF-style bucketing: assign each vector to a coarse
cell (here: a provided bucket column, or a hash of the quantized
vector), search only the query's probe cells.  At 100 TB the bucket
column is also the parquet partition key, so cell probes become
partition pruning at the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.vector import dot, norm


def _with_query(df: DataFrame, query: DataFrame, vec_col: str) -> DataFrame:
    """Attach the (single-row) query vector to every row via broadcast."""
    return df.crossJoin(F.broadcast(query))


def cosine_scores(
    df: DataFrame, query: DataFrame, vec_col: str = "embedding",
    query_col: str = "qv", out_col: str = "sim", scale: int = 6,
) -> DataFrame:
    # query norm folded once into the broadcast row, not once per scanned
    # row; dot/(nv*nq) is bit-identical to the recomputed-cosine expr
    query = query.withColumn("_qnorm", norm(query_col))
    scored = _with_query(df, query, vec_col)
    sim = dot(F.col(vec_col), F.col(query_col)) / (
        norm(F.col(vec_col)) * F.col("_qnorm")
    )
    # floor-quantize rather than round: Spark's round() on doubles goes
    # through the shortest decimal rendering and can disagree with the
    # oracle's binary rounding on digit-(scale+1) ties
    q = F.lit(float(10 ** scale))
    return scored.withColumn(out_col, F.floor(sim * q) / q)


def brute_force_top_k(
    df: DataFrame, query: DataFrame, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id", query_col: str = "qv",
) -> DataFrame:
    """Exact cosine top-k against a broadcast query vector.

    Ranking uses the *rounded* similarity plus the id tiebreak so results
    are stable across engines and runs.
    """
    scored = cosine_scores(df, query, vec_col, query_col)
    return (
        scored.select(F.col(id_col), F.col("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def build_ivf_cells(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF coarse quantizer: build (assigned, centroids).

    Centroids are the ``n_cells`` lowest-id vectors (deterministic seed
    choice; a production build would Lloyd-refine them — the assignment
    machinery, which is the scale-critical part, is identical).  Each
    vector joins the broadcast centroid set once and keeps its best cell
    by cosine: one narrow pass, no shuffle of the vector table.

    Returns (df + 'cell' column, centroids(cell, centroid, _cnorm)).
    """
    centroids = (
        df.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.col(id_col).alias("cell"),
            F.col(vec_col).alias("_centroid"),
        )
        .withColumn("_cnorm", norm("_centroid"))
    )
    scored = df.crossJoin(F.broadcast(centroids))
    sim = dot(F.col(vec_col), F.col("_centroid")) / (
        norm(F.col(vec_col)) * F.col("_cnorm")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("cell"))
    assigned = (
        scored.withColumn("_csim", sim)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_centroid", "_cnorm", "_csim", "_rk")
    )
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_probes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_col: str = "qv",
) -> DataFrame:
    """Probe the ``n_probes`` nearest cells, exact top-k inside them.

    At scale ``assigned`` is partitioned by cell, so the probe filter is
    partition pruning and search cost ~ n_probes/n_cells of the table.
    """
    q = query.withColumn("_qnorm", norm(query_col))
    cent_scored = centroids.crossJoin(F.broadcast(q)).withColumn(
        "_qsim",
        dot(F.col("_centroid"), F.col(query_col))
        / (F.col("_cnorm") * F.col("_qnorm")),
    )
    probes = [
        r["cell"]
        for r in cent_scored.orderBy(F.desc("_qsim"), F.asc("cell"))
        .limit(n_probes)
        .collect()
    ]
    return brute_force_top_k(
        assigned.filter(F.col("cell").isin(probes)), query, k, vec_col, id_col, query_col
    )


def ivf_top_k(
    df: DataFrame, query: DataFrame, k: int = 3,
    bucket_col: str = "label", vec_col: str = "embedding",
    id_col: str = "vec_id", query_col: str = "qv",
) -> DataFrame:
    """IVF-shaped search: top-k *within each coarse cell*.

    A real IVF assigns cells by nearest centroid; the cell column here is
    caller-provided (testdata uses ``label`` as the precomputed cell).
    Probing a subset of cells = filtering on ``bucket_col``, which prunes
    partitions when the table is partitioned by it.
    """
    scored = cosine_scores(df, query, vec_col, query_col)
    w = Window.partitionBy(bucket_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.select(F.col(bucket_col), F.col(id_col), F.col("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
