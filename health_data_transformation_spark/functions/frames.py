"""Tiny literal DataFrames without Python workers (r12 optimization).

``spark.createDataFrame(rows)`` for a handful of literal rows is
surprisingly expensive twice over: the rows round-trip through a
Python-worker-backed RDD (worker spin-up measured ~5 s on a cold
session — the q244 advancer lesson in the verify skill), and the
resulting RDD is parallelized over ``defaultParallelism``, so every
downstream action schedules a full width of near-empty tasks.  A
``range(0, 1, 1, 1)`` + ``explode(array(struct(...)))`` plan has
identical contents but is a single-partition pure-JVM evaluation.

Empty frames take the ``emptyRDD`` path: zero partitions, zero tasks.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def literal_frame(
    spark: SparkSession, schema: str, rows: Sequence[Sequence]
) -> DataFrame:
    """Build a tiny DataFrame of literal ``rows`` with the DDL ``schema``
    (``"name type, name type, ..."``) as a one-partition JVM-only plan.

    Intended for dimension/spec frames of at most a few thousand rows
    (the expression tree carries every value).  ``rows == []`` returns
    a zero-partition empty frame with the same schema.
    """
    if not rows:
        return spark.createDataFrame(spark.sparkContext.emptyRDD(), schema)
    fields = [
        (f.strip().split(" ", 1)[0], f.strip().split(" ", 1)[1].strip())
        for f in schema.split(",")
    ]
    structs = [
        F.struct(
            *[
                F.lit(v).cast(t).alias(n)
                for v, (n, t) in zip(row, fields, strict=True)
            ]
        )
        for row in rows
    ]
    return (
        spark.range(0, 1, 1, 1)
        .select(F.explode(F.array(*structs)).alias("_r"))
        .select("_r.*")
    )
