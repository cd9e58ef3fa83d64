"""Vector math over `array<float>` embedding columns.

Pure higher-order functions (`zip_with` + `aggregate`) — evaluated
JVM-side per row, no UDF, no shuffle.  Accumulation is a sequential
left-fold in array order in *double* precision, which is bit-identical
to the DuckDB oracle's `list_dot_product` over `DOUBLE[]` casts — so
cosine similarities hash-match across engines.

For 100 TB-scale ANN, see operators/similarity.py (brute-force top-k is
the exact baseline; IVF/LSH bucketing is the scale path that turns the
all-pairs shuffle into a per-bucket local problem).
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float-array columns, accumulated in double."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def dot_sql(a: str, b: str) -> str:
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"
