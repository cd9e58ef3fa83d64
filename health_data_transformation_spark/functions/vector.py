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


def int8_quantize(a: Column | str) -> Column:
    """Symmetric int8 quantization: x -> floor(x * 127 / max|x|).

    The scale path for embedding storage and ANN scoring: 4x smaller
    than float32 (a 100 TB embedding store becomes 25 TB; 4x more
    vectors per executor page).  floor (not round) keeps the mapping
    identical across engines regardless of round-half conventions, and
    the quantized values are integers, so downstream dot products are
    EXACT integer arithmetic — fully portable to the oracle.
    """
    a = F.col(a) if isinstance(a, str) else a
    m = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    # all-zero vector: max|x| == 0 would divide by zero (a hard error
    # under ANSI mode); substituting divisor 1.0 yields floor(0*127)=0
    # per element — the mathematically sensible all-zero output — and
    # keeps every path (JVM, oracle SQL, q259 numpy twin) identical
    scale = F.lit(127.0) / F.when(m == F.lit(0.0), F.lit(1.0)).otherwise(m)
    # clamp: for x == -max|x| the product can round a hair below -127.0
    # and floor to -128, outside int8 (hypothesis-found)
    #
    # scale is hoisted through array_repeat instead of being captured
    # by the element lambda: a captured expression re-evaluates PER
    # ELEMENT, and scale embeds the array_max pass — O(d^2) per row,
    # measured 6x slower at d=64.  array_repeat evaluates its argument
    # once per row; the zip_with lambda then reads a cheap element.
    scale_arr = F.array_repeat(scale, F.size(a))
    return F.zip_with(
        a,
        scale_arr,
        lambda x, s: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.floor(x.cast("double") * s).cast("long"),
            ),
        ),
    )


def int8_quantize_sql(a: str) -> str:
    v = f"CAST({a} AS DOUBLE[])"
    m = f"list_max(list_transform({v}, x -> abs(x)))"
    scale = f"(127.0 / (CASE WHEN {m} = 0 THEN 1.0 ELSE {m} END))"
    return (
        f"list_transform({v}, x -> greatest(CAST(-127 AS BIGINT), "
        f"least(CAST(127 AS BIGINT), CAST(floor(x * {scale}) AS BIGINT))))"
    )


def int_dot(a: Column | str, b: Column | str) -> Column:
    """Exact integer dot product of two quantized (long-array) columns."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    products = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(products, F.lit(0).cast("long"), lambda acc, x: acc + x)


def int_dot_sql(a: str, b: str) -> str:
    return f"CAST(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])) AS BIGINT)"
