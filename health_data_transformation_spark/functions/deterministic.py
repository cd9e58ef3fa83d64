"""Deterministic (order-insensitive, engine-portable) aggregation helpers.

Problem: floating-point SUM/AVG over a shuffled dataset is not
associative — Spark's partial-agg tree and DuckDB's scan order will sum
doubles in different orders, so the low bits (and occasionally a rounded
decimal) differ between engines and between runs.  That breaks the
driver's order-insensitive *value-hash* comparison.

Solution used throughout this engine's query surface: quantize each
input value to a fixed-scale DECIMAL before aggregating.  Decimal sums
are exact integers under the hood — fully order-insensitive — and the
final cast back to double is a single well-defined rounding.  Each
Spark-side helper has a ``*_sql`` twin that renders the byte-equivalent
DuckDB expression, so query and oracle can never drift apart.

At 100 TB this also matters operationally: decimal partial aggregation
is still map-side combinable and whole-stage-codegen'd; the cost over a
raw double sum is negligible next to the shuffle it rides on.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

PRECISION = 18  # enough for |value| < 10^(18-scale); sums widen to 28+ digits


def dec(col: Column | str, scale: int = 2) -> Column:
    """Quantize a double column to DECIMAL(18, scale)."""
    col = F.col(col) if isinstance(col, str) else col
    return col.cast(f"decimal({PRECISION},{scale})")


def dec_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(({expr}) AS DECIMAL({PRECISION},{scale}))"


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-insensitive SUM: quantize -> exact decimal sum -> double."""
    return F.sum(dec(col, scale)).cast("double")


def dec_sum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM({dec_sql(expr, scale)}) AS DOUBLE)"


def dec_avg(col: Column | str, scale: int = 2, out_scale: int = 6) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, rounded."""
    col = F.col(col) if isinstance(col, str) else col
    total = F.sum(dec(col, scale)).cast("double")
    n = F.count(col).cast("double")
    return F.round(total / n, out_scale)


def dec_avg_sql(expr: str, scale: int = 2, out_scale: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM({dec_sql(expr, scale)}) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE), {out_scale})"
    )


def dec_ratio(
    num: Column, den: Column, num_scale: int = 4, den_scale: int = 2, out_scale: int = 6
) -> Column:
    """Order-insensitive SUM(num)/SUM(den) ratio, rounded."""
    total_num = F.sum(dec(num, num_scale)).cast("double")
    total_den = F.sum(dec(den, den_scale)).cast("double")
    return F.round(total_num / total_den, out_scale)


def dec_ratio_sql(
    num: str, den: str, num_scale: int = 4, den_scale: int = 2, out_scale: int = 6
) -> str:
    return (
        f"ROUND(CAST(SUM({dec_sql(num, num_scale)}) AS DOUBLE)"
        f" / CAST(SUM({dec_sql(den, den_scale)}) AS DOUBLE), {out_scale})"
    )


# ---------------------------------------------------------------------------
# temporal: computed time columns are emitted as *strings* so the
# value-hash never depends on either engine's timestamp serialization.
# ---------------------------------------------------------------------------

def week_str(col: Column | str) -> Column:
    """Monday-start week of a timestamp, as 'yyyy-MM-dd' string."""
    return F.date_format(F.date_trunc("week", col), "yyyy-MM-dd")


def week_str_sql(expr: str) -> str:
    return f"strftime(date_trunc('week', {expr}), '%Y-%m-%d')"


def day_str(col: Column | str) -> Column:
    return F.date_format(col, "yyyy-MM-dd")


def day_str_sql(expr: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d')"


def bucket_str(col: Column | str, minutes: int) -> Column:
    """Tumbling time bucket of width ``minutes``, as string."""
    col = F.col(col) if isinstance(col, str) else col
    return F.date_format(
        F.timestamp_seconds(
            (F.unix_timestamp(col) / (minutes * 60)).cast("long") * (minutes * 60)
        ),
        "yyyy-MM-dd HH:mm:ss",
    )


def bucket_str_sql(expr: str, minutes: int) -> str:
    return f"strftime(time_bucket(INTERVAL '{minutes} minutes', {expr}), '%Y-%m-%d %H:%M:%S')"


def floor6(col: Column | str) -> Column:
    """Quantize a computed double to 6 decimals deterministically.

    ``round(x, 6)`` is NOT portable for doubles: Spark rounds the
    shortest decimal rendering (BigDecimal.valueOf) while DuckDB rounds
    the binary value, and the two disagree when the 7th digit sits on a
    tie (observed: q48 variance at sf0.001, 1e-6 flip).  floor over
    x*1e6 uses only correctly-rounded IEEE ops (multiply, floor,
    divide), so identical input bits give identical output bits in any
    engine.
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.floor(col * F.lit(1000000.0)) / F.lit(1000000.0)


def floor6_sql(expr: str) -> str:
    return f"(floor(({expr}) * 1000000.0) / 1000000.0)"
