"""Single-pass column profiling (data-quality monitoring for pipelines).

One scan computes (rows, nulls, distincts) for every requested column —
Catalyst plans the multi-distinct aggregation with Expand, so the input
is read once regardless of column count — then the wide result is
unpivoted to one row per column.  At 100 TB swap exact distincts for
``approx_count_distinct`` (same plan shape, no Expand blowup); the exact
form is kept here so the DuckDB oracle can verify values.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def profile_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """-> (column, n_rows, n_null, n_distinct), one row per column."""
    aggs = [F.count("*").alias("n_rows")]
    for c in columns:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = df.agg(*aggs)
    per_col = None
    for c in columns:
        row = wide.select(
            F.lit(c).alias("column"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
        )
        per_col = row if per_col is None else per_col.unionByName(row)
    return per_col


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"}


def grouped_median(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-group exact median via grouped-map ``applyInPandas`` —
    the custom-operator slot for group-local algorithms that need the
    whole group in memory (rank statistics, per-entity model fits).

    Returns (key, n, med2) where med2 = 2 * median: for INTEGER value
    columns (asserted below) the doubled median is itself an exact
    integer (sum of the two middle elements when n is even), so the
    result is bit-portable to any engine with no float-interpolation
    convention in play.  The output key field inherits the input key
    column's type, so string/date/decimal keys work unchanged.

    Scale note: the group is the unit of task memory here — right for
    per-entity groups (users, facilities: thousands of rows each), wrong
    for monster groups; those pre-aggregate or use approx_percentile.
    The shuffle is the same single hash partition by key that any
    groupBy performs.
    """
    import numpy as np
    import pandas as pd

    key_type = dict(df.dtypes)[key_col]
    value_type = dict(df.dtypes)[value_col]
    if value_type not in _INTEGRAL_TYPES:
        raise TypeError(
            f"grouped_median requires an integer value column; {value_col!r} "
            f"is {value_type} (use approx_percentile / percentile_approx for "
            "floating-point medians)"
        )
    schema = f"`{key_col}` {key_type}, n long, med2 long"

    def stats(pdf: "pd.DataFrame") -> "pd.DataFrame":
        v = np.sort(pdf[value_col].to_numpy())
        n = len(v)
        mid = n // 2
        med2 = int(v[mid] * 2) if n % 2 else int(v[mid - 1] + v[mid])
        return pd.DataFrame({key_col: [pdf[key_col].iloc[0]], "n": [n], "med2": [med2]})

    return (
        df.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandas(stats, schema=schema)
    )


def grouped_weighted_quantile(
    df: DataFrame, key_col: str, value_col: str, weight_col: str,
    q_num: int = 1, q_den: int = 2,
    bin_shift: int = 14,
) -> DataFrame:
    """Exact weighted median per group, fully relational (no Python).

    Definition (lower weighted q-quantile, q = q_num/q_den): the
    smallest value ``v`` such that the cumulative weight of all rows
    with value <= v reaches q of the group's total weight
    (cum * q_den >= q_num * total, all-integer arithmetic — no fp,
    engine-portable).  q_num/q_den = 1/2 is the weighted median,
    9/10 the p90, and with weight 1 per row the plain quantile.
    ``value_col`` must be integral and ``weight_col`` non-negative.

    Two-phase bin-then-refine plan — the naive form (cumulative window
    over every distinct value of a group) sorts each group's whole
    value set through one window partition, which at 100 TB puts
    hundreds of millions of rows in a single task.  Instead:

    1. **Locate**: aggregate weight per (key, value >> bin_shift) bin —
       map-side combinable, output bounded by the value RANGE / 2^s,
       not the row count — and walk the (tiny) per-key bin histogram
       with a cumulative window to find the bin containing the median
       and the cumulative weight strictly before it.
    2. **Refine**: rescan only the rows falling in each key's target
       bin (a broadcast join on the per-key bin table prunes everything
       else at the scan), aggregate per exact value, and pick the
       first value whose carried-in + within-bin cumulative weight
       crosses half the total.

    Both windows run over aggregates (bins, then one bin's distinct
    values); no per-group vector ever materializes.  ``shiftright`` is
    an arithmetic shift = floor division by 2^s, so negative values bin
    correctly.  Contrast grouped_median (applyInPandas) — this is the
    100 TB-safe default when values are integral.
    """
    key, val = F.col(key_col), F.col(value_col).cast("long")
    binned = F.shiftright(val, bin_shift).alias("_bin")
    per_bin = df.select(key, binned, F.col(weight_col).alias("_w")).groupBy(
        key_col, "_bin"
    ).agg(F.sum("_w").alias("_wb"))
    wbin = Window.partitionBy(key_col).orderBy("_bin")
    binc = per_bin.select(
        key_col,
        "_bin",
        F.col("_wb"),
        F.sum("_wb").over(wbin).alias("_cumb"),
        F.sum("_wb").over(Window.partitionBy(key_col)).alias("_tot"),
    )
    target = (
        binc.filter(F.col("_cumb") * q_den >= q_num * F.col("_tot"))
        .groupBy(key_col)
        .agg(
            F.min_by(
                F.struct(
                    F.col("_bin").alias("tbin"),
                    (F.col("_cumb") - F.col("_wb")).alias("before"),
                ),
                F.col("_bin"),
            ).alias("_t"),
            F.max("_tot").alias("_tot"),
        )
        .select(key_col, "_t.tbin", "_t.before", "_tot")
    )
    in_bin = (
        df.select(key, val.alias("_v"), F.col(weight_col).alias("_w"))
        .join(F.broadcast(target), key_col)
        .filter(F.shiftright(F.col("_v"), bin_shift) == F.col("tbin"))
        .groupBy(key_col, "_v", "before", "_tot")
        .agg(F.sum("_w").alias("_wv"))
    )
    wval = Window.partitionBy(key_col).orderBy("_v")
    cum2 = in_bin.select(
        key_col,
        "_v",
        "_tot",
        (F.col("before") + F.sum("_wv").over(wval)).alias("_cum"),
    )
    return (
        cum2.filter(F.col("_cum") * q_den >= q_num * F.col("_tot"))
        .groupBy(key_col)
        .agg(
            F.min("_v").alias("quantile_value"),
            F.max("_tot").alias("total_weight"),
        )
    )


def grouped_weighted_quantiles(
    df: DataFrame, key_col: str, value_col: str, weight_col: str,
    specs: dict[str, tuple[int, int]],
    bin_shift: int = 14,
) -> DataFrame:
    """Several exact weighted quantiles per group in ONE locate pass +
    ONE refine pass over ``df`` — for ANY number of quantiles.

    ``specs`` maps an output label to (q_num, q_den), e.g.
    ``{"p5": (1, 20), "p95": (19, 20)}``.  Returns LONG format:
    (key, q, quantile_value, total_weight), one row per (group, label);
    callers pivot the (tiny) result as needed.

    Why this exists (r7 re-execution audit): calling
    :func:`grouped_weighted_quantile` once per quantile re-executes the
    whole input subtree per call — 2 passes each, so p5+p95 over a
    join-produced frame ran it 4x (q165 showed lineitem scanned 8x in
    the final plan; q251 re-ran its conversion range-join 5x).  The
    bin histogram does not depend on q, so ALL quantiles share it: the
    locate phase crosses the per-key bin cumulative (tiny) with the
    spec dim, and the refine phase joins each row to every spec whose
    target bin it falls in (a 1-to-few broadcast join).  Input passes:
    exactly 2, independent of len(specs).
    """
    spark = df.sparkSession
    key, val = F.col(key_col), F.col(value_col).cast("long")
    binned = F.shiftright(val, bin_shift).alias("_bin")
    per_bin = df.select(key, binned, F.col(weight_col).alias("_w")).groupBy(
        key_col, "_bin"
    ).agg(F.sum("_w").alias("_wb"))
    wbin = Window.partitionBy(key_col).orderBy("_bin")
    binc = per_bin.select(
        key_col,
        "_bin",
        F.col("_wb"),
        F.sum("_wb").over(wbin).alias("_cumb"),
        F.sum("_wb").over(Window.partitionBy(key_col)).alias("_tot"),
    )
    # spec dim: pure-JVM literal rows (never createDataFrame — a 1-row
    # Python frame costs ~5 s of worker spin-up, see the q244 rule)
    spec_rows = [
        F.struct(
            F.lit(label).alias("_q"),
            F.lit(int(qn)).cast("long").alias("_qn"),
            F.lit(int(qd)).cast("long").alias("_qd"),
        )
        for label, (qn, qd) in specs.items()
    ]
    spec_dim = spark.range(0, 1, 1, 1).select(
        F.explode(F.array(*spec_rows)).alias("_s")
    ).select("_s.*")
    target = (
        binc.crossJoin(F.broadcast(spec_dim))
        .filter(F.col("_cumb") * F.col("_qd") >= F.col("_qn") * F.col("_tot"))
        .groupBy(key_col, "_q")
        .agg(
            F.min_by(
                F.struct(
                    F.col("_bin").alias("tbin"),
                    (F.col("_cumb") - F.col("_wb")).alias("before"),
                ),
                F.col("_bin"),
            ).alias("_t"),
            F.max("_tot").alias("_tot"),
            F.max("_qn").alias("_qn"),
            F.max("_qd").alias("_qd"),
        )
        .select(key_col, "_q", "_t.tbin", "_t.before", "_tot", "_qn", "_qd")
    )
    rows = df.select(key, val.alias("_v"), F.col(weight_col).alias("_w"))
    in_bin = (
        rows.join(
            F.broadcast(target),
            (rows[key_col] == target[key_col])
            & (F.shiftright(F.col("_v"), bin_shift) == F.col("tbin")),
        )
        .drop(target[key_col])
        .groupBy(key_col, "_q", "_v", "before", "_tot", "_qn", "_qd")
        .agg(F.sum("_w").alias("_wv"))
    )
    wval = Window.partitionBy(key_col, "_q").orderBy("_v")
    cum2 = in_bin.select(
        key_col,
        "_q",
        "_v",
        "_tot",
        "_qn",
        "_qd",
        (F.col("before") + F.sum("_wv").over(wval)).alias("_cum"),
    )
    return (
        cum2.filter(F.col("_cum") * F.col("_qd") >= F.col("_qn") * F.col("_tot"))
        .groupBy(key_col, "_q")
        .agg(
            F.min("_v").alias("quantile_value"),
            F.max("_tot").alias("total_weight"),
        )
        .withColumnRenamed("_q", "q")
    )


def grouped_weighted_median(
    df: DataFrame, key_col: str, value_col: str, weight_col: str,
    bin_shift: int = 14,
) -> DataFrame:
    """Exact weighted median per group (q=1/2 of
    :func:`grouped_weighted_quantile`; see there for the two-phase
    bin-then-refine scale design)."""
    return grouped_weighted_quantile(
        df, key_col, value_col, weight_col, 1, 2, bin_shift
    ).select(
        key_col,
        F.col("quantile_value").alias("weighted_median"),
        "total_weight",
    )
