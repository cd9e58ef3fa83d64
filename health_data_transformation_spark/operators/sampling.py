"""Deterministic sampling & split assignment for training-data pipelines.

`df.sample()`/`sampleBy()` are seed-based but partition-layout-dependent
(a repartition changes which rows are picked) — unacceptable for
reproducible dataset builds at 100 TB, where the same document must land
in the same split across reruns, engines, and cluster sizes.  The
content-hash form used here (md5 of a stable id -> bucket in [0, 1000))
is layout-independent, engine-portable (the DuckDB oracle recomputes it
bit-for-bit), and O(1) per row with no shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.text import hex_hash64

BUCKETS = 1000


def hash_bucket(id_col: Column | str) -> Column:
    """Stable bucket in [0, 1000) from a row id (not from layout/seed)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(hex_hash64(col.cast("string")), F.lit(BUCKETS))


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, deterministically by id hash."""
    return df.filter(hash_bucket(id_col) < int(fraction * BUCKETS))


def stratified_hash_sample(
    df: DataFrame, id_col: str, stratum_col: str, rates: dict
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downsample dominant languages,
    keep all of rare ones), deterministic by id hash.

    ``rates`` maps stratum value -> fraction in [0, 1]; strata not
    listed get 0.  Same layout-independence guarantees as hash_sample.
    """
    b = hash_bucket(id_col)
    threshold = None
    for value, rate in rates.items():
        cut = F.lit(int(rate * BUCKETS))
        threshold = (
            F.when(F.col(stratum_col) == value, cut)
            if threshold is None
            else threshold.when(F.col(stratum_col) == value, cut)
        )
    threshold = threshold.otherwise(F.lit(0))
    return df.filter(b < threshold)


UNIFORM_BITS = 1 << 20


def weighted_hash_sample(
    df: DataFrame, id_col: str, weight_col: Column | str, k: int
) -> DataFrame:
    """Weighted sample of k rows: selection probability increases with
    ``weight_col``, deterministic across reruns/layouts/engines.

    Priority-sampling form of hash_sample: each row gets a stable
    pseudo-uniform u = 1 + hash(id) % 2^20 (range [1, 2^20] — never 0,
    so no id is unconditionally selected), priority = u / weight, and
    the k smallest priorities win (a heavier row divides its draw by a
    larger weight, so it wins more often — the hash-deterministic
    analogue of Efraimidis–Spirakis exponential races).  u and weight
    are exact integers < 2^53, so the one double division is correctly
    rounded and bit-identical in any IEEE engine — the oracle reproduces
    the exact sample.  Rows with NULL or non-positive weight are
    excluded (weight<=0 would otherwise produce Infinity/NaN priorities
    that silently sort to the extremes).  Plan shape:
    TakeOrderedAndProject (per-partition heaps, no global sort), O(1)
    state per row.
    """
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = F.pmod(hex_hash64(F.col(id_col).cast("string")), F.lit(UNIFORM_BITS)) + F.lit(1)
    priority = u.cast("double") / wcol.cast("double")
    return (
        df.filter(wcol > 0)
        .withColumn("priority", priority)
        .orderBy("priority", id_col)
        .limit(k)
    )


def grouped_hash_reservoir(
    df: DataFrame, id_col: str, group_col: str, k: int
) -> DataFrame:
    """Deterministic fixed-size sample PER GROUP: the k smallest
    hash(id) draws win within each group — the layout/seed-free
    analogue of per-stratum reservoir sampling (every group yields
    exactly min(k, |group|) rows, unlike rate-based sampling which
    under/overshoots small strata).

    Two-phase rank (operators/topk.top_k_per_group_scalable): the
    group column is typically LOW-cardinality (5 languages, 20
    sources), so a plain ``PARTITION BY group`` window would hand the
    whole table to a handful of reducers — the q271 window class the
    explain-audit rule forbids (caught by the r5 registry-wide
    sweep).  Phase 1 ranks within (group, physical partition), so
    survivors are bounded by k * num_partitions per group; phase 2
    ranks the survivors.  Exact for the (hash, id) total order.
    Output keeps all input columns plus ``rk`` (1..k within the
    group).
    """
    from .topk import top_k_per_group_scalable

    h = hex_hash64(F.col(id_col).cast("string"), salt="res")
    return top_k_per_group_scalable(
        df, [group_col], [h.asc(), F.col(id_col).asc()], k, rank_col="rk"
    ).withColumn("rk", F.col("rk").cast("int"))


def assign_split(
    df: DataFrame,
    id_col: str,
    cuts: Sequence[tuple[str, int]] = (("train", 800), ("valid", 900), ("test", BUCKETS)),
    out_col: str = "split",
) -> DataFrame:
    """Label rows train/valid/test (or any cumulative-cut scheme) by id
    hash; the assignment survives reruns, repartitions, and engines."""
    b = hash_bucket(id_col)
    # build right-to-left: b < cut1 -> name1 elif b < cut2 -> name2 ... else last
    expr: Column | None = None
    for name, cut in reversed(list(cuts)):
        expr = F.lit(name) if expr is None else F.when(b < cut, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)
