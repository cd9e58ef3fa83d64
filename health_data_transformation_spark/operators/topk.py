"""Top-k operators (SURVEY.md §2.4: LIMIT-4 recent weeks, top-20
states, top/bottom-10 ratings — /root/reference/Reporting.py:94,196,262-263).

``orderBy().limit(k)`` compiles to Catalyst's TakeOrderedAndProject:
each partition keeps a k-sized heap, only k rows per partition reach the
driver-side merge — no global sort, which is the correct physical shape
at any scale.  Grouped top-k uses a rank window, which shuffles once on
the group key.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. Callers must include a unique tiebreak column for
    deterministic results."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame, group_by: Sequence[str], order_by: Sequence[Column], k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k within each group via row_number (deterministic with tiebreak)."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def top_and_bottom(
    df: DataFrame, metric: str, tiebreak: str, k: int, side_col: str = "side"
) -> DataFrame:
    """Union of top-k and bottom-k (Reporting.py:262-263 head/tail shape)."""
    top = df.orderBy(F.col(metric).desc(), F.col(tiebreak)).limit(k).withColumn(
        side_col, F.lit("top")
    )
    bottom = df.orderBy(F.col(metric).asc(), F.col(tiebreak)).limit(k).withColumn(
        side_col, F.lit("bottom")
    )
    return top.unionAll(bottom)


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based row_number WITHOUT a single-partition window.

    ``row_number().over(Window.orderBy(...))`` funnels every row through
    one task — fine for a 6-row report, fatal for a corpus-sized
    vocabulary.  This is the scalable shape: range-partition on the sort
    key (global order across partitions is preserved), rank locally,
    then shift each partition by the total count of all earlier
    partitions.  The offset table is one row per partition — collected,
    never the data.  Two shuffle-free passes over the range-partitioned
    frame (Spark caches nothing here; the range exchange is reused by
    both the count and the rank because we materialize offsets from a
    tiny aggregate, not a second sort).

    Callers must make ``order_by`` a total order (include a tiebreak
    column) for deterministic ids.

    The range-partitioned frame is localCheckpointed BEFORE
    spark_partition_id() is read: the offsets are collected from one
    evaluation, but without the barrier a later consumer (a self-join,
    an AQE-re-coalesced branch) could re-evaluate the exchange with
    different runtime partition ids and silently mis-rank — observed
    as a real wrong-answer at sf0.1 when the ranked frame was joined
    twice in one plan.  The checkpoint freezes the physical layout the
    offsets were measured on.
    """
    part = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    part = part.withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        # eager=False (r13): the offsets collect right below is the
        # first consumer and its map side computes (and persists)
        # every partition — eager's count() was one extra full pass.
        # The layout-freeze guarantee is unchanged: no other consumer
        # exists before that collect materializes the checkpoint.
        eager=False
    )
    counts = part.groupBy("_pid").agg(F.count("*").alias("_n"))
    rows = sorted((r["_pid"], r["_n"]) for r in counts.collect())
    offsets, acc = {}, 0
    for pid, n in rows:
        offsets[pid] = acc
        acc += n
    off_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*order_by)
    return (
        part.withColumn(out_col, F.row_number().over(w) + off_expr)
        .drop("_pid")
    )


def top_k_per_group_scalable(
    df: DataFrame, group_by: Sequence[str], order_by: Sequence[Column], k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact per-group top-k WITHOUT funneling any group through one task.

    ``top_k_per_group`` partitions the window by the group key, so a
    group holding a large fraction of the data (20 anchors over a
    100 TB candidate set) sorts through a single task.  This is the
    two-phase shape: rank within (group, physical partition) first —
    every task sees only its own slice, survivors are bounded by
    k * num_partitions per group — then rank the survivors with the
    small per-group window.  Exact for any total-order ``order_by``
    (the global top-k of a group is contained in the union of its
    per-partition top-ks).
    """
    part = df.withColumn("_pid", F.spark_partition_id())
    w1 = Window.partitionBy(*(list(group_by) + ["_pid"])).orderBy(*order_by)
    survivors = (
        part.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_pid")
    )
    w2 = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )


def global_running_sum(
    df: DataFrame,
    order_by: Sequence[Column],
    val_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive global prefix sum WITHOUT a single-partition window.

    Same two-phase shape as global_row_number: range-partition on the
    sort key (preserving global order across partitions), take the
    per-partition EXCLUSIVE running sum locally, then shift each
    partition by the total of all earlier partitions.  The offset table
    is one (partition, sum) row per partition — collected, never the
    data.  ``out_col`` = sum of ``val_col`` over all rows strictly
    before this row in ``order_by`` order.

    Callers must make ``order_by`` a total order for deterministic
    prefix sums.  This is the scalable cumulative-sum for manifest- and
    ledger-sized frames that can still reach millions of rows (file
    compaction planning, quota ledgers) where
    ``Window.orderBy(...)`` alone would funnel everything through one
    task.
    """
    part = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    # localCheckpoint BEFORE reading spark_partition_id — see
    # global_row_number: offsets must be measured on the same physical
    # layout every consumer reads.
    part = part.withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        # eager=False (r13): the offsets collect right below is the
        # first consumer and its map side computes (and persists)
        # every partition — eager's count() was one extra full pass.
        # The layout-freeze guarantee is unchanged: no other consumer
        # exists before that collect materializes the checkpoint.
        eager=False
    )
    sums = part.groupBy("_pid").agg(F.sum(val_col).alias("_s"))
    rows = sorted((r["_pid"], r["_s"] or 0) for r in sums.collect())
    offsets, acc = {}, 0
    for pid, s in rows:
        offsets[pid] = acc
        acc += s
    off_expr = (
        F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("_pid"),
        )
        if offsets
        else F.lit(0)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(val_col).over(w), F.lit(0))
    return part.withColumn(out_col, local + off_expr).drop("_pid")


def grouped_running_sum(
    df: DataFrame,
    group_by: str,
    order_by: Sequence[Column],
    val_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive PER-GROUP prefix sum without funneling any group
    through one task.

    ``sum().over(Window.partitionBy(group))`` hands each group to a
    single reducer — fatal when the group column is low-cardinality
    (5 languages over a corpus; the q271 window class).  Same
    two-phase shape as global_running_sum, with the group key leading
    the range partitioning so slices never mix groups: range-partition
    on (group, order), take per-(group, slice) sums, shift each slice
    by the total of EARLIER slices of the same group.  The offset
    table is one row per (group, slice) — collected, never the data.

    Callers must make (group, order_by) a total order for
    deterministic prefix sums.  Group keys may be NULL (mapped to a
    sentinel internally); the group type's string cast must be
    injective over the values present (true for the string/int/date
    keys in use — not for e.g. binary).
    """
    gcol = F.col(group_by)
    keys = [gcol.asc(), *order_by]
    part = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else df.repartitionByRange(*keys)
    )
    # localCheckpoint BEFORE reading spark_partition_id — see
    # global_row_number: offsets must be measured on the same physical
    # layout every consumer reads.
    part = part.withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        # eager=False (r13): the offsets collect right below is the
        # first consumer and its map side computes (and persists)
        # every partition — eager's count() was one extra full pass.
        # The layout-freeze guarantee is unchanged: no other consumer
        # exists before that collect materializes the checkpoint.
        eager=False
    )
    # The map key must be built from the SAME cast semantics on both the
    # build (collected) and probe (expression) side.  Python str(g) does
    # NOT match Spark's string cast for booleans ('True' vs 'true'),
    # dates/timestamps/floats — and concat_ws silently skips NULL group
    # keys, so a str(None)='None' build key would never be probed
    # (ADVICE r5, silent-wrong-answer class).  Fix: phase 1 aggregates
    # on Spark's own cast with a NULL sentinel, and the collected value
    # of that expression keys the map.
    null_sentinel = "\x00<NULL>"
    gstr = F.coalesce(gcol.cast("string"), F.lit(null_sentinel))
    sums = part.groupBy(gstr.alias("_gk"), F.col("_pid")).agg(
        F.sum(val_col).alias("_s")
    )
    rows = sorted(
        ((r["_gk"], r["_pid"], r["_s"] or 0) for r in sums.collect()),
        key=lambda t: (t[0], t[1]),
    )
    offsets: dict[tuple, int] = {}
    acc: dict = {}
    for gk, pid, s in rows:
        offsets[(gk, pid)] = acc.get(gk, 0)
        acc[gk] = acc.get(gk, 0) + s
    off_expr = (
        F.element_at(
            F.create_map(
                *[
                    x
                    for (gk, pid), v in offsets.items()
                    for x in (
                        F.concat_ws("|", F.lit(gk), F.lit(str(pid))),
                        F.lit(v),
                    )
                ]
            ),
            F.concat_ws("|", gstr, F.col("_pid").cast("string")),
        )
        if offsets
        else F.lit(0)
    )
    w = (
        Window.partitionBy(group_by, "_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(val_col).over(w), F.lit(0))
    return part.withColumn(out_col, local + off_expr).drop("_pid")


def global_running_max(
    df: DataFrame,
    order_by: Sequence[Column],
    val_col: str,
    out_col: str = "max_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive global prefix MAX without a single-partition window
    (the running-max sibling of global_running_sum; the primitive
    behind sort-based skyline/dominance scans).  ``out_col`` = max of
    ``val_col`` over all rows strictly before this row in ``order_by``
    order, NULL for the first row.  Same two-phase shape: range
    partition, local exclusive running max, shift each slice by the
    max of all earlier slices (one collected row per slice).

    Callers must make ``order_by`` a total order for determinism.
    """
    part = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    # localCheckpoint BEFORE reading spark_partition_id — see
    # global_row_number: offsets must be measured on the layout read.
    part = part.withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        # eager=False (r13): the offsets collect right below is the
        # first consumer and its map side computes (and persists)
        # every partition — eager's count() was one extra full pass.
        # The layout-freeze guarantee is unchanged: no other consumer
        # exists before that collect materializes the checkpoint.
        eager=False
    )
    sums = part.groupBy("_pid").agg(F.max(val_col).alias("_m"))
    rows = sorted((r["_pid"], r["_m"]) for r in sums.collect())
    offsets: dict[int, object] = {}
    acc = None
    for pid, m in rows:
        offsets[pid] = acc
        if m is not None and (acc is None or m > acc):
            acc = m
    # NULL-safe slice offset via create_map + element_at, like the
    # sum/rank siblings — a when/otherwise chain one level deep per
    # partition risks Catalyst codegen/stack blowups at the
    # hundreds-of-partitions regime this operator exists for (ADVICE
    # r5).  None-valued entries (the first slice, or all-NULL earlier
    # slices) are simply OMITTED: element_at on a missing key returns
    # NULL, and F.greatest ignores NULLs.
    val_type = part.schema[val_col].dataType
    entries = [
        x
        for pid, v in offsets.items()
        if v is not None
        for x in (F.lit(pid), F.lit(v).cast(val_type))
    ]
    off_expr = (
        F.element_at(F.create_map(*entries), F.col("_pid"))
        if entries
        else F.lit(None).cast(val_type)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.max(val_col).over(w)
    return part.withColumn(
        out_col, F.greatest(local, off_expr)
    ).drop("_pid")
