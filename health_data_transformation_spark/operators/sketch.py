"""Sketch operators: Count-Min heavy-hitter counts and HLL distincts.

Sketches are the 100 TB answer to "how many / how often" questions that
do not need exact answers: a Count-Min sketch summarizes an arbitrarily
large key stream into a fixed (depth x width) grid of counters that is
mergeable across partitions (counter addition commutes), and
HyperLogLog summarizes distinct counts into KB-sized registers.  Both
build with one map-side-combinable aggregation — no state proportional
to the key cardinality ever crosses the shuffle.

The Count-Min implementation here is deliberately *relational*: the
sketch IS a DataFrame of (row, bucket, cnt) cells built by a single
groupBy, and probing IS a broadcast join + min().  That keeps the whole
thing JVM-side, lets Catalyst fuse it with surrounding plans, and —
because the hash family is the engine's portable md5-based one
(functions/text.py:hex_hash64) — makes every counter bit-for-bit
reproducible by the DuckDB differential oracle, so even the *estimates*
are oracle-gated, not just bounded.

Generalizes the reference's exact COUNT(*) dashboards
(/root/reference/Reporting.py:29-41,182-196) to cardinalities where
exact counting would itself be the bottleneck.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.text import hex_hash64, hex_hash64_sql


def _cms_salt(row: int) -> str:
    return f"cms{row}"


def count_min_build(
    df: DataFrame, key_col: str, width: int = 512, depth: int = 3
) -> DataFrame:
    """Build a Count-Min sketch over ``key_col`` as (row, bucket, cnt) cells.

    One explode (depth cells per input row) + one partial-aggregated
    groupBy: the shuffle carries at most depth*width counter partials
    per map task, independent of input size.  Returns at most
    depth*width rows.
    """
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(hex_hash64(key, _cms_salt(i)), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    width: int = 512,
    depth: int = 3,
) -> DataFrame:
    """Probe the sketch: estimate = min over rows of the key's counters.

    The sketch side is depth*width rows at most — a constant-size
    summary regardless of input scale — so it is always broadcastable:
    probing is a broadcast hash join with zero shuffle of the probe
    side, and the estimate for each key is a d-row min.  Count-Min
    guarantees estimate >= true count (counters only over-count on
    collision).
    """
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(hex_hash64(key, _cms_salt(i)), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    probe_cells = probes.select(
        F.col(key_col), F.explode(cells).alias("c")
    ).select(key_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


def count_min_cells_sql(source_sql: str, key_expr: str, width: int, depth: int) -> str:
    """DuckDB SQL reproducing count_min_build bit-for-bit."""
    parts = [
        f"""SELECT {i} AS row,
               {hex_hash64_sql(f"CAST({key_expr} AS VARCHAR)", _cms_salt(i))} % {width} AS bucket,
               count(*) AS cnt
        FROM ({source_sql}) GROUP BY 2"""
        for i in range(depth)
    ]
    return " UNION ALL ".join(parts)


def _bloom_salt(i: int) -> str:
    return f"bf{i}"


def bloom_build(
    df: DataFrame, key_col: str, n_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as (word, bits) rows.

    Relational form (same design rationale as the Count-Min cells): the
    filter IS a DataFrame of 32-bit words — ``word = pos div 32``,
    ``bits = OR of (1 << pos mod 32)`` — built by one explode (k
    positions per key) + one partial-aggregated bit_or groupBy.  The
    shuffle carries at most n_bits/32 word partials per map task,
    independent of input size; the result is at most n_bits/32 rows, so
    probing always broadcasts.  32-bit words inside BIGINT cells keep
    every shift positive, so Spark and DuckDB agree bit-for-bit (a
    1<<63 cell would hit engine-specific signed-overflow behavior).

    Membership is one-sided: probes of inserted keys are ALWAYS
    positive (no false negatives); non-members are positive with
    probability ~(1 - e^(-kn/m))^k.
    """
    key = F.col(key_col).cast("string")
    positions = F.array(
        *[
            F.pmod(hex_hash64(key, _bloom_salt(i)), F.lit(n_bits))
            for i in range(k)
        ]
    )
    return (
        df.select(F.explode(positions).alias("pos"))
        .select(
            F.floor(F.col("pos") / 32).cast("long").alias("word"),
            F.pmod(F.col("pos"), F.lit(32)).cast("int").alias("bit"),
        )
        .select("word", F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("bitval"))
        .groupBy("word")
        .agg(F.bit_or("bitval").alias("bits"))
    )


def bloom_probe(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    n_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Probe the filter: a key is a (possible) member iff all k of its
    bits are set.  Broadcast join of probe (word, bit) pairs against the
    constant-size word table; per key, member = min(bit set)."""
    key = F.col(key_col).cast("string")
    positions = F.array(
        *[
            F.pmod(hex_hash64(key, _bloom_salt(i)), F.lit(n_bits))
            for i in range(k)
        ]
    )
    probe_bits = (
        probes.select(F.col(key_col), F.explode(positions).alias("pos"))
        .select(
            key_col,
            F.floor(F.col("pos") / 32).cast("long").alias("word"),
            F.pmod(F.col("pos"), F.lit(32)).cast("int").alias("bit"),
        )
    )
    hit = F.when(
        F.expr("(bits >> bit) & 1") == 1, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        probe_bits.join(F.broadcast(sketch), "word", "left")
        .select(key_col, hit.alias("_hit"))
        .groupBy(key_col)
        .agg((F.min("_hit") == 1).alias("bloom_member"))
    )


def bloom_bits_sql(source_sql: str, key_expr: str, n_bits: int, k: int) -> str:
    """DuckDB SQL reproducing bloom_build bit-for-bit."""
    pos_selects = " UNION ALL ".join(
        f"SELECT {hex_hash64_sql(f'CAST({key_expr} AS VARCHAR)', _bloom_salt(i))}"
        f" % {n_bits} AS pos FROM ({source_sql})"
        for i in range(k)
    )
    return (
        f"SELECT CAST(floor(pos / 32) AS BIGINT) AS word, "
        f"bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits "
        f"FROM ({pos_selects}) GROUP BY 1"
    )


def bloom_probe_sql(
    bits_sql: str, probe_sql: str, key_expr: str, n_bits: int, k: int
) -> str:
    """DuckDB SQL reproducing bloom_probe: (key, bloom_member)."""
    pos_selects = " UNION ALL ".join(
        f"SELECT {key_expr} AS key, "
        f"{hex_hash64_sql(f'CAST({key_expr} AS VARCHAR)', _bloom_salt(i))}"
        f" % {n_bits} AS pos FROM ({probe_sql})"
        for i in range(k)
    )
    return (
        f"SELECT key, min(CASE WHEN (b.bits >> CAST(p.pos % 32 AS INTEGER))"
        f" & 1 = 1 THEN 1 ELSE 0 END) = 1 AS bloom_member "
        f"FROM ({pos_selects}) p LEFT JOIN ({bits_sql}) b "
        f"ON CAST(floor(p.pos / 32) AS BIGINT) = b.word GROUP BY key"
    )


def hll_distinct_bounded(
    df: DataFrame, key_col: str, group_col: str, rsd: float = 0.02, bound: float = 0.10
) -> DataFrame:
    """Exact distinct count per group plus a checked HLL error bound.

    HyperLogLog register values differ across engines, so the estimate
    itself is not oracle-portable; what IS portable is the accuracy
    contract.  Emits the exact count (oracle-matched) and a boolean
    that the HLL estimate landed within ``bound`` relative error —
    5-sigma wide for the requested rsd, so the gate is deterministic in
    practice while still failing loudly if the sketch ever breaks.
    """
    exact = F.count_distinct(F.col(key_col)).alias("exact_distinct")
    approx = F.approx_count_distinct(key_col, rsd)
    return df.groupBy(group_col).agg(
        exact,
        (
            F.abs(approx - F.count_distinct(F.col(key_col)))
            <= F.lit(bound) * F.count_distinct(F.col(key_col))
        ).alias("hll_within_bound"),
    )


def misra_gries_update(summary: dict, item, capacity: int) -> None:
    """One Misra-Gries step: bounded-state frequency summary update.

    Pure-Python core shared by the Spark partition pass and the
    property tests.  Invariant: len(summary) <= capacity, and after
    processing n items every true count c(x) satisfies
    summary.get(x, 0) >= c(x) - n / capacity.
    """
    if item in summary:
        summary[item] += 1
    elif len(summary) < capacity:
        summary[item] = 1
    else:
        dead = []
        for k in summary:
            summary[k] -= 1
            if summary[k] == 0:
                dead.append(k)
        for k in dead:
            del summary[k]


def misra_gries_summarize(items, capacity: int) -> dict:
    """Run Misra-Gries over an iterable; returns the bounded summary."""
    summary: dict = {}
    for it in items:
        misra_gries_update(summary, it, capacity)
    return summary


def heavy_hitters_exact(
    df: DataFrame, item_col: str, capacity: int
) -> DataFrame:
    """Exact heavy hitters (count * capacity > N) in two bounded passes.

    Pass 1 (sketch): each partition runs Misra-Gries with ``capacity``
    counters over its slice inside one Arrow-batched mapInPandas — the
    ONLY rows that leave the pass are the <= capacity surviving
    (item, est) pairs per partition, so no corpus-sized state ever
    shuffles and driver memory is O(partitions x capacity).
    Completeness: per-partition error <= n_p/capacity, so for any item
    with true count > N/capacity the per-partition estimates sum to a
    positive number — the item MUST survive in at least one partition
    summary.  The union of partition summaries is therefore a superset
    of the true heavy-hitter set (it can hold false positives, never
    false negatives).

    Pass 2 (verify): exact recount of the candidate set only — the
    candidate list is broadcast, the groupBy is map-side combined down
    to <= candidates per task, and the exact threshold
    ``cnt * capacity > N`` decides.  Output is EXACT and independent of
    partitioning/batch order (the order-dependent sketch only ever
    proposes candidates).

    At 100 TB this is the frequent-items answer when the key space is
    too large to aggregate exactly: bounded memory per executor,
    bounded shuffle, one broadcast.
    """
    import pandas as pd

    def sketch(batches):
        summary: dict = {}
        for pdf in batches:
            for item in pdf[item_col]:
                misra_gries_update(summary, item, capacity)
        yield pd.DataFrame(
            {item_col: list(summary.keys()), "est": list(summary.values())}
        )

    items_only = df.select(item_col)
    # derive the item field's type from the input schema so non-string
    # keys (e.g. long ids) round-trip the Arrow boundary without
    # silent coercion
    item_type = df.schema[item_col].dataType.simpleString()
    cands = (
        items_only.mapInPandas(
            sketch, schema=f"{item_col} {item_type}, est long"
        )
        .select(item_col)
        .distinct()
    )
    # Verify pass carries the exact N too (r7 re-execution audit: the
    # separate full-scan count was a third corpus pass).  LEFT join
    # against the broadcast candidate list, mask non-candidates into a
    # single NULL group: per-candidate counts AND the total (sum over
    # all groups, null group included) come from ONE aggregation.  N
    # is then an empty-partition window over the aggregate — NOT a
    # second aggregate branch: every branching variant tried (group-key
    # filter, agg-result flag filter) was de-canonicalized by filter
    # pushdown or column pruning and re-ran the verify scan.  The
    # window funnels only the BOUNDED per-key table (<= partitions x
    # capacity + 1 rows behind an aggregate barrier) through one task.
    tagged = items_only.join(
        F.broadcast(cands.select(F.col(item_col), F.lit(True).alias("_c"))),
        item_col,
        "left",
    )
    per_key = tagged.groupBy(
        F.when(F.col("_c"), F.col(item_col)).alias(item_col)
    ).agg(F.count("*").alias("cnt"), F.max("_c").alias("_cand"))
    wall = Window.partitionBy()
    return (
        per_key.withColumn("n_total", F.sum("cnt").over(wall))
        .filter(F.col("_cand"))
        .filter(F.col("cnt") * capacity > F.col("n_total"))
        .select(item_col, "cnt", "n_total")
    )
