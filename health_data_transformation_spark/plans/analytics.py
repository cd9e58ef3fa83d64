"""Driver-facing query registry: every operator family from SURVEY.md §2
expressed over the testdata tables, each paired with a DuckDB oracle.

Naming map to the reference dashboard (/root/reference/Reporting.py):
  q01/q02 <- display_weekly_records      (Reporting.py:29-41)
  q03/q04 <- display_bed_statistics      (Reporting.py:59-96)
  q05     <- display_quality_ratings     (Reporting.py:115-124)
  q06     <- display_total_bed_usage     (Reporting.py:144-156)
  q07     <- emergency_services_comparison (Reporting.py:182-196)
  q08a    <- bed_usage_by_ownership      (Reporting.py:213-221)
  q08b    <- top_and_bottom_rating       (Reporting.py:243-263)
  q1x-q2x <- loader operator families    (load_hhs.py / load_quality.py:
             dedup D1-D4, validation P9, cleaning P2-P8, set ops, windows)
  q3x-q4x <- LLM-pipeline extensions     (dedup, similarity search,
             text analysis, multimodal, streaming)

Determinism contract (drives every design choice here):
- double aggregations go through fixed-scale DECIMAL (functions.deterministic)
- computed doubles quantize via floor6, never round(x, 6): Spark's round
  rounds the double's shortest decimal rendering while DuckDB rounds the
  binary value, and they disagree on digit-7 ties (bit Spark 4.1 / DuckDB,
  observed on q48 at sf0.001); floor over x*1e6 uses only correctly-rounded
  IEEE ops, so identical inputs give identical outputs in any engine
- computed temporal columns are emitted as strings
- every LIMIT has a total-order tiebreak
- all hashes are md5-derived so DuckDB can recompute them
- integer result types are matched (Spark int vs DuckDB BIGINT casts)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.deterministic import (
    bucket_str_sql,
    day_str,
    day_str_sql,
    floor6,
    dec_avg,
    dec_avg_sql,
    dec_ratio,
    dec_ratio_sql,
    dec_sum,
    dec_sum_sql,
    week_str,
    week_str_sql,
)
from ..functions.text import (
    fingerprint,
    fingerprint_sql,
    hex_hash64_sql,
    normalize_text_sql,
)
from ..functions import text as T
from ..functions.vector import cosine_sql
from ..operators import dedup as D
from ..operators import sketch as SK
from ..operators import similarity as SIM
from ..operators import spatial as SP
from ..operators import topk as K
from ..sources.tables import load_events_range, load_table


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn, oracle, doc)
        return fn

    return deco


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def _ts_lit(df: DataFrame, col: str, value: str):
    """Literal timestamp matching the column's (ntz vs ltz) type."""
    return F.lit(value).cast(dict(df.dtypes)[col])


# ---------------------------------------------------------------------------
# reference dashboard analogues (SURVEY.md §2.4)
# ---------------------------------------------------------------------------

WEEK_LO, WEEK_HI = "2024-01-08", "2024-01-15"
EVENTS_CUTOFF = "2024-01-22"
EVENTS_CUM_CUTOFF = "2024-01-25"
SHIP_CUTOFF = "1998-09-02"
UPSERT_SPLIT = "1999-01-01"


@register(
    "q01_week_count",
    f"""SELECT count(*) AS n_records FROM events
        WHERE ts >= TIMESTAMP '{WEEK_LO}' AND ts < TIMESTAMP '{WEEK_HI}'""",
    "scalar COUNT(*) with week equality filter (Reporting.py:29-33)",
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    # range predicate applied to the raw INT64 nanos column so it pushes
    # into the parquet scan (row-group skipping) before the ts conversion
    ev = load_events_range(spark, sf, lo=WEEK_LO, hi=WEEK_HI)
    return ev.agg(F.count("*").alias("n_records"))


@register(
    "q02_weekly_counts",
    f"""SELECT {week_str_sql('ts')} AS week, count(*) AS n_records
        FROM events WHERE ts < TIMESTAMP '{EVENTS_CUTOFF}'
        GROUP BY 1 ORDER BY 1""",
    "filter < week, GROUP BY week, COUNT (Reporting.py:36-41)",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf, hi=EVENTS_CUTOFF)
    return (
        ev.groupBy(week_str("ts").alias("week"))
        .agg(F.count("*").alias("n_records"))
        .orderBy("week")
    )


@register(
    "q03_pricing_summary",
    f"""SELECT l_returnflag, l_linestatus,
               {dec_sum_sql('l_quantity', 2)} AS sum_qty,
               {dec_sum_sql('l_extendedprice', 2)} AS sum_base_price,
               {dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
               {dec_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
               {dec_avg_sql('l_quantity', 2)} AS avg_qty,
               {dec_avg_sql('l_extendedprice', 2)} AS avg_price,
               {dec_avg_sql('l_discount', 4)} AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF}'
        GROUP BY l_returnflag, l_linestatus""",
    "flagship scan+agg: the Q3 'bed statistics' shape generalized to "
    "TPC-H Q1 form (Reporting.py:59-67)",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= _ts_lit(li, "l_shipdate", SHIP_CUTOFF))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", 2).alias("sum_qty"),
            dec_sum("l_extendedprice", 2).alias("sum_base_price"),
            dec_sum(disc_price, 4).alias("sum_disc_price"),
            # scale 6: the 3-factor product has 6 exact decimals; a coarser
            # scale hits true halfway points where Spark (HALF_UP) and the
            # oracle (half-even) round differently
            dec_sum(charge, 6).alias("sum_charge"),
            dec_avg("l_quantity", 2).alias("avg_qty"),
            dec_avg("l_extendedprice", 2).alias("avg_price"),
            dec_avg("l_discount", 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q04_recent_weeks",
    f"""SELECT {week_str_sql('l_shipdate')} AS week,
               {dec_sum_sql('l_quantity', 2)} AS sum_qty,
               {dec_sum_sql('l_extendedprice', 2)} AS sum_price,
               count(*) AS n_lines
        FROM lineitem GROUP BY 1 ORDER BY week DESC LIMIT 4""",
    "groupBy week, agg, ORDER BY DESC LIMIT 4 top-k (Reporting.py:84-96)",
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    grouped = li.groupBy(week_str("l_shipdate").alias("week")).agg(
        dec_sum("l_quantity", 2).alias("sum_qty"),
        dec_sum("l_extendedprice", 2).alias("sum_price"),
        F.count("*").alias("n_lines"),
    )
    return K.top_k(grouped, [F.col("week").desc()], 4)


@register(
    "q05_priority_ratio",
    f"""SELECT o.o_orderpriority,
               {dec_ratio_sql('l.l_extendedprice * (1 - l.l_discount)', 'l.l_quantity', 4, 2)} AS util_ratio,
               count(*) AS n_lines
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority""",
    "equi join + groupBy + SUM/SUM ratio (Reporting.py:115-124)",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    joined = orders.join(li, orders.o_orderkey == li.l_orderkey)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("o_orderpriority").agg(
        dec_ratio(disc_price, F.col("l_quantity"), 4, 2).alias("util_ratio"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q06_cumulative_usage",
    f"""SELECT {week_str_sql('ts')} AS week,
               {dec_sum_sql('value', 2)} AS total_value,
               count(*) AS n_events
        FROM events WHERE ts <= TIMESTAMP '{EVENTS_CUM_CUTOFF}'
        GROUP BY 1 ORDER BY 1""",
    "filter <= week, groupBy week, sums (Reporting.py:144-156)",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf, hi=EVENTS_CUM_CUTOFF, hi_inclusive=True)
    return (
        ev.groupBy(week_str("ts").alias("week"))
        .agg(dec_sum("value", 2).alias("total_value"), F.count("*").alias("n_events"))
        .orderBy("week")
    )


@register(
    "q07_top_nations",
    """SELECT r.r_name, n.n_name, count(*) AS n_customers
       FROM customer c
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       WHERE c.c_acctbal > 0
       GROUP BY r.r_name, n.n_name
       ORDER BY n_customers DESC, n_name LIMIT 20""",
    "3-way dim join + boolean filter + groupBy count + top-20 "
    "(Reporting.py:182-196)",
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    joined = (
        c.filter(F.col("c_acctbal") > 0)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    grouped = joined.groupBy("r_name", "n_name").agg(F.count("*").alias("n_customers"))
    return K.top_k(grouped, [F.col("n_customers").desc(), F.col("n_name")], 20)


@register(
    "q08a_segment_week_ratio",
    f"""SELECT {week_str_sql('o.o_orderdate')} AS week,
               {dec_ratio_sql("CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice ELSE 0 END",
                              'o.o_totalprice', 2, 2)} AS fulfilled_ratio,
               count(*) AS n_orders
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY 1 ORDER BY 1""",
    "join + equality filter + 2-col groupBy + conditional sum ratio "
    "(Reporting.py:213-221)",
)
def q08a(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    joined = c.filter(F.col("c_mktsegment") == "BUILDING").join(
        o, c.c_custkey == o.o_custkey
    )
    fulfilled = F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(
        F.lit(0.0)
    )
    return (
        joined.groupBy(week_str("o_orderdate").alias("week"))
        .agg(
            dec_ratio(fulfilled, F.col("o_totalprice"), 2, 2).alias("fulfilled_ratio"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("week")
    )


@register(
    "q08b_top_bottom_nations",
    f"""WITH per_nation AS (
          SELECT n.n_name, {dec_avg_sql('c.c_acctbal', 2)} AS avg_bal
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY n.n_name)
        (SELECT n_name, avg_bal, 'top' AS side FROM per_nation
         ORDER BY avg_bal DESC, n_name LIMIT 10)
        UNION ALL
        (SELECT n_name, avg_bal, 'bottom' AS side FROM per_nation
         ORDER BY avg_bal ASC, n_name LIMIT 10)""",
    "join + groupBy avg + top-10 ∪ bottom-10 (Reporting.py:243-263, done "
    "fully engine-side instead of client-side pandas)",
)
def q08b(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    per_nation = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(dec_avg("c_acctbal", 2).alias("avg_bal"))
    )
    return K.top_and_bottom(per_nation, "avg_bal", "n_name", 10)


# ---------------------------------------------------------------------------
# loader operator families (SURVEY.md §2.1-2.3)
# ---------------------------------------------------------------------------


@register(
    "q10_dedup_exact",
    """SELECT md5(text) AS fingerprint, min(doc_id) AS keeper_id,
              count(*) AS n_copies
       FROM documents GROUP BY 1""",
    "exact-content dedup groups: hash-groupBy with deterministic keeper "
    "(generalizes load_hhs.py:8-32 dup probes)",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    return D.exact_content_groups(load_table(spark, sf, "documents"))


@register(
    "q11_anti_join",
    """SELECT c.c_custkey, c.c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_totalprice > 300000)""",
    "left-anti join: new-keys probe (D1/D4, load_hhs.py:75); filtered "
    "build side keeps the result non-empty/discriminating",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return D.anti_join_new(c, big, ["c_custkey"]).select("c_custkey", "c_name")


@register(
    "q12_semi_join",
    """SELECT c.c_custkey, c.c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""",
    "left-semi join: existing-keys probe (D3, load_quality.py:122-126)",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    existing = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return D.semi_join_existing(c, existing, ["c_custkey"]).select("c_custkey", "c_name")


@register(
    "q13_json_sentinel_clean",
    """SELECT event_type,
              sum(CASE WHEN k_clean IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_suppressed,
              CAST(SUM(k_clean) AS BIGINT) AS sum_k,
              (floor((CAST(SUM(k_clean) AS DOUBLE) / CAST(COUNT(k_clean) AS DOUBLE)) * 1000000.0) / 1000000.0) AS avg_k
       FROM (SELECT event_type,
                    NULLIF(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k_clean
             FROM events)
       GROUP BY event_type""",
    "semi-structured extract + sentinel->NULL (P3/P5, load_hhs.py:49, "
    "load_quality.py:103)",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    k_clean = F.when(k == 0, F.lit(None)).otherwise(k)
    return (
        ev.select("event_type", k_clean.alias("k_clean"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("k_clean").isNull(), 1).otherwise(0)).alias("n_suppressed"),
            F.sum("k_clean").alias("sum_k"),
            floor6(
                F.sum("k_clean").cast("double") / F.count("k_clean").cast("double")
            ).alias("avg_k"),
        )
    )


@register(
    "q14_validation_split",
    """SELECT CASE WHEN l_quantity >= 1 AND l_discount BETWEEN 0 AND 0.05
                     AND l_tax >= 0
              THEN 'valid' ELSE 'invalid' END AS status,
              count(*) AS n
       FROM lineitem GROUP BY 1""",
    "validation predicate split (P9, load_hhs.py:104-127 quarantine shape)",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    ok = (
        (F.col("l_quantity") >= 1)
        & F.col("l_discount").between(0, 0.05)
        & (F.col("l_tax") >= 0)
    )
    return (
        li.select(F.when(ok, "valid").otherwise("invalid").alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q15_orders_per_customer",
    f"""SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
               COALESCE({dec_sum_sql('o.o_totalprice', 2)}, 0.0) AS total_spent
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey""",
    "left outer join + null-skipping count + coalesce (outer-join family)",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    # aggregate-before-join: shuffle two narrow agg columns instead of the
    # full orders rows through the join; equivalent to the oracle's
    # join-then-group because o_custkey is the join key
    per_cust = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("o_orderkey").alias("n_orders"),
        dec_sum("o_totalprice", 2).alias("total_spent"),
    )
    return c.select("c_custkey").join(per_cust, "c_custkey", "left").select(
        "c_custkey",
        F.coalesce(F.col("n_orders"), F.lit(0).cast("long")).alias("n_orders"),
        F.coalesce(F.col("total_spent"), F.lit(0.0)).alias("total_spent"),
    )


@register(
    "q16_topk_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "global top-k -> TakeOrderedAndProject (Reporting.py:196 nlargest)",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return K.top_k(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        10,
    )


@register(
    "q17_top3_per_customer",
    """SELECT o_custkey, o_orderkey, CAST(rank AS INTEGER) AS rank FROM (
         SELECT o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rank
         FROM orders) WHERE rank <= 3""",
    "grouped top-k via rank window (the idiomatic form of "
    "Reporting.py:94's LIMIT-per-group need)",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return K.top_k_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
    ).select("o_custkey", "o_orderkey", "rank")


@register(
    "q18_running_user_totals",
    """SELECT user_id, event_id,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              AS running_value
       FROM events""",
    "running-total window (cumulative usage, Reporting.py:144-156 as a "
    "window instead of re-aggregation)",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
    return ev.select("user_id", "event_id", running.alias("running_value"))


@register(
    "q19_rollup_counts",
    f"""SELECT l_returnflag, l_linestatus, count(*) AS n,
               {dec_sum_sql('l_quantity', 2)} AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "hierarchical rollup aggregation (grouping-sets family)",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dec_sum("l_quantity", 2).alias("sum_qty")
    )


@register(
    "q20_distinct_per_segment",
    """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
              count(*) AS n_customers
       FROM customer GROUP BY c_mktsegment""",
    "distinct aggregation",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count("*").alias("n_customers"),
        )
    )


@register(
    "q21_intersect",
    """SELECT c_custkey FROM customer WHERE c_acctbal > 0
       INTERSECT
       SELECT o_custkey AS c_custkey FROM orders""",
    "INTERSECT set op",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return c.filter(F.col("c_acctbal") > 0).select("c_custkey").intersect(
        o.select(F.col("o_custkey").alias("c_custkey"))
    )


@register(
    "q22_except",
    """SELECT c_custkey FROM customer
       EXCEPT
       SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'""",
    "EXCEPT set op (set-based form of the D1 anti probe); filtered right "
    "side keeps the result non-empty/discriminating",
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    pending = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.select("c_custkey").exceptAll(pending).distinct()


@register(
    "q23_balance_buckets",
    f"""SELECT CAST(floor(c_acctbal / 1000) AS BIGINT) AS bucket,
               count(*) AS n, {dec_sum_sql('c_acctbal', 2)} AS total_bal
        FROM customer GROUP BY 1""",
    "numeric bucketing (CASE/floor family, P12 arithmetic exprs)",
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "customer")
        .groupBy(F.floor(F.col("c_acctbal") / 1000).alias("bucket"))
        .agg(F.count("*").alias("n"), dec_sum("c_acctbal", 2).alias("total_bal"))
    )


@register(
    "q24_normalize_strings",
    """SELECT lower(replace(c_mktsegment, ' ', '_')) AS segment_norm,
              CAST(sum(CASE WHEN CAST(regexp_replace(c_name, '[^0-9]', '', 'g') AS BIGINT)
                                 = c_custkey THEN 1 ELSE 0 END) AS BIGINT) AS n_id_match,
              count(*) AS n
       FROM customer GROUP BY 1""",
    "string normalization + regex extraction (P2/P13, load_quality.py:102)",
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    seg_norm = F.lower(F.regexp_replace("c_mktsegment", " ", "_"))
    extracted = F.regexp_replace("c_name", "[^0-9]", "").cast("long")
    return (
        c.select(
            seg_norm.alias("segment_norm"),
            F.when(extracted == F.col("c_custkey"), 1).otherwise(0).alias("m"),
        )
        .groupBy("segment_norm")
        .agg(F.sum("m").alias("n_id_match"), F.count("*").alias("n"))
    )


@register(
    "q25_date_parts",
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
              CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mo,
              count(*) AS n_orders
       FROM orders GROUP BY 1, 2""",
    "temporal part extraction (P7 date family)",
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "orders")
        .groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q26_union_append",
    """SELECT o_orderstatus, count(*) AS n FROM (
         SELECT o_orderstatus FROM orders WHERE o_orderstatus = 'O'
         UNION ALL
         SELECT o_orderstatus FROM orders WHERE o_orderstatus = 'F'
       ) GROUP BY 1""",
    "UNION ALL append semantics (S4 batched-append shape)",
)
def q26(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    u = o.filter(F.col("o_orderstatus") == "O").select("o_orderstatus").unionAll(
        o.filter(F.col("o_orderstatus") == "F").select("o_orderstatus")
    )
    return u.groupBy("o_orderstatus").agg(F.count("*").alias("n"))


@register(
    "q27_idempotent_upsert",
    f"""WITH existing AS (
          SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '{UPSERT_SPLIT}'),
        merged AS (
          SELECT * FROM existing
          UNION ALL
          SELECT * FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM existing e
                            WHERE e.o_orderkey = o.o_orderkey))
        SELECT o_orderstatus, count(*) AS n,
               {dec_sum_sql('o_totalprice', 2)} AS total
        FROM merged GROUP BY 1""",
    "first-wins idempotent upsert: target ∪ (batch anti target) == full "
    "set when re-delivered (D4, load_hhs.py:75-82 semantics)",
)
def q27(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    existing = o.filter(F.col("o_orderdate") < _ts_lit(o, "o_orderdate", UPSERT_SPLIT))
    merged = existing.unionAll(D.anti_join_new(o, existing, ["o_orderkey"]))
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), dec_sum("o_totalprice", 2).alias("total")
    )


@register(
    "q28_cube_counts",
    f"""SELECT l_returnflag, l_linestatus, count(*) AS n,
               {dec_sum_sql('l_quantity', 2)} AS sum_qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "CUBE aggregation (all grouping-set combinations)",
)
def q28(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dec_sum("l_quantity", 2).alias("sum_qty")
    )


@register(
    "q29_pivot",
    f"""SELECT l_returnflag,
               {dec_sum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 2)} AS F,
               {dec_sum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 2)} AS O
        FROM lineitem GROUP BY l_returnflag""",
    "pivot: long->wide reshaping (conditional-aggregation equivalent)",
)
def q29(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dec_sum("l_quantity", 2))
    )


@register(
    "q45_asof_join",
    """SELECT p.event_id, p.user_id, l.event_id AS login_event_id
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'login') l
         ON p.user_id = l.user_id AND p.ts >= l.ts""",
    "as-of join: each purchase matched to the user's most recent prior "
    "login (union+carry-forward plan: one shuffle, no range blowup)",
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    logins = ev.filter(F.col("event_type") == "login").select(
        "user_id", "ts", F.col("event_id").alias("login_event_id")
    )
    joined = asof_join(
        purchases, logins, ["user_id"], "ts", "ts", ["login_event_id"],
        tiebreak="event_id",
    )
    return joined.select("event_id", "user_id", "login_event_id")


@register(
    "q46_sessionize",
    """WITH flagged AS (
         SELECT user_id, ts, event_id,
                CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sessions AS (
         SELECT user_id, ts,
                CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER)
                  AS session_idx
         FROM flagged)
       SELECT user_id, session_idx, count(*) AS n_events,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
       FROM sessions GROUP BY user_id, session_idx""",
    "sessionization: per-user inactivity-gap sessions (30 min), batch "
    "twin of streaming session windows",
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sessions import session_bounds

    ev = load_table(spark, sf, "events")
    return session_bounds(ev, ["user_id"], "ts", 30, tiebreak="event_id")


@register(
    "q47_percentiles",
    """SELECT l_returnflag,
              (floor(quantile_cont(l_extendedprice, 0.25) * 1000000.0) / 1000000.0) AS p25,
              (floor(quantile_cont(l_extendedprice, 0.50) * 1000000.0) / 1000000.0) AS p50,
              (floor(quantile_cont(l_extendedprice, 0.90) * 1000000.0) / 1000000.0) AS p90
       FROM lineitem GROUP BY l_returnflag""",
    "exact interpolated percentiles per group",
)
def q47(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    pct = F.percentile("l_extendedprice", F.lit([0.25, 0.50, 0.90]))
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("p"))
        .select(
            "l_returnflag",
            floor6(F.element_at("p", 1)).alias("p25"),
            floor6(F.element_at("p", 2)).alias("p50"),
            floor6(F.element_at("p", 3)).alias("p90"),
        )
    )


@register(
    "q48_stats_moments",
    """SELECT l_returnflag, n,
              (floor((s1 / n) * 1000000.0) / 1000000.0) AS mean_price,
              (floor(((s2 - s1 * s1 / n) / (n - 1)) * 1000000.0) / 1000000.0) AS var_price,
              (floor(sqrt((s2 - s1 * s1 / n) / (n - 1)) * 1000000.0) / 1000000.0) AS std_price
       FROM (SELECT l_returnflag, count(*) AS n,
                    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
                    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS s2
             FROM lineitem GROUP BY l_returnflag)""",
    "sample variance/stddev from exact decimal moments — order-insensitive "
    "(native stddev_samp is partial-aggregation-order-dependent in floats)",
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    sum1 = F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
    sum2 = F.sum(
        (F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(24,4)")
    ).cast("double")
    n = F.count("*")
    var = (sum2 - sum1 * sum1 / n) / (n - F.lit(1))
    from ..functions.deterministic import floor6

    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        floor6(sum1 / n).alias("mean_price"),
        floor6(var).alias("var_price"),
        floor6(F.sqrt(var)).alias("std_price"),
    )


@register(
    "q49_salted_join",
    """SELECT l.l_returnflag, count(*) AS n,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                AS sum_price
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       GROUP BY l.l_returnflag""",
    "hot-key salted equi join (big x big, neither broadcastable): hot keys "
    "salted+replicated, cold keys joined plain; union equals the plain join",
)
def q49(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.skew import salted_join

    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    # any key set works for correctness; in production these come from a
    # pre-pass like `df.groupBy(key).count().orderBy(desc).limit(k)`
    hot = [1, 2, 3, 32, 33, 34, 35, 36, 37, 38, 39]
    joined = salted_join(li, orders, "l_orderkey", hot, buckets=8)
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dec_sum("l_extendedprice", 2).alias("sum_price"),
    )


@register(
    "q50_salted_agg",
    f"""SELECT l_returnflag, count(*) AS n,
               {dec_sum_sql('l_quantity', 2)} AS sum_qty,
               {dec_sum_sql('l_extendedprice', 2)} AS sum_price
        FROM lineitem GROUP BY l_returnflag""",
    "two-phase salted aggregation: groupBy(key, salt) partials re-combined "
    "by groupBy(key); equals the direct groupBy for decomposable aggs",
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.deterministic import dec
    from ..operators.skew import salted_aggregate

    li = load_table(spark, sf, "lineitem")
    # keep DECIMAL through BOTH phases (phase 2 re-sums partials; a double
    # partial would reintroduce order-dependence) — cast once at the end
    agged = salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "sum_qty": F.sum(dec("l_quantity", 2)),
            "sum_price": F.sum(dec("l_extendedprice", 2)),
        },
        buckets=16,
    )
    return agged.select(
        "l_returnflag",
        "n",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("double").alias("sum_price"),
    )


def _pair_budget_cap_cte(src: str, key: str, budget: int) -> str:
    """DuckDB CTE chain mirroring ``similarity.apply_pair_budget``:
    per-``key`` group sizes, per-SIZE pair totals, a running C(g,2)
    sum over sizes ascending, and the derived threshold (max size
    whose cumulative pair volume fits ``budget``; 0 when nothing
    fits).  Emits ``sized`` (key, gn) and ``thr`` (cap) CTE bodies —
    the caller joins them back to keep rows whose group fits."""
    return (
        f"sized AS (SELECT {key}, count(*) AS gn FROM {src} GROUP BY {key}),\n"
        "per_size AS (SELECT gn, count(*) AS nb FROM sized GROUP BY gn),\n"
        "cum AS (SELECT gn, SUM(nb * (gn * (gn - 1) // 2)) OVER (ORDER BY gn)\n"
        "          AS cumpairs FROM per_size),\n"
        f"thr AS (SELECT COALESCE(MAX(gn), 0) AS cap FROM cum\n"
        f"        WHERE cumpairs <= {budget}),\n"
    )


def _lsh_near_dup_oracle(min_jaccard: float, pair_budget: int | None = None) -> str:
    sig_exprs = ",\n".join(
        f"         list_min(list_transform(t, x -> {hex_hash64_sql('x', f'mh{i}')})) AS sig{i}"
        for i in range(8)
    )

    def band(b: int, lo: int) -> str:
        concat = " || ',' || ".join(f"CAST(sig{j} AS VARCHAR)" for j in range(lo, lo + 4))
        return f"  SELECT doc_id, md5('{b},' || {concat}) AS bucket FROM sigs\n"

    return (
        "WITH toks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS t\n"
        "              FROM documents),\n"
        f"sigs AS (SELECT doc_id,\n{sig_exprs}\n  FROM toks),\n"
        "bands AS (\n"
        + band(0, 0)
        + "  UNION ALL\n"
        + band(1, 4)
        + "),\n"
        + (
            _pair_budget_cap_cte("bands", "bucket", pair_budget)
            + "capped AS (SELECT b.doc_id, b.bucket FROM bands b\n"
            "           JOIN sized s USING (bucket) CROSS JOIN thr t\n"
            "           WHERE s.gn <= t.cap),\n"
            if pair_budget is not None
            else "capped AS (SELECT doc_id, bucket FROM (\n"
            "    SELECT doc_id, bucket, count(*) OVER (PARTITION BY bucket) AS bn\n"
            "    FROM bands) WHERE bn <= 50),\n"
        )
        + "cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b\n"
        "          FROM capped a JOIN capped b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),\n"
        "verified AS (\n"
        "  SELECT c.id_a, c.id_b,\n"
        "         (floor((CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE)\n"
        "               / CAST(len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t)) AS DOUBLE))\n"
        "               * 1000000.0) / 1000000.0) AS jaccard\n"
        "  FROM cands c JOIN toks ta ON c.id_a = ta.doc_id\n"
        "               JOIN toks tb ON c.id_b = tb.doc_id)\n"
        f"SELECT * FROM verified WHERE jaccard >= {min_jaccard}"
    )


@register(
    "q51_lsh_near_dup",
    _lsh_near_dup_oracle(0.4),
    "end-to-end MinHash-LSH near-dup: shingle -> minhash -> band -> "
    "bucket-size cap -> bucket-join candidates -> exact-Jaccard verify -> "
    "threshold (candidate-only verification; never a quadratic corpus pass)",
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    # max_bucket=50 is NOT production sizing: §8.10a measured absolute
    # caps going vacuous under corpus growth (every bucket outgrows a
    # constant at 2x).  50 is derived from the sf0.1 test corpus's
    # bucket-size tail (classes 1..~60 hold the real near-dups; the
    # >=234-row buckets are boilerplate) and kept here as the
    # absolute-cap exemplar beside q330's budget-derived form —
    # production callers size with pair_budget (q330, §8.10b).
    d = load_table(spark, sf, "documents")
    return D.lsh_near_dup_pairs(
        d, band_size=4, num_hashes=8, min_jaccard=0.4, max_bucket=50
    )


@register(
    "q330_lsh_near_dup_budget",
    _lsh_near_dup_oracle(0.4, pair_budget=2000),
    "q51's MinHash-LSH near-dup under the §8.10b budget-derived bucket "
    "cap: the bucket-size threshold is sized IN-PLAN from a total "
    "candidate-pair budget (running C(g,2) over the distinct-size "
    "frame, DECIMAL(38,0) total) instead of an absolute max_bucket "
    "that §8.10a measured going vacuous under corpus growth; the "
    "oracle mirrors the derivation, so the differential gates the "
    "threshold math itself — selective and non-vacuous at all three "
    "test SFs (bucket tails are heavy; e.g. sf0.1 derives cap 10, "
    "keeping the many small buckets and dropping the 2,257-row "
    "boilerplate bucket)",
)
def q330(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return D.lsh_near_dup_pairs(
        d, band_size=4, num_hashes=8, min_jaccard=0.4, pair_budget=2000
    )


@register(
    "q56_stateful_totals",
    """SELECT user_id, count(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS total_cents
       FROM events GROUP BY user_id""",
    "custom stateful streaming operator (applyInPandasWithState): "
    "per-user running totals in explicit keyed state; AvailableNow run "
    "equals the batch GROUP BY",
)
def q56(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.stateful import stateful_user_totals

    return stateful_user_totals(spark, sf)


@register(
    "q54_range_join",
    """WITH anchors AS (SELECT event_id AS anchor_id, user_id, ts
                        FROM events WHERE event_type = 'purchase'),
            priors AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
       SELECT a.anchor_id, a.user_id, count(p.user_id) AS n_prior
       FROM anchors a LEFT JOIN priors p
         ON p.user_id = a.user_id
        AND epoch_us(p.ts) >= epoch_us(a.ts) - 1800000000
        AND epoch_us(p.ts) <  epoch_us(a.ts)
       GROUP BY a.anchor_id, a.user_id""",
    "bucketed range join: per purchase, clicks by the same user in the "
    "preceding 30 min (right side bucketed once, left exploded to <=2 "
    "buckets -> plain equi join; no per-key cross product)",
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.rangejoin import prior_events_count

    ev = load_table(spark, sf, "events")
    return prior_events_count(ev, "purchase", "click", window_s=1800)


@register(
    "q55_grouping_sets",
    f"""SELECT l_returnflag, l_linestatus, count(*) AS n,
               {dec_sum_sql('l_quantity', 2)} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    "GROUPING SETS: three groupings in one pass over the scan "
    "(generalizes q19 rollup / q28 cube)",
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    li.createOrReplaceTempView("q55_lineitem")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
           FROM q55_lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""
    )


@register(
    "q53_multimodal_decode",
    """SELECT doc_id,
              CAST(54 + 92 * ((strlen(text) + 29) // 30) AS INTEGER) AS n_bytes,
              CAST((list_sum(list_transform(string_split(text, ''), x -> ord(x)))
                    * 1000000) // (30 * ((strlen(text) + 29) // 30)) AS DOUBLE)
                / 1000000 AS feature_mean,
              CAST(3 AS INTEGER) AS feature_dim
       FROM documents WHERE doc_id < 500 AND strlen(text) > 0""",
    "Arrow-batched mapInPandas media-decode over a REAL image column: "
    "the text bytes are packed into genuine 24-bpp BMP files (binary "
    "column; container headers, bottom-up rows, 4-byte stride padding "
    "— width 30 so the 90-byte rows pad to 92), then bmp_decode parses "
    "the container back and emits pixel features.  The oracle "
    "recomputes the file size from the BMP geometry (54 + 92*height) "
    "and the R-channel mean from the source bytes, so a single "
    "mis-parsed header field, flipped row order, or mis-strided row "
    "breaks the differential.  JPEG/PNG would drop into the same "
    "decode_fn slot (their entropy coders need a library this env "
    "lacks); the plumbing and the parse are the real thing",
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    from .. import multimodal as MM

    d = (
        load_table(spark, sf, "documents")
        .filter((F.col("doc_id") < 500) & (F.length("text") > 0))
    )
    return MM.decode_pipeline(
        MM.with_bmp_payload(d), decode_fn=MM.bmp_decode
    )


@register(
    "q57_regex_tokens",
    """SELECT lang,
              CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+'))) AS BIGINT)
                AS sum_pretokens,
              CAST(sum(len(list_filter(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+'),
                                       x -> regexp_matches(x, '^[0-9]+$')))) AS BIGINT)
                AS sum_digit_runs,
              count(*) AS n_docs
       FROM documents GROUP BY lang""",
    "BPE-style regex pre-tokenization (letter/digit/punct runs): the "
    "first stage of GPT-2/tiktoken tokenizers, JVM-side regex",
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    toks = T.regex_tokens("text")
    digit_runs = F.filter(toks, lambda x: x.rlike("^[0-9]+$"))
    return d.groupBy("lang").agg(
        F.sum(F.size(toks)).alias("sum_pretokens"),
        F.sum(F.size(digit_runs)).alias("sum_digit_runs"),
        F.count("*").alias("n_docs"),
    )


@register(
    "q58_frame_sample",
    """SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
              md5(substr(text, CAST(i AS INTEGER) * 16 + 1, 16)) AS frame_md5
       FROM documents
       CROSS JOIN UNNEST(range(0, CAST(ceil(strlen(text) / 16.0) AS BIGINT), 4)) AS t(i)
       WHERE doc_id < 200 AND strlen(text) > 0""",
    "multimodal frame sampling: payload -> every 4th 16-byte frame's "
    "fingerprint via mapInPandas (keyframe-extraction plumbing; real "
    "video decode drops into the same slot)",
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    from .. import multimodal as MM

    d = (
        load_table(spark, sf, "documents")
        .filter((F.col("doc_id") < 200) & (F.length("text") > 0))
    )
    return MM.frame_sample(MM.with_payload(d), frame_bytes=16, stride=4)


@register(
    "q62_stream_session_windows",
    """WITH flagged AS (
         SELECT user_id, ts, event_id,
                CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 900000000
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sessions AS (
         SELECT user_id, ts,
                SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sidx
         FROM flagged)
       SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              count(*) AS n_events
       FROM sessions GROUP BY user_id, sidx""",
    "built-in session_window on a stream (AvailableNow): dynamic "
    "event-time windows merging within a 15-min gap; equals the batch "
    "gap-sessionization (state = one interval per open session per key)",
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.windows import stream_session_windows

    return stream_session_windows(spark, sf, gap_minutes=15)


@register(
    "q63_hash_split",
    f"""SELECT split, count(*) AS n_docs,
               CAST(min(doc_id) AS BIGINT) AS min_doc,
               CAST(max(doc_id) AS BIGINT) AS max_doc
        FROM (SELECT doc_id,
                     CASE WHEN {hex_hash64_sql('CAST(doc_id AS VARCHAR)')} % 1000 < 800 THEN 'train'
                          WHEN {hex_hash64_sql('CAST(doc_id AS VARCHAR)')} % 1000 < 900 THEN 'valid'
                          ELSE 'test' END AS split
              FROM documents)
        GROUP BY split""",
    "deterministic content-hash train/valid/test split: "
    "layout/seed-independent (same doc -> same split across reruns, "
    "engines, cluster sizes), no shuffle",
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sampling import assign_split

    d = load_table(spark, sf, "documents")
    return (
        assign_split(d, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@register(
    "q64_profile",
    """SELECT 'lang' AS column, count(*) AS n_rows,
              count(*) - count(lang) AS n_null,
              count(DISTINCT lang) AS n_distinct FROM documents
       UNION ALL
       SELECT 'source', count(*), count(*) - count(source),
              count(DISTINCT source) FROM documents
       UNION ALL
       SELECT 'n_chars', count(*), count(*) - count(n_chars),
              count(DISTINCT n_chars) FROM documents""",
    "single-pass column profiler: rows/nulls/distincts per column in one "
    "scan (Expand-planned multi-distinct), unpivoted to rows",
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profile import profile_columns

    d = load_table(spark, sf, "documents")
    return profile_columns(d, ["lang", "source", "n_chars"])


@register(
    "q65_token_chunks",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                     FROM documents WHERE doc_id < 300),
            ex AS (SELECT doc_id, t, CAST(off AS INTEGER) AS off
                   FROM toks CROSS JOIN
                        UNNEST(range(0, CAST(greatest(len(t) - 1, 0) AS BIGINT) + 1, 16))
                          AS u(off))
       SELECT doc_id, CAST(off / 16 AS INTEGER) AS chunk_idx,
              CAST(len(list_slice(t, off + 1, least(off + 32, len(t)))) AS INTEGER)
                AS n_tokens,
              md5(array_to_string(list_slice(t, off + 1, least(off + 32, len(t))), ' '))
                AS chunk_hash
       FROM ex""",
    "context-window chunking: overlapping 32-token windows, stride 16 "
    "(JVM-side sequence+explode+slice — no Python in the hot path)",
)
def q65(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 300)
    toks = T.tokens("text")
    offsets = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(16)
    )
    ex = d.select(
        "doc_id", toks.alias("t"), F.explode(offsets).alias("off")
    )
    chunk = F.slice("t", F.col("off") + 1, F.lit(32))
    return ex.select(
        "doc_id",
        (F.col("off") / 16).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


@register(
    "q66_pack_bins",
    """WITH sized AS (
         SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok
         FROM documents),
       packed AS (
         SELECT lang, doc_id, n_tok,
                CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            - n_tok) / 2048.0) AS BIGINT) AS bin_id
         FROM sized)
       SELECT lang, bin_id, count(*) AS n_docs,
              CAST(sum(n_tok) AS BIGINT) AS total_tokens
       FROM packed GROUP BY lang, bin_id""",
    "context-window packing: docs binned to ~2048-token bins per lang "
    "via exclusive prefix sum (deterministic; one shuffle on lang)",
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    sized = d.select(
        "lang", "doc_id", F.size(T.tokens("text")).alias("n_tok")
    )
    # per-language EXCLUSIVE prefix sum via the two-phase
    # grouped_running_sum (operators/topk.py): lang has 5 values at
    # any corpus size, so the plain PARTITION BY lang running window
    # hands the whole corpus to 5 reducers — the q271 window class,
    # found by the r5 registry-wide audit sweep
    packed = K.grouped_running_sum(
        sized, "lang", [F.asc("doc_id")], "n_tok", out_col="_cum"
    ).withColumn(
        "bin_id", F.floor(F.col("_cum") / 2048.0).cast("long")
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    )


@register(
    "q67_corr_moments",
    """SELECT l_returnflag, n,
              (floor(((n * sxy - sx * sy)
                    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))) * 1000000.0) / 1000000.0) AS corr
       FROM (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
                    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS sxx,
                    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS syy,
                    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sxy
             FROM lineitem GROUP BY l_returnflag)""",
    "Pearson correlation from exact decimal moments (order-insensitive, "
    "unlike native corr() over shuffled doubles); n emitted for audit",
)
def q67(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")
    agged = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(qty.cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum(price.cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum((qty * qty).cast("decimal(24,4)")).cast("double").alias("sxx"),
        F.sum((price * price).cast("decimal(24,4)")).cast("double").alias("syy"),
        F.sum((qty * price).cast("decimal(24,4)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agged.select("l_returnflag", "n", floor6(corr).alias("corr"))


@register(
    "q68_ntile_buckets",
    """SELECT q, count(*) AS n,
              CAST(min(c_acctbal) AS DOUBLE) AS lo,
              CAST(max(c_acctbal) AS DOUBLE) AS hi
       FROM (SELECT c_acctbal,
                    ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS q
             FROM customer)
       GROUP BY q""",
    "ntile decile bucketing (total-order window, tiebroken for "
    "determinism) + per-bucket bounds",
)
def q68(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    # ntile(10) OVER (ORDER BY ...) funnels the whole table through one
    # task (the q271 window class, caught by the registry-wide audit
    # sweep in r5).  Scalable twin: two-phase global rank
    # (operators/topk.global_row_number — range partition + per-slice
    # rank + tiny offset map), then ntile's EXACT assignment in closed
    # form: the first (n % k) buckets hold ceil(n/k) rows, the rest
    # floor(n/k) — bit-identical to the window function for every n.
    ranked = K.global_row_number(
        c.select("c_acctbal", "c_custkey"),
        [F.asc("c_acctbal"), F.asc("c_custkey")],
    )
    tot = ranked.agg(F.count("*").alias("nn"))
    k = 10
    bucket = F.expr(
        f"CASE WHEN rn <= (nn % {k}) * (nn div {k} + 1)"
        f" THEN (rn - 1) div (nn div {k} + 1) + 1"
        f" ELSE (nn % {k})"
        f"  + (rn - (nn % {k}) * (nn div {k} + 1) - 1) div (nn div {k})"
        f"  + 1 END"
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select("c_acctbal", bucket.cast("long").alias("q"))
        .groupBy("q")
        .agg(
            F.count("*").alias("n"),
            F.min("c_acctbal").cast("double").alias("lo"),
            F.max("c_acctbal").cast("double").alias("hi"),
        )
    )


@register(
    "q69_levenshtein_pairs",
    """WITH names AS (SELECT c_custkey, c_name, c_nationkey
                      FROM customer WHERE c_custkey < 200)
       SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
              CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
       FROM names a JOIN names b
         ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
       WHERE levenshtein(a.c_name, b.c_name) <= 3""",
    "edit-distance entity resolution: near-identical names within a "
    "blocking key (the D1 dup-probe generalized to fuzzy matching; at "
    "scale the block is an LSH bucket)",
)
def q69(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_custkey") < 200)
        .select("c_custkey", "c_name", "c_nationkey")
    )
    a = c.select(
        F.col("c_nationkey"),
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
    )
    b = c.select(
        F.col("c_nationkey"),
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
    )
    joined = a.join(b, "c_nationkey").filter(F.col("id_a") < F.col("id_b"))
    dist = F.levenshtein("name_a", "name_b")
    return joined.select("id_a", "id_b", dist.alias("dist")).filter(
        F.col("dist") <= 3
    )


@register(
    "q70_sorted_collect",
    """SELECT c_mktsegment,
              array_to_string(list_sort(list_distinct(list(c_nationkey))), ',')
                AS nations
       FROM customer GROUP BY c_mktsegment""",
    "deterministic array aggregation: distinct+sorted collect per group "
    "(plain collect_list order is partition-dependent; sort makes it "
    "engine-stable), serialized for the value-hash comparator",
)
def q70(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("c_nationkey"))).alias(
            "nations"
        )
    )


@register(
    "q71_snapshot_diff",
    f"""WITH old AS (SELECT user_id, count(*) AS n FROM events
                     WHERE ts < TIMESTAMP '{EVENTS_CUTOFF}' GROUP BY user_id),
            new AS (SELECT user_id, count(*) AS n FROM events
                     WHERE ts < TIMESTAMP '{EVENTS_CUM_CUTOFF}' GROUP BY user_id)
       SELECT COALESCE(old.user_id, new.user_id) AS user_id,
              CASE WHEN old.user_id IS NULL THEN 'inserted'
                   WHEN new.user_id IS NULL THEN 'deleted'
                   WHEN old.n IS DISTINCT FROM new.n THEN 'changed'
              END AS change_type
       FROM old FULL OUTER JOIN new ON old.user_id = new.user_id
       WHERE CASE WHEN old.user_id IS NULL THEN 'inserted'
                  WHEN new.user_id IS NULL THEN 'deleted'
                  WHEN old.n IS DISTINCT FROM new.n THEN 'changed'
             END IS NOT NULL""",
    "CDC between snapshots: per-user activity at two cutoffs diffed into "
    "inserted/deleted/changed (one full-outer join, null-safe compare)",
)
def q71(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.scd import snapshot_diff

    old = (
        load_events_range(spark, sf, hi=EVENTS_CUTOFF)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    new = (
        load_events_range(spark, sf, hi=EVENTS_CUM_CUTOFF)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    return snapshot_diff(old, new, ["user_id"], ["n"])


@register(
    "q72_top_customer_share",
    f"""WITH rev AS (
         SELECT c.c_nationkey, o.o_custkey,
                {dec_sum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_nationkey, o.o_custkey),
       ranked AS (
         SELECT c_nationkey, o_custkey, revenue,
                row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY revenue DESC, o_custkey) AS rk,
                CAST(SUM(CAST(revenue AS DECIMAL(18,4)))
                     OVER (PARTITION BY c_nationkey) AS DOUBLE) AS nation_rev
         FROM rev)
       SELECT c_nationkey, o_custkey AS top_custkey,
              ROUND(revenue, 2) AS revenue,
              (floor((revenue / nation_rev) * 1000000.0) / 1000000.0) AS share
       FROM ranked WHERE rk = 1""",
    "composite plan: 3-way join -> grouped agg -> dual window "
    "(rank + partition total) -> filter; per-nation top customer and "
    "revenue share in two shuffles past the joins",
)
def q72(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
    )
    w_rank = Window.partitionBy("c_nationkey").orderBy(
        F.col("revenue").desc(), "o_custkey"
    )
    w_total = Window.partitionBy("c_nationkey")
    return (
        rev.withColumn("rk", F.row_number().over(w_rank))
        .withColumn(
            "nation_rev",
            F.sum(F.col("revenue").cast("decimal(18,4)"))
            .over(w_total)
            .cast("double"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "c_nationkey",
            F.col("o_custkey").alias("top_custkey"),
            F.round("revenue", 2).alias("revenue"),
            floor6(F.col("revenue") / F.col("nation_rev")).alias("share"),
        )
    )


def _q73_oracle() -> str:
    cos = "(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
    ec = cos.format(a="e.v", b="c.c")
    cq = cos.format(a="c.c", b="q.qv")
    aq = cos.format(a="a.v", b="q.qv")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         cents AS (SELECT vec_id AS cell, v AS c FROM e ORDER BY vec_id LIMIT 16),
         assigned AS (
           SELECT vec_id, v, cell FROM (
             SELECT e.vec_id, e.v, c.cell,
                    row_number() OVER (PARTITION BY e.vec_id
                                       ORDER BY {ec} DESC, c.cell ASC) AS rk
             FROM e CROSS JOIN cents c) WHERE rk = 1),
         q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         probes AS (SELECT c.cell FROM cents c CROSS JOIN q
                    ORDER BY {cq} DESC, c.cell ASC LIMIT 4)
    SELECT a.vec_id, (floor(({aq}) * 1000000.0) / 1000000.0) AS sim
    FROM assigned a JOIN probes p ON a.cell = p.cell CROSS JOIN q
    ORDER BY sim DESC, a.vec_id LIMIT 10"""


@register(
    "q73_ivf_built_search",
    _q73_oracle(),
    "full IVF pipeline: deterministic centroid seeds -> argmax cell "
    "assignment (one broadcast pass) -> 4-probe cell selection -> exact "
    "top-10 inside probed cells only (~1/4 of the table scanned)",
)
def q73(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.similarity import build_ivf_cells, ivf_search

    e = load_table(spark, sf, "embeddings")
    query = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    assigned, cents = build_ivf_cells(e, n_cells=16)
    return ivf_search(assigned, cents, query, k=10, n_probes=4)


@register(
    "q74_tfidf_top_terms",
    """WITH corpus AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents WHERE doc_id < 200),
            n_docs AS (SELECT count(*) AS n FROM corpus),
            tf AS (SELECT doc_id, tok, count(*) AS tf
                   FROM corpus CROSS JOIN UNNEST(toks) AS u(tok)
                   GROUP BY doc_id, tok),
            df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
            scored AS (
              SELECT tf.doc_id, tf.tok,
                     ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
              FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n_docs n),
            ranked AS (
              SELECT doc_id, tok, tfidf,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY tfidf DESC, tok ASC) AS rk
              FROM scored)
       SELECT doc_id, tok, tfidf, CAST(rk AS INTEGER) AS rk
       FROM ranked WHERE rk <= 3""",
    "TF-IDF top terms per document: explode -> tf -> document frequency "
    "-> join -> per-doc top-3 (two shuffles: one on (doc,tok), one on tok)",
)
def q74(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    corpus = d.select("doc_id", T.tokens("text").alias("toks"))
    # corpus size as a broadcast 1-row aggregate, not a driver-side
    # .count() literal: one Spark job instead of two, no driver
    # round-trip (same idiom as q93/q161/q166).
    n_docs = corpus.agg(F.count("*").cast("double").alias("_n_docs"))
    tf = (
        corpus.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("_n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "tok", "tfidf", "rk")
    )


@register(
    "q75_range_frame_moving_sum",
    """SELECT o_custkey, o_orderkey,
              strftime(o_orderdate, '%Y-%m-%d') AS order_date,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                     PARTITION BY o_custkey
                     ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                     RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
                   ) AS DOUBLE) AS moving_30d_total
       FROM orders WHERE o_custkey < 300""",
    "RANGE-frame window (value-based, not row-based): per-customer "
    "30-day moving order total — peers at the same date always share a "
    "frame, so no tiebreak is needed for determinism",
)
def q75(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").filter(F.col("o_custkey") < 300)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-29, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("moving_30d_total"),
    )


def _q76_oracle(pair_budget: int | None = 2000) -> str:
    """Connected-components oracle over the LSH near-dup pair set.

    r10 migration (VERDICT r9 wrong #1): the pair stage defaults to the
    §8.10b budget-derived cap (pair_budget=2000, q330's constant —
    measured selective and non-vacuous at all three SFs) instead of the
    absolute max_bucket=50 that §8.10a measured going vacuous under
    corpus growth; the oracle mirrors the budget derivation, so every
    consumer differentially gates the threshold math."""
    return f"""
    WITH pairs AS (SELECT id_a, id_b FROM ({_lsh_near_dup_oracle(0.4, pair_budget=pair_budget)}) t),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           WITH RECURSIVE r(node, label) AS (
             SELECT src, src FROM edges
             UNION
             SELECT e.dst, r.label FROM r JOIN edges e ON e.src = r.node)
           SELECT node, min(label) AS component FROM r GROUP BY node)
    SELECT node, component FROM reach"""


@register(
    "q76_dedup_clusters",
    _q76_oracle(),
    "dedup clusters: LSH near-dup pairs -> connected components "
    "(iterative min-label propagation; component id = the deterministic "
    "keeper, so A~B~C collapses to one canonical doc)",
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    pairs = D.lsh_near_dup_pairs(
        # pair_budget=2000 (r10, VERDICT r9 wrong #1): the §8.10b
        # budget-derived cap replaces the absolute max_bucket=50 that
        # §8.10a measured going vacuous under corpus growth; q330's
        # constant, measured selective at all three SFs
        d, band_size=4, num_hashes=8, min_jaccard=0.4, pair_budget=2000
    ).select("id_a", "id_b")
    return D.connected_components(pairs)


@register(
    "q77_deduped_corpus",
    f"""WITH reach AS ({_q76_oracle()}),
            drop_list AS (SELECT node FROM reach WHERE node != component)
        SELECT d.lang, count(*) AS n_docs,
               CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens
        FROM documents d LEFT JOIN drop_list x ON d.doc_id = x.node
        WHERE x.node IS NULL
        GROUP BY d.lang""",
    "the dedup pipeline applied end-to-end: corpus -> LSH pairs -> "
    "clusters -> drop non-keepers -> deduped corpus stats (the actual "
    "deliverable of a training-data dedup pass)",
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    pairs = D.lsh_near_dup_pairs(
        # pair_budget=2000 (r10, VERDICT r9 wrong #1): the §8.10b
        # budget-derived cap replaces the absolute max_bucket=50 that
        # §8.10a measured going vacuous under corpus growth; q330's
        # constant, measured selective at all three SFs
        d, band_size=4, num_hashes=8, min_jaccard=0.4, pair_budget=2000
    ).select("id_a", "id_b")
    components = D.connected_components(pairs)
    drop_list = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept = d.join(drop_list, "doc_id", "left_anti")
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(T.tokens("text"))).cast("long").alias("n_tokens"),
    )


@register(
    "q78_stream_stream_join",
    """SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
       FROM events p JOIN events c
         ON c.user_id = p.user_id AND c.event_type = 'click'
        AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
        AND epoch_us(c.ts) <  epoch_us(p.ts)
       WHERE p.event_type = 'purchase'""",
    "watermarked stream-stream interval join (purchases x prior clicks): "
    "the time bound + watermark let Spark evict join state, so state is "
    "O(window), not O(stream); equals the batch range join",
)
def q78(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.windows import stream_stream_join

    return stream_stream_join(spark, sf, window_s=1800)


def _q79_threshold_sql() -> str:
    return (
        "CASE lang WHEN 'en' THEN 200 WHEN 'de' THEN 500 "
        "WHEN 'fr' THEN 1000 ELSE 0 END"
    )


@register(
    "q79_stratified_sample",
    f"""SELECT lang, count(*) AS n_docs,
               CAST(min(doc_id) AS BIGINT) AS min_doc
        FROM (SELECT lang, doc_id FROM documents
              WHERE {hex_hash64_sql('CAST(doc_id AS VARCHAR)')} % 1000
                    < {_q79_threshold_sql()})
        GROUP BY lang""",
    "per-stratum quota sampling: downsample dominant languages, drop "
    "unlisted ones — deterministic by content hash (layout/seed-free)",
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sampling import stratified_hash_sample

    d = load_table(spark, sf, "documents")
    sampled = stratified_hash_sample(
        d, "doc_id", "lang", {"en": 0.2, "de": 0.5, "fr": 1.0}
    )
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc")
    )


@register(
    "q59_full_outer_join",
    """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
                  FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
            s AS (SELECT s_nationkey AS nk, count(*) AS n_supp
                  FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
       SELECT COALESCE(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
       FROM c FULL OUTER JOIN s ON c.nk = s.nk""",
    "full outer join with genuinely unmatched sides (high-balance "
    "customers vs suppliers per nation) — completes the join-type family",
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"), "n_cust", "n_supp"
    )


@register(
    "q60_lag_lead",
    """SELECT event_id, user_id,
              CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS BIGINT) AS us_since_prev,
              lead(event_type) OVER w AS next_type
       FROM events WHERE user_id < 20
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "lag/lead window functions: inter-event gaps and next-event type "
    "per user (one shuffle on the partition key)",
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("us_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q61_unpivot",
    f"""WITH agg AS (SELECT l_returnflag,
                            {dec_sum_sql('l_quantity', 2)} AS sum_qty,
                            {dec_sum_sql('l_extendedprice', 2)} AS sum_price
                     FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM agg
        UNION ALL
        SELECT l_returnflag, 'sum_price' AS metric, sum_price AS val FROM agg""",
    "unpivot/melt: wide aggregate columns -> (metric, value) rows "
    "(inverse of q29 pivot)",
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dec_sum("l_quantity", 2).alias("sum_qty"),
        dec_sum("l_extendedprice", 2).alias("sum_price"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price"],
        variableColumnName="metric",
        valueColumnName="val",
    )


# ---------------------------------------------------------------------------
# LLM-pipeline extensions: text analysis
# ---------------------------------------------------------------------------


@register(
    "q30_token_stats",
    """SELECT lang,
              CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
              CAST(max(len(list_distinct(string_split(text, ' ')))) AS INTEGER) AS max_unique,
              (floor((CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE)) * 1000000.0) / 1000000.0) AS avg_tokens,
              count(*) AS n_docs
       FROM documents GROUP BY lang""",
    "token counting over the documents table (whitespace tokenizer)",
)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    n_tok = T.token_count("text")
    return (
        d.select("lang", n_tok.alias("n_tok"), T.unique_token_count("text").alias("n_uni"))
        .groupBy("lang")
        .agg(
            F.sum("n_tok").alias("sum_tokens"),
            F.max("n_uni").alias("max_unique"),
            floor6(F.sum("n_tok").cast("double") / F.count("*").cast("double")).alias(
                "avg_tokens"
            ),
            F.count("*").alias("n_docs"),
        )
    )


@register(
    "q31_quality_scores",
    """SELECT doc_id,
              CAST(length(text) AS INTEGER) AS n_chars_m,
              CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
              (floor((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 1000000.0) / 1000000.0) AS uniq_ratio
       FROM documents WHERE doc_id < 100""",
    "per-document quality scoring (length / lexical-diversity signals)",
)
def q31(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    q = T.quality_columns("text")
    return d.select(
        "doc_id",
        q["n_chars_m"].alias("n_chars_m"),
        q["n_tokens"].alias("n_tokens"),
        q["uniq_ratio"].alias("uniq_ratio"),
    )


@register(
    "q32_langid_heuristic",
    """SELECT lang,
              CASE WHEN list_contains(string_split(text, ' '), 'the')
                     OR list_contains(string_split(text, ' '), 'a')
                   THEN 'en' ELSE 'other' END AS predicted,
              count(*) AS n
       FROM documents GROUP BY 1, 2""",
    "language-ID heuristic (marker-token n-gram scoring)",
)
def q32(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    toks = T.tokens("text")
    predicted = F.when(
        F.array_contains(toks, "the") | F.array_contains(toks, "a"), "en"
    ).otherwise("other")
    return d.groupBy("lang", predicted.alias("predicted")).agg(
        F.count("*").alias("n")
    )


@register(
    "q33_normalized_fingerprint",
    f"""SELECT {fingerprint_sql('text')} AS fingerprint,
               min(doc_id) AS keeper_id, count(*) AS n_copies
        FROM documents GROUP BY 1""",
    "document fingerprinting on normalized text (near-dup canonical form)",
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return (
        d.select(fingerprint("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


@register(
    "q34_jaccard_pairs",
    """WITH toks AS (
         SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS t
         FROM documents WHERE doc_id < 100)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              (floor((CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                    / CAST(len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)) AS DOUBLE))
                    * 1000000.0) / 1000000.0) AS jaccard
       FROM toks a JOIN toks b
         ON a.source = b.source AND a.doc_id < b.doc_id""",
    "n-gram/token Jaccard near-dup pairs within a blocking key "
    "(exact verification stage of the dedup pipeline)",
)
def q34(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return D.jaccard_pairs(d, block_col="source").select("id_a", "id_b", "jaccard")


@register(
    "q35_minhash_signatures",
    "WITH toks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS t\n"
    "              FROM documents WHERE doc_id < 100)\n"
    "SELECT doc_id,\n"
    + ",\n".join(
        f"       list_min(list_transform(t, x -> {hex_hash64_sql('x', f'mh{i}')})) AS sig{i}"
        for i in range(4)
    )
    + "\nFROM toks",
    "MinHash signatures (md5 hash family, portable across engines)",
)
def q35(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return D.minhash_signatures(d, num_hashes=4)


@register(
    "q36_lsh_buckets",
    "WITH sigs AS (\n"
    "  SELECT doc_id,\n"
    + ",\n".join(
        f"         list_min(list_transform(list_distinct(string_split(text, ' ')),"
        f" x -> {hex_hash64_sql('x', f'mh{i}')})) AS sig{i}"
        for i in range(4)
    )
    + "\n  FROM documents),\n"
    "bands AS (\n"
    "  SELECT doc_id, 0 AS band, md5(CAST(sig0 AS VARCHAR) || ',' || CAST(sig1 AS VARCHAR)) AS bucket FROM sigs\n"
    "  UNION ALL\n"
    "  SELECT doc_id, 1 AS band, md5(CAST(sig2 AS VARCHAR) || ',' || CAST(sig3 AS VARCHAR)) AS bucket FROM sigs)\n"
    "SELECT band, bucket, count(*) AS n_docs, min(doc_id) AS min_doc,\n"
    "       max(doc_id) AS max_doc\n"
    "FROM bands GROUP BY band, bucket HAVING count(*) >= 2",
    "MinHash-LSH banding: shingle->minhash->band->bucket candidate groups",
)
def q36(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    sigs = D.minhash_signatures(d, num_hashes=4)
    return D.lsh_band_buckets(sigs, band_size=2, num_hashes=4)


SIMHASH_BITS = 16


def _simhash_oracle() -> str:
    h = hex_hash64_sql("tok")
    votes = ",\n".join(
        f"       CAST(SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v{j}"
        for j in range(SIMHASH_BITS)
    )
    packed = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return (
        "WITH tok_rows AS (\n"
        "  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok\n"
        "  FROM documents WHERE doc_id < 100),\n"
        f"hashed AS (SELECT doc_id, {h} AS h FROM tok_rows),\n"
        f"voted AS (SELECT doc_id,\n{votes}\n  FROM hashed GROUP BY doc_id)\n"
        f"SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM voted"
    )


@register(
    "q37_simhash",
    _simhash_oracle(),
    "SimHash signatures: per-bit majority vote over token hashes",
)
def q37(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return D.simhash(d, bits=SIMHASH_BITS)


def _simhash_pairs_oracle(max_hamming: int) -> str:
    base = _simhash_oracle()  # doc_id, simhash for doc_id < 100
    return (
        f"WITH sim AS ({base})\n"
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b,\n"
        "       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming\n"
        "FROM sim a JOIN sim b ON a.doc_id < b.doc_id\n"
        f"WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"
    )


@register(
    "q52_simhash_near_pairs",
    _simhash_pairs_oracle(3),
    "SimHash near-dup pairs within Hamming radius 3 of the 16-bit "
    "signature — a DEMO bounded to 100 docs whose all-pairs scan is "
    "deliberate and never the production path; the scale path is "
    "q162's banded 32-bit SimHash (pigeonhole buckets, no pair scan)",
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    sim = D.simhash(d, bits=16)
    return D.simhash_near_pairs(sim, max_hamming=3)


# ---------------------------------------------------------------------------
# LLM-pipeline extensions: similarity search over embeddings
# ---------------------------------------------------------------------------


@register(
    "q38_cosine_topk",
    f"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
                  WHERE vec_id = 0)
        SELECT e.vec_id, (floor(({cosine_sql('e.embedding', 'q.qv')}) * 1000000.0) / 1000000.0) AS sim
        FROM embeddings e CROSS JOIN q
        ORDER BY sim DESC, e.vec_id LIMIT 10""",
    "brute-force cosine top-k ANN baseline (broadcast query vector; "
    "no shuffle of the embedding table)",
)
def q38(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    query = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return SIM.brute_force_top_k(e, query, k=10)


@register(
    "q39_embedding_norms",
    f"""SELECT label,
               CAST(SUM(CAST(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                   CAST(embedding AS DOUBLE[])))
                             AS DECIMAL(18,6))) AS DOUBLE) AS sum_norm,
               count(*) AS n
        FROM embeddings GROUP BY label""",
    "vector-norm aggregation per class (JVM-side higher-order functions)",
)
def q39(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vector import norm

    e = load_table(spark, sf, "embeddings")
    return (
        e.select("label", norm("embedding").alias("nrm"))
        .groupBy("label")
        .agg(dec_sum("nrm", 6).alias("sum_norm"), F.count("*").alias("n"))
    )


@register(
    "q40_ivf_topk",
    f"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
                  WHERE vec_id = 0),
        scored AS (
          SELECT e.label, e.vec_id,
                 (floor(({cosine_sql('e.embedding', 'q.qv')}) * 1000000.0) / 1000000.0) AS sim
          FROM embeddings e CROSS JOIN q),
        ranked AS (
          SELECT label, vec_id, sim,
                 row_number() OVER (PARTITION BY label
                                    ORDER BY sim DESC, vec_id) AS rank
          FROM scored)
        SELECT label, vec_id, sim, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 3""",
    "IVF-shaped ANN: per-cell top-k (cell filter = partition pruning at "
    "scale)",
)
def q40(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    query = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return SIM.ivf_top_k(e, query, k=3).select("label", "vec_id", "sim", "rank")


@register(
    "q43_embedding_near_dup",
    f"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               (floor(({cosine_sql('a.embedding', 'b.embedding')}) * 1000000.0) / 1000000.0) AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE (floor(({cosine_sql('a.embedding', 'b.embedding')}) * 1000000.0) / 1000000.0) >= 0.3""",
    "embedding-cosine near-dup pairs within a blocking cell (the dedup "
    "use of similarity; blocked to avoid all-pairs)",
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    # uncapped on purpose: the 10 label blocks are ~sf-bounded in the
    # test corpus, so this entry is the exact blocked-quadratic
    # baseline; the budget-capped production form is q329 (§8.10b)
    e = load_table(spark, sf, "embeddings")
    return D.embedding_near_dup_pairs(e, block_col="label", min_cosine=0.3)


@register(
    "q329_embedding_near_dup_budget",
    f"""WITH {_pair_budget_cap_cte("embeddings", "label", 20000)}
        kept AS (SELECT e.* FROM embeddings e
                 JOIN sized s USING (label) CROSS JOIN thr t
                 WHERE s.gn <= t.cap)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               (floor(({cosine_sql('a.embedding', 'b.embedding')}) * 1000000.0) / 1000000.0) AS cos_sim
        FROM kept a JOIN kept b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE (floor(({cosine_sql('a.embedding', 'b.embedding')}) * 1000000.0) / 1000000.0) >= 0.3""",
    "q43's blocked embedding near-dup under the §8.10b budget-derived "
    "block cap (apply_pair_budget): the block-size threshold is sized "
    "in-plan from a 20k total verify-pair budget instead of an "
    "absolute max_block that §8.10a measured going vacuous under "
    "corpus growth; the oracle mirrors the derivation (per-size "
    "running C(g,2), threshold = largest affordable size class), so "
    "the differential gates the threshold math — at sf0.01 the whole "
    "corpus fits (threshold >= max block, keep-all), at sf0.1 only "
    "the smallest label block fits (1/10 kept): both regimes "
    "non-vacuous, the 100 TB answer for blocks the budget cannot "
    "afford is the linear exact prepass, not the quadratic verifier",
)
def q329(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    return D.embedding_near_dup_pairs(
        e, block_col="label", min_cosine=0.3, pair_budget=20000
    )


@register(
    "q44_rolling_hash",
    f"""SELECT doc_id,
               list_reduce(
                 list_prepend(0, list_transform(string_split(text, ' '),
                                 x -> {hex_hash64_sql('x')} % 1000000007)),
                 (acc, x) -> (acc * 31 + x) % 1000000007) AS rhash
        FROM documents""",
    "polynomial rolling-hash document fingerprint (order-sensitive, "
    "unlike the set-based minhash)",
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import hex_hash64, tokens

    d = load_table(spark, sf, "documents")
    hashed = F.transform(tokens("text"), lambda t: hex_hash64(t) % 1000000007)
    rhash = F.aggregate(
        hashed, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % 1000000007
    )
    return d.select("doc_id", rhash.alias("rhash"))


# ---------------------------------------------------------------------------
# LLM-pipeline extensions: multimodal + streaming
# ---------------------------------------------------------------------------


@register(
    "q41_multimodal_meta",
    """SELECT doc_id,
              CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
              CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 640 AS width,
              CAST(('0x' || substr(md5(text), 5, 4)) AS INTEGER) % 480 AS height
       FROM documents""",
    "multimodal column plumbing: opaque binary payload + typed metadata "
    "(decode itself is stubbed; see multimodal.py)",
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    from ..multimodal import with_fake_media_meta

    d = load_table(spark, sf, "documents")
    return with_fake_media_meta(d).select("doc_id", "n_bytes", "width", "height")


@register(
    "q42_stream_window_counts",
    f"""SELECT {bucket_str_sql('ts', 15)} AS window_start,
               count(*) AS n_events,
               {dec_sum_sql('value', 2)} AS total_value
        FROM events GROUP BY 1""",
    "Structured Streaming: file source -> 15-min tumbling windows -> "
    "memory sink (Trigger.AvailableNow); oracle is the batch equivalent",
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.windows import stream_window_counts

    return stream_window_counts(spark, sf)


# ---------------------------------------------------------------------------
# sketches & quantization (fixed-size summaries for 100 TB-scale answers)
# ---------------------------------------------------------------------------

CMS_WIDTH, CMS_DEPTH = 512, 3


def _q80_oracle() -> str:
    from ..operators.sketch import count_min_cells_sql

    cells = count_min_cells_sql("SELECT o_custkey FROM orders", "o_custkey", CMS_WIDTH, CMS_DEPTH)
    probe_cells = " UNION ALL ".join(
        f"""SELECT o_custkey, {i} AS row,
                {hex_hash64_sql("CAST(o_custkey AS VARCHAR)", f"cms{i}")} % {CMS_WIDTH} AS bucket
         FROM probes"""
        for i in range(CMS_DEPTH)
    )
    return f"""WITH cells AS ({cells}),
        probes AS (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey < 50),
        pc AS ({probe_cells}),
        est AS (SELECT o_custkey, min(COALESCE(cnt, 0)) AS cms_estimate
                FROM pc LEFT JOIN cells USING (row, bucket) GROUP BY 1),
        exact AS (SELECT o_custkey, count(*) AS exact_cnt
                  FROM orders WHERE o_custkey < 50 GROUP BY 1)
        SELECT est.o_custkey, exact_cnt, cms_estimate
        FROM est JOIN exact USING (o_custkey)"""


@register(
    "q80_count_min_sketch",
    _q80_oracle(),
    "distributed Count-Min sketch build (one partial-aggregated groupBy "
    "into depth x width counter cells) + broadcast probe: heavy-hitter "
    "counts from a fixed-size summary; md5 hash family makes even the "
    "estimates bit-reproducible by the oracle",
)
def q80(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import sketch as SK

    orders = load_table(spark, sf, "orders")
    cms = SK.count_min_build(orders, "o_custkey", CMS_WIDTH, CMS_DEPTH)
    hot = orders.filter(F.col("o_custkey") < 50)
    probes = hot.select("o_custkey").distinct()
    est = SK.count_min_estimate(cms, probes, "o_custkey", CMS_WIDTH, CMS_DEPTH)
    exact = hot.groupBy("o_custkey").agg(F.count("*").alias("exact_cnt"))
    return est.join(exact, "o_custkey").select("o_custkey", "exact_cnt", "cms_estimate")


@register(
    "q81_hll_distinct",
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_distinct,
              TRUE AS hll_within_bound
       FROM orders GROUP BY 1""",
    "HyperLogLog distinct counts per group: the estimate itself is "
    "engine-specific, so the oracle gates the exact count plus the "
    "checked accuracy contract (rsd 2%, bound 10% = 5 sigma)",
)
def q81(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sketch import hll_distinct_bounded

    return hll_distinct_bounded(
        load_table(spark, sf, "orders"), "o_custkey", "o_orderpriority"
    )


def _q82_oracle() -> str:
    from ..functions.vector import int8_quantize_sql, int_dot_sql

    return f"""WITH q AS (SELECT {int8_quantize_sql('embedding')} AS qq
                  FROM embeddings WHERE vec_id = 0),
        qd AS (SELECT vec_id, {int8_quantize_sql('embedding')} AS qd FROM embeddings)
        SELECT qd.vec_id, {int_dot_sql('qd.qd', 'q.qq')} AS qdot
        FROM qd CROSS JOIN q
        ORDER BY qdot DESC, qd.vec_id LIMIT 10"""


@register(
    "q82_int8_cosine_topk",
    _q82_oracle(),
    "int8-quantized ANN scoring: symmetric floor-quantization (4x "
    "smaller vectors) + EXACT integer dot products, so the approximate "
    "scores are themselves bit-reproducible by the oracle",
)
def q82(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vector import int8_quantize, int_dot

    e = load_table(spark, sf, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(int8_quantize("embedding").alias("qq"))
    docs = e.select("vec_id", int8_quantize("embedding").alias("qd"))
    scored = docs.crossJoin(F.broadcast(qv)).select(
        "vec_id", int_dot("qd", "qq").alias("qdot")
    )
    return scored.orderBy(F.desc("qdot"), "vec_id").limit(10)


@register(
    "q83_percent_rank",
    """SELECT o_orderpriority, o_orderkey,
              CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_ppm,
              CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_ppm
       FROM orders WHERE o_custkey < 100
       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""",
    "percent_rank/cume_dist relative-standing windows (floor-scaled to "
    "ppm integers: identical input doubles -> identical integers, no "
    "round-mode dependence)",
)
def q83(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ppm = F.lit(1000000)
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.floor(F.percent_rank().over(w) * ppm).alias("pr_ppm"),
        F.floor(F.cume_dist().over(w) * ppm).alias("cd_ppm"),
    )


RESIZE_W, RESIZE_H = 32, 16


#: NN source index for the q84 oracle: target pixel (r, c) samples
#: source pixel (r*H // out_h, c*30 // out_w) of the width-30 BMP
_Q84_H = "((strlen(text) + 29) // 30)"
_Q84_SRC = (
    f"((r * {_Q84_H}) // {RESIZE_H}) * 30 + ((c * 30) // {RESIZE_W})"
)


@register(
    "q84_multimodal_resize",
    f"""SELECT doc_id, {RESIZE_W} AS out_w, {RESIZE_H} AS out_h,
               CAST(54 + {(RESIZE_W * 3 + 3) // 4 * 4} * {RESIZE_H} AS INTEGER)
                 AS out_bytes,
               CAST(list_sum(flatten(list_transform(range(0, {RESIZE_H}), r ->
                      list_transform(range(0, {RESIZE_W}), c ->
                        CASE WHEN {_Q84_SRC} < strlen(text)
                             THEN ord(text[CAST({_Q84_SRC} + 1 AS INTEGER)])
                             ELSE 0 END)))) AS BIGINT) AS resized_pixel_sum
        FROM documents WHERE doc_id < 200""",
    "REAL image resize end-to-end: BMP decode -> nearest-neighbor "
    "resample (src = (r*H div out_h, c*W div out_w)) -> BMP re-encode "
    "-> decode of the resized file.  The oracle recomputes BOTH the "
    "resized container size from BMP geometry AND the exact R-channel "
    "pixel sum of the resampled grid from the source bytes, so the "
    "whole codec chain (parse, row order, stride, index map, "
    "re-encode) is differentially pinned.  Replaces the r3 fake "
    "cycle-pad resize; the mapInPandas plumbing is unchanged — a "
    "PIL/opencv resampler drops into the same slot",
)
def q84(spark: SparkSession, sf: str) -> DataFrame:
    from ..multimodal import resize_features_pipeline, with_bmp_payload

    d = with_bmp_payload(
        load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    )
    return resize_features_pipeline(d, RESIZE_W, RESIZE_H)


@register(
    "q85_weighted_sample",
    f"""SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
               (({hex_hash64_sql('CAST(doc_id AS VARCHAR)')} % 1048576) + 1) * 1.0
                 / CAST(length(text) AS DOUBLE) AS priority
        FROM documents WHERE length(text) > 0
        ORDER BY priority, doc_id LIMIT 100""",
    "weighted sampling: k winners with probability increasing in doc "
    "length — hash-priority analogue of Efraimidis-Spirakis, exact "
    "integer inputs + one correctly-rounded division, so the sample is "
    "layout/seed-free and bit-reproducible (TakeOrderedAndProject plan)",
)
def q85(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sampling import weighted_hash_sample

    d = load_table(spark, sf, "documents").select(
        "doc_id", F.length("text").alias("n_chars"), F.length("text").alias("w")
    )
    return weighted_hash_sample(d, "doc_id", "w", k=100).select(
        "doc_id", "n_chars", "priority"
    )


STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


@register(
    "q86_quality_ratios",
    f"""SELECT doc_id,
               CAST(floor(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) * 1000000.0
                          / length(text)) AS BIGINT) AS punct_ppm,
               CAST(floor(len(list_filter(string_split(text, ' '),
                                          x -> x IN {STOPWORDS!r})) * 1000000.0
                          / len(string_split(text, ' '))) AS BIGINT) AS stopword_ppm
        FROM documents WHERE doc_id < 500""",
    "quality scoring, ratio signals: punctuation density and stopword "
    "ratio per document (floor-scaled to ppm integers — one correctly- "
    "rounded division, portable) — completes the length/punct/stopword "
    "trio with q31",
)
def q86(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 500)
    toks = T.tokens("text")
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9 ]"), 0))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    ppm = F.lit(1000000.0)
    return d.select(
        "doc_id",
        F.floor(n_punct * ppm / F.length("text")).alias("punct_ppm"),
        F.floor(n_stop * ppm / F.size(toks)).alias("stopword_ppm"),
    )


def _q87_oracle() -> str:
    from ..functions.text import normalize_text_sql

    return f"""WITH s AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                     range(1, greatest(length(norm) - 2, 1) + 1),
                     i -> substr(norm, CAST(i AS INT), 3))) AS sh
          FROM (SELECT doc_id, {normalize_text_sql('text')} AS norm
                FROM documents WHERE doc_id < 100))
        SELECT doc_id, CAST(len(sh) AS INTEGER) AS n_shingles,
               list_min(list_transform(sh, x -> {hex_hash64_sql('x', 'sh0')})) AS min_sig
        FROM s"""


@register(
    "q87_char_shingles",
    _q87_oracle(),
    "character 3-gram shingling of normalized text + per-doc MinHash "
    "signature — the shingle-level variant of the token MinHash family "
    "(q35), robust to tokenization differences",
)
def q87(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import char_ngrams, hex_hash64

    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    # materialize the shingle array in its own projection: referenced
    # twice below, so CollapseProject keeps it computed once per row
    shingled = d.select("doc_id", char_ngrams("text", n=3).alias("sh"))
    return shingled.select(
        "doc_id",
        F.size("sh").alias("n_shingles"),
        F.array_min(
            F.transform(F.col("sh"), lambda x: hex_hash64(x, "sh0"))
        ).alias("min_sig"),
    )


@register(
    "q88_funnel_conversion",
    """WITH first_click AS (
         SELECT user_id, min(ts) AS c0 FROM events
         WHERE event_type = 'click' GROUP BY 1)
       SELECT count(*) AS n_converted FROM first_click f
       WHERE EXISTS (
         SELECT 1 FROM events p
         WHERE p.user_id = f.user_id AND p.event_type = 'purchase'
           AND p.ts > f.c0
           AND epoch_us(p.ts) <= epoch_us(f.c0) + 86400000000)""",
    "funnel conversion: users whose first click is followed by a "
    "purchase within 24h — semi join on the user key with a time-range "
    "residual (one shuffle per side, no nested loop)",
)
def q88(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    fc = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("c0"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    day_us = 86400000000
    converted = fc.join(
        p,
        (fc.user_id == p.p_user)
        & (p.p_ts > fc.c0)
        & (F.unix_micros(p.p_ts) <= F.unix_micros(fc.c0) + day_us),
        "left_semi",
    )
    return converted.agg(F.count("*").alias("n_converted"))


@register(
    "q89_cohort_retention",
    f"""WITH first_week AS (
          SELECT user_id, min({week_str_sql('ts')}) AS cohort
          FROM events GROUP BY 1),
        activity AS (
          SELECT DISTINCT user_id, {week_str_sql('ts')} AS week FROM events)
        SELECT cohort, week, count(*) AS n_active
        FROM first_week JOIN activity USING (user_id)
        GROUP BY 1, 2""",
    "cohort retention: users grouped by first-activity week, counted "
    "active per subsequent week (two aggregations + one key join — the "
    "cohort side is |users|, broadcastable against the activity fact)",
)
def q89(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    first_week = ev.groupBy("user_id").agg(F.min(week_str("ts")).alias("cohort"))
    activity = ev.select("user_id", week_str("ts").alias("week")).distinct()
    return (
        first_week.join(activity, "user_id")
        .groupBy("cohort", "week")
        .agg(F.count("*").alias("n_active"))
    )


@register(
    "q90_grouped_median",
    """SELECT user_id, count(*) AS n,
              CAST(2 * median(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS BIGINT) AS med2
       FROM events GROUP BY user_id""",
    "grouped-map applyInPandas custom operator: exact per-user median "
    "(doubled to stay integer — no interpolation convention to match) "
    "over Arrow-batched whole groups; the slot for group-local "
    "algorithms built-ins can't express",
)
def q90(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profile import grouped_median

    ev = load_table(spark, sf, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return grouped_median(ev.select("user_id", cents.alias("cents")), "user_id", "cents")


@register(
    "q91_corpus_pipeline",
    f"""WITH quality AS (
          SELECT doc_id, lang, text FROM documents
          WHERE length(text) >= 100 AND len(string_split(text, ' ')) >= 20
            AND lang IN ('en', 'de', 'fr')),
        keepers AS (
          SELECT min(doc_id) AS doc_id
          FROM quality GROUP BY {fingerprint_sql('text')}),
        deduped AS (
          SELECT q.* FROM quality q JOIN keepers USING (doc_id)),
        sampled AS (
          SELECT * FROM deduped
          WHERE {hex_hash64_sql('CAST(doc_id AS VARCHAR)')} % 1000
                < CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 600 ELSE 1000 END)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
               min(doc_id) AS min_doc
        FROM sampled GROUP BY lang""",
    "end-to-end training-corpus build: quality gate (length/tokens) -> "
    "language allowlist -> exact near-dup collapse (fingerprint keeper, "
    "first-wins) -> per-language quota downsample -> corpus stats; one "
    "declarative plan, every stage a scan-local predicate or one "
    "aggregation (composes q31/q33/q79 machinery)",
)
def q91(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sampling import stratified_hash_sample

    d = load_table(spark, sf, "documents")
    quality = d.filter(
        (F.length("text") >= 100)
        & (T.token_count("text") >= 20)
        & F.col("lang").isin("en", "de", "fr")
    )
    keepers = quality.groupBy(fingerprint("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = quality.join(keepers.select("doc_id"), "doc_id")
    sampled = stratified_hash_sample(
        deduped, "doc_id", "lang", {"en": 0.3, "de": 0.6, "fr": 1.0}
    )
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(T.token_count("text")).alias("sum_tokens"),
        F.min("doc_id").alias("min_doc"),
    )


def _q92_oracle() -> str:
    from ..operators.sketch import count_min_cells_sql

    cells = count_min_cells_sql(
        "SELECT user_id FROM events", "user_id", CMS_WIDTH, CMS_DEPTH
    )
    probe_cells = " UNION ALL ".join(
        f"""SELECT user_id, {i} AS row,
                {hex_hash64_sql("CAST(user_id AS VARCHAR)", f"cms{i}")} % {CMS_WIDTH} AS bucket
         FROM probes"""
        for i in range(CMS_DEPTH)
    )
    return f"""WITH cells AS ({cells}),
        probes AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
        pc AS ({probe_cells}),
        est AS (SELECT user_id, min(COALESCE(cnt, 0)) AS cms_estimate
                FROM pc LEFT JOIN cells USING (row, bucket) GROUP BY 1),
        exact AS (SELECT user_id, count(*) AS exact_cnt
                  FROM events WHERE user_id < 20 GROUP BY 1)
        SELECT est.user_id, exact_cnt, cms_estimate
        FROM est JOIN exact USING (user_id)"""


@register(
    "q92_stream_count_min",
    _q92_oracle(),
    "streaming sketch maintenance: Count-Min cells merged per microbatch "
    "(counter addition = the mergeability property), probed after the "
    "bounded run — bit-equal to the batch-built sketch, so the batch "
    "oracle verifies the streaming path; state is O(depth*width) forever",
)
def q92(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sketch import count_min_estimate
    from ..streaming.sketch import stream_count_min_cells

    cells = stream_count_min_cells(spark, sf, "user_id", CMS_WIDTH, CMS_DEPTH)
    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 20)
    probes = ev.select("user_id").distinct()
    est = count_min_estimate(cells, probes, "user_id", CMS_WIDTH, CMS_DEPTH)
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_cnt"))
    return est.join(exact, "user_id").select("user_id", "exact_cnt", "cms_estimate")


@register(
    "q93_promo_revenue_share",
    f"""SELECT p.p_brand,
               count(*) AS n_items,
               {dec_sum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
               {dec_sum_sql("CASE WHEN p.p_type LIKE 'PROMO%' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", 4)} AS promo_revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand""",
    "TPC-H Q14-shaped big x medium equi join (lineitem x part on "
    "partkey): per-brand revenue with a conditional promo slice — at "
    "100 TB part exceeds the broadcast threshold, so this is the "
    "sort-merge/shuffled-hash tier with map-side partial aggs",
)
def q93(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            dec_sum(rev, 4).alias("revenue"),
            dec_sum(promo, 4).alias("promo_revenue"),
        )
    )


@register(
    "q94_referential_audit",
    """SELECT 'lineitem->orders' AS fk, count(*) AS n_orphans FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
       UNION ALL
       SELECT 'orders->customer' AS fk, count(*) AS n_orphans FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""",
    "referential-integrity audit: FK orphan counts via left-anti joins — "
    "the warehouse-wide form of the constraint emulation the loaders do "
    "per batch (SURVEY §1.3; Spark has no enforced FKs, so integrity is "
    "a query you run, not a constraint you declare)",
)
def q94(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    a = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").alias("n_orphans"))
        .select(F.lit("lineitem->orders").alias("fk"), "n_orphans")
    )
    b = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_orphans"))
        .select(F.lit("orders->customer").alias("fk"), "n_orphans")
    )
    return a.unionByName(b)


@register(
    "q95_drift_bins",
    f"""WITH old AS (SELECT value FROM events WHERE ts < TIMESTAMP '{EVENTS_CUTOFF}'),
        new AS (SELECT value FROM events WHERE ts >= TIMESTAMP '{EVENTS_CUTOFF}')
       SELECT bin,
              CAST(sum(n_old) AS BIGINT) AS n_old,
              CAST(sum(n_new) AS BIGINT) AS n_new
       FROM (
         SELECT CAST(floor(value / 100.0) AS BIGINT) AS bin, 1 AS n_old, 0 AS n_new FROM old
         UNION ALL
         SELECT CAST(floor(value / 100.0) AS BIGINT) AS bin, 0 AS n_old, 1 AS n_new FROM new)
       GROUP BY bin""",
    "distribution-drift bins: the same fixed binning applied to a "
    "before/after split, counted side by side — the exact-count input "
    "to any drift score (PSI/KL need only these bins; ln is applied by "
    "the consumer, keeping the engine output engine-portable integers)",
)
def q95(spark: SparkSession, sf: str) -> DataFrame:
    old = load_events_range(spark, sf, hi=EVENTS_CUTOFF).select("value")
    new = load_events_range(spark, sf, lo=EVENTS_CUTOFF).select("value")
    bin_col = F.floor(F.col("value") / 100.0).cast("long").alias("bin")
    o = old.select(bin_col, F.lit(1).alias("n_old"), F.lit(0).alias("n_new"))
    n = new.select(bin_col, F.lit(0).alias("n_old"), F.lit(1).alias("n_new"))
    return (
        o.unionByName(n)
        .groupBy("bin")
        .agg(F.sum("n_old").alias("n_old"), F.sum("n_new").alias("n_new"))
    )


@register(
    "q96_incremental_rollup",
    f"""SELECT {week_str_sql('ts')} AS week, count(*) AS n_events,
               {dec_sum_sql('value', 2)} AS total_value
        FROM events GROUP BY 1""",
    "continuous-aggregate maintenance proven end-to-end: the weekly "
    "rollup is built by PER-WEEK incremental refreshes (dynamic "
    "partition overwrite, one batch at a time, one week re-refreshed to "
    "prove idempotent repair) and the maintained table equals the "
    "direct aggregate — refresh cost scales with the batch's partitions, "
    "not table history",
)
def q96(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from ..operators.rollup import refresh_rollup, touched_partitions

    # cache the staged frame: the testdata fact isn't week-partitioned on
    # disk, so without this each refresh would rescan the whole table —
    # in the real warehouse (catalog.py) the partition layout does this
    ev = load_events_range(spark, sf).withColumn("week", week_str("ts")).cache()

    def aggregate(scoped: DataFrame) -> DataFrame:
        return scoped.groupBy("week").agg(
            F.count("*").alias("n_events"), dec_sum("value", 2).alias("total_value")
        )

    rollup_path = tempfile.mkdtemp(prefix="hdt_rollup_") + "/weekly"
    weeks = sorted(touched_partitions(ev, "week"))
    # simulate incremental ingest: one refresh per arriving week-batch,
    # then re-refresh the first week to prove idempotent repair
    for wk in weeks:
        refresh_rollup(ev, rollup_path, "week", [wk], aggregate)
    if weeks:
        refresh_rollup(ev, rollup_path, "week", [weeks[0]], aggregate)
    ev.unpersist()
    out = spark.read.parquet(rollup_path)
    # partition column round-trips as string; restore column order/types
    return out.select(
        F.col("week").cast("string").alias("week"),
        F.col("n_events").cast("long").alias("n_events"),
        "total_value",
    )


def _q97_oracle(iters: int = 3) -> str:
    edges = """SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS src,
                      't' || event_type AS dst FROM events
               UNION
               SELECT DISTINCT 't' || event_type AS src,
                      'u' || CAST(user_id AS VARCHAR) AS dst FROM events"""
    ctes = [f"e AS ({edges})",
            "deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1)",
            "r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg)"]
    prev = "r0"
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (SELECT e.dst AS node,
                   CAST(150000 + (850 * sum({prev}.r // deg.d)) // 1000 AS BIGINT) AS r
            FROM e JOIN {prev} ON e.src = {prev}.node
                   JOIN deg ON e.src = deg.src
            GROUP BY e.dst)"""
        )
        prev = f"r{i}"
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, r AS rank_ppm FROM {prev}"


@register(
    "q97_pagerank_integer",
    _q97_oracle(3),
    "PageRank over the user<->event-type bipartite graph in exact ppm "
    "integers (3 rounds, floor division): fp PageRank is shuffle-order- "
    "dependent, the integer form is bit-reproducible on any engine — "
    "every rank oracle-checked, one join+aggregate shuffle per round",
)
def q97(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import pagerank_integer, symmetrize

    ev = load_table(spark, sf, "events").select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("t"), F.col("event_type")).alias("t"),
    ).distinct()
    edges = symmetrize(ev, "u", "t")
    return pagerank_integer(edges, iterations=3)


@register(
    "q98_hot_key_detector",
    """WITH per_key AS (SELECT lang AS key, count(*) AS n
                        FROM documents GROUP BY 1),
        stats AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                         count(*) AS n_keys FROM per_key)
       SELECT p.key, p.n,
              CAST(p.n * s.n_keys AS BIGINT) AS n_scaled,
              p.n * s.n_keys > 2 * s.total AS is_hot
       FROM per_key p CROSS JOIN stats s
       WHERE p.n * s.n_keys > 2 * s.total""",
    "hot-key detector: keys whose row count exceeds 2x the mean "
    "(integer cross-multiplied, no division) — the diagnosis stage that "
    "feeds the salted join/agg operators (q49/q50); one aggregation + a "
    "1-row broadcast",
)
def q98(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    per_key = d.groupBy(F.col("lang").alias("key")).agg(F.count("*").alias("n"))
    stats = per_key.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_keys")
    )
    joined = per_key.crossJoin(F.broadcast(stats))
    scaled = (F.col("n") * F.col("n_keys")).cast("long")
    return (
        joined.select(
            "key", "n", scaled.alias("n_scaled"),
            (scaled > 2 * F.col("total")).alias("is_hot"),
        )
        .filter(F.col("is_hot"))
    )


@register(
    "q99_boilerplate_prefixes",
    """WITH pref AS (
         SELECT source,
                array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS prefix
         FROM documents),
        counted AS (
          SELECT source, prefix, count(*) AS n_docs
          FROM pref GROUP BY 1, 2),
        per_source AS (
          SELECT source, count(*) AS total FROM pref GROUP BY 1)
       SELECT c.source, c.prefix, c.n_docs
       FROM counted c JOIN per_source t USING (source)
       WHERE c.n_docs * 20 >= t.total AND c.n_docs >= 2""",
    "boilerplate/template detection: 5-token document prefixes covering "
    ">=5% of a source's docs (integer cross-multiplied threshold) — the "
    "detection stage of boilerplate stripping in corpus cleaning",
)
def q99(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    prefix = F.concat_ws(" ", F.slice(T.tokens("text"), 1, 5))
    pref = d.select("source", prefix.alias("prefix"))
    counted = pref.groupBy("source", "prefix").agg(F.count("*").alias("n_docs"))
    per_source = pref.groupBy("source").agg(F.count("*").alias("total"))
    return (
        counted.join(per_source, "source")
        .filter((F.col("n_docs") * 20 >= F.col("total")) & (F.col("n_docs") >= 2))
        .select("source", "prefix", "n_docs")
    )


def _q100_oracle(n_planes: int = 8, dim: int = 64) -> str:
    from ..functions.vector import int8_quantize_sql
    from ..operators.similarity import _hyperplanes

    planes = _hyperplanes(n_planes, dim)
    bits = " + ".join(
        f"(CASE WHEN CAST(list_dot_product(CAST(qv AS DOUBLE[]), "
        f"CAST({plane!r} AS DOUBLE[])) AS BIGINT) > 0 THEN {1 << j} ELSE 0 END)"
        for j, plane in enumerate(planes)
    )
    return f"""WITH q AS (SELECT vec_id, {int8_quantize_sql('embedding')} AS qv
                  FROM embeddings),
        sigs AS (SELECT vec_id, qv, CAST({bits} AS BIGINT) AS lsh_sig FROM q)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.lsh_sig,
               CAST(list_dot_product(CAST(a.qv AS DOUBLE[]),
                                     CAST(b.qv AS DOUBLE[])) AS BIGINT) AS qdot
        FROM sigs a JOIN sigs b
          ON a.lsh_sig = b.lsh_sig AND a.vec_id < b.vec_id"""


@register(
    "q100_embedding_lsh_pairs",
    _q100_oracle(),
    "random-hyperplane LSH over int8-quantized embeddings: 8-bit cosine "
    "SimHash signatures from md5-derived integer planes (all-integer "
    "math, bit-identical across engines and cluster layouts), candidate "
    "pairs by signature equi-join — the 100 TB embedding-dedup path "
    "(composes q82 quantization with the q51 LSH shape)",
)
def q100(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.similarity import embedding_lsh_pairs

    e = load_table(spark, sf, "embeddings")
    return embedding_lsh_pairs(e, n_planes=8)


@register(
    "q101_stream_dedup",
    f"""SELECT count(*) AS n_events,
               count(DISTINCT event_id) AS n_ids,
               {dec_sum_sql('value', 2)} AS total_value
        FROM events""",
    "watermarked streaming dedup proven end-to-end: the events file "
    "re-delivered as a second microbatch is eliminated in flight by "
    "dropDuplicatesWithinWatermark (O(keys-in-window) state) — the "
    "surviving stream equals the batch table (D4 as a stream)",
)
def q101(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.windows import stream_dedup_events

    survived = stream_dedup_events(spark, sf)
    return survived.agg(
        F.count("*").alias("n_events"),
        F.count_distinct(F.col("event_id")).alias("n_ids"),
        dec_sum("value", 2).alias("total_value"),
    )


def _morton_sql(a: str, b: str, bits: int = 8) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "q102_zorder_key",
    f"""WITH b AS (SELECT event_id, user_id,
                         CAST(user_id % 256 AS BIGINT) AS ub,
                         CAST(CAST(floor(value / 40.0) AS BIGINT) % 256 AS BIGINT) AS vb
                  FROM events)
        SELECT event_id, user_id, {_morton_sql('ub', 'vb')} AS zkey
        FROM b ORDER BY zkey, event_id LIMIT 100""",
    "z-order (Morton) clustering key: bit-interleave two bounded "
    "dimensions so sorting by one key gives locality in both — the "
    "sort-on-write layout that makes parquet min/max skipping work for "
    "two-column predicates at 100 TB (pure integer shifts, "
    "oracle-exact)",
)
def q102(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    ub = (F.col("user_id") % 256).cast("long")
    vb = (F.floor(F.col("value") / 40.0).cast("long") % 256).cast("long")
    z = None
    for i in range(8):
        t1 = F.shiftleft(F.shiftright(ub, i).bitwiseAND(F.lit(1)), 2 * i)
        t2 = F.shiftleft(F.shiftright(vb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = t1 + t2 if z is None else z + t1 + t2
    return (
        ev.select("event_id", "user_id", z.cast("long").alias("zkey"))
        .orderBy("zkey", "event_id")
        .limit(100)
    )


@register(
    "q103_time_weighted_sums",
    """WITH seq AS (
         SELECT user_id,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
                epoch_us(ts) - lag(epoch_us(ts))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dt_us
         FROM events)
       SELECT user_id,
              CAST(sum(cents * dt_us) AS BIGINT) AS weighted_sum,
              CAST(sum(dt_us) AS BIGINT) AS total_us,
              count(*) AS n_intervals
       FROM seq WHERE dt_us IS NOT NULL GROUP BY user_id""",
    "time-weighted sums (the TWAP building block): each value weighted "
    "by the micros elapsed since the user's previous event — exact "
    "integer arithmetic (cents x micros fits in int64), one window "
    "shuffle + one aggregation; consumer divides for the actual TWAP",
)
def q103(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    dt = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    seq = ev.select("user_id", cents.alias("cents"), dt.alias("dt_us"))
    return (
        seq.filter(F.col("dt_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.col("cents") * F.col("dt_us")).alias("weighted_sum"),
            F.sum("dt_us").alias("total_us"),
            F.count("*").alias("n_intervals"),
        )
    )


@register(
    "q104_decay_scores",
    f"""WITH aged AS (
          SELECT user_id,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
                 CAST((epoch_us(TIMESTAMP '{EVENTS_CUM_CUTOFF}') - epoch_us(ts))
                      // 604800000000 AS BIGINT) AS weeks_old
          FROM events WHERE ts <= TIMESTAMP '{EVENTS_CUM_CUTOFF}')
        SELECT user_id,
               CAST(sum(cents >> CAST(least(weeks_old, 62) AS INTEGER)) AS BIGINT)
                 AS decayed_cents,
               count(*) AS n_events
        FROM aged GROUP BY user_id""",
    "recency-decayed engagement score with a one-week half-life as an "
    "INTEGER SHIFT (cents >> weeks_old): exponential decay without "
    "pow/exp, which are not bit-portable across engines — the ranking "
    "signal pattern for freshness-weighted retrieval, fully oracle-exact",
)
def q104(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf, hi=EVENTS_CUM_CUTOFF, hi_inclusive=True)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    cutoff_us = F.unix_micros(F.lit(EVENTS_CUM_CUTOFF).cast("timestamp"))
    WEEK_US = 604800000000
    age_us = cutoff_us - F.unix_micros("ts")
    # exact integer floor division (subtract the remainder, then the
    # division is exact) — matches the oracle's // operator bit-for-bit
    weeks = ((age_us - F.pmod(age_us, F.lit(WEEK_US))) / F.lit(WEEK_US)).cast("long")
    aged = ev.select(
        "user_id", cents.alias("cents"),
        F.least(weeks, F.lit(62)).cast("int").alias("shift_w"),
    )
    decayed = F.expr("shiftright(cents, shift_w)")
    return aged.groupBy("user_id").agg(
        F.sum(decayed).alias("decayed_cents"), F.count("*").alias("n_events")
    )


@register(
    "q105_lsh_topk_neighbors",
    f"""WITH pairs AS ({_q100_oracle()}),
        sym AS (SELECT id_a AS src, id_b AS dst, qdot FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst, qdot FROM pairs),
        ranked AS (
          SELECT src, dst, qdot,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY qdot DESC, dst) AS rk
          FROM sym)
        SELECT src AS vec_id, dst AS neighbor_id, qdot,
               CAST(rk AS INTEGER) AS rk
        FROM ranked WHERE rk <= 3""",
    "top-k similarity search with LSH prefilter (SURVEY §7.4's promised "
    "shape): candidates from the signature equi-join only — never "
    "all-pairs — then per-vector top-3 by exact integer dot via one "
    "window (composes q100 + the q17 per-group top-k pattern)",
)
def q105(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.similarity import embedding_lsh_pairs

    e = load_table(spark, sf, "embeddings")
    pairs = embedding_lsh_pairs(e, n_planes=8)
    # Emit both orientations from ONE evaluation of the expensive
    # signature self-join: a union of two selects over `pairs` would make
    # Spark run the whole LSH pipeline once per branch (observed 5.5x
    # regression at sf0.1).  explode(array(struct,struct)) keeps a single
    # scan/join and merely doubles rows map-side.
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"),
                    F.col("id_b").alias("dst"),
                    F.col("qdot"),
                ),
                F.struct(
                    F.col("id_b").alias("src"),
                    F.col("id_a").alias("dst"),
                    F.col("qdot"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.qdot")
    w = Window.partitionBy("src").orderBy(F.desc("qdot"), "dst")
    return (
        sym.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("src").alias("vec_id"),
            F.col("dst").alias("neighbor_id"),
            "qdot",
            F.col("rk").cast("int").alias("rk"),
        )
    )


@register(
    "q106_er_match_scores",
    """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
              CAST((CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 10 ELSE -5 END)
                 + (CASE WHEN levenshtein(a.c_name, b.c_name) <= 5 THEN 15
                         WHEN levenshtein(a.c_name, b.c_name) <= 10 THEN 5
                         ELSE -10 END)
                 + (CASE WHEN abs(a.c_acctbal - b.c_acctbal) < 100.0 THEN 3 ELSE 0 END)
                AS BIGINT) AS score
       FROM customer a JOIN customer b
         ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
       WHERE a.c_custkey < 300 AND b.c_custkey < 300
         AND (CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 10 ELSE -5 END)
           + (CASE WHEN levenshtein(a.c_name, b.c_name) <= 5 THEN 15
                   WHEN levenshtein(a.c_name, b.c_name) <= 10 THEN 5
                   ELSE -10 END)
           + (CASE WHEN abs(a.c_acctbal - b.c_acctbal) < 100.0 THEN 3 ELSE 0 END) >= 18""",
    "entity-resolution match scoring (Fellegi-Sunter shape): blocked "
    "candidate pairs scored by integer agreement weights across fields "
    "(segment equality, name edit-distance bands, balance proximity) — "
    "the scoring stage between q69's candidate pairs and a merge "
    "decision; all-integer, oracle-exact",
)
def q106(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").filter(F.col("c_custkey") < 300)
    a = c.select(
        F.col("c_custkey").alias("id_a"), F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg_a"), F.col("c_name").alias("name_a"),
        F.col("c_acctbal").alias("bal_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"), F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg_b"), F.col("c_name").alias("name_b"),
        F.col("c_acctbal").alias("bal_b"),
    )
    pairs = a.join(b, "nk").filter(F.col("id_a") < F.col("id_b"))
    lev = F.levenshtein("name_a", "name_b")
    score = (
        F.when(F.col("seg_a") == F.col("seg_b"), 10).otherwise(-5)
        + F.when(lev <= 5, 15).when(lev <= 10, 5).otherwise(-10)
        + F.when(F.abs(F.col("bal_a") - F.col("bal_b")) < 100.0, 3).otherwise(0)
    ).cast("long")
    return (
        pairs.select("id_a", "id_b", score.alias("score"))
        .filter(F.col("score") >= 18)
    )


@register(
    "q107_udtf_chunks",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                     FROM documents WHERE doc_id < 100),
        ex AS (SELECT doc_id, t, unnest(range(0, ((len(t) + 39) // 40))) AS ci
               FROM toks)
       SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
              CAST(len(list_slice(t, ci * 40 + 1, least((ci + 1) * 40, len(t)))) AS INTEGER)
                AS n_tokens,
              md5(array_to_string(list_slice(t, ci * 40 + 1, least((ci + 1) * 40, len(t))), ' '))
                AS chunk_md5
       FROM ex""",
    "Python UDTF surface (Spark 4 @udtf) driven through SQL LATERAL "
    "join: a table-generating chunker (1 doc row -> N typed chunk "
    "rows) — the §2.6 extension slot for generators that built-in "
    "explode can't express (here it could, which is exactly what the "
    "oracle exploits to verify the UDTF bit-for-bit)",
)
def q107(spark: SparkSession, sf: str) -> DataFrame:
    import hashlib

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, chunk_md5 string")
    class DocChunks:
        def eval(self, text: str, size: int):
            toks = text.split(" ")
            for i in range(0, len(toks), size):
                chunk = toks[i : i + size]
                yield (
                    i // size,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    spark.udtf.register("doc_chunks", DocChunks)
    load_table(spark, sf, "documents").filter(F.col("doc_id") < 100).createOrReplaceTempView(
        "q107_docs"
    )
    return spark.sql(
        """SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_md5
           FROM q107_docs d, LATERAL doc_chunks(d.text, 40) c"""
    )


FH_DIM = 16


@register(
    "q108_feature_hashing",
    f"""WITH tok_rows AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE doc_id < 200),
        binned AS (
          SELECT doc_id, {hex_hash64_sql('tok')} % {FH_DIM} AS dim
          FROM tok_rows)
        SELECT doc_id, CAST(dim AS INTEGER) AS dim, count(*) AS cnt
        FROM binned GROUP BY 1, 2""",
    "feature hashing (the hashing trick): tokens mapped to a fixed "
    f"{FH_DIM}-dim count space by stable hash — unbounded vocabulary to "
    "bounded feature width with no dictionary to build/broadcast, the "
    "standard ML featurization for 100 TB text (one explode + one "
    "partial-aggregated groupBy)",
)
def q108(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import hex_hash64, tokens

    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    ex = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    dim = F.pmod(hex_hash64(F.col("tok")), F.lit(FH_DIM)).cast("int")
    return ex.groupBy("doc_id", dim.alias("dim")).agg(F.count("*").alias("cnt"))


@register(
    "q109_target_encoding",
    f"""WITH stats AS (
          SELECT o_orderpriority,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
                 count(*) AS n
          FROM orders GROUP BY 1),
        prior AS (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gs,
                 count(*) AS gn
          FROM orders)
        SELECT s.o_orderpriority, s.n,
               (floor(((s.s + 20.0 * (p.gs / p.gn)) / (s.n + 20.0)) * 1000000.0)
                / 1000000.0) AS encoded
        FROM stats s CROSS JOIN prior p""",
    "smoothed target encoding (m-estimate, m=20): category mean blended "
    "toward the global prior — leakage-safe categorical featurization "
    "computed in two aggregations + a 1-row broadcast; exact decimal "
    "sums + floor6 keep the encoding bit-portable",
)
def q109(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    stats = orders.groupBy("o_orderpriority").agg(
        F.sum(price).cast("double").alias("s"), F.count("*").alias("n")
    )
    prior = orders.agg(
        F.sum(price).cast("double").alias("gs"), F.count("*").alias("gn")
    )
    joined = stats.crossJoin(F.broadcast(prior))
    encoded = floor6(
        (F.col("s") + F.lit(20.0) * (F.col("gs") / F.col("gn")))
        / (F.col("n") + F.lit(20.0))
    )
    return joined.select("o_orderpriority", "n", encoded.alias("encoded"))


NEG_SLOTS = 4


@register(
    "q110_negative_sampling",
    f"""WITH items AS (
          SELECT p_partkey,
                 row_number() OVER (ORDER BY p_partkey) - 1 AS idx,
                 count(*) OVER () AS n_items
          FROM part),
        pos AS (SELECT DISTINCT o.o_custkey, l.l_partkey
                FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                WHERE o.o_custkey < 100),
        users AS (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey < 100),
        cand AS (
          SELECT u.o_custkey, s.slot,
                 {hex_hash64_sql("CAST(u.o_custkey AS VARCHAR) || '#' || CAST(s.slot AS VARCHAR)", "neg")} AS h
          FROM users u CROSS JOIN (SELECT unnest(range({NEG_SLOTS})) AS slot) s),
        picked AS (
          SELECT c.o_custkey, CAST(c.slot AS INTEGER) AS slot, i.p_partkey
          FROM cand c JOIN items i ON i.idx = c.h % i.n_items)
        SELECT p.o_custkey AS custkey, p.slot, p.p_partkey AS negative_partkey
        FROM picked p
        WHERE NOT EXISTS (SELECT 1 FROM pos
                          WHERE pos.o_custkey = p.o_custkey
                            AND pos.l_partkey = p.p_partkey)""",
    "deterministic negative sampling for contrastive training: per user, "
    "hash-picked candidate classes with interacted classes rejected by "
    "anti-join — layout/seed-free so every rerun and every engine draws "
    "the SAME negatives (hash-pick + broadcast class table + one "
    "anti-join shuffle)",
)
def q110(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import hex_hash64

    orders = load_table(spark, sf, "orders").filter(F.col("o_custkey") < 100)
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    # dense class index WITHOUT a global window (the q271 class, found
    # by the r5 registry-wide audit sweep): two-phase global rank over
    # part + a 1-row count — at 100 TB part is fact-scale
    items = K.global_row_number(
        part.select("p_partkey"), [F.asc("p_partkey")]
    ).select("p_partkey", (F.col("rn") - 1).alias("idx"))
    n_items = part.agg(F.count("*").alias("n_items"))
    pos = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", F.col("l_partkey").alias("p_partkey"))
        .distinct()
    )
    users = orders.select("o_custkey").distinct()
    slots = spark.range(NEG_SLOTS).select(F.col("id").cast("int").alias("slot"))
    cand = users.crossJoin(F.broadcast(slots)).select(
        "o_custkey", "slot",
        hex_hash64(
            F.concat(F.col("o_custkey").cast("string"), F.lit("#"), F.col("slot").cast("string")),
            "neg",
        ).alias("h"),
    )
    # attach the 1-row count to the probe side FIRST so the class
    # lookup is a plain equi-join on idx (the old theta form
    # pmod(h, items.n_items) == items.idx forced a nested-loop join
    # against a fact-scale build side)
    picked = (
        cand.crossJoin(F.broadcast(n_items))
        .withColumn("idx", F.pmod(F.col("h"), F.col("n_items")))
        .join(items, "idx")
        .select("o_custkey", "slot", "p_partkey")
    )
    return picked.join(pos, ["o_custkey", "p_partkey"], "left_anti").select(
        F.col("o_custkey").alias("custkey"), "slot",
        F.col("p_partkey").alias("negative_partkey"),
    )


@register(
    "q111_asof_ttl",
    """SELECT p.event_id, p.user_id,
              CASE WHEN epoch_us(p.ts) - epoch_us(l.ts) <= 1800000000
                   THEN l.event_id END AS login_event_id
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'login') l
         ON p.user_id = l.user_id AND p.ts >= l.ts""",
    "as-of join with staleness bound (feature-store TTL): the most "
    "recent prior login counts only within 30 min — matches older than "
    "the TTL are nulled exactly as if absent; same single-shuffle "
    "union+carry plan as q45 with the matched timestamp carried along",
)
def q111(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    logins = ev.filter(F.col("event_type") == "login").select(
        "user_id", "ts", F.col("event_id").alias("login_event_id")
    )
    joined = asof_join(
        purchases, logins, ["user_id"], "ts", "ts", ["login_event_id"],
        tiebreak="event_id", tolerance_us=1_800_000_000,
    )
    return joined.select("event_id", "user_id", "login_event_id")


@register(
    "q112_rollup_cascade",
    f"""SELECT {week_str_sql('ts')} AS week, count(*) AS n_events,
               {dec_sum_sql('value', 2)} AS total_value
        FROM events GROUP BY 1""",
    "rollup cascade: hour buckets aggregated from the fact scan, days "
    "re-aggregated FROM THE HOURS, weeks from the days — each coarser "
    "grain reads the (tiny) finer rollup, never the fact table again; "
    "exact because the decimal partial sums are re-aggregatable — the "
    "oracle is the direct week aggregate, proving the cascade lossless",
)
def q112(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.deterministic import bucket_str, dec

    ev = load_events_range(spark, sf)
    # partial sums stay DECIMAL at every intermediate grain so the
    # re-aggregation is exact decimal addition (order-independent);
    # only the final week grain casts to double
    hours = ev.groupBy(bucket_str("ts", 60).alias("hour")).agg(
        F.count("*").alias("n_events"),
        F.sum(dec("value", 2)).cast("decimal(18,2)").alias("total_value"),
    )
    days = hours.groupBy(F.substring("hour", 1, 10).alias("day")).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_value").cast("decimal(18,2)").alias("total_value"),
    )
    weeks = days.groupBy(
        week_str(F.to_date("day")).alias("week")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_value").cast("decimal(18,2)").cast("double").alias("total_value"),
    )
    return weeks


# ---------------------------------------------------------------------------
# round 2 additions: bloom membership, corpus-duplication / contamination
# analysis, collocations, per-group reservoir, argmax, interval joins
# ---------------------------------------------------------------------------

# 256 Kbit filter = 8192 BIGINT words (a ~64 KB broadcast): keeps the
# false-positive rate under ~1% for the largest tested key set while
# remaining constant-size relative to any probe volume
BLOOM_BITS, BLOOM_K = 262144, 3


def _q113_oracle() -> str:
    from ..operators.sketch import bloom_bits_sql, bloom_probe_sql

    bits = bloom_bits_sql("SELECT c_custkey FROM customer", "c_custkey", BLOOM_BITS, BLOOM_K)
    probe = bloom_probe_sql(
        bits, "SELECT DISTINCT p_partkey FROM part", "p_partkey", BLOOM_BITS, BLOOM_K
    )
    return f"""WITH probed AS ({probe}),
         truth AS (SELECT p.key, (c.c_custkey IS NOT NULL) AS is_member
                   FROM probed p LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
                     ON p.key = c.c_custkey)
       SELECT count(*) AS n_probes,
              CAST(sum(CASE WHEN t.is_member THEN 1 ELSE 0 END) AS BIGINT)
                AS n_true_members,
              CAST(sum(CASE WHEN p.bloom_member THEN 1 ELSE 0 END) AS BIGINT)
                AS n_bloom_positive,
              CAST(sum(CASE WHEN p.bloom_member AND NOT t.is_member THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positive,
              CAST(sum(CASE WHEN t.is_member AND NOT p.bloom_member THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_negative
       FROM probed p JOIN truth t ON p.key = t.key"""


@register(
    "q113_bloom_filter",
    _q113_oracle(),
    "Bloom-filter membership as a relational sketch: customer keys "
    "folded into a constant-size (word, bits) table by one bit_or "
    "groupBy, part keys probed via broadcast join — md5-derived bit "
    "positions make even the false-positive COUNT oracle-exact, and "
    "n_false_negative == 0 is the filter's one-sided guarantee "
    "(the 100 TB use: pre-filtering a huge probe stream before an "
    "expensive anti-join, e.g. the D4 dedup probe)",
)
def q113(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sketch import bloom_build, bloom_probe

    cust = load_table(spark, sf, "customer")
    part = load_table(spark, sf, "part").select("p_partkey").distinct()
    bits = bloom_build(cust, "c_custkey", BLOOM_BITS, BLOOM_K)
    probed = bloom_probe(bits, part, "p_partkey", BLOOM_BITS, BLOOM_K)
    truth = probed.join(
        cust.select(F.col("c_custkey").alias("p_partkey")).distinct(),
        "p_partkey",
        "left_semi",
    ).select("p_partkey", F.lit(True).alias("is_member"))
    checked = probed.join(truth, "p_partkey", "left").withColumn(
        "is_member", F.coalesce("is_member", F.lit(False))
    )
    return checked.agg(
        F.count("*").alias("n_probes"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).alias("n_true_members"),
        F.sum(F.when(F.col("bloom_member"), 1).otherwise(0)).alias("n_bloom_positive"),
        F.sum(
            F.when(F.col("bloom_member") & ~F.col("is_member"), 1).otherwise(0)
        ).alias("n_false_positive"),
        F.sum(
            F.when(F.col("is_member") & ~F.col("bloom_member"), 1).otherwise(0)
        ).alias("n_false_negative"),
    )


SHINGLE_K = 8


@register(
    "q114_dup_shingle_ratio",
    f"""WITH sh AS (
          SELECT doc_id, unnest(list_distinct({T.token_shingles_sql('text', SHINGLE_K)})) AS sh
          FROM documents),
        freq AS (SELECT sh, count(*) AS n_docs FROM sh GROUP BY sh),
        per_doc AS (
          SELECT s.doc_id, count(*) AS n_shingles,
                 sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS n_shared
          FROM sh s JOIN freq f ON s.sh = f.sh GROUP BY s.doc_id)
       SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
              CAST(n_shared AS BIGINT) AS n_shared,
              CAST(floor(n_shared * 1000000.0 / n_shingles) AS BIGINT) AS shared_ppm
       FROM per_doc WHERE n_shared > 0""",
    "corpus-wide duplicated-shingle ratio (the RefinedWeb/CCNet "
    "inter-document repetition signal): every doc's distinct 8-token "
    "shingles counted across the corpus, docs reported by the fraction "
    "of their shingles shared with ANY other doc — the shuffle carries "
    "shingle strings + ids only, never documents, and the quadratic "
    "pair space is never materialized",
)
def q114(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(T.token_shingles("text", SHINGLE_K))).alias("sh"),
    )
    # windowed count = the groupBy+join-back collapsed into ONE shuffle
    # on the shingle key ((doc, sh) pairs are distinct, so count(*) per
    # shingle partition IS the doc frequency)
    w = Window.partitionBy("sh")
    per_doc = (
        sh.withColumn("_n_docs", F.count("*").over(w))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("_n_docs") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
    )
    return per_doc.filter(F.col("n_shared") > 0).select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_shared").cast("long").alias("n_shared"),
        F.floor(F.col("n_shared") * 1000000.0 / F.col("n_shingles"))
        .cast("long")
        .alias("shared_ppm"),
    )


@register(
    "q115_repetition_ratio",
    f"""SELECT doc_id,
              CAST(len({T.token_shingles_sql('text', 2)}) AS BIGINT) AS n_bigrams,
              CAST(len(list_distinct({T.token_shingles_sql('text', 2)})) AS BIGINT)
                AS n_distinct,
              CAST(floor((len({T.token_shingles_sql('text', 2)})
                          - len(list_distinct({T.token_shingles_sql('text', 2)})))
                         * 1000000.0
                         / len({T.token_shingles_sql('text', 2)})) AS BIGINT)
                AS repeated_ppm
       FROM documents
       WHERE len({T.token_shingles_sql('text', 2)}) > 0""",
    "intra-document repetition (the Gopher/MassiveText quality rule "
    "'fraction of duplicated n-grams'): repeated-bigram ppm per doc "
    "from pure per-row array expressions — no shuffle, no UDF, "
    "whole-stage-codegen throughput at corpus scale",
)
def q115(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    # materialize the shingle array once per row; downstream expressions
    # reference the alias instead of re-running split+transform 4x
    staged = d.select(
        "doc_id",
        F.size(T.token_shingles("text", 2)).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(T.token_shingles("text", 2)))
        .cast("long")
        .alias("n_distinct"),
    )
    return (
        staged.filter(F.col("n_bigrams") > 0)
        .select(
            "doc_id",
            "n_bigrams",
            "n_distinct",
            F.floor(
                (F.col("n_bigrams") - F.col("n_distinct"))
                * 1000000.0
                / F.col("n_bigrams")
            )
            .cast("long")
            .alias("repeated_ppm"),
        )
    )


@register(
    "q116_bigram_lift",
    f"""WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        tok_counts AS (SELECT tok, count(*) AS c_tok FROM toks GROUP BY tok),
        n_tok AS (SELECT count(*) AS n FROM toks),
        bigrams AS (
          SELECT unnest({T.token_shingles_sql('text', 2)}) AS bg FROM documents),
        bg_counts AS (SELECT bg, count(*) AS c_bg FROM bigrams GROUP BY bg),
        n_bg AS (SELECT count(*) AS n FROM bigrams)
       SELECT bg, CAST(c_bg AS BIGINT) AS c_bg,
              floor((CAST(c_bg AS DOUBLE) * (SELECT CAST(n AS DOUBLE) FROM n_tok)
                     * (SELECT CAST(n AS DOUBLE) FROM n_tok))
                    / ((SELECT CAST(n AS DOUBLE) FROM n_bg)
                       * CAST(a.c_tok AS DOUBLE) * CAST(b.c_tok AS DOUBLE))
                    * 1000000.0) / 1000000.0 AS lift
       FROM bg_counts
       JOIN tok_counts a ON string_split(bg, ' ')[1] = a.tok
       JOIN tok_counts b ON string_split(bg, ' ')[2] = b.tok
       WHERE c_bg >= 20
       ORDER BY lift DESC, bg LIMIT 50""",
    "collocation mining by pointwise lift (PMI without the "
    "non-portable log): P(ab)/(P(a)P(b)) over the corpus token stream, "
    "top-50 sticky bigrams — vocabulary aggregates are tiny and "
    "broadcast into the bigram table; the token stream is read once",
)
def q116(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    toks = d.select(F.explode(T.tokens("text")).alias("tok"))
    tok_counts = toks.groupBy("tok").agg(F.count("*").alias("c_tok"))
    bigrams = d.select(F.explode(T.token_shingles("text", 2)).alias("bg"))
    bg_counts = bigrams.groupBy("bg").agg(F.count("*").alias("c_bg"))
    # Totals derive from the COUNTS tables (sum of per-token counts ==
    # token total), not from re-aggregating the exploded corpus: the
    # 1-row totals were separate corpus-explode aggregates whose reuse
    # depended on runtime exchange canonicalization (r7 re-execution
    # audit).  Aggregating the (vocabulary-sized) counts tables costs
    # nothing and removes the dependence at any scale.
    n_tok = tok_counts.agg(F.sum("c_tok").cast("double").alias("_n_tok"))
    n_bg = bg_counts.agg(F.sum("c_bg").cast("double").alias("_n_bg"))
    # alias-after-join (r6 canonicalization rule): projecting tok ->
    # _ta / _tb BELOW the join broke subtree equality, so the token-
    # count aggregate executed once per side; identical aliased frames
    # let the runtime reuse one exchange for both lookups
    a = tok_counts.alias("_qa")
    b = tok_counts.alias("_qb")
    split = F.split(F.col("bg"), " ")
    lift = (
        F.floor(
            (F.col("c_bg").cast("double") * F.col("_n_tok") * F.col("_n_tok"))
            / (
                F.col("_n_bg")
                * F.col("_qa.c_tok").cast("double")
                * F.col("_qb.c_tok").cast("double")
            )
            * 1000000.0
        )
        / 1000000.0
    )
    return (
        bg_counts.filter(F.col("c_bg") >= 20)
        .join(F.broadcast(a), split.getItem(0) == F.col("_qa.tok"))
        .join(F.broadcast(b), split.getItem(1) == F.col("_qb.tok"))
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_bg))
        .select("bg", F.col("c_bg").cast("long").alias("c_bg"), lift.alias("lift"))
        .orderBy(F.desc("lift"), "bg")
        .limit(50)
    )


@register(
    "q117_decontamination",
    f"""WITH eval_sh AS (
          SELECT DISTINCT unnest(list_distinct({T.token_shingles_sql('text', 5)})) AS sh
          FROM documents WHERE doc_id % 10 = 0),
        train_sh AS (
          SELECT doc_id, unnest(list_distinct({T.token_shingles_sql('text', 5)})) AS sh
          FROM documents WHERE doc_id % 10 != 0)
       SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
       FROM train_sh t JOIN eval_sh e ON t.sh = e.sh
       GROUP BY t.doc_id""",
    "benchmark decontamination (the eval-leakage scan every training "
    "corpus needs): training docs flagged by the number of 5-token "
    "shingles they share with the held-out eval set — an equi-join on "
    "shingle strings, so the work scales with shingle volume, and the "
    "(small) eval shingle set is broadcast to the training scan",
)
def q117(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    sh5 = F.array_distinct(T.token_shingles("text", 5))
    eval_sh = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select(F.explode(sh5).alias("sh"))
        .distinct()
    )
    train_sh = d.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", F.explode(sh5).alias("sh")
    )
    return (
        train_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )


@register(
    "q118_grouped_reservoir",
    f"""SELECT lang, doc_id, CAST(rk AS INTEGER) AS rk FROM (
          SELECT lang, doc_id,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {hex_hash64_sql("'res' || '|' || CAST(doc_id AS VARCHAR)")},
                            doc_id) AS rk
          FROM documents)
       WHERE rk <= 5""",
    "fixed-size per-stratum sample: exactly 5 docs per language by "
    "smallest hash(id) draw (deterministic reservoir — rate-based "
    "sampling under/overshoots small strata); one window shuffle, "
    "rank filter streams so no group materializes whole",
)
def q118(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sampling import grouped_hash_reservoir

    d = load_table(spark, sf, "documents").select("lang", "doc_id")
    return grouped_hash_reservoir(d, "doc_id", "lang", k=5)


@register(
    "q119_argmax_customer",
    """SELECT c_mktsegment, richest, CAST(max_bal AS DOUBLE) AS max_bal FROM (
         SELECT c_mktsegment, c_name AS richest, c_acctbal AS max_bal,
                row_number() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal DESC, c_custkey DESC) AS rk
         FROM customer) WHERE rk = 1""",
    "argmax as a single aggregate: the customer holding each segment's "
    "max balance via max_by over a (balance, custkey) struct — one "
    "map-side-combinable aggregation, no window, no self-join (the "
    "oracle states the same semantics as a row_number subquery)",
)
def q119(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    key = F.struct(F.col("c_acctbal"), F.col("c_custkey"))
    return c.groupBy("c_mktsegment").agg(
        F.max_by("c_name", key).alias("richest"),
        F.max("c_acctbal").cast("double").alias("max_bal"),
    )


INTERVAL_BUCKET_DAYS = 32


@register(
    "q120_interval_overlap",
    """WITH a AS (SELECT l_orderkey AS a_key, l_suppkey AS a_supp,
                        CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS a_lo,
                        CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)
                          + CAST(l_quantity AS BIGINT) % 30 + 1 AS a_hi
                 FROM lineitem WHERE l_suppkey % 50 = 0),
         b AS (SELECT l_orderkey AS b_key, l_suppkey AS b_supp,
                      CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS b_lo,
                      CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)
                        + CAST(l_quantity AS BIGINT) % 30 + 1 AS b_hi
               FROM lineitem WHERE l_suppkey % 50 = 1)
       SELECT a_supp, b_supp, count(*) AS n_overlaps
       FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi
       GROUP BY a_supp, b_supp""",
    "interval overlap join without the cross product: both sides "
    "explode shipment windows ([shipdate, shipdate + quantity-derived "
    "handling days]) to 32-day buckets, meet on an equi-join, and each "
    "overlapping pair is attributed to exactly one bucket (where the "
    "later interval starts) — the oracle is the naive quadratic join, "
    "proving the bucketed plan finds the identical pair set",
)
def q120(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.rangejoin import interval_overlap_join

    li = load_table(spark, sf, "lineitem")
    days = lambda c: F.datediff(F.col(c), F.lit("1970-01-01").cast("date")).cast("long")
    span = F.col("l_quantity").cast("long") % 30 + 1
    a = li.filter(F.col("l_suppkey") % 50 == 0).select(
        F.col("l_orderkey").alias("a_key"),
        F.col("l_suppkey").alias("a_supp"),
        days("l_shipdate").alias("a_lo"),
        (days("l_shipdate") + span).alias("a_hi"),
    )
    b = li.filter(F.col("l_suppkey") % 50 == 1).select(
        F.col("l_orderkey").alias("b_key"),
        F.col("l_suppkey").alias("b_supp"),
        days("l_shipdate").alias("b_lo"),
        (days("l_shipdate") + span).alias("b_hi"),
    )
    pairs = interval_overlap_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", INTERVAL_BUCKET_DAYS
    )
    return pairs.groupBy("a_supp", "b_supp").agg(F.count("*").alias("n_overlaps"))


@register(
    "q121_rolling_distinct_users",
    """WITH du AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id
                  FROM events),
        days AS (SELECT DISTINCT day FROM du)
       SELECT d.day, count(DISTINCT u.user_id) AS n_users_7d
       FROM days d JOIN du u
         ON CAST(u.day AS DATE) BETWEEN CAST(d.day AS DATE) - 6
                                    AND CAST(d.day AS DATE)
       GROUP BY d.day""",
    "trailing-7-day distinct users per day (the hardest dashboard "
    "metric to window: COUNT DISTINCT does not decompose over sliding "
    "frames).  Scale shape: events collapse to distinct (day, user) "
    "pairs first, each pair EXPLODES to the <=7 target days it serves "
    "(bounded replication of the small distinct set, never of raw "
    "events), then one count_distinct per day — the oracle is the "
    "naive day x pair range join",
)
def q121(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.deterministic import day_str

    ev = load_events_range(spark, sf)
    du = ev.select(day_str("ts").alias("day"), "user_id").distinct()
    contrib = du.select(
        F.explode(
            F.sequence(
                F.to_date("day"), F.date_add(F.to_date("day"), 6)
            )
        ).alias("_tday"),
        "user_id",
    )
    days = du.select(F.to_date("day").alias("_tday")).distinct()
    return (
        contrib.join(days, "_tday")
        .groupBy(F.date_format("_tday", "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("n_users_7d"))
    )


@register(
    "q122_zscore_stats",
    """WITH cents AS (
         SELECT event_type,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         FROM events),
       stats AS (
         SELECT event_type, count(*) AS n,
                CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
         FROM cents GROUP BY event_type)
       SELECT s.event_type, s.n,
              floor(CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE) * 1000000.0)
                / 1000000.0 AS mean_cents,
              floor(sqrt((CAST(s.s2 AS DOUBLE)
                          - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE)
                            / CAST(s.n AS DOUBLE))
                         / CAST(s.n AS DOUBLE)) * 1000000.0) / 1000000.0
                AS stddev_cents,
              CAST(sum(CASE WHEN abs(CAST(c.c AS DOUBLE)
                                     - CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
                             > 2.0 * sqrt((CAST(s.s2 AS DOUBLE)
                                           - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE)
                                             / CAST(s.n AS DOUBLE))
                                          / CAST(s.n AS DOUBLE))
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_beyond_2sigma
       FROM cents c JOIN stats s ON c.event_type = s.event_type
       GROUP BY s.event_type, s.n, s.s1, s.s2""",
    "group-wise standardization (z-score featurization): per-type "
    "mean/stddev from EXACT integer-cent sums (one partial-aggregated "
    "pass), then a second pass counts 2-sigma outliers against the "
    "broadcast stats — every double op (divide, sqrt, multiply) is a "
    "single correctly-rounded IEEE step from exact integers, so both "
    "engines produce bit-identical statistics",
)
def q122(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.deterministic import dec

    ev = load_events_range(spark, sf)
    cents = ev.select(
        "event_type", (dec("value", 2) * 100).cast("long").alias("c")
    )
    stats = cents.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    s1d, nd = F.col("s1").cast("double"), F.col("n").cast("double")
    mean = s1d / nd
    var = (F.col("s2").cast("double") - s1d * s1d / nd) / nd
    sd = F.sqrt(var)
    joined = cents.join(F.broadcast(stats), "event_type")
    beyond = F.when(
        F.abs(F.col("c").cast("double") - mean) > 2.0 * sd, 1
    ).otherwise(0)
    return (
        joined.groupBy("event_type", "n", "s1", "s2")
        .agg(F.sum(beyond).cast("long").alias("n_beyond_2sigma"))
        .select(
            "event_type",
            "n",
            (F.floor(mean * 1000000.0) / 1000000.0).alias("mean_cents"),
            (F.floor(sd * 1000000.0) / 1000000.0).alias("stddev_cents"),
            "n_beyond_2sigma",
        )
    )


@register(
    "q123_gap_fill_hours",
    f"""WITH counts AS (
          SELECT {bucket_str_sql('ts', 60)} AS hour, count(*) AS n_events
          FROM events GROUP BY 1),
        bounds AS (
          SELECT min(time_bucket(INTERVAL '60 minutes', ts)) AS lo,
                 max(time_bucket(INTERVAL '60 minutes', ts)) AS hi
          FROM events),
        grid AS (
          SELECT strftime(unnest(generate_series(lo, hi, INTERVAL '1 hour')),
                          '%Y-%m-%d %H:%M:%S') AS hour
          FROM bounds)
       SELECT g.hour, CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events
       FROM grid g LEFT JOIN counts c ON g.hour = c.hour""",
    "time-grid gap filling: hourly counts joined onto a generated "
    "continuous hour grid (sequence + explode of the two-row bounds "
    "aggregate), missing hours emitted as explicit zeros — the "
    "timeseries-completion op every monitoring/forecast pipeline "
    "needs; grid size is (time span / grain), independent of event "
    "volume",
)
def q123(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.deterministic import bucket_str

    ev = load_events_range(spark, sf)
    counts = ev.groupBy(bucket_str("ts", 60).alias("hour")).agg(
        F.count("*").alias("n_events")
    )
    bounds = ev.agg(
        F.min(F.date_trunc("hour", F.col("ts"))).alias("lo"),
        F.max(F.date_trunc("hour", F.col("ts"))).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("_h")
    ).select(F.date_format("_h", "yyyy-MM-dd HH:mm:ss").alias("hour"))
    return grid.join(counts, "hour", "left").select(
        "hour", F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events")
    )


@register(
    "q124_first_touch",
    """WITH firsts AS (
         SELECT user_id, event_type AS first_type FROM (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rk
           FROM events) WHERE rk = 1)
       SELECT f.first_type, count(*) AS n_purchases
       FROM events e JOIN firsts f ON e.user_id = f.user_id
       WHERE e.event_type = 'purchase'
       GROUP BY f.first_type""",
    "first-touch attribution: every purchase credited to the type of "
    "its user's FIRST event — min_by over a (ts, event_id) struct "
    "collapses per-user history in one map-side-combinable aggregate "
    "(no window, no sort), then the small per-user table broadcasts "
    "into the purchase scan",
)
def q124(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    firsts = ev.groupBy("user_id").agg(
        F.min_by("event_type", F.struct(F.col("ts"), F.col("event_id"))).alias(
            "first_type"
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return (
        purchases.join(firsts, "user_id")
        .groupBy("first_type")
        .agg(F.count("*").alias("n_purchases"))
    )


@register(
    "q125_vocab_encode",
    """WITH toks AS (
         SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       vocab AS (
         SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS tok_id
         FROM toks GROUP BY tok),
       pos AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                generate_subscripts(string_split(text, ' '), 1) AS p
         FROM documents)
       SELECT pos.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
              CAST(sum(v.tok_id * pos.p) AS BIGINT) AS ids_checksum
       FROM pos JOIN vocab v ON pos.tok = v.tok
       GROUP BY pos.doc_id""",
    "vocabulary indexing (the tokenizer-dictionary build every training "
    "pipeline runs): dense token ids assigned by (frequency desc, token) "
    "via operators.topk.global_row_number — range-partitioned ranking "
    "with per-partition offsets, NOT a single-partition window, so a "
    "corpus-sized vocabulary ranks in parallel — then every document's "
    "token stream encoded to ids via a broadcast dictionary join; the "
    "position-weighted checksum pins the ENCODED SEQUENCE (ids in "
    "order), not just the bag, so any id/position drift hash-mismatches",
)
def q125(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    toks = d.select(F.explode(T.tokens("text")).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    vocab = K.global_row_number(
        counts, [F.desc("cnt"), F.col("tok")], out_col="tok_id"
    ).select("tok", "tok_id")
    pos = d.select(
        "doc_id", F.posexplode(T.tokens("text")).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    return (
        pos.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.col("tok_id") * F.col("p")).cast("long").alias("ids_checksum"),
        )
    )


@register(
    "q126_gaps_islands",
    """WITH seq AS (
         SELECT user_id, event_type, event_id, ts,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn,
                row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn_t
         FROM events)
       SELECT user_id, event_type,
              CAST(count(*) AS BIGINT) AS run_len,
              min(event_id) AS start_event_id
       FROM seq GROUP BY user_id, event_type, rn - rn_t
       HAVING count(*) >= 3""",
    "gaps-and-islands: maximal runs of consecutive same-type events per "
    "user via the classic row_number-difference grouping (two window "
    "ranks over the SAME partition-sort shuffle, zero self-joins), "
    "reporting runs of length >= 3 — the sequence-segmentation "
    "primitive behind streak/outage/session-quality analytics",
)
def q126(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "event_id",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("_grp"),
    )
    return (
        seq.groupBy("user_id", "event_type", "_grp")
        .agg(
            F.count("*").cast("long").alias("run_len"),
            F.min("event_id").alias("start_event_id"),
        )
        .filter(F.col("run_len") >= 3)
        .drop("_grp")
    )


@register(
    "q127_funnel_steps",
    """WITH v AS (SELECT user_id, min(ts) AS v0 FROM events
                 WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT v.user_id, min(e.ts) AS c0
              FROM v JOIN events e ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.v0 GROUP BY 1),
        p AS (SELECT c.user_id FROM c
              WHERE EXISTS (SELECT 1 FROM events e
                            WHERE e.user_id = c.user_id
                              AND e.event_type = 'purchase' AND e.ts > c.c0))
       SELECT (SELECT count(*) FROM v) AS n_viewed,
              (SELECT count(*) FROM c) AS n_clicked_after,
              (SELECT count(*) FROM p) AS n_purchased_after""",
    "strict-order 3-step funnel (view -> later click -> later "
    "purchase): each stage is one aggregate + one key join carrying "
    "only (user, first-ts) — stage tables shrink monotonically, so "
    "every join after the first is broadcast-sized; no window over the "
    "raw event stream, no interval nested loop",
)
def q127(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v0"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    c = (
        v.join(clicks, (F.col("user_id") == F.col("cu")) & (F.col("cts") > F.col("v0")))
        .groupBy("user_id")
        .agg(F.min("cts").alias("c0"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    p = c.join(
        purchases,
        (F.col("user_id") == F.col("pu")) & (F.col("pts") > F.col("c0")),
        "left_semi",
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after")))
    )


@register(
    "q128_except_all",
    """WITH early AS (SELECT o_custkey FROM orders
                     WHERE o_orderdate < DATE '1998-01-01'),
        late AS (SELECT o_custkey FROM orders
                 WHERE o_orderdate >= DATE '1998-01-01')
       SELECT o_custkey, count(*) AS n_excess FROM (
         SELECT o_custkey FROM early
         EXCEPT ALL
         SELECT o_custkey FROM late)
       GROUP BY o_custkey""",
    "bag-semantics EXCEPT ALL (multiplicity-aware difference, the set "
    "op q22's DISTINCT form cannot express): per-customer surplus of "
    "early-period orders over late-period orders via Spark's native "
    "exceptAll — internally a counted anti-semantics aggregation, one "
    "shuffle per side, no row-pair join",
)
def q128(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    early = o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("date")).select(
        "o_custkey"
    )
    late = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date")).select(
        "o_custkey"
    )
    return early.exceptAll(late).groupBy("o_custkey").agg(
        F.count("*").alias("n_excess")
    )


@register(
    "q129_equidepth_hist",
    """WITH r AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
                         o_orderkey,
                         row_number() OVER (
                           ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
                                    o_orderkey) AS rn
                  FROM orders),
        n AS (SELECT count(*) AS c FROM r),
        t AS (SELECT CAST(i AS INTEGER) AS decile, (i * c + 9) // 10 AS tr
              FROM range(1, 11) s(i) CROSS JOIN n)
       SELECT decile, r.cents AS boundary_cents
       FROM t JOIN r ON r.rn = t.tr""",
    "equi-depth histogram: exact decile boundaries of order totals via "
    "operators.topk.global_row_number (range-partitioned rank + "
    "per-partition offsets) — the input is NEVER funneled through a "
    "single-partition ORDER BY window; boundary ranks ceil(i*n/10) are "
    "pure integer arithmetic on a 10-row broadcast table. Equi-depth "
    "bins are the physical-design primitive behind range-partition "
    "splits, AQE-style skew detection, and drift monitoring (q95's "
    "fixed-width bins are its cheap cousin)",
)
def q129(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    r = o.select(cents.alias("cents"), "o_orderkey")
    ranked = K.global_row_number(
        r, [F.col("cents"), F.col("o_orderkey")], out_col="rn"
    )
    n = r.agg(F.count("*").alias("c"))
    targets = (
        spark.range(1, 11)
        .select(F.col("id").cast("int").alias("decile"))
        .crossJoin(n)
        .select("decile", F.expr("(decile * c + 9) div 10").alias("tr"))
    )
    return ranked.join(F.broadcast(targets), F.col("rn") == F.col("tr")).select(
        "decile", F.col("cents").alias("boundary_cents")
    )


@register(
    "q130_ewma_po2",
    """WITH s AS (SELECT user_id, event_id, ts,
                         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                  FROM events),
        l AS (SELECT user_id, ts, event_id,
                     cents * 128
                     + coalesce(lag(cents, 1) OVER w * 64, 0)
                     + coalesce(lag(cents, 2) OVER w * 32, 0)
                     + coalesce(lag(cents, 3) OVER w * 16, 0)
                     + coalesce(lag(cents, 4) OVER w * 8, 0)
                     + coalesce(lag(cents, 5) OVER w * 4, 0)
                     + coalesce(lag(cents, 6) OVER w * 2, 0)
                     + coalesce(lag(cents, 7) OVER w * 1, 0) AS ewma_num,
                     128
                     + CASE WHEN lag(cents, 1) OVER w IS NULL THEN 0 ELSE 64 END
                     + CASE WHEN lag(cents, 2) OVER w IS NULL THEN 0 ELSE 32 END
                     + CASE WHEN lag(cents, 3) OVER w IS NULL THEN 0 ELSE 16 END
                     + CASE WHEN lag(cents, 4) OVER w IS NULL THEN 0 ELSE 8 END
                     + CASE WHEN lag(cents, 5) OVER w IS NULL THEN 0 ELSE 4 END
                     + CASE WHEN lag(cents, 6) OVER w IS NULL THEN 0 ELSE 2 END
                     + CASE WHEN lag(cents, 7) OVER w IS NULL THEN 0 ELSE 1 END AS ewma_den
              FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT user_id, ewma_num, ewma_den FROM (
         SELECT user_id, ewma_num, ewma_den,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rk
         FROM l) WHERE rk = 1""",
    "exponential moving average with power-of-two weights (alpha = 1/2, "
    "8-tap truncated horizon): weights 128..1 over the trailing window "
    "make numerator and denominator exact int64 — no pow(), no float "
    "accumulation drift, bit-portable. One partition-sort window "
    "computes all 8 lags; the per-user latest row is picked by max_by "
    "over the SAME shuffle (groupBy on the window's partition key "
    "re-uses its partitioning). The oracle states identical semantics "
    "with explicit lag()s + a row_number subquery",
)
def q130(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    seq = ev.select("user_id", "event_id", "ts", cents.alias("cents"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.col("cents") * 128
    den = F.lit(128)
    for j in range(1, 8):
        lv = F.lag("cents", j).over(w)
        wt = 1 << (7 - j)
        num = num + F.coalesce(lv * wt, F.lit(0))
        den = den + F.when(lv.isNull(), 0).otherwise(wt)
    scored = seq.select(
        "user_id", "ts", "event_id",
        num.alias("ewma_num"), den.alias("ewma_den"),
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("ewma_num", "ewma_den"), F.struct("ts", "event_id")
            ).alias("s")
        )
        .select("user_id", "s.ewma_num", "s.ewma_den")
    )


@register(
    "q131_mad_outliers",
    """WITH s AS (SELECT event_type,
                         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                  FROM events),
        m AS (SELECT event_type, median(cents) AS med FROM s GROUP BY 1),
        j AS (SELECT s.event_type, s.cents, m.med,
                     abs(s.cents - m.med) AS adev
              FROM s JOIN m USING (event_type)),
        d AS (SELECT event_type, median(adev) AS mad FROM j GROUP BY 1)
       SELECT j.event_type,
              CAST(min(j.med) AS DOUBLE) AS med_cents,
              CAST(min(d.mad) AS DOUBLE) AS mad_cents,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN j.adev > 3 * d.mad THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_outliers
       FROM j JOIN d USING (event_type)
       GROUP BY 1""",
    "robust outlier detection by median absolute deviation: per-type "
    "exact median (Spark's native sort-based F.median — contrast q90's "
    "applyInPandas path), broadcast join back, median of absolute "
    "deviations, then count |x - med| > 3*MAD. All inputs are integer "
    "cents so both medians land on k/2 / k/4 grid points — exactly "
    "representable doubles, deterministic across engines. The 3-sigma "
    "rule on MAD is the standard heavy-tail-safe data-quality gate "
    "(mean/stddev breaks down under the very outliers it hunts)",
)
def q131(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    s = ev.select("event_type", cents.alias("cents"))
    med = s.groupBy("event_type").agg(F.median("cents").alias("med"))
    j = s.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med"))
    )
    mad = j.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        j.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("med_cents"),
            F.min("mad").alias("mad_cents"),
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


@register(
    "q132_seasonal_hotspots",
    """WITH b AS (SELECT event_type,
                         CAST(dayofweek(ts) * 24 + hour(ts) AS INTEGER) AS how,
                         count(*) AS n,
                         sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sum_cents
                  FROM events GROUP BY 1, 2)
       SELECT event_type, how, CAST(n AS BIGINT) AS n,
              CAST(sum_cents AS BIGINT) AS sum_cents
       FROM (SELECT *, row_number() OVER (
                         PARTITION BY event_type
                         ORDER BY CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE) DESC,
                                  how) AS rk
             FROM b)
       WHERE rk <= 3""",
    "seasonal hour-of-week profile: per (event_type, hour-of-week) "
    "exact integer-cent aggregates, then the top-3 hottest hours by "
    "mean value. The raw scan reduces to at most |types| x 168 rows "
    "BEFORE any window — the row_number runs on the aggregate, not the "
    "events. Mean ordering divides two exact int64s (one IEEE op, "
    "portable); hour-of-week aligns Spark's dayofweek()-1 with DuckDB's "
    "Sunday=0 numbering. This is the baseline table behind q123's gap "
    "fill and any seasonality-aware anomaly alarm",
)
def q132(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    how = ((F.dayofweek("ts") - 1) * 24 + F.hour("ts")).cast("int")
    b = (
        ev.select("event_type", how.alias("how"), cents.alias("cents"))
        .groupBy("event_type", "how")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            (F.col("sum_cents").cast("double") / F.col("n").cast("double")).desc(),
            "how",
        )
    )
    return b.withColumn("rk", rk).filter(F.col("rk") <= 3).drop("rk")


@register(
    "q133_autocorr_terms",
    """WITH s AS (SELECT user_id, ts, event_id,
                         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                  FROM events),
        p AS (SELECT user_id, cents AS x,
                     lead(cents) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS y
              FROM s)
       SELECT user_id,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(sum(x) AS BIGINT) AS s_x,
              CAST(sum(y) AS BIGINT) AS s_y,
              CAST(sum(x * x) AS BIGINT) AS s_xx,
              CAST(sum(y * y) AS BIGINT) AS s_yy,
              CAST(sum(x * y) AS BIGINT) AS s_xy
       FROM p WHERE y IS NOT NULL
       GROUP BY 1 HAVING count(*) >= 2""",
    "lag-1 autocorrelation sufficient statistics per user: consecutive "
    "(x, next-x) value pairs from one lead() window, reduced to the six "
    "exact int64 moment sums (n, Sx, Sy, Sxx, Syy, Sxy) from which "
    "Pearson r is one driver-side division — the engine ships "
    "bit-portable integers, never a float correlation. cents^2 * pairs "
    "stays far inside int64. The window and the groupBy share the "
    "user_id shuffle; autocorrelation of per-user value streams is the "
    "standard signal for bot/replay detection in event pipelines",
)
def q133(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        "user_id",
        cents.alias("x"),
        F.lead(cents).over(w).alias("y"),
    ).filter(F.col("y").isNotNull())
    return (
        p.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("x").alias("s_x"),
            F.sum("y").alias("s_y"),
            F.sum(F.col("x") * F.col("x")).alias("s_xx"),
            F.sum(F.col("y") * F.col("y")).alias("s_yy"),
            F.sum(F.col("x") * F.col("y")).alias("s_xy"),
        )
        .filter(F.col("n_pairs") >= 2)
    )


@register(
    "q134_markov_transitions",
    """WITH t AS (SELECT event_type,
                         lead(event_type) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS next_type
                  FROM events),
        c AS (SELECT event_type, next_type, count(*) AS cnt
              FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2)
       SELECT event_type, CAST(n_transitions AS BIGINT) AS n_transitions,
              top_next, CAST(top_cnt AS BIGINT) AS top_cnt
       FROM (SELECT event_type,
                    sum(cnt) OVER (PARTITION BY event_type) AS n_transitions,
                    next_type AS top_next, cnt AS top_cnt,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY cnt DESC, next_type DESC) AS rk
             FROM c) WHERE rk = 1""",
    "first-order Markov transition model over per-user event streams: "
    "lead() pairs each event with its successor (one user-keyed "
    "partition-sort), transition counts reduce to a |types|^2 matrix, "
    "and each state's most likely successor is a single max_by over a "
    "(count, next_type) struct — map-side-combinable, no second window "
    "over the raw stream. The oracle states the same argmax as a "
    "row_number subquery (DuckDB's arg_max can't take a composite "
    "ordering key). Next-event prediction tables drive autocomplete, "
    "prefetching, and anomalous-sequence alarms",
)
def q134(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = t.groupBy("event_type", "next_type").agg(F.count("*").alias("cnt"))
    return (
        c.groupBy("event_type")
        .agg(
            F.sum("cnt").alias("n_transitions"),
            F.max_by(
                F.struct(
                    F.col("next_type").alias("top_next"),
                    F.col("cnt").alias("top_cnt"),
                ),
                F.struct("cnt", "next_type"),
            ).alias("s"),
        )
        .select("event_type", "n_transitions", "s.top_next", "s.top_cnt")
    )


@register(
    "q135_grid_radius_join",
    f"""WITH p AS (SELECT c_custkey AS id,
                          {hex_hash64_sql("CAST(c_custkey AS VARCHAR)", salt="x")} % 1000000 AS x,
                          {hex_hash64_sql("CAST(c_custkey AS VARCHAR)", salt="y")} % 1000000 AS y
                   FROM customer)
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(min((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
                    AS BIGINT) AS min_d2,
               CAST(sum((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
                    AS BIGINT) AS sum_d2
        FROM p a JOIN p b ON a.id < b.id
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= 100000000""",
    "spatial radius self-join (all point pairs within R) via "
    "operators.spatial.grid_radius_pairs: points bucket into R-sized "
    "grid cells, one side replicates to its 3x3 neighborhood (bounded "
    "x9, never data-dependent), pairs meet on a cell equi-join and an "
    "exact integer d2 <= R^2 predicate — each qualifying pair meets on "
    "exactly one cell offset, so no dedup. The oracle is the O(n^2) "
    "cross join stating identical semantics; the grid plan is the one "
    "that survives 100 TB. Coordinates are md5-derived micro-grid "
    "integers so both engines synthesize identical points; supplies the "
    "geo join the reference's geocoded_hospital_address column implies "
    "but never gets (design_table_schema.ipynb cell 1)",
)
def q135(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (T.hex_hash64(F.col("c_custkey").cast("string"), salt="x")
         % 1_000_000).alias("x"),
        (T.hex_hash64(F.col("c_custkey").cast("string"), salt="y")
         % 1_000_000).alias("y"),
    )
    pairs = SP.grid_radius_pairs(pts, "id", "x", "y", radius=10_000)
    return pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.min("d2").alias("min_d2"),
        F.sum("d2").alias("sum_d2"),
    )


@register(
    "q136_ab_arms",
    f"""SELECT event_type,
               CAST({hex_hash64_sql("CAST(user_id AS VARCHAR)", salt="exp1")} % 2
                    AS INTEGER) AS arm,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM events GROUP BY 1, 2""",
    "deterministic A/B experiment assignment: users land in arms by "
    "salted md5 parity — stable across reruns and engines, no stored "
    "assignment table, new users route themselves (the hash-bucketing "
    "contract behind every feature-flag system); per (metric, arm) "
    "exact event/user/value aggregates are the z-test inputs, shipped "
    "as integers. Changing the salt re-randomizes every membership — "
    "which is exactly why the salt is part of the experiment identity",
)
def q136(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    arm = (
        T.hex_hash64(F.col("user_id").cast("string"), salt="exp1") % 2
    ).cast("int")
    return (
        ev.select("event_type", arm.alias("arm"), "user_id", cents.alias("cents"))
        .groupBy("event_type", "arm")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum("cents").alias("sum_cents"),
        )
    )


# ---------------------------------------------------------------------------
# graph analytics on a deterministic synthetic social graph
# ---------------------------------------------------------------------------
#
# The reference's only graph-adjacent structure is the hospital FK web
# (design_table_schema.ipynb cells 0-3); these queries supply the graph
# operator family a 100 TB entity graph needs.  Nodes are customers;
# each node picks 3 deterministic md5-hash neighbors, so both engines
# synthesize the identical edge set at any scale factor.

_GRAPH_DEG = 3


def _graph_edges_sql() -> str:
    """CTE prefix (nn, e0, e) building the canonical undirected edges."""
    picks = "\n         UNION ALL ".join(
        f"SELECT c_custkey AS u, 1 + ({hex_hash64_sql('CAST(c_custkey AS VARCHAR)', salt=f'g{i}')} % nn.n) AS v"
        f" FROM customer, nn"
        for i in range(_GRAPH_DEG)
    )
    return f"""nn AS (SELECT count(*) AS n FROM customer),
       e0 AS ({picks}),
       e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
             FROM e0 WHERE u <> v)"""


def _graph_edges(spark: SparkSession, sf: str):
    from ..operators.graph import canonical_edges

    c = load_table(spark, sf, "customer").select("c_custkey")
    # node count as a broadcast 1-row aggregate, not a driver .count()
    # literal — one job, no driver round-trip (q93/q161/q166 idiom).
    nn = c.agg(F.count("*").alias("_nn"))
    picks = F.array(
        *[
            (
                T.hex_hash64(F.col("c_custkey").cast("string"), salt=f"g{i}")
                % F.col("_nn")
                + 1
            )
            for i in range(_GRAPH_DEG)
        ]
    )
    e0 = c.crossJoin(F.broadcast(nn)).select(
        F.col("c_custkey").alias("u"), F.explode(picks).alias("v")
    )
    return canonical_edges(e0, "u", "v")


@register(
    "q137_triangle_count",
    f"""WITH {_graph_edges_sql()},
       nodes AS (SELECT a AS x FROM e UNION SELECT b FROM e),
       tri AS (SELECT count(*) AS t
               FROM e e1
               JOIN e e2 ON e2.a = e1.b
               JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
       SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
              (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
              (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles""",
    "exact triangle count (operators/graph.py:triangle_count) by degree "
    "orientation ('compact-forward'): every edge points from its lower- "
    "to its higher-(degree, id) endpoint, so the wedge self-join fans "
    "out O(sqrt(m)) per node instead of O(max-degree) — the bound that "
    "keeps power-law graphs (the 100 TB social/web case) tractable; the "
    "closing edge is one semi-join back to the edge set.  Three "
    "shuffles, no iteration.  The oracle states the naive a<b<c triple "
    "join over the same deterministic hash-synthesized graph.  Triangle "
    "count = the clustering-coefficient numerator, the standard "
    "community-structure / spam-subgraph signal",
)
def q137(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import triangle_count

    return triangle_count(_graph_edges(spark, sf))


@register(
    "q138_bfs_levels",
    f"""WITH RECURSIVE {_graph_edges_sql()},
       sym AS (SELECT a AS src, b AS dst FROM e
               UNION ALL SELECT b, a FROM e),
       r AS (SELECT CAST(1 AS BIGINT) AS node, 0 AS lvl
             UNION ALL
             SELECT sym.dst, r.lvl + 1
             FROM r JOIN sym ON sym.src = r.node WHERE r.lvl < 4)
       SELECT node, CAST(min(lvl) AS INTEGER) AS lvl FROM r GROUP BY node""",
    "minimum-hop BFS levels from a seed node (operators/graph.py:"
    "bfs_levels): proper frontier expansion — each round joins only the "
    "newest frontier against the edge list and anti-joins the visited "
    "set, so total work is O(edges x depth) and the plan stays flat via "
    "localCheckpoint per round.  The oracle is the recursive-CTE form, "
    "which enumerates WALKS (its row count grows with path "
    "multiplicity, fine only at small depth) — stating exactly why the "
    "frontier algorithm is the one that scales.  Reachability-within-k "
    "drives fraud rings, org charts, and lineage queries",
)
def q138(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import bfs_levels, symmetrize

    edges = _graph_edges(spark, sf)
    # one-pass explode symmetrization: the two-branch union form ran
    # the edge builder (scan+explode+DISTINCT) once per branch before
    # bfs_levels' checkpoint could materialize it
    sym = symmetrize(edges, "a", "b", distinct=False)
    return bfs_levels(sym, seed=1, max_depth=4)


@register(
    "q139_weighted_median",
    """WITH per AS (
         SELECT l_returnflag AS flag,
                CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
                sum(CAST(l_quantity AS BIGINT)) AS w
         FROM lineitem GROUP BY 1, 2),
       cum AS (
         SELECT flag, cents,
                sum(w) OVER (PARTITION BY flag ORDER BY cents) AS cw,
                sum(w) OVER (PARTITION BY flag) AS tot
         FROM per)
       SELECT flag, CAST(min(cents) AS BIGINT) AS weighted_median,
              CAST(max(tot) AS BIGINT) AS total_weight
       FROM cum WHERE 2 * cw >= tot GROUP BY flag""",
    "exact quantity-weighted median of line price per return flag "
    "(operators/profile.py:grouped_weighted_median): rows pre-aggregate "
    "per (key, value) — map-side combinable, ties collapse before any "
    "sort — then one cumulative-weight window finds the smallest value "
    "whose cumulative weight reaches half the total (2*cum >= total, "
    "all-integer).  One shuffle, no Python boundary, no per-group "
    "vector materialization — contrast q90's applyInPandas median: this "
    "is the form a hot key cannot OOM.  Weighted medians are the "
    "robust 'typical price paid' (volume-weighted) statistic",
)
def q139(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profile import grouped_weighted_median

    li = load_table(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return grouped_weighted_median(li, "flag", "cents", "qty").select(
        "flag",
        F.col("weighted_median").cast("long").alias("weighted_median"),
        F.col("total_weight").cast("long").alias("total_weight"),
    )


@register(
    "q140_cusum_days",
    """WITH daily AS (
         SELECT strftime(ts, '%Y-%m-%d') AS day,
                sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS x
         FROM events GROUP BY 1),
       seq AS (
         SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM daily),
       base AS (
         SELECT day, x, rn,
                (sum(CASE WHEN rn <= 7 THEN x END) OVER ()) // 7 AS mean_x
         FROM seq),
       c AS (
         SELECT day, x, mean_x,
                sum(x - mean_x) OVER (ORDER BY rn) AS cdev
         FROM base),
       s AS (
         SELECT day, x, mean_x,
                cdev - least(min(cdev) OVER (ORDER BY day), 0) AS s
         FROM c)
       SELECT day, CAST(x AS BIGINT) AS day_cents,
              CAST(s AS BIGINT) AS cusum_cents,
              CAST(s > mean_x AS BOOLEAN) AS drifted
       FROM s""",
    "one-sided CUSUM changepoint detector over daily event value: "
    "baseline = integer mean of the first 7 days, and the recursive "
    "S_i = max(0, S_{i-1} + dev_i) unrolls to the closed form "
    "C_i - min(0, min_j<=i C_j) — two windows over the day-grain "
    "aggregate, no recursion, exact integer cents.  The window is "
    "global but runs on the aggregate (one row per day), the same "
    "aggregate-then-window contract as q132; the raw event scan never "
    "sees a window.  Drift flag is scale-relative (S > baseline mean) "
    "so the same query is meaningful at every sf.  CUSUM is the "
    "classic sequential drift alarm for pipeline monitoring",
)
def q140(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.deterministic import day_str

    ev = load_events_range(spark, sf)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    daily = ev.groupBy(day_str("ts").alias("day")).agg(F.sum(cents).alias("x"))
    w_all = Window.partitionBy()
    w_ord = Window.partitionBy().orderBy("day")
    seq = daily.withColumn("rn", F.row_number().over(w_ord))
    sf7 = F.sum(F.when(F.col("rn") <= 7, F.col("x"))).over(w_all)
    # exact integer mean: subtract the remainder, then the division is
    # exact in decimal (no fp rounding at any magnitude)
    base = seq.withColumn(
        "mean_x",
        ((sf7 - F.pmod(sf7, F.lit(7))).cast("decimal(38,0)") / 7).cast("long"),
    )
    c = base.withColumn("cdev", F.sum(F.col("x") - F.col("mean_x")).over(w_ord))
    s = c.withColumn(
        "s", F.col("cdev") - F.least(F.min("cdev").over(w_ord), F.lit(0))
    )
    return s.select(
        "day",
        F.col("x").cast("long").alias("day_cents"),
        F.col("s").cast("long").alias("cusum_cents"),
        (F.col("s") > F.col("mean_x")).alias("drifted"),
    )


@register(
    "q141_prefix_jaccard_pairs",
    f"""WITH sets AS (
         SELECT doc_id, list_distinct({T.token_shingles_sql('text', 3)}) AS s
         FROM documents)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
              CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
                   AS BIGINT) AS un
       FROM sets a JOIN sets b ON a.doc_id < b.doc_id
       WHERE len(a.s) + len(b.s) > 0
         AND len(list_intersect(a.s, b.s)) * 100
             >= 50 * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))""",
    "ALL near-dup pairs (3-shingle Jaccard >= 50%) with NO blocking key "
    "and zero false negatives, via prefix filtering (operators/dedup.py:"
    "prefix_filter_jaccard_pairs, the PPJoin family): tokens rank by "
    "global ascending frequency, and the prefix lemma guarantees any "
    "qualifying pair shares a token within each side's first "
    "|s|-ceil(t|s|)+1 rarest shingles — so the candidate join touches "
    "only rare-token keys and the hot stopword-shingle keys never join. "
    "Verification is exact integer cross-multiplication (inter*100 >= "
    "t*union).  Deterministic complement to MinHash-LSH (q51): same "
    "contract, no probabilistic misses.  The oracle states the O(n^2) "
    "all-pairs exact Jaccard the prefix filter provably equals",
)
def q141(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").select(
        "doc_id", F.array_distinct(T.token_shingles("text", 3)).alias("s")
    )
    return D.prefix_filter_jaccard_pairs(
        d, set_col="s", id_col="doc_id", threshold_pct=50
    ).select("id_a", "id_b", "inter", "un")


@register(
    "q142_source_checksums",
    f"""SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(bit_xor(h) AS BIGINT) AS xor_hash,
              CAST(sum(h % 1000000007) AS BIGINT) AS sum_mod
       FROM (SELECT source,
                    {hex_hash64_sql("CAST(doc_id AS VARCHAR) || '|' || text")} AS h
             FROM documents)
       GROUP BY source""",
    "order-insensitive per-partition content fingerprints (anti-entropy "
    "checksums): every row hashes to a 60-bit md5 integer; per source "
    "the row count, XOR of hashes, and modular hash sum are all "
    "commutative/associative aggregates — map-side combinable, "
    "shuffle-size O(partitions), bit-identical on any engine and any "
    "row order.  This is how replicas, migration targets, and "
    "warehouse copies are compared at 100 TB without moving data: ship "
    "the checksum triple, not the table (the reference's load counters, "
    "load_hhs.py:157-161, generalized to content equality)",
)
def q142(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    h = T.hex_hash64(
        F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text"))
    )
    return (
        d.select("source", h.alias("h"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
            F.sum(F.col("h") % 1000000007).cast("long").alias("sum_mod"),
        )
    )


@register(
    "q143_pareto_frontier",
    """WITH pp AS (
         SELECT CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS price_cents,
                p_size AS size, count(*) AS n
         FROM part GROUP BY 1, 2),
       ranked AS (
         SELECT price_cents, size, n,
                max(size) OVER (PARTITION BY price_cents) AS bs,
                max(size) OVER (ORDER BY price_cents
                                RANGE BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS rmax
         FROM pp)
       SELECT price_cents, CAST(size AS INTEGER) AS size,
              CAST(n AS BIGINT) AS n_parts
       FROM ranked
       WHERE size = bs AND (rmax IS NULL OR size > rmax)""",
    "2-D Pareto frontier (skyline operator: min price, max size, parts "
    "not dominated by any other): the O(n^2) NOT-EXISTS dominance test "
    "collapses to two windows over the DISTINCT (price, size) pairs — "
    "a pair is on the frontier iff it is the best size at its price "
    "AND strictly beats the best size among all strictly-cheaper "
    "prices (RANGE frame excludes price peers exactly).  The window "
    "runs on the aggregated pair set (bounded by the price domain, not "
    "the row count) — the aggregate-then-window contract; ties on both "
    "dimensions stay on the frontier together, matching dominance "
    "semantics precisely.  Skylines power product search and "
    "cost/quality tradeoff dashboards",
)
def q143(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part").select(
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_cents"),
        F.col("p_size").alias("size"),
    )
    pp = p.groupBy("price_cents", "size").agg(F.count("*").alias("n"))
    w_peer = Window.partitionBy("price_cents")
    w_cheaper = Window.orderBy("price_cents").rangeBetween(
        Window.unboundedPreceding, -1
    )
    ranked = pp.select(
        "price_cents",
        "size",
        "n",
        F.max("size").over(w_peer).alias("bs"),
        F.max("size").over(w_cheaper).alias("rmax"),
    )
    return ranked.filter(
        (F.col("size") == F.col("bs"))
        & (F.col("rmax").isNull() | (F.col("size") > F.col("rmax")))
    ).select(
        "price_cents",
        F.col("size").cast("int").alias("size"),
        F.col("n").cast("long").alias("n_parts"),
    )


@register(
    "q144_scd2_compress",
    """WITH per_day AS (
         SELECT o_custkey AS custkey, strftime(o_orderdate, '%Y-%m-%d') AS day,
                arg_max(o_orderpriority, o_orderkey) AS pri,
                count(*) AS n
         FROM orders GROUP BY 1, 2),
       chg AS (
         SELECT custkey, day, pri, n,
                lag(pri) OVER (PARTITION BY custkey ORDER BY day) AS prev
         FROM per_day)
       SELECT custkey,
              CAST(sum(n) AS BIGINT) AS n_orders,
              CAST(sum(CASE WHEN prev IS NULL OR pri <> prev THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_versions,
              arg_min(pri, day) AS first_pri,
              arg_max(pri, day) AS last_pri
       FROM chg GROUP BY custkey""",
    "SCD2 change compression (the construction inside operators/scd.py:"
    "scd2_apply, oracle-gated): a per-key snapshot stream collapses to "
    "versions that open only when the tracked attribute actually "
    "changes — same-day collisions resolve by max_by (deterministic "
    "last-writer), lag() detects the change boundary, and the per-key "
    "summary (orders seen, versions kept, first/last value) proves the "
    "compression.  One partition-sort shuffle after a map-combinable "
    "pre-aggregate; this is why an SCD2 dimension stays small while the "
    "snapshot stream grows without bound (the reference stores every "
    "quality snapshot as a full row, load_quality.py:119-126 — this is "
    "the shape that replaces it)",
)
def q144(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.deterministic import day_str

    o = load_table(spark, sf, "orders")
    per_day = (
        o.groupBy(
            F.col("o_custkey").alias("custkey"),
            day_str("o_orderdate").alias("day"),
        )
        .agg(
            F.max_by("o_orderpriority", "o_orderkey").alias("pri"),
            F.count("*").alias("n"),
        )
    )
    w = Window.partitionBy("custkey").orderBy("day")
    chg = per_day.withColumn("prev", F.lag("pri").over(w))
    return chg.groupBy("custkey").agg(
        F.sum("n").cast("long").alias("n_orders"),
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("pri") != F.col("prev")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_versions"),
        F.min_by("pri", "day").alias("first_pri"),
        F.max_by("pri", "day").alias("last_pri"),
    )


@register(
    "q145_sorted_neighborhood",
    """WITH ranked AS (
         SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
                row_number() OVER (ORDER BY c_name, c_custkey) AS rn
         FROM customer)
       SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
              CAST((CASE WHEN a.c_nationkey = b.c_nationkey THEN 2 ELSE 0 END)
                 + (CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END)
                 AS INTEGER) AS score
       FROM ranked a JOIN ranked b ON b.rn - a.rn BETWEEN 1 AND 2""",
    "sorted-neighborhood blocking for entity resolution (Hernandez-"
    "Stolfo): records sort once by the blocking key and only rank-"
    "adjacent pairs (window w=2) are compared — candidate count is O(n*w) "
    "instead of O(n^2), the classic alternative to hash blocking (q106) "
    "and LSH (q51) when near-matches sort together.  The global rank "
    "comes from operators/topk.py:global_row_number (range-partition + "
    "offset shift, NO single-partition window), and the rank-distance "
    "join becomes w equi-joins by replicating each row to rank+1..rank+w "
    "— bounded replication, never a nested-loop.  The oracle states the "
    "same pairs via a plain window + band self-join",
)
def q145(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    ranked = K.global_row_number(
        c, [F.col("c_name"), F.col("c_custkey")], out_col="rn"
    )
    w = 2
    left = ranked.select(
        F.explode(
            F.array(*[F.col("rn") + F.lit(j) for j in range(1, w + 1)])
        ).alias("rn_b"),
        F.col("c_custkey").alias("id_a"),
        F.col("c_nationkey").alias("nk_a"),
        F.col("c_mktsegment").alias("seg_a"),
    )
    right = ranked.select(
        F.col("rn").alias("rn_b"),
        F.col("c_custkey").alias("id_b"),
        F.col("c_nationkey").alias("nk_b"),
        F.col("c_mktsegment").alias("seg_b"),
    )
    score = (
        F.when(F.col("nk_a") == F.col("nk_b"), 2).otherwise(0)
        + F.when(F.col("seg_a") == F.col("seg_b"), 1).otherwise(0)
    ).cast("int")
    return left.join(right, "rn_b").select("id_a", "id_b", score.alias("score"))


@register(
    "q146_systematic_sample",
    """WITH ranked AS (
         SELECT o_orderkey,
                row_number() OVER (ORDER BY strftime(o_orderdate, '%Y-%m-%d'),
                                   o_orderkey) AS rn
         FROM orders)
       SELECT o_orderkey, CAST(rn AS BIGINT) AS rn
       FROM ranked WHERE rn % 97 = 1""",
    "deterministic systematic (every k-th) sampling on the global "
    "time-then-key order: rank via the scalable global_row_number "
    "(range partition + offset shift) and keep rn % 97 = 1 — the "
    "evenly-spaced longitudinal sample auditors and data-quality "
    "monitors want (every period represented proportionally), "
    "complementing hash sampling (q63: per-row independent), stratified "
    "quotas (q79), and weighted priority samples (q85).  Prime stride "
    "avoids aliasing with any periodic pattern in the sort key",
)
def q146(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.deterministic import day_str

    o = load_table(spark, sf, "orders").select(
        "o_orderkey", day_str("o_orderdate").alias("_day")
    )
    ranked = K.global_row_number(
        o, [F.col("_day"), F.col("o_orderkey")], out_col="rn"
    )
    return ranked.filter(F.col("rn") % 97 == 1).select(
        "o_orderkey", F.col("rn").cast("long").alias("rn")
    )


@register(
    "q147_latency_histogram",
    """WITH dt AS (
         SELECT epoch_us(ts)
                - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS dt_us
         FROM events),
       b AS (
         SELECT CASE WHEN dt_us <= 0 THEN 0
                     ELSE length(printf('%b', dt_us)) END AS bucket, dt_us
         FROM dt WHERE dt_us IS NOT NULL)
       SELECT CAST(bucket AS INTEGER) AS bucket,
              CAST(count(*) AS BIGINT) AS n,
              CAST(min(dt_us) AS BIGINT) AS min_us,
              CAST(max(dt_us) AS BIGINT) AS max_us
       FROM b GROUP BY bucket""",
    "exponential-bucket latency histogram of per-user inter-event gaps "
    "(the HdrHistogram/observability shape): bucket = position of the "
    "highest set bit (length of the binary rendering — pure integer, "
    "bit-portable; floor(log2) via fp log is NOT engine-stable near "
    "powers of two and is banned by the determinism contract).  One "
    "user-partitioned sort for the lag, then a map-combinable "
    "~64-bucket aggregate — constant-size output regardless of event "
    "volume, the right summary to ship from a 100 TB event store",
)
def q147(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = ev.select(
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("dt_us")
    ).filter(F.col("dt_us").isNotNull())
    bucket = (
        F.when(F.col("dt_us") <= 0, 0)
        .otherwise(F.length(F.bin("dt_us")))
        .cast("int")
    )
    return (
        dt.select(bucket.alias("bucket"), "dt_us")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("dt_us").cast("long").alias("min_us"),
            F.max("dt_us").cast("long").alias("max_us"),
        )
    )


@register(
    "q148_decay_attribution",
    """WITH p AS (
         SELECT event_id AS purchase_id, user_id, ts AS p_ts,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM events WHERE event_type = 'purchase'),
       c AS (
         SELECT user_id, event_id AS click_id, ts AS c_ts
         FROM events WHERE event_type = 'click'),
       pairs AS (
         SELECT p.purchase_id, p.cents, c.click_id, c.c_ts,
                CASE (epoch_us(p.p_ts) - epoch_us(c.c_ts)) // 28800000000
                     WHEN 0 THEN 8 WHEN 1 THEN 4 ELSE 2 END AS w
         FROM p JOIN c ON p.user_id = c.user_id
           AND epoch_us(c.c_ts) >= epoch_us(p.p_ts) - 86400000000
           AND epoch_us(c.c_ts) < epoch_us(p.p_ts)),
       tot AS (
         SELECT purchase_id, click_id, c_ts, cents, w,
                sum(w) OVER (PARTITION BY purchase_id) AS tw
         FROM pairs),
       shares AS (
         SELECT purchase_id, click_id, c_ts, cents, w, tw,
                (cents * w) // tw AS base,
                row_number() OVER (PARTITION BY purchase_id
                                   ORDER BY (cents * w) % tw DESC, click_id)
                  AS rr
         FROM tot),
       attr AS (
         SELECT click_id, c_ts,
                base + CASE WHEN rr <= cents - sum(base)
                       OVER (PARTITION BY purchase_id) THEN 1 ELSE 0 END
                  AS att
         FROM shares)
       SELECT CAST(extract(hour FROM c_ts) AS INTEGER) AS click_hour,
              CAST(count(*) AS BIGINT) AS n_attributions,
              CAST(sum(att) AS BIGINT) AS attributed_cents
       FROM attr GROUP BY 1""",
    "time-decay multi-touch attribution with EXACT integer "
    "apportionment: each purchase's cents split across the user's "
    "prior-24h clicks by power-of-two age weights (8/4/2 per 8h "
    "bucket), divided by largest-remainder — floor shares plus one "
    "extra cent to the rr largest remainders — so per-purchase "
    "attributed cents sum to the purchase EXACTLY (no fp leakage, the "
    "property finance teams audit).  The pair space comes from the "
    "bucketed range join (operators/rangejoin.py — equi-join on "
    "(user, time-bucket), never an interval nested loop); the "
    "apportionment windows partition by purchase_id, whose group size "
    "is bounded by one user's 24h click volume.  Contrast q124 "
    "(first-touch: min_by) and q104 (decay scores): this is the "
    "full-credit-assignment form",
)
def q148(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.rangejoin import bucketed_range_join

    ev = load_events_range(spark, sf)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        cents.alias("cents"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    pairs = bucketed_range_join(
        purchases, clicks, ["user_id"], "p_ts", "c_ts", -86400, 0
    )
    age_bucket = F.expr(
        "(unix_micros(p_ts) - unix_micros(c_ts)) div 28800000000"
    )
    w = (
        F.when(age_bucket == 0, 8).when(age_bucket == 1, 4).otherwise(2)
    ).cast("long")
    wp = Window.partitionBy("purchase_id")
    shares = pairs.select(
        "purchase_id", "click_id", "c_ts", "cents", w.alias("w")
    ).select(
        "*",
        F.sum("w").over(wp).alias("tw"),
    )
    shares = shares.select(
        "*",
        F.expr("(cents * w) div tw").alias("base"),
        F.row_number()
        .over(
            Window.partitionBy("purchase_id").orderBy(
                F.expr("(cents * w) % tw").desc(), F.col("click_id")
            )
        )
        .alias("rr"),
    )
    attr = shares.select(
        "click_id",
        "c_ts",
        (
            F.col("base")
            + F.when(
                F.col("rr") <= F.col("cents") - F.sum("base").over(wp), 1
            ).otherwise(0)
        ).alias("att"),
    )
    return (
        attr.groupBy(F.hour("c_ts").cast("int").alias("click_hour"))
        .agg(
            F.count("*").cast("long").alias("n_attributions"),
            F.sum("att").cast("long").alias("attributed_cents"),
        )
    )


@register(
    "q149_gini_concentration",
    """WITH rev AS (
         SELECT c.c_nationkey AS nation, o.o_custkey AS custkey,
                sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS cents
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY 1, 2),
       ranked AS (
         SELECT nation, cents,
                row_number() OVER (PARTITION BY nation
                                   ORDER BY cents, custkey) AS rk
         FROM rev)
       SELECT nation,
              CAST(count(*) AS BIGINT) AS n_customers,
              CAST(sum(cents) AS BIGINT) AS total_cents,
              CAST(((2 * sum(rk * cents) - (count(*) + 1) * sum(cents)) * 1000000)
                   // (count(*) * sum(cents)) AS BIGINT) AS gini_ppm
       FROM ranked GROUP BY nation""",
    "revenue concentration per nation as an exact-integer Gini "
    "coefficient: customers rank by revenue within nation (the window "
    "partitions by nation; a GLOBAL Gini would use the range-"
    "partitioned global_row_number instead — q125/q129's machinery), "
    "then Gini = (2*sum(rank*x) - (n+1)*sum(x)) / (n*sum(x)) "
    "floor-scaled to ppm — every term an int64/int128 sum, "
    "bit-portable, no fp Lorenz integration.  One join (customer dim "
    "broadcasts), one partition-sort, one aggregate.  Concentration "
    "metrics flag single-customer revenue risk and long-tail "
    "imbalance — the business twin of q72's top-k share",
)
def q149(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(F.sum(cents).alias("cents"))
    )
    wr = Window.partitionBy("nation").orderBy("cents", "custkey")
    ranked = rev.select("nation", "cents", F.row_number().over(wr).alias("rk"))
    return ranked.groupBy("nation").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        # decimal(38,0) intermediates: the ppm-scaled Lorenz numerator
        # exceeds int64 once a group's revenue passes ~1e13 cents
        # (DuckDB's sums promote to int128 silently; Spark's do not)
        F.expr(
            "CAST(((2 * CAST(sum(rk * cents) AS DECIMAL(38,0))"
            " - (count(*) + 1) * CAST(sum(cents) AS DECIMAL(38,0))) * 1000000)"
            " div (count(*) * CAST(sum(cents) AS DECIMAL(38,0))) AS BIGINT)"  # div-ok: gini_ppm in [-1e6, 1e6] by the Lorenz identity
        ).alias("gini_ppm"),
    )


@register(
    "q151_event_throttle",
    """WITH lagged AS (
         SELECT event_id, event_type,
                epoch_us(ts) - lag(epoch_us(ts)) OVER (
                  PARTITION BY user_id, event_type
                  ORDER BY ts, event_id) AS gap_us
         FROM events)
       SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us < 300000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed,
              CAST(sum(CASE WHEN gap_us IS NULL OR gap_us >= 300000000
                            THEN event_id % 1000000007 ELSE 0 END) AS BIGINT)
                AS kept_checksum
       FROM lagged GROUP BY event_type""",
    "telemetry debounce/throttle: an event repeating the same "
    "(user, type) within 300 s of its predecessor is suppressed — the "
    "client-side duplicate-burst filter every event pipeline needs "
    "before counting.  One (user,type)-partitioned sort feeds lag(); "
    "suppression counts and a modular checksum of the KEPT event ids "
    "(order-insensitive, overflow-free) verify exactly which rows "
    "survive on both engines.  The batch twin of q101's streaming "
    "dropDuplicatesWithinWatermark — gap-based rather than key-window "
    "state, catching rapid-fire duplicates that carry distinct ids",
)
def q151(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_id",
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    )
    suppressed = F.col("gap_us").isNotNull() & (F.col("gap_us") < 300_000_000)
    return lagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(suppressed.cast("long")).cast("long").alias("n_suppressed"),
        F.sum(
            F.when(~suppressed, F.col("event_id") % 1000000007).otherwise(0)
        )
        .cast("long")
        .alias("kept_checksum"),
    )


@register(
    "q152_pii_redaction",
    """WITH txt AS (
         SELECT c_custkey,
                'Contact ' || c_name || ' at ' ||
                lower(replace(c_name, '#', '')) || '@example.com or 555-' ||
                lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
                lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0') ||
                ' segment ' || c_mktsegment AS body
         FROM customer),
       red AS (
         SELECT c_custkey,
                regexp_replace(
                  regexp_replace(body, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                                 '<EMAIL>', 'g'),
                  '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean,
                length(body) AS raw_len
         FROM txt)
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN clean LIKE '%<EMAIL>%' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_email_rows,
              CAST(sum(CASE WHEN clean LIKE '%<PHONE>%' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_phone_rows,
              CAST(sum(raw_len - length(clean)) AS BIGINT) AS chars_removed,
              CAST(sum(__H__ % 1000000007) AS BIGINT) AS clean_checksum
       FROM red""".replace("__H__", hex_hash64_sql("clean")),
    "PII redaction over free text: email and phone patterns scrub to "
    "typed placeholders via regexp_replace (anchored character-class "
    "regexes chosen to behave identically under Java regex and RE2), "
    "verified by per-row detection counts, removed-character totals, "
    "and an order-insensitive md5 checksum of every redacted string — "
    "the compliance pre-processing step (GDPR/CCPA) every training-"
    "data pipeline runs before text leaves the trust boundary.  Pure "
    "per-row expressions: no shuffle except the final constant-size "
    "aggregate.  The contact strings are synthesized deterministically "
    "from the customer dim so both engines redact byte-identical "
    "input (the testdata corpus itself contains no PII)",
)
def q152(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    body = F.concat(
        F.lit("Contact "),
        F.col("c_name"),
        F.lit(" at "),
        F.lower(F.regexp_replace("c_name", "#", "")),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(((F.col("c_custkey") * 7) % 10000).cast("string"), 4, "0"),
        F.lit(" segment "),
        F.col("c_mktsegment"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            body,
            r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
            "<EMAIL>",
        ),
        r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
        "<PHONE>",
    )
    red = c.select(
        clean.alias("clean"), F.length(body).alias("raw_len")
    )
    return red.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("clean").contains("<EMAIL>").cast("long"))
        .cast("long")
        .alias("n_email_rows"),
        F.sum(F.col("clean").contains("<PHONE>").cast("long"))
        .cast("long")
        .alias("n_phone_rows"),
        F.sum(F.col("raw_len") - F.length("clean"))
        .cast("long")
        .alias("chars_removed"),
        F.sum(T.hex_hash64(F.col("clean")) % 1000000007)
        .cast("long")
        .alias("clean_checksum"),
    )


@register(
    "q154_variant_extract",
    """SELECT event_type,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS BIGINT) AS sum_k,
              CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS BIGINT) AS min_k,
              CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS BIGINT) AS max_k
       FROM events GROUP BY event_type""",
    "semi-structured JSON via the Spark 4 VARIANT type: props parses "
    "once with parse_json into Variant's binary columnar encoding and "
    "fields extract with variant_get typed paths — at 100 TB this "
    "replaces per-query string re-parsing (get_json_object, q13's "
    "shape) with parse-once/read-many, the modern open-lakehouse "
    "semi-structured contract (Parquet/Delta/Iceberg variant "
    "shredding).  The oracle states the same extraction in DuckDB's "
    "JSON dialect; results are identical because variant preserves "
    "JSON values exactly",
)
def q154(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    k = F.variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


@register(
    "q155_custom_datasource",
    f"""WITH gen AS (
         SELECT i AS row_id,
                {hex_hash64_sql("CAST(i AS VARCHAR)")} % 1000 AS user_id,
                ['view', 'click', 'purchase']
                  [({hex_hash64_sql("CAST(i AS VARCHAR)")} % 3) + 1] AS kind,
                {hex_hash64_sql("CAST(i AS VARCHAR)")} % 100000 AS amount_cents
         FROM range(100000) t(i))
       SELECT kind,
              CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
              CAST(sum(amount_cents) AS BIGINT) AS total_cents,
              CAST(bit_xor(row_id) AS BIGINT) AS id_xor
       FROM gen GROUP BY kind""",
    "custom connector via the Spark 4 Python DataSource API "
    "(sources/pydatasource.py): a deterministic synthetic-activity "
    "feed whose reader DECLARES its parallelism — partitions() splits "
    "the row space into shards, Spark schedules one task per shard "
    "exactly as it does file splits, and each read() streams tuples "
    "(the contract a real REST/billing/telemetry connector drops "
    "into).  Rows derive from the md5 hash family, so the DuckDB "
    "oracle regenerates the identical table from range(n) — the rare "
    "case of a differentially-testable CONNECTOR, proving the source "
    "yields byte-exact rows across all shards, not just 'some rows'",
)
def q155(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.pydatasource import register as register_source

    register_source(spark)
    df = (
        spark.read.format("synthetic_activity")
        .option("rows", 100_000)
        .option("shards", 8)
        .load()
    )
    return df.groupBy("kind").agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum("amount_cents").cast("long").alias("total_cents"),
        F.expr("bit_xor(row_id)").cast("long").alias("id_xor"),
    )


_BM25_TERMS = ("spark", "join", "merge")


def _bm25_tf_sql(term: str) -> str:
    return (
        f"len(list_filter(string_split(text, ' '), x -> x = '{term}'))"
    )


@register(
    "q156_bm25_topk",
    f"""WITH stats AS (
         SELECT count(*) AS n_docs,
                sum(len(string_split(text, ' '))) AS tot_len
         FROM documents),
       tf AS (
         SELECT doc_id, len(string_split(text, ' ')) AS dl,
                {", ".join(f"{_bm25_tf_sql(t)} AS tf_{t}" for t in _BM25_TERMS)}
         FROM documents),
       df AS (
         SELECT {", ".join(f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in _BM25_TERMS)}
         FROM tf),
       scored AS (
         SELECT doc_id,
                floor(({" + ".join(
                  f"(CAST(tf_{t} AS DOUBLE) * 2.2"
                  f" / (CAST(tf_{t} AS DOUBLE) + 1.2 * (0.25 + 0.75"
                  f" * CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)"
                  f" / CAST(tot_len AS DOUBLE))))"
                  f" * (CAST(n_docs - df_{t} AS DOUBLE) + 1.0)"
                  f" / (CAST(df_{t} AS DOUBLE) + 1.0)" for t in _BM25_TERMS)})
                  * 1000000.0) / 1000000.0 AS score
         FROM tf, df, stats)
       SELECT doc_id, score FROM scored
       ORDER BY score DESC, doc_id LIMIT 10""",
    "BM25-shaped lexical relevance search (query: 'spark join merge'): "
    "per-term saturation tf*(k1+1)/(tf + k1*(1-b + b*dl/avgdl)) with "
    "k1=1.2, b=0.75, weighted by the rational idf (N-df+1)/(df+1) — "
    "the log is deliberately dropped (ln is not bit-portable across "
    "engines; the rational form keeps per-term monotonicity) and the "
    "final score floor6-quantizes so both engines emit identical "
    "doubles.  Plan: corpus stats and per-term document frequencies "
    "are two 1-row aggregates broadcast to the per-doc scorer (pure "
    "row expressions, no explode), then TakeOrderedAndProject for the "
    "top-10 — at 100 TB the only shuffles are the two tiny aggregates. "
    "The inverted-index variant would pre-filter docs containing any "
    "term (a semi-join) before scoring",
)
def q156(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    def _eq(term: str):
        # single-arg closure: a two-arg lambda would be (element, index)
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(toks, _eq(t))).alias(f"tf_{t}") for t in _BM25_TERMS
    ]
    tf = d.select("doc_id", F.size(toks).alias("dl"), *tf_cols)
    stats = d.agg(
        F.count("*").alias("n_docs"), F.sum(F.size(toks)).alias("tot_len")
    )
    dfreq = tf.agg(
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in _BM25_TERMS
        ]
    )
    scored = tf.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(dfreq))
    score = None
    for t in _BM25_TERMS:
        tfd = F.col(f"tf_{t}").cast("double")
        k = F.lit(1.2) * (
            F.lit(0.25)
            + F.lit(0.75)
            * F.col("dl").cast("double")
            * F.col("n_docs").cast("double")
            / F.col("tot_len").cast("double")
        )
        idf = (
            (F.col("n_docs") - F.col(f"df_{t}")).cast("double") + F.lit(1.0)
        ) / (F.col(f"df_{t}").cast("double") + F.lit(1.0))
        term = tfd * F.lit(2.2) / (tfd + k) * idf
        score = term if score is None else score + term
    return (
        scored.select("doc_id", floor6(score).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


@register(
    "q157_basket_coitems",
    """WITH pairs AS (
         SELECT a.l_partkey AS item, b.l_partkey AS co_item, count(*) AS n
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
         GROUP BY 1, 2)
       SELECT item,
              CAST(n_baskets AS BIGINT) AS n_baskets,
              top_co, CAST(top_n AS BIGINT) AS top_n
       FROM (SELECT item,
                    sum(n) OVER (PARTITION BY item) AS n_baskets,
                    co_item AS top_co, n AS top_n,
                    row_number() OVER (PARTITION BY item
                                       ORDER BY n DESC, co_item DESC) AS rk
             FROM pairs) WHERE rk = 1""",
    "item-to-item co-occurrence recommendation (the 'customers who "
    "bought X also bought Y' kernel): in-basket part pairs explode "
    "from a self-equi-join on the order key — the quadratic term is "
    "bounded by basket size (~4-7 lines), never the catalog — "
    "co-occurrence counts reduce to the item-pair matrix, and each "
    "item's top co-item is one max_by over a (count, co_item) struct "
    "(map-side combinable; no second window over the pair stream).  "
    "The oracle states the same argmax via row_number.  At 100 TB the "
    "pair matrix is the bounded object (items^2 worst case, basket-"
    "bounded in practice) — the standard precompute behind retail "
    "recommenders",
)
def q157(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("item"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("co_item"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("item") != F.col("co_item"))
        .groupBy("item", "co_item")
        .agg(F.count("*").alias("n"))
    )
    return (
        pairs.groupBy("item")
        .agg(
            F.sum("n").cast("long").alias("n_baskets"),
            F.max_by(
                F.struct(
                    F.col("co_item").alias("top_co"),
                    F.col("n").alias("top_n"),
                ),
                F.struct(F.col("n"), F.col("co_item")),
            ).alias("s"),
        )
        .select("item", "n_baskets", "s.top_co", F.col("s.top_n").cast("long").alias("top_n"))
    )


def _kmeans_d2_sql(vec: str, cent: str) -> str:
    return (
        f"list_sum(list_transform(range(1, 65),"
        f" i -> ({vec}[i] - {cent}[i]) * ({vec}[i] - {cent}[i])))"
    )


@register(
    "q158_integer_kmeans",
    f"""WITH qv AS (
         SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), x -> greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT), CAST(floor(x * (127.0 / (CASE WHEN list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) = 0 THEN 1.0 ELSE list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) END))) AS BIGINT)))) AS v FROM embeddings),
       seeds AS (
         SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
         FROM qv ORDER BY vec_id LIMIT 8),
       a1 AS (
         SELECT vec_id, v, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
         FROM (SELECT q.vec_id, q.v, s.cid,
                      {_kmeans_d2_sql('q.v', 's.c')} AS d2
               FROM qv q CROSS JOIN seeds s)),
       m1 AS (SELECT vec_id, v, cid FROM a1 WHERE rk = 1),
       cells AS (
         SELECT cid, i, sum(v[i]) AS s, count(*) AS n
         FROM m1 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
         GROUP BY cid, i),
       cent2 AS (
         SELECT cid, list((s - ((s % n + n) % n)) // n ORDER BY i) AS c
         FROM cells GROUP BY cid),
       a2 AS (
         SELECT vec_id, v, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
         FROM (SELECT q.vec_id, q.v, s.cid,
                      {_kmeans_d2_sql('q.v', 's.c')} AS d2
               FROM qv q CROSS JOIN cent2 s)),
       m2 AS (SELECT vec_id, v, cid FROM a2 WHERE rk = 1)
       SELECT CAST(cid AS INTEGER) AS cluster,
              CAST(count(*) AS BIGINT) AS n_members,
              CAST(sum(list_sum(v)) AS BIGINT) AS member_dimsum,
              CAST(min(vec_id) AS BIGINT) AS min_member
       FROM m2 GROUP BY cid""",
    "deterministic integer k-means (operators/kmeans.py): vectors "
    "int8-quantize so every distance is exact integer L2; seeds are "
    "the k lowest-id vectors (explicit, not sampled); centroid "
    "updates are per-dimension floor means computed as "
    "(s - pmod(s,n)) div n — numerator made exactly divisible first, "
    "so truncating division IS floor division in every dialect; "
    "assignment ties break to the lowest cluster id.  Two Lloyd "
    "rounds fully verified against the unrolled SQL oracle — fp "
    "k-means can never be checked this way (shuffle-order fp sums + "
    "random seeds).  Per round: k-row centroid table broadcasts "
    "(vectors never shuffle for assignment) and the update is one "
    "map-combinable k x dim cell aggregate — the IVF training step "
    "(q40/q73's cells) done honestly at scale",
)
def q158(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vector import int8_quantize
    from ..operators.kmeans import int_kmeans_assign

    emb = load_table(spark, sf, "embeddings")
    qv = emb.select("vec_id", int8_quantize("embedding").alias("v"))
    assign = int_kmeans_assign(qv, "vec_id", "v", k=8, rounds=2)
    dimsum = F.aggregate("v", F.lit(0).cast("long"), lambda a, x: a + x)
    return (
        assign.join(qv, "vec_id")
        .groupBy(F.col("cluster").cast("int").alias("cluster"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum(dimsum).cast("long").alias("member_dimsum"),
            F.min("vec_id").cast("long").alias("min_member"),
        )
    )


@register(
    "q159_apply_changes",
    f"""WITH snap AS (
         SELECT c_custkey AS k,
                CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal,
                c_mktsegment AS seg
         FROM customer),
       mx AS (SELECT max(k) AS mk FROM snap),
       changes AS (
         SELECT k, 'U' AS op, bal + 100000 AS bal, seg FROM snap WHERE k % 7 = 0
         UNION ALL
         SELECT k, 'D', NULL, NULL FROM snap WHERE k % 11 = 3 AND k % 7 <> 0
         UNION ALL
         SELECT mx.mk + i, 'I',
                {hex_hash64_sql("CAST(i AS VARCHAR)", salt="bal")} % 10000000,
                'NEW' FROM range(1, 51) t(i), mx),
       merged AS (
         SELECT coalesce(c.k, s.k) AS k,
                CASE WHEN c.op IN ('U', 'I') THEN c.bal ELSE s.bal END AS bal,
                CASE WHEN c.op IN ('U', 'I') THEN c.seg ELSE s.seg END AS seg,
                c.op
         FROM snap s FULL OUTER JOIN changes c ON s.k = c.k
         WHERE c.op IS NULL OR c.op <> 'D')
       SELECT CAST((SELECT count(*) FROM snap) AS BIGINT) AS n_before,
              CAST(count(*) AS BIGINT) AS n_after,
              CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT)
                AS n_updated,
              CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT)
                AS n_inserted,
              CAST((SELECT count(*) FROM changes WHERE op = 'D') AS BIGINT)
                AS n_deleted,
              CAST(sum(bal) AS BIGINT) AS bal_checksum,
              CAST(sum({hex_hash64_sql("seg")} % 1000003) AS BIGINT)
                AS seg_checksum
       FROM merged""",
    "the MERGE INTO kernel without a table format (CDC apply-changes): "
    "one FULL OUTER join applies a mixed insert/update/delete batch to "
    "a snapshot — updates override matched rows, deletes drop them, "
    "inserts survive the unmatched side — exactly Delta/Iceberg MERGE "
    "semantics expressed as pure DataFrame algebra (the execution-"
    "layer sibling of Warehouse.upsert_last_wins and delete_keys, "
    "operators/scd.py's apply path).  At 100 TB the join prunes to "
    "partitions the change batch touches and AQE broadcasts the "
    "(always small) batch side.  The change batch is synthesized "
    "deterministically from the snapshot (mod-7 updates, mod-11 "
    "deletes, 50 hash-valued inserts), so both engines replay the "
    "identical merge; row counts per op class plus balance/segment "
    "checksums pin the result",
)
def q159(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    snap = c.select(
        F.col("c_custkey").alias("k"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    mk = snap.agg(F.max("k").alias("mk"))
    upd = snap.filter(F.col("k") % 7 == 0).select(
        "k", F.lit("U").alias("op"), (F.col("bal") + 100000).alias("bal"), "seg"
    )
    dele = snap.filter((F.col("k") % 11 == 3) & (F.col("k") % 7 != 0)).select(
        "k",
        F.lit("D").alias("op"),
        F.lit(None).cast("long").alias("bal"),
        F.lit(None).cast("string").alias("seg"),
    )
    ins = (
        spark.range(1, 51)
        .withColumnRenamed("id", "i")
        .crossJoin(F.broadcast(mk))
        .select(
            (F.col("mk") + F.col("i")).alias("k"),
            F.lit("I").alias("op"),
            (
                T.hex_hash64(F.col("i").cast("string"), salt="bal") % 10_000_000
            ).alias("bal"),
            F.lit("NEW").alias("seg"),
        )
    )
    changes = upd.unionByName(dele).unionByName(ins)
    s = snap.alias("s")
    ch = changes.alias("c")
    merged = (
        s.join(ch, F.col("s.k") == F.col("c.k"), "full_outer")
        .filter(F.col("c.op").isNull() | (F.col("c.op") != "D"))
        .select(
            F.coalesce(F.col("c.k"), F.col("s.k")).alias("k"),
            F.when(F.col("c.op").isin("U", "I"), F.col("c.bal"))
            .otherwise(F.col("s.bal"))
            .alias("bal"),
            F.when(F.col("c.op").isin("U", "I"), F.col("c.seg"))
            .otherwise(F.col("s.seg"))
            .alias("seg"),
            F.col("c.op").alias("op"),
        )
    )
    n_before = snap.agg(F.count("*").cast("long").alias("n_before"))
    n_deleted = changes.filter(F.col("op") == "D").agg(
        F.count("*").cast("long").alias("n_deleted")
    )
    out = merged.agg(
        F.count("*").cast("long").alias("n_after"),
        F.sum((F.col("op") == "U").cast("long")).cast("long").alias("n_updated"),
        F.sum((F.col("op") == "I").cast("long")).cast("long").alias("n_inserted"),
        F.sum("bal").cast("long").alias("bal_checksum"),
        F.sum(T.hex_hash64(F.col("seg")) % 1000003)
        .cast("long")
        .alias("seg_checksum"),
    )
    return (
        n_before.crossJoin(out)
        .crossJoin(n_deleted)
        .select(
            "n_before",
            "n_after",
            "n_updated",
            "n_inserted",
            "n_deleted",
            "bal_checksum",
            "seg_checksum",
        )
    )


@register(
    "q160_nearest_event",
    """WITH ev AS (
         SELECT user_id, event_id, event_type, ts,
                CASE WHEN event_type = 'signup' THEN epoch_us(ts) END AS sig_us
         FROM events),
       marked AS (
         SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us,
                last_value(sig_us IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_us,
                last_value(sig_us IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fwd_us
         FROM ev),
       purch AS (
         SELECT CASE
                  WHEN back_us IS NULL AND fwd_us IS NULL THEN 'none'
                  WHEN fwd_us IS NULL THEN 'back'
                  WHEN back_us IS NULL THEN 'fwd'
                  WHEN t_us - back_us <= fwd_us - t_us THEN 'back'
                  ELSE 'fwd' END AS direction,
                CASE
                  WHEN back_us IS NULL AND fwd_us IS NULL THEN NULL
                  WHEN fwd_us IS NULL THEN t_us - back_us
                  WHEN back_us IS NULL THEN fwd_us - t_us
                  ELSE least(t_us - back_us, fwd_us - t_us) END AS dt_us
         FROM marked WHERE event_type = 'purchase')
       SELECT direction, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(dt_us) AS BIGINT) AS sum_dt_us,
              CAST(max(dt_us) AS BIGINT) AS max_dt_us
       FROM purch GROUP BY direction""",
    "bidirectional nearest-event join: each purchase matches its "
    "user's CLOSEST signup in either time direction (ties prefer the "
    "backward match — the causally-safe side).  Both directions come "
    "from one ascending and one descending carry-forward window over "
    "the same user-partitioned sort (asof.py's union trick doubled) — "
    "no interval join, no per-row search; at 100 TB this is two "
    "sort-based windows on the (user) shuffle the as-of join already "
    "pays.  Feature stores call this 'nearest observation join' "
    "(backward-only = q45/q111; forward-only = label leakage, which "
    "is why the tie prefers backward)",
)
def q160(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    sig_us = F.when(
        F.col("event_type") == "signup", F.unix_micros("ts")
    )
    w_b = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.last(sig_us, ignorenulls=True).over(w_b).alias("back_us"),
        F.last(sig_us, ignorenulls=True).over(w_f).alias("fwd_us"),
    ).filter(F.col("event_type") == "purchase")
    back_dt = F.col("t_us") - F.col("back_us")
    fwd_dt = F.col("fwd_us") - F.col("t_us")
    direction = (
        F.when(F.col("back_us").isNull() & F.col("fwd_us").isNull(), "none")
        .when(F.col("fwd_us").isNull(), "back")
        .when(F.col("back_us").isNull(), "fwd")
        .when(back_dt <= fwd_dt, "back")
        .otherwise("fwd")
    )
    dt = (
        F.when(F.col("back_us").isNull() & F.col("fwd_us").isNull(), None)
        .when(F.col("fwd_us").isNull(), back_dt)
        .when(F.col("back_us").isNull(), fwd_dt)
        .otherwise(F.least(back_dt, fwd_dt))
    )
    return (
        marked.select(direction.alias("direction"), dt.alias("dt_us"))
        .groupBy("direction")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("dt_us").cast("long").alias("sum_dt_us"),
            F.max("dt_us").cast("long").alias("max_dt_us"),
        )
    )


@register(
    "q161_oov_rate",
    """WITH toks AS (
         SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
         FROM documents),
       freq AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
       vocab AS (SELECT tok FROM freq WHERE n >= 100),
       flagged AS (
         SELECT t.doc_id, t.lang,
                CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
         FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
       SELECT lang,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
              CAST(sum(oov) AS BIGINT) AS total_oov,
              CAST(count(*) AS BIGINT) AS total_tok,
              CAST((sum(oov) * 1000000) // count(*) AS BIGINT) AS oov_ppm
       FROM flagged GROUP BY lang""",
    "out-of-vocabulary rate gate (training-data quality): the corpus "
    "derives its own vocabulary (tokens with frequency >= 100), every "
    "document counts tokens outside it, and per-language OOV ppm "
    "flags shards that would waste tokenizer capacity (the q125 "
    "vocabulary's acceptance test).  Spark side broadcasts the vocab "
    "as a semi-joinable set against the exploded token stream — the "
    "per-doc membership test never ships the corpus; the oracle "
    "in-lines the vocab as a list for the same membership semantics.  "
    "Integer ppm via exact sums, floor division",
)
def q161(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("n"))
    vocab = freq.filter(F.col("n") >= 100).select(
        "tok", F.lit(1).alias("_in_vocab")
    )
    flagged = toks.join(F.broadcast(vocab), "tok", "left")
    per_doc = flagged.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_tok"),
        F.sum(F.col("_in_vocab").isNull().cast("long")).alias("n_oov"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_oov").cast("long").alias("total_oov"),
        F.sum("n_tok").cast("long").alias("total_tok"),
        # decimal(38,0) before the ppm multiply: a 100 TB corpus can hold
        # >9.2e12 OOV tokens, past BIGINT*1e6 wrap (q149-class overflow).
        F.expr("(CAST(sum(n_oov) AS DECIMAL(38,0)) * 1000000) div sum(n_tok)")  # div-ok: oov <= tok, quotient <= 1e6
        .cast("long")
        .alias("oov_ppm"),
    )


def _simhash_all_oracle(bits: int = 32) -> str:
    h = hex_hash64_sql("tok")
    votes = ",\n".join(
        f"       CAST(SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v{j}"
        for j in range(bits)
    )
    packed = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )
    return (
        "WITH tok_rows AS (\n"
        f"  SELECT doc_id, unnest(list_distinct({T.token_shingles_sql('text', 3)})) AS tok\n"
        "  FROM documents),\n"
        f"hashed AS (SELECT doc_id, {h} AS h FROM tok_rows),\n"
        f"voted AS (SELECT doc_id,\n{votes}\n  FROM hashed GROUP BY doc_id),\n"
        f"sim AS (SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM voted)"
    )


@register(
    "q162_simhash_banded",
    _simhash_all_oracle()
    + """
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
    "exact Hamming-radius SimHash pairs (3-shingle features — token "
    "features saturate on this vocab) over the WHOLE corpus by "
    "pigeonhole banding (operators/dedup.py:simhash_banded_pairs): the "
    "32-bit signature splits into radius+1 = 4 bands, and any pair "
    "within Hamming 3 must agree exactly on >= 1 whole band, so "
    "candidates come from band-value equi-joins (the shuffle key is an "
    "8-bit band value, never the document) and the xor/popcount "
    "verification has zero false negatives — closing the gap q52's "
    "top-byte blocking left open (it can MISS pairs differing in the "
    "top byte).  The oracle is the O(n^2) all-pairs Hamming scan the "
    "banding provably equals.  This is the scale path SCALE.md "
    "promises for simhash near-dup",
)
def q162(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    d = d.withColumn("_sh3", F.array_distinct(T.token_shingles("text", 3)))
    sim = D.simhash(d, bits=32, set_col="_sh3")
    return D.simhash_banded_pairs(
        sim, bits=32, max_hamming=3
    ).select("id_a", "id_b", "hamming")


@register(
    "q163_p90_gap",
    """WITH dt AS (
         SELECT event_type,
                epoch_us(ts) - lag(epoch_us(ts)) OVER (
                  PARTITION BY user_id, event_type
                  ORDER BY ts, event_id) AS gap_us
         FROM events),
       per AS (
         SELECT event_type, gap_us, count(*) AS w
         FROM dt WHERE gap_us IS NOT NULL GROUP BY 1, 2),
       cum AS (
         SELECT event_type, gap_us,
                sum(w) OVER (PARTITION BY event_type ORDER BY gap_us) AS cw,
                sum(w) OVER (PARTITION BY event_type) AS tot
         FROM per)
       SELECT event_type,
              CAST(min(gap_us) AS BIGINT) AS p90_gap_us,
              CAST(max(tot) AS BIGINT) AS n_gaps
       FROM cum WHERE cw * 10 >= 9 * tot GROUP BY event_type""",
    "exact p90 inter-event gap per event type via the generalized "
    "two-phase weighted quantile (profile.grouped_weighted_quantile, "
    "q_num/q_den = 9/10): phase 1 locates the p90 bin from a "
    "value-range-bounded histogram, phase 2 refines inside that bin "
    "only — no whole-group window partition anywhere on the engine "
    "side (the oracle states the naive cumulative-window definition). "
    "Tail latency percentiles are THE operational SLO statistic; the "
    "same call with 999/1000 is the p99.9",
)
def q163(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profile import grouped_weighted_quantile

    ev = load_events_range(spark, sf)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    dt = ev.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    per = dt.groupBy("event_type", "gap_us").agg(F.count("*").alias("w"))
    res = grouped_weighted_quantile(
        per, "event_type", "gap_us", "w", q_num=9, q_den=10, bin_shift=28
    )
    return res.select(
        "event_type",
        F.col("quantile_value").cast("long").alias("p90_gap_us"),
        F.col("total_weight").cast("long").alias("n_gaps"),
    )


@register(
    "q164_growth_accounting",
    """WITH uw AS (
         SELECT DISTINCT user_id,
                strftime(date_trunc('week', ts), '%Y-%m-%d') AS wk
         FROM events),
       seq AS (
         SELECT user_id, wk,
                lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
                min(wk) OVER (PARTITION BY user_id) AS first_wk
         FROM uw),
       states AS (
         SELECT wk,
                CASE
                  WHEN wk = first_wk THEN 'new'
                  WHEN CAST(wk AS DATE) - CAST(prev_wk AS DATE) = 7
                    THEN 'retained'
                  ELSE 'resurrected' END AS state
         FROM seq),
       churn AS (
         SELECT strftime(CAST(wk AS DATE) + 7, '%Y-%m-%d') AS wk,
                'churned' AS state
         FROM seq s
         WHERE NOT EXISTS (
                 SELECT 1 FROM uw n
                 WHERE n.user_id = s.user_id
                   AND CAST(n.wk AS DATE) = CAST(s.wk AS DATE) + 7)
           AND CAST(s.wk AS DATE) + 7 <= (SELECT max(CAST(wk AS DATE)) FROM uw))
       SELECT wk, state, CAST(count(*) AS BIGINT) AS n_users
       FROM (SELECT wk, state FROM states UNION ALL SELECT wk, state FROM churn)
       GROUP BY wk, state""",
    "growth accounting (the new/retained/resurrected/churned user "
    "ledger every growth team reports): distinct user-weeks classify "
    "by one lag window (first week -> new; consecutive week -> "
    "retained; gap -> resurrected), and churn attributes to the week "
    "AFTER a user's last-seen week via an anti-join against their "
    "next-week presence — set algebra, not a per-user state machine.  "
    "One user-partitioned sort + one anti-join; the user-week set is "
    "|users| x |weeks| bounded, far smaller than the event stream.  "
    "Identity: new + retained + resurrected = WAU, and "
    "WAU(w) - WAU(w+1) = churned(w+1) - new(w+1) - resurrected(w+1)",
)
def q164(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.deterministic import week_str

    ev = load_events_range(spark, sf)
    uw = ev.select("user_id", week_str("ts").alias("wk")).distinct()
    w_seq = Window.partitionBy("user_id").orderBy("wk")
    w_all = Window.partitionBy("user_id")
    seq = uw.select(
        "user_id",
        "wk",
        F.lag("wk").over(w_seq).alias("prev_wk"),
        F.min("wk").over(w_all).alias("first_wk"),
    )
    state = (
        F.when(F.col("wk") == F.col("first_wk"), "new")
        .when(
            F.datediff(F.col("wk").cast("date"), F.col("prev_wk").cast("date"))
            == 7,
            "retained",
        )
        .otherwise("resurrected")
    )
    states = seq.select("wk", state.alias("state"))
    max_wk = uw.agg(F.max(F.col("wk").cast("date")).alias("mx"))
    nxt = seq.select(
        "user_id",
        F.date_format(F.date_add(F.col("wk").cast("date"), 7), "yyyy-MM-dd").alias(
            "wk"
        ),
    )
    churn = (
        nxt.join(uw, ["user_id", "wk"], "left_anti")
        .crossJoin(F.broadcast(max_wk))
        .filter(F.col("wk").cast("date") <= F.col("mx"))
        .select("wk", F.lit("churned").alias("state"))
    )
    return (
        states.unionByName(churn)
        .groupBy("wk", "state")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


@register(
    "q165_winsorized_mean",
    """WITH cents AS (
         SELECT l_returnflag AS flag,
                CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS v
         FROM lineitem),
       per AS (SELECT flag, v, count(*) AS w FROM cents GROUP BY 1, 2),
       cum AS (
         SELECT flag, v,
                sum(w) OVER (PARTITION BY flag ORDER BY v) AS cw,
                sum(w) OVER (PARTITION BY flag) AS tot
         FROM per),
       bounds AS (
         SELECT flag,
                min(CASE WHEN cw * 20 >= tot THEN v END) AS p5,
                min(CASE WHEN cw * 20 >= 19 * tot THEN v END) AS p95
         FROM cum GROUP BY flag)
       SELECT c.flag,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(least(greatest(c.v, b.p5), b.p95)) AS BIGINT)
                AS winsorized_sum_cents,
              CAST(sum(CASE WHEN c.v < b.p5 OR c.v > b.p95 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_clipped
       FROM cents c JOIN bounds b ON c.flag = b.flag
       GROUP BY c.flag""",
    "winsorized (p5/p95-clipped) robust sums per group: both clip "
    "bounds come from the generalized two-phase weighted quantile "
    "(profile.grouped_weighted_quantile at 1/20 and 19/20 — no "
    "whole-group window on the engine side; the oracle states the "
    "naive cumulative form), then one rescan clips and sums in exact "
    "cents.  The robust-aggregate family's third member alongside "
    "q90's exact median and q131's MAD gate — winsorized means are "
    "how metric pipelines stop a single fat-finger order from moving "
    "the company dashboard",
)
def q165(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profile import grouped_weighted_quantiles

    li = load_table(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("v"),
    )
    cents = li.withColumn("w", F.lit(1).cast("long"))
    # both bounds from ONE locate + ONE refine pass: the per-quantile
    # gwq calls executed the lineitem subtree once per phase per
    # quantile (2 passes x 2 quantiles + the clip pass = 5 scans,
    # flagged by the r7 re-execution audit; now 3 — the structural
    # minimum for an exact two-phase quantile plus winsorize)
    q = grouped_weighted_quantiles(
        cents, "flag", "v", "w", {"p5": (1, 20), "p95": (19, 20)}
    )
    bounds = q.groupBy("flag").agg(
        F.min(F.when(F.col("q") == "p5", F.col("quantile_value"))).alias("p5"),
        F.min(F.when(F.col("q") == "p95", F.col("quantile_value"))).alias(
            "p95"
        ),
    )
    return (
        li.join(F.broadcast(bounds), "flag")
        .groupBy("flag")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.least(F.greatest(F.col("v"), F.col("p5")), F.col("p95")))
            .cast("long")
            .alias("winsorized_sum_cents"),
            F.sum(
                ((F.col("v") < F.col("p5")) | (F.col("v") > F.col("p95"))).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("n_clipped"),
        )
    )


@register(
    "q166_share_of_parent",
    """WITH nat AS (
         SELECT c.c_nationkey AS nation, n.n_regionkey AS region,
                sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS cents
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY 1, 2),
       reg AS (SELECT region, sum(cents) AS rcents FROM nat GROUP BY region),
       tot AS (SELECT sum(cents) AS gcents FROM nat)
       SELECT nation, nat.region,
              CAST(nat.cents AS BIGINT) AS cents,
              CAST((nat.cents * 1000000) // reg.rcents AS BIGINT)
                AS share_of_region_ppm,
              CAST((reg.rcents * 1000000) // tot.gcents AS BIGINT)
                AS region_share_ppm
       FROM nat JOIN reg USING (region), tot""",
    "hierarchical share-of-parent (the drill-down ratio every BI "
    "dashboard renders: nation % of region, region % of total) as "
    "re-aggregation of the finest grain — the nation aggregate rolls "
    "up to region and grand totals (decomposable sums, map-side "
    "combined), and shares are exact integer ppm floor divisions "
    "joined back, NOT a percent_over_window on raw rows.  At 100 TB "
    "the raw scan aggregates once; everything after operates on the "
    "|nations|-sized table.  Dims broadcast into the fact join",
)
def q166(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    nat = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("n_regionkey").alias("region"),
        )
        .agg(F.sum(cents).alias("cents"))
    )
    reg = nat.groupBy("region").agg(F.sum("cents").alias("rcents"))
    tot = nat.agg(F.sum("cents").alias("gcents"))
    return (
        nat.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "nation",
            "region",
            F.col("cents").cast("long").alias("cents"),
            # decimal(38,0) intermediates: region revenue in cents passes
            # ~9.2e12 around sf~2-3, at which point a BIGINT *1000000
            # silently wraps (non-ANSI) while DuckDB promotes to int128 —
            # same overflow class the q149 Gini fix addressed.
            F.expr("(CAST(cents AS DECIMAL(38,0)) * 1000000) div rcents")  # div-ok: part-of-region share, quotient <= 1e6
            .cast("long")
            .alias("share_of_region_ppm"),
            F.expr("(CAST(rcents AS DECIMAL(38,0)) * 1000000) div gcents")  # div-ok: region-of-grand share, quotient <= 1e6
            .cast("long")
            .alias("region_share_ppm"),
        )
    )


@register(
    "q167_calendar_join",
    """WITH cal AS (
         SELECT CAST(d AS DATE) AS day,
                isodow(CAST(d AS DATE)) AS dow,
                strftime(CAST(d AS DATE), '%Y-%m') AS month
         FROM generate_series(DATE '2024-01-01', DATE '2024-03-31',
                              INTERVAL 1 DAY) t(d)),
       daily AS (
         SELECT CAST(ts AS DATE) AS day, count(*) AS n
         FROM events GROUP BY 1)
       SELECT cal.month,
              CAST(sum(CASE WHEN cal.dow >= 6 THEN coalesce(daily.n, 0)
                       ELSE 0 END) AS BIGINT) AS weekend_events,
              CAST(sum(coalesce(daily.n, 0)) AS BIGINT) AS total_events,
              CAST(sum(CASE WHEN daily.day IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS empty_days
       FROM cal LEFT JOIN daily ON cal.day = daily.day
       GROUP BY cal.month""",
    "generated calendar dimension (no source table: "
    "spark.sql sequence() / generate_series builds the day spine with "
    "ISO weekday and month attributes) LEFT-joined to the daily event "
    "aggregate — the canonical fix for the silent-gap bug in "
    "time-grouped dashboards (days with zero events EXIST in the "
    "output; q123's hour-grid gap fill at calendar grain).  The spine "
    "is |days| rows, generated, never scanned from storage; the daily "
    "event aggregate (also |days| rows post-agg) is the broadcast "
    "build side — Spark can only hash the non-preserved side of a "
    "LEFT join; weekend/weekday attribution happens on the dimension, "
    "not by re-parsing dates per event",
)
def q167(spark: SparkSession, sf: str) -> DataFrame:
    cal = spark.sql(
        """SELECT day, weekday(day) + 1 AS dow,
                  date_format(day, 'yyyy-MM') AS month
           FROM (SELECT explode(sequence(DATE '2024-01-01',
                                         DATE '2024-03-31',
                                         INTERVAL 1 DAY)) AS day)"""
    )
    ev = load_events_range(spark, sf)
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n")
    )
    return (
        # broadcast the BUILD side: in a LEFT OUTER join Spark can only
        # hash the non-preserved (right) side, so the hint goes on the
        # daily aggregate (|distinct days| rows) — a hint on the
        # preserved spine would be silently ignored.
        cal.join(F.broadcast(daily), "day", "left")
        .groupBy("month")
        .agg(
            F.sum(
                F.when(F.col("dow") >= 6, F.coalesce(F.col("n"), F.lit(0)))
                .otherwise(0)
            )
            .cast("long")
            .alias("weekend_events"),
            F.sum(F.coalesce(F.col("n"), F.lit(0)))
            .cast("long")
            .alias("total_events"),
            F.sum(F.col("n").isNull().cast("long"))
            .cast("long")
            .alias("empty_days"),
        )
    )


@register(
    "q168_benford_digits",
    """WITH d AS (
         SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                  AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER)
                  AS digit
         FROM orders
         WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) > 0)
       SELECT digit,
              CAST(count(*) AS BIGINT) AS n,
              CAST((count(*) * 1000000) // sum(count(*)) OVER ()
                   AS BIGINT) AS freq_ppm
       FROM d GROUP BY digit""",
    "Benford's-law first-digit screen over order amounts (the "
    "classic fraud/fabrication audit: organic amounts put ~30.1% of "
    "first digits at 1, fabricated ones tend uniform): leading digit "
    "via exact integer-cents string head (no fp log10), counts plus "
    "observed ppm frequencies — the chi-square inputs an auditor "
    "tests against log10(1+1/d).  One map-combinable 9-row "
    "aggregate; the single-row total attaches as a window over the "
    "9-row aggregate, never over the scan",
)
def q168(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    d = o.select(cents.alias("c")).filter(F.col("c") > 0).select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    return counts.select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.sum("n").over(w).alias("_tot"),
    ).select(
        "digit",
        "n",
        # decimal(38,0) ppm numerator for 100 TB row counts (q149-class).
        F.expr("(CAST(n AS DECIMAL(38,0)) * 1000000) div _tot")  # div-ok: group share of total, quotient <= 1e6
        .cast("long")
        .alias("freq_ppm"),
    )


# ---------------------------------------------------------------------------
# ingest lifecycle differential (S1-S8/P3/P7/P9/D4 end-to-end)
# ---------------------------------------------------------------------------

def _q169_raw_sql() -> str:
    """DuckDB twin of the synthetic HHS feed q169 derives from customer."""
    k = "c_custkey"
    metrics = []
    for i, m in enumerate(_BED_METRIC_COLS_Q169):
        base = f"CAST((({k} * {i + 3} + c_nationkey) % 97) AS DOUBLE)"
        metrics.append(
            f"CASE WHEN {k} % 41 = {i * 5 % 41} THEN -7.0\n"
            f"     WHEN {k} % 37 = {i * 4 % 37} THEN -999999.0\n"
            f"     ELSE {base} END AS {m}"
        )
    mcols = ",\n                ".join(metrics)
    return f"""
    raw AS (
      SELECT CAST({k} AS VARCHAR) AS hospital_pk,
             CASE WHEN {k} % 53 = 0 THEN NULL ELSE c_name END AS hospital_name,
             c_mktsegment AS state,
             'addr_' || CAST(c_custkey % 1000 AS VARCHAR) AS address,
             'city_' || CAST({k} % 10 AS VARCHAR) AS city,
             lpad(CAST({k} % 100000 AS VARCHAR), 5, '0') AS zip,
             CAST({k} % 1000 AS VARCHAR) AS fips_code,
             CAST(NULL AS VARCHAR) AS geocoded_hospital_address,
             DATE '2024-01-05' + CAST(({k} % 8) * 7 AS INTEGER)
               AS collection_week,
             {mcols}
      FROM customer),
    batch AS (
      SELECT * FROM raw
      UNION ALL
      SELECT * FROM raw WHERE CAST(hospital_pk AS BIGINT) % 13 = 0)"""


_BED_METRIC_COLS_Q169 = [
    "all_adult_hospital_beds_7_day_avg",
    "all_pediatric_inpatient_beds_7_day_avg",
    "all_adult_hospital_inpatient_bed_occupied_7_day_coverage",
    "all_pediatric_inpatient_bed_occupied_7_day_avg",
    "total_icu_beds_7_day_avg",
    "icu_beds_used_7_day_avg",
    "inpatient_beds_used_covid_7_day_avg",
    "staffed_icu_adult_patients_confirmed_covid_7_day_avg",
]


def _q169_oracle() -> str:
    mc = _BED_METRIC_COLS_Q169
    cleaned_metrics = ",\n             ".join(
        f"CASE WHEN {m} = -999999.0 THEN NULL ELSE {m} END AS {m}" for m in mc
    )
    valid_pred = " AND ".join(
        [f"({m} IS NULL OR {m} >= 0)" for m in mc]
        + ["hospital_pk IS NOT NULL", "hospital_name IS NOT NULL",
           "collection_week IS NOT NULL"]
    )
    bed_payload = " || '|' || ".join(
        f"coalesce(CAST(CAST({m} AS BIGINT) AS VARCHAR), 'N')" for m in mc
    )
    hosp_h = hex_hash64_sql("hospital_pk || '|' || hospital_name")
    loc_h = hex_hash64_sql(
        "hospital_fk || '|' || state || '|' || address || '|' || city"
        " || '|' || zip || '|' || fips_code"
    )
    bed_h = hex_hash64_sql(
        "hospital_fk || '|' || strftime(collection_week, '%Y-%m-%d')"
        " || '|' || " + bed_payload
    )
    return f"""WITH {_q169_raw_sql()},
    cleaned AS (
      SELECT hospital_pk, hospital_name, state, address, city, zip,
             fips_code, geocoded_hospital_address, collection_week,
             {cleaned_metrics}
      FROM batch),
    valid AS (SELECT * FROM cleaned WHERE {valid_pred}),
    hospitals AS (SELECT DISTINCT hospital_pk, hospital_name FROM valid),
    locations AS (SELECT DISTINCT hospital_pk AS hospital_fk, state,
                         address, city, zip, fips_code FROM valid),
    beds AS (SELECT DISTINCT hospital_pk AS hospital_fk, collection_week,
                    {', '.join(mc)} FROM valid)
    SELECT 'hospitals' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS xor_hash,
           CAST(sum(h % 1000000007) AS BIGINT) AS sum_mod
    FROM (SELECT {hosp_h} AS h FROM hospitals)
    UNION ALL
    SELECT 'hospital_locations', CAST(count(*) AS BIGINT),
           CAST(bit_xor(h) AS BIGINT), CAST(sum(h % 1000000007) AS BIGINT)
    FROM (SELECT {loc_h} AS h FROM locations)
    UNION ALL
    SELECT 'hospital_bed_information', CAST(count(*) AS BIGINT),
           CAST(bit_xor(h) AS BIGINT), CAST(sum(h % 1000000007) AS BIGINT)
    FROM (SELECT {bed_h} AS h FROM beds)"""


@register(
    "q169_ingest_lifecycle",
    _q169_oracle(),
    "END-TO-END ingest differential: the full load_hhs_frame lifecycle "
    "(sentinel -999999 -> NULL, yyyy-MM-dd date parse, non-negative/"
    "not-null validation split with quarantine, deterministic in-batch "
    "dedup, first-wins anti-join append into the partitioned parquet "
    "warehouse, catalog.py:106) exercised on a synthetic HHS feed "
    "derived arithmetically from the customer table — injected "
    "sentinels (custkey%37), negative metrics (custkey%41), NULL names "
    "(custkey%53), and exact duplicate rows (custkey%13) — then the "
    "STORED tables are read back and fingerprinted with q142's "
    "order-insensitive checksum triple (count / bit_xor / modular sum "
    "of 60-bit row hashes).  The oracle re-states the whole lifecycle "
    "relationally, so the warehouse loaders (S4-S8) get driver-grade "
    "content equality, not just unit tests.  Scale: the load is a "
    "handful of declarative jobs (validate split is one scan; the "
    "upsert probe is one anti-join pruned to touched partitions); the "
    "checksum is map-side combinable, O(tables) output",
)
def q169(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..catalog import Warehouse
    from ..ingest import load_hhs_frame

    c = load_table(spark, sf, "customer")
    k = F.col("c_custkey")
    metrics = []
    for i, m in enumerate(_BED_METRIC_COLS_Q169):
        base = ((k * (i + 3) + F.col("c_nationkey")) % 97).cast("double")
        v = (
            F.when(k % 41 == F.lit(i * 5 % 41), F.lit(-7.0))
            .when(k % 37 == F.lit(i * 4 % 37), F.lit(-999999.0))
            .otherwise(base)
        )
        metrics.append(v.alias(m))
    raw = c.select(
        k.cast("string").alias("hospital_pk"),
        F.when(k % 53 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_name"))
        .alias("hospital_name"),
        F.col("c_mktsegment").alias("state"),
        F.concat(F.lit("addr_"), (k % 1000).cast("string")).alias("address"),
        F.concat(F.lit("city_"), (k % 10).cast("string")).alias("city"),
        F.lpad((k % 100000).cast("string"), 5, "0").alias("zip"),
        (k % 1000).cast("string").alias("fips_code"),
        F.lit(None).cast("string").alias("geocoded_hospital_address"),
        F.date_format(
            F.date_add(F.to_date(F.lit("2024-01-05")), ((k % 8) * 7).cast("int")),
            "yyyy-MM-dd",
        ).alias("collection_week"),
        *metrics,
    )
    batch = raw.unionByName(
        raw.filter(F.col("hospital_pk").cast("long") % 13 == 0)
    )

    wh_root = os.path.join(
        tempfile.gettempdir(),
        "hdt_q169_wh_%s_%d"
        % (os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    shutil.rmtree(wh_root, ignore_errors=True)
    wh = Warehouse(spark, wh_root)
    load_hhs_frame(batch, wh)

    def _checksum(df: DataFrame, tbl: str, payload) -> DataFrame:
        h = T.hex_hash64(payload)
        return (
            df.select(h.alias("h"))
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
                F.sum(F.col("h") % 1000000007).cast("long").alias("sum_mod"),
            )
            .select(F.lit(tbl).alias("tbl"), "n_rows", "xor_hash", "sum_mod")
        )

    mc = _BED_METRIC_COLS_Q169
    hosp = wh.read("hospitals")
    loc = wh.read("hospital_locations")
    beds = wh.read("hospital_bed_information")
    bed_parts = []
    for m in mc:
        bed_parts.append(F.lit("|"))
        bed_parts.append(
            F.coalesce(F.col(m).cast("long").cast("string"), F.lit("N"))
        )
    return (
        _checksum(
            hosp, "hospitals",
            F.concat(F.col("hospital_pk"), F.lit("|"), F.col("hospital_name")),
        )
        .unionByName(
            _checksum(
                loc, "hospital_locations",
                F.concat(
                    F.col("hospital_fk"), F.lit("|"), F.col("state"),
                    F.lit("|"), F.col("address"), F.lit("|"), F.col("city"),
                    F.lit("|"), F.col("zip"), F.lit("|"), F.col("fips_code"),
                ),
            )
        )
        .unionByName(
            _checksum(
                beds, "hospital_bed_information",
                F.concat(
                    F.col("hospital_fk"), F.lit("|"),
                    F.date_format("collection_week", "yyyy-MM-dd"),
                    *bed_parts,
                ),
            )
        )
    )


# ---------------------------------------------------------------------------
# round 3: training-corpus quality / retrieval-fusion / mixture planning
# ---------------------------------------------------------------------------

@register(
    "q170_repetition_screen",
    f"""WITH s AS (
         SELECT doc_id,
                {T.token_shingles_sql('text', 2)} AS bg,
                {T.token_shingles_sql('text', 3)} AS tg
         FROM documents),
       m AS (
         SELECT doc_id, len(bg) AS n_bg, len(tg) AS n_tg,
                CASE WHEN len(bg) = 0 THEN 0
                     ELSE list_max(list_transform(list_distinct(bg),
                                   x -> len(list_filter(bg, y -> y = x))))
                END AS top2_cnt,
                len(tg) - len(list_distinct(tg)) AS dup3
         FROM s),
       p AS (
         SELECT doc_id,
                CAST(CASE WHEN n_bg = 0 THEN 0
                          ELSE (top2_cnt * 1000000) // n_bg END AS BIGINT)
                  AS top2_ppm,
                CAST(CASE WHEN n_tg = 0 THEN 0
                          ELSE (dup3 * 1000000) // n_tg END AS BIGINT)
                  AS dup3_ppm
         FROM m)
       SELECT doc_id, top2_ppm, dup3_ppm,
              (top2_ppm >= 60000 OR dup3_ppm >= 10000) AS flagged
       FROM p""",
    "repetition-based quality screen (the Gopher/MassiveText repetition "
    "rules, adapted to the token stream): per document, the fraction of "
    "bigram slots occupied by the single most frequent bigram "
    "(top2_ppm) and the fraction of trigram occurrences that are "
    "repeats (dup3_ppm), thresholded into a drop flag.  Everything is "
    "a per-row higher-order array expression — distinct/filter/max "
    "fold over the doc's own shingles, O(doc_len * uniq) row-local "
    "work, NO explode, NO shuffle: at 100 TB this screen is a pure "
    "map over the corpus with zero exchanges, the cheapest possible "
    "shape for a first-pass filter.  Integer ppm floor-division is "
    "doc-local (bounded by doc length), so bigint cannot overflow "
    "regardless of corpus size",
)
def q170(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    base = d.select(
        "doc_id",
        T.token_shingles("text", 2).alias("bg"),
        T.token_shingles("text", 3).alias("tg"),
    )
    top2_cnt = F.when(F.size("bg") == 0, F.lit(0)).otherwise(
        F.array_max(
            F.transform(
                F.array_distinct("bg"),
                lambda x: F.size(F.filter(F.col("bg"), lambda y: y == x)),
            )
        )
    )
    m = base.select(
        "doc_id",
        F.size("bg").alias("n_bg"),
        F.size("tg").alias("n_tg"),
        top2_cnt.alias("top2_cnt"),
        (F.size("tg") - F.size(F.array_distinct("tg"))).alias("dup3"),
    )
    p = m.select(
        "doc_id",
        F.when(F.col("n_bg") == 0, F.lit(0))
        .otherwise(F.expr("(top2_cnt * 1000000) div n_bg"))  # ppm-ok: per-document bigram count, bounded by doc length
        .cast("long")
        .alias("top2_ppm"),
        F.when(F.col("n_tg") == 0, F.lit(0))
        .otherwise(F.expr("(dup3 * 1000000) div n_tg"))  # ppm-ok: per-document trigram dup count, bounded by doc length
        .cast("long")
        .alias("dup3_ppm"),
    )
    return p.select(
        "doc_id", "top2_ppm", "dup3_ppm",
        ((F.col("top2_ppm") >= 60000) | (F.col("dup3_ppm") >= 10000)).alias(
            "flagged"
        ),
    )


REGISTRY_ORACLE_Q156 = REGISTRY["q156_bm25_topk"].oracle
REGISTRY_ORACLE_Q38 = REGISTRY["q38_cosine_topk"].oracle


@register(
    "q171_rrf_fusion",
    """WITH lex AS (""" + REGISTRY_ORACLE_Q156 + """),
       dense AS (""" + REGISTRY_ORACLE_Q38 + """),
       ra AS (SELECT doc_id,
                     row_number() OVER (ORDER BY score DESC, doc_id) AS rk_a
              FROM lex),
       rb AS (SELECT vec_id AS doc_id,
                     row_number() OVER (ORDER BY sim DESC, vec_id) AS rk_b
              FROM dense)
       SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
              CAST(ra.rk_a AS INTEGER) AS rk_a,
              CAST(rb.rk_b AS INTEGER) AS rk_b,
              CAST(coalesce(1000000 // (60 + ra.rk_a), 0)
                 + coalesce(1000000 // (60 + rb.rk_b), 0) AS BIGINT)
                AS rrf_ppm
       FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
       ORDER BY rrf_ppm DESC, doc_id""",
    "reciprocal-rank fusion of a lexical and a dense retrieval arm "
    "(the standard hybrid-search combiner, Cormack et al.): the BM25 "
    "top-10 (q156) and the cosine-ANN top-10 (q38) are each re-ranked "
    "1..10, full-outer-joined on doc id, and fused by integer "
    "sum(1e6 div (60+rank)) — the k=60 RRF constant, exact integer "
    "arithmetic so both engines agree bit-for-bit.  Scale: each arm "
    "ends in a TakeOrderedAndProject (k rows reach the driver-side "
    "fusion, never the corpus); the fusion itself joins two k-row "
    "frames — at 100 TB the arms dominate and the fusion is free.  "
    "The rank windows run over k=10-row inputs, not the corpus",
)
def q171(spark: SparkSession, sf: str) -> DataFrame:
    lex = REGISTRY["q156_bm25_topk"].fn(spark, sf)
    dense = REGISTRY["q38_cosine_topk"].fn(spark, sf)
    # windows over the 10-row top-k results (post-LIMIT single
    # partition), not over the corpus
    wa = Window.orderBy(F.desc("score"), "doc_id")
    wb = Window.orderBy(F.desc("sim"), "vec_id")
    ra = lex.select("doc_id", F.row_number().over(wa).alias("rk_a"))
    rb = dense.select(
        F.col("vec_id").alias("doc_id"), F.row_number().over(wb).alias("rk_b")
    )
    return (
        ra.join(rb, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.col("rk_a").cast("int").alias("rk_a"),
            F.col("rk_b").cast("int").alias("rk_b"),
            (
                F.coalesce(F.expr("1000000 div (60 + rk_a)"), F.lit(0))
                + F.coalesce(F.expr("1000000 div (60 + rk_b)"), F.lit(0))
            )
            .cast("long")
            .alias("rrf_ppm"),
        )
        .orderBy(F.desc("rrf_ppm"), "doc_id")
    )


@register(
    "q172_mixture_allocation",
    """WITH counts AS (
         SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
       quota AS (
         SELECT source, n_docs,
                (1000 * n_docs) // sum(n_docs) OVER () AS base,
                (1000 * n_docs) % sum(n_docs) OVER () AS rem
         FROM counts),
       ranked AS (
         SELECT source, n_docs, base, rem,
                row_number() OVER (ORDER BY rem DESC, source) AS rr,
                1000 - sum(base) OVER () AS leftover
         FROM quota)
       SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
              CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                   AS BIGINT) AS alloc
       FROM ranked""",
    "training-mixture budget allocation by the largest-remainder "
    "(Hamilton) method: a sampling budget of 1000 documents is split "
    "across sources proportionally — integer floor quotas first, then "
    "the leftover seats go to the largest fractional remainders "
    "(deterministic tiebreak on source) so the allocations sum EXACTLY "
    "to the budget.  This is the planning step of every "
    "mixture-weighted corpus build (per-domain token budgets); "
    "downstream, q79's stratified quota sampler materializes each "
    "source's allocation.  Scale: one map-combinable count per source, "
    "then windows over the |sources|-row aggregate — never the corpus",
)
def q172(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy()
    quota = counts.select(
        "source",
        "n_docs",
        # decimal(38,0): budget*count is corpus-scaled (q149-class wrap
        # guard; DuckDB's // promotes to int128 on its own)
        F.expr("CAST(n_docs AS DECIMAL(38,0)) * 1000").alias("scaled"),
        F.sum("n_docs").over(w).alias("total"),
    ).select(
        "source",
        "n_docs",
        F.expr("scaled div total").alias("base"),
        (F.col("scaled") % F.col("total")).alias("rem"),
    )
    ranked = quota.select(
        "source",
        "n_docs",
        "base",
        "rem",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), "source"))
        .alias("rr"),
        (F.lit(1000) - F.sum("base").over(w)).alias("leftover"),
    )
    return ranked.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )


_Q158_ORACLE_TEXT = REGISTRY["q158_integer_kmeans"].oracle
#: the WITH-prefix (qv .. m2) of q158's unrolled integer k-means — the
#: final per-vector (vec_id, v, cid) assignment, reused verbatim so the
#: SemDeDup oracle clusters EXACTLY like operators/kmeans.py
_KMEANS_ASSIGN_CTE = _Q158_ORACLE_TEXT[
    : _Q158_ORACLE_TEXT.rindex("SELECT CAST(cid AS INTEGER)")
].rstrip()


@register(
    "q173_semantic_dedup",
    _KMEANS_ASSIGN_CTE
    + """,
       nrm AS (
         SELECT vec_id, cid, v,
                CAST(list_dot_product(CAST(v AS DOUBLE[]),
                                      CAST(v AS DOUBLE[])) AS BIGINT) AS n2
         FROM m2),
       cand AS (
         SELECT a.cid, b.vec_id AS ib,
                CAST(list_dot_product(CAST(a.v AS DOUBLE[]),
                                      CAST(b.v AS DOUBLE[])) AS BIGINT) AS d,
                a.n2 AS na2, b.n2 AS nb2
         FROM nrm a JOIN nrm b
           ON a.cid = b.cid AND a.vec_id < b.vec_id),
       dup AS (
         SELECT DISTINCT ib AS vec_id FROM cand
         WHERE d > 0 AND 400 * d * d >= 49 * na2 * nb2)
       SELECT CAST(m2.cid AS INTEGER) AS cluster,
              CAST(count(*) AS BIGINT) AS n_members,
              CAST(count(dup.vec_id) AS BIGINT) AS n_dropped,
              CAST(sum(CASE WHEN dup.vec_id IS NULL THEN m2.vec_id
                            ELSE 0 END) AS BIGINT) AS kept_id_sum
       FROM m2 LEFT JOIN dup ON m2.vec_id = dup.vec_id
       GROUP BY m2.cid""",
    "semantic deduplication (the SemDeDup shape, Abbas et al.): "
    "int8-quantized vectors cluster with the q158 deterministic "
    "integer k-means, then near-duplicate detection runs ONLY within "
    "each cluster — pairwise exact-integer cosine test "
    "400*dot^2 >= 49*|a|^2*|b|^2 (tau=0.35 stated as the exact "
    "rational 49/400; dot>0 guards the sign before squaring; every "
    "operand bounded by 4.3e14, int64-safe by construction) — and the "
    "min-id representative survives each duplicate relation.  Scale: "
    "this is the published fix for all-pairs semantic dedup at corpus "
    "scale — k grows with N so cluster size stays bounded, the "
    "quadratic term is per-cluster, and the cluster id is the shuffle "
    "key; centroids broadcast (q158), vectors shuffle ONCE on cluster "
    "id for the pair join.  Outputs per-cluster members/dropped and "
    "the surviving-id checksum",
)
def q173(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vector import int8_quantize, int_dot
    from ..operators.kmeans import int_kmeans_assign

    emb = load_table(spark, sf, "embeddings")
    qv = emb.select("vec_id", int8_quantize("embedding").alias("v"))
    assign = int_kmeans_assign(qv, "vec_id", "v", k=8, rounds=2)
    n2 = int_dot("v", "v")
    # rename AFTER the within-cluster self-join, not below it:
    # identical aliased subtrees keep the cluster exchange canonically
    # equal on both sides, so the quantize + assignment join is
    # shuffled once and reused (a localCheckpoint here measured SLOWER
    # at sf0.1 — the cache barrier serializes the DAG)
    nrm = assign.join(qv, "vec_id").select(
        "vec_id", "cluster", "v", n2.alias("n2")
    )
    a, b = nrm.alias("_va"), nrm.alias("_vb")
    d = int_dot(F.col("_va.v"), F.col("_vb.v"))
    dup = (
        a.join(b, "cluster")
        .filter(F.col("_va.vec_id") < F.col("_vb.vec_id"))
        .select(
            F.col("_vb.vec_id").alias("ib"),
            d.alias("d"),
            F.col("_va.n2").alias("na2"),
            F.col("_vb.n2").alias("nb2"),
        )
        .filter(
            (F.col("d") > 0)
            & (400 * F.col("d") * F.col("d") >= 49 * F.col("na2") * F.col("nb2"))
        )
        .select(F.col("ib").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        nrm.join(dup, "vec_id", "left")
        .groupBy(F.col("cluster").cast("int").alias("cluster"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum(F.col("_dup").isNotNull().cast("long"))
            .cast("long")
            .alias("n_dropped"),
            F.sum(F.when(F.col("_dup").isNull(), F.col("vec_id")).otherwise(0))
            .cast("long")
            .alias("kept_id_sum"),
        )
    )


@register(
    "q174_unigram_surprisal",
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         FROM documents),
       freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
       tot AS (SELECT sum(c) AS t FROM freq),
       scored AS (
         SELECT toks.doc_id,
                length(printf('%b', CAST(t // c AS BIGINT))) - 1 AS s
         FROM toks JOIN freq USING (tok), tot),
       per_doc AS (
         SELECT doc_id, count(*) AS n_tok, sum(s) AS ssum
         FROM scored GROUP BY doc_id)
       SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
              CAST((ssum * 1000000) // n_tok AS BIGINT) AS surprisal_ppm,
              (ssum * 1000000) // n_tok >= 6000000 AS flagged
       FROM per_doc""",
    "unigram-surprisal quality score (the model-free perplexity proxy "
    "every corpus filter starts from): token self-information against "
    "the corpus's own unigram distribution, with the log2 computed as "
    "the bit length of the INTEGER ratio total//count (printf('%b') / "
    "F.bin — floor(log2) via fp log is engine-unstable near powers of "
    "two and banned by the determinism contract, q147's trick).  "
    "Per-doc mean surprisal in ppm flags gibberish-heavy documents "
    "(mean >= 6 bits).  Plan: one vocab aggregate (map-combinable), "
    "the 1-row total broadcast via crossJoin, one freq equi-join back "
    "to the token stream, one per-doc aggregate — two shuffles total, "
    "both on bounded keys (vocab, doc_id); nothing quadratic, nothing "
    "driver-side",
)
def q174(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(T.tokens("text")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").alias("t"))
    scored = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            (F.length(F.bin(F.expr("t div c"))) - 1).alias("s"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"), F.sum("s").alias("ssum")
    )
    ppm = F.expr("(ssum * 1000000) div n_tok")  # ppm-ok: ssum = per-document sum of <64-bit surprisal over its own tokens; even a 1e10-token document stays ~6e11, x1e6 fits int64
    return per_doc.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        ppm.cast("long").alias("surprisal_ppm"),
        (ppm >= 6000000).alias("flagged"),
    )


@register(
    "q175_dataset_card",
    f"""WITH base AS (
         SELECT source, lang, doc_id,
                len(string_split(text, ' ')) AS n_tok,
                md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
         FROM documents),
       per_source AS (
         SELECT source,
                count(*) AS n_docs,
                sum(n_tok) AS total_tokens,
                count(*) - count(DISTINCT fp) AS n_exact_dup,
                count(DISTINCT lang) AS n_langs
         FROM base GROUP BY source)
       SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
              CAST(total_tokens AS BIGINT) AS total_tokens,
              CAST(n_exact_dup AS BIGINT) AS n_exact_dup,
              CAST(n_langs AS BIGINT) AS n_langs,
              CAST((total_tokens * 1000000) // sum(total_tokens) OVER ()
                   AS BIGINT) AS token_share_ppm
       FROM per_source""",
    "dataset-card rollup (the per-source summary table every corpus "
    "release ships): document and token counts, exact-duplicate count "
    "via normalized md5 fingerprints (count - distinct, the q33 "
    "fingerprint), language coverage, and each source's token share of "
    "the corpus in exact integer ppm.  Plan: one scan computing "
    "row-local fingerprints, one per-source aggregate "
    "(count-distinct on fingerprints shuffles (source, fp) pairs — "
    "bounded by corpus rows, map-side partial), then the share joins "
    "the |sources|-row aggregate against its own window total.  The "
    "ppm numerator routes through the window over the aggregate, "
    "never the scan",
)
def q175(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    base = d.select(
        "source",
        "lang",
        F.size(T.tokens("text")).alias("n_tok"),
        T.fingerprint(F.col("text")).alias("fp"),
    )
    per_source = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        (F.count("*") - F.countDistinct("fp")).alias("n_exact_dup"),
        F.countDistinct("lang").alias("n_langs"),
    )
    w = Window.partitionBy()
    return (
        per_source.withColumn("_tot", F.sum("total_tokens").over(w))
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.col("n_exact_dup").cast("long").alias("n_exact_dup"),
            F.col("n_langs").cast("long").alias("n_langs"),
            # decimal(38,0) ppm numerator: 100 TB token counts pass the
            # BIGINT*1e6 wrap point (q149-class overflow)
            F.expr(
                "(CAST(total_tokens AS DECIMAL(38,0)) * 1000000) div _tot"  # div-ok: mixture share, quotient <= 1e6
            )
            .cast("long")
            .alias("token_share_ppm"),
        )
    )


@register(
    "q176_soft_dedup_weights",
    """WITH reach AS ("""
    + _q76_oracle()
    + """),
       sizes AS (SELECT component, count(*) AS csz
                 FROM reach GROUP BY component),
       wts AS (
         SELECT d.doc_id, coalesce(s.csz, 1) AS cluster_size
         FROM documents d
         LEFT JOIN reach r ON d.doc_id = r.node
         LEFT JOIN sizes s ON r.component = s.component)
       SELECT doc_id, CAST(cluster_size AS BIGINT) AS cluster_size,
              CAST(1000000 // cluster_size AS BIGINT) AS weight_ppm
       FROM wts""",
    "soft deduplication by cluster-size down-weighting (the alternative "
    "to dropping near-duplicates: keep every copy but weight each "
    "1/cluster_size so the cluster contributes ONE document's worth of "
    "probability mass to training — the repetition-aware mixing used "
    "when hard dedup is too lossy).  Composes the q76 machinery: "
    "MinHash-LSH pairs -> pointer-jumping connected components -> "
    "cluster sizes -> per-doc exact integer ppm weights; docs outside "
    "any cluster get weight 1e6.  Scale: identical to q76 (banded "
    "candidates only, O(log d) rounds) plus two broadcast-sized joins "
    "(components and sizes are |clustered docs| rows, far smaller than "
    "the corpus)",
)
def q176(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    pairs = D.lsh_near_dup_pairs(
        # pair_budget=2000 (r10, VERDICT r9 wrong #1): the §8.10b
        # budget-derived cap replaces the absolute max_bucket=50 that
        # §8.10a measured going vacuous under corpus growth; q330's
        # constant, measured selective at all three SFs
        d, band_size=4, num_hashes=8, min_jaccard=0.4, pair_budget=2000
    ).select("id_a", "id_b")
    components = D.connected_components(pairs)
    sizes = components.groupBy("component").agg(F.count("*").alias("csz"))
    wts = (
        d.select("doc_id")
        .join(components.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .join(sizes, "component", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("csz"), F.lit(1)).alias("cluster_size"),
        )
    )
    return wts.select(
        "doc_id",
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.expr("1000000 div cluster_size").cast("long").alias("weight_ppm"),
    )


def _q177_state_sql(version: int) -> str:
    """Relational restatement of snapshot version N of the q177 table.

    v1 = orders with o_orderkey % 3 = 0; v2 = v1 plus % 3 = 1 rows
    (append); v3 = v2 MERGE-upserted with (% 6 = 0 -> cents + 10000)
    updates plus % 3 = 2 inserts.
    """
    base = (
        "SELECT o_orderkey AS k, o_orderstatus AS st,"
        " CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents"
        " FROM orders"
    )
    v1 = f"{base} WHERE o_orderkey % 3 = 0"
    v2 = f"{v1} UNION ALL {base} WHERE o_orderkey % 3 = 1"
    if version == 1:
        return v1
    if version == 2:
        return v2
    batch = (
        f"SELECT k, st, cents + 10000 AS cents FROM ({base} WHERE o_orderkey % 6 = 0) u"
        f" UNION ALL {base} WHERE o_orderkey % 3 = 2"
    )
    return (
        f"SELECT * FROM ({v2}) prev WHERE prev.k % 6 != 0"
        f" UNION ALL {batch}"
    )


def _q177_build(spark: SparkSession, sf: str, tag: str):
    """The q177 three-commit snapshot lifecycle (overwrite, append,
    MERGE-upsert) on an orders-derived table; shared by q177 (version
    fingerprints) and q196 (change-data feed)."""
    import os
    import shutil
    import tempfile

    from ..snapshots import SnapshotTable

    o = load_table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        cents.alias("cents"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "hdt_%s_%s_%d"
        % (tag, os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(spark, root)
    t.commit_overwrite(base.filter(F.col("k") % 3 == 0))
    t.commit_append(base.filter(F.col("k") % 3 == 1))
    batch = (
        base.filter(F.col("k") % 6 == 0)
        .withColumn("cents", F.col("cents") + 10000)
        .unionByName(base.filter(F.col("k") % 3 == 2))
    )
    t.commit_upsert(batch, ["k"])
    return t



@register(
    "q177_time_travel",
    "WITH "
    + ", ".join(
        f"s{v} AS ({_q177_state_sql(v)})" for v in (1, 2, 3)
    )
    + """
       SELECT * FROM ("""
    + " UNION ALL ".join(
        f"""SELECT {v} AS version, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS sum_cents,
               CAST(bit_xor(CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || st || '|' || CAST(cents AS VARCHAR)), 1, 15)) AS BIGINT)) AS BIGINT) AS xor_hash
           FROM s{v}"""
        for v in (1, 2, 3)
    )
    + ") t",
    "snapshot versioning + time travel differential "
    "(snapshots.py:SnapshotTable): three commits — initial overwrite, "
    "blind append, MERGE upsert (updates + inserts) — each publishing "
    "an immutable-file manifest via atomic rename, then ALL THREE "
    "historical versions are read back BY VERSION NUMBER and "
    "fingerprinted (count / exact-cents sum / xor of 60-bit row "
    "hashes).  The oracle restates each version's state relationally "
    "from orders, so snapshot isolation, append semantics, merge "
    "semantics, and time-travel reads all get driver-grade content "
    "equality.  This is the table-format contract (Delta/Iceberg "
    "core) the 100 TB warehouse needs: commits touch O(batch) files, "
    "readers plan from the manifest (never a directory listing), and "
    "concurrent committers conflict instead of clobbering",
)
def q177(spark: SparkSession, sf: str) -> DataFrame:
    t = _q177_build(spark, sf, "q177")

    h = T.hex_hash64(
        F.concat(
            F.col("k").cast("string"), F.lit("|"), F.col("st"),
            F.lit("|"), F.col("cents").cast("string"),
        )
    )

    def fp(v: int) -> DataFrame:
        return (
            t.read(version=v)
            .select(h.alias("h"), "cents")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"),
                F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
            )
            .select(
                F.lit(v).alias("version"), "n_rows", "sum_cents", "xor_hash"
            )
        )

    return fp(1).unionByName(fp(2)).unionByName(fp(3))


def _q178_oracle(
    pair_budget: int | None = None,
    derived_cap_budget: int | None = None,
) -> str:
    """Incremental LSH dedup oracle: batch (doc_id % 7 = 3) vs corpus.

    With ``pair_budget`` the corpus-side absolute cap (bn <= 50) is
    replaced by the join-budget derivation mirroring
    ``similarity.apply_join_pair_budget``: per shared bucket the
    candidate volume is corpus-rows x batch-rows, volumes compress to
    bit-length classes (DuckDB ``length(bin(v))`` == Spark's — no
    leading zeros), and a class is kept iff the running volume total
    through it (classes ascending) fits the budget.

    With ``derived_cap_budget`` the cap is instead the STORE-DERIVED
    admission cap (``dedup.derive_admission_cap``, VERDICT r10 wrong
    #3): ``LEAST(budget // n_bands, MAX corpus bucket size)`` —
    batch-independent (corpus-side only, the streaming requirement)
    and never failing open on a corpus whose largest bucket fits the
    budget.  The oracle's banding is hard-coded to 8 hashes / 2 bands,
    so ``n_bands = 2`` here."""
    sig_exprs = ",\n".join(
        f"         list_min(list_transform(t, x -> {hex_hash64_sql('x', f'mh{i}')})) AS sig{i}"
        for i in range(8)
    )

    def band(b: int, lo: int) -> str:
        concat = " || ',' || ".join(
            f"CAST(sig{j} AS VARCHAR)" for j in range(lo, lo + 4)
        )
        return f"SELECT doc_id, md5('{b},' || {concat}) AS bucket FROM sigs\n"

    return (
        "WITH toks AS (SELECT doc_id, doc_id % 7 = 3 AS in_batch,\n"
        "                     list_distinct(string_split(text, ' ')) AS t\n"
        "              FROM documents),\n"
        f"sigs AS (SELECT doc_id,\n{sig_exprs}\n  FROM toks),\n"
        "bands AS (\n  " + band(0, 0) + "  UNION ALL\n  " + band(1, 4) + "),\n"
        + (
            "cbands AS (SELECT b.doc_id AS id_c, b.bucket\n"
            "           FROM bands b JOIN toks tk ON b.doc_id = tk.doc_id\n"
            "           WHERE NOT tk.in_batch),\n"
            "bb AS (SELECT b.doc_id AS id_b, b.bucket\n"
            "       FROM bands b JOIN toks tk ON b.doc_id = tk.doc_id\n"
            "       WHERE tk.in_batch),\n"
            "nc AS (SELECT bucket, count(*) AS nb FROM cbands GROUP BY bucket),\n"
            "npb AS (SELECT bucket, count(*) AS np FROM bb GROUP BY bucket),\n"
            "vol AS (SELECT bucket, nb * np AS v,\n"
            "               length(bin(least(nb * np,\n"
            "                     4611686018427387904))) AS vc\n"
            "        FROM nc JOIN npb USING (bucket)),\n"
            "cum AS (SELECT vc, SUM(v) OVER (ORDER BY vc) AS cumv\n"
            "        FROM (SELECT vc, SUM(v) AS v FROM vol GROUP BY vc)),\n"
            f"thr AS (SELECT COALESCE(MAX(vc), 0) AS cap FROM cum\n"
            f"        WHERE cumv <= {pair_budget}),\n"
            "cb AS (SELECT c.id_c, c.bucket FROM cbands c\n"
            "       JOIN vol USING (bucket) CROSS JOIN thr t\n"
            "       WHERE vol.vc <= t.cap),\n"
            if pair_budget is not None
            else
            "cbands AS (SELECT b.doc_id AS id_c, b.bucket\n"
            "           FROM bands b JOIN toks tk ON b.doc_id = tk.doc_id\n"
            "           WHERE NOT tk.in_batch),\n"
            "nc AS (SELECT bucket, count(*) AS nb FROM cbands GROUP BY bucket),\n"
            f"thr AS (SELECT LEAST({(derived_cap_budget or 0) // 2}, MAX(nb))"
            " AS cap FROM nc),\n"
            "cb AS (SELECT c.id_c, c.bucket FROM cbands c\n"
            "       JOIN nc USING (bucket) CROSS JOIN thr t\n"
            "       WHERE nc.nb <= t.cap),\n"
            "bb AS (SELECT b.doc_id AS id_b, b.bucket\n"
            "       FROM bands b JOIN toks tk ON b.doc_id = tk.doc_id\n"
            "       WHERE tk.in_batch),\n"
            if derived_cap_budget is not None
            else "cb AS (SELECT doc_id AS id_c, bucket FROM (\n"
            "    SELECT b.doc_id, b.bucket,\n"
            "           count(*) OVER (PARTITION BY b.bucket) AS bn\n"
            "    FROM bands b JOIN toks tk ON b.doc_id = tk.doc_id\n"
            "    WHERE NOT tk.in_batch) WHERE bn <= 50),\n"
            "bb AS (SELECT b.doc_id AS id_b, b.bucket\n"
            "       FROM bands b JOIN toks tk ON b.doc_id = tk.doc_id\n"
            "       WHERE tk.in_batch),\n"
        )
        + "cands AS (SELECT DISTINCT id_b, id_c FROM bb JOIN cb USING (bucket)),\n"
        "verified AS (\n"
        "  SELECT c.id_b, c.id_c\n"
        "  FROM cands c JOIN toks tb ON c.id_b = tb.doc_id\n"
        "               JOIN toks tc ON c.id_c = tc.doc_id\n"
        "  WHERE (floor((CAST(len(list_intersect(tb.t, tc.t)) AS DOUBLE)\n"
        "              / CAST(len(tb.t) + len(tc.t)\n"
        "                     - len(list_intersect(tb.t, tc.t)) AS DOUBLE))\n"
        "              * 1000000.0) / 1000000.0) >= 0.4),\n"
        "m AS (SELECT id_b, count(DISTINCT id_c) AS n_matches\n"
        "      FROM verified GROUP BY id_b)\n"
        "SELECT tk.doc_id,\n"
        "       CAST(coalesce(m.n_matches, 0) AS BIGINT) AS n_matches,\n"
        "       m.id_b IS NULL AS admitted\n"
        "FROM toks tk LEFT JOIN m ON tk.doc_id = m.id_b\n"
        "WHERE tk.in_batch"
    )


@register(
    "q178_incremental_dedup",
    _q178_oracle(),
    "ingest-time incremental near-dup admission (the production dedup "
    "shape: never re-dedup the corpus, probe it): the incoming batch "
    "(doc_id % 7 = 3) MinHash-bands against the STORED corpus's "
    "signatures only — no batch x batch and no corpus x corpus pair "
    "ever forms (operators/dedup.py:lsh_incremental_matches), corpus "
    "buckets over 50 docs are dropped as boilerplate (same cap as "
    "q51), and candidates verify by exact Jaccard >= 0.4.  Each batch "
    "doc reports its verified corpus-match count and an admitted flag. "
    "At 100 TB the corpus signatures are written once at their own "
    "ingest and probed like an index: per-batch cost is O(batch x "
    "collision rate) with the batch side broadcastable — the reason "
    "ingest stays O(new data) instead of O(history).  The oracle "
    "recomputes the identical md5 signature/band/cap/verify pipeline "
    "relationally (deterministic hashes, zero drift)",
)
def q178(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    in_batch = F.col("doc_id") % 7 == 3
    corpus = d.filter(~in_batch)
    batch = d.filter(in_batch)
    # scan-rooted inputs (table read + narrow filters): the widen=None
    # default auto-detects this shape and applies the task-granularity
    # guard — without it the single-split sf0.1 scan serializes the
    # signature stage (measured 1.7x in r7; the auto-detect replaced
    # the per-call-site widen=True annotation that fixed only this one
    # of the three scan-rooted callers)
    return D.lsh_incremental_matches(
        corpus, batch,
        # q178 IS the absolute-cap exemplar of the incremental family
        # (its budget migration is q331 beside it, and the stored twins
        # q332-q334); after the r10 migration of q76/q77/q176/q179/q211
        # the only registry entries passing a bare max_bucket are the
        # two designated exemplars (q51, q178) and their direct
        # composites/evals (q180, q250, q332)
        band_size=4, num_hashes=8, min_jaccard=0.4, max_bucket=50,
    )


@register(
    "q331_incremental_dedup_budget",
    _q178_oracle(pair_budget=1000),
    "q178's ingest-time admission under the §8.11b budget-derived cap "
    "(similarity.apply_join_pair_budget): the corpus-side bucket "
    "keep-set is sized in-plan from a total candidate-pair budget over "
    "the PRODUCT volumes (corpus rows x batch rows per shared bucket), "
    "compressed to bit-length classes so the running DECIMAL(38,0) "
    "total never orders O(distinct buckets) rows through one window.  "
    "The oracle mirrors the derivation (DuckDB length(bin(v)) == "
    "Spark's), so the differential gates the class threshold itself.  "
    "Why this entry exists: §8.11b measured the absolute cap FALSELY "
    "ADMITTING 93% of near-boilerplate probes at 1x and 2x corpus "
    "(ingest-side cap vacuity poisons the stored corpus) while this "
    "budget form held 2%; budget 1000 is selective and non-vacuous at "
    "all three test SFs (e.g. sf0.1 derives class cap 4, keeping 129 "
    "small buckets, dropping the 2 class-20 boilerplate buckets whose "
    "volume alone is ~1.16M)",
)
def q331(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    in_batch = F.col("doc_id") % 7 == 3
    return D.lsh_incremental_matches(
        d.filter(~in_batch), d.filter(in_batch),
        band_size=4, num_hashes=8, min_jaccard=0.4, pair_budget=1000,
    )


@register(
    "q332_incremental_dedup_stored",
    _q178_oracle(),
    "q178's ingest-time admission probing a PERSISTED signature store "
    "— the shape q178's own docstring promises ('corpus signatures "
    "are computed once at their own ingest and probed like an index') "
    "made real: dedup.build_lsh_store writes the corpus's band-bucket "
    "table (sorted by bucket) and token-set table (sorted by id) to "
    "parquet ONCE, and lsh_incremental_matches_stored(probe_pushdown) "
    "signs only the BATCH, collects its distinct band buckets "
    "(bounded: |batch| x n_bands) as an IN filter on the bucket "
    "store, and the surviving candidates' corpus ids (bounded: probe "
    "buckets x max_bucket) as an IN filter on the token store — on "
    "the sorted stores both pushed filters prune parquet row groups, "
    "so probe IO is O(collisions) while the recompute path (q178) "
    "re-signs and re-tokenizes the full corpus every batch.  §8.12 "
    "measures exactly that divergence as the store grows 1x->10x.  "
    "The oracle IS q178's relational statement: the store is an "
    "implementation detail, so stored-path == recompute-path == "
    "relational truth is driver-gated as one hash equality",
)
def q332(spark: SparkSession, sf: str) -> DataFrame:
    # build + probe in one call (the registered differential runs the
    # whole delivery cycle); bench.py times the phases separately via
    # STORE_SPLIT so the one-time build cost stops reading as query
    # cost in round-over-round diffs (VERDICT r9 task #5)
    return _q332_probe(spark, sf, _q332_build(spark, sf))


def _q332_build(spark: SparkSession, sf: str) -> str:
    """q332's one-time store build: corpus -> band-bucket + token-set
    parquet stores, sorted on the probe keys.  Returns the store root."""
    import os
    import shutil
    import tempfile

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    corpus = d.filter(~(F.col("doc_id") % 7 == 3))

    root = os.path.join(
        tempfile.gettempdir(),
        "hdt_q332_%s_%d"
        % (os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    shutil.rmtree(root, ignore_errors=True)
    buckets, tokens = D.build_lsh_store(
        corpus, band_size=4, num_hashes=8
    )
    # one-time store build per corpus delivery: global sort on the
    # probe key gives every row group a tight min/max, which is what
    # lets the probe-time IN filters skip non-collision groups
    buckets.sort("bucket").write.parquet(os.path.join(root, "buckets"))
    tokens.sort("id_c").write.parquet(os.path.join(root, "tokens"))
    return root


def _q332_probe(spark: SparkSession, sf: str, root: str) -> DataFrame:
    """q332's per-batch probe against the persisted store at ``root``."""
    import os

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    batch = d.filter(F.col("doc_id") % 7 == 3)
    sb = spark.read.parquet(os.path.join(root, "buckets"))
    st = spark.read.parquet(os.path.join(root, "tokens"))
    return D.lsh_incremental_matches_stored(
        sb, st, batch,
        band_size=4, num_hashes=8, min_jaccard=0.4, max_bucket=50,
        probe_pushdown=True,
    )


def _q333_oracle(
    pair_budget: int = 100,
    n_planes: int = 8,
    max_bucket: int | None = None,
    derived_cap_budget: int | None = None,
) -> str:
    """Embedding ingest-admission oracle: batch (vec_id % 7 = 3) vs
    corpus, candidates by equal random-hyperplane LSH signature
    (q100's integer-exact restatement), corpus buckets kept per the
    apply_join_pair_budget derivation (bit-length classes over
    corpus-rows x batch-rows product volumes — q178/q331's mirrored
    form), verified by exact floor6 cosine.

    ``max_bucket`` swaps the budget CTEs for the corpus-side absolute
    cap — the BATCH-INDEPENDENT form the streaming twin (q338) needs:
    a per-microbatch budget would derive its keep-set from that
    microbatch's probe counts, so the union of arrival verdicts could
    differ from the whole-batch result; the corpus-side cap cannot.

    ``derived_cap_budget`` swaps in the STORE-DERIVED admission cap
    (``dedup.derive_admission_cap``, VERDICT r10 wrong #3):
    ``LEAST(budget, MAX corpus bucket size)`` — still batch-
    independent, but sized by the corpus distribution under a stated
    budget instead of a constant that §8.11b showed fails open.  One
    signature per vector => ``n_bands = 1``."""
    from ..functions.vector import int8_quantize_sql
    from ..operators.similarity import _hyperplanes

    planes = _hyperplanes(n_planes, 64)
    bits = " + ".join(
        f"(CASE WHEN CAST(list_dot_product(CAST(qv AS DOUBLE[]), "
        f"CAST({plane!r} AS DOUBLE[])) AS BIGINT) > 0 THEN {1 << j} ELSE 0 END)"
        for j, plane in enumerate(planes)
    )
    cos = cosine_sql("qb.embedding", "qc.embedding")
    if max_bucket is not None:
        keep_ctes = (
            "cb AS (SELECT id_c, lsh_sig FROM (\n"
            "  SELECT id_c, lsh_sig, count(*) OVER (PARTITION BY lsh_sig) AS bn\n"
            f"  FROM cs) WHERE bn <= {max_bucket}),"
        )
    elif derived_cap_budget is not None:
        keep_ctes = (
            "nc AS (SELECT lsh_sig, count(*) AS nb FROM cs GROUP BY lsh_sig),\n"
            f"thr AS (SELECT LEAST({derived_cap_budget}, MAX(nb)) AS cap"
            " FROM nc),\n"
            "cb AS (SELECT c.id_c, c.lsh_sig FROM cs c\n"
            "       JOIN nc USING (lsh_sig) CROSS JOIN thr t\n"
            "       WHERE nc.nb <= t.cap),"
        )
    else:
        keep_ctes = f"""nc AS (SELECT lsh_sig, count(*) AS nb FROM cs GROUP BY lsh_sig),
       npb AS (SELECT lsh_sig, count(*) AS np FROM bs GROUP BY lsh_sig),
       vol AS (SELECT lsh_sig, nb * np AS v,
                      length(bin(least(nb * np,
                            4611686018427387904))) AS vc
               FROM nc JOIN npb USING (lsh_sig)),
       cum AS (SELECT vc, SUM(v) OVER (ORDER BY vc) AS cumv
               FROM (SELECT vc, SUM(v) AS v FROM vol GROUP BY vc)),
       thr AS (SELECT COALESCE(MAX(vc), 0) AS cap FROM cum
               WHERE cumv <= {pair_budget}),
       cb AS (SELECT c.id_c, c.lsh_sig FROM cs c
              JOIN vol USING (lsh_sig) CROSS JOIN thr t
              WHERE vol.vc <= t.cap),"""
    return f"""WITH q0 AS (SELECT vec_id, vec_id % 7 = 3 AS in_batch, embedding,
                     {int8_quantize_sql('embedding')} AS qv
              FROM embeddings),
       sigs AS (SELECT vec_id, in_batch, CAST({bits} AS BIGINT) AS lsh_sig
                FROM q0),
       cs AS (SELECT vec_id AS id_c, lsh_sig FROM sigs WHERE NOT in_batch),
       bs AS (SELECT vec_id AS id_b, lsh_sig FROM sigs WHERE in_batch),
       {keep_ctes}
       cands AS (SELECT DISTINCT id_b, id_c FROM bs JOIN cb USING (lsh_sig)),
       verified AS (
         SELECT c.id_b, c.id_c
         FROM cands c JOIN q0 qb ON c.id_b = qb.vec_id
                      JOIN q0 qc ON c.id_c = qc.vec_id
         WHERE (floor(({cos}) * 1000000.0) / 1000000.0) >= 0.3),
       m AS (SELECT id_b, count(DISTINCT id_c) AS n_matches
             FROM verified GROUP BY id_b)
       SELECT q0.vec_id,
              CAST(coalesce(m.n_matches, 0) AS BIGINT) AS n_matches,
              m.id_b IS NULL AS admitted
       FROM q0 LEFT JOIN m ON q0.vec_id = m.id_b
       WHERE q0.in_batch"""


@register(
    "q333_embedding_incremental_dedup",
    _q333_oracle(),
    "ingest-time near-dup admission for VECTORS (SemDeDup-at-ingest, "
    "the embedding sibling of q178/q331): the incoming embedding "
    "batch (vec_id % 7 = 3) is signed with the q100 random-hyperplane "
    "LSH (integer-exact signatures) and joined to the STORED corpus's "
    "signatures only — no batch x batch and no corpus x corpus pair "
    "ever forms; the corpus-side bucket keep-set is sized by "
    "pair_budget=100 through apply_join_pair_budget (the §8.11b "
    "lesson applies verbatim to vectors: an absolute bucket cap's "
    "dropped dense buckets ADMIT their near-dups into the stored "
    "corpus), and candidates verify by exact floor6 cosine >= 0.3 on "
    "the raw vectors.  Budget 100 is selective and non-vacuous at ALL "
    "THREE test SFs (measured class cums: sf0.001 keeps classes 1-2 "
    "of 4 [cum 71 of 173], sf0.01 1-2 of 4 [70 of 115], sf0.1 1-2 of "
    "6 [45 of 2170] — mid-distribution selectivity everywhere, the "
    "q330 criterion).  The oracle mirrors signature construction "
    "(q100's restatement) AND the budget derivation (q331's "
    "bit-length classes), so the differential gates both",
)
def q333(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    in_batch = F.col("vec_id") % 7 == 3
    return D.embedding_incremental_matches(
        e.filter(~in_batch), e.filter(in_batch),
        min_cosine=0.3, pair_budget=100,
    )


@register(
    "q334_embedding_incremental_stored",
    _q333_oracle(),
    "q333's vector admission probing a PERSISTED store — the q332 "
    "pattern on the embedding side: build_embedding_lsh_store writes "
    "the corpus's signature buckets (sorted by lsh_sig) and raw "
    "vectors + precomputed norms (sorted by id) to parquet ONCE, and "
    "embedding_incremental_matches_stored(probe_pushdown) signs only "
    "the BATCH, pushing its distinct signatures (bounded: |batch|) "
    "and the surviving candidates' corpus ids (bounded: pair_budget) "
    "as IN filters into the sorted stores — probe IO is "
    "O(collisions), not O(store), and verification norms read the "
    "store instead of re-folding the corpus.  The oracle IS q333's "
    "statement verbatim: the store is an implementation detail, so "
    "stored == recompute == relational truth is one driver hash "
    "equality (the q332 proof shape)",
)
def q334(spark: SparkSession, sf: str) -> DataFrame:
    # build + probe in one call; bench.py separates the phases via
    # STORE_SPLIT (VERDICT r9 task #5) — see q332
    return _q334_probe(spark, sf, _q334_build(spark, sf))


def _q334_build(spark: SparkSession, sf: str) -> str:
    """q334's one-time store build: corpus -> signature-bucket +
    vector(+norm) parquet stores, sorted on the probe keys."""
    import os
    import shutil
    import tempfile

    e = load_table(spark, sf, "embeddings")
    corpus = e.filter(~(F.col("vec_id") % 7 == 3))

    root = os.path.join(
        tempfile.gettempdir(),
        "hdt_q334_%s_%d"
        % (os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    shutil.rmtree(root, ignore_errors=True)
    buckets, vectors = D.build_embedding_lsh_store(corpus)
    buckets.sort("lsh_sig").write.parquet(os.path.join(root, "buckets"))
    vectors.sort("id_c").write.parquet(os.path.join(root, "vectors"))
    return root


def _q334_probe(spark: SparkSession, sf: str, root: str) -> DataFrame:
    """q334's per-batch probe against the persisted store at ``root``."""
    import os

    e = load_table(spark, sf, "embeddings")
    batch = e.filter(F.col("vec_id") % 7 == 3)
    sb = spark.read.parquet(os.path.join(root, "buckets"))
    sv = spark.read.parquet(os.path.join(root, "vectors"))
    return D.embedding_incremental_matches_stored(
        sb, sv, batch,
        min_cosine=0.3, pair_budget=100, probe_pushdown=True,
    )


@register(
    "q179_quality_keeper",
    """WITH reach AS ("""
    + _q76_oracle()
    + """),
       scored AS (
         SELECT r.component, r.node, d.n_chars
         FROM reach r JOIN documents d ON r.node = d.doc_id),
       ranked AS (
         SELECT component, node, n_chars,
                row_number() OVER (PARTITION BY component
                                   ORDER BY n_chars DESC, node) AS rk
         FROM scored)
       SELECT component,
              CAST(count(*) AS BIGINT) AS n_members,
              CAST(max(CASE WHEN rk = 1 THEN node END) AS BIGINT)
                AS keeper_id,
              CAST(max(CASE WHEN rk = 1 THEN n_chars END) AS BIGINT)
                AS kept_chars
       FROM ranked GROUP BY component""",
    "quality-aware dedup keeper selection: near-dup clusters (q76's "
    "MinHash-LSH -> connected components) keep their LONGEST member "
    "(n_chars desc, doc_id tiebreak) instead of the arbitrary min-id — "
    "the policy real corpus dedup uses, because near-duplicate groups "
    "usually contain truncated/boilerplate-stripped variants and the "
    "most complete copy should survive.  Implemented as one max_by "
    "struct argmax per component (map-combinable aggregate, no "
    "row_number window over the corpus; the oracle states the same "
    "argmax via a per-component rank).  Scale: identical to q76 plus "
    "one |clustered docs|-row join against the documents' metadata "
    "column — the text never moves",
)
def q179(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    pairs = D.lsh_near_dup_pairs(
        # pair_budget=2000 (r10, VERDICT r9 wrong #1): the §8.10b
        # budget-derived cap replaces the absolute max_bucket=50 that
        # §8.10a measured going vacuous under corpus growth; q330's
        # constant, measured selective at all three SFs
        d, band_size=4, num_hashes=8, min_jaccard=0.4, pair_budget=2000
    ).select("id_a", "id_b")
    components = D.connected_components(pairs)
    scored = components.join(
        d.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    # argmax by (n_chars desc, node asc) via max_by on an ordered struct:
    # invert n_chars ordering by negating inside the struct would break
    # the exact-integer contract, so order on (n_chars, -node) and take
    # max — n_chars dominates, and for equal n_chars the SMALLEST node
    # wins because -node is maximal there
    keeper = F.max_by(
        F.struct(F.col("node").alias("k"), F.col("n_chars").alias("c")),
        F.struct(F.col("n_chars"), (-F.col("node")).alias("nn")),
    )
    return scored.groupBy("component").agg(
        F.count("*").cast("long").alias("n_members"),
        keeper.getField("k").cast("long").alias("keeper_id"),
        keeper.getField("c").cast("long").alias("kept_chars"),
    )


@register(
    "q180_versioned_dedup_ingest",
    "WITH adm AS (SELECT doc_id FROM ("
    + _q178_oracle()
    + """) WHERE admitted),
       v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 != 3),
       v2 AS (SELECT * FROM v1
              UNION ALL
              SELECT d.doc_id, d.text FROM documents d
              JOIN adm ON d.doc_id = adm.doc_id),
       h1 AS (SELECT """
    + hex_hash64_sql("CAST(doc_id AS VARCHAR) || '|' || text")
    + """ AS h FROM v1),
       h2 AS (SELECT """
    + hex_hash64_sql("CAST(doc_id AS VARCHAR) || '|' || text")
    + """ AS h FROM v2)
       SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(bit_xor(h) AS BIGINT) AS xor_hash,
              CAST(sum(h % 1000000007) AS BIGINT) AS sum_mod
       FROM h1
       UNION ALL
       SELECT 2, CAST(count(*) AS BIGINT), CAST(bit_xor(h) AS BIGINT),
              CAST(sum(h % 1000000007) AS BIGINT)
       FROM h2""",
    "the capstone ingest pipeline, end to end: the stored corpus is "
    "snapshot version 1 (snapshots.py commit), the incoming batch "
    "passes the incremental near-dup gate (q178's batch-vs-corpus "
    "MinHash banding + exact-Jaccard verify, no corpus rescan), and "
    "ONLY the admitted documents commit as version 2 (atomic manifest "
    "flip) — then BOTH versions are read back by version number and "
    "content-fingerprinted.  This is what a 100 TB training-corpus "
    "store actually runs on every delivery: reproducible versioned "
    "snapshots, O(batch) dedup cost against the stored history, "
    "auditable admission, time-travel to any prior corpus state.  The "
    "oracle restates the admitted set and both version states "
    "relationally — snapshot isolation, admission logic, and append "
    "semantics all content-verified",
)
def q180(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..snapshots import SnapshotTable

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    in_batch = F.col("doc_id") % 7 == 3
    corpus = d.filter(~in_batch)
    batch = d.filter(in_batch)

    root = os.path.join(
        tempfile.gettempdir(),
        "hdt_q180_%s_%d"
        % (os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(spark, root)
    t.commit_overwrite(corpus)

    stored = t.read(version=1)
    admitted = (
        D.lsh_incremental_matches(
            stored, batch,
            # composes q178's exemplar config verbatim (the oracle is
            # built on _q178_oracle); the budget form is q331
            band_size=4, num_hashes=8, min_jaccard=0.4, max_bucket=50,
        )
        .filter(F.col("admitted"))
        .select("doc_id")
        .join(batch, "doc_id")
    )
    t.commit_append(admitted)

    h = T.hex_hash64(
        F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text"))
    )

    def fp(v: int) -> DataFrame:
        return (
            t.read(version=v)
            .select(h.alias("h"))
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
                F.sum(F.col("h") % 1000000007).cast("long").alias("sum_mod"),
            )
            .select(F.lit(v).alias("version"), "n_docs", "xor_hash", "sum_mod")
        )

    return fp(1).unionByName(fp(2))


@register(
    "q181_stream_incremental_dedup",
    _q178_oracle(derived_cap_budget=D.ADMISSION_CAP_BUDGET),
    "the q178 ingest-time near-dup gate run as a STREAM "
    "(streaming/ingest.py:stream_incremental_dedup): the batch "
    "documents arrive as two microbatch files and foreachBatch runs "
    "the identical banding/verify admission per arrival against the "
    "corpus's PERSISTED LSH store (build_lsh_store, written once "
    "before the stream; each arrival probes it via "
    "lsh_incremental_matches_stored, signing only the arrival — the "
    "pre-r9 shape re-signed the full corpus inside every microbatch, "
    "the §8.12-measured O(history) cost at the highest-frequency "
    "ingest path).  The bucket guard is the admission cap DERIVED "
    "corpus-side at build time and stamped in the store's footer "
    "metadata (min(cap_budget/n_bands, max corpus bucket size) — "
    "dedup.derive_admission_cap; r10's hard-coded max_bucket=50 is "
    "the §8.11b/§8.11c-measured fail-OPEN constant), which the probe "
    "reads by default.  Admission is stateless given the store (each "
    "doc consults only corpus signatures, never other arrivals), so "
    "the union of per-microbatch verdicts provably equals the "
    "one-shot batch result — and the oracle IS q178's relational "
    "statement with the derived-cap CTEs mirrored, making this a "
    "true streaming-equals-batch differential, not a rows-only "
    "check.  At 100 TB the stored signature table is the "
    "probe index and streaming state is empty: arrival granularity "
    "(2 files here, thousands of deliveries in production) cannot "
    "change the admitted set",
)
def q181(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.ingest import stream_incremental_dedup

    return stream_incremental_dedup(spark, sf)


# ---------------------------------------------------------------------------
# round-3 continuation: crawl/curation staples (q182-q184)
# ---------------------------------------------------------------------------

_Q182_HOST_SQL = (
    "(CASE CAST({h_sub} % 4 AS INTEGER) WHEN 0 THEN 'www' WHEN 1 THEN 'cdn' "
    "WHEN 2 THEN 'blog' ELSE 'm' END) || '.' || "
    "('d' || substr(md5('dom|' || CAST(doc_id AS VARCHAR)), 1, 2)) || '.' || "
    "(CASE CAST({h_tld} % 4 AS INTEGER) WHEN 0 THEN 'com' WHEN 1 THEN 'org' "
    "WHEN 2 THEN 'net' ELSE 'io' END)"
).format(
    h_sub=hex_hash64_sql("CAST(doc_id AS VARCHAR)", "sub"),
    h_tld=hex_hash64_sql("CAST(doc_id AS VARCHAR)", "tld"),
)


@register(
    "q182_domain_stats",
    f"""WITH urls AS (
          SELECT doc_id,
                 {_Q182_HOST_SQL} AS host,
                 len(string_split(text, ' ')) AS n_tok,
                 {fingerprint_sql('text')} AS fp
          FROM documents),
        labeled AS (
          SELECT doc_id, n_tok, fp,
                 split_part(host, '.', 1) AS sub,
                 split_part(host, '.', 2) || '.' || split_part(host, '.', 3)
                   AS domain
          FROM urls)
       SELECT domain,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(DISTINCT sub) AS BIGINT) AS n_subdomains,
              CAST(sum(n_tok) AS BIGINT) AS total_tokens,
              CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dup
       FROM labeled GROUP BY domain""",
    "per-registrable-domain corpus rollup (the crawl-curation staple: "
    "domain-level doc counts, subdomain spread, token mass, and "
    "exact-duplicate density drive domain allow/deny lists).  URLs are "
    "synthesized deterministically from doc_id (md5-derived subdomain/"
    "domain/TLD — no URL column in the testdata), the host is extracted "
    "with Spark's built-in parse_url (JVM-side, codegen), and the "
    "registrable domain is the last two host labels "
    "(substring_index(host, '.', -2) — the public-suffix heuristic; a "
    "real PSL lookup is a broadcast join against the suffix list).  "
    "Plan: one scan computing row-local url/host/fingerprint columns, "
    "one per-domain aggregate with two count-distincts (shuffles "
    "(domain, sub|fp) pairs, map-side partial).  ~256 domains at any "
    "scale, so the aggregate output is constant-size",
)
def q182(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    did = F.col("doc_id").cast("string")
    h_sub = T.hex_hash64(did, salt="sub")
    h_tld = T.hex_hash64(did, salt="tld")
    subs = F.array(F.lit("www"), F.lit("cdn"), F.lit("blog"), F.lit("m"))
    tlds = F.array(F.lit("com"), F.lit("org"), F.lit("net"), F.lit("io"))
    url = F.concat(
        F.lit("https://"),
        F.element_at(subs, (h_sub % 4 + 1).cast("int")),
        F.lit("."),
        F.lit("d"),
        F.substring(F.md5(F.concat(F.lit("dom|"), did)), 1, 2),
        F.lit("."),
        F.element_at(tlds, (h_tld % 4 + 1).cast("int")),
        F.lit("/p/"),
        did,
    )
    host = F.parse_url(url, F.lit("HOST"))
    base = d.select(
        host.alias("host"),
        F.substring_index(host, ".", 1).alias("sub"),
        F.substring_index(host, ".", -2).alias("domain"),
        T.token_count("text").alias("n_tok"),
        T.fingerprint(F.col("text")).alias("fp"),
    )
    return base.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("sub").cast("long").alias("n_subdomains"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        (F.count("*") - F.countDistinct("fp")).cast("long").alias("n_exact_dup"),
    )


Q183_SHARD_SIZE = 1000


@register(
    "q183_train_shard_manifest",
    f"""WITH base AS (
          SELECT doc_id,
                 {hex_hash64_sql("CAST(doc_id AS VARCHAR)", "shard")} AS shk,
                 len(string_split(text, ' ')) AS n_tok
          FROM documents),
        ordered AS (
          SELECT *, row_number() OVER (ORDER BY shk, doc_id) AS rn
          FROM base)
       SELECT CAST((rn - 1) // {Q183_SHARD_SIZE} AS BIGINT) AS shard,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tok) AS BIGINT) AS total_tokens,
              CAST(min(rn) AS BIGINT) AS first_rn,
              CAST(max(rn) AS BIGINT) AS last_rn,
              CAST(sum(shk % 1000000007) AS BIGINT) AS checksum_mod
       FROM ordered GROUP BY 1""",
    "deterministic global shuffle-and-shard manifest (the training-"
    "export step: order the corpus by a seeded hash so every run and "
    "every engine produces the SAME shuffle, cut it into fixed-size "
    "shards, and emit the per-shard manifest - counts, token mass, rn "
    "range, content checksum - that the trainer validates before "
    "reading).  The global order comes from operators/topk.py:"
    "global_row_number (range-partition on the hash key, rank locally, "
    "shift by per-partition offsets - one scalar collect of partition "
    "COUNTS, never a single-partition window), so the shuffle order is "
    "total, reproducible, and 100 TB-safe; shard assignment is then a "
    "row-local div.  Contrast a rand()-based shuffle: not reproducible "
    "across retries, and un-oracle-able",
)
def q183(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    base = d.select(
        "doc_id",
        T.hex_hash64(F.col("doc_id").cast("string"), salt="shard").alias("shk"),
        T.token_count("text").alias("n_tok"),
    )
    ordered = K.global_row_number(base, [F.col("shk"), F.col("doc_id")])
    return (
        ordered.withColumn(
            "shard", F.expr(f"(rn - 1) div {Q183_SHARD_SIZE}")
        )
        .groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.min("rn").cast("long").alias("first_rn"),
            F.max("rn").cast("long").alias("last_rn"),
            F.sum(F.col("shk") % 1000000007).cast("long").alias("checksum_mod"),
        )
    )


_Q184_PERDOC_SQL = """toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         FROM documents),
       freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
       tot AS (SELECT sum(c) AS t FROM freq),
       scored AS (
         SELECT toks.doc_id,
                length(printf('%b', CAST(t // c AS BIGINT))) - 1 AS s
         FROM toks JOIN freq USING (tok), tot),
       per_doc AS (
         SELECT doc_id, (sum(s) * 1000000) // count(*) AS sppm
         FROM scored GROUP BY doc_id)"""


@register(
    "q184_perplexity_buckets",
    f"""WITH {_Q184_PERDOC_SQL},
       sc AS (
         SELECT d.lang, p.sppm AS s
         FROM per_doc p JOIN documents d USING (doc_id)),
       perv AS (SELECT lang, s, count(*) AS c FROM sc GROUP BY lang, s),
       cumv AS (
         SELECT lang, s,
                sum(c) OVER (PARTITION BY lang ORDER BY s) AS cum,
                sum(c) OVER (PARTITION BY lang) AS tot
         FROM perv),
       thr AS (
         SELECT lang,
                min(s) FILTER (WHERE cum * 3 >= tot) AS t1,
                min(s) FILTER (WHERE cum * 3 >= 2 * tot) AS t2
         FROM cumv GROUP BY lang)
       SELECT sc.lang,
              CASE WHEN s <= t1 THEN 'head'
                   WHEN s <= t2 THEN 'middle'
                   ELSE 'tail' END AS bucket,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(min(s) AS BIGINT) AS min_ppm,
              CAST(max(s) AS BIGINT) AS max_ppm
       FROM sc JOIN thr USING (lang) GROUP BY 1, 2""",
    "CCNet-style per-language head/middle/tail split: every document "
    "scored by unigram surprisal (q174's integer bit-length log2), "
    "then bucketed by its language's surprisal TERTILES - head is the "
    "most-fluent third, tail the most-gibberish third; curation "
    "pipelines keep head+middle and route tail to review.  The tertile "
    "thresholds are exact lower quantiles (smallest v with cum*3 >= "
    "q*total, all-integer) computed by operators/profile.py:"
    "grouped_weighted_quantile - the two-phase bin-then-refine shape "
    "whose windows only ever run over per-bin aggregates, so no "
    "language's doc set funnels through one task even when one "
    "language dominates the corpus (they always do).  The |langs|-row "
    "threshold table broadcasts back onto the per-doc frame; bucketing "
    "is row-local.  Shuffles: vocab agg, freq join, per-doc agg "
    "(q174's three), plus two bounded bin aggs - nothing quadratic",
)
def q184(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profile import grouped_weighted_quantile

    d = load_table(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(T.tokens("text")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").alias("t"))
    per_doc = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            (F.length(F.bin(F.expr("t div c"))) - 1).alias("s"),
        )
        .groupBy("doc_id")
        .agg(F.expr("(sum(s) * 1000000) div count(*)").alias("sppm"))  # ppm-ok: per-document surprisal sum, bounded by doc length (see q174)
    )
    sc = per_doc.join(d.select("doc_id", "lang"), "doc_id").select(
        "lang", F.col("sppm").alias("s"), F.lit(1).alias("w")
    )
    # three consumers (two quantile passes + the bucketing join) would
    # each re-run the token-explode pipeline; materialize the tiny
    # (lang, sppm) frame once — one row per doc, q105's recompute lesson
    sc = sc.localCheckpoint()
    t1 = grouped_weighted_quantile(sc, "lang", "s", "w", q_num=1, q_den=3)
    t2 = grouped_weighted_quantile(sc, "lang", "s", "w", q_num=2, q_den=3)
    thr = (
        t1.select("lang", F.col("quantile_value").alias("t1"))
        .join(
            t2.select("lang", F.col("quantile_value").alias("t2")), "lang"
        )
    )
    bucket = (
        F.when(F.col("s") <= F.col("t1"), F.lit("head"))
        .when(F.col("s") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        sc.join(F.broadcast(thr), "lang")
        .select("lang", bucket.alias("bucket"), "s")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("s").cast("long").alias("min_ppm"),
            F.max("s").cast("long").alias("max_ppm"),
        )
    )


@register(
    "q185_bpe_pair_counts",
    """WITH toks AS (
         SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       wf AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
       ex AS (
         SELECT tok, c, unnest(range(1, len(tok))) AS i
         FROM wf WHERE len(tok) >= 2),
       pairs AS (
         SELECT substr(tok, CAST(i AS INTEGER), 2) AS pair, sum(c) AS n
         FROM ex GROUP BY 1)
       SELECT pair, CAST(n AS BIGINT) AS n
       FROM pairs ORDER BY n DESC, pair LIMIT 50""",
    "BPE-merge pair statistics (the inner-loop aggregate of tokenizer "
    "training): corpus-weighted frequency of every adjacent character "
    "pair, top-50.  The classic scale trick is structural here: pairs "
    "are counted over the DISTINCT-WORD table weighted by word "
    "frequency, not over the raw token stream — the explode factor "
    "applies to |vocab| rows, orders of magnitude below corpus tokens, "
    "and the word-frequency aggregate that feeds it is map-side "
    "combinable.  Pair extraction is substring(tok, i, 2) over an "
    "exploded 1..len-1 sequence (row-local, codegen; no char-array "
    "materialization), and the top-50 is TakeOrderedAndProject with a "
    "total-order tiebreak, never a global sort",
)
def q185(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    toks = d.select(F.explode(T.tokens("text")).alias("tok"))
    wf = toks.groupBy("tok").agg(F.count("*").alias("c"))
    ex = wf.filter(F.length("tok") >= 2).select(
        "tok",
        "c",
        F.explode(
            F.sequence(F.lit(1), F.length("tok") - 1)
        ).alias("i"),
    )
    pairs = (
        ex.select(F.expr("substring(tok, i, 2)").alias("pair"), "c")
        .groupBy("pair")
        .agg(F.sum("c").cast("long").alias("n"))
    )
    return K.top_k(pairs, [F.col("n").desc(), F.col("pair")], 50)


@register(
    "q186_dup_span_table",
    f"""WITH sh AS (
          SELECT doc_id, unnest({T.token_shingles_sql('text', 10)}) AS s
          FROM documents)
       SELECT md5(s) AS span_hash,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
              CAST(count(*) AS BIGINT) AS n_occ,
              CAST(min(doc_id) AS BIGINT) AS example_doc
       FROM sh GROUP BY md5(s)
       HAVING count(DISTINCT doc_id) >= 2""",
    "exact duplicated-span table (the target list for substring-level "
    "dedup a la Lee et al.'s 'Deduplicating Training Data Makes "
    "Language Models Better': every 10-token span occurring in two or "
    "more distinct documents, with occurrence count and an example "
    "doc).  Spans come from the q114 rolling-shingle expression "
    "(zip_with fold — row-local, codegen, NON-distinct so repeats "
    "within a doc count as occurrences), keyed by md5 so the grouping "
    "shuffles fixed-width hashes instead of 10-token strings.  The "
    "group-by is the only shuffle; count(distinct doc_id) expands to "
    "the standard two-phase partial aggregate.  Downstream, this table "
    "joins back to the corpus as the removal/masking work list — the "
    "memorization-risk spans at 100 TB are exactly its heavy hitters",
)
def q186(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    sh = d.select(
        "doc_id",
        F.explode(T.token_shingles("text", 10)).alias("s"),
    )
    return (
        sh.select("doc_id", F.md5("s").alias("span_hash"))
        .groupBy("span_hash")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occ"),
            F.min("doc_id").cast("long").alias("example_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


_Q187_DIM_HASH = hex_hash64_sql("event_type", "dim")


@register(
    "q187_stream_static_enrich",
    f"""WITH ev AS (
          SELECT * FROM events
          WHERE ts >= TIMESTAMP '{WEEK_LO}' AND ts < TIMESTAMP '{WEEK_HI}'),
        dim AS (
          SELECT DISTINCT event_type,
                 CASE CAST({_Q187_DIM_HASH} % 3 AS INTEGER)
                   WHEN 0 THEN 'critical' WHEN 1 THEN 'routine'
                   ELSE 'audit' END AS category,
                 CAST({_Q187_DIM_HASH} % 10 AS INTEGER) AS weight
          FROM ev)
       SELECT category, {day_str_sql('ts')} AS day,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(weight) AS BIGINT) AS sum_weight,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM ev JOIN dim USING (event_type)
       GROUP BY category, day""",
    "stream-static enrichment (streaming/ingest.py:"
    "stream_static_enrich): one week of events arrives as two "
    "microbatch files and foreachBatch broadcast-joins each arrival "
    "against a deterministic event-type dimension (category/weight "
    "from the md5 hash family so the oracle rebuilds the dim "
    "relationally).  Enrichment is row-local — no state, no watermark "
    "— so the sink's union over ANY arrival granularity equals the "
    "batch join, and the oracle IS the batch statement: a true "
    "streaming-equals-batch differential.  The per-(category, day) "
    "rollup here runs over the enriched sink.  At 100 TB the dim "
    "broadcasts (|event types| rows) and each microbatch is a "
    "map-side hash probe — the stream itself never shuffles",
)
def q187(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.ingest import stream_static_enrich

    enriched = stream_static_enrich(spark, sf)
    return enriched.groupBy("category", "day").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("weight").cast("long").alias("sum_weight"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


@register(
    "q188_source_overlap",
    f"""WITH sh AS (
          SELECT DISTINCT source, md5(s) AS h FROM (
            SELECT source, unnest({T.token_shingles_sql('text', 5)}) AS s
            FROM documents)),
       pairs AS (
         SELECT a.source AS source_a, b.source AS source_b
         FROM sh a JOIN sh b USING (h)
         WHERE a.source < b.source)
       SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_shared
       FROM pairs GROUP BY 1, 2""",
    "cross-source contamination matrix (which crawl sources copy from "
    "each other): for every source pair, the number of distinct "
    "5-token shingles they share.  The oracle states it as a shingle "
    "self-join; the Spark plan is the scale-safe factoring — distinct "
    "(source, md5-shingle) pairs, then ONE groupBy collecting each "
    "shingle's source SET (bounded by |sources|, not occurrences), "
    "then row-local combination expansion (transform's (x, i) index "
    "form + slice — at most C(|sources|, 2) structs per shingle) and a "
    "|sources|^2-row count.  No self-join ever touches the data: a "
    "shingle shared by S sources costs S set entries and C(S,2) "
    "emitted pairs, never an S^2 join blow-up against the corpus, and "
    "the md5 keys keep the shuffle fixed-width",
)
def q188(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    sh = (
        d.select("source", F.explode(T.token_shingles("text", 5)).alias("s"))
        .select("source", F.md5("s").alias("h"))
        .distinct()
    )
    srcs = (
        sh.groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
    )
    pairs = srcs.select(
        F.explode(
            F.expr(
                "flatten(transform(srcs, (x, i) -> "
                "transform(slice(srcs, i + 2, size(srcs)), "
                "y -> struct(x AS source_a, y AS source_b))))"
            )
        ).alias("p")
    )
    return (
        pairs.select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


def _q189_state_sql(version: int) -> str:
    """Relational restatement of snapshot version N of the q189 table
    (schema evolution: v1 two columns, v2 adds bal_cents via widened
    append, v3 narrow-batch upsert that null-fills seg)."""
    v1 = (
        "SELECT c_custkey AS k, c_mktsegment AS seg,"
        " CAST(NULL AS BIGINT) AS bal_cents"
        " FROM customer WHERE c_custkey % 3 = 0"
    )
    v2 = (
        f"{v1} UNION ALL "
        "SELECT c_custkey AS k, c_mktsegment AS seg,"
        " CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents"
        " FROM customer WHERE c_custkey % 3 = 1"
    )
    if version == 1:
        return v1
    if version == 2:
        return v2
    return (
        f"SELECT * FROM ({v2}) prev WHERE prev.k % 6 != 0"
        " UNION ALL "
        "SELECT c_custkey AS k, CAST(NULL AS VARCHAR) AS seg,"
        " 999 AS bal_cents"
        " FROM customer WHERE c_custkey % 6 = 0"
    )


@register(
    "q189_schema_evolution",
    "WITH "
    + ", ".join(f"s{v} AS ({_q189_state_sql(v)})" for v in (1, 2, 3))
    + """
       SELECT * FROM ("""
    + " UNION ALL ".join(
        f"""SELECT {v} AS version, CAST({2 if v == 1 else 3} AS INTEGER) AS n_cols,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE seg IS NULL) AS BIGINT) AS n_seg_null,
               CAST(sum(coalesce(bal_cents, 0)) AS BIGINT) AS sum_bal,
               CAST(bit_xor({hex_hash64_sql("CAST(k AS VARCHAR) || '|' || coalesce(seg, '~') || '|' || CAST(coalesce(bal_cents, -1) AS VARCHAR)")}) AS BIGINT) AS xor_hash
           FROM s{v}"""
        for v in (1, 2, 3)
    )
    + ") t",
    "schema evolution differential (snapshots.py additive merge): v1 "
    "commits a 2-column table, v2 appends a WIDENED batch "
    "(merge_schema=True adds bal_cents; old files read it as NULL), "
    "v3 MERGE-upserts a NARROW batch (omits seg, which null-fills for "
    "replaced rows).  The evolved schema lives in the MANIFEST and "
    "reads plan from it with an explicit schema — never a mergeSchema "
    "footer scan over the table's files, which at 100 TB is a "
    "planning-time full-metadata pass (the Delta/Iceberg log-schema "
    "design).  Each version is then time-travel read and "
    "fingerprinted: column COUNT (proves v1 keeps its original "
    "2-column shape), row count, null tallies in both evolved "
    "directions, exact-cents sum, xor of row hashes with canonicalized "
    "nulls.  The oracle restates all three states relationally from "
    "customer",
)
def q189(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..snapshots import SnapshotTable

    c = load_table(spark, sf, "customer")
    k = F.col("c_custkey")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    root = os.path.join(
        tempfile.gettempdir(),
        "hdt_q189_%s_%d"
        % (os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(spark, root)
    t.commit_overwrite(
        c.filter(k % 3 == 0).select(
            k.alias("k"), F.col("c_mktsegment").alias("seg")
        )
    )
    t.commit_append(
        c.filter(k % 3 == 1).select(
            k.alias("k"),
            F.col("c_mktsegment").alias("seg"),
            cents.alias("bal_cents"),
        ),
        merge_schema=True,
    )
    t.commit_upsert(
        c.filter(k % 6 == 0).select(
            k.alias("k"), F.lit(999).cast("long").alias("bal_cents")
        ),
        keys=["k"],
    )

    h = T.hex_hash64(
        F.concat(
            F.col("k").cast("string"),
            F.lit("|"),
            F.coalesce(F.col("seg"), F.lit("~")),
            F.lit("|"),
            F.coalesce(F.col("bal_cents"), F.lit(-1)).cast("string"),
        )
    )

    def fp(v: int) -> DataFrame:
        df = t.read(version=v)
        n_cols = len(df.columns)
        if "bal_cents" not in df.columns:
            df = df.withColumn("bal_cents", F.lit(None).cast("long"))
        return (
            df.select(h.alias("h"), "seg", "bal_cents")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.col("seg").isNull().cast("long"))
                .cast("long")
                .alias("n_seg_null"),
                F.sum(F.coalesce(F.col("bal_cents"), F.lit(0)))
                .cast("long")
                .alias("sum_bal"),
                F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
            )
            .select(
                F.lit(v).alias("version"),
                F.lit(n_cols).alias("n_cols"),
                "n_rows",
                "n_seg_null",
                "sum_bal",
                "xor_hash",
            )
        )

    return fp(1).unionByName(fp(2)).unionByName(fp(3))


def _q190_oracle() -> str:
    from ..functions.vector import int8_quantize_sql, int_dot_sql

    return f"""WITH qv AS (
          SELECT vec_id, label, {int8_quantize_sql('embedding')} AS q
          FROM embeddings),
        anchors AS (
          SELECT vec_id AS aid, label AS albl, q AS aq
          FROM qv WHERE vec_id < 20),
        scored AS (
          SELECT aid, albl, qv.vec_id AS nid, qv.label AS nlbl,
                 {int_dot_sql('aq', 'q')} AS qdot
          FROM anchors, qv WHERE qv.label != albl),
        ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY aid ORDER BY qdot DESC, nid) AS rank
          FROM scored)
       SELECT CAST(aid AS BIGINT) AS anchor_id,
              CAST(albl AS INTEGER) AS anchor_label,
              CAST(nid AS BIGINT) AS neg_id,
              CAST(nlbl AS INTEGER) AS neg_label,
              CAST(qdot AS BIGINT) AS qdot,
              CAST(rank AS INTEGER) AS rank
       FROM ranked WHERE rank <= 3"""


@register(
    "q190_hard_negatives",
    _q190_oracle(),
    "hard-negative mining for contrastive training (the retrieval/"
    "embedding-model data op): for each anchor vector, the 3 most "
    "cosine-similar vectors bearing a DIFFERENT label — the negatives "
    "that actually teach the model.  Similarity is the exact int8-"
    "quantized integer dot product (q82's bit-reproducible scoring); "
    "the anchor set broadcasts (constant rows), so candidate scoring "
    "is one linear pass over the corpus with a row-local label filter; "
    "per-anchor top-3 runs through operators/topk.py:"
    "top_k_per_group_scalable — rank within (anchor, physical "
    "partition) first, then rank the <= 3*partitions survivors — so "
    "no anchor's corpus-sized candidate list ever sorts in one task "
    "(the single-partition window trap q125 documents).  At 100 TB "
    "you'd pre-bucket candidates with the IVF index (q40/q73) and "
    "mine within probed cells; this is the exact-scoring core of that "
    "pipeline",
)
def q190(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vector import int8_quantize, int_dot

    e = load_table(spark, sf, "embeddings").select(
        "vec_id", "label", int8_quantize("embedding").alias("q")
    )
    anchors = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("albl"),
        F.col("q").alias("aq"),
    )
    scored = (
        e.crossJoin(F.broadcast(anchors))
        .filter(F.col("label") != F.col("albl"))
        .select(
            "aid",
            "albl",
            F.col("vec_id").alias("nid"),
            F.col("label").alias("nlbl"),
            int_dot("aq", "q").alias("qdot"),
        )
    )
    top3 = K.top_k_per_group_scalable(
        scored, ["aid"], [F.desc("qdot"), F.asc("nid")], 3
    )
    return top3.select(
        F.col("aid").cast("long").alias("anchor_id"),
        F.col("albl").cast("int").alias("anchor_label"),
        F.col("nid").cast("long").alias("neg_id"),
        F.col("nlbl").cast("int").alias("neg_label"),
        F.col("qdot").cast("long").alias("qdot"),
        F.col("rank").cast("int").alias("rank"),
    )


_Q191_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


@register(
    "q191_theil_sen_trend",
    f"""WITH daily AS (
          SELECT n_name AS nation,
                 date_diff('day', DATE '1995-01-01', o_orderdate) AS x,
                 sum({_Q191_CENTS}) AS y
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1996-01-01'
          GROUP BY 1, 2),
       pairs AS (
         SELECT a.nation,
                CAST(floor((b.y - a.y) * 1000000.0 / (b.x - a.x)) AS BIGINT)
                  AS s
         FROM daily a JOIN daily b
           ON a.nation = b.nation AND a.x < b.x),
       perv AS (SELECT nation, s, count(*) AS c FROM pairs GROUP BY 1, 2),
       cumv AS (
         SELECT nation, s,
                sum(c) OVER (PARTITION BY nation ORDER BY s) AS cum,
                sum(c) OVER (PARTITION BY nation) AS tot
         FROM perv),
       med AS (
         SELECT nation, min(s) FILTER (WHERE cum * 2 >= tot) AS median_slope_ppm,
                max(tot) AS n_pairs
         FROM cumv GROUP BY nation),
       days AS (SELECT nation, count(*) AS n_days FROM daily GROUP BY 1)
       SELECT med.nation, CAST(n_days AS BIGINT) AS n_days,
              CAST(n_pairs AS BIGINT) AS n_pairs,
              CAST(median_slope_ppm AS BIGINT) AS median_slope_ppm
       FROM med JOIN days USING (nation)""",
    "Theil-Sen robust trend per nation (the outlier-proof slope "
    "estimator: median of all pairwise slopes — one wild revenue day "
    "cannot move it, unlike least squares): daily revenue cents over "
    "one year, slope in ppm-cents/day as floor((dy * 1e6) / dx) with "
    "the division in DOUBLE (+ * / floor are the bit-portable IEEE "
    "ops; integer div is NOT portable here — Spark truncates toward "
    "zero while DuckDB floors, and pairwise dy is routinely negative). "
    " The quadratic pair step is bounded STRUCTURALLY: it runs on the "
    "pre-aggregated (nation, day) grain — <= 365 rows per nation at "
    "ANY corpus scale, like q157's basket bound — never on raw "
    "orders; the median then comes from the per-(nation, slope) "
    "aggregate through cumulative windows over bounded bins.  Spark "
    "side uses grouped_weighted_quantile's two-phase shape via the "
    "same relational definition",
)
def q191(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profile import grouped_weighted_quantile

    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    daily = (
        o.filter(
            (F.col("o_orderdate") >= _ts_lit(o, "o_orderdate", "1995-01-01"))
            & (F.col("o_orderdate") < _ts_lit(o, "o_orderdate", "1996-01-01"))
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).alias("x"),
        )
        .agg(F.sum(cents).alias("y"))
    )
    # daily feeds four consumers (both pair sides, the day count, the
    # quantile's two passes); measured: AQE ReusedExchange dedups the
    # aggregate across branches, and a localCheckpoint barrier costs
    # MORE than the recompute it saves (3.8 s vs 5.2 s at sf0.1)
    a = daily.select("nation", F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select("nation", F.col("x").alias("xb"), F.col("y").alias("yb"))
    pairs = (
        a.join(b, "nation")
        .filter(F.col("xa") < F.col("xb"))
        .select(
            "nation",
            # try_divide: codegen can fuse this projection ahead of the
            # xa<xb residual check; a guarded NULL (filtered row) beats
            # an ANSI DIVIDE_BY_ZERO on a row that never survives
            F.floor(
                F.try_divide(
                    (F.col("yb") - F.col("ya")) * F.lit(1000000.0),
                    (F.col("xb") - F.col("xa")).cast("double"),
                )
            )
            .cast("long")
            .alias("s"),
            F.lit(1).alias("w"),
        )
    )
    med = grouped_weighted_quantile(pairs, "nation", "s", "w")
    days = daily.groupBy("nation").agg(F.count("*").alias("n_days"))
    return (
        med.join(days, "nation")
        .select(
            "nation",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("total_weight").cast("long").alias("n_pairs"),
            F.col("quantile_value").cast("long").alias("median_slope_ppm"),
        )
    )


@register(
    "q192_watermark_late_drop",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                AS window_start,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(user_id % 1000003) AS BIGINT) AS user_mod_sum
       FROM events
       WHERE (ts >= TIMESTAMP '2024-01-10 00:00:00'
              AND ts < TIMESTAMP '2024-01-10 06:00:00')
          OR (ts >= TIMESTAMP '2024-01-10 12:00:00'
              AND ts < TIMESTAMP '2024-01-10 14:00:00')
       GROUP BY 1""",
    "watermark late-data semantics differential (streaming/windows.py:"
    "stream_late_data_drop): hourly append-mode counts where the final "
    "microbatch is time-shifted into windows the watermark already "
    "CLOSED, so every one of its rows must be dropped, every closed "
    "on-time window must emit exactly once, and the never-closed "
    "advancer window must be withheld.  (Measured engine rule: a late "
    "row drops iff its window was evicted in a PRIOR batch — a "
    "below-watermark row whose window is still open merges — hence "
    "the three-arrival staging with an eviction batch between on-time "
    "and late.)  The oracle states the on-time hours only — admitted "
    "late rows, missing emissions, or a leaked open window all "
    "hash-mismatch.  This is the state-bound "
    "mechanism at 100 TB: the watermark evicts windows older than the "
    "lateness SLA, keeping streaming state O(SLA window count), not "
    "O(history)",
)
def q192(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.windows import stream_late_data_drop

    return stream_late_data_drop(spark, sf)


@register(
    "q193_audio_energy",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
       wins AS (
         SELECT doc_id, text, unnest(range(0, length(text) // 64)) AS w
         FROM d),
       samp AS (
         SELECT doc_id, CAST(w AS INTEGER) AS win_idx,
                list_transform(range(0, 32), i ->
                  ord(substr(text, CAST(w * 64 + 2 * i + 1 AS INTEGER), 1))
                  + 256 * ord(substr(text, CAST(w * 64 + 2 * i + 2 AS INTEGER), 1))
                ) AS s
         FROM wins)
       SELECT doc_id, win_idx,
              CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT)
                AS energy
       FROM samp""",
    "audio windowed-energy extraction (multimodal.py:"
    "audio_energy_windows): the payload bytes are framed as 16-bit LE "
    "PCM and each full 32-sample window's exact integer energy (sum "
    "of squared samples) is computed in an Arrow-batched mapInPandas "
    "— the voice-activity / silence-trim primitive.  Unlike the "
    "decode/resize stubs this is the REAL computation (PCM framing + "
    "integer arithmetic needs no media library), so the Python "
    "boundary, batch shape, and per-row fan-out (bytes/64 windows per "
    "doc) are all exercised honestly, and the oracle recomputes the "
    "identical energies byte-by-byte from the same payload via "
    "ord()/substr.  ASCII payloads keep every sample < 2^15, so the "
    "unsigned recomputation equals the int16 interpretation exactly",
)
def q193(spark: SparkSession, sf: str) -> DataFrame:
    from ..multimodal import audio_energy_windows, with_payload

    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return audio_energy_windows(with_payload(d))


_Q194_K = 8
_Q194_DF_CAP = 20
_Q194_MIN_PPM = 500000


@register(
    "q194_containment_pairs",
    f"""WITH sh AS (
          SELECT doc_id, md5(s) AS h FROM (
            SELECT doc_id,
                   unnest(list_distinct({T.token_shingles_sql('text', 8)})) AS s
            FROM documents)),
        rare AS (
          SELECT h FROM sh GROUP BY h
          HAVING count(*) <= {_Q194_DF_CAP}),
        shc AS (SELECT sh.doc_id, sh.h FROM sh JOIN rare USING (h)),
        na AS (SELECT doc_id, count(*) AS n_a FROM shc GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
          FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id != b.doc_id
          GROUP BY 1, 2)
       SELECT id_a, id_b,
              CAST(n_shared AS BIGINT) AS n_shared,
              CAST(n_a AS BIGINT) AS n_a,
              CAST((n_shared * 1000000) // n_a AS BIGINT) AS containment_ppm
       FROM shared JOIN na ON shared.id_a = na.doc_id
       WHERE (n_shared * 1000000) // n_a >= {_Q194_MIN_PPM}""",
    "asymmetric containment dedup (the quote/subsumption detector "
    "Jaccard misses: a short doc fully copied into a long one has low "
    "Jaccard but containment ~1): directed pairs where >= 50% of A's "
    "rare 8-token shingles also occur in B.  The scale control is the "
    "document-frequency cap — shingles occurring in more than "
    f"{_Q194_DF_CAP} docs (boilerplate) are dropped BEFORE the "
    "shingle equi-join, so per-shingle fan-out is bounded by cap^2 "
    "and the join never sees a hot key; containment is then exact "
    "integer ppm over A's rare-shingle count.  Plan: distinct "
    "(doc, md5-shingle) -> df aggregate -> capped semi-join -> "
    "self-equi-join on fixed-width hashes -> two bounded aggregates",
)
def q194(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    sh = (
        d.select(
            "doc_id",
            F.explode(
                F.array_distinct(T.token_shingles("text", _Q194_K))
            ).alias("s"),
        )
        .select("doc_id", F.md5("s").alias("h"))
    )
    # windowed df count + filter: ONE pass over the exploded shingle
    # frame and one shuffle on h, where the old groupBy+join-back shape
    # executed the explode subtree twice (and its three consumers below
    # re-executed the join each — 4x total, q315 double-execution
    # class).  The checkpoint serves na and both self-join sides from
    # one cached copy of the already-rare-filtered (smaller) frame.
    wdf = Window.partitionBy("h")
    shc = (
        sh.withColumn("_df", F.count("*").over(wdf))
        .filter(F.col("_df") <= _Q194_DF_CAP)
        .drop("_df")
        .localCheckpoint(eager=False)
    )
    na = shc.groupBy("doc_id").agg(F.count("*").alias("n_a"))
    a = shc.select(F.col("doc_id").alias("id_a"), "h")
    b = shc.select(F.col("doc_id").alias("id_b"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    ppm = F.expr("(n_shared * 1000000) div n_a")  # ppm-ok: n_shared <= tokens of one document pair, bounded by doc length
    return (
        shared.join(na.withColumnRenamed("doc_id", "id_a"), "id_a")
        .filter(ppm >= _Q194_MIN_PPM)
        .select(
            "id_a",
            "id_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            ppm.cast("long").alias("containment_ppm"),
        )
    )


@register(
    "q195_event_trigrams",
    f"""WITH ev AS (
          SELECT user_id, event_type, ts, event_id FROM events
          WHERE ts >= TIMESTAMP '{WEEK_LO}' AND ts < TIMESTAMP '{WEEK_HI}'),
       seq AS (
         SELECT user_id, event_type AS t1,
                lead(event_type, 1) OVER w AS t2,
                lead(event_type, 2) OVER w AS t3
         FROM ev
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       paths AS (
         SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n
         FROM seq WHERE t3 IS NOT NULL GROUP BY 1)
       SELECT path, CAST(n AS BIGINT) AS n
       FROM paths ORDER BY n DESC, path LIMIT 20""",
    "behavioral path mining: the top-20 3-event sequences users "
    "actually walk (q134's Markov transitions extended to trigrams — "
    "the 'what do people do next-next' product question).  One window "
    "per user (two leads, total event-time order with event_id "
    "tiebreak), then a map-combinable path count and "
    "TakeOrderedAndProject.  Partitioning is per-user — the natural "
    "session key; at 100 TB per-user partitions stay small because "
    "activity per user is bounded by the analysis week, not corpus "
    "size — and |event_type|^3 bounds the aggregate output",
)
def q195(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf, lo=WEEK_LO, hi=WEEK_HI).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    paths = (
        seq.select(
            F.concat_ws(">", "t1", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return K.top_k(paths, [F.col("n").desc(), F.col("path")], 20)


def _q196_cdf_sql(v: int) -> str:
    """Change-data feed between q177 state v and v+1, relationally."""
    row_hash = hex_hash64_sql(
        "CAST(k AS VARCHAR) || '|' || st || '|' || CAST(cents AS VARCHAR)"
    )
    return f"""
      SELECT {v} AS from_version,
             CASE WHEN o.k IS NULL THEN 'insert'
                  WHEN n.k IS NULL THEN 'delete'
                  WHEN o.h != n.h THEN 'update'
                  ELSE 'unchanged' END AS change_type,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(bit_xor(coalesce(n.h, o.h)) AS BIGINT) AS xor_hash
      FROM (SELECT k, {row_hash} AS h FROM s{v}) o
      FULL JOIN (SELECT k, {row_hash} AS h FROM s{v + 1}) n
        ON o.k = n.k
      GROUP BY 1, 2"""


@register(
    "q196_change_data_feed",
    "WITH "
    + ", ".join(f"s{v} AS ({_q177_state_sql(v)})" for v in (1, 2, 3))
    + " SELECT * FROM ("
    + " UNION ALL ".join(_q196_cdf_sql(v) for v in (1, 2))
    + ") t",
    "change-data feed between snapshot versions (the Delta CDF / "
    "Iceberg changelog read): for each consecutive version pair of the "
    "q177 lifecycle, classify every key as insert / delete / update / "
    "unchanged via ONE full-outer join of the two time-travel reads on "
    "the key, comparing 60-bit row hashes — emitting per-class counts "
    "and an xor checksum of the post-image (pre-image for deletes).  "
    "v1->v2 must be pure inserts (blind append); v2->v3 must be the "
    "upsert's exact update/insert split with zero deletes.  The oracle "
    "restates both diffs from the relational version states.  At "
    "100 TB a manifest-level diff prunes the join to files that "
    "changed between the versions; the row-level classification here "
    "is what runs inside those files",
)
def q196(spark: SparkSession, sf: str) -> DataFrame:
    t = _q177_build(spark, sf, "q196")

    h = T.hex_hash64(
        F.concat(
            F.col("k").cast("string"), F.lit("|"), F.col("st"),
            F.lit("|"), F.col("cents").cast("string"),
        )
    )

    def cdf(v: int) -> DataFrame:
        old = t.read(version=v).select("k", h.alias("h_old"))
        new = t.read(version=v + 1).select(
            F.col("k").alias("k_new"), h.alias("h_new")
        )
        j = old.join(new, F.col("k") == F.col("k_new"), "full_outer")
        change = (
            F.when(F.col("h_old").isNull(), F.lit("insert"))
            .when(F.col("h_new").isNull(), F.lit("delete"))
            .when(F.col("h_old") != F.col("h_new"), F.lit("update"))
            .otherwise(F.lit("unchanged"))
        )
        return (
            j.select(
                change.alias("change_type"),
                F.coalesce(F.col("h_new"), F.col("h_old")).alias("h"),
            )
            .groupBy("change_type")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
            )
            .select(
                F.lit(v).alias("from_version"),
                "change_type",
                "n_rows",
                "xor_hash",
            )
        )

    return cdf(1).unionByName(cdf(2))


_Q197_BUDGET = 100000


@register(
    "q197_temperature_mixture",
    f"""WITH c AS (
          SELECT lang, sum(len(string_split(text, ' '))) AS toks
          FROM documents GROUP BY 1),
       w AS (
         SELECT lang, toks,
                CAST(floor(sqrt(CAST(toks AS DOUBLE))) AS BIGINT) AS w
         FROM c),
       quota AS (
         SELECT lang, toks, w,
                ({_Q197_BUDGET} * w) // sum(w) OVER () AS base,
                ({_Q197_BUDGET} * w) % sum(w) OVER () AS rem
         FROM w),
       ranked AS (
         SELECT lang, toks, w, base, rem,
                row_number() OVER (ORDER BY rem DESC, lang) AS rr,
                {_Q197_BUDGET} - sum(base) OVER () AS leftover
         FROM quota)
       SELECT lang, CAST(toks AS BIGINT) AS total_tokens,
              CAST(w AS BIGINT) AS w,
              CAST((toks * 1000000) // sum(toks) OVER () AS BIGINT)
                AS natural_ppm,
              CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                   AS BIGINT) AS alloc_tokens
       FROM ranked""",
    "temperature-scaled mixture allocation (the UniMax / T=2 "
    "multilingual data-mixing step: sampling proportional to "
    "size^(1/T) so high-resource languages stop drowning the tail): "
    "per-language token masses are re-weighted by floor(sqrt(tokens)) "
    "— sqrt is one of the bit-portable IEEE ops, so the weights are "
    "engine-exact — and a 100k-token budget is apportioned by the "
    "q172 largest-remainder method, summing EXACTLY to the budget.  "
    "natural_ppm (the untempered share, decimal(38,0) numerator — "
    "100 TB token counts pass the BIGINT*1e6 wrap) sits beside "
    "alloc_tokens so the flattening is visible in the result.  "
    "Plan: one map-combinable per-language count, then windows over "
    "the |langs|-row aggregate — never the corpus",
)
def q197(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    c = d.groupBy("lang").agg(F.sum(T.token_count("text")).alias("toks"))
    w = c.withColumn(
        "w", F.floor(F.sqrt(F.col("toks").cast("double"))).cast("long")
    )
    win = Window.partitionBy()
    quota = w.select(
        "lang",
        "toks",
        "w",
        F.expr(f"({_Q197_BUDGET} * w) div sum(w) OVER ()").alias("base"),
        F.expr(f"({_Q197_BUDGET} * w) % sum(w) OVER ()").alias("rem"),
        F.sum("toks").over(win).alias("_tot"),
    )
    ranked = quota.select(
        "lang",
        "toks",
        "w",
        "base",
        "_tot",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("lang")))
        .alias("rr"),
        (F.lit(_Q197_BUDGET) - F.sum("base").over(win)).alias("leftover"),
    )
    return ranked.select(
        "lang",
        F.col("toks").cast("long").alias("total_tokens"),
        F.col("w").cast("long").alias("w"),
        F.expr("(CAST(toks AS DECIMAL(38,0)) * 1000000) div _tot")  # div-ok: token share, quotient <= 1e6
        .cast("long")
        .alias("natural_ppm"),
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_tokens"),
    )


@register(
    "q198_golden_record",
    f"""WITH m AS (
          SELECT md5(array_to_string(list_slice(
                   string_split({normalize_text_sql('text')}, ' '), 1, 8),
                 ' ')) AS fp,
                 doc_id, source, lang, n_chars
          FROM documents),
       clusters AS (
         SELECT fp,
                count(*) AS n_members,
                min(doc_id) AS keeper_id,
                max(n_chars) AS max_chars,
                count(DISTINCT lang) AS n_langs,
                max_by(source, n_chars * 100000000000 - doc_id)
                  AS best_source
         FROM m GROUP BY fp
         HAVING count(*) >= 2)
       SELECT fp, CAST(n_members AS BIGINT) AS n_members,
              CAST(keeper_id AS BIGINT) AS keeper_id,
              CAST(max_chars AS BIGINT) AS max_chars,
              CAST(n_langs AS BIGINT) AS n_langs,
              best_source
       FROM clusters""",
    "entity-resolution survivorship (the golden-record step after "
    "matching: each duplicate cluster collapses to ONE canonical row "
    "whose fields are selected per-field, not per-row): template "
    "families clustered by the md5 of the normalized 8-token prefix "
    "(the q99 boilerplate key — the synthetic corpus has no whole-text "
    "exact dups, and prefix families are the realistic ER input), "
    "then per cluster — "
    "lowest doc_id as keeper, the LONGEST member's source (max_by on "
    "an integer composite n_chars*1e11 - doc_id: longest wins, ties "
    "break to the lowest id, no row-order dependence), char maximum "
    "and language spread.  One groupBy on the fingerprint hash; "
    "max_by/min are all single-pass commutative aggregates, so the "
    "whole survivorship is map-side combinable — no window, no "
    "self-join, no collect",
)
def q198(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    pfx = F.array_join(
        F.slice(F.split(T.normalize_text("text"), " "), 1, 8), " "
    )
    m = d.select(
        F.md5(pfx).alias("fp"),
        "doc_id",
        "source",
        "lang",
        "n_chars",
    )
    pref = F.col("n_chars") * F.lit(100000000000) - F.col("doc_id")
    return (
        m.groupBy("fp")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.min("doc_id").cast("long").alias("keeper_id"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.max_by("source", pref).alias("best_source"),
        )
        .filter(F.col("n_members") >= 2)
    )


#: (table, column, kind) for the warehouse-wide profile: kind 'i' =
#: integer (string-cast min/max), 's' = string (min/max), 'd'/'t' =
#: double/timestamp (counts only — their min/max string forms are not
#: engine-canonical).  The embeddings list column is excluded.
_Q199_COLS: list[tuple[str, str, str]] = [
    ("region", "r_regionkey", "i"), ("region", "r_name", "s"),
    ("nation", "n_nationkey", "i"), ("nation", "n_name", "s"),
    ("nation", "n_regionkey", "i"),
    ("customer", "c_custkey", "i"), ("customer", "c_name", "s"),
    ("customer", "c_nationkey", "i"), ("customer", "c_acctbal", "d"),
    ("customer", "c_mktsegment", "s"),
    ("supplier", "s_suppkey", "i"), ("supplier", "s_name", "s"),
    ("supplier", "s_nationkey", "i"), ("supplier", "s_acctbal", "d"),
    ("part", "p_partkey", "i"), ("part", "p_name", "s"),
    ("part", "p_brand", "s"), ("part", "p_type", "s"),
    ("part", "p_size", "i"), ("part", "p_retailprice", "d"),
    ("orders", "o_orderkey", "i"), ("orders", "o_custkey", "i"),
    ("orders", "o_orderstatus", "s"), ("orders", "o_totalprice", "d"),
    ("orders", "o_orderdate", "t"), ("orders", "o_orderpriority", "s"),
    ("lineitem", "l_orderkey", "i"), ("lineitem", "l_partkey", "i"),
    ("lineitem", "l_suppkey", "i"), ("lineitem", "l_linenumber", "i"),
    ("lineitem", "l_quantity", "d"), ("lineitem", "l_extendedprice", "d"),
    ("lineitem", "l_discount", "d"), ("lineitem", "l_tax", "d"),
    ("lineitem", "l_returnflag", "s"), ("lineitem", "l_linestatus", "s"),
    ("lineitem", "l_shipdate", "t"),
    ("events", "event_id", "i"), ("events", "ts", "t"),
    ("events", "user_id", "i"), ("events", "event_type", "s"),
    ("events", "value", "d"), ("events", "props", "s"),
    ("documents", "doc_id", "i"), ("documents", "text", "s"),
    ("documents", "lang", "s"), ("documents", "source", "s"),
    ("documents", "n_chars", "i"),
    ("embeddings", "vec_id", "i"), ("embeddings", "label", "i"),
]


def _q199_oracle() -> str:
    parts = []
    for tbl, col, kind in _Q199_COLS:
        if kind in ("i", "s"):
            mn = f"CAST(min({col}) AS VARCHAR)"
            mx = f"CAST(max({col}) AS VARCHAR)"
        else:
            mn = mx = "CAST(NULL AS VARCHAR)"
        parts.append(
            f"SELECT '{tbl}' AS tbl, '{col}' AS col,"
            f" CAST(count(*) AS BIGINT) AS n_rows,"
            f" CAST(count(*) - count({col}) AS BIGINT) AS n_nulls,"
            f" CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,"
            f" {mn} AS min_str, {mx} AS max_str"
            f" FROM {tbl}"
        )
    return " UNION ALL ".join(parts)


@register(
    "q199_warehouse_profile",
    _q199_oracle(),
    "warehouse-wide column statistics (the ANALYZE TABLE job a CBO "
    "feeds on, and the first page of every data catalog): for all 51 "
    "scalar columns across the 10 tables — row count, null count, "
    "EXACT distinct count, and canonical min/max strings for integer "
    "and string columns (double/timestamp min/max rendering is not "
    "engine-canonical and is deliberately NULL).  Each table is "
    "profiled by ONE single-distinct aggregate per column, each over "
    "a scan pruned to THAT column, unioned (51 narrow subtrees).  "
    "DECISION LOG — measured three times, twice reversed: an early "
    "round found the per-table multi-distinct Expand 2.4x WORSE on "
    "the 11-column fact table (25 s vs 10 s at sf0.1) and q199 "
    "shipped as 51 single-distinct union subtrees; a mid-round-6 "
    "re-measurement appeared to show the Expand 1.9-2.0x BETTER "
    "(2.76 s vs 5.34 s) and q199 briefly switched — but the very "
    "next full bench run measured the switched shape at 40 s, and "
    "per-table isolation reproduced it (lineitem's 11-column "
    "multi-distinct = 22.6 s ALONE; union shape 8.3 s total in the "
    "same session): in expand-based multi-distinct planning every "
    "(gid, value) group row carries the aggregate's FULL buffer "
    "(~50 slots here), so high-cardinality distinct columns blow "
    "the partial-aggregate hash table wide, while the union's "
    "subtrees keep one distinct column and a 5-slot buffer each.  "
    "The mid-round 2.76 s was never reproduced; treat it as a "
    "measurement artifact.  The union shape is also scale-sound: "
    "each subtree scans ONE pruned column, so total bytes read "
    "across all 51 subtrees ~= one full-width table scan.  At "
    "100 TB distinct counts would downgrade to HLL sketches (q81) "
    "per column when exactness stops paying for itself",
)
def q199(spark: SparkSession, sf: str) -> DataFrame:
    outs = []
    for tbl, col, kind in _Q199_COLS:
        df = load_table(spark, sf, tbl).select(col)
        mn = (
            F.min(col).cast("string")
            if kind in ("i", "s")
            else F.min(F.lit(None).cast("string"))
        )
        mx = (
            F.max(col).cast("string")
            if kind in ("i", "s")
            else F.max(F.lit(None).cast("string"))
        )
        outs.append(
            df.agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.col(col).isNull().cast("long"))
                .cast("long")
                .alias("n_nulls"),
                F.countDistinct(col).cast("long").alias("n_distinct"),
                mn.alias("min_str"),
                mx.alias("max_str"),
            ).select(
                F.lit(tbl).alias("tbl"),
                F.lit(col).alias("col"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_str",
                "max_str",
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


@register(
    "q200_corpus_export",
    f"""WITH scored AS (
          SELECT doc_id, lang, text,
                 len(string_split(text, ' ')) AS n_tok,
                 len(list_distinct(string_split(text, ' '))) AS n_uniq,
                 {fingerprint_sql('text')} AS fp,
                 {hex_hash64_sql("CAST(doc_id AS VARCHAR)", "shard")} AS shk
          FROM documents WHERE doc_id % 10 != 0),
       quality AS (
         SELECT * FROM scored
         WHERE n_tok >= 20 AND n_uniq * 1000 >= 300 * n_tok),
       keeper AS (
         SELECT * FROM (
           SELECT *, min(doc_id) OVER (PARTITION BY fp) AS k0
           FROM quality) q
         WHERE doc_id = k0),
       eval_sh AS (
         SELECT DISTINCT unnest(list_distinct(
                  {T.token_shingles_sql('text', 5)})) AS sh
         FROM documents WHERE doc_id % 10 = 0),
       train_sh AS (
         SELECT doc_id, unnest(list_distinct(
                  {T.token_shingles_sql('text', 5)})) AS sh
         FROM keeper),
       contaminated AS (
         SELECT DISTINCT t.doc_id FROM train_sh t JOIN eval_sh e USING (sh)),
       clean AS (
         SELECT k.* FROM keeper k
         WHERE k.doc_id NOT IN (SELECT doc_id FROM contaminated)),
       ordered AS (
         SELECT *, row_number() OVER (ORDER BY shk, doc_id) AS rn
         FROM clean)
       SELECT CAST((rn - 1) // 500 AS BIGINT) AS shard,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tok) AS BIGINT) AS total_tokens,
              CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
              CAST(sum(shk % 1000000007) AS BIGINT) AS checksum_mod
       FROM ordered GROUP BY 1""",
    "corpus-export capstone: the full curation pipeline as ONE "
    "differential — quality gate (>= 20 tokens, >= 30% lexical "
    "diversity, exact integer ratio), exact dedup (min-id keeper per "
    "normalized fingerprint), eval-set decontamination (drop any "
    "train doc sharing a 5-token shingle with the held-out doc_id%10 "
    "slice — q117's semi-join flipped to an anti-join), then the q183 "
    "reproducible hash-ordered 500-doc shard manifest over the "
    "surviving corpus.  Every stage is individually proven elsewhere "
    "(q31/q33/q117/q183); this pins their COMPOSITION, which is what "
    "actually ships.  Plan: row-local scoring, one fingerprint "
    "aggregate + keeper join, one broadcast shingle anti-join, the "
    "range-partitioned global rank, one manifest aggregate — every "
    "shuffle on bounded keys, nothing quadratic",
)
def q200(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    train = d.filter(F.col("doc_id") % 10 != 0)
    scored = train.select(
        "doc_id",
        "lang",
        "text",
        T.token_count("text").alias("n_tok"),
        T.unique_token_count("text").alias("n_uniq"),
        fingerprint("text").alias("fp"),
        T.hex_hash64(F.col("doc_id").cast("string"), salt="shard").alias(
            "shk"
        ),
    )
    quality = scored.filter(
        (F.col("n_tok") >= 20)
        & (F.col("n_uniq") * 1000 >= 300 * F.col("n_tok"))
    )
    keeper_ids = quality.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    keeper = quality.join(keeper_ids, ["fp", "doc_id"])
    eval_sh = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select(
            F.explode(
                F.array_distinct(T.token_shingles("text", 5))
            ).alias("sh")
        )
        .distinct()
    )
    train_sh = keeper.select(
        "doc_id",
        F.explode(F.array_distinct(T.token_shingles("text", 5))).alias("sh"),
    )
    contaminated = (
        train_sh.join(F.broadcast(eval_sh), "sh").select("doc_id").distinct()
    )
    clean = keeper.join(contaminated, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_tok", "shk"
    )
    ordered = K.global_row_number(clean, [F.col("shk"), F.col("doc_id")])
    return (
        ordered.withColumn("shard", F.expr("(rn - 1) div 500"))
        .groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum(F.col("shk") % 1000000007)
            .cast("long")
            .alias("checksum_mod"),
        )
    )


@register(
    "q201_join_fanout_preflight",
    f"""WITH ev AS (
          SELECT user_id FROM events
          WHERE ts >= TIMESTAMP '{WEEK_LO}' AND ts < TIMESTAMP '{WEEK_HI}'),
       per_key AS (SELECT user_id, count(*) AS c FROM ev GROUP BY 1),
       tot AS (
         SELECT sum(c) AS n_rows, count(*) AS n_keys,
                sum(c * c) AS est_pairs
         FROM per_key)
       SELECT user_id, CAST(c AS BIGINT) AS c,
              CAST(c * c AS BIGINT) AS pairs,
              CAST((c * c * 1000000) // est_pairs AS BIGINT)
                AS contribution_ppm,
              CAST(n_rows AS BIGINT) AS n_rows,
              CAST(n_keys AS BIGINT) AS n_keys,
              CAST(est_pairs AS BIGINT) AS est_pairs
       FROM per_key, tot
       ORDER BY c DESC, user_id LIMIT 5""",
    "join-explosion preflight (the cardinality check every pipeline "
    "should run BEFORE a self-join ships): for a week of events keyed "
    "by user, the exact self-join output size sum(c^2), key count, "
    "and the five hottest keys with their contribution in ppm — the "
    "direct input to the q49/q50 salting decision (if the top key "
    "owns >10% of the pair volume, salt it).  One map-combinable "
    "per-key count, a 1-row total broadcast back onto the "
    "|keys|-row aggregate, TakeOrderedAndProject for the top-5 — the "
    "raw events are scanned once and never joined",
)
def q201(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf, lo=WEEK_LO, hi=WEEK_HI).select(
        "user_id"
    )
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("c"))
    # c^2 (and sum of c^2) outgrow int64 on hot keys long before 100 TB
    # (c=3e9 rows on one key wraps c*c); DECIMAL(38,0) end to end
    tot = per_key.agg(
        F.sum("c").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("est_pairs"),
    )
    out = per_key.crossJoin(F.broadcast(tot)).select(
        "user_id",
        F.col("c").cast("long").alias("c"),
        F.expr("CAST(c AS DECIMAL(38,0)) * c").cast("long").alias("pairs"),
        F.expr("(CAST(c AS DECIMAL(38,0)) * c * 1000000) div est_pairs")  # div-ok: c^2 <= est_pairs = sum(c^2), quotient <= 1e6
        .cast("long")
        .alias("contribution_ppm"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("est_pairs").cast("long").alias("est_pairs"),
    )
    return K.top_k(out, [F.desc("c"), F.asc("user_id")], 5)


_Q202_SUBJECTS = "(1, 2, 3)"


@register(
    "q202_dsar_export",
    f"""WITH subj AS (
          SELECT c_custkey AS subject FROM customer
          WHERE c_custkey IN {_Q202_SUBJECTS}),
       cust AS (
         SELECT c_custkey AS subject, 'customer' AS tbl,
                {hex_hash64_sql("CAST(c_custkey AS VARCHAR) || '|' || c_name")} AS h
         FROM customer WHERE c_custkey IN {_Q202_SUBJECTS}),
       ords AS (
         SELECT o_custkey AS subject, 'orders' AS tbl,
                {hex_hash64_sql("CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)")} AS h
         FROM orders WHERE o_custkey IN {_Q202_SUBJECTS}),
       items AS (
         SELECT o.o_custkey AS subject, 'lineitem' AS tbl,
                {hex_hash64_sql("CAST(l.l_orderkey AS VARCHAR) || '|' || CAST(l.l_linenumber AS VARCHAR)")} AS h
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE o.o_custkey IN {_Q202_SUBJECTS}),
       ev AS (
         SELECT user_id AS subject, 'events' AS tbl,
                {hex_hash64_sql("CAST(event_id AS VARCHAR)")} AS h
         FROM events WHERE user_id IN {_Q202_SUBJECTS}),
       unioned AS (
         SELECT * FROM cust UNION ALL SELECT * FROM ords
         UNION ALL SELECT * FROM items UNION ALL SELECT * FROM ev)
       SELECT subject, tbl, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(bit_xor(h) AS BIGINT) AS xor_hash
       FROM unioned GROUP BY 1, 2""",
    "data-subject access export (the GDPR/CCPA DSAR op, sibling of "
    "catalog.py's delete_keys right-to-be-forgotten): every row "
    "about each subject across the warehouse — direct rows "
    "(customer), FK rows (orders, events) and transitive rows "
    "(lineitem through the subject's orders) — fingerprinted per "
    "(subject, table) with counts and xor row-hashes so the export "
    "is verifiable without moving row payloads.  Plan: each table "
    "contributes one scan filtered by the (broadcastable, tiny) "
    "subject set — the lineitem leg is a semi-join through orders — "
    "then one union and one bounded aggregate.  At 100 TB the "
    "subject-key pushdown is what matters: every scan carries an IN "
    "filter at the parquet reader",
)
def q202(spark: SparkSession, sf: str) -> DataFrame:
    subjects = [1, 2, 3]
    c = load_table(spark, sf, "customer").filter(
        F.col("c_custkey").isin(subjects)
    )
    o = load_table(spark, sf, "orders").filter(
        F.col("o_custkey").isin(subjects)
    )
    li = load_table(spark, sf, "lineitem")
    ev = load_table(spark, sf, "events").filter(
        F.col("user_id").isin(subjects)
    )

    def leg(df, subject_col, tbl, parts):
        h = T.hex_hash64(
            F.concat_ws("|", *[F.col(p).cast("string") for p in parts])
        )
        return df.select(
            F.col(subject_col).cast("long").alias("subject"),
            F.lit(tbl).alias("tbl"),
            h.alias("h"),
        )

    items = li.join(
        F.broadcast(o.select("o_orderkey", "o_custkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    unioned = (
        leg(c, "c_custkey", "customer", ["c_custkey", "c_name"])
        .unionByName(leg(o, "o_custkey", "orders", ["o_orderkey", "o_custkey"]))
        .unionByName(
            leg(items, "o_custkey", "lineitem", ["l_orderkey", "l_linenumber"])
        )
        .unionByName(leg(ev, "user_id", "events", ["event_id"]))
    )
    return unioned.groupBy("subject", "tbl").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
    )


_Q203_HASH = hex_hash64_sql("CAST(user_id AS VARCHAR)", "hll")


@register(
    "q203_hll_rolling_merge",
    f"""WITH ev AS (
          SELECT date_diff('day', DATE '2024-01-01', ts) AS d, user_id
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
            AND ts < TIMESTAMP '2024-02-01 00:00:00'),
       hashed AS (
         SELECT d, user_id,
                CAST({_Q203_HASH} % 64 AS INTEGER) AS idx,
                {_Q203_HASH} // 64 AS v
         FROM ev),
       rho AS (
         SELECT d, idx,
                55 - (CASE WHEN v = 0 THEN 0
                      ELSE length(printf('%b', v)) END) AS r
         FROM hashed),
       daily AS (SELECT d, idx, max(r) AS m FROM rho GROUP BY 1, 2),
       days AS (SELECT DISTINCT d FROM ev),
       served AS (
         SELECT unnest(range(d, d + 7)) AS sd, idx, m FROM daily),
       merged AS (
         SELECT sd, idx, max(m) AS m FROM served
         JOIN days ON served.sd = days.d GROUP BY 1, 2),
       sketch AS (
         SELECT sd, count(*) AS n_registers, sum(m) AS sum_m,
                max(m) AS max_m,
                sum(m * (idx + 1)) % 1000000007 AS checksum_mod
         FROM merged GROUP BY sd),
       exact_served AS (
         SELECT DISTINCT unnest(range(d, d + 7)) AS sd, user_id FROM ev),
       exact AS (
         SELECT sd, count(DISTINCT user_id) AS exact_distinct
         FROM exact_served JOIN days ON exact_served.sd = days.d
         GROUP BY sd)
       SELECT CAST(sketch.sd AS BIGINT) AS day_idx,
              CAST(exact_distinct AS BIGINT) AS exact_distinct,
              CAST(n_registers AS BIGINT) AS n_registers,
              CAST(sum_m AS BIGINT) AS sum_m,
              CAST(max_m AS BIGINT) AS max_m,
              CAST(checksum_mod AS BIGINT) AS checksum_mod
       FROM sketch JOIN exact ON sketch.sd = exact.sd""",
    "mergeable-sketch rolling distinct (HLL's defining property, "
    "register-exact): daily 64-register HLL tables built from the md5 "
    "hash family (register = h%64, rank = leading-zero count via the "
    "integer bit-length trick — every register value is EXACT and "
    "engine-reproducible, unlike the estimate), then 7-day rolling "
    "DISTINCT = register-wise max of the daily sketches — computed as "
    "a bounded 7x serve-day replication of the tiny daily register "
    "rows, never of the events.  The exact 7-day rolling distinct "
    "(q121's bounded explode of the distinct day-user set) rides "
    "along for calibration.  This is THE 100 TB pattern: daily "
    "sketches are 64 ints regardless of volume; any window, backfill, "
    "or cross-partition union is a max-merge of fixed-size state "
    "instead of a re-scan",
)
def q203(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(
        spark, sf, lo="2024-01-01", hi="2024-02-01"
    ).select(
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")).alias("d"),
        "user_id",
    )
    h = T.hex_hash64(F.col("user_id").cast("string"), salt="hll")
    hashed = ev.select(
        "d",
        "user_id",
        (h % 64).cast("int").alias("idx"),
        F.floor(h / 64).cast("long").alias("v"),
    )
    rho = hashed.select(
        "d",
        "idx",
        (
            F.lit(55)
            - F.when(F.col("v") == 0, 0).otherwise(
                F.length(F.bin(F.col("v")))
            )
        ).alias("r"),
    )
    daily = rho.groupBy("d", "idx").agg(F.max("r").alias("m"))
    days = ev.select("d").distinct()
    served = daily.select(
        F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("sd"),
        "idx",
        "m",
    )
    merged = (
        served.join(F.broadcast(days.withColumnRenamed("d", "sd")), "sd")
        .groupBy("sd", "idx")
        .agg(F.max("m").alias("m"))
    )
    sketch = merged.groupBy("sd").agg(
        F.count("*").alias("n_registers"),
        F.sum("m").alias("sum_m"),
        F.max("m").alias("max_m"),
        (F.sum(F.col("m") * (F.col("idx") + 1)) % 1000000007).alias(
            "checksum_mod"
        ),
    )
    exact_served = (
        ev.select(
            F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("sd"),
            "user_id",
        )
        .distinct()
    )
    exact = (
        exact_served.join(
            F.broadcast(days.withColumnRenamed("d", "sd")), "sd"
        )
        .groupBy("sd")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return sketch.join(exact, "sd").select(
        F.col("sd").cast("long").alias("day_idx"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.col("n_registers").cast("long").alias("n_registers"),
        F.col("sum_m").cast("long").alias("sum_m"),
        F.col("max_m").cast("long").alias("max_m"),
        F.col("checksum_mod").cast("long").alias("checksum_mod"),
    )


@register(
    "q204_exactly_once_sink",
    f"""SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(bit_xor({hex_hash64_sql("CAST(event_id AS VARCHAR)")})
                   AS BIGINT) AS xor_hash
       FROM events
       WHERE ts >= TIMESTAMP '{WEEK_LO}' AND ts < TIMESTAMP '{WEEK_HI}'
       GROUP BY 1""",
    "exactly-once sink differential (streaming/ingest.py:"
    "stream_exactly_once_sink): a week of events streams through "
    "foreachBatch into a sink partitioned by batch_id with dynamic "
    "partition overwrite, and then batch 0 is REPLAYED through the "
    "same writer — the at-least-once redelivery every real source "
    "eventually produces.  Idempotence means the replay replaces its "
    "own partition instead of appending, so the sink still equals the "
    "one-shot batch result, which is exactly what the oracle states "
    "(per-type counts + xor of event-id hashes: one duplicated row "
    "flips the hash).  This is the production foreachBatch "
    "exactly-once recipe — (epochId -> partition) + overwrite — "
    "proven by differential rather than asserted",
)
def q204(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.ingest import stream_exactly_once_sink

    sink = stream_exactly_once_sink(spark, sf)
    h = T.hex_hash64(F.col("event_id").cast("string"))
    return (
        sink.select("event_type", h.alias("h"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
        )
    )


_Q205_H = hex_hash64_sql("CAST(c_custkey AS VARCHAR)", "scd")


def _q205_dim_sql() -> str:
    """Synthesized SCD2 customer-segment dimension, relationally.

    Every customer starts in its base segment at 1993-01-01; customers
    with h%2=0 change segment at 1995-07-01; of those, h%3=0 change
    again at 1997-01-01.  Version labels derive from (custkey, version)
    via the md5 family, so both engines rebuild identical history.
    """
    seg = (
        "'seg' || substr(md5('v' || CAST(v AS VARCHAR) || '|' "
        "|| CAST(c_custkey AS VARCHAR)), 1, 1)"
    )
    return f"""
      SELECT c_custkey AS k, {seg} AS seg,
             CASE v WHEN 0 THEN TIMESTAMP '1993-01-01'
                    WHEN 1 THEN TIMESTAMP '1995-07-01'
                    ELSE TIMESTAMP '1997-01-01' END AS valid_from,
             CASE WHEN v = 0 AND {_Q205_H} % 2 = 0
                    THEN TIMESTAMP '1995-07-01'
                  WHEN v = 1 AND {_Q205_H} % 3 = 0
                    THEN TIMESTAMP '1997-01-01'
                  ELSE TIMESTAMP '9999-12-31' END AS valid_to
      FROM customer
      CROSS JOIN (SELECT unnest(range(0, 3)) AS v) vs
      WHERE v = 0
         OR (v = 1 AND {_Q205_H} % 2 = 0)
         OR (v = 2 AND {_Q205_H} % 2 = 0 AND {_Q205_H} % 3 = 0)"""


@register(
    "q205_pit_scd2_join",
    f"""WITH dim AS ({_q205_dim_sql()}),
       j AS (
         SELECT d.seg,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS cents
         FROM orders o JOIN dim d
           ON o.o_custkey = d.k
          AND d.valid_from <= o.o_orderdate
          AND o.o_orderdate < d.valid_to)
       SELECT seg, CAST(count(*) AS BIGINT) AS n_orders,
              CAST(sum(cents) AS BIGINT) AS sum_cents
       FROM j GROUP BY seg""",
    "point-in-time SCD2 join (the feature-store / leakage-safety "
    "kernel: every fact row joins the dimension VERSION that was "
    "valid at the fact's own timestamp, never today's): a synthesized "
    "customer-segment SCD2 history (0-2 deterministic changes per "
    "customer, md5-derived labels so the oracle rebuilds it) joined "
    "to orders on key + [valid_from, valid_to) containment.  The "
    "join is an equi-join on the customer key with a row-local "
    "interval residual — per-key version counts are bounded (<= 3 "
    "here, tens in practice), so fan-out is bounded and there is no "
    "range-bucketing to tune; at 100 TB the dim is still the small "
    "side and broadcasts.  Every order lands in EXACTLY one version "
    "by construction (intervals partition the timeline), which the "
    "per-segment counts pin",
)
def q205(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    h = T.hex_hash64(F.col("c_custkey").cast("string"), salt="scd")
    ts = lambda x: F.lit(x).cast("timestamp")  # noqa: E731
    base = c.select(F.col("c_custkey").alias("k"), h.alias("h"))
    # one-scan version fanout: the union-of-filtered-selects built the
    # same customer subtree once per version (r7 re-execution audit:
    # customer scanned 3x with no reuse — the per-branch hash filters
    # broke canonical equality).  An explode over a per-row version
    # array emits exactly the rows the three branches did, map-side.
    s0 = F.struct(
        F.lit(0).alias("v"),
        ts("1993-01-01").alias("valid_from"),
        F.when(F.col("h") % 2 == 0, ts("1995-07-01"))
        .otherwise(ts("9999-12-31"))
        .alias("valid_to"),
    )
    s1 = F.struct(
        F.lit(1).alias("v"),
        ts("1995-07-01").alias("valid_from"),
        F.when(F.col("h") % 3 == 0, ts("1997-01-01"))
        .otherwise(ts("9999-12-31"))
        .alias("valid_to"),
    )
    s2 = F.struct(
        F.lit(2).alias("v"),
        ts("1997-01-01").alias("valid_from"),
        ts("9999-12-31").alias("valid_to"),
    )
    vers = (
        F.when((F.col("h") % 2 == 0) & (F.col("h") % 3 == 0), F.array(s0, s1, s2))
        .when(F.col("h") % 2 == 0, F.array(s0, s1))
        .otherwise(F.array(s0))
    )
    dim = (
        base.select("k", F.explode(vers).alias("_ver"))
        .select("k", "_ver.v", "_ver.valid_from", "_ver.valid_to")
        .select(
            "k",
            F.concat(
                F.lit("seg"),
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("v"),
                            F.col("v").cast("string"),
                            F.lit("|"),
                            F.col("k").cast("string"),
                        )
                    ),
                    1,
                    1,
                ),
            ).alias("seg"),
            "valid_from",
            "valid_to",
        )
    )
    o = load_table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    od = F.col("o_orderdate")
    j = o.join(
        F.broadcast(dim),
        (F.col("o_custkey") == F.col("k"))
        & (F.col("valid_from") <= od)
        & (od < F.col("valid_to")),
    )
    return j.groupBy("seg").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(cents).cast("long").alias("sum_cents"),
    )


@register(
    "q206_novelty_rate",
    f"""WITH fp AS (
          SELECT doc_id, {fingerprint_sql('text')} AS fp,
                 doc_id % 8 AS week
          FROM documents),
       first_seen AS (
         SELECT fp, min(week) AS w0 FROM fp GROUP BY fp),
       stats AS (
         SELECT f.week,
                count(*) AS n_docs,
                count(DISTINCT f.fp) AS n_distinct_fp,
                count(DISTINCT CASE WHEN f.week = s.w0 THEN f.fp END)
                  AS n_novel_fp
         FROM fp f JOIN first_seen s USING (fp)
         GROUP BY f.week)
       SELECT CAST(week AS BIGINT) AS week,
              CAST(n_docs AS BIGINT) AS n_docs,
              CAST(n_distinct_fp AS BIGINT) AS n_distinct_fp,
              CAST(n_novel_fp AS BIGINT) AS n_novel_fp,
              CAST((n_novel_fp * 1000000) // n_distinct_fp AS BIGINT)
                AS novelty_ppm
       FROM stats""",
    "crawl novelty rate (the diminishing-returns curve every "
    "continued crawl is judged by: how much of each ingest wave is "
    "content we have never seen?): docs bucketed into 8 synthetic "
    "ingest weeks, per week the distinct fingerprints present and the "
    "fraction whose FIRST appearance is that week, in exact ppm.  "
    "One fingerprint aggregate for first-seen week, one join back, "
    "one per-week aggregate — the min-week table is |distinct "
    "content| rows and the shuffles are all on the fingerprint hash.  "
    "When novelty_ppm decays toward zero the crawl has saturated its "
    "frontier and the budget should move",
)
def q206(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    fp = d.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        (F.col("doc_id") % 8).alias("week"),
    )
    first_seen = fp.groupBy("fp").agg(F.min("week").alias("w0"))
    joined = fp.join(first_seen, "fp")
    return (
        joined.groupBy("week")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("fp").cast("long").alias("n_distinct_fp"),
            F.countDistinct(
                F.when(F.col("week") == F.col("w0"), F.col("fp"))
            )
            .cast("long")
            .alias("n_novel_fp"),
        )
        .select(
            F.col("week").cast("long").alias("week"),
            "n_docs",
            "n_distinct_fp",
            "n_novel_fp",
            F.expr(
                "(CAST(n_novel_fp AS DECIMAL(38,0)) * 1000000)"
                " div n_distinct_fp"  # div-ok: novel <= distinct, quotient <= 1e6
            )
            .cast("long")
            .alias("novelty_ppm"),
        )
    )


@register(
    "q207_group_kfold",
    f"""WITH ev AS (
          SELECT event_id, user_id,
                 CAST({hex_hash64_sql("CAST(user_id AS VARCHAR)", "fold")} % 5
                      AS INTEGER) AS fold
          FROM events
          WHERE ts >= TIMESTAMP '{WEEK_LO}' AND ts < TIMESTAMP '{WEEK_HI}')
       SELECT fold, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_groups,
              CAST(bit_xor({hex_hash64_sql("CAST(event_id AS VARCHAR)")})
                   AS BIGINT) AS xor_hash
       FROM ev GROUP BY fold""",
    "group-aware k-fold assignment (GroupKFold: all of a user's rows "
    "land in ONE fold, so evaluation never sees a training user — the "
    "leakage rule hash assignment gives for free, since fold is a "
    "pure function of user_id): per-fold row counts, group counts, "
    "and content hashes for a week of events under a 5-fold salted "
    "md5 split.  Row-local assignment, one aggregate; the no-leakage "
    "property is structural (same user => same hash => same fold), "
    "not something that needs a second pass to verify.  Contrast "
    "q63's row-hash split, which balances ROWS but splits users",
)
def q207(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf, lo=WEEK_LO, hi=WEEK_HI).select(
        "event_id", "user_id"
    )
    fold = (
        T.hex_hash64(F.col("user_id").cast("string"), salt="fold") % 5
    ).cast("int")
    h = T.hex_hash64(F.col("event_id").cast("string"))
    return (
        ev.select(fold.alias("fold"), "user_id", h.alias("h"))
        .groupBy("fold")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("user_id").cast("long").alias("n_groups"),
            F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
        )
    )


_Q208_LEVELS = (100, 250, 500, 1000)  # permille thresholds of 1000


@register(
    "q208_ablation_manifest",
    f"""WITH scored AS (
          SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
                 {hex_hash64_sql("CAST(doc_id AS VARCHAR)", "abl")} % 1000
                   AS bucket
          FROM documents),
       levels AS (SELECT unnest(ARRAY{list(_Q208_LEVELS)}) AS permille)
       SELECT CAST(permille AS INTEGER) AS permille,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tok) AS BIGINT) AS total_tokens,
              CAST(sum(bucket * doc_id % 1000000007) AS BIGINT)
                AS checksum_mod
       FROM scored JOIN levels ON bucket < permille
       GROUP BY permille""",
    "scaling-law ablation manifest (the nested data subsets behind "
    "every 'performance vs data size' curve): 10% / 25% / 50% / 100% "
    "subsets selected by a salted hash bucket THRESHOLD, which makes "
    "them nested by construction — bucket < 100 implies bucket < 250 "
    "— so each larger run strictly extends the smaller one's data "
    "(the property that makes ablation curves comparable; independent "
    "random samples would not be).  Per level: doc count, token mass, "
    "content checksum.  The level join is a 4-row broadcast against "
    "the row-local bucket; everything aggregates map-side",
)
def q208(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    scored = d.select(
        "doc_id",
        T.token_count("text").alias("n_tok"),
        (
            T.hex_hash64(F.col("doc_id").cast("string"), salt="abl") % 1000
        ).alias("bucket"),
    )
    levels = spark.createDataFrame(
        [(p,) for p in _Q208_LEVELS], "permille int"
    )
    return (
        scored.join(
            F.broadcast(levels), F.col("bucket") < F.col("permille")
        )
        .groupBy(F.col("permille").cast("int").alias("permille"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.sum(F.col("bucket") * F.col("doc_id") % 1000000007)
            .cast("long")
            .alias("checksum_mod"),
        )
    )


def _q209_oracle() -> str:
    from ..functions.vector import int8_quantize_sql, int_dot_sql

    return f"""WITH qv AS (
          SELECT vec_id, {int8_quantize_sql('embedding')} AS q
          FROM embeddings),
        anchors AS (SELECT vec_id AS aid, q AS aq FROM qv
                    WHERE vec_id < 50),
        exact AS (
          SELECT aid, nid FROM (
            SELECT a.aid, c.vec_id AS nid,
                   row_number() OVER (
                     PARTITION BY a.aid
                     ORDER BY {int_dot_sql('a.aq', 'c.q')} DESC, c.vec_id
                   ) AS rk
            FROM anchors a, qv c WHERE c.vec_id != a.aid) t
          WHERE rk <= 3),
        pairs AS ({_q100_oracle()}),
        sym AS (SELECT id_a AS src, id_b AS dst, qdot FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst, qdot FROM pairs),
        lsh AS (
          SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY qdot DESC, dst) AS rk
            FROM sym WHERE src < 50) t
          WHERE rk <= 3),
        ex_n AS (SELECT aid, count(*) AS n_exact FROM exact GROUP BY aid),
        lsh_n AS (SELECT src, count(*) AS n_lsh FROM lsh GROUP BY src),
        hits AS (
          SELECT aid, count(*) AS n_hit
          FROM exact JOIN lsh ON exact.aid = lsh.src
                             AND exact.nid = lsh.dst
          GROUP BY aid)
       SELECT a.aid AS vec_id,
              CAST(coalesce(e.n_exact, 0) AS BIGINT) AS n_exact,
              CAST(coalesce(l.n_lsh, 0) AS BIGINT) AS n_lsh,
              CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
              CAST(coalesce(h.n_hit, 0) * 1000000
                   // coalesce(e.n_exact, 1) AS BIGINT) AS recall_ppm
       FROM anchors a
       LEFT JOIN ex_n e ON a.aid = e.aid
       LEFT JOIN lsh_n l ON a.aid = l.src
       LEFT JOIN hits h ON a.aid = h.aid"""


@register(
    "q209_ann_recall_eval",
    _q209_oracle(),
    "ANN recall@k evaluation (the acceptance test of every "
    "approximate index deployment: what fraction of the TRUE top-k "
    "does the index return?): for 50 anchor vectors, exact brute-force "
    "top-3 by integer dot (broadcast anchors, linear candidate scan, "
    "two-phase per-group top-k) vs the q105 LSH-prefiltered top-3, "
    "joined on (anchor, neighbor) to count hits — per-anchor recall "
    "in exact ppm, with the LSH candidate count beside it (an anchor "
    "with no signature collisions returns fewer than 3).  At 100 TB "
    "the exact arm runs on a sampled anchor set exactly like this — "
    "recall is estimated, never computed corpus-wide — and the knob "
    "traded against it is q100's n_planes",
)
def q209(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vector import int8_quantize, int_dot
    from ..operators.similarity import embedding_lsh_pairs

    e = load_table(spark, sf, "embeddings")
    qv = e.select("vec_id", int8_quantize("embedding").alias("q"))
    anchors = qv.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("aid"), F.col("q").alias("aq")
    )
    cand = (
        qv.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("aid"))
        .select(
            "aid",
            F.col("vec_id").alias("nid"),
            int_dot("aq", "q").alias("dot"),
        )
    )
    exact = K.top_k_per_group_scalable(
        cand, ["aid"], [F.desc("dot"), F.asc("nid")], 3
    ).select("aid", "nid")

    pairs = embedding_lsh_pairs(e, n_planes=8)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"),
                    F.col("id_b").alias("dst"),
                    F.col("qdot"),
                ),
                F.struct(
                    F.col("id_b").alias("src"),
                    F.col("id_a").alias("dst"),
                    F.col("qdot"),
                ),
            )
        ).alias("p")
    ).select("p.src", "p.dst", "p.qdot")
    w = Window.partitionBy("src").orderBy(F.desc("qdot"), "dst")
    lsh = (
        sym.filter(F.col("src") < 50)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("src", "dst")
    )

    ex_n = exact.groupBy("aid").agg(F.count("*").alias("n_exact"))
    lsh_n = lsh.groupBy("src").agg(F.count("*").alias("n_lsh"))
    hits = (
        exact.join(
            lsh,
            (F.col("aid") == F.col("src")) & (F.col("nid") == F.col("dst")),
        )
        .groupBy("aid")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        anchors.select("aid")
        .join(ex_n, "aid", "left")
        .join(lsh_n, F.col("aid") == F.col("src"), "left")
        .join(hits, "aid", "left")
        .select(
            F.col("aid").cast("long").alias("vec_id"),
            F.coalesce(F.col("n_exact"), F.lit(0))
            .cast("long")
            .alias("n_exact"),
            F.coalesce(F.col("n_lsh"), F.lit(0)).cast("long").alias("n_lsh"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.expr(
                "CAST(coalesce(n_hit, 0) AS DECIMAL(38,0)) * 1000000"
                " div coalesce(n_exact, 1)"  # div-ok: n_hit <= n_exact, quotient <= 1e6
            )
            .cast("long")
            .alias("recall_ppm"),
        )
    )


@register(
    "q210_incremental_view_maintenance",
    f"""WITH s3 AS ({_q177_state_sql(3)})
       SELECT st, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(cents) AS BIGINT) AS sum_cents
       FROM s3 GROUP BY st""",
    "incremental materialized-view maintenance under updates (the "
    "Materialize/Delta-live-tables kernel: keep an aggregate current "
    "by applying the CHANGE BATCH'S delta, never re-scanning the "
    "base): the per-status (count, cents) view over the q177 table is "
    "maintained from state v2 to v3 as view(v2) + agg(upsert batch) "
    "- agg(replaced rows), where the replaced rows are v2 semi-joined "
    "on the batch's keys — O(|batch|) work against O(|table|) for the "
    "recompute.  The oracle IS the full recompute of v3, so the "
    "differential proves maintained == recomputed exactly (counts "
    "and cents).  Deletes would enter the same way with negative "
    "deltas (q159's CDC op-classes)",
)
def q210(spark: SparkSession, sf: str) -> DataFrame:
    t = _q177_build(spark, sf, "q210")

    def agg(df, sign: int):
        return df.groupBy("st").agg(
            (F.lit(sign) * F.count("*")).alias("dn"),
            (F.lit(sign) * F.sum("cents")).alias("dc"),
        )

    v2 = t.read(version=2)
    # the same deterministic batch _q177_build upserted into v3
    o = load_table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        cents.alias("cents"),
    )
    batch = (
        base.filter(F.col("k") % 6 == 0)
        .withColumn("cents", F.col("cents") + 10000)
        .unionByName(base.filter(F.col("k") % 3 == 2))
    )
    replaced = v2.join(batch.select("k"), "k", "left_semi")
    deltas = agg(batch, 1).unionByName(agg(replaced, -1))
    maintained = (
        agg(v2, 1)
        .unionByName(deltas)
        .groupBy("st")
        .agg(F.sum("dn").alias("n_rows"), F.sum("dc").alias("sum_cents"))
    )
    return maintained.select(
        "st",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
    )


_Q211_SPLIT = hex_hash64_sql("CAST({id} AS VARCHAR)", "split")


@register(
    "q211_split_leakage_audit",
    f"""WITH pairs AS (SELECT id_a, id_b
                       FROM ({_lsh_near_dup_oracle(0.4, pair_budget=2000)}) t),
       labeled AS (
         SELECT id_a, id_b,
                CASE WHEN {_Q211_SPLIT.format(id='id_a')} % 10 = 0
                     THEN 'test' ELSE 'train' END AS sa,
                CASE WHEN {_Q211_SPLIT.format(id='id_b')} % 10 = 0
                     THEN 'test' ELSE 'train' END AS sb
         FROM pairs),
       classed AS (
         SELECT CASE WHEN sa = sb THEN sa || '-' || sb
                     ELSE 'straddle' END AS pair_class,
                id_a, id_b
         FROM labeled),
       tot AS (SELECT count(*) AS n_total FROM classed)
       SELECT pair_class,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(count(*) * 1000000 // n_total AS BIGINT) AS share_ppm,
              CAST(bit_xor({hex_hash64_sql("CAST(id_a AS VARCHAR) || '|' || CAST(id_b AS VARCHAR)")}) AS BIGINT) AS xor_hash
       FROM classed, tot GROUP BY pair_class, n_total""",
    "train/test split leakage audit (the eval-inflation bug class: a "
    "near-duplicate pair straddling the split lets the model 'see' "
    "test content in training — documented to inflate benchmarks, "
    "and invisible to row-level dedup): every q51-style LSH near-dup "
    "pair labeled by each member's hash-split assignment (10% test) "
    "and classed train-train / test-test / STRADDLE, with counts, "
    "shares in exact ppm, and pair-hash checksums.  The fix when "
    "straddle_ppm is nonzero is group-aware splitting on the q76 "
    "component id (q207's principle with dedup clusters as groups).  "
    "Cost: the pair table is the q51 banded candidate set — the "
    "audit adds only row-local labeling and one bounded aggregate",
)
def q211(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    pairs = D.lsh_near_dup_pairs(
        # pair_budget=2000 (r10, VERDICT r9 wrong #1): the §8.10b
        # budget-derived cap replaces the absolute max_bucket=50 that
        # §8.10a measured going vacuous under corpus growth; q330's
        # constant, measured selective at all three SFs
        d, band_size=4, num_hashes=8, min_jaccard=0.4, pair_budget=2000
    ).select("id_a", "id_b")

    def split(col):
        return F.when(
            T.hex_hash64(F.col(col).cast("string"), salt="split") % 10 == 0,
            F.lit("test"),
        ).otherwise(F.lit("train"))

    labeled = pairs.select(
        "id_a",
        "id_b",
        split("id_a").alias("sa"),
        split("id_b").alias("sb"),
    )
    classed = labeled.select(
        F.when(
            F.col("sa") == F.col("sb"),
            F.concat_ws("-", "sa", "sb"),
        )
        .otherwise(F.lit("straddle"))
        .alias("pair_class"),
        T.hex_hash64(
            F.concat(
                F.col("id_a").cast("string"),
                F.lit("|"),
                F.col("id_b").cast("string"),
            )
        ).alias("h"),
    )
    tot = classed.agg(F.count("*").alias("n_total"))
    return (
        classed.groupBy("pair_class")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "pair_class",
            "n_pairs",
            F.expr("CAST(n_pairs AS DECIMAL(38,0)) * 1000000 div n_total")  # div-ok: class share, quotient <= 1e6
            .cast("long")
            .alias("share_ppm"),
            "xor_hash",
        )
    )


_Q212_WINDOW_HASH = hex_hash64_sql(
    "t[CAST(p AS INTEGER)] || ' ' || t[CAST(p AS INTEGER) + 1] || ' ' "
    "|| t[CAST(p AS INTEGER) + 2]",
    "cdc",
)


@register(
    "q212_content_defined_chunks",
    f"""WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       pos AS (
         SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p FROM toks),
       marked AS (
         SELECT doc_id, p, t[CAST(p AS INTEGER)] AS tok,
                CASE WHEN p <= len(t) - 2
                      AND {_Q212_WINDOW_HASH} % 16 = 0
                     THEN 1 ELSE 0 END AS cut_after
         FROM pos),
       cids AS (
         SELECT doc_id, p, tok,
                sum(cut_after) OVER (
                  PARTITION BY doc_id ORDER BY p
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) AS cid
         FROM marked),
       chunks AS (
         SELECT doc_id, coalesce(cid, 0) AS cid,
                md5(string_agg(tok, ' ' ORDER BY p)) AS ch,
                count(*) AS n_tok
         FROM cids GROUP BY doc_id, coalesce(cid, 0)),
       per_hash AS (
         SELECT ch, count(*) AS cnt, max(n_tok) AS n_tok
         FROM chunks GROUP BY ch)
       SELECT CAST(sum(cnt) AS BIGINT) AS n_chunks,
              CAST(count(*) AS BIGINT) AS n_distinct,
              CAST((sum(cnt) - count(*)) * 1000000 // sum(cnt) AS BIGINT)
                AS dup_ppm,
              CAST(sum(cnt * n_tok) AS BIGINT) AS tokens_total,
              CAST(sum((cnt - 1) * n_tok) AS BIGINT) AS tokens_saved
       FROM per_hash""",
    "content-defined chunking (the restic/borgbackup/LLM-cache "
    "storage-dedup primitive: cut points come from a rolling CONTENT "
    "hash, so an insertion shifts only its own chunk's boundary while "
    "byte-offset chunking would shift every subsequent chunk): cut "
    "after token i wherever the 3-token window hash = 0 mod 16 "
    "(expected chunk ~16 tokens), chunk ids via a cumulative cut "
    "count, chunk content hashed, then the global dedup ledger — "
    "total vs distinct chunks, duplicate share in exact ppm, and the "
    "token mass a content-addressed store would save.  Plan: "
    "row-local window hashing, one explode bounded by corpus tokens, "
    "a per-doc cumulative window (per-doc partitions — bounded by "
    "document length), one chunk aggregate keyed by md5, one "
    "fixed-width rollup.  Deterministic end to end: the same corpus "
    "always cuts identically, which is what makes cross-snapshot "
    "chunk dedup work",
)
def q212(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    toks = d.select("doc_id", T.tokens("text").alias("t"))
    pos = toks.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(1), F.size("t"))).alias("p"),
    )
    wh = T.hex_hash64(
        F.concat_ws(
            " ",
            F.element_at("t", F.col("p")),
            F.element_at("t", F.col("p") + 1),
            F.element_at("t", F.col("p") + 2),
        ),
        salt="cdc",
    )
    marked = pos.select(
        "doc_id",
        "p",
        F.element_at("t", F.col("p")).alias("tok"),
        F.when(
            (F.col("p") <= F.size("t") - 2) & (wh % 16 == 0), 1
        )
        .otherwise(0)
        .alias("cut_after"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cids = marked.select(
        "doc_id",
        "p",
        "tok",
        F.coalesce(F.sum("cut_after").over(w), F.lit(0)).alias("cid"),
    )
    chunks = (
        cids.groupBy("doc_id", "cid")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("p", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("ch"),
            F.count("*").alias("n_tok"),
        )
    )
    per_hash = chunks.groupBy("ch").agg(
        F.count("*").alias("cnt"), F.max("n_tok").alias("n_tok")
    )
    return per_hash.agg(
        F.sum("cnt").cast("long").alias("n_chunks"),
        F.count("*").cast("long").alias("n_distinct"),
        F.expr(
            "CAST(sum(cnt) - count(*) AS DECIMAL(38,0)) * 1000000"
            " div sum(cnt)"  # div-ok: dup share, quotient <= 1e6
        )
        .cast("long")
        .alias("dup_ppm"),
        F.sum(F.col("cnt") * F.col("n_tok"))
        .cast("long")
        .alias("tokens_total"),
        F.sum((F.col("cnt") - 1) * F.col("n_tok"))
        .cast("long")
        .alias("tokens_saved"),
    )


_Q213_DELAY = f"({hex_hash64_sql('CAST(event_id AS VARCHAR)', 'lag')} % 600)"


@register(
    "q213_event_lag_percentiles",
    f"""WITH ev AS (
          SELECT event_type, {_Q213_DELAY} AS lag_s
          FROM events
          WHERE ts >= TIMESTAMP '{WEEK_LO}' AND ts < TIMESTAMP '{WEEK_HI}'),
       perv AS (
         SELECT event_type, lag_s, count(*) AS c
         FROM ev GROUP BY 1, 2),
       cumv AS (
         SELECT event_type, lag_s,
                sum(c) OVER (PARTITION BY event_type ORDER BY lag_s) AS cum,
                sum(c) OVER (PARTITION BY event_type) AS tot
         FROM perv)
       SELECT event_type,
              CAST(max(tot) AS BIGINT) AS n_events,
              CAST(min(lag_s) FILTER (WHERE cum * 2 >= tot) AS BIGINT)
                AS p50_s,
              CAST(min(lag_s) FILTER (WHERE cum * 20 >= 19 * tot) AS BIGINT)
                AS p95_s,
              CAST(min(lag_s) FILTER (WHERE cum * 100 >= 99 * tot) AS BIGINT)
                AS p99_s
       FROM cumv GROUP BY event_type""",
    "event-time vs arrival-time lag distribution (the observability "
    "number behind every watermark decision: withWatermark's delay "
    "should cover ~p99 of real lag, and this query IS how you pick "
    "it): per event type the exact p50/p95/p99 of arrival lag — "
    "synthesized deterministically per event from the md5 family "
    "(0-599 s) since the testdata carries no processing-time column; "
    "a real pipeline feeds ingest_ts - event_ts into the identical "
    "plan.  Exact lower quantiles via the per-(type, lag) aggregate "
    "and cumulative windows over it — windows run over at most 600 "
    "distinct lag values per type, never the events.  The q192 "
    "watermark (2 h) sits far above this p99, which is the documented "
    "design margin",
)
def q213(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf, lo=WEEK_LO, hi=WEEK_HI).select(
        "event_type",
        (
            T.hex_hash64(F.col("event_id").cast("string"), salt="lag") % 600
        ).alias("lag_s"),
    )
    perv = ev.groupBy("event_type", "lag_s").agg(F.count("*").alias("c"))
    wc = Window.partitionBy("event_type").orderBy("lag_s")
    wt = Window.partitionBy("event_type")
    cumv = perv.select(
        "event_type",
        "lag_s",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wt).alias("tot"),
    )

    def q_at(num: int, den: int):
        return F.min(
            F.when(F.col("cum") * den >= num * F.col("tot"), F.col("lag_s"))
        )

    return cumv.groupBy("event_type").agg(
        F.max("tot").cast("long").alias("n_events"),
        q_at(1, 2).cast("long").alias("p50_s"),
        q_at(19, 20).cast("long").alias("p95_s"),
        q_at(99, 100).cast("long").alias("p99_s"),
    )


#: hash-bucket thresholds approximating Poisson(1) pmf over {0,1,2,3+}
#: (368, 368, 184, 80 per mille) — fixed, documented, engine-exact
_Q214_REPS = 8


@register(
    "q214_bootstrap_ci",
    f"""WITH reps AS (SELECT unnest(range(0, {_Q214_REPS})) AS rep),
       weighted AS (
         SELECT rep,
                CASE
                  WHEN ({hex_hash64_sql("CAST(rep AS VARCHAR) || '|' || CAST(o_orderkey AS VARCHAR)", "boot")} % 1000) < 368 THEN 0
                  WHEN ({hex_hash64_sql("CAST(rep AS VARCHAR) || '|' || CAST(o_orderkey AS VARCHAR)", "boot")} % 1000) < 736 THEN 1
                  WHEN ({hex_hash64_sql("CAST(rep AS VARCHAR) || '|' || CAST(o_orderkey AS VARCHAR)", "boot")} % 1000) < 920 THEN 2
                  ELSE 3 END AS w,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS cents
         FROM orders CROSS JOIN reps),
       per_rep AS (
         SELECT rep, sum(w) AS n_eff, sum(w * cents) AS total
         FROM weighted GROUP BY rep),
       base AS (SELECT sum(1) AS n0,
                       sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS t0
                FROM orders)
       SELECT CAST(rep AS INTEGER) AS rep,
              CAST(n_eff AS BIGINT) AS n_eff,
              CAST(total AS BIGINT) AS total_cents,
              CAST((total - t0) * 1000000 // t0 AS BIGINT)
                AS delta_ppm
       FROM per_rep, base""",
    "deterministic Poisson bootstrap (the distributed-CI trick: "
    "instead of resampling rows — impossible to coordinate across a "
    "cluster — each row gets an independent Poisson(1) replication "
    "weight per replicate, here drawn from fixed md5-bucket "
    "thresholds 368/368/184/80 per mille over {{0,1,2,3}}, so every "
    "engine and every retry derives the IDENTICAL resamples): 8 "
    "replicates of total order revenue, each replicate's effective n "
    "and exact-cents total, and its deviation from the true total in "
    "ppm — the spread across replicates IS the bootstrap CI.  "
    "Row-local weights, one aggregate per replicate via an 8-row "
    "broadcast cross join, map-side combinable; zero data movement "
    "beyond the 8-row rollup",
)
def q214(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    reps = spark.range(_Q214_REPS).select(F.col("id").cast("int").alias("rep"))
    h = (
        T.hex_hash64(
            F.concat(
                F.col("rep").cast("string"),
                F.lit("|"),
                F.col("o_orderkey").cast("string"),
            ),
            salt="boot",
        )
        % 1000
    )
    w = (
        F.when(h < 368, 0)
        .when(h < 736, 1)
        .when(h < 920, 2)
        .otherwise(3)
    )
    weighted = o.crossJoin(F.broadcast(reps)).select(
        "rep", w.alias("w"), cents.alias("cents")
    )
    per_rep = weighted.groupBy("rep").agg(
        F.sum("w").alias("n_eff"),
        F.sum(F.col("w") * F.col("cents")).alias("total"),
    )
    base = o.agg(F.sum(cents).alias("t0"))
    return per_rep.crossJoin(F.broadcast(base)).select(
        F.col("rep").cast("int").alias("rep"),
        F.col("n_eff").cast("long").alias("n_eff"),
        F.col("total").cast("long").alias("total_cents"),
        F.expr("(CAST(total - t0 AS DECIMAL(38,0)) * 1000000) div t0")  # div-ok: bootstrap weights bounded (~Poisson(1), max << 50), quotient < 5e7
        .cast("long")
        .alias("delta_ppm"),
    )


@register(
    "q215_bigram_surprisal",
    """WITH toks AS (
         SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       pos AS (
         SELECT doc_id, unnest(range(2, len(t) + 1)) AS p, t FROM toks),
       grams AS (
         SELECT doc_id,
                t[CAST(p AS INTEGER) - 1] AS w1,
                t[CAST(p AS INTEGER) - 1] || ' ' || t[CAST(p AS INTEGER)]
                  AS w12
         FROM pos),
       uni AS (SELECT w1, count(*) AS c1 FROM grams GROUP BY w1),
       bi AS (SELECT w12, count(*) AS c12 FROM grams GROUP BY w12),
       vocab AS (SELECT count(DISTINCT w1) AS v FROM grams),
       scored AS (
         SELECT g.doc_id,
                length(printf('%b',
                  CAST((c1 + v) // (c12 + 1) AS BIGINT))) - 1 AS s
         FROM grams g
         JOIN uni ON g.w1 = uni.w1
         JOIN bi ON g.w12 = bi.w12
         CROSS JOIN vocab),
       per_doc AS (
         SELECT doc_id, count(*) AS n_bigrams, sum(s) AS ssum
         FROM scored GROUP BY doc_id)
       SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
              CAST((ssum * 1000000) // n_bigrams AS BIGINT)
                AS surprisal_ppm
       FROM per_doc""",
    "bigram-LM surprisal (q174's unigram proxy upgraded to a "
    "CONDITIONAL model — the first-order approximation of real "
    "perplexity filtering a la CCNet/KenLM): each bigram scores "
    "floor(log2((c(w1) + V) / (c(w1 w2) + 1))) — add-one-smoothed "
    "-log2 P(w2 | w1) computed as the bit length of an exact integer "
    "ratio (printf('%b') / F.bin; no fp log anywhere), with V the "
    "context vocabulary attached via a 1-row broadcast.  Per-doc mean "
    "bits in exact ppm ranks gibberish above fluent text more sharply "
    "than unigrams (a rare word after its natural context is cheap; "
    "a common word in the wrong context is expensive).  Plan: one "
    "bigram explode (corpus tokens), two map-combinable count "
    "aggregates, two equi-joins back on bounded keys, one per-doc "
    "aggregate — the q174 shape plus one join",
)
def q215(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    toks = d.select("doc_id", T.tokens("text").alias("t"))
    grams = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(2), F.size("t"))).alias("p"),
        "t",
    ).select(
        "doc_id",
        F.element_at("t", F.col("p") - 1).alias("w1"),
        F.concat_ws(
            " ",
            F.element_at("t", F.col("p") - 1),
            F.element_at("t", F.col("p")),
        ).alias("w12"),
    )
    # One corpus aggregation: the bigram counts determine the unigram
    # counts (each gram row contributes its w1 exactly once, so
    # c1(w1) = sum of c12 over bigrams starting with w1) and the vocab
    # size (distinct first words of the count table).  uni and vocab
    # previously re-ran the whole explode subtree — the r7 audit
    # showed documents scanned 3x; deriving them from the (vocabulary-
    # sized) bi table leaves 2 corpus passes: the count pass and the
    # per-position scoring join.
    bi = grams.groupBy("w12").agg(F.count("*").alias("c12"))
    bi_w1 = bi.withColumn(
        "w1", F.substring_index(F.col("w12"), " ", 1)
    )
    uni = bi_w1.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = uni.agg(F.count("*").alias("v"))
    scored = (
        grams.join(uni, "w1")
        .join(bi, "w12")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                F.length(F.bin(F.expr("(c1 + v) div (c12 + 1)"))) - 1
            ).alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("s").alias("ssum"))
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.expr("(ssum * 1000000) div n_bigrams")  # ppm-ok: per-document bigram surprisal sum, bounded by doc length (see q174)
            .cast("long")
            .alias("surprisal_ppm"),
        )
    )


def _q216_oracle() -> str:
    from ..functions.vector import int8_quantize_sql

    return f"""WITH qv AS (
          SELECT label, {int8_quantize_sql('embedding')} AS q
          FROM embeddings),
        dims AS (
          SELECT label, unnest(range(1, 65)) AS pos, q FROM qv),
        percell AS (
          SELECT label, pos,
                 sum(q[CAST(pos AS INTEGER)]) AS s, count(*) AS c
          FROM dims GROUP BY 1, 2),
        cent AS (
          SELECT label, pos,
                 (s - ((s % c) + c) % c) // c AS v
          FROM percell),
        vecs AS (
          SELECT label, list(v ORDER BY pos) AS cv FROM cent GROUP BY label),
        pairs AS (
          SELECT a.label AS label_a, b.label AS label_b,
                 CAST(list_dot_product(CAST(a.cv AS DOUBLE[]),
                                       CAST(b.cv AS DOUBLE[])) AS BIGINT)
                   AS dot,
                 CAST(list_dot_product(CAST(a.cv AS DOUBLE[]),
                                       CAST(a.cv AS DOUBLE[])) AS BIGINT)
                   AS na2,
                 CAST(list_dot_product(CAST(b.cv AS DOUBLE[]),
                                       CAST(b.cv AS DOUBLE[])) AS BIGINT)
                   AS nb2
          FROM vecs a JOIN vecs b ON a.label < b.label)
       SELECT label_a, label_b, dot,
              CAST(floor(dot * 1000000.0
                   / sqrt(CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE)))
                   AS BIGINT) AS cos_ppm
       FROM pairs"""


@register(
    "q216_label_centroid_matrix",
    _q216_oracle(),
    "dataset similarity map (which slices of the corpus are "
    "semantically close — the input to mixture design, domain "
    "weighting, and contamination triage): per-label INTEGER "
    "centroids of the int8-quantized embeddings — element-wise exact "
    "floor means via the sign-safe (s - ((s%c)+c)%c)/c identity, the "
    "q158 k-means centroid rule — then the full pairwise cosine "
    "matrix between the ~|labels| centroids in floor-ppm (only *, /, "
    "sqrt, floor — all bit-portable IEEE ops).  Plan: one posexplode "
    "bounded by vectors x 64 dims, one (label, dim) aggregate "
    "(map-combinable), centroids reassembled by sorted position, and "
    "a |labels|^2 self-join on a table of ~10 rows.  The corpus-sized "
    "data is touched exactly once; the quadratic part is over "
    "LABELS, never vectors",
)
def q216(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vector import int8_quantize, int_dot

    e = load_table(spark, sf, "embeddings")
    qv = e.select("label", int8_quantize("embedding").alias("q"))
    dims = qv.select("label", F.posexplode("q").alias("pos", "val"))
    percell = dims.groupBy("label", "pos").agg(
        F.sum("val").alias("s"), F.count("*").alias("c")
    )
    cent = percell.select(
        "label",
        "pos",
        F.expr("(s - ((s % c) + c) % c) div c").alias("v"),
    )
    vecs = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))),
            lambda x: x["v"],
        ).alias("cv")
    )
    a = vecs.select(F.col("label").alias("label_a"), F.col("cv").alias("ca"))
    b = vecs.select(F.col("label").alias("label_b"), F.col("cv").alias("cb"))
    pairs = a.join(b, F.col("label_a") < F.col("label_b")).select(
        "label_a",
        "label_b",
        int_dot("ca", "cb").alias("dot"),
        int_dot("ca", "ca").alias("na2"),
        int_dot("cb", "cb").alias("nb2"),
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.col("dot").cast("long").alias("dot"),
        F.floor(
            F.col("dot")
            * F.lit(1000000.0)
            / F.sqrt(
                F.col("na2").cast("double") * F.col("nb2").cast("double")
            )
        )
        .cast("long")
        .alias("cos_ppm"),
    )


@register(
    "q217_interval_coverage",
    f"""WITH iv AS (
          SELECT user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) AS s,
                 CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e
          FROM events
          WHERE ts >= TIMESTAMP '{WEEK_LO}' AND ts < TIMESTAMP '{WEEK_HI}'),
       marked AS (
         SELECT user_id, s, e,
                max(e) OVER (
                  PARTITION BY user_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) AS prev_max
         FROM iv),
       islands AS (
         SELECT user_id, s, e,
                sum(CASE WHEN prev_max IS NULL OR s > prev_max
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY s, e) AS isl
         FROM marked),
       merged AS (
         SELECT user_id, isl, min(s) AS ms, max(e) AS me
         FROM islands GROUP BY user_id, isl),
       per_user AS (
         SELECT user_id, count(*) AS n_islands,
                sum(me - ms) AS covered_s
         FROM merged GROUP BY user_id)
       SELECT CAST(count(*) AS BIGINT) AS n_users,
              CAST(sum(n_islands) AS BIGINT) AS n_islands,
              CAST(sum(covered_s) AS BIGINT) AS covered_s,
              CAST(max(covered_s) AS BIGINT) AS max_user_covered_s
       FROM per_user""",
    "interval-union coverage (the uptime/billing/active-time kernel: "
    "total seconds covered by the UNION of possibly-overlapping "
    "activity intervals, overlaps counted once): each event opens a "
    "300 s interval; per user, islands form where an interval starts "
    "past the running max of prior ends (one cumulative-max window + "
    "one island-count window, q126's gaps-and-islands generalized "
    "from points to intervals), then merged island lengths sum to "
    "exact covered seconds.  Per-user partitions bound the windows by "
    "individual activity; the rollup here is the corpus-level "
    "coverage summary.  Integer epoch seconds end to end — no "
    "timestamp arithmetic in fp",
)
def q217(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf, lo=WEEK_LO, hi=WEEK_HI).select(
        "user_id",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + 300).alias("e"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.withColumn("prev_max", F.max("e").over(wprev))
    wisl = Window.partitionBy("user_id").orderBy("s", "e")
    islands = marked.withColumn(
        "isl",
        F.sum(
            F.when(
                F.col("prev_max").isNull()
                | (F.col("s") > F.col("prev_max")),
                1,
            ).otherwise(0)
        ).over(wisl),
    )
    merged = islands.groupBy("user_id", "isl").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    per_user = merged.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.sum(F.col("me") - F.col("ms")).alias("covered_s"),
    )
    return per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("n_islands").cast("long").alias("n_islands"),
        F.sum("covered_s").cast("long").alias("covered_s"),
        F.max("covered_s").cast("long").alias("max_user_covered_s"),
    )


_Q218_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


@register(
    "q218_conditional_merge",
    f"""WITH cur AS (
          SELECT o_orderkey AS k, o_orderstatus AS st,
                 {_Q218_CENTS} AS cents
          FROM orders WHERE o_orderkey % 3 = 0),
       batch AS (
          SELECT o_orderkey AS k, o_orderstatus AS st,
                 {_Q218_CENTS} + 5000 AS cents
          FROM orders WHERE o_orderkey % 2 = 0),
       merged AS (
         SELECT coalesce(c.k, b.k) AS k,
                coalesce(c.st, b.st) AS st,
                CASE WHEN c.k IS NOT NULL AND b.k IS NOT NULL
                          AND c.st = 'O'
                     THEN b.cents              -- WHEN MATCHED AND open
                     WHEN c.k IS NOT NULL THEN c.cents  -- matched, closed
                     ELSE b.cents END AS cents  -- WHEN NOT MATCHED INSERT
         FROM cur c FULL JOIN batch b ON c.k = b.k)
       SELECT st, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(cents) AS BIGINT) AS sum_cents,
              CAST(bit_xor({hex_hash64_sql("CAST(k AS VARCHAR) || '|' || st || '|' || CAST(cents AS VARCHAR)")}) AS BIGINT) AS xor_hash
       FROM merged GROUP BY st""",
    "conditional MERGE (the full WHEN MATCHED AND <predicate> clause "
    "family: update only rows meeting a condition, leave other "
    "matches untouched, insert the unmatched): the q177 table's "
    "one-full-outer-join MERGE kernel extended with a match "
    "predicate — matched AND status 'O' takes the batch's cents, "
    "matched-but-closed keeps the current row byte-for-byte, "
    "unmatched batch rows insert.  Per-status counts, exact cents, "
    "and row-hash xors pin all three clause outcomes at once (an "
    "unconditional MERGE would corrupt the closed-row hashes).  "
    "Same scale shape as q159: one equi-join on the key, row-local "
    "clause selection, partition-pruned rewrite on a real table",
)
def q218(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    cur = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("ck"),
        F.col("o_orderstatus").alias("cst"),
        cents.alias("ccents"),
    )
    batch = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("bk"),
        F.col("o_orderstatus").alias("bst"),
        (cents + 5000).alias("bcents"),
    )
    j = cur.join(batch, F.col("ck") == F.col("bk"), "full_outer")
    merged = j.select(
        F.coalesce(F.col("ck"), F.col("bk")).alias("k"),
        F.coalesce(F.col("cst"), F.col("bst")).alias("st"),
        F.when(
            F.col("ck").isNotNull()
            & F.col("bk").isNotNull()
            & (F.col("cst") == "O"),
            F.col("bcents"),
        )
        .when(F.col("ck").isNotNull(), F.col("ccents"))
        .otherwise(F.col("bcents"))
        .alias("cents"),
    )
    h = T.hex_hash64(
        F.concat(
            F.col("k").cast("string"), F.lit("|"), F.col("st"),
            F.lit("|"), F.col("cents").cast("string"),
        )
    )
    return (
        merged.select("st", h.alias("h"), "cents")
        .groupBy("st")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
        )
    )


_Q219_CENTS = "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"


@register(
    "q219_keyset_pagination",
    f"""WITH ranked AS (
          SELECT c_nationkey AS nk, c_custkey AS k,
                 {_Q219_CENTS} AS cents,
                 row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY {_Q219_CENTS} DESC, c_custkey) AS rk
          FROM customer)
       SELECT CAST(nk AS INTEGER) AS nk, CAST(k AS BIGINT) AS k,
              cents, CAST(rk AS INTEGER) AS rk
       FROM ranked WHERE rk BETWEEN 6 AND 10""",
    "keyset pagination differential (the serving-layer rule: page N "
    "via OFFSET costs O(N*page) re-scan and skew; page N via KEYSET — "
    "'rows strictly after the last row I saw' — costs O(page)): page "
    "2 of each nation's balance-ranked customer list computed the "
    "KEYSET way — the page-1 anchor row (rank 5) per nation is "
    "broadcast back, rows strictly after it in (cents DESC, key) "
    "order are filtered ROW-LOCALLY, and the per-group top-5 of the "
    "remainder comes from the two-phase scalable top-k.  The oracle "
    "states the same page as the rank-window definition (rk 6..10), "
    "so keyset == offset is proven, not assumed.  Nations with fewer "
    "than 6 customers produce no anchor and correctly no page",
)
def q219(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    base = c.select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_custkey").alias("k"),
        cents.alias("cents"),
    )
    order = [F.desc("cents"), F.asc("k")]
    page1 = K.top_k_per_group_scalable(base, ["nk"], order, 5)
    anchor = page1.filter(F.col("rank") == 5).select(
        "nk",
        F.col("cents").alias("a_cents"),
        F.col("k").alias("a_k"),
    )
    after = (
        base.join(F.broadcast(anchor), "nk")
        .filter(
            (F.col("cents") < F.col("a_cents"))
            | (
                (F.col("cents") == F.col("a_cents"))
                & (F.col("k") > F.col("a_k"))
            )
        )
        .select("nk", "k", "cents")
    )
    page2 = K.top_k_per_group_scalable(after, ["nk"], order, 5)
    return page2.select(
        F.col("nk").cast("int").alias("nk"),
        F.col("k").cast("long").alias("k"),
        F.col("cents").cast("long").alias("cents"),
        (F.col("rank") + 5).cast("int").alias("rk"),
    )


@register(
    "q220_metric_parity_check",
    f"""WITH a AS (
          SELECT n_name AS nation,
                 sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS cents
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1),
       b AS (
          SELECT n_name AS nation, sum(cust_cents) AS cents FROM (
            SELECT o_custkey,
                   sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS cust_cents
            FROM orders GROUP BY o_custkey) per_cust
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1)
       SELECT coalesce(a.nation, b.nation) AS nation,
              CAST(a.cents AS BIGINT) AS cents_join_first,
              CAST(b.cents AS BIGINT) AS cents_agg_first,
              (a.cents IS NOT DISTINCT FROM b.cents) AS parity
       FROM a FULL JOIN b ON a.nation = b.nation""",
    "metric-refactoring parity check (the safety net for changing a "
    "metric's plan without changing its meaning — the root cause of "
    "most 'dashboard moved' incidents): per-nation revenue computed "
    "TWO ways — join-then-aggregate vs pre-aggregate-per-customer-"
    "then-join (the scale refactoring that shrinks the join's left "
    "side from |orders| to |customers|) — full-outer joined with a "
    "null-safe equality verdict per nation.  Exact integer cents "
    "make the parity decidable; with fp sums the two plans would "
    "disagree in the last bits and the check would be impossible — "
    "the determinism contract is what buys refactoring freedom.  "
    "Every parity row must read true; the oracle recomputes both "
    "arms independently",
)
def q220(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    a = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(cents).alias("cents_a"))
    )
    per_cust = o.groupBy("o_custkey").agg(F.sum(cents).alias("cust_cents"))
    b = (
        per_cust.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("cust_cents").alias("cents_b"))
    )
    return a.join(b, "nation", "full_outer").select(
        "nation",
        F.col("cents_a").cast("long").alias("cents_join_first"),
        F.col("cents_b").cast("long").alias("cents_agg_first"),
        F.col("cents_a").eqNullSafe(F.col("cents_b")).alias("parity"),
    )


# ---------------------------------------------------------------------------
# continuation batch 4: fuzzy matching, frequent items, data contracts
# ---------------------------------------------------------------------------

_Q221_DIRTY = (
    "substr(c_name, 1, c_custkey % length(c_name)) || "
    "substr(c_name, c_custkey % length(c_name) + 2)"
)


@register(
    "q221_fuzzy_match_fastss",
    f"""WITH dirty AS (
          SELECT c_custkey AS dirty_id, {_Q221_DIRTY} AS dirty_s
          FROM customer WHERE c_custkey % 37 = 3),
       cand AS (
          SELECT d.dirty_id, c.c_custkey AS clean_id,
                 levenshtein(d.dirty_s, c.c_name) AS dist
          FROM dirty d CROSS JOIN customer c
          WHERE levenshtein(d.dirty_s, c.c_name) <= 1)
       SELECT dirty_id,
              arg_min(clean_id, dist * 1000000000 + clean_id) AS matched_id,
              CAST(min(dist) AS INTEGER) AS dist,
              count(*) AS n_candidates
       FROM cand GROUP BY dirty_id""",
    "fuzzy record linkage via FastSS deletion-neighborhood blocking "
    "(operators/dedup.py:fuzzy_best_match): dirty names are synthesized "
    "by deleting the (custkey % len)-th character, and each is matched "
    "to its best Levenshtein<=1 clean customer WITHOUT any cross join — "
    "both sides explode into their len+1 single-deletion variants, and "
    "the variant equi-join is a COMPLETE candidate generator for "
    "distance 1 (substitution: delete the differing position in both; "
    "indel: the short string is a deletion of the long; proof in the "
    "operator docstring).  Exact levenshtein verifies candidates, and "
    "the winner is a commutative min_by on the (dist, id) integer "
    "composite — no window.  The oracle states the naive O(n^2) cross "
    "join, so blocking completeness is proven, not assumed.  At 100 TB "
    "the key fan-out is len+1 rows per record (linear) and the join key "
    "is high-cardinality — ordinary shuffle join, no hot buckets",
)
def q221(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    dirty = c.filter(F.col("c_custkey") % 37 == 3).select(
        F.col("c_custkey").alias("id"),
        F.expr(_Q221_DIRTY).alias("name"),
    )
    clean = c.select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))
    out = D.fuzzy_best_match(dirty, clean, str_col="name", id_col="id")
    return out.select(
        "dirty_id",
        F.col("matched_id").cast("long").alias("matched_id"),
        F.col("dist").cast("int").alias("dist"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
    )


@register(
    "q222_heavy_hitters_mg",
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
                  FROM documents),
       tot AS (SELECT count(*) AS n_total FROM t)
       SELECT token, count(*) AS cnt, (SELECT n_total FROM tot) AS n_total
       FROM t GROUP BY token
       HAVING count(*) * 40 > (SELECT n_total FROM tot)""",
    "exact frequent items via a Misra-Gries candidate pass + exact "
    "recount (operators/sketch.py:heavy_hitters_exact): each partition "
    "summarizes its token slice with 40 bounded counters inside one "
    "Arrow-batched mapInPandas — only the <=40 surviving (item, est) "
    "rows per partition ever leave the pass — and the union of "
    "summaries provably contains every item with count > N/40 (the "
    "per-partition errors sum below N/40, so a true heavy hitter's "
    "estimates cannot all be zero).  The candidate set is then "
    "broadcast into an exact recount and the exact threshold decides, "
    "so the output is EXACT and partitioning-independent even though "
    "the sketch itself is order-dependent.  This is the frequent-items "
    "shape when the key space dwarfs memory at 100 TB: bounded state "
    "per executor, bounded shuffle, one broadcast; the testdata "
    "vocabulary is tiny, but capacity stays fixed while real "
    "vocabularies explode.  Oracle recounts everything exactly",
)
def q222(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    toks = docs.select(F.explode(T.tokens("text")).alias("token"))
    return SK.heavy_hitters_exact(toks, "token", capacity=40)


_Q223_SEGS = "'AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'"


@register(
    "q223_expectations_report",
    f"""SELECT tbl, expectation, n_checked, n_failed,
              n_failed = 0 AS passed
       FROM (
        SELECT 'customer' AS tbl, 'c_acctbal_not_null' AS expectation,
               count(*) AS n_checked,
               count(*) FILTER (c_acctbal IS NULL) AS n_failed
        FROM customer
        UNION ALL
        SELECT 'customer', 'c_acctbal_non_negative', count(*),
               count(*) FILTER (c_acctbal < 0) FROM customer
        UNION ALL
        SELECT 'customer', 'c_mktsegment_accepted', count(*),
               count(*) FILTER (c_mktsegment NOT IN ({_Q223_SEGS}))
        FROM customer
        UNION ALL
        SELECT 'orders', 'o_orderstatus_accepted', count(*),
               count(*) FILTER (o_orderstatus NOT IN ('O','F','P'))
        FROM orders
        UNION ALL
        SELECT 'orders', 'o_totalprice_positive', count(*),
               count(*) FILTER (o_totalprice <= 0) FROM orders
        UNION ALL
        SELECT 'orders', 'o_custkey_fk_customer', count(*),
               count(*) FILTER (c_custkey IS NULL)
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        UNION ALL
        SELECT 'lineitem', 'l_quantity_in_1_50', count(*),
               count(*) FILTER (l_quantity < 1 OR l_quantity > 50)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem', 'l_discount_in_0_10pct', count(*),
               count(*) FILTER (l_discount < 0 OR l_discount > 0.1)
        FROM lineitem
        UNION ALL
        SELECT 'events', 'value_not_null', count(*),
               count(*) FILTER (value IS NULL) FROM events
        UNION ALL
        SELECT 'documents', 'n_chars_consistent', count(*),
               count(*) FILTER (n_chars <> length(text)) FROM documents
       ) t (tbl, expectation, n_checked, n_failed)""",
    "data-contract expectations suite (the Great-Expectations shape as "
    "one engine pass per table): 10 declared expectations — not-null, "
    "accepted-values, numeric range, FK existence, and a cross-column "
    "consistency invariant — each emitting (n_checked, n_failed, "
    "passed).  Every per-table block is ONE conditional aggregate over "
    "one column-pruned scan (stack() unpivots the counters to rows); "
    "the FK check is a left join + null count, never a driver-side "
    "anti-join count.  The acctbal_non_negative expectation genuinely "
    "FAILS on this data (negative balances exist) — the report proves "
    "the failure path, not just green checkmarks.  At 100 TB each "
    "expectation adds a counter to an existing scan, not a new scan",
)
def q223(spark: SparkSession, sf: str) -> DataFrame:
    def fail(cond) -> Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    ev = load_table(spark, sf, "events")
    docs = load_table(spark, sf, "documents")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

    cust = c.agg(
        F.count("*").alias("n"),
        fail(F.col("c_acctbal").isNull()).alias("f1"),
        fail(F.col("c_acctbal") < 0).alias("f2"),
        fail(~F.col("c_mktsegment").isin(segs)).alias("f3"),
    ).select(
        F.lit("customer").alias("tbl"),
        F.expr(
            "stack(3, 'c_acctbal_not_null', f1, 'c_acctbal_non_negative', f2,"
            " 'c_mktsegment_accepted', f3) AS (expectation, n_failed)"
        ),
        F.col("n").alias("n_checked"),
    )
    ords = o.agg(
        F.count("*").alias("n"),
        fail(~F.col("o_orderstatus").isin(["O", "F", "P"])).alias("f1"),
        fail(F.col("o_totalprice") <= 0).alias("f2"),
    ).select(
        F.lit("orders").alias("tbl"),
        F.expr(
            "stack(2, 'o_orderstatus_accepted', f1, 'o_totalprice_positive',"
            " f2) AS (expectation, n_failed)"
        ),
        F.col("n").alias("n_checked"),
    )
    fk = (
        o.select("o_custkey")
        .join(c.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left")
        .agg(
            F.count("*").alias("n"),
            fail(F.col("c_custkey").isNull()).alias("f1"),
        )
        .select(
            F.lit("orders").alias("tbl"),
            F.lit("o_custkey_fk_customer").alias("expectation"),
            F.col("f1").alias("n_failed"),
            F.col("n").alias("n_checked"),
        )
    )
    line = li.agg(
        F.count("*").alias("n"),
        fail((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias("f1"),
        fail((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias("f2"),
    ).select(
        F.lit("lineitem").alias("tbl"),
        F.expr(
            "stack(2, 'l_quantity_in_1_50', f1, 'l_discount_in_0_10pct', f2)"
            " AS (expectation, n_failed)"
        ),
        F.col("n").alias("n_checked"),
    )
    evs = ev.agg(
        F.count("*").alias("n"), fail(F.col("value").isNull()).alias("f1")
    ).select(
        F.lit("events").alias("tbl"),
        F.lit("value_not_null").alias("expectation"),
        F.col("f1").alias("n_failed"),
        F.col("n").alias("n_checked"),
    )
    doc = docs.agg(
        F.count("*").alias("n"),
        fail(F.col("n_chars") != F.length("text")).alias("f1"),
    ).select(
        F.lit("documents").alias("tbl"),
        F.lit("n_chars_consistent").alias("expectation"),
        F.col("f1").alias("n_failed"),
        F.col("n").alias("n_checked"),
    )
    out = cust.unionByName(ords).unionByName(fk).unionByName(line).unionByName(
        evs
    ).unionByName(doc)
    return out.select(
        "tbl",
        "expectation",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_failed").cast("long").alias("n_failed"),
        (F.col("n_failed") == 0).alias("passed"),
    )


@register(
    "q224_inverted_index",
    f"""WITH post AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents),
       dp AS (SELECT DISTINCT token, doc_id FROM post),
       hashes AS (
          SELECT token, doc_id,
                 {hex_hash64_sql("CAST(doc_id AS VARCHAR)")} AS h
          FROM dp)
       SELECT h.token,
              count(*) AS df,
              (SELECT count(*) FROM post p WHERE p.token = h.token) AS cf,
              CAST(bit_xor(h.h) AS BIGINT) AS postings_xor,
              CAST(sum(h.h % 1000000007) AS BIGINT) AS postings_summod
       FROM hashes h GROUP BY h.token""",
    "inverted-index build (the retrieval-serving artifact): per token "
    "the document frequency (distinct postings), collection frequency "
    "(total occurrences), and an order-insensitive postings-set "
    "fingerprint (60-bit md5 XOR + modular sum — the q142 triple).  "
    "The checksum aggregates are commutative and map-side combinable, "
    "so NO posting list is ever materialized in one aggregation "
    "buffer: a stopword's corpus-sized posting would OOM any "
    "collect_list/sort approach at 100 TB, while set-fingerprint "
    "equality proves the same content (equal sets => equal sorted "
    "postings).  The physical index write is repartition(token) + "
    "sortWithinPartitions(token, doc_id) on top of exactly this frame",
)
def q224(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    post = docs.select("doc_id", F.explode(T.tokens("text")).alias("token"))
    cf = post.groupBy("token").agg(F.count("*").alias("cf"))
    dp = post.distinct().withColumn(
        "h", T.hex_hash64(F.col("doc_id").cast("string"))
    )
    idx = dp.groupBy("token").agg(
        F.count("*").cast("long").alias("df"),
        F.expr("bit_xor(h)").cast("long").alias("postings_xor"),
        F.sum(F.col("h") % 1000000007).cast("long").alias("postings_summod"),
    )
    return idx.join(cf, "token").select(
        "token", "df", F.col("cf").cast("long").alias("cf"),
        "postings_xor", "postings_summod",
    )


_Q225_CENTS = "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"


@register(
    "q225_group_mean_impute",
    f"""WITH base AS (
          SELECT c_nationkey AS nk, {_Q225_CENTS} AS cents,
                 c_custkey % 11 = 0 AS miss
          FROM customer),
       agg AS (
          SELECT nk, count(*) AS n_rows,
                 count(*) FILTER (miss) AS n_imputed,
                 count(*) FILTER (NOT miss) AS n_obs,
                 coalesce(sum(cents) FILTER (NOT miss), 0) AS sum_obs
          FROM base GROUP BY nk)
       SELECT CAST(nk AS INTEGER) AS nk, n_rows, n_imputed,
              CAST(CASE WHEN n_obs > 0 THEN
                (sum_obs - ((sum_obs % n_obs) + n_obs) % n_obs) // n_obs
              END AS BIGINT) AS impute_cents,
              CAST(CASE WHEN n_obs > 0 THEN
                sum_obs + n_imputed *
                ((sum_obs - ((sum_obs % n_obs) + n_obs) % n_obs) // n_obs)
              END AS BIGINT) AS sum_after_cents
       FROM agg""",
    "group-mean imputation (the feature-pipeline missing-value fill): "
    "rows deterministically masked as missing (custkey % 11) receive "
    "their nation's exact floor-mean of OBSERVED balances — the "
    "sign-safe (s - pmod(s,n)) div n rule (q158), because balances go "
    "negative and Spark's integer div truncates while DuckDB's // "
    "floors.  One conditional aggregate per nation computes observed "
    "sum/count and imputed count together (single scan, map-side "
    "combined); the imputed-total invariant sum_after = sum_obs + "
    "n_imputed*fill is emitted so downstream mean-shift is auditable.  "
    "Groups with zero observed rows yield NULL fills, not 0 — absence "
    "of evidence stays visible.  At 100 TB this is one shuffle on the "
    "group key at nation cardinality; the fill join back to rows (not "
    "materialized here) is a broadcast",
)
def q225(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    base = c.select(
        F.col("c_nationkey").alias("nk"),
        cents.alias("cents"),
        (F.col("c_custkey") % 11 == 0).alias("miss"),
    )
    agg = base.groupBy("nk").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("miss"), 1).otherwise(0)).alias("n_imputed"),
        F.sum(F.when(~F.col("miss"), 1).otherwise(0)).alias("n_obs"),
        F.coalesce(
            F.sum(F.when(~F.col("miss"), F.col("cents"))), F.lit(0)
        ).alias("sum_obs"),
    )
    fill = F.when(
        F.col("n_obs") > 0,
        F.expr("(sum_obs - pmod(sum_obs, n_obs)) div n_obs"),
    )
    return agg.select(
        F.col("nk").cast("int").alias("nk"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_imputed").cast("long").alias("n_imputed"),
        fill.cast("long").alias("impute_cents"),
        (F.col("sum_obs") + F.col("n_imputed") * fill)
        .cast("long")
        .alias("sum_after_cents"),
    )


@register(
    "q226_compaction_planner",
    """WITH files AS (
          SELECT CAST(floor(sqrt(CAST(l_orderkey % 39601 AS DOUBLE)))
                      AS BIGINT) AS file_id,
                 count(*) AS n_rows,
                 128 * count(*)
                   + sum(length(l_returnflag || l_linestatus)) AS bytes
          FROM lineitem GROUP BY 1),
       tot AS (SELECT sum(bytes) AS total FROM files),
       tgt AS (SELECT ((total + 15) - (((total + 15) % 16) + 16) % 16) // 16
                      AS t FROM tot),
       cum AS (
          SELECT file_id, n_rows, bytes,
                 coalesce(sum(bytes) OVER (ORDER BY file_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
          FROM files)
       SELECT CAST(cum_before // t AS BIGINT) AS bin_id,
              count(*) AS n_files,
              CAST(sum(bytes) AS BIGINT) AS bin_bytes,
              min(file_id) AS first_file, max(file_id) AS last_file,
              CAST((sum(bytes) * 1000000
                    - (((sum(bytes) * 1000000) % t) + t) % t)
                // t AS BIGINT) AS fill_ppm
       FROM cum CROSS JOIN tgt GROUP BY 1, t""",
    "small-file compaction planner (the OPTIMIZE bin-packing step): a "
    "synthetic file manifest (sqrt-skewed ids so sizes vary) is packed "
    "into ~16 target-sized output groups by EXCLUSIVE global running "
    "byte total — bin = cum_before div target — which preserves file "
    "order (cheap range-merge rewrites) and gives every bin except "
    "possibly the last >= target fill; an oversized file simply owns "
    "its bin.  The prefix sum is operators/topk.py:global_running_sum "
    "— range-partition + per-partition exclusive sums + broadcast "
    "partition offsets — because real manifests reach millions of "
    "files and a bare Window.orderBy cumsum would funnel them through "
    "one task.  Target bytes derive from the total via a broadcast "
    "1-row cross join (no driver literal).  Output: per-bin file "
    "count, byte total, file range, and floor-ppm fill factor",
)
def q226(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    files = (
        li.select(
            F.floor(
                F.sqrt((F.col("l_orderkey") % 39601).cast("double"))
            ).alias("file_id"),
            F.length(F.concat("l_returnflag", "l_linestatus")).alias("_len"),
        )
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            (128 * F.count("*") + F.sum("_len")).alias("bytes"),
        )
    )
    tot = files.agg(F.sum("bytes").alias("total"))
    tgt = tot.select(
        F.expr("((total + 15) - pmod(total + 15, 16)) div 16").alias("t")
    )
    cum = K.global_running_sum(
        files, [F.asc("file_id")], "bytes", out_col="cum_before"
    )
    return (
        cum.crossJoin(F.broadcast(tgt))
        .withColumn("bin_id", F.expr("cum_before div t"))
        .groupBy("bin_id", "t")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("bytes").alias("bin_bytes"),
            F.min("file_id").alias("first_file"),
            F.max("file_id").alias("last_file"),
        )
        .select(
            F.col("bin_id").cast("long").alias("bin_id"),
            F.col("n_files").cast("long").alias("n_files"),
            F.col("bin_bytes").cast("long").alias("bin_bytes"),
            F.col("first_file").cast("long").alias("first_file"),
            F.col("last_file").cast("long").alias("last_file"),
            F.expr(
                "(CAST(bin_bytes AS DECIMAL(38,0)) * 1000000"
                " - pmod(CAST(bin_bytes AS DECIMAL(38,0)) * 1000000, t))"
                " div t"  # div-ok: bin_bytes <= 2x target t, quotient <= 2e6
            )
            .cast("long")
            .alias("fill_ppm"),
        )
    )


def _q227_oracle() -> str:
    sh = T.token_shingles_sql("text", 3)
    h = hex_hash64_sql("CAST(perm AS VARCHAR) || '|' || sh")
    return f"""WITH dp AS (
          SELECT DISTINCT source, unnest({sh}) AS sh FROM documents),
       regs AS (
          SELECT source, perm, min({h}) AS reg
          FROM dp CROSS JOIN (SELECT unnest(range(64)) AS perm)
          GROUP BY source, perm),
       agree AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 count(*) FILTER (a.reg = b.reg) AS agree64
          FROM regs a JOIN regs b
            ON a.perm = b.perm AND a.source < b.source
          GROUP BY 1, 2),
       sizes AS (SELECT source, count(*) AS n FROM dp GROUP BY source),
       inter AS (
          SELECT a.source AS src_a, b.source AS src_b, count(*) AS i
          FROM dp a JOIN dp b ON a.sh = b.sh AND a.source < b.source
          GROUP BY 1, 2)
       SELECT g.src_a, g.src_b, g.agree64,
              CAST(g.agree64 * 1000000 // 64 AS BIGINT) AS est_ppm,
              CAST(coalesce(i.i, 0) * 1000000
                   // (sa.n + sb.n - coalesce(i.i, 0)) AS BIGINT)
                AS exact_ppm
       FROM agree g
       JOIN sizes sa ON sa.source = g.src_a
       JOIN sizes sb ON sb.source = g.src_b
       LEFT JOIN inter i ON i.src_a = g.src_a AND i.src_b = g.src_b"""


@register(
    "q227_corpus_overlap_minhash",
    _q227_oracle(),
    "corpus-level overlap matrix from MERGEABLE minhash registers: per "
    "source and each of 64 md5 hash permutations, the register is the "
    "min hash over the source's distinct 3-shingles — a pure min "
    "aggregate, so registers are map-side combinable, shard-mergeable "
    "(min of mins), and maintainable incrementally at ingest time "
    "without touching stored data; the pairwise register-agreement "
    "count estimates Jaccard (floor-ppm of agree/64).  The exact "
    "corpus-pair Jaccard rides along from the distinct (source, "
    "shingle) frame for calibration, q203-style: the sketch estimate "
    "itself is register-exact (md5 family), so even the APPROXIMATION "
    "is oracle-gated bit-for-bit, and the estimate-vs-exact gap is "
    "visible in the output.  At 100 TB the register table is "
    "|sources| x 64 rows — the overlap dashboard ships sketches, "
    "never shingle sets; the exact arm is the sf-bounded audit",
)
def q227(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    # dp feeds four consumers; no checkpoint on purpose — its distinct
    # exchange is canonically identical in every branch, so Spark's
    # ReuseExchange computes the shuffle once and only the cheap
    # post-exchange work repeats (a localCheckpoint here measured
    # SLOWER at sf0.1: the cache barrier serializes the DAG)
    dp = docs.select(
        "source", F.explode(T.token_shingles("text", 3)).alias("sh")
    ).distinct()
    perms = spark.range(64).select(F.col("id").cast("int").alias("perm"))
    regs = (
        dp.crossJoin(F.broadcast(perms))
        .select(
            "source",
            "perm",
            T.hex_hash64(
                F.concat(F.col("perm").cast("string"), F.lit("|"), F.col("sh"))
            ).alias("h"),
        )
        .groupBy("source", "perm")
        .agg(F.min("h").alias("reg"))
    )
    # rename AFTER the self-join, not below it: identical aliased
    # subtrees keep the perm exchange canonically equal on both sides,
    # so the 64x register aggregate is computed once and reused
    ra, rb = regs.alias("_ra"), regs.alias("_rb")
    agree = (
        ra.join(rb, ["perm"])
        .filter(F.col("_ra.source") < F.col("_rb.source"))
        .groupBy(
            F.col("_ra.source").alias("src_a"),
            F.col("_rb.source").alias("src_b"),
        )
        .agg(
            F.sum(
                F.when(F.col("_ra.reg") == F.col("_rb.reg"), 1).otherwise(0)
            ).alias("agree64")
        )
    )
    sizes = dp.groupBy("source").agg(F.count("*").alias("n"))
    inter = (
        dp.alias("x")
        .join(dp.alias("y"), "sh")
        .filter(F.col("x.source") < F.col("y.source"))
        .groupBy(
            F.col("x.source").alias("src_a"), F.col("y.source").alias("src_b")
        )
        .agg(F.count("*").alias("i"))
    )
    out = (
        agree.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))),
            "src_b",
        )
        .join(F.broadcast(inter), ["src_a", "src_b"], "left")
        .withColumn("i", F.coalesce(F.col("i"), F.lit(0)))
    )
    return out.select(
        "src_a",
        "src_b",
        F.col("agree64").cast("long").alias("agree64"),
        F.expr("(agree64 * 1000000) div 64").cast("long").alias("est_ppm"),  # ppm-ok: agree64 <= 64 by construction
        F.expr(
            "(CAST(i AS DECIMAL(38,0)) * 1000000"
            " - pmod(CAST(i AS DECIMAL(38,0)) * 1000000, na + nb - i))"
            " div (na + nb - i)"  # div-ok: Jaccard ppm, i <= na + nb - i domain, quotient <= 1e6
        )
        .cast("long")
        .alias("exact_ppm"),
    )


@register(
    "q228_seasonal_anomaly_gate",
    """WITH hourly AS (
          SELECT event_type,
                 strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00')
                   AS hour_str,
                 CAST(dayofweek(ts) * 24 + hour(ts) AS INTEGER) AS how,
                 count(*) AS c
          FROM events GROUP BY 1, 2, 3),
       base AS (
          SELECT event_type, how, count(*) AS n,
                 sum(c) AS s, sum(c * c) AS q
          FROM hourly GROUP BY 1, 2),
       scored AS (
          SELECT h.event_type, h.hour_str, h.c, b.n,
                 CAST(h.c AS HUGEINT) * b.n - b.s AS dd,
                 CAST(b.n AS HUGEINT) * b.q - CAST(b.s AS HUGEINT) * b.s
                   AS vv
          FROM hourly h JOIN base b
            ON h.event_type = b.event_type AND h.how = b.how),
       z AS (
          SELECT event_type, hour_str, c, n,
                 CASE WHEN vv > 0 THEN
                   floor(CAST(dd AS DOUBLE) * CAST(dd AS DOUBLE)
                         / CAST(vv AS DOUBLE) * 1000000.0) / 1000000.0
                 ELSE 0.0 END AS z2,
                 dd * dd > 9 * vv AS is_anomaly
          FROM scored),
       ranked AS (
          SELECT *, row_number() OVER (
                      PARTITION BY event_type
                      ORDER BY z2 DESC, hour_str) AS rk
          FROM z)
       SELECT event_type, hour_str, CAST(c AS BIGINT) AS cnt,
              CAST(n AS BIGINT) AS n_samples, z2, is_anomaly,
              CAST(rk AS INTEGER) AS rk
       FROM ranked WHERE rk <= 3""",
    "seasonality-aware anomaly gate (the alerting query behind every "
    "ops dashboard): hourly counts per event type are scored against "
    "their own hour-of-week baseline — mean and variance held as exact "
    "integer moment sums (n, sum c, sum c^2) per (type, how) — and an "
    "hour is anomalous iff (cn - s)^2 > 9(nq - s^2), the 3-sigma test "
    "as pure integer cross-multiplication, NO float in the decision "
    "(Spark side routes the products through DECIMAL(38,0): counts at "
    "100 TB put cn past int64, the q149 overflow rule; DuckDB "
    "promotes via HUGEINT).  The reported z^2 uses one IEEE multiply "
    "+ divide (portable) quantized floor6, for ranking only.  Raw "
    "events reduce to |types| x hours rows BEFORE any join or window "
    "(aggregate-then-window), and the baseline table (<= types x 168) "
    "broadcasts.  Top-3 hours per type keep the report bounded; the "
    "exact flag rides on every reported row",
)
def q228(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    how = ((F.dayofweek("ts") - 1) * 24 + F.hour("ts")).cast("int")
    hour_str = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00")
    hourly = (
        ev.select(
            "event_type", hour_str.alias("hour_str"), how.alias("how")
        )
        .groupBy("event_type", "hour_str", "how")
        .agg(F.count("*").alias("c"))
    )
    base = hourly.groupBy("event_type", "how").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    dec = "decimal(38,0)"
    scored = hourly.join(F.broadcast(base), ["event_type", "how"]).select(
        "event_type",
        "hour_str",
        "c",
        "n",
        (F.col("c").cast(dec) * F.col("n") - F.col("s")).alias("dd"),
        (
            F.col("n").cast(dec) * F.col("q")
            - F.col("s").cast(dec) * F.col("s")
        ).alias("vv"),
    )
    z2 = F.when(
        F.col("vv") > 0,
        floor6(
            F.col("dd").cast("double")
            * F.col("dd").cast("double")
            / F.col("vv").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    zf = scored.select(
        "event_type",
        "hour_str",
        "c",
        "n",
        z2.alias("z2"),
        (F.col("dd") * F.col("dd") > 9 * F.col("vv")).alias("is_anomaly"),
    )
    ranked = K.top_k_per_group(
        zf, ["event_type"], [F.desc("z2"), F.asc("hour_str")], 3, rank_col="rk"
    )
    return ranked.select(
        "event_type",
        "hour_str",
        F.col("c").cast("long").alias("cnt"),
        F.col("n").cast("long").alias("n_samples"),
        "z2",
        "is_anomaly",
        F.col("rk").cast("int").alias("rk"),
    )


@register(
    "q229_histogram_rolling_p99",
    """WITH ev AS (
          SELECT date_diff('day', DATE '2024-01-01', ts) AS d, event_type,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
            AND ts < TIMESTAMP '2024-02-01 00:00:00'),
       daily AS (
          SELECT d, event_type,
                 CASE WHEN cents <= 0 THEN 0
                      ELSE length(printf('%b', cents)) END AS bucket,
                 count(*) AS cnt
          FROM ev GROUP BY 1, 2, 3),
       days AS (SELECT DISTINCT d FROM ev),
       served AS (
          SELECT unnest(range(d, d + 7)) AS sd, event_type, bucket, cnt
          FROM daily),
       merged AS (
          SELECT sd, event_type, bucket, sum(cnt) AS cnt
          FROM served JOIN days ON served.sd = days.d
          GROUP BY 1, 2, 3),
       cum AS (
          SELECT sd, event_type, bucket, cnt,
                 sum(cnt) OVER (PARTITION BY sd, event_type
                                ORDER BY bucket) AS c,
                 sum(cnt) OVER (PARTITION BY sd, event_type) AS total
          FROM merged)
       SELECT CAST(sd AS BIGINT) AS day_idx, event_type,
              CAST(max(total) AS BIGINT) AS total,
              CAST(min(bucket) AS INTEGER) AS p99_bucket,
              CAST(1 << (min(bucket) - 1) AS BIGINT) AS lo_cents,
              CAST((1 << min(bucket)) - 1 AS BIGINT) AS hi_cents
       FROM cum WHERE c * 100 >= 99 * total
       GROUP BY sd, event_type""",
    "mergeable-histogram rolling p99 (the latency-SLO counterpart of "
    "q203's rolling HLL): daily per-type exponential-bucket histograms "
    "— bucket = highest-set-bit of integer cents via binary-string "
    "length (q147's trick; fp log2 is banned) — then the 7-day rolling "
    "histogram is a bucket-wise SUM of the tiny daily tables, computed "
    "by a bounded 7x replication of the <=64 bucket rows per day, "
    "NEVER of the events.  p99 is the smallest bucket whose cumulative "
    "count crosses 99% (exact integer cross-multiplication, the "
    "two-phase-quantile rule), reported with its [2^(b-1), 2^b-1] "
    "bracket — the HdrHistogram accuracy contract made explicit: the "
    "true p99 provably lies in the bracket, error bounded by bucket "
    "width.  Histograms are THE mergeable quantile summary at 100 TB: "
    "daily state is constant-size, any window/backfill/shard union is "
    "counter addition, and the cum window runs on <=64-row groups",
)
def q229(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf, lo="2024-01-01", hi="2024-02-01")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    base = ev.select(
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")).alias("d"),
        "event_type",
        cents.alias("cents"),
    )
    bucket = (
        F.when(F.col("cents") <= 0, 0)
        .otherwise(F.length(F.bin("cents")))
        .cast("int")
    )
    daily = (
        base.select("d", "event_type", bucket.alias("bucket"))
        .groupBy("d", "event_type", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    days = base.select("d").distinct()
    served = daily.select(
        F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("sd"),
        "event_type",
        "bucket",
        "cnt",
    )
    merged = (
        served.join(F.broadcast(days.withColumnRenamed("d", "sd")), "sd")
        .groupBy("sd", "event_type", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    wc = Window.partitionBy("sd", "event_type").orderBy("bucket")
    wt = Window.partitionBy("sd", "event_type")
    cum = merged.select(
        "sd",
        "event_type",
        "bucket",
        F.sum("cnt").over(wc).alias("c"),
        F.sum("cnt").over(wt).alias("total"),
    )
    return (
        cum.filter(F.col("c") * 100 >= 99 * F.col("total"))
        .groupBy("sd", "event_type")
        .agg(
            F.max("total").cast("long").alias("total"),
            F.min("bucket").cast("int").alias("p99_bucket"),
        )
        .select(
            F.col("sd").cast("long").alias("day_idx"),
            "event_type",
            "total",
            "p99_bucket",
            F.expr("shiftleft(CAST(1 AS BIGINT), p99_bucket - 1)")
            .cast("long")
            .alias("lo_cents"),
            F.expr("shiftleft(CAST(1 AS BIGINT), p99_bucket) - 1")
            .cast("long")
            .alias("hi_cents"),
        )
    )


_Q230_ARM = "CAST({h} % 2 AS INTEGER)"
_Q230_SPLIT = "2024-01-15 00:00:00"


def _q230_oracle() -> str:
    h = hex_hash64_sql("CAST(user_id AS VARCHAR)", salt="exp1")
    return f"""WITH per_user AS (
          SELECT user_id,
                 CAST({h} % 2 AS INTEGER) AS arm,
                 coalesce(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                       AS BIGINT)) FILTER (ts < TIMESTAMP '{_Q230_SPLIT}'),
                       0) AS x,
                 coalesce(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                       AS BIGINT)) FILTER (ts >= TIMESTAMP '{_Q230_SPLIT}'),
                       0) AS y
          FROM events GROUP BY 1, 2),
       pooled AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM per_user),
       theta AS (
          SELECT n, sx,
                 CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS t
          FROM pooled),
       arms AS (
          SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(x) AS BIGINT) AS sx_a,
                 CAST(sum(y) AS BIGINT) AS sy_a
          FROM per_user GROUP BY arm)
       SELECT arm, n_users,
              floor(CAST(sy_a AS DOUBLE) / CAST(n_users AS DOUBLE)
                    * 1000000.0) / 1000000.0 AS mean_y,
              floor((CAST(sy_a AS DOUBLE) / CAST(n_users AS DOUBLE)
                     - t * (CAST(sx_a AS DOUBLE) / CAST(n_users AS DOUBLE)
                            - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                    * 1000000.0) / 1000000.0 AS adj_mean_y,
              floor(t * 1000000.0) / 1000000.0 AS theta
       FROM arms CROSS JOIN theta"""


@register(
    "q230_cuped_adjustment",
    _q230_oracle(),
    "CUPED variance-reduced experiment readout (the industry-standard "
    "pre-period adjustment): per user, pre-period covariate x and "
    "experiment-period metric y as exact integer cents (one "
    "conditional aggregate, arm = q136's salted md5 parity), pooled "
    "theta = cov(x,y)/var(x) from five exact int64 moment sums, and "
    "per-arm adjusted mean y_adj = mean_y - theta*(mean_x - pooled "
    "mean_x).  The moment sums stay exact integers all the way to ONE "
    "double division per ratio and the final fused multiply-subtract "
    "— every fp op in the chain is +,*,/ on identical operands in "
    "both engines (the portability whitelist), quantized floor6 at "
    "the very end.  The pooled stats attach via broadcast 1-row cross "
    "join, q93-style — no driver round-trip.  At 100 TB: one shuffle "
    "to per-user grain, then arm-cardinality aggregates; moment sums "
    "past int64 route through decimal(38,0) per the q149 rule",
)
def q230(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    split = _ts_lit(ev, "ts", _Q230_SPLIT)
    arm = (
        T.hex_hash64(F.col("user_id").cast("string"), salt="exp1") % 2
    ).cast("int")
    per_user = (
        ev.select(
            "user_id",
            arm.alias("arm"),
            F.when(F.col("ts") < split, cents).otherwise(0).alias("xc"),
            F.when(F.col("ts") >= split, cents).otherwise(0).alias("yc"),
        )
        .groupBy("user_id", "arm")
        .agg(F.sum("xc").alias("x"), F.sum("yc").alias("y"))
    )
    pooled = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    theta = pooled.select(
        "n",
        "sx",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ).alias("t"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").alias("sx_a"),
        F.sum("y").alias("sy_a"),
    )
    out = arms.crossJoin(F.broadcast(theta))
    mean_y = F.col("sy_a").cast("double") / F.col("n_users").cast("double")
    mean_x = F.col("sx_a").cast("double") / F.col("n_users").cast("double")
    pooled_mx = F.col("sx").cast("double") / F.col("n").cast("double")
    return out.select(
        "arm",
        "n_users",
        floor6(mean_y).alias("mean_y"),
        floor6(mean_y - F.col("t") * (mean_x - pooled_mx)).alias(
            "adj_mean_y"
        ),
        floor6(F.col("t")).alias("theta"),
    )


def _q231_oracle() -> str:
    from ..functions.vector import int8_quantize_sql, int_dot_sql

    return f"""WITH qv AS (
          SELECT vec_id, {int8_quantize_sql('embedding')} AS q
          FROM embeddings),
       qa AS (SELECT q AS aq FROM qv WHERE vec_id = 0),
       qb AS (SELECT q AS bq FROM qv WHERE vec_id = 1),
       scored AS (
          SELECT vec_id,
                 {int_dot_sql('q', 'aq')} AS sa,
                 {int_dot_sql('q', 'bq')} AS sb
          FROM qv CROSS JOIN qa CROSS JOIN qb),
       ranked AS (
          SELECT vec_id, sa, sb, sa + sb AS combined,
                 row_number() OVER (ORDER BY sa + sb DESC, vec_id) AS rk
          FROM scored)
       SELECT CAST(vec_id AS BIGINT) AS vec_id,
              CAST(sa AS BIGINT) AS sa, CAST(sb AS BIGINT) AS sb,
              CAST(combined AS BIGINT) AS combined,
              CAST(rk AS INTEGER) AS rk
       FROM ranked WHERE rk <= 10"""


@register(
    "q231_threshold_algorithm_topk",
    _q231_oracle(),
    "Fagin's Threshold Algorithm over two retrieval arms (operators/"
    "similarity.py:ta_topk_fusion): exact top-10 by SUMMED score — two "
    "exact int8 query dots, the multi-aspect / multi-head retrieval "
    "fusion — touching only the HEADS of the per-arm rankings.  Each "
    "round reads the top-m of each arm (TakeOrderedAndProject per-"
    "partition heaps), and the TA certificate (k-th candidate strictly "
    "above tau_a + tau_b, the m-th per-arm scores) proves no unseen "
    "item can reach the top-k, ties included; on failure m doubles, "
    "and at m >= n exactness holds by construction — O(log n) scalar "
    "driver reads for control flow only.  The oracle scores the FULL "
    "corpus, so the early-termination answer is proven equal to the "
    "exhaustive one.  At 100 TB sorted access is the index read order "
    "(IVF cells, BM25 postings) and scan depth m is the entire cost — "
    "the algorithm exists to keep m << n",
)
def q231(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vector import int8_quantize, int_dot

    e = load_table(spark, sf, "embeddings").select(
        "vec_id", int8_quantize("embedding").alias("q")
    )
    qa = e.filter(F.col("vec_id") == 0).select(F.col("q").alias("aq"))
    qb = e.filter(F.col("vec_id") == 1).select(F.col("q").alias("bq"))
    scored = (
        e.crossJoin(F.broadcast(qa))
        .crossJoin(F.broadcast(qb))
        .select(
            "vec_id",
            int_dot("q", "aq").alias("sa"),
            int_dot("q", "bq").alias("sb"),
        )
    )
    top = SIM.ta_topk_fusion(scored, 10, id_col="vec_id")
    return top.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("sa").cast("long").alias("sa"),
        F.col("sb").cast("long").alias("sb"),
        F.col("combined").cast("long").alias("combined"),
        F.col("rk").cast("int").alias("rk"),
    )


#: floor(1e6 / log2(rank+1)) for ranks 1..10 — precomputed LITERALS so
#: neither engine ever evaluates a transcendental (log is off the
#: portability whitelist); the discount table is part of the metric's
#: identity, like q136's salt.
_Q232_W = [
    1000000, 630929, 500000, 430676, 386852,
    356207, 333333, 315464, 301029, 289064,
]


def _q232_oracle() -> str:
    from ..functions.vector import int8_quantize_sql, int_dot_sql

    w_rows = ", ".join(f"({i + 1}, {w})" for i, w in enumerate(_Q232_W))
    return f"""WITH qv AS (
          SELECT vec_id, label, {int8_quantize_sql('embedding')} AS q
          FROM embeddings),
       anchors AS (
          SELECT vec_id AS aid, label AS albl, q AS aq
          FROM qv WHERE vec_id < 8),
       weights (rk, w) AS (VALUES {w_rows}),
       cand AS (
          SELECT aid,
                 CASE WHEN label = albl THEN 7
                      WHEN abs(label - albl) = 1 THEN 1
                      ELSE 0 END AS gain,
                 {int_dot_sql('q', 'aq')} AS dot, vec_id AS cid
          FROM qv CROSS JOIN anchors WHERE vec_id <> aid),
       run AS (
          SELECT aid, gain,
                 row_number() OVER (PARTITION BY aid
                                    ORDER BY dot DESC, cid) AS rk
          FROM cand),
       ideal AS (
          SELECT aid, gain,
                 row_number() OVER (PARTITION BY aid
                                    ORDER BY gain DESC, cid) AS rk
          FROM cand),
       dcg AS (
          SELECT aid, sum(gain * w) AS dcg_micro
          FROM run JOIN weights USING (rk) GROUP BY aid),
       idcg AS (
          SELECT aid, sum(gain * w) AS idcg_micro
          FROM ideal JOIN weights USING (rk) GROUP BY aid)
       SELECT CAST(d.aid AS BIGINT) AS anchor_id,
              CAST(dcg_micro AS BIGINT) AS dcg_micro,
              CAST(idcg_micro AS BIGINT) AS idcg_micro,
              CAST(CASE WHEN idcg_micro > 0
                   THEN dcg_micro * 1000000 // idcg_micro
                   ELSE 0 END AS BIGINT) AS ndcg_ppm
       FROM dcg d JOIN idcg i ON d.aid = i.aid"""


@register(
    "q232_ndcg_retrieval_eval",
    _q232_oracle(),
    "graded retrieval quality (nDCG@10), the ranking-eval counterpart "
    "of q209's recall: each of 8 anchor queries retrieves its exact "
    "int8-dot top-10; graded relevance (same label = gain 7, adjacent "
    "= 1, else 0, i.e. 2^rel - 1) is discounted by rank with "
    "PRECOMPUTED literal micro-weights floor(1e6/log2(rk+1)) — the "
    "discount table ships as constants in both engines, because log "
    "is off the fp portability whitelist, making DCG pure integer "
    "arithmetic.  IDCG re-ranks the same candidate pool by gain (the "
    "corpus-ideal ordering) and ndcg_ppm is an exact integer floor "
    "division.  Both rankings run through the two-phase scalable "
    "per-group top-k; candidates are one linear pass over broadcast "
    "anchors.  This is the acceptance metric for every ranking change "
    "— and it is differentially pinned, so a re-ranker regression "
    "shows up as a hash mismatch, not a dashboard vibe",
)
def q232(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vector import int8_quantize, int_dot

    e = load_table(spark, sf, "embeddings").select(
        "vec_id", "label", int8_quantize("embedding").alias("q")
    )
    anchors = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("albl"),
        F.col("q").alias("aq"),
    )
    gain = (
        F.when(F.col("label") == F.col("albl"), 7)
        .when(F.abs(F.col("label") - F.col("albl")) == 1, 1)
        .otherwise(0)
    )
    cand = (
        e.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("aid"))
        .select(
            "aid",
            gain.alias("gain"),
            int_dot("q", "aq").alias("dot"),
            F.col("vec_id").alias("cid"),
        )
    )
    weights = spark.createDataFrame(
        [(i + 1, w) for i, w in enumerate(_Q232_W)], "rk int, w long"
    )
    run = K.top_k_per_group_scalable(
        cand, ["aid"], [F.desc("dot"), F.asc("cid")], 10, rank_col="rk"
    )
    ideal = K.top_k_per_group_scalable(
        cand, ["aid"], [F.desc("gain"), F.asc("cid")], 10, rank_col="rk"
    )
    dcg = (
        run.join(F.broadcast(weights), "rk")
        .groupBy("aid")
        .agg(F.sum(F.col("gain") * F.col("w")).alias("dcg_micro"))
    )
    idcg = (
        ideal.join(F.broadcast(weights), "rk")
        .groupBy("aid")
        .agg(F.sum(F.col("gain") * F.col("w")).alias("idcg_micro"))
    )
    return dcg.join(idcg, "aid").select(
        F.col("aid").cast("long").alias("anchor_id"),
        F.col("dcg_micro").cast("long").alias("dcg_micro"),
        F.col("idcg_micro").cast("long").alias("idcg_micro"),
        F.when(
            F.col("idcg_micro") > 0,
            F.expr("(dcg_micro * 1000000) div idcg_micro"),  # ppm-ok: dcg_micro is a sum of <=10 literal micro-weights (<1e7) per anchor
        )
        .otherwise(0)
        .cast("long")
        .alias("ndcg_ppm"),
    )


_Q233_CENTS = "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
_Q233_FD = "(({s}) - ((({s}) % ({n})) + ({n})) % ({n})) // ({n})"


def _q233_oracle() -> str:
    fd1 = _Q233_FD.format(s="s", n="n")
    return f"""WITH {_graph_edges_sql()},
       sym AS (SELECT a AS src, b AS dst FROM e
               UNION ALL SELECT b, a FROM e),
       f0 AS (SELECT c_custkey AS node, {_Q233_CENTS} AS h FROM customer),
       m1 AS (SELECT dst AS node, sum(f0.h) AS s, count(*) AS n
              FROM sym JOIN f0 ON f0.node = sym.src GROUP BY dst),
       h1 AS (SELECT node, CAST({fd1} AS BIGINT) AS h FROM m1),
       m2 AS (SELECT dst AS node, sum(h1.h) AS s, count(*) AS n
              FROM sym JOIN h1 ON h1.node = sym.src GROUP BY dst),
       h2 AS (SELECT node, CAST({fd1} AS BIGINT) AS h FROM m2)
       SELECT f0.node, f0.h AS h0_cents,
              h1.h AS h1_cents, h2.h AS h2_cents
       FROM f0
       LEFT JOIN h1 ON h1.node = f0.node
       LEFT JOIN h2 ON h2.node = f0.node
       WHERE f0.node % 7 = 0"""


@register(
    "q233_graph_feature_propagation",
    _q233_oracle(),
    "two rounds of GNN-style neighborhood mean aggregation over the "
    "deterministic synthetic graph (the message-passing primitive "
    "behind GraphSAGE-mean / LightGCN feature propagation): h_r(x) = "
    "sign-safe floor-mean of neighbors' h_{r-1}, with balances as the "
    "seed feature.  Each round IS the sparse matrix-vector multiply "
    "expressed relationally — edges join the feature table on src, "
    "aggregate on dst — so one round = one shuffle on node id, state "
    "per round is one (node, h) table, and R rounds compose linearly "
    "(no recursion, no driver loop; the plan is two stacked joins).  "
    "Nodes whose neighborhood is empty stay NULL rather than 0 — "
    "absence of messages is not a zero message.  Exact integer "
    "arithmetic end-to-end (the q158 floor-mean rule), so round "
    "results are bit-identical on any cluster size or partitioning",
)
def q233(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import symmetrize

    e = _graph_edges(spark, sf)
    # one-pass symmetrization + checkpoint: sym feeds h1, and h2's
    # plan REPLAYS h1's, so an unbarriered sym would rebuild the
    # edge list (scan+explode+DISTINCT) several times — the old
    # two-branch union doubled each of those rebuilds on top
    sym = symmetrize(e, "a", "b", distinct=False).localCheckpoint()
    c = load_table(spark, sf, "customer")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    f0 = c.select(F.col("c_custkey").alias("node"), cents.alias("h"))

    def mean_round(feat: DataFrame) -> DataFrame:
        m = (
            sym.join(feat.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("s"), F.count("*").alias("n"))
        )
        return m.select(
            F.col("dst").alias("node"),
            F.expr("(s - pmod(s, n)) div n").cast("long").alias("h"),
        )

    h1 = mean_round(f0)
    h2 = mean_round(h1)
    return (
        f0.join(h1.withColumnRenamed("h", "h1"), "node", "left")
        .join(h2.withColumnRenamed("h", "h2"), "node", "left")
        .filter(F.col("node") % 7 == 0)
        .select(
            "node",
            F.col("h").cast("long").alias("h0_cents"),
            F.col("h1").cast("long").alias("h1_cents"),
            F.col("h2").cast("long").alias("h2_cents"),
        )
    )


#: (table, fixed bytes per row, string columns, array columns)
_Q234_LAYOUT = [
    ("lineitem", 68, ["l_returnflag", "l_linestatus"], []),
    ("orders", 32, ["o_orderstatus", "o_orderpriority"], []),
    ("customer", 20, ["c_name", "c_mktsegment"], []),
    ("supplier", 20, ["s_name"], []),
    ("part", 20, ["p_name", "p_brand", "p_type"], []),
    ("nation", 8, ["n_name"], []),
    ("region", 4, ["r_name"], []),
    ("events", 32, ["event_type", "props"], []),
    ("documents", 16, ["text", "lang", "source"], []),
    ("embeddings", 12, [], ["embedding"]),
]
_Q234_SHUFFLE_TGT = 128 * 1024 * 1024
_Q234_FILE_TGT = 512 * 1024 * 1024
_Q234_BCAST = 10 * 1024 * 1024


def _q234_oracle() -> str:
    blocks = []
    for tbl, fixed, strs, arrs in _Q234_LAYOUT:
        var = " + ".join(
            [f"coalesce(sum(length({s})), 0)" for s in strs]
            + [f"coalesce(sum(4 * len({a})), 0)" for a in arrs]
        ) or "0"
        blocks.append(
            f"SELECT '{tbl}' AS tbl, count(*) AS n_rows,\n"
            f"       {fixed} * count(*) + {var} AS est_bytes\n"
            f"FROM {tbl}"
        )
    un = "\n       UNION ALL ".join(blocks)
    return f"""WITH sizes AS ({un})
       SELECT tbl, n_rows, CAST(est_bytes AS BIGINT) AS est_bytes,
              CAST((est_bytes + {_Q234_SHUFFLE_TGT - 1})
                   // {_Q234_SHUFFLE_TGT} AS BIGINT) AS shuffle_parts_128mb,
              CAST((est_bytes + {_Q234_FILE_TGT - 1})
                   // {_Q234_FILE_TGT} AS BIGINT) AS files_512mb,
              est_bytes < {_Q234_BCAST} AS broadcastable
       FROM sizes"""


@register(
    "q234_partition_advisor",
    _q234_oracle(),
    "physical-design advisor (SCALE.md's sizing rules made executable): "
    "per table, estimated uncompressed bytes from fixed per-type widths "
    "plus MEASURED variable-width mass (string lengths, array "
    "elements), then the three decisions every Spark job tunes by "
    "hand — shuffle partition count at a 128 MB target "
    "(spark.sql.shuffle.partitions for shuffles carrying this table), "
    "output file count at a 512 MB compaction target (q226's input), "
    "and broadcast eligibility under the 10 MB autoBroadcastJoinThreshold "
    "convention.  One column-pruned conditional aggregate per table; "
    "ceilings are exact integer (x + t - 1) div t.  The advisor row is "
    "the input contract for AQE overrides and the q49/q50 salting "
    "decisions — measured, not guessed, and cheap enough to run per "
    "ingest batch",
)
def q234(spark: SparkSession, sf: str) -> DataFrame:
    frames = []
    for tbl, fixed, strs, arrs in _Q234_LAYOUT:
        t = load_table(spark, sf, tbl)
        var_terms = [
            F.coalesce(F.sum(F.length(s)), F.lit(0)) for s in strs
        ] + [
            F.coalesce(F.sum(4 * F.size(a)), F.lit(0)) for a in arrs
        ]
        var = var_terms[0] if var_terms else F.lit(0)
        for extra in var_terms[1:]:
            var = var + extra
        frames.append(
            t.agg(
                F.count("*").alias("n_rows"),
                (F.lit(fixed) * F.count("*") + var).alias("est_bytes"),
            ).select(F.lit(tbl).alias("tbl"), "n_rows", "est_bytes")
        )
    sizes = frames[0]
    for fdf in frames[1:]:
        sizes = sizes.unionByName(fdf)
    return sizes.select(
        "tbl",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("est_bytes").cast("long").alias("est_bytes"),
        F.expr(
            f"(est_bytes + {_Q234_SHUFFLE_TGT - 1}) div {_Q234_SHUFFLE_TGT}"
        )
        .cast("long")
        .alias("shuffle_parts_128mb"),
        F.expr(f"(est_bytes + {_Q234_FILE_TGT - 1}) div {_Q234_FILE_TGT}")
        .cast("long")
        .alias("files_512mb"),
        (F.col("est_bytes") < _Q234_BCAST).alias("broadcastable"),
    )


#: candidate joins: (name, fact table, fact key, dim table)
_Q235_JOINS = [
    ("lineitem_orders", "lineitem", "l_orderkey", "orders"),
    ("lineitem_part", "lineitem", "l_partkey", "part"),
    ("orders_customer", "orders", "o_custkey", "customer"),
    ("customer_nation", "customer", "c_nationkey", "nation"),
    ("events_customer", "events", "user_id", "customer"),
    ("orders_lineitem", "orders", "o_orderkey", "lineitem"),
]
_Q235_HOT_PPM = 20000  # >2% of fact rows on one key => salt


def _q235_oracle() -> str:
    size_exprs = {
        tbl: f"{fixed} * count(*) + "
        + (
            " + ".join(
                [f"coalesce(sum(length({s})), 0)" for s in strs]
                + [f"coalesce(sum(4 * len({a})), 0)" for a in arrs]
            )
            or "0"
        )
        for tbl, fixed, strs, arrs in _Q234_LAYOUT
    }
    blocks = []
    for name, fact, fkey, dim in _Q235_JOINS:
        blocks.append(f"""
        SELECT '{name}' AS join_name,
               (SELECT CAST({size_exprs[fact]} AS BIGINT) FROM {fact})
                 AS fact_bytes,
               (SELECT CAST({size_exprs[dim]} AS BIGINT) FROM {dim})
                 AS dim_bytes,
               ks.n AS n_fact_rows, ks.k AS n_keys, ks.hot_ppm
        FROM (SELECT CAST(sum(c) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS k,
                     CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS hot_ppm
              FROM (SELECT count(*) AS c FROM {fact}
                    GROUP BY {fkey})) ks""")
    un = "\n       UNION ALL ".join(blocks)
    return f"""WITH cand AS ({un})
       SELECT join_name, fact_bytes, dim_bytes, n_fact_rows, n_keys,
              hot_ppm,
              CASE WHEN dim_bytes < {_Q234_BCAST} THEN 'broadcast'
                   WHEN hot_ppm > {_Q235_HOT_PPM} THEN 'salted_smj'
                   ELSE 'smj' END AS strategy
       FROM cand"""


@register(
    "q235_join_strategy_advisor",
    _q235_oracle(),
    "join-strategy advisor (the decision table behind every q49/q50 "
    "salting and broadcast() call in this repo, made executable): for "
    "each candidate join, the dim side's estimated bytes (q234's "
    "measured layout math), the fact side's key cardinality and "
    "hottest-key concentration in exact ppm (q201's one-scan "
    "aggregate — max(c)*1e6/sum(c), no join performed), and the "
    "verdict: broadcast when the build side fits under the 10 MB "
    "autoBroadcastJoinThreshold convention, salted sort-merge when "
    "one key holds >2% of the fact rows (the skew cliff), plain "
    "sort-merge otherwise.  The decisions genuinely flip with scale "
    "factor — the reversed orders->lineitem probe crosses the "
    "broadcast threshold as data grows — so the differential pins "
    "the advisor's behavior on BOTH sides of each threshold.  Cost: "
    "one groupBy per fact key, dim sizes from single aggregates; "
    "nothing here touches a joined row",
)
def q235(spark: SparkSession, sf: str) -> DataFrame:
    layout = {t: (f, s, a) for t, f, s, a in _Q234_LAYOUT}

    def size_frame(tbl: str, out: str) -> DataFrame:
        fixed, strs, arrs = layout[tbl]
        var_terms = [
            F.coalesce(F.sum(F.length(s)), F.lit(0)) for s in strs
        ] + [F.coalesce(F.sum(4 * F.size(a)), F.lit(0)) for a in arrs]
        var = var_terms[0] if var_terms else F.lit(0)
        for extra in var_terms[1:]:
            var = var + extra
        return load_table(spark, sf, tbl).agg(
            (F.lit(fixed) * F.count("*") + var).cast("long").alias(out)
        )

    frames = []
    for name, fact, fkey, dim in _Q235_JOINS:
        ks = (
            load_table(spark, sf, fact)
            .groupBy(fkey)
            .agg(F.count("*").alias("c"))
            .agg(
                F.sum("c").cast("long").alias("n_fact_rows"),
                F.count("*").cast("long").alias("n_keys"),
                F.expr(
                    "(CAST(max(c) AS DECIMAL(38,0)) * 1000000) div sum(c)"  # div-ok: max share, quotient <= 1e6
                )
                .cast("long")
                .alias("hot_ppm"),
            )
        )
        frames.append(
            ks.crossJoin(F.broadcast(size_frame(fact, "fact_bytes")))
            .crossJoin(F.broadcast(size_frame(dim, "dim_bytes")))
            .select(
                F.lit(name).alias("join_name"),
                "fact_bytes",
                "dim_bytes",
                "n_fact_rows",
                "n_keys",
                "hot_ppm",
            )
        )
    cand = frames[0]
    for fdf in frames[1:]:
        cand = cand.unionByName(fdf)
    strategy = (
        F.when(F.col("dim_bytes") < _Q234_BCAST, "broadcast")
        .when(F.col("hot_ppm") > _Q235_HOT_PPM, "salted_smj")
        .otherwise("smj")
    )
    return cand.withColumn("strategy", strategy)


_Q236_PAIRS = 256


def _q236_oracle() -> str:
    sh = T.token_shingles_sql("text", 3)
    ha = hex_hash64_sql("CAST(i AS VARCHAR)", salt="pa")
    hb = hex_hash64_sql("CAST(i AS VARCHAR)", salt="pb")
    return f"""WITH ranked AS (
          SELECT doc_id, list_distinct({sh}) AS s,
                 row_number() OVER (ORDER BY doc_id) AS rn
          FROM documents),
       nn AS (SELECT count(*) AS n FROM ranked),
       spec AS (
          SELECT i, 1 + ({ha}) % n AS ra, 1 + ({hb}) % n AS rb
          FROM (SELECT unnest(range({_Q236_PAIRS})) AS i), nn),
       pairs AS (
          SELECT spec.i,
                 len(list_intersect(a.s, b.s)) AS inter,
                 len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS un
          FROM spec
          JOIN ranked a ON a.rn = spec.ra
          JOIN ranked b ON b.rn = spec.rb
          WHERE spec.ra <> spec.rb),
       ppm AS (
          SELECT i, CASE WHEN un > 0 THEN inter * 1000000 // un
                         ELSE 0 END AS p
          FROM pairs)
       SELECT CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(sum(p) // count(*) AS BIGINT) AS mean_jaccard_ppm,
              CAST(min(p) AS BIGINT) AS min_ppm,
              CAST(max(p) AS BIGINT) AS max_ppm
       FROM ppm"""


@register(
    "q236_sampled_pair_similarity",
    _q236_oracle(),
    "corpus mean pairwise similarity WITHOUT the O(n^2) pair space: "
    "256 deterministic hash-sampled pairs — row positions come from "
    "the scalable global row_number, pair endpoints from two salted "
    "md5 streams over the pair index, so every engine, retry, and "
    "shard draws the IDENTICAL sample (the q214 determinism rule) — "
    "each scored with exact row-local 3-shingle Jaccard after two "
    "broadcast-spec joins against the ranked corpus.  The estimator "
    "costs O(corpus) for ranking plus O(sample), versus the O(n^2) "
    "truth it estimates (q141's exact pair join is the calibration "
    "partner); self-pairs are excluded, empty-union pairs score 0.  "
    "This is how corpus-drift and diversity dashboards stay runnable "
    "at 100 TB: fixed sample size, error shrinking as 1/sqrt(k), "
    "sample reproducible forever",
)
def q236(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.array_distinct(T.token_shingles("text", 3)).alias("s")
    )
    ranked = K.global_row_number(docs, [F.asc("doc_id")], out_col="rn")
    nn = ranked.agg(F.count("*").alias("n"))
    idx = spark.range(_Q236_PAIRS).select(F.col("id").cast("int").alias("i"))
    spec = (
        idx.crossJoin(F.broadcast(nn))
        .select(
            "i",
            (
                1
                + T.hex_hash64(F.col("i").cast("string"), salt="pa")
                % F.col("n")
            ).alias("ra"),
            (
                1
                + T.hex_hash64(F.col("i").cast("string"), salt="pb")
                % F.col("n")
            ).alias("rb"),
        )
        .filter(F.col("ra") != F.col("rb"))
    )
    a = ranked.select(F.col("rn").alias("ra"), F.col("s").alias("sa"))
    b = ranked.select(F.col("rn").alias("rb"), F.col("s").alias("sb"))
    pairs = (
        spec.join(a, "ra")
        .join(b, "rb")
        .select(
            "i",
            F.size(F.array_intersect("sa", "sb")).alias("inter"),
            (
                F.size("sa") + F.size("sb")
                - F.size(F.array_intersect("sa", "sb"))
            ).alias("un"),
        )
    )
    ppm = pairs.select(
        F.when(
            F.col("un") > 0, F.expr("(inter * 1000000) div un")  # ppm-ok: inter <= token-set size of one sampled document pair
        )
        .otherwise(0)
        .alias("p")
    )
    return ppm.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.expr("sum(p) div count(*)").cast("long").alias("mean_jaccard_ppm"),
        F.min("p").cast("long").alias("min_ppm"),
        F.max("p").cast("long").alias("max_ppm"),
    )


_Q237_BUCKETS = 64


def _q237_oracle() -> str:
    cents = "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
    bkt = hex_hash64_sql("CAST(c_custkey AS VARCHAR)", salt="mb")
    rh = hex_hash64_sql("CAST(k AS VARCHAR) || '|' || CAST(cents AS VARCHAR)")
    return f"""WITH a AS (
          SELECT c_custkey AS k, {cents} AS cents,
                 CAST({bkt} % {_Q237_BUCKETS} AS INTEGER) AS bkt
          FROM customer),
       b AS (
          SELECT k,
                 cents + CASE WHEN k % 101 = 5 THEN 1 ELSE 0 END AS cents,
                 bkt
          FROM a WHERE k % 307 <> 9),
       ha AS (SELECT k, bkt, {rh} AS h FROM a),
       hb AS (SELECT k, bkt, {rh} AS h FROM b),
       ta AS (SELECT bkt, count(*) AS n, bit_xor(h) AS x,
                     sum(h % 1000000007) AS sm
              FROM ha GROUP BY bkt),
       tb AS (SELECT bkt, count(*) AS n, bit_xor(h) AS x,
                     sum(h % 1000000007) AS sm
              FROM hb GROUP BY bkt),
       mismatch AS (
          SELECT ta.bkt, ta.n AS n_a, coalesce(tb.n, 0) AS n_b
          FROM ta LEFT JOIN tb ON ta.bkt = tb.bkt
          WHERE tb.bkt IS NULL OR ta.n <> tb.n OR ta.x <> tb.x
             OR ta.sm <> tb.sm),
       detail AS (
          SELECT m.bkt,
                 count(*) FILTER (hb.k IS NULL) AS n_missing_b,
                 count(*) FILTER (hb.k IS NOT NULL
                                  AND ha.h <> hb.h) AS n_differing
          FROM mismatch m
          JOIN ha ON ha.bkt = m.bkt
          LEFT JOIN hb ON hb.k = ha.k
          GROUP BY m.bkt)
       SELECT m.bkt, CAST(m.n_a AS BIGINT) AS n_a,
              CAST(m.n_b AS BIGINT) AS n_b,
              CAST(d.n_missing_b AS BIGINT) AS n_missing_b,
              CAST(d.n_differing AS BIGINT) AS n_differing
       FROM mismatch m JOIN detail d ON d.bkt = m.bkt"""


@register(
    "q237_merkle_repair_plan",
    _q237_oracle(),
    "two-level anti-entropy repair plan (the Dynamo/Cassandra Merkle "
    "walk, relationally): replica B is replica A with deterministic "
    "drift injected (every 101st key bit-rotted by one cent, every "
    "307th key missing).  Level 1 compares per-bucket q142 checksum "
    "triples (count, xor, modular sum of 60-bit row hashes) — 64 "
    "constant-size rows per replica cross the wire, NEVER data.  "
    "Level 2 rehydrates ONLY the mismatched buckets (a broadcast "
    "semi-join on the tiny mismatch list) and classifies each key as "
    "missing-in-B or content-differing via a left join on the row "
    "hash.  Repair cost is proportional to the DAMAGED fraction, not "
    "the table: with d damaged buckets of 64, level 2 touches d/64 of "
    "the rows — at 100 TB the difference between re-shipping a "
    "table and shipping 64 integers plus the drifted rows.  The "
    "checksum triple's collision resistance is what makes level-1 "
    "silence trustworthy; the differential pins both levels",
)
def q237(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    bkt = (
        T.hex_hash64(F.col("c_custkey").cast("string"), salt="mb")
        % _Q237_BUCKETS
    ).cast("int")
    a = c.select(
        F.col("c_custkey").alias("k"), cents.alias("cents"), bkt.alias("bkt")
    )
    b = a.filter(F.col("k") % 307 != 9).select(
        "k",
        (
            F.col("cents")
            + F.when(F.col("k") % 101 == 5, 1).otherwise(0)
        ).alias("cents"),
        "bkt",
    )

    def hashed(df: DataFrame) -> DataFrame:
        h = T.hex_hash64(
            F.concat(
                F.col("k").cast("string"),
                F.lit("|"),
                F.col("cents").cast("string"),
            )
        )
        return df.select("k", "bkt", h.alias("h"))

    ha, hb = hashed(a), hashed(b)

    def triple(df: DataFrame, pre: str) -> DataFrame:
        return df.groupBy("bkt").agg(
            F.count("*").alias(f"{pre}n"),
            F.expr("bit_xor(h)").alias(f"{pre}x"),
            F.sum(F.col("h") % 1000000007).alias(f"{pre}sm"),
        )

    mismatch = (
        triple(ha, "a_")
        .join(triple(hb, "b_"), "bkt", "left")
        .filter(
            F.col("b_n").isNull()
            | (F.col("a_n") != F.col("b_n"))
            | (F.col("a_x") != F.col("b_x"))
            | (F.col("a_sm") != F.col("b_sm"))
        )
        .select(
            "bkt",
            F.col("a_n").alias("n_a"),
            F.coalesce(F.col("b_n"), F.lit(0)).alias("n_b"),
        )
    )
    detail = (
        ha.join(F.broadcast(mismatch.select("bkt")), "bkt")
        .join(
            hb.select(F.col("k"), F.col("h").alias("hb")), "k", "left"
        )
        .groupBy("bkt")
        .agg(
            F.sum(F.when(F.col("hb").isNull(), 1).otherwise(0)).alias(
                "n_missing_b"
            ),
            F.sum(
                F.when(
                    F.col("hb").isNotNull() & (F.col("h") != F.col("hb")), 1
                ).otherwise(0)
            ).alias("n_differing"),
        )
    )
    return mismatch.join(detail, "bkt").select(
        "bkt",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_missing_b").cast("long").alias("n_missing_b"),
        F.col("n_differing").cast("long").alias("n_differing"),
    )


@register(
    "q238_stream_stream_join",
    f"""WITH ev AS (
          SELECT * FROM events
          WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
            AND ts < TIMESTAMP '2024-01-15 00:00:00'),
       c AS (SELECT event_id AS click_id, ts AS click_ts, user_id
             FROM ev WHERE event_type = 'click'),
       p AS (SELECT event_id AS purchase_id, ts AS purchase_ts, user_id
             FROM ev WHERE event_type = 'purchase'),
       j AS (
          SELECT c.user_id, c.click_id, c.click_ts,
                 p.purchase_id, p.purchase_ts
          FROM c JOIN p ON c.user_id = p.user_id
            AND p.purchase_ts >= c.click_ts
            AND p.purchase_ts <= c.click_ts + INTERVAL 2 HOUR)
       SELECT {day_str_sql('click_ts')} AS day,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
              CAST(sum(epoch_us(purchase_ts) - epoch_us(click_ts))
                   AS BIGINT) AS sum_lag_us,
              CAST(bit_xor({hex_hash64_sql(
                  "CAST(click_id AS VARCHAR) || '|' || CAST(purchase_id AS VARCHAR)"
              )}) AS BIGINT) AS pair_xor
       FROM j GROUP BY 1""",
    "TRUE stream-stream event-time interval join (streaming/ingest.py:"
    "stream_stream_interval_join) — the conversion-attribution kernel "
    "and the one Structured Streaming operator with state on BOTH "
    "sides: the click stream joins the purchase stream on user_id "
    "with the purchase inside [click_ts, click_ts + 2h], each side "
    "arriving as two mtime-pinned microbatches from its own file "
    "source.  Both watermarks are wider than the data span, so no "
    "join state evicts and the emitted matches are independent of how "
    "the sources interleave — the sink provably equals the batch "
    "interval join, which is exactly what the oracle states (per "
    "click-day pair counts, distinct users, exact microsecond lag "
    "mass, and an order-insensitive pair-set xor so a lost or "
    "duplicated match flips the hash).  At 100 TB join state is "
    "bounded by watermark horizon x per-key arrival rate, shuffled "
    "on user_id; the interval predicate prunes inside key groups",
)
def q238(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.ingest import stream_stream_interval_join

    j = stream_stream_interval_join(spark, sf)
    pair_h = T.hex_hash64(
        F.concat(
            F.col("click_id").cast("string"),
            F.lit("|"),
            F.col("purchase_id").cast("string"),
        )
    )
    return (
        j.select(
            F.col("cu").alias("user_id"),
            "click_id",
            "click_ts",
            "purchase_id",
            "purchase_ts",
            pair_h.alias("ph"),
        )
        .groupBy(day_str("click_ts").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(
                F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
            )
            .cast("long")
            .alias("sum_lag_us"),
            F.expr("bit_xor(ph)").cast("long").alias("pair_xor"),
        )
    )


_Q239_CHANGE_DATE = "1995-06-01"


@register(
    "q239_backfill_blast_radius",
    f"""WITH changed AS (
          SELECT c_custkey FROM customer WHERE c_custkey % 53 = 7),
       parts AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 count(*) AS n_rows,
                 count(*) FILTER (
                   o_custkey IN (SELECT c_custkey FROM changed)
                   AND o_orderdate >= TIMESTAMP '{_Q239_CHANGE_DATE}')
                   AS n_affected
          FROM orders GROUP BY 1)
       SELECT month, CAST(n_rows AS BIGINT) AS n_rows,
              CAST(n_affected AS BIGINT) AS n_affected,
              CAST(n_affected * 1000000 // n_rows AS BIGINT)
                AS affected_ppm
       FROM parts WHERE n_affected > 0""",
    "backfill blast-radius planner (the reprocessing decision when a "
    "dimension correction arrives late): a batch of changed customer "
    "keys effective from a change date, and the question every "
    "pipeline owner asks before rerunning — WHICH fact partitions "
    "must recompute, and how much of each is actually touched.  One "
    "scan of the fact computes per month-partition totals and "
    "affected counts together (the changed-key set rides as a "
    "broadcast semi-join inside a conditional aggregate — no separate "
    "probe pass), and only partitions with nonzero damage appear: "
    "everything before the change date is provably untouched, which "
    "is the partition-pruning argument that turns a full-history "
    "rerun into a bounded one.  affected_ppm is the triage column — "
    "a partition 0.1% affected wants a targeted MERGE (q159), one "
    "90% affected wants dynamic partition overwrite (q204's sink "
    "rule).  At 100 TB this report is the difference between "
    "recomputing 3 partitions and recomputing 3 years",
)
def q239(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    changed = c.filter(F.col("c_custkey") % 53 == 7).select(
        F.col("c_custkey").alias("ck")
    )
    marked = o.join(
        F.broadcast(changed), F.col("o_custkey") == F.col("ck"), "left"
    ).select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        (
            F.col("ck").isNotNull()
            & (
                F.col("o_orderdate")
                >= F.lit(_Q239_CHANGE_DATE).cast("timestamp")
            )
        ).alias("hit"),
    )
    parts = marked.groupBy("month").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_affected"),
    )
    return parts.filter(F.col("n_affected") > 0).select(
        "month",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_affected").cast("long").alias("n_affected"),
        F.expr("(CAST(n_affected AS DECIMAL(38,0)) * 1000000) div n_rows")  # div-ok: affected <= rows, quotient <= 1e6
        .cast("long")
        .alias("affected_ppm"),
    )


_Q240_W, _Q240_D = 256, 3


def _q240_oracle() -> str:
    from ..operators.sketch import count_min_cells_sql

    ca = count_min_cells_sql(
        "SELECT o_custkey AS k FROM orders", "k", _Q240_W, _Q240_D
    )
    cb = count_min_cells_sql(
        "SELECT user_id AS k FROM events", "k", _Q240_W, _Q240_D
    )
    return f"""WITH ca AS ({ca}), cb AS ({cb}),
       per_row AS (
          SELECT ca.row, sum(ca.cnt * cb.cnt) AS est
          FROM ca JOIN cb ON ca.row = cb.row AND ca.bucket = cb.bucket
          GROUP BY ca.row),
       est AS (SELECT min(est) AS cms_join_size FROM per_row),
       ta AS (SELECT o_custkey AS k, count(*) AS a FROM orders GROUP BY 1),
       tb AS (SELECT user_id AS k, count(*) AS b FROM events GROUP BY 1),
       tru AS (SELECT coalesce(sum(a * b), 0) AS true_join_size
               FROM ta JOIN tb USING (k))
       SELECT CAST(cms_join_size AS BIGINT) AS cms_join_size,
              CAST(true_join_size AS BIGINT) AS true_join_size,
              CAST((cms_join_size - true_join_size) * 1000000
                   // CASE WHEN true_join_size > 0 THEN true_join_size
                           ELSE 1 END AS BIGINT) AS overestimate_ppm
       FROM est CROSS JOIN tru"""


@register(
    "q240_cms_join_size_estimate",
    _q240_oracle(),
    "join-size estimation from Count-Min sketches (the AMS/CMS "
    "inner-product bound every cost-based optimizer wants): "
    "|A join B| = sum_k a_k*b_k is estimated by the minimum over "
    "depth rows of the sketch inner product sum_w cmsA[d][w]*"
    "cmsB[d][w] — each side summarized INDEPENDENTLY into 3x256 "
    "counters (one pass each, never scanned together), so the "
    "estimate is computable from sketches shipped by two different "
    "teams, pipelines, or datacenters.  CMS guarantees estimate >= "
    "truth (collisions only add), and because the counters use the "
    "md5 hash family the estimate is register-exact and oracle-gated "
    "bit-for-bit, q80-style — the exact join size (a key-cardinality-"
    "bounded aggregate join, q201's shape) rides along so the "
    "overestimate is measured, not assumed.  At 100 TB this answers "
    "'dare we run this join?' for the q235 advisor without either "
    "table's rows ever meeting",
)
def q240(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sketch import count_min_build

    o = load_table(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    ev = load_events_range(spark, sf).select(F.col("user_id").alias("k"))
    ca = count_min_build(o, "k", _Q240_W, _Q240_D)
    cb = count_min_build(ev, "k", _Q240_W, _Q240_D)
    per_row = (
        ca.alias("a")
        .join(
            cb.alias("b"),
            (F.col("a.row") == F.col("b.row"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .groupBy(F.col("a.row"))
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("est"))
    )
    est = per_row.agg(F.min("est").alias("cms_join_size"))
    ta = o.groupBy("k").agg(F.count("*").alias("a"))
    tb = ev.groupBy("k").agg(F.count("*").alias("b"))
    tru = (
        ta.join(tb, "k")
        .agg(
            F.coalesce(F.sum(F.col("a") * F.col("b")), F.lit(0)).alias(
                "true_join_size"
            )
        )
    )
    return est.crossJoin(F.broadcast(tru)).select(
        F.col("cms_join_size").cast("long").alias("cms_join_size"),
        F.col("true_join_size").cast("long").alias("true_join_size"),
        F.expr(
            "(CAST(cms_join_size - true_join_size AS DECIMAL(38,0))"
            " * 1000000) div "
            "(CASE WHEN true_join_size > 0 THEN true_join_size ELSE 1 END)"  # div-ok: CMS overshoot <= total rows ~1e11 at 100 TB, x1e6 = 1e17 < int64
        )
        .cast("long")
        .alias("overestimate_ppm"),
    )


@register(
    "q241_k_anonymity_audit",
    """WITH qi AS (
          SELECT c_nationkey AS nk, c_mktsegment AS seg,
                 CAST(floor(CAST(c_acctbal AS DECIMAL(18,2)) / 1000)
                      AS INTEGER) AS bal_band,
                 count(*) AS k
          FROM customer GROUP BY 1, 2, 3)
       SELECT CAST(nk AS INTEGER) AS nk, seg,
              CAST(bal_band AS INTEGER) AS bal_band,
              CAST(k AS BIGINT) AS k
       FROM qi WHERE k < 5""",
    "k-anonymity audit (the re-identification risk report behind "
    "every data-release review, complementing q152's PII scrub and "
    "q202's DSAR export): customers grouped by their quasi-identifier "
    "combination — nation x market segment x coarse balance band — "
    "and every combination with k < 5 members is emitted as a "
    "re-identification risk: those rows are linkable by an adversary "
    "holding only the quasi-identifiers.  One map-side-combinable "
    "aggregate over the column-pruned scan; the emitted rows ARE the "
    "suppression/generalization work list (widen the band or drop "
    "the cell).  The banding uses exact decimal floor division so "
    "band edges are engine-identical.  At 100 TB the QI aggregate is "
    "bounded by the QI domain, not the population — auditing a "
    "release costs one scan regardless of table size",
)
def q241(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    band = F.floor(F.col("c_acctbal").cast("decimal(18,2)") / 1000).cast(
        "int"
    )
    qi = (
        c.select(
            F.col("c_nationkey").alias("nk"),
            F.col("c_mktsegment").alias("seg"),
            band.alias("bal_band"),
        )
        .groupBy("nk", "seg", "bal_band")
        .agg(F.count("*").alias("k"))
    )
    return qi.filter(F.col("k") < 5).select(
        F.col("nk").cast("int").alias("nk"),
        "seg",
        F.col("bal_band").cast("int").alias("bal_band"),
        F.col("k").cast("long").alias("k"),
    )


@register(
    "q242_diff_in_diff",
    f"""WITH per AS (
          SELECT CAST({hex_hash64_sql("CAST(user_id AS VARCHAR)", salt="exp1")} % 2
                      AS INTEGER) AS arm,
                 ts >= TIMESTAMP '{_Q230_SPLIT}' AS post,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events),
       cell AS (
          SELECT arm, post, count(*) AS n, sum(cents) AS s
          FROM per GROUP BY 1, 2),
       wide AS (
          SELECT
            max(CASE WHEN arm = 1 AND post THEN s END) AS s11,
            max(CASE WHEN arm = 1 AND post THEN n END) AS n11,
            max(CASE WHEN arm = 1 AND NOT post THEN s END) AS s10,
            max(CASE WHEN arm = 1 AND NOT post THEN n END) AS n10,
            max(CASE WHEN arm = 0 AND post THEN s END) AS s01,
            max(CASE WHEN arm = 0 AND post THEN n END) AS n01,
            max(CASE WHEN arm = 0 AND NOT post THEN s END) AS s00,
            max(CASE WHEN arm = 0 AND NOT post THEN n END) AS n00
          FROM cell)
       SELECT CAST(n11 AS BIGINT) AS n_treat_post,
              CAST(n01 AS BIGINT) AS n_ctrl_post,
              floor((CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)
                     - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE))
                    * 1000000.0) / 1000000.0 AS treat_delta,
              floor((CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)
                     - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE))
                    * 1000000.0) / 1000000.0 AS ctrl_delta,
              floor(((CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)
                      - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE))
                     - (CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)
                        - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE)))
                    * 1000000.0) / 1000000.0 AS did_estimate
       FROM wide""",
    "difference-in-differences readout (the quasi-experimental "
    "counterpart of q230's CUPED): the 2x2 (arm x pre/post) cell "
    "table from ONE conditional aggregate over exact integer cents, "
    "then DiD = (treat post-pre delta) - (control post-pre delta), "
    "the estimator that removes both time trends and fixed arm "
    "differences.  Each cell mean is a single IEEE division of exact "
    "int64 sums, deltas compose with +/- only (the fp portability "
    "whitelist), floor6 quantized at the end.  Arms are q136's "
    "salted md5 parity, the split is q230's date — so CUPED and DiD "
    "read the same experiment and a platform can cross-check the "
    "estimators.  The 2x2 pivot is max(CASE...) over a 4-row "
    "aggregate — no window, no second scan",
)
def q242(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    split = _ts_lit(ev, "ts", _Q230_SPLIT)
    arm = (
        T.hex_hash64(F.col("user_id").cast("string"), salt="exp1") % 2
    ).cast("int")
    cell = (
        ev.select(
            arm.alias("arm"),
            (F.col("ts") >= split).alias("post"),
            cents.alias("cents"),
        )
        .groupBy("arm", "post")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("s"))
    )

    def pick(a: int, p: bool, col: str):
        return F.max(
            F.when((F.col("arm") == a) & (F.col("post") == p), F.col(col))
        )

    wide = cell.agg(
        pick(1, True, "s").alias("s11"),
        pick(1, True, "n").alias("n11"),
        pick(1, False, "s").alias("s10"),
        pick(1, False, "n").alias("n10"),
        pick(0, True, "s").alias("s01"),
        pick(0, True, "n").alias("n01"),
        pick(0, False, "s").alias("s00"),
        pick(0, False, "n").alias("n00"),
    )
    mean = lambda s, n: F.col(s).cast("double") / F.col(n).cast("double")
    treat_delta = mean("s11", "n11") - mean("s10", "n10")
    ctrl_delta = mean("s01", "n01") - mean("s00", "n00")
    return wide.select(
        F.col("n11").cast("long").alias("n_treat_post"),
        F.col("n01").cast("long").alias("n_ctrl_post"),
        floor6(treat_delta).alias("treat_delta"),
        floor6(ctrl_delta).alias("ctrl_delta"),
        floor6(treat_delta - ctrl_delta).alias("did_estimate"),
    )


#: content-derived tiebreak: (l_orderkey, l_linenumber) is NOT unique in
#: the testdata, and a non-total window order makes lag() engine-
#: dependent.  Remaining ties after the hash are byte-identical rows,
#: whose relative order cannot change any run or delta.
_Q243_OH = hex_hash64_sql(
    "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)"
    " || '|' || CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR)"
    " || '|' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)"
    " || '|' || CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)"
    " || '|' || l_returnflag || '|' || l_linestatus"
    " || '|' || CAST(date_diff('day', DATE '1992-01-01', l_shipdate) AS VARCHAR)"
)


def _q243_oracle() -> str:
    bits = "CASE WHEN {x} <= 0 THEN 0 ELSE length(printf('%b', {x})) END"
    blocks = []
    # (label, value expr as BIGINT-or-string, is_numeric)
    cols = [
        ("l_returnflag", "l_returnflag", False),
        ("l_orderkey", "l_orderkey", True),
        ("l_shipdate_days", "date_diff('day', DATE '1992-01-01', l_shipdate)", True),
    ]
    oh = _Q243_OH
    for label, expr, numeric in cols:
        delta = (
            f"SELECT max(abs(v - pv)) AS mad, max(v) AS mx FROM w WHERE pv IS NOT NULL"
            if numeric
            else "SELECT CAST(NULL AS BIGINT) AS mad, CAST(NULL AS BIGINT) AS mx"
        )
        vcast = f"CAST({expr} AS BIGINT)" if numeric else f"({expr})"
        blocks.append(f"""
        SELECT '{label}' AS col, n_rows, n_runs,
               CAST(n_runs * 1000000 // n_rows AS BIGINT) AS rle_ratio_ppm,
               CAST({bits.format(x='d.mx')} AS INTEGER) AS plain_bits,
               CAST({bits.format(x='d.mad')} AS INTEGER) AS delta_bits,
               CASE WHEN n_runs * 4 < n_rows THEN 'rle'
                    WHEN d.mad IS NOT NULL
                         AND {bits.format(x='d.mad')} * 2
                             <= {bits.format(x='d.mx')} THEN 'delta'
                    ELSE 'plain' END AS encoding
        FROM (
          SELECT count(*) AS n_rows,
                 count(*) FILTER (v IS DISTINCT FROM pv) AS n_runs
          FROM (SELECT v, lag(v) OVER (PARTITION BY fid
                        ORDER BY l_orderkey, l_linenumber, oh) AS pv
                FROM (SELECT {vcast} AS v, l_orderkey % 64 AS fid,
                             l_orderkey, l_linenumber, {oh} AS oh
                      FROM lineitem))
        ) r CROSS JOIN (
          {delta.replace('FROM w', '''FROM (SELECT v, lag(v) OVER (PARTITION BY fid
                        ORDER BY l_orderkey, l_linenumber, oh) AS pv
                FROM (SELECT ''' + vcast + ''' AS v, l_orderkey % 64 AS fid,
                             l_orderkey, l_linenumber, ''' + _Q243_OH + ''' AS oh
                      FROM lineitem))''')}
        ) d""")
    return "SELECT * FROM (" + "\nUNION ALL ".join(blocks) + ") t"


@register(
    "q243_encoding_advisor",
    _q243_oracle(),
    "columnar encoding advisor (the parquet/ORC physical-design "
    "decision, measured not guessed): for each audited column in the "
    "table's natural write order, the RLE run count and ratio, the "
    "plain bit width of the max value, and the delta bit width (bits "
    "of the max absolute successor delta) — then the verdict: RLE "
    "when runs < rows/4, delta when delta values need at most half "
    "the plain width, else plain.  Runs and deltas are computed "
    "WITHIN synthetic 64-way file groups (lag windows partitioned by "
    "file id — real encoders reset per row group, and the bounded "
    "partitions keep the window off the single-task trap).  Bit "
    "widths use the binary-string-length trick (fp log banned).  The "
    "three audited columns deliberately span the verdicts: a "
    "low-cardinality flag (RLE), a sorted key (delta), and a "
    "day-granular date.  At 100 TB this report drives file rewrite "
    "decisions (q226) — encoding chosen from measured runs, not "
    "column-type folklore",
)
def q243(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    days = F.datediff(
        F.col("l_shipdate"), F.lit("1992-01-01").cast("date")
    ).cast("long")
    oh = T.hex_hash64(
        F.concat_ws(
            "|",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_partkey").cast("string"),
            F.col("l_suppkey").cast("string"),
            F.col("l_quantity").cast("long").cast("string"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .cast("string"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
            days.cast("string"),
        )
    )
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey") % 64).alias("fid"),
        oh.alias("oh"),
        F.col("l_returnflag").alias("v_flag"),
        F.col("l_orderkey").cast("long").alias("v_key"),
        days.alias("v_days"),
    )
    w = Window.partitionBy("fid").orderBy(
        "l_orderkey", "l_linenumber", "oh"
    )

    def bits(col):
        return (
            F.when(col <= 0, 0)
            .otherwise(F.length(F.bin(col)))
            .cast("int")
        )

    # ONE window pass + ONE aggregate for all three advised columns,
    # unpivoted through a struct-array explode: the per-column loop
    # re-ran the scan + the fid sort/window once per column (r7
    # re-execution audit: lineitem scanned 3x) for what is a single
    # row-adjacency computation
    def runs(v, pv):
        return F.sum(
            F.when(~F.col(v).eqNullSafe(F.col(pv)), 1).otherwise(0)
        )

    lagged = base.select(
        "v_flag",
        "v_key",
        "v_days",
        F.lag("v_flag").over(w).alias("p_flag"),
        F.lag("v_key").over(w).alias("p_key"),
        F.lag("v_days").over(w).alias("p_days"),
    )
    wide = lagged.agg(
        F.count("*").alias("n_rows"),
        runs("v_flag", "p_flag").alias("runs_flag"),
        runs("v_key", "p_key").alias("runs_key"),
        runs("v_days", "p_days").alias("runs_days"),
        F.max(F.abs(F.col("v_key") - F.col("p_key"))).alias("mad_key"),
        F.max("v_key").alias("mx_key"),
        F.max(F.abs(F.col("v_days") - F.col("p_days"))).alias("mad_days"),
        F.max("v_days").alias("mx_days"),
    )
    nul = F.lit(None).cast("long")
    per_col = F.array(
        F.struct(
            F.lit("l_returnflag").alias("col"),
            F.col("runs_flag").cast("long").alias("n_runs"),
            nul.alias("mad"),
            nul.alias("mx"),
        ),
        F.struct(
            F.lit("l_orderkey").alias("col"),
            F.col("runs_key").cast("long").alias("n_runs"),
            F.col("mad_key").cast("long").alias("mad"),
            F.col("mx_key").cast("long").alias("mx"),
        ),
        F.struct(
            F.lit("l_shipdate_days").alias("col"),
            F.col("runs_days").cast("long").alias("n_runs"),
            F.col("mad_days").cast("long").alias("mad"),
            F.col("mx_days").cast("long").alias("mx"),
        ),
    )
    return (
        wide.select("n_rows", F.explode(per_col).alias("_c"))
        .select("n_rows", "_c.col", "_c.n_runs", "_c.mad", "_c.mx")
        .select(
            "col",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_runs").cast("long").alias("n_runs"),
            F.expr(
                "(CAST(n_runs AS DECIMAL(38,0)) * 1000000) div n_rows"  # div-ok: runs <= rows, quotient <= 1e6
            )
            .cast("long")
            .alias("rle_ratio_ppm"),
            bits(F.col("mx")).alias("plain_bits"),
            bits(F.col("mad")).alias("delta_bits"),
            F.when(F.col("n_runs") * 4 < F.col("n_rows"), "rle")
            .when(
                F.col("mad").isNotNull()
                & (bits(F.col("mad")) * 2 <= bits(F.col("mx"))),
                "delta",
            )
            .otherwise("plain")
            .alias("encoding"),
        )
    )


@register(
    "q244_stream_outer_join",
    f"""WITH ev AS (
          SELECT * FROM events
          WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
            AND ts < TIMESTAMP '2024-01-10 00:00:00'),
       c AS (SELECT event_id AS click_id, ts AS click_ts, user_id
             FROM ev WHERE event_type = 'click'),
       p AS (SELECT event_id AS purchase_id, ts AS purchase_ts, user_id
             FROM ev WHERE event_type = 'purchase'),
       j AS (
          SELECT c.user_id, c.click_id, c.click_ts,
                 p.purchase_id, p.purchase_ts
          FROM c LEFT JOIN p ON c.user_id = p.user_id
            AND p.purchase_ts >= c.click_ts
            AND p.purchase_ts <= c.click_ts + INTERVAL 2 HOUR)
       SELECT {day_str_sql('click_ts')} AS day,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(*) FILTER (purchase_id IS NULL) AS BIGINT)
                AS n_unmatched,
              CAST(bit_xor({hex_hash64_sql(
                  "CAST(click_id AS VARCHAR) || '|' || "
                  "coalesce(CAST(purchase_id AS VARCHAR), 'NULL')"
              )}) AS BIGINT) AS row_xor
       FROM j GROUP BY 1""",
    "stream-stream LEFT OUTER interval join (streaming/ingest.py:"
    "stream_stream_left_outer) — the watermark state machine q238's "
    "inner join avoids: unmatched clicks emit their null row ONLY "
    "when the watermark proves no qualifying purchase can still "
    "arrive, which makes null emission batching-dependent.  The "
    "staging pins it: all of January lands in ONE batch per side "
    "(splitting it under a 1-hour watermark would evict open state "
    "before matches arrived — divergence by construction), then two "
    "far-future advancer batches push the watermark past every "
    "January horizon AND give the engine the extra batch in which "
    "evicted state actually flushes (state transitions land one "
    "batch after the watermark that causes them — q192's measured "
    "rule).  Advancers are filtered out; every January click "
    "provably reached matched-or-null terminal state, so the sink "
    "equals the batch LEFT JOIN stated by the oracle, whose row_xor "
    "(null-sentinel pair hashes) flips on any lost match, duplicated "
    "null, or never-flushed click",
)
def q244(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.ingest import stream_stream_left_outer

    j = stream_stream_left_outer(spark, sf)
    row_h = T.hex_hash64(
        F.concat(
            F.col("click_id").cast("string"),
            F.lit("|"),
            F.coalesce(F.col("purchase_id").cast("string"), F.lit("NULL")),
        )
    )
    return (
        j.select("click_id", "click_ts", "purchase_id", row_h.alias("rh"))
        .groupBy(day_str("click_ts").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(
                F.when(F.col("purchase_id").isNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_unmatched"),
            F.expr("bit_xor(rh)").cast("long").alias("row_xor"),
        )
    )


def _q245_oracle() -> str:
    cents = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
    num = "(vn - vp) * (hidx - tp)"
    den = "(tn - tp)"
    interp = f"vp + (({num}) - ((({num}) % ({den})) + ({den})) % ({den})) // ({den})"
    return f"""WITH ev AS (
          SELECT event_type,
                 CAST(date_diff('hour',
                      TIMESTAMP '{WEEK_LO} 00:00:00', ts) AS BIGINT)
                   AS hidx,
                 {cents} AS cents
          FROM events
          WHERE ts >= TIMESTAMP '{WEEK_LO} 00:00:00'
            AND ts < TIMESTAMP '{WEEK_HI} 00:00:00'),
       grid AS (
          SELECT t.event_type, g.hidx, coalesce(a.s, 0) AS actual
          FROM (SELECT DISTINCT event_type FROM ev) t
          CROSS JOIN (SELECT unnest(range(168)) AS hidx) g
          LEFT JOIN (SELECT event_type, hidx, sum(cents) AS s
                     FROM ev GROUP BY 1, 2) a
            ON a.event_type = t.event_type AND a.hidx = g.hidx),
       masked AS (
          SELECT event_type, hidx, actual,
                 CASE WHEN hidx % 7 = 3 THEN NULL ELSE actual END AS v
          FROM grid),
       nb AS (
          SELECT event_type, hidx, actual, v,
                 last_value(v IGNORE NULLS) OVER wp AS vp,
                 last_value(CASE WHEN v IS NOT NULL THEN hidx END
                            IGNORE NULLS) OVER wp AS tp,
                 first_value(v IGNORE NULLS) OVER wn AS vn,
                 first_value(CASE WHEN v IS NOT NULL THEN hidx END
                             IGNORE NULLS) OVER wn AS tn
          FROM masked
          WINDOW wp AS (PARTITION BY event_type ORDER BY hidx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 wn AS (PARTITION BY event_type ORDER BY hidx
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
       it AS (
          SELECT event_type, hidx, actual, {interp} AS interp
          FROM nb WHERE v IS NULL)
       SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_masked,
              CAST(sum(abs(interp - actual)) AS BIGINT) AS sum_abs_err,
              CAST(sum(abs(interp - actual)) // count(*) AS BIGINT)
                AS mae_cents,
              CAST(bit_xor({hex_hash64_sql(
                  "CAST(hidx AS VARCHAR) || '|' || CAST(interp AS VARCHAR)"
              )}) AS BIGINT) AS interp_xor
       FROM it GROUP BY event_type"""


@register(
    "q245_linear_interpolation",
    _q245_oracle(),
    "time-series gap interpolation WITH a built-in accuracy eval: the "
    "hourly per-type revenue series over one week (q123's generated "
    "grid, explicit zeros) has every 7th hour MASKED — a simulated "
    "sensor outage whose ground truth we keep — and masked points are "
    "linearly interpolated between their nearest present neighbors "
    "using IGNORE-NULLS carry windows on the bounded (type x 168) "
    "grid: v = vp + floor((vn-vp)(t-tp)/(tn-tp)), sign-safe exact "
    "integer floor division because the series genuinely decreases.  "
    "Because the mask hides KNOWN values, the query reports the "
    "interpolation error (sum |err|, floor-mean MAE) per type plus a "
    "checksum of the interpolated series — the backfill-quality "
    "report a real gap-filling job should always emit instead of "
    "silently inventing data.  Aggregate-then-window throughout: raw "
    "events reduce to the grid before any window touches them",
)
def q245(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf, lo=WEEK_LO, hi=WEEK_HI)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    base_ts = F.lit(f"{WEEK_LO} 00:00:00").cast(dict(ev.dtypes)["ts"])
    hidx = F.floor(
        (F.unix_micros("ts") - F.unix_micros(base_ts)) / 3_600_000_000
    ).cast("long")
    actual = (
        ev.select("event_type", hidx.alias("hidx"), cents.alias("cents"))
        .groupBy("event_type", "hidx")
        .agg(F.sum("cents").alias("s"))
    )
    types = ev.select("event_type").distinct()
    grid = (
        types.crossJoin(
            F.broadcast(
                ev.sparkSession.range(168).select(
                    F.col("id").cast("long").alias("hidx")
                )
            )
        )
        .join(actual, ["event_type", "hidx"], "left")
        .select(
            "event_type",
            "hidx",
            F.coalesce(F.col("s"), F.lit(0)).alias("actual"),
        )
    )
    masked = grid.withColumn(
        "v",
        F.when(F.col("hidx") % 7 == 3, F.lit(None)).otherwise(
            F.col("actual")
        ),
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    present_h = F.when(F.col("v").isNotNull(), F.col("hidx"))
    nb = masked.select(
        "event_type",
        "hidx",
        "actual",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("vp"),
        F.last(present_h, ignorenulls=True).over(wp).alias("tp"),
        F.first("v", ignorenulls=True).over(wn).alias("vn"),
        F.first(present_h, ignorenulls=True).over(wn).alias("tn"),
    )
    it = nb.filter(F.col("v").isNull()).select(
        "event_type",
        "hidx",
        "actual",
        F.expr(
            "vp + ((vn - vp) * (hidx - tp)"
            " - pmod((vn - vp) * (hidx - tp), tn - tp)) div (tn - tp)"
        ).alias("interp"),
    )
    ih = T.hex_hash64(
        F.concat(
            F.col("hidx").cast("string"),
            F.lit("|"),
            F.col("interp").cast("string"),
        )
    )
    return (
        it.select(
            "event_type",
            F.abs(F.col("interp") - F.col("actual")).alias("err"),
            ih.alias("ih"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_masked"),
            F.sum("err").cast("long").alias("sum_abs_err"),
            F.expr("sum(err) div count(*)").cast("long").alias("mae_cents"),
            F.expr("bit_xor(ih)").cast("long").alias("interp_xor"),
        )
    )


@register(
    "q246_bitmap_index",
    """WITH bits AS (
          SELECT c_mktsegment AS seg, c_nationkey AS nk,
                 c_custkey // 32 AS word_id,
                 1 << (c_custkey % 32) AS bit
          FROM customer),
       seg_bm AS (
          SELECT seg, word_id, bit_or(bit) AS w
          FROM bits GROUP BY 1, 2),
       nat_bm AS (
          SELECT nk, word_id, bit_or(bit) AS w
          FROM bits GROUP BY 1, 2),
       inter AS (
          SELECT s.seg, n.nk,
                 sum(bit_count(s.w & n.w)) AS bm_count
          FROM seg_bm s JOIN nat_bm n USING (word_id)
          GROUP BY 1, 2),
       exact AS (
          SELECT c_mktsegment AS seg, c_nationkey AS nk, count(*) AS c
          FROM customer GROUP BY 1, 2)
       SELECT i.seg, CAST(i.nk AS INTEGER) AS nk,
              CAST(i.bm_count AS BIGINT) AS bm_count,
              CAST(e.c AS BIGINT) AS exact_count,
              i.bm_count = e.c AS parity
       FROM inter i JOIN exact e ON i.seg = e.seg AND i.nk = e.nk
       WHERE i.bm_count > 0""",
    "bitmap-index build and word-aligned intersection (the roaring-"
    "bitmap acceleration pattern OLAP engines use for multi-predicate "
    "counts): customers pack into 32-bit words (word = key div 32, "
    "bit = key mod 32 — 63-bit shifts overflow SIGNED int64 in both "
    "engines, so the packing stays in the safe half), one bitmap per market segment and one per "
    "nation via the commutative bit_or aggregate — bitmaps are "
    "mergeable the way sketches are, but EXACT.  The (segment AND "
    "nation) membership count is then sum(bit_count(a & b)) over a "
    "word-aligned equi-join: the shuffle carries one word per 32 "
    "members (a 32x compression of the intersection problem), and no "
    "customer row is touched after the build.  The exact per-cell "
    "count rides along and every parity bit must read true — the "
    "differential proves the packed representation IS the set.  At "
    "100 TB this is how 'how many rows match segment=X AND "
    "nation=Y AND ...' answers in milliseconds from pre-built "
    "bitmaps: ANDs compose word-wise without rescanning anything",
)
def q246(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    bits = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nk"),
        F.expr("c_custkey div 32").alias("word_id"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(c_custkey % 32 AS INT))")
        .alias("bit"),
    )
    seg_bm = bits.groupBy("seg", "word_id").agg(
        F.expr("bit_or(bit)").alias("sw")
    )
    nat_bm = bits.groupBy("nk", "word_id").agg(
        F.expr("bit_or(bit)").alias("nw")
    )
    inter = (
        seg_bm.join(nat_bm, "word_id")
        .groupBy("seg", "nk")
        .agg(F.sum(F.bit_count(F.expr("sw & nw"))).alias("bm_count"))
        .filter(F.col("bm_count") > 0)
    )
    exact = c.groupBy(
        F.col("c_mktsegment").alias("seg"), F.col("c_nationkey").alias("nk")
    ).agg(F.count("*").alias("c"))
    return inter.join(exact, ["seg", "nk"]).select(
        "seg",
        F.col("nk").cast("int").alias("nk"),
        F.col("bm_count").cast("long").alias("bm_count"),
        F.col("c").cast("long").alias("exact_count"),
        (F.col("bm_count") == F.col("c")).alias("parity"),
    )


_Q247_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


@register(
    "q247_cohort_ltv_curve",
    f"""WITH firsts AS (
          SELECT o_custkey AS ck,
                 min(strftime(o_orderdate, '%Y-%m')) AS cohort
          FROM orders GROUP BY 1),
       rev AS (
          SELECT f.cohort,
                 (CAST(substr(strftime(o_orderdate, '%Y-%m'), 1, 4) AS BIGINT)
                  - CAST(substr(f.cohort, 1, 4) AS BIGINT)) * 12
                 + CAST(substr(strftime(o_orderdate, '%Y-%m'), 6, 2) AS BIGINT)
                 - CAST(substr(f.cohort, 6, 2) AS BIGINT) AS age,
                 {_Q247_CENTS} AS cents
          FROM orders JOIN firsts f ON o_custkey = f.ck),
       sizes AS (SELECT cohort, count(*) AS n_custs FROM firsts GROUP BY 1),
       monthly AS (
          SELECT cohort, age, sum(cents) AS mcents
          FROM rev GROUP BY 1, 2),
       cum AS (
          SELECT cohort, age, mcents,
                 sum(mcents) OVER (PARTITION BY cohort ORDER BY age)
                   AS cum_cents
          FROM monthly)
       SELECT cohort, CAST(age AS INTEGER) AS age,
              CAST(cum_cents AS BIGINT) AS cum_cents,
              CAST(n_custs AS BIGINT) AS n_custs,
              CAST(cum_cents // n_custs AS BIGINT) AS ltv_per_cust_cents
       FROM cum JOIN sizes USING (cohort)
       WHERE age <= 12""",
    "cohort lifetime-value curves (the unit-economics readout behind "
    "every growth model): customers cohorted by first-order month, "
    "revenue bucketed by cohort AGE in months, cumulative per-cohort "
    "revenue and exact floor per-customer LTV at each age up to 12.  "
    "The raw orders scan reduces to the (cohort x age) grain BEFORE "
    "the cumulative window runs (aggregate-then-window; partitions "
    "bounded by the calendar, never the customer count), the first-"
    "order table is one min-aggregate, and cohort sizes attach via a "
    "cohort-cardinality broadcast.  Month arithmetic is pure string/"
    "integer (engine date-diff 'month' semantics differ; substring "
    "math does not).  Ages clip at 12 to keep the report the "
    "familiar triangle.  At 100 TB: two shuffles (first-order, "
    "cohort-age aggregate), windows over calendar-sized groups",
)
def q247(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    month = F.date_format("o_orderdate", "yyyy-MM")
    firsts = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.min(month).alias("cohort")
    )
    ym = lambda c: (
        F.substring(c, 1, 4).cast("long") * 12
        + F.substring(c, 6, 2).cast("long")
    )
    rev = (
        o.join(firsts, F.col("o_custkey") == F.col("ck"))
        .select(
            "cohort",
            (ym(month) - ym(F.col("cohort"))).alias("age"),
            cents.alias("cents"),
        )
        .groupBy("cohort", "age")
        .agg(F.sum("cents").alias("mcents"))
    )
    sizes = firsts.groupBy("cohort").agg(F.count("*").alias("n_custs"))
    wc = Window.partitionBy("cohort").orderBy("age")
    cum = rev.withColumn("cum_cents", F.sum("mcents").over(wc))
    return (
        cum.join(F.broadcast(sizes), "cohort")
        .filter(F.col("age") <= 12)
        .select(
            "cohort",
            F.col("age").cast("int").alias("age"),
            F.col("cum_cents").cast("long").alias("cum_cents"),
            F.col("n_custs").cast("long").alias("n_custs"),
            F.expr("cum_cents div n_custs")
            .cast("long")
            .alias("ltv_per_cust_cents"),
        )
    )


@register(
    "q248_ma_crossover_signals",
    f"""WITH daily AS (
          SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                 sum({_Q247_CENTS}) AS cents
          FROM orders GROUP BY 1),
       ma AS (
          SELECT day, cents,
                 sum(cents) OVER (ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s7,
                 count(*) OVER (ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n7,
                 sum(cents) OVER (ORDER BY day
                   ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS s28,
                 count(*) OVER (ORDER BY day
                   ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS n28
          FROM daily),
       st AS (
          SELECT day, cents,
                 s7 * n28 - s28 * n7 AS diff_num,
                 lag(s7 * n28 - s28 * n7) OVER (ORDER BY day) AS prev_num,
                 n7 = 7 AND n28 = 28 AS warm
          FROM ma)
       SELECT day, CAST(cents AS BIGINT) AS cents,
              CASE WHEN diff_num > 0 AND prev_num <= 0 THEN 'golden'
                   ELSE 'death' END AS signal
       FROM st
       WHERE warm
         AND ((diff_num > 0 AND prev_num <= 0)
              OR (diff_num < 0 AND prev_num >= 0))""",
    "moving-average crossover detector (the 7/28-day trend-shift "
    "signal, the integer-exact form of the 50/200 golden cross): "
    "daily revenue in exact cents, short and long rolling sums over "
    "ROWS frames, and the comparison mean7 vs mean28 done as the "
    "cross-multiplication s7*n28 - s28*n7 — NO division anywhere, so "
    "sign changes are exact and the signal cannot flicker from fp "
    "rounding.  A signal fires only on an actual sign crossing "
    "(lag of the same integer) and only once both windows are warm "
    "(partial windows lie).  Everything beyond the daily aggregate "
    "runs on the calendar-bounded frame — the window never sees raw "
    "orders.  The single-partition day window is the documented "
    "aggregate-then-window exception: its input is one row per day "
    "at any corpus scale",
)
def q248(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    daily = (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
            cents.alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    w28 = Window.orderBy("day").rowsBetween(-27, 0)
    ma = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w7).alias("s7"),
        F.count("*").over(w7).alias("n7"),
        F.sum("cents").over(w28).alias("s28"),
        F.count("*").over(w28).alias("n28"),
    )
    wl = Window.orderBy("day")
    num = F.col("s7") * F.col("n28") - F.col("s28") * F.col("n7")
    st = ma.select(
        "day",
        "cents",
        num.alias("diff_num"),
        F.lag(num).over(wl).alias("prev_num"),
        ((F.col("n7") == 7) & (F.col("n28") == 28)).alias("warm"),
    )
    return (
        st.filter(
            F.col("warm")
            & (
                ((F.col("diff_num") > 0) & (F.col("prev_num") <= 0))
                | ((F.col("diff_num") < 0) & (F.col("prev_num") >= 0))
            )
        )
        .select(
            "day",
            F.col("cents").cast("long").alias("cents"),
            F.when(
                (F.col("diff_num") > 0) & (F.col("prev_num") <= 0), "golden"
            )
            .otherwise("death")
            .alias("signal"),
        )
    )


@register(
    "q249_abc_classification",
    """WITH rev AS (
          SELECT l_partkey AS pk,
                 sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS cents
          FROM lineitem GROUP BY 1),
       tot AS (SELECT sum(cents) AS t FROM rev),
       cum AS (
          SELECT pk, cents,
                 sum(cents) OVER (ORDER BY cents DESC, pk) AS cum_incl
          FROM rev),
       classed AS (
          SELECT pk, cents,
                 CASE WHEN cum_incl * 5 <= 4 * t THEN 'A'
                      WHEN cum_incl * 20 <= 19 * t THEN 'B'
                      ELSE 'C' END AS cls
          FROM cum CROSS JOIN tot)
       SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
              CAST(sum(cents) AS BIGINT) AS cls_cents,
              CAST(sum(cents) * 1000000 // (SELECT t FROM tot) AS BIGINT)
                AS share_ppm
       FROM classed GROUP BY cls""",
    "ABC / Pareto inventory classification (the 80/15/5 revenue-"
    "concentration triage): parts ranked by exact revenue cents, "
    "classed by INCLUSIVE cumulative share — A while cum <= 80% of "
    "total, B while <= 95%, C after — with both thresholds as exact "
    "integer cross-multiplications (cum*5 <= 4*total), never a "
    "percentage division.  The Spark side computes the global "
    "cumulative sum with operators/topk.py:global_running_sum (range "
    "partition + per-partition exclusive sums + broadcast offsets; "
    "the q236-hardened operator), because the part catalog at 100 TB "
    "is tens of millions of rows — a bare Window.orderBy would "
    "funnel them through one task.  Totals attach via broadcast "
    "1-row cross join.  Output: three rows the supply-chain team "
    "actually reads, each with exact class revenue and floor-ppm "
    "share",
)
def q249(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "long"
    )
    rev = (
        li.select(F.col("l_partkey").alias("pk"), cents.alias("cents"))
        .groupBy("pk")
        .agg(F.sum("cents").alias("cents"))
    )
    tot = rev.agg(F.sum("cents").alias("t"))
    cum = K.global_running_sum(
        rev, [F.desc("cents"), F.asc("pk")], "cents", out_col="cum_before"
    ).withColumn("cum_incl", F.col("cum_before") + F.col("cents"))
    # decimal(38,0) intermediates throughout: cum*20 and class_cents*1e6
    # wrap int64 at ~10x sf0.1 (caught by registry_stress, the q149
    # overflow class); DuckDB's sum() is HUGEINT natively
    dec = "decimal(38,0)"
    classed = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.when(F.col("cum_incl").cast(dec) * 5 <= 4 * F.col("t").cast(dec), "A")
        .when(
            F.col("cum_incl").cast(dec) * 20 <= 19 * F.col("t").cast(dec),
            "B",
        )
        .otherwise("C")
        .alias("cls"),
        "t",
    )
    return classed.groupBy("cls").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("cls_cents"),
        F.expr(
            "(CAST(sum(cents) AS DECIMAL(38,0)) * 1000000) div max(t)"  # div-ok: class share of grand total, quotient <= 1e6
        )
        .cast("long")
        .alias("share_ppm"),
    )


def _q250_oracle() -> str:
    sig_exprs = ",\n".join(
        f"         list_min(list_transform(t, x -> {hex_hash64_sql('x', f'mh{i}')})) AS sig{i}"
        for i in range(8)
    )

    def band(b: int, lo: int) -> str:
        concat = " || ',' || ".join(
            f"CAST(sig{j} AS VARCHAR)" for j in range(lo, lo + 4)
        )
        return f"SELECT doc_id, md5('{b},' || {concat}) AS bucket FROM sigs"

    sh = T.token_shingles_sql("text", 3)
    return f"""WITH toks AS (
          SELECT doc_id, list_distinct({sh}) AS t
          FROM documents),
       exact AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM toks a JOIN toks b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.t, b.t)) * 2
                >= len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))
            AND len(a.t) + len(b.t) > 0),
       sigs AS (SELECT doc_id,\n{sig_exprs}\n  FROM toks),
       bands AS ({band(0, 0)} UNION ALL {band(1, 4)}),
       capped AS (SELECT doc_id, bucket FROM (
            SELECT doc_id, bucket,
                   count(*) OVER (PARTITION BY bucket) AS bn
            FROM bands) WHERE bn <= 50),
       cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM capped a JOIN capped b
                   ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
       lsh AS (
          SELECT c.id_a, c.id_b
          FROM cands c
          JOIN toks ta ON c.id_a = ta.doc_id
          JOIN toks tb ON c.id_b = tb.doc_id
          WHERE len(list_intersect(ta.t, tb.t)) * 2
                >= len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t))
            AND len(ta.t) + len(tb.t) > 0),
       j AS (
          SELECT e.id_a, e.id_b, l.id_a IS NOT NULL AS hit
          FROM exact e LEFT JOIN lsh l
            ON e.id_a = l.id_a AND e.id_b = l.id_b)
       SELECT CAST(count(*) AS BIGINT) AS n_exact,
              CAST((SELECT count(*) FROM lsh) AS BIGINT) AS n_lsh,
              CAST(count(*) FILTER (NOT hit) AS BIGINT) AS n_missed,
              CAST(count(*) FILTER (hit) * 1000000
                   // CASE WHEN count(*) > 0 THEN count(*) ELSE 1 END
                   AS BIGINT) AS recall_ppm,
              (SELECT count(*) FROM lsh)
                = count(*) FILTER (hit) AS lsh_subset_of_exact
       FROM j"""


@register(
    "q250_lsh_recall_eval",
    _q250_oracle(),
    "MinHash-LSH recall evaluation against the exact truth (the dedup "
    "counterpart of q209's ANN recall, closing the loop on the q51 "
    "family): the exact >=50%-Jaccard pair set comes from the scale-"
    "safe prefix-filter join (q141's operator — the oracle states the "
    "O(n^2) scan), the LSH arm runs the production 8-hash/2-band/"
    "bucket-cap-50 pipeline with the same exact integer verification, "
    "and the report gives n_exact, n_lsh, missed pairs, floor-ppm "
    "recall, and the structural invariant that verified LSH pairs are "
    "a SUBSET of the exact set (precision 1 by construction — "
    "banding can only miss, never invent).  This is the table that "
    "justifies an LSH parameter choice at 100 TB: recall measured "
    "against ground truth at audit scale, cost measured by the "
    "candidate count, both pinned by the differential",
)
def q250(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    # 3-shingle sets, NOT whole-token sets: the 31-word vocabulary makes
    # token sets near-identical across the corpus, which degenerates the
    # prefix filter into an all-pairs verify (measured 150 s at sf0.1);
    # shingles are high-cardinality, the q141 regime, and similarity
    # defined over them is the unit production dedup actually uses
    toks = docs.select(
        "doc_id", F.array_distinct(T.token_shingles("text", 3)).alias("s")
    )
    exact = D.prefix_filter_jaccard_pairs(
        toks, set_col="s", id_col="doc_id", threshold_pct=50
    ).select("id_a", "id_b")
    lsh = D.lsh_near_dup_pairs(
        docs,
        band_size=4,
        num_hashes=8,
        min_jaccard=0.5,
        max_bucket=50,
        shingle_k=3,
    ).select("id_a", "id_b")
    j = exact.join(
        lsh.withColumn("hit", F.lit(True)), ["id_a", "id_b"], "left"
    ).select(F.coalesce(F.col("hit"), F.lit(False)).alias("hit"))
    n_lsh = lsh.agg(F.count("*").alias("n_lsh"))
    return (
        j.agg(
            F.count("*").cast("long").alias("n_exact"),
            F.sum(F.when(~F.col("hit"), 1).otherwise(0))
            .cast("long")
            .alias("n_missed"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_hit"),
        )
        .crossJoin(F.broadcast(n_lsh))
        .select(
            "n_exact",
            F.col("n_lsh").cast("long").alias("n_lsh"),
            "n_missed",
            F.expr(
                "(CAST(n_hit AS DECIMAL(38,0)) * 1000000) div "
                "(CASE WHEN n_exact > 0 THEN n_exact ELSE 1 END)"  # div-ok: recall, n_hit <= n_exact, quotient <= 1e6
            )
            .cast("long")
            .alias("recall_ppm"),
            (F.col("n_lsh") == F.col("n_hit")).alias(
                "lsh_subset_of_exact"
            ),
        )
    )


@register(
    "q251_conversion_lag_quantiles",
    f"""WITH ev AS (
          SELECT * FROM events
          WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
            AND ts < TIMESTAMP '2024-02-01 00:00:00'),
       c AS (SELECT event_id AS click_id, ts AS click_ts, user_id
             FROM ev WHERE event_type = 'click'),
       p AS (SELECT ts AS purchase_ts, user_id
             FROM ev WHERE event_type = 'purchase'),
       conv AS (
          SELECT c.click_id, {day_str_sql('c.click_ts')} AS day,
                 min(epoch_us(p.purchase_ts) - epoch_us(c.click_ts))
                   AS lag_us
          FROM c JOIN p ON c.user_id = p.user_id
            AND p.purchase_ts >= c.click_ts
            AND p.purchase_ts <= c.click_ts + INTERVAL 2 HOUR
          GROUP BY 1, 2),
       per AS (SELECT day, lag_us, count(*) AS w FROM conv GROUP BY 1, 2),
       cum AS (
          SELECT day, lag_us,
                 sum(w) OVER (PARTITION BY day ORDER BY lag_us) AS cw,
                 sum(w) OVER (PARTITION BY day) AS tot
          FROM per),
       p50 AS (SELECT day, min(lag_us) AS p50_us, max(tot) AS n_conv
               FROM cum WHERE cw * 2 >= tot GROUP BY day),
       p90 AS (SELECT day, min(lag_us) AS p90_us
               FROM cum WHERE cw * 10 >= 9 * tot GROUP BY day)
       SELECT p50.day, CAST(n_conv AS BIGINT) AS n_conv,
              CAST(p50_us AS BIGINT) AS p50_us,
              CAST(p90_us AS BIGINT) AS p90_us
       FROM p50 JOIN p90 ON p50.day = p90.day""",
    "time-to-convert quantiles (the funnel-latency SLO): each click's "
    "FIRST qualifying purchase within 2h (min-aggregate over the "
    "interval join — the attribution rule, not an arbitrary pick), "
    "then exact per-day p50/p90 of the conversion lag in microseconds "
    "via two calls to the two-phase grouped weighted quantile "
    "(profile.grouped_weighted_quantile — bin-locate then refine, no "
    "whole-group window on the engine side; the oracle states the "
    "naive cumulative-window definition).  The interval join is the "
    "batch twin of q238's stream-stream join, so the lag distribution "
    "measured here is exactly what the streaming pipeline would "
    "produce — one definition, two execution modes.  At 100 TB: one "
    "user-keyed interval join, quantiles over per-(day, lag) "
    "aggregates",
)
def q251(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profile import grouped_weighted_quantiles

    ev = load_events_range(spark, sf, lo="2024-01-01", hi="2024-02-01")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id").alias("cu"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("purchase_ts"), F.col("user_id").alias("pu")
    )
    conv = (
        c.join(
            p,
            (F.col("cu") == F.col("pu"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 2 HOURS")
            ),
        )
        .groupBy("click_id", day_str("click_ts").alias("day"))
        .agg(
            F.min(
                F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
            ).alias("lag_us")
        )
        .withColumn("w", F.lit(1))
    )
    # ONE locate + ONE refine pass for both percentiles; n_conv is the
    # quantile pass's own total_weight (w = 1), so the conversion
    # range-join executes exactly twice — the per-quantile gwq calls
    # plus a separate count re-ran it 5x (r7 re-execution audit)
    q = grouped_weighted_quantiles(
        conv, "day", "lag_us", "w", {"p50": (1, 2), "p90": (9, 10)}
    )
    return q.groupBy("day").agg(
        F.max("total_weight").cast("long").alias("n_conv"),
        F.min(F.when(F.col("q") == "p50", F.col("quantile_value")))
        .cast("long")
        .alias("p50_us"),
        F.min(F.when(F.col("q") == "p90", F.col("quantile_value")))
        .cast("long")
        .alias("p90_us"),
    )


@register(
    "q252_bitmap_rolling_distinct",
    """WITH ev AS (
          SELECT date_diff('day', DATE '2024-01-01', ts) AS d, user_id
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
            AND ts < TIMESTAMP '2024-02-01 00:00:00'),
       daily AS (
          SELECT DISTINCT d, user_id // 32 AS word_id,
                 1 << (user_id % 32) AS bit
          FROM ev),
       words AS (
          SELECT d, word_id, bit_or(bit) AS w FROM daily GROUP BY 1, 2),
       days AS (SELECT DISTINCT d FROM ev),
       served AS (
          SELECT unnest(range(d, d + 7)) AS sd, word_id, w FROM words),
       merged AS (
          SELECT sd, word_id, bit_or(w) AS w
          FROM served JOIN days ON served.sd = days.d GROUP BY 1, 2),
       bm AS (
          SELECT sd, sum(bit_count(w)) AS bm_distinct,
                 count(*) AS n_words
          FROM merged GROUP BY sd),
       exact AS (
          SELECT sd, count(DISTINCT user_id) AS exact_distinct
          FROM (SELECT DISTINCT unnest(range(d, d + 7)) AS sd, user_id
                FROM ev) e
          JOIN days ON e.sd = days.d GROUP BY sd)
       SELECT CAST(bm.sd AS BIGINT) AS day_idx,
              CAST(bm_distinct AS BIGINT) AS bm_distinct,
              CAST(exact_distinct AS BIGINT) AS exact_distinct,
              bm_distinct = exact_distinct AS parity,
              CAST(n_words AS BIGINT) AS n_words
       FROM bm JOIN exact ON bm.sd = exact.sd""",
    "EXACT rolling 7-day distinct users via mergeable bitmaps — the "
    "deterministic sibling of q203's HLL registers and the windowed "
    "application of q246's packing: daily per-user presence packs "
    "into 32-bit words (one word per 32 users via commutative "
    "bit_or), and the rolling window is a word-wise OR-merge of the "
    "tiny daily word tables — a bounded 7x replication of words, "
    "never of events, exactly q203's serve-day shape.  popcount over "
    "the merged words IS the distinct count: exact, mergeable, "
    "re-shardable, at 32x key compression.  The brute-force rolling "
    "distinct rides along and every parity bit must read true.  The "
    "honest tradeoff vs HLL: bitmap state grows with the KEY RANGE "
    "(words ~ max_id/32) while HLL stays at 64 registers — which is "
    "why warehouses use bitmaps for dense integer keys and sketches "
    "for open domains; this registry now demonstrates both ends",
)
def q252(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(
        spark, sf, lo="2024-01-01", hi="2024-02-01"
    ).select(
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")).alias("d"),
        "user_id",
    )
    daily = ev.select(
        "d",
        F.expr("user_id div 32").alias("word_id"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))")
        .alias("bit"),
    ).distinct()
    words = daily.groupBy("d", "word_id").agg(
        F.expr("bit_or(bit)").alias("w")
    )
    days = ev.select("d").distinct()
    served = words.select(
        F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("sd"),
        "word_id",
        "w",
    )
    merged = (
        served.join(F.broadcast(days.withColumnRenamed("d", "sd")), "sd")
        .groupBy("sd", "word_id")
        .agg(F.expr("bit_or(w)").alias("w"))
    )
    bm = merged.groupBy("sd").agg(
        F.sum(F.bit_count("w")).alias("bm_distinct"),
        F.count("*").alias("n_words"),
    )
    exact = (
        ev.select(
            F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("sd"),
            "user_id",
        )
        .distinct()
        .join(F.broadcast(days.withColumnRenamed("d", "sd")), "sd")
        .groupBy("sd")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return bm.join(exact, "sd").select(
        F.col("sd").cast("long").alias("day_idx"),
        F.col("bm_distinct").cast("long").alias("bm_distinct"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        (F.col("bm_distinct") == F.col("exact_distinct")).alias("parity"),
        F.col("n_words").cast("long").alias("n_words"),
    )


_Q253_CUTOFF = "1997-01-01"


@register(
    "q253_retention_sweep_plan",
    f"""WITH hold AS (
          SELECT c_custkey FROM customer WHERE c_custkey % 211 = 13),
       parts AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 count(*) AS n_rows,
                 count(*) FILTER (
                   o_custkey IN (SELECT c_custkey FROM hold)) AS n_held
          FROM orders
          WHERE o_orderdate < TIMESTAMP '{_Q253_CUTOFF}'
          GROUP BY 1)
       SELECT month, CAST(n_rows AS BIGINT) AS n_rows,
              CAST(n_held AS BIGINT) AS n_held,
              CAST(n_rows - n_held AS BIGINT) AS n_droppable,
              n_held = 0 AS whole_partition_drop
       FROM parts""",
    "retention/TTL compliance sweep plan (the GDPR storage-limitation "
    "twin of q239's backfill planner): every order month-partition "
    "older than the retention cutoff, its row count, the rows pinned "
    "by LEGAL HOLD (a deterministic subject set, carried as a "
    "broadcast semi-join inside the same conditional aggregate), and "
    "the droppable remainder.  whole_partition_drop marks partitions "
    "with zero held rows — those delete as O(1) partition drops, "
    "while mixed partitions need the q159 MERGE-delete path; that "
    "split IS the cost model of a compliance sweep at 100 TB (drop "
    "the directory vs rewrite the partition).  The cutoff predicate "
    "prunes every in-retention partition at the scan, so sweep cost "
    "scales with the EXPIRED fraction, not table size",
)
def q253(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    hold = c.filter(F.col("c_custkey") % 211 == 13).select(
        F.col("c_custkey").alias("hk")
    )
    marked = (
        o.filter(F.col("o_orderdate") < F.lit(_Q253_CUTOFF).cast("timestamp"))
        .join(F.broadcast(hold), F.col("o_custkey") == F.col("hk"), "left")
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.col("hk").isNotNull().alias("held"),
        )
    )
    return (
        marked.groupBy("month")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("held"), 1).otherwise(0)).alias("n_held"),
        )
        .select(
            "month",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_held").cast("long").alias("n_held"),
            (F.col("n_rows") - F.col("n_held"))
            .cast("long")
            .alias("n_droppable"),
            (F.col("n_held") == 0).alias("whole_partition_drop"),
        )
    )


#: candidate functional dependencies (lhs -> rhs) over the joined
#: order/customer frame and the part table
_Q254_CANDS = [
    ("orders_cust", "o_custkey", "c_mktsegment"),  # holds (FK)
    ("orders_cust", "o_custkey", "o_orderstatus"),  # fails (many orders)
    ("part", "p_brand", "p_type"),  # fails
    ("part", "p_partkey", "p_type"),  # holds (key)
]


def _q254_oracle() -> str:
    blocks = []
    for src, lhs, rhs in _Q254_CANDS:
        rel = (
            "(SELECT o_custkey, o_orderstatus, c_mktsegment FROM orders"
            " JOIN customer ON o_custkey = c_custkey)"
            if src == "orders_cust"
            else "part"
        )
        blocks.append(f"""
        SELECT '{src}' AS rel, '{lhs}' AS lhs, '{rhs}' AS rhs,
               count(*) AS n_lhs_values,
               count(*) FILTER (n_rhs > 1) AS n_violating,
               count(*) FILTER (n_rhs > 1) = 0 AS fd_holds
        FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS n_rhs
              FROM {rel} GROUP BY {lhs})""")
    return "SELECT * FROM (" + " UNION ALL ".join(blocks) + ") t"


@register(
    "q254_fd_discovery",
    _q254_oracle(),
    "functional-dependency audit (the data-profiling step schema "
    "designers and dedup pipelines both need: does A determine B?): "
    "for each candidate lhs -> rhs, the number of lhs values, the "
    "count violating the dependency (more than one distinct rhs), "
    "and the verdict — over both a base table and a joined relation, "
    "because the interesting FDs (customer key determines segment) "
    "only exist across the FK.  Each candidate is one "
    "count-distinct-per-group aggregate, map-side combinable, "
    "output bounded by lhs cardinality; the four candidates are "
    "chosen so both verdicts appear (two hold — a key and an FK-"
    "implied dependency — and two genuinely fail).  FD discovery at "
    "100 TB is how you find merge keys, detect denormalization "
    "drift, and validate that an upsert key actually identifies rows",
)
def q254(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    part = load_table(spark, sf, "part")
    oc = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_custkey", "o_orderstatus", "c_mktsegment"
    )
    rels = {"orders_cust": oc, "part": part}
    frames = []
    for src, lhs, rhs in _Q254_CANDS:
        per = (
            rels[src]
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("n_rhs"))
        )
        frames.append(
            per.agg(
                F.count("*").alias("n_lhs_values"),
                F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).alias(
                    "n_violating"
                ),
            ).select(
                F.lit(src).alias("rel"),
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.col("n_lhs_values").cast("long").alias("n_lhs_values"),
                F.col("n_violating").cast("long").alias("n_violating"),
                (F.col("n_violating") == 0).alias("fd_holds"),
            )
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out


def _q255_oracle() -> str:
    h1 = hex_hash64_sql("CAST(doc_id AS VARCHAR)", salt="ann1")
    h2 = hex_hash64_sql("CAST(doc_id AS VARCHAR)", salt="ann2")
    return f"""WITH lab AS (
          SELECT doc_id,
                 CAST({h1} % 3 AS INTEGER) AS a1,
                 CAST(CASE WHEN {h2} % 5 = 0
                      THEN ({h1} + 1) % 3
                      ELSE {h1} % 3 END AS INTEGER) AS a2
          FROM documents),
       conf AS (
          SELECT a1, a2, count(*) AS n FROM lab GROUP BY 1, 2),
       m1 AS (SELECT a1 AS k, sum(n) AS c1 FROM conf GROUP BY 1),
       m2 AS (SELECT a2 AS k, sum(n) AS c2 FROM conf GROUP BY 1),
       tot AS (SELECT sum(n) AS n FROM conf),
       agree AS (SELECT sum(n) AS ag FROM conf WHERE a1 = a2),
       pe AS (SELECT sum(c1 * c2) AS e
              FROM m1 JOIN m2 USING (k))
       SELECT CAST(n AS BIGINT) AS n_docs,
              CAST(ag AS BIGINT) AS n_agree,
              CAST(ag * 1000000 // n AS BIGINT) AS po_ppm,
              CAST(e * 1000000 // (n * n) AS BIGINT) AS pe_ppm,
              CAST((ag * n - e) * 1000000 // (n * n - e) AS BIGINT)
                AS kappa_ppm
       FROM tot CROSS JOIN agree CROSS JOIN pe"""


@register(
    "q255_annotator_agreement",
    _q255_oracle(),
    "inter-annotator agreement (Cohen's kappa) — the labeling-QA gate "
    "every supervised training corpus needs before its labels are "
    "trusted: two deterministic annotators over the documents (the "
    "second disagrees on an engineered ~20% of items), the full "
    "confusion aggregate, observed agreement po, chance agreement pe "
    "from the marginals, and kappa — computed ENTIRELY in exact "
    "integer rationals: kappa = (agree*n - sum(c1k*c2k)) / (n^2 - "
    "sum(c1k*c2k)), floor-ppm at the end, no fp anywhere (the "
    "textbook po/pe division chain would drift across engines).  The "
    "confusion matrix is one |classes|^2 aggregate, marginals "
    "re-aggregate it, and the three scalar frames meet by broadcast "
    "cross join.  At 100 TB annotation QA runs per labeling batch; "
    "this is one map-side-combined pass regardless of corpus size",
)
def q255(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    h1 = T.hex_hash64(F.col("doc_id").cast("string"), salt="ann1")
    h2 = T.hex_hash64(F.col("doc_id").cast("string"), salt="ann2")
    lab = d.select(
        (h1 % 3).cast("int").alias("a1"),
        F.when((h2 % 5) == 0, (h1 + 1) % 3)
        .otherwise(h1 % 3)
        .cast("int")
        .alias("a2"),
    )
    # The label domain is FIXED (hash % 3 by construction), so the
    # whole confusion matrix fits in ONE aggregate row — the marginal /
    # total / agree branches previously collapsed the groupBy into
    # per-branch direct aggregates over the corpus (r7 re-execution
    # audit: documents scanned 4x).  Every kappa term is then a pure
    # expression over the 9 cells + marginals of that single row.
    cell = [
        F.sum(
            ((F.col("a1") == i) & (F.col("a2") == j)).cast("long")
        ).alias(f"n_{i}{j}")
        for i in range(3)
        for j in range(3)
    ]
    wide = lab.agg(F.count("*").alias("n"), *cell)
    ag_expr = sum(F.col(f"n_{k}{k}") for k in range(3))
    # marginal products in DECIMAL(38,0) from birth: c1*c2 ~ (n/3)^2
    # wraps int64 past n ~ 1e10 rows (the q149/q166 overflow class)
    pe_expr = sum(
        sum(F.col(f"n_{k}{j}") for j in range(3)).cast("decimal(38,0)")
        * sum(F.col(f"n_{i}{k}") for i in range(3))
        for k in range(3)
    )
    onerow = wide.select("n", ag_expr.alias("ag"), pe_expr.alias("e"))
    return (
        onerow
        .select(
            F.col("n").cast("long").alias("n_docs"),
            F.col("ag").cast("long").alias("n_agree"),
            # decimal(38,0) intermediates: n^2 and sum(c1*c2) pass int64
            # around n ~ 3e9 rows (the q149/q166 overflow class); DuckDB
            # promotes to HUGEINT natively
            F.expr("(CAST(ag AS DECIMAL(38,0)) * 1000000) div n")  # div-ok: agree <= n, quotient <= 1e6
            .cast("long")
            .alias("po_ppm"),
            F.expr(
                "(CAST(e AS DECIMAL(38,0)) * 1000000)"
                " div (CAST(n AS DECIMAL(38,0)) * n)"  # div-ok: e <= n^2, quotient <= 1e6
            )
            .cast("long")
            .alias("pe_ppm"),
            F.expr(
                "((CAST(ag AS DECIMAL(38,0)) * n - e) * 1000000)"
                " div (CAST(n AS DECIMAL(38,0)) * n - e)"  # div-ok: hash-mod-3 annotators keep e ~ n^2/3, so |kappa_ppm| <= ~3e6
            )
            .cast("long")
            .alias("kappa_ppm"),
        )
    )


def _q256_oracle() -> str:
    h = hex_hash64_sql("CAST(user_id AS VARCHAR)", salt="score")
    return f"""WITH users AS (
          SELECT user_id,
                 CAST(({h} % 1000) // 100 AS INTEGER) AS bucket,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS outcome
          FROM events GROUP BY user_id),
       b AS (
          SELECT bucket, count(*) AS n, sum(outcome) AS pos
          FROM users GROUP BY bucket),
       tot AS (SELECT sum(n) AS nn FROM b),
       scored AS (
          SELECT bucket, n, pos,
                 CAST(pos * 1000000 // n AS BIGINT) AS acc_ppm,
                 CAST(50000 + bucket * 100000 AS BIGINT) AS conf_ppm,
                 abs(pos * 1000000 - (50000 + bucket * 100000) * n)
                   AS dev
          FROM b),
       ece AS (SELECT sum(dev) // (SELECT nn FROM tot) AS e FROM scored)
       SELECT CAST(bucket AS INTEGER) AS bucket,
              CAST(n AS BIGINT) AS n_users,
              CAST(pos AS BIGINT) AS n_pos,
              acc_ppm, conf_ppm,
              CAST((SELECT e FROM ece) AS BIGINT) AS ece_ppm
       FROM scored"""


@register(
    "q256_score_calibration",
    _q256_oracle(),
    "model-score calibration table + expected calibration error (the "
    "model-monitoring artifact that catches silent drift): a "
    "deterministic per-user 'model score' (hash permille — i.e. an "
    "UNcalibrated model, so the report genuinely shows "
    "miscalibration) bucketed into deciles against the realized "
    "purchase outcome; per bucket the exact accuracy in floor-ppm "
    "beside the bucket-midpoint confidence, and ECE computed as pure "
    "integer arithmetic — sum |pos*1e6 - conf*n| over buckets "
    "divided by N, no fp: the per-bucket deviation keeps the exact "
    "rational |acc - conf|*n form with denominators cleared.  One "
    "per-user aggregate, one 10-row bucket table, scalars by "
    "broadcast.  At 100 TB calibration runs per model release; the "
    "differential pins the whole table, so a pipeline change that "
    "shifts any bucket is a hash mismatch, not a drifting dashboard",
)
def q256(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    h = T.hex_hash64(F.col("user_id").cast("string"), salt="score")
    users = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("outcome")
        )
        .select(
            # (h % 1000) < 1000 is exact in double; toward-zero cast ==
            # floor for non-negative values
            ((h % 1000) / 100).cast("int").alias("bucket"),
            "outcome",
        )
    )
    b = users.groupBy("bucket").agg(
        F.count("*").alias("n"), F.sum("outcome").alias("pos")
    )
    tot = b.agg(F.sum("n").alias("nn"))
    scored = b.select(
        "bucket",
        "n",
        "pos",
        F.expr("(CAST(pos AS DECIMAL(38,0)) * 1000000) div n")  # div-ok: pos <= n, quotient <= 1e6
        .cast("long")
        .alias("acc_ppm"),
        (F.lit(50000) + F.col("bucket") * 100000)  # ppm-ok: bucket <= 9, literal conf midpoint stays < 1e6
        .cast("long")
        .alias("conf_ppm"),
        F.abs(
            F.expr("CAST(pos AS DECIMAL(38,0)) * 1000000")
            - (F.lit(50000) + F.col("bucket") * 100000) * F.expr("CAST(n AS DECIMAL(38,0))")  # ppm-ok: both terms routed through DECIMAL(38,0)
        ).alias("dev"),
    )
    ece = scored.agg(F.sum("dev").alias("sd")).crossJoin(
        F.broadcast(tot)
    ).select(F.expr("sd div nn").cast("long").alias("ece_ppm"))
    return scored.crossJoin(F.broadcast(ece)).select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("n").cast("long").alias("n_users"),
        F.col("pos").cast("long").alias("n_pos"),
        "acc_ppm",
        "conf_ppm",
        "ece_ppm",
    )


@register(
    "q257_ledger_reconciliation",
    """WITH detail AS (
          SELECT l_orderkey AS ok,
                 sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS line_cents
          FROM lineitem GROUP BY 1),
       rec AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS hdr_cents,
                 d.line_cents
          FROM orders o LEFT JOIN detail d ON o.o_orderkey = d.ok)
       SELECT month,
              CAST(count(*) AS BIGINT) AS n_orders,
              CAST(count(*) FILTER (line_cents IS NULL) AS BIGINT)
                AS n_headers_without_lines,
              CAST(count(*) FILTER (line_cents = hdr_cents) AS BIGINT)
                AS n_reconciled,
              CAST(sum(hdr_cents) AS BIGINT) AS sum_hdr_cents,
              CAST(coalesce(sum(line_cents), 0) AS BIGINT)
                AS sum_line_cents,
              CAST(sum(hdr_cents) - coalesce(sum(line_cents), 0)
                   AS BIGINT) AS delta_cents
       FROM rec GROUP BY month""",
    "ledger-vs-detail reconciliation (the month-end close job every "
    "finance warehouse runs: do order headers equal the sum of their "
    "lines?): per order-month, header count, headers with NO detail "
    "rows, exactly-reconciled count, and the exact cent totals of "
    "both sides with their delta.  On this synthetic data the books "
    "deliberately do NOT reconcile — header totals are independent "
    "of line sums — and the report says so precisely, which is the "
    "point: a recon job's output is evidence either way, and exact "
    "integer cents make 'reconciled' a decidable predicate instead "
    "of an epsilon argument.  One detail aggregate (map-side "
    "combined at order-key grain), one left join, one month rollup; "
    "at 100 TB the join key is the natural order clustering so "
    "detail partials co-locate with headers",
)
def q257(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    lcents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "long"
    )
    hcents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    detail = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.sum(lcents).alias("line_cents")
    )
    rec = o.join(detail, F.col("o_orderkey") == F.col("ok"), "left").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        hcents.alias("hdr_cents"),
        "line_cents",
    )
    return rec.groupBy("month").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.when(F.col("line_cents").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_headers_without_lines"),
        F.sum(
            F.when(F.col("line_cents") == F.col("hdr_cents"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_reconciled"),
        F.sum("hdr_cents").cast("long").alias("sum_hdr_cents"),
        F.coalesce(F.sum("line_cents"), F.lit(0))
        .cast("long")
        .alias("sum_line_cents"),
        (F.sum("hdr_cents") - F.coalesce(F.sum("line_cents"), F.lit(0)))
        .cast("long")
        .alias("delta_cents"),
    )


@register(
    "q258_burst_detection",
    """WITH ev AS (
          SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
          FROM events),
       burst AS (
          SELECT user_id,
                 count(*) OVER (PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS c
          FROM ev),
       peak AS (
          SELECT user_id, max(c) AS max_burst FROM burst GROUP BY 1),
       ranked AS (
          SELECT user_id, max_burst,
                 row_number() OVER (ORDER BY max_burst DESC, user_id)
                   AS rk
          FROM peak)
       SELECT CAST(user_id AS BIGINT) AS user_id,
              CAST(max_burst AS BIGINT) AS max_burst,
              CAST(rk AS INTEGER) AS rk
       FROM ranked WHERE rk <= 20""",
    "burst / rate-anomaly detection (the abuse-and-bot screen): each "
    "user's peak trailing-one-hour event count via a RANGE window "
    "over epoch seconds — RANGE (not ROWS) makes same-second events "
    "order-independent, so the count is deterministic under any "
    "intra-second tie order, which a ROWS frame cannot promise — "
    "then the top-20 burstiest users.  The window partitions by "
    "user (each user's history fits a task; the q121/q147 per-key "
    "contract) and the global top-20 runs on the one-row-per-user "
    "peak table.  At 100 TB this is the query behind rate-limit "
    "tuning (q151's debounce picks up the flagged keys) and "
    "credential-stuffing triage; the trailing-window form needs no "
    "session state and recomputes incrementally per partition-day",
)
def q258(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf).select(
        "user_id",
        (F.unix_micros("ts") / 1_000_000).cast("long").alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3599, 0)
    )
    burst = ev.select("user_id", F.count("*").over(w).alias("c"))
    peak = burst.groupBy("user_id").agg(F.max("c").alias("max_burst"))
    ranked = K.top_k(
        peak, [F.desc("max_burst"), F.asc("user_id")], 20
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.desc("max_burst"), F.asc("user_id"))
        ),
    )
    return ranked.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("max_burst").cast("long").alias("max_burst"),
        F.col("rk").cast("int").alias("rk"),
    )


def _q259_oracle() -> str:
    from ..functions.vector import int8_quantize_sql

    return f"""WITH q AS (
          SELECT vec_id, {int8_quantize_sql('embedding')} AS qv
          FROM embeddings)
       SELECT CAST(count(*) AS BIGINT) AS n_vecs,
              CAST(sum(list_sum(qv)) AS BIGINT) AS sum_components,
              CAST(bit_xor({hex_hash64_sql(
                  "CAST(vec_id AS VARCHAR) || '|' || array_to_string(qv, ',')"
              )}) AS BIGINT) AS content_xor
       FROM q"""


@register(
    "q259_pandas_udf_parity",
    _q259_oracle(),
    "Arrow scalar pandas_udf parity (completing the §2.6 UDF "
    "taxonomy: mapInPandas (q53/q193/q222), applyInPandas (q90), "
    "applyInPandasWithState (q56) — and now the vectorized SCALAR "
    "pandas_udf): int8 symmetric quantization re-implemented as a "
    "batched numpy kernel over Arrow-transferred embedding arrays, "
    "and the oracle states the pure-SQL quantization rule — so the "
    "Python kernel is proven bit-identical to the relational "
    "definition (count, component sum, and a per-vector content "
    "xor that flips on any element diverging).  This is the "
    "contract every Python hot-path extension must meet before it "
    "ships: same math as the declarative form, Arrow-batched so "
    "the interchange cost is columnar, and differential-gated.  "
    "The built-in expression (functions/vector.py) remains the "
    "production path; the UDF exists to prove the extension seam "
    "works",
)
def q259(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    def one(v):
        import numpy as np

        # mirror functions/vector.py:int8_quantize EXACTLY, op by op:
        # scale = 127.0 / max|x| first (one IEEE divide), then
        # floor(x * scale), then clamp to [-127, 127] — the same
        # double-rounding sequence the JVM expression performs, so the
        # outputs are bit-identical, not merely close
        a = np.asarray(v, dtype=np.float64)
        m = np.abs(a).max() if len(a) else 0.0
        # zero-vector guard mirrors functions/vector.py: divisor 1.0
        # when max|x|==0 -> floor(0*127)=0 per element (the unguarded
        # 127.0/0.0 path yields 0*inf=NaN and int(NaN) raises)
        scale = np.float64(127.0) / (m if m != 0.0 else np.float64(1.0))
        q = np.floor(a * scale)
        return [int(x) for x in np.clip(q, -127, 127)]

    # annotation-free lambda: this module uses `from __future__ import
    # annotations`, which turns `pd.Series` hints into strings the
    # pandas_udf signature resolver rejects; the lambda form selects
    # the legacy Series->Series SCALAR path explicitly
    q_int8 = pandas_udf(
        lambda col: col.map(one), ArrayType(IntegerType())
    )

    e = load_table(spark, sf, "embeddings").select(
        "vec_id", q_int8("embedding").alias("qv")
    )
    h = T.hex_hash64(
        F.concat(
            F.col("vec_id").cast("string"),
            F.lit("|"),
            F.array_join(F.transform("qv", lambda x: x.cast("string")), ","),
        )
    )
    return e.select(
        "vec_id",
        F.expr("aggregate(qv, CAST(0 AS BIGINT), (a, x) -> a + x)").alias(
            "cs"
        ),
        h.alias("h"),
    ).agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum("cs").cast("long").alias("sum_components"),
        F.expr("bit_xor(h)").cast("long").alias("content_xor"),
    )


@register(
    "q260_hierarchy_rollup",
    """WITH nodes AS (
          SELECT p_partkey AS pk,
                 CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM part),
       anc AS (
          SELECT unnest(list_distinct(
                   list_transform(range(0, 21),
                     i -> pk // (CAST(1 AS BIGINT) << (2 * i)))))
                   AS ancestor,
                 cents
          FROM nodes)
       SELECT CAST(ancestor AS BIGINT) AS ancestor,
              CAST(count(*) AS BIGINT) AS n_nodes,
              CAST(sum(cents) AS BIGINT) AS subtree_cents
       FROM anc WHERE ancestor <= 15 GROUP BY ancestor""",
    "hierarchical (bill-of-materials / org-chart) subtree rollup "
    "WITHOUT joins, iteration, or recursion: the part hierarchy is "
    "the 4-ary tree parent(p) = p div 4, so a node's ancestor at "
    "height i is the CLOSED FORM p div 4^i with 4^i = 1 << 2i — "
    "pure integer arithmetic.  Every node explodes to its <= "
    "log4(maxkey) distinct ancestors (a bounded per-row array "
    "expression, ~21 entries covers 10^12 keys) and one groupBy "
    "sums each subtree: total cost O(n log n) rows through one "
    "map-side-combined aggregate, versus the level-by-level join "
    "iteration (depth shuffles) or the recursive CTE (which Spark "
    "lacks).  Reported for the top three levels (ancestor <= 15).  "
    "Encoded-path hierarchies (materialized-path, Dewey order) get "
    "the same treatment at 100 TB: ancestor enumeration beats "
    "self-joins whenever the hierarchy is addressable arithmetically",
)
def q260(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part")
    cents = (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
    nodes = p.select(F.col("p_partkey").alias("pk"), cents.alias("cents"))
    anc = nodes.select(
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(0, 20),"
                " i -> pk div shiftleft(CAST(1 AS BIGINT), 2 * i)))"
            )
        ).alias("ancestor"),
        "cents",
    )
    return (
        anc.filter(F.col("ancestor") <= 15)
        .groupBy("ancestor")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum("cents").cast("long").alias("subtree_cents"),
        )
    )


_Q261_THRESHOLDS = [50, 70, 90]


def _q261_oracle() -> str:
    tiers = ", ".join(str(t) for t in _Q261_THRESHOLDS)
    flags = ",\n".join(
        f"                 max(CASE WHEN inter * 100 >= {t} * un"
        f" THEN 1 ELSE 0 END) AS q{t}"
        for t in _Q261_THRESHOLDS
    )
    pair_counts = ",\n".join(
        f"            count(*) FILTER (inter * 100 >= {t} * un)"
        f" AS p{t}"
        for t in _Q261_THRESHOLDS
    )
    tier_rows = " UNION ALL ".join(
        f"""SELECT {t} AS threshold_pct,
               (SELECT p{t} FROM pc) AS n_pairs,
               (SELECT count(*) FROM flags WHERE q{t} = 1) AS n_removed,
               (SELECT coalesce(sum(tok), 0) FROM flags
                JOIN toks ON flags.b = toks.doc_id
                WHERE q{t} = 1) AS tokens_removed"""
        for t in _Q261_THRESHOLDS
    )
    sh = T.token_shingles_sql("text", 3)
    return f"""WITH toks AS (
          SELECT doc_id, list_distinct({sh}) AS s,
                 len(string_split(text, ' ')) AS tok
          FROM documents),
       pairs AS (
          SELECT a.doc_id AS a, b.doc_id AS b,
                 len(list_intersect(a.s, b.s)) AS inter,
                 len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS un
          FROM toks a JOIN toks b ON a.doc_id < b.doc_id
          WHERE len(a.s) + len(b.s) > 0
            AND len(list_intersect(a.s, b.s)) * 100
                >= {min(_Q261_THRESHOLDS)} *
                   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))),
       pc AS (SELECT\n{pair_counts}\n          FROM pairs),
       flags AS (
          SELECT b,\n{flags}
          FROM pairs GROUP BY b),
       tot AS (SELECT sum(tok) AS corpus_tokens FROM toks)
       SELECT threshold_pct, CAST(n_pairs AS BIGINT) AS n_pairs,
              CAST(n_removed AS BIGINT) AS n_removed,
              CAST(tokens_removed AS BIGINT) AS tokens_removed,
              CAST(tokens_removed * 1000000 // corpus_tokens AS BIGINT)
                AS removed_ppm
       FROM ({tier_rows}) s CROSS JOIN tot"""


@register(
    "q261_dedup_threshold_sweep",
    _q261_oracle(),
    "dedup-policy ROI sweep (the decision table behind 'which Jaccard "
    "threshold do we ship?'): for thresholds 50/70/90%, the exact "
    "qualifying pair count, the documents removed under the greedy "
    "min-id keeper rule (drop any doc with a qualifying neighbor of "
    "smaller id — pair-local, needs NO connected components, and is "
    "exactly the rule q180's ingest gate applies), and the token mass "
    "removed in floor-ppm of the corpus.  The Spark side computes the "
    "pair set ONCE with the scale-safe prefix filter at the loosest "
    "threshold and derives the tighter tiers by exact integer "
    "re-thresholding of the same (inter, union) pairs — one similarity "
    "join feeds the whole sweep, versus re-running it per candidate "
    "policy.  The oracle states each tier independently from the "
    "O(n^2) scan.  This is how a 100 TB dedup threshold is actually "
    "chosen: measure the removal curve at audit scale, then run the "
    "one selected threshold in production",
)
def q261(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    # 3-shingle similarity for the same reason as q250: whole-token
    # sets over the tiny vocabulary defeat the prefix filter
    toks = docs.select(
        "doc_id",
        F.array_distinct(T.token_shingles("text", 3)).alias("s"),
        T.token_count("text").alias("tok"),
    )
    pairs = D.prefix_filter_jaccard_pairs(
        toks.select("doc_id", "s"),
        set_col="s",
        id_col="doc_id",
        threshold_pct=min(_Q261_THRESHOLDS),
    ).localCheckpoint()
    tot = toks.agg(F.sum("tok").alias("corpus_tokens"))
    frames = []
    for t in _Q261_THRESHOLDS:
        qual = pairs.filter(F.col("inter") * 100 >= t * F.col("un"))
        removed = qual.select(F.col("id_b").alias("doc_id")).distinct()
        stats = (
            removed.join(toks.select("doc_id", "tok"), "doc_id")
            .agg(
                F.count("*").alias("n_removed"),
                F.coalesce(F.sum("tok"), F.lit(0)).alias("tokens_removed"),
            )
            .crossJoin(F.broadcast(qual.agg(F.count("*").alias("n_pairs"))))
        )
        frames.append(
            stats.select(
                F.lit(t).alias("threshold_pct"),
                F.col("n_pairs").cast("long").alias("n_pairs"),
                F.col("n_removed").cast("long").alias("n_removed"),
                F.col("tokens_removed").cast("long").alias("tokens_removed"),
            )
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out.crossJoin(F.broadcast(tot)).select(
        "threshold_pct",
        "n_pairs",
        "n_removed",
        "tokens_removed",
        F.expr(
            "(CAST(tokens_removed AS DECIMAL(38,0)) * 1000000)"
            " div corpus_tokens"  # div-ok: removed <= corpus, quotient <= 1e6
        )
        .cast("long")
        .alias("removed_ppm"),
    )


#: literal inverse-propensity micro-weights per display position 1..10:
#: floor(1e6 * log2(pos+1)) — examination probability modeled as
#: 1/log2(pos+1), so the IPS weight is its reciprocal; literals keep
#: log out of both engines (the q232 discount-table rule).
_Q262_IPS = [
    1000000, 1584962, 2000000, 2321928, 2584962,
    2807354, 3000000, 3169925, 3321928, 3459431,
]


def _q262_oracle() -> str:
    h = hex_hash64_sql("CAST(event_id AS VARCHAR)", salt="pos")
    w_rows = ", ".join(f"({i + 1}, {w})" for i, w in enumerate(_Q262_IPS))
    return f"""WITH imp AS (
          SELECT event_id, user_id, ts,
                 CAST(1 + {h} % 10 AS INTEGER) AS pos
          FROM events WHERE event_type = 'view'),
       clk AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
       joined AS (
          SELECT i.event_id, i.pos,
                 max(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS clicked
          FROM imp i LEFT JOIN clk c
            ON c.user_id = i.user_id
            AND c.ts >= i.ts
            AND c.ts <= i.ts + INTERVAL 10 MINUTE
          GROUP BY 1, 2),
       weights (pos, w) AS (VALUES {w_rows}),
       agg AS (
          SELECT pos, count(*) AS n_views, sum(clicked) AS n_clicked,
                 sum(clicked * w) AS ips_clicks_micro
          FROM joined JOIN weights USING (pos) GROUP BY pos)
       SELECT CAST(pos AS INTEGER) AS pos,
              CAST(n_views AS BIGINT) AS n_views,
              CAST(n_clicked AS BIGINT) AS n_clicked,
              CAST(n_clicked * 1000000 // n_views AS BIGINT) AS ctr_ppm,
              CAST(ips_clicks_micro // n_views AS BIGINT)
                AS ips_ctr_ppm
       FROM agg"""


@register(
    "q262_position_bias_ips",
    _q262_oracle(),
    "position-bias correction via inverse propensity scoring (the "
    "counterfactual-learning primitive behind every learning-to-rank "
    "training set): view impressions get a deterministic display "
    "position, a click within 10 minutes by the same user marks "
    "engagement (exists-style left join + max, so multiple clicks "
    "count once), and per position the raw CTR sits beside the "
    "IPS-corrected CTR — clicks reweighted by literal 1/propensity "
    "micro-weights with examination modeled as 1/log2(pos+1).  The "
    "weights are precomputed literals shipped identically to both "
    "engines (log is off the fp whitelist, q232's rule), so the "
    "debiased estimate is pure integer arithmetic.  Raw CTR declines "
    "with position while IPS-CTR flattens toward the position-free "
    "rate — the exact correction a ranker's training labels need.  "
    "One interval join keyed on user, one 10-row weight broadcast",
)
def q262(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events_range(spark, sf)
    h = T.hex_hash64(F.col("event_id").cast("string"), salt="pos")
    imp = ev.filter(F.col("event_type") == "view").select(
        "event_id",
        F.col("user_id").alias("iu"),
        F.col("ts").alias("its"),
        (1 + h % 10).cast("int").alias("pos"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    joined = (
        imp.join(
            clk,
            (F.col("iu") == F.col("cu"))
            & (F.col("cts") >= F.col("its"))
            & (F.col("cts") <= F.col("its") + F.expr("INTERVAL 10 MINUTES")),
            "left",
        )
        .groupBy("event_id", "pos")
        .agg(
            F.max(
                F.when(F.col("cu").isNotNull(), 1).otherwise(0)
            ).alias("clicked")
        )
    )
    weights = spark.createDataFrame(
        [(i + 1, w) for i, w in enumerate(_Q262_IPS)], "pos int, w long"
    )
    return (
        joined.join(F.broadcast(weights), "pos")
        .groupBy("pos")
        .agg(
            F.count("*").alias("n_views"),
            F.sum("clicked").alias("n_clicked"),
            F.sum(F.col("clicked") * F.col("w")).alias("ipsm"),
        )
        .select(
            F.col("pos").cast("int").alias("pos"),
            F.col("n_views").cast("long").alias("n_views"),
            F.col("n_clicked").cast("long").alias("n_clicked"),
            F.expr(
                "(CAST(n_clicked AS DECIMAL(38,0)) * 1000000) div n_views"  # div-ok: CTR, clicked <= views, quotient <= 1e6
            )
            .cast("long")
            .alias("ctr_ppm"),
            F.expr("ipsm div n_views").cast("long").alias("ips_ctr_ppm"),
        )
    )


@register(
    "q263_bucketed_join_exchange_free",
    """SELECT o_orderstatus AS status,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
              CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                   AS BIGINT)) AS BIGINT) AS sum_cents,
              TRUE AS exchange_free
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       GROUP BY o_orderstatus""",
    "co-bucketed big x big join with the ZERO-EXCHANGE plan pinned by "
    "the differential (sources/bucketed.py): orders and lineitem are "
    "written as catalog tables bucketed AND sorted on the order key, "
    "broadcast is disabled, and the recurring join compiles to a "
    "SortMergeJoin with NO Exchange on either side — the physical "
    "property that makes a repeated 100 TB fact-fact join shuffle-"
    "free forever after one bucketed write.  The exchange_free column "
    "is measured from the EXECUTED plan (both 'Exchange' absence and "
    "SortMergeJoin presence) and the oracle states TRUE, so a "
    "regression that silently reintroduces a shuffle — a bucket-count "
    "mismatch, a lost sort spec, an optimizer change — flips the "
    "differential, not just a perf chart.  The join result itself is "
    "checksummed against the plain-join oracle (per-status counts and "
    "exact sums).  Result is localCheckpointed so the scratch "
    "database can be dropped before returning",
)
def q263(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile
    import uuid

    from ..sources.bucketed import cobucketed_join, write_bucketed

    db = f"bdemo_{uuid.uuid4().hex[:8]}"
    loc = tempfile.mkdtemp(prefix="hdt_bucket_")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        orders = load_table(spark, sf, "orders").select(
            F.col("o_orderkey").alias("orderkey"), "o_orderstatus"
        )
        lineitem = load_table(spark, sf, "lineitem").select(
            F.col("l_orderkey").alias("orderkey"),
            "l_quantity",
            "l_extendedprice",
        )
        write_bucketed(orders, f"{db}.orders_b", ["orderkey"], 8, ["orderkey"])
        write_bucketed(
            lineitem, f"{db}.lineitem_b", ["orderkey"], 8, ["orderkey"]
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = cobucketed_join(
            spark, f"{db}.orders_b", f"{db}.lineitem_b", ["orderkey"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        exchange_free = ("Exchange" not in plan) and ("SortMergeJoin" in plan)
        cents = (
            F.col("l_extendedprice").cast("decimal(18,2)") * 100
        ).cast("long")
        out = (
            joined.groupBy(F.col("o_orderstatus").alias("status"))
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.col("l_quantity").cast("long"))
                .cast("long")
                .alias("sum_qty"),
                F.sum(cents).cast("long").alias("sum_cents"),
            )
            .withColumn("exchange_free", F.lit(exchange_free))
            .localCheckpoint()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    return out


@register(
    "q264_approx_percentile_gate",
    """WITH ev AS (
          SELECT event_type,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM events),
       per AS (
          SELECT event_type, cents, count(*) AS w
          FROM ev GROUP BY 1, 2),
       cum AS (
          SELECT event_type, cents,
                 sum(w) OVER (PARTITION BY event_type ORDER BY cents)
                   AS cw,
                 sum(w) OVER (PARTITION BY event_type) AS tot
          FROM per)
       SELECT event_type,
              CAST(min(cents) AS BIGINT) AS exact_p95_cents,
              CAST(max(tot) AS BIGINT) AS n_rows,
              TRUE AS approx_within_bound
       FROM cum WHERE cw * 100 >= 95 * tot
       GROUP BY event_type""",
    "accuracy-gated approximate percentile (the q81-HLL pattern "
    "applied to Spark's percentile_approx / Greenwald-Khanna sketch): "
    "the sketch's p95 estimate is partition-order-dependent and so "
    "never oracle-portable — but its CONTRACT is: the returned value's "
    "true rank lies within n/accuracy of the target rank.  The query "
    "computes the exact p95 via the two-phase grouped quantile, the "
    "approx p95 via percentile_approx(accuracy=100), then verifies "
    "the approx value's exact rank against the guarantee (an exact "
    "integer comparison over the same cumulative aggregate) and emits "
    "the boolean — deterministically TRUE while the sketch honors its "
    "bound, failing loudly the day it does not.  Approximate "
    "quantiles are the only way to get p95s over 10^12 rows in one "
    "pass; gating them against exact math at audit scale is how you "
    "earn the right to trust them at 100 TB",
)
def q264(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profile import grouped_weighted_quantile

    ev = load_events_range(spark, sf)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    base = ev.select("event_type", cents.alias("cents")).withColumn(
        "w", F.lit(1)
    )
    exact = grouped_weighted_quantile(
        base, "event_type", "cents", "w", q_num=95, q_den=100
    ).select(
        "event_type",
        F.col("quantile_value").alias("exact_p95_cents"),
        F.col("total_weight").alias("n_rows"),
    )
    approx = base.groupBy("event_type").agg(
        F.percentile_approx("cents", 0.95, 100).alias("ap")
    )
    # exact rank of the approx value: rows <= ap, via one conditional agg
    ranked = (
        base.join(F.broadcast(approx), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cents") <= F.col("ap"), 1).otherwise(0)
            ).alias("rank_of_ap"),
            F.count("*").alias("n"),
        )
    )
    gate = ranked.select(
        "event_type",
        (
            (F.col("rank_of_ap") * 100 >= 95 * F.col("n") - F.col("n"))
            & (
                (F.col("rank_of_ap") - 1) * 100
                <= 95 * F.col("n") + F.col("n")
            )
        ).alias("approx_within_bound"),
    )
    return exact.join(gate, "event_type").select(
        "event_type",
        F.col("exact_p95_cents").cast("long").alias("exact_p95_cents"),
        F.col("n_rows").cast("long").alias("n_rows"),
        "approx_within_bound",
    )


def _q265_oracle() -> str:
    ha = hex_hash64_sql(
        "'crA' || '|' || CAST(c_custkey AS VARCHAR)"
    )
    hb = hex_hash64_sql(
        "'crA' || '|' || CAST(user_id AS VARCHAR)"
    )
    return f"""WITH pa AS (
          SELECT {ha} AS token, c_mktsegment AS seg FROM customer),
       pb AS (
          SELECT DISTINCT {hb} AS token, event_type FROM events),
       cells AS (
          SELECT seg, event_type, count(*) AS n_matched
          FROM pa JOIN pb USING (token) GROUP BY 1, 2)
       SELECT seg, event_type, CAST(n_matched AS BIGINT) AS n_matched
       FROM cells WHERE n_matched >= 5"""


@register(
    "q265_clean_room_join",
    _q265_oracle(),
    "data clean-room join (the privacy-preserving ad-measurement "
    "shape): two parties match on SALTED-HASH tokens — party A hashes "
    "its customer keys, party B its user ids, with a shared salt that "
    "is the clean room's secret — so neither side's raw identifiers "
    "cross the boundary, and the join itself is an ordinary equi-join "
    "on 60-bit tokens.  Output is AGGREGATE-ONLY (segment x event-"
    "type cells) with k-suppression: cells under 5 matched users are "
    "withheld (q241's k-anonymity rule applied at the output "
    "boundary), which is what makes the release non-reidentifying.  "
    "Party B's side is DISTINCT per (token, type) so one noisy user "
    "cannot inflate a cell.  At 100 TB this is the standard two-"
    "party measurement topology: hash locally, ship tokens, join on "
    "high-entropy keys (uniform shuffle), suppress at the edge",
)
def q265(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    ev = load_events_range(spark, sf)
    pa = c.select(
        T.hex_hash64(F.col("c_custkey").cast("string"), salt="crA").alias(
            "token"
        ),
        F.col("c_mktsegment").alias("seg"),
    )
    pb = ev.select(
        T.hex_hash64(F.col("user_id").cast("string"), salt="crA").alias(
            "token"
        ),
        "event_type",
    ).distinct()
    cells = (
        pa.join(pb, "token")
        .groupBy("seg", "event_type")
        .agg(F.count("*").alias("n_matched"))
    )
    return cells.filter(F.col("n_matched") >= 5).select(
        "seg", "event_type", F.col("n_matched").cast("long").alias("n_matched")
    )


def _q266_oracle() -> str:
    base = (
        "SELECT o_orderkey AS k, o_orderstatus AS st,"
        " CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents"
        " FROM orders"
    )
    rh = hex_hash64_sql(
        "CAST(k AS VARCHAR) || '|' || st || '|' || CAST(cents AS VARCHAR)"
    )
    return f"""WITH u AS ({base}),
       final AS (
          SELECT k, st,
                 CASE WHEN k % 9 = 0 THEN cents + 30000
                      WHEN k % 4 = 0 THEN cents + 20000
                      WHEN k % 6 = 0 THEN cents + 10000
                      ELSE cents END AS cents
          FROM u WHERE k % 3 = 0 OR k % 4 = 0)
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(cents) AS BIGINT) AS sum_cents,
              CAST(bit_xor({rh}) AS BIGINT) AS xor_hash,
              TRUE AS paths_equal
       FROM final"""


@register(
    "q266_merge_composition",
    _q266_oracle(),
    "MERGE-composition equivalence (the compaction theorem behind "
    "every CDC pipeline that batches its upserts): three overlapping "
    "upsert batches (+10000 on keys %6=0, +20000 on %4=0 — which "
    "also INSERTS the non-base %4 keys — +30000 on %9=0) are applied "
    "to a snapshot table SEQUENTIALLY on path A, and as ONE batch on "
    "path B after last-wins key dedup in batch order — the exact "
    "compaction a streaming ingest performs when it coalesces a "
    "backlog.  Both final tables are read back and fingerprinted; "
    "paths_equal asserts they are byte-identical, and the oracle "
    "states the final state in closed form (priority CASE over the "
    "key residues), so BOTH paths are proven against the relational "
    "truth, not merely against each other.  This equivalence is what "
    "licenses upsert batching/compaction at 100 TB: N tiny MERGEs "
    "and one compacted MERGE must commute, and here that is a "
    "differential fact, not an assumption",
)
def q266(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators.dedup import dedup_first_wins
    from ..snapshots import SnapshotTable

    o = load_table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    u = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        cents.alias("cents"),
    ).localCheckpoint()
    base = u.filter(F.col("k") % 3 == 0)
    b1 = u.filter(F.col("k") % 6 == 0).withColumn(
        "cents", F.col("cents") + 10000
    )
    b2 = u.filter(F.col("k") % 4 == 0).withColumn(
        "cents", F.col("cents") + 20000
    )
    b3 = u.filter(F.col("k") % 9 == 0).withColumn(
        "cents", F.col("cents") + 30000
    )

    def build(tag: str) -> SnapshotTable:
        root = os.path.join(
            tempfile.gettempdir(),
            "hdt_q266_%s_%s_%d"
            % (tag, os.path.basename(os.path.normpath(sf)), os.getpid()),
        )
        shutil.rmtree(root, ignore_errors=True)
        t = SnapshotTable(u.sparkSession, root)
        t.commit_overwrite(base)
        return t

    ta = build("seq")
    for b in (b1, b2, b3):
        ta.commit_upsert(b, ["k"])
    tb = build("merged")
    # dedup_first_wins keeps the FIRST by ascending order; last-wins
    # wants the highest batch sequence, so order by negated sequence
    merged = dedup_first_wins(
        b1.withColumn("_seq", F.lit(-1))
        .unionByName(b2.withColumn("_seq", F.lit(-2)))
        .unionByName(b3.withColumn("_seq", F.lit(-3))),
        ["k"],
        ["_seq"],
    ).drop("_seq")
    tb.commit_upsert(merged, ["k"])

    rh = T.hex_hash64(
        F.concat(
            F.col("k").cast("string"),
            F.lit("|"),
            F.col("st"),
            F.lit("|"),
            F.col("cents").cast("string"),
        )
    )

    def fingerprint(t: SnapshotTable):
        return (
            t.read()
            .select("k", "st", "cents", rh.alias("h"))
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("cents").alias("sum_cents"),
                F.expr("bit_xor(h)").alias("xor_hash"),
            )
        )

    fa = fingerprint(ta)
    fb = fingerprint(tb).select(
        F.col("n_rows").alias("nb"),
        F.col("sum_cents").alias("sb"),
        F.col("xor_hash").alias("xb"),
    )
    return (
        fa.crossJoin(F.broadcast(fb))
        .select(
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
            F.col("xor_hash").cast("long").alias("xor_hash"),
            (
                (F.col("n_rows") == F.col("nb"))
                & (F.col("sum_cents") == F.col("sb"))
                & (F.col("xor_hash") == F.col("xb"))
            ).alias("paths_equal"),
        )
        .localCheckpoint()
    )


def _q267_oracle() -> str:
    cents = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    return f"""WITH d1 AS (
          SELECT o_orderstatus AS st, sum({cents}) AS s, count(*) AS n
          FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
       d2 AS (
          SELECT o_orderstatus AS st, sum({cents}) AS s, count(*) AS n
          FROM orders GROUP BY 1),
       pairs AS (
          SELECT 1 AS detail_v, 1 AS summary_v, TRUE AS should_match
          UNION ALL SELECT 2, 2, TRUE
          UNION ALL SELECT 2, 1, FALSE)
       SELECT detail_v, summary_v,
              CASE WHEN detail_v = summary_v THEN TRUE ELSE
                NOT EXISTS (SELECT 1 FROM d1 JOIN d2 USING (st)
                            WHERE d1.s <> d2.s OR d1.n <> d2.n)
              END AS consistent,
              should_match AS pinned_read
       FROM pairs"""


@register(
    "q267_snapshot_isolation_join",
    _q267_oracle(),
    "cross-table snapshot-isolation read (why version pinning exists): "
    "a detail table and its per-status summary are committed in "
    "LOCKSTEP (v1 = even order keys, v2 = all), then three read pairs "
    "are checked — (detail@1, summary@1) and (detail@2, summary@2) "
    "must reconcile exactly (the summary equals a recompute of the "
    "same-version detail, exact cents), while the MIXED pair "
    "(detail@2, summary@1) demonstrably does NOT: the torn read every "
    "pipeline without version pinning eventually serves.  The "
    "consistency bit is computed by full-outer-joining the summary "
    "against the recompute with null-safe comparisons, so a single "
    "divergent status cell flips it.  At 100 TB this is the contract "
    "multi-table transactions (or manifest-pinned reads across "
    "tables) buy; the differential proves both the guarantee AND the "
    "failure mode it prevents",
)
def q267(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..snapshots import SnapshotTable

    o = load_table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        cents.alias("cents"),
    ).localCheckpoint()

    def mk(tag: str) -> SnapshotTable:
        root = os.path.join(
            tempfile.gettempdir(),
            "hdt_q267_%s_%s_%d"
            % (tag, os.path.basename(os.path.normpath(sf)), os.getpid()),
        )
        shutil.rmtree(root, ignore_errors=True)
        return SnapshotTable(base.sparkSession, root)

    detail = mk("detail")
    summary = mk("summary")
    v1 = base.filter(F.col("k") % 2 == 0)
    detail.commit_overwrite(v1)
    summary.commit_overwrite(
        v1.groupBy("st").agg(
            F.sum("cents").alias("s"), F.count("*").alias("n")
        )
    )
    detail.commit_overwrite(base)
    summary.commit_overwrite(
        base.groupBy("st").agg(
            F.sum("cents").alias("s"), F.count("*").alias("n")
        )
    )

    def consistent(dv: int, sv: int):
        rec = (
            detail.read(dv)
            .groupBy("st")
            .agg(F.sum("cents").alias("rs"), F.count("*").alias("rn"))
        )
        cmpdf = summary.read(sv).join(rec, "st", "full_outer")
        bad = cmpdf.filter(
            ~F.col("s").eqNullSafe(F.col("rs"))
            | ~F.col("n").eqNullSafe(F.col("rn"))
        ).agg(F.count("*").alias("n_bad"))
        return bad.select(
            F.lit(dv).alias("detail_v"),
            F.lit(sv).alias("summary_v"),
            (F.col("n_bad") == 0).alias("consistent"),
            F.lit(dv == sv).alias("pinned_read"),
        )

    out = (
        consistent(1, 1)
        .unionByName(consistent(2, 2))
        .unionByName(consistent(2, 1))
        .localCheckpoint()
    )
    return out


@register(
    "q268_multiway_smj_revenue",
    f"""SELECT n.n_name,
               CAST(count(*) AS BIGINT) AS n_items,
               {dec_sum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
        FROM customer c
        JOIN orders o    ON c.c_custkey = o.o_custkey
        JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
                        AND c.c_nationkey = s.s_nationkey
        JOIN nation n    ON s.s_nationkey = n.n_nationkey
        JOIN region r    ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n.n_name""",
    "TPC-H Q5 analogue: the 6-way join tier where THREE sides are "
    "fact-scale (customer x orders x lineitem x supplier, plus "
    "broadcast nation/region).  At 100 TB customer and supplier are "
    "far past any broadcast threshold, so the big joins are pinned to "
    "sort-merge via merge hints — the declarative way to state 'this "
    "side is never small' without touching session confs (AQE may "
    "still convert at runtime if a side measures tiny, which is the "
    "desired behavior at test scale).  The join ORDER is the scale "
    "decision: orders is date-filtered FIRST (partition-prunable "
    "predicate pushed to the scan), then lineitem joins the reduced "
    "orders on orderkey, then customer on custkey, and supplier last "
    "on (suppkey, nationkey) — each SMJ shuffles both sides once on "
    "its key; nation/region stay broadcast.  The same-nation residual "
    "(c_nationkey = s_nationkey) rides the supplier join as part of "
    "its key, not a post-filter, so no fanout survives the join",
)
def q268(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    o = o.filter(
        (F.col("o_orderdate") >= _ts_lit(o, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < _ts_lit(o, "o_orderdate", "1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf, "nation")
    reg = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.hint("merge")
        .join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .join(cust.hint("merge"), F.col("o_custkey") == cust.c_custkey)
        .join(
            supp.hint("merge"),
            (F.col("l_suppkey") == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n_items"),
        dec_sum(rev, 4).alias("revenue"),
    )


@register(
    "q269_snapshot_concurrency",
    """WITH fin AS (
          SELECT o_orderkey AS k, o_orderstatus AS st,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders WHERE o_orderkey % 4 IN (0, 1, 2))
       SELECT TRUE AS conflict_raised,
              CAST(3 AS BIGINT) AS loser_retry_version,
              CAST(4 AS BIGINT) AS n_dirs_removed,
              TRUE AS expired_read_fails,
              TRUE AS survives_vacuum,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(cents) AS BIGINT) AS sum_cents,
              CAST(bit_xor(CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || st || '|' || CAST(cents AS VARCHAR)), 1, 15)) AS BIGINT)) AS BIGINT) AS xor_hash
       FROM fin""",
    "snapshot-store MULTI-WRITER differential (the piece q177/q267 "
    "don't cover): two committers race for the same version — the "
    "loser's data directory is fully written, then its manifest "
    "rename loses and raises SnapshotConflict (never a clobber, never "
    "a path collision: data dirs are uuid-suffixed exactly so the "
    "loser reaches the atomic rename), and the retry lands on top of "
    "the winner as v3 with NO data loss.  Then the maintenance path: "
    "compact() rewrites v3's three directories into one content-"
    "identical v4, vacuum(retain_last=1) removes exactly 4 "
    "directories (v1's, both appends', and the loser's orphaned "
    "first attempt) plus the expired manifests, a time-travel read "
    "past the horizon fails LOUDLY (ValueError, never half-GC'd "
    "state), and the surviving snapshot still fingerprint-equals the "
    "pre-vacuum content (materialized before GC via localCheckpoint). "
    "The oracle restates the final table relationally from orders and "
    "pins every staged outcome as a literal — any lost write, silent "
    "clobber, miscounted GC, or readable-expired-version flips a "
    "column.  This is the 100 TB multi-writer story: concurrent "
    "ingest jobs conflict-and-retry instead of corrupting, and GC "
    "never touches reachable state",
)
def q269(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..snapshots import SnapshotConflict, SnapshotTable

    o = load_table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        cents.alias("cents"),
    ).localCheckpoint()

    root = os.path.join(
        tempfile.gettempdir(),
        "hdt_q269_%s_%d"
        % (os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(spark, root)
    t.commit_overwrite(base.filter(F.col("k") % 4 == 0))  # v1

    # stage the race exactly as two processes would run commit_append:
    # the LOSER (Y) reads the current version and finishes writing its
    # data directory BEFORE the winner (X) publishes
    y_df = base.filter(F.col("k") % 4 == 2)
    y_version = t.current_version() + 1
    y_schema = t._evolve_schema(t._table_schema(y_version - 1), y_df.schema)
    y_dir = t._write_data(y_df, y_version, "append")
    t.commit_append(base.filter(F.col("k") % 4 == 1))  # X wins v2
    conflict_raised = False
    try:
        prev = t.manifest(y_version - 1)["dirs"]
        t._publish(y_version, prev + [y_dir], "append", y_schema)
    except SnapshotConflict:
        conflict_raised = True
    # loser retries on top of the winner; its first-attempt dir is now
    # an orphan for vacuum to collect
    retry_version = t.commit_append(y_df)

    h = T.hex_hash64(
        F.concat(
            F.col("k").cast("string"), F.lit("|"), F.col("st"),
            F.lit("|"), F.col("cents").cast("string"),
        )
    )

    def fp(df: DataFrame, pre: str) -> DataFrame:
        return df.select(h.alias("h"), "cents").agg(
            F.count("*").cast("long").alias(f"{pre}n"),
            F.sum("cents").cast("long").alias(f"{pre}s"),
            F.expr("bit_xor(h)").cast("long").alias(f"{pre}x"),
        )

    # materialize the pre-maintenance fingerprint BEFORE GC deletes
    # the directories a lazy plan would still reference
    pre = fp(t.read(), "pre_").localCheckpoint()

    t.compact()  # v4 = one directory, content-identical
    removed = t.vacuum(retain_last=1)
    expired_read_fails = False
    try:
        t.read(version=2)
    except ValueError:
        expired_read_fails = True

    post = fp(t.read(), "")
    return post.crossJoin(F.broadcast(pre)).select(
        F.lit(conflict_raised).alias("conflict_raised"),
        F.lit(retry_version).cast("long").alias("loser_retry_version"),
        F.lit(len(removed)).cast("long").alias("n_dirs_removed"),
        F.lit(expired_read_fails).alias("expired_read_fails"),
        (
            (F.col("n") == F.col("pre_n"))
            & (F.col("s") == F.col("pre_s"))
            & (F.col("x") == F.col("pre_x"))
        ).alias("survives_vacuum"),
        F.col("n").alias("n_rows"),
        F.col("s").alias("sum_cents"),
        F.col("x").alias("xor_hash"),
    )


def _zorder_terms(x: str, y: str, dialect: str, bits: int = 16) -> str:
    """Bit-interleaved Morton/Z value of two non-negative int columns:
    bit i of x lands at position 2i, bit i of y at 2i+1.  Disjoint bit
    positions, so summing the shifted bits equals OR-ing them.  Emitted
    per dialect (Spark: shiftleft/shiftright functions; DuckDB: <<//>>
    operators); exact integer arithmetic, 32 bits total -> fits BIGINT."""
    terms = []
    for i in range(bits):
        if dialect == "spark":
            terms.append(
                f"shiftleft((shiftright(CAST({x} AS BIGINT), {i}) & 1), {2 * i})"
            )
            terms.append(
                f"shiftleft((shiftright(CAST({y} AS BIGINT), {i}) & 1), {2 * i + 1})"
            )
        else:
            terms.append(f"(((CAST({x} AS BIGINT) >> {i}) & 1) << {2 * i})")
            terms.append(f"(((CAST({y} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_Q270_FILES = 64
_Q270_PRED = "pk BETWEEN 100 AND 299 AND sk BETWEEN 10 AND 29"
_Q270_OVERLAP = "maxp >= 100 AND minp <= 299 AND maxs >= 10 AND mins <= 29"


def _q270_layout_sql(layout: str, order_by: str) -> str:
    return f"""
      SELECT '{layout}' AS layout,
             CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(CASE WHEN {_Q270_OVERLAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scanned,
             CAST(sum(CASE WHEN {_Q270_OVERLAP} THEN c ELSE 0 END) AS BIGINT)
               AS rows_scanned,
             CAST(sum(m) AS BIGINT) AS rows_matched
      FROM (
        SELECT fid, min(pk) AS minp, max(pk) AS maxp,
               min(sk) AS mins, max(sk) AS maxs, count(*) AS c,
               sum(CASE WHEN {_Q270_PRED} THEN 1 ELSE 0 END) AS m
        FROM (
          SELECT ((row_number() OVER (ORDER BY {order_by}) - 1)
                  * {_Q270_FILES}) // count(*) OVER () AS fid, pk, sk
          FROM zli) GROUP BY fid)"""


@register(
    "q270_zorder_pruning",
    f"""WITH zli AS (
          SELECT l_orderkey AS ok, l_linenumber AS ln,
                 l_partkey AS pk, l_suppkey AS sk,
                 {_zorder_terms('l_partkey', 'l_suppkey', 'duck')} AS z
          FROM lineitem)
        SELECT * FROM ({_q270_layout_sql('natural', 'ok, ln, pk, sk')}
        UNION ALL {_q270_layout_sql('zorder', 'z, pk, sk, ok, ln')}) t""",
    "Z-ORDER clustering + zone-map pruning effectiveness (the Delta "
    "OPTIMIZE ZORDER story — at 100 TB, file skipping is THE scan-cost "
    "lever): lineitem is laid out into 64 equal 'files' twice — natural "
    "(orderkey, linenumber) order vs Morton order on the exact "
    "bit-interleaved (partkey, suppkey) Z-value — per-file min/max zone "
    "maps are built for both keys, and a 2-D predicate box (partkey "
    "100-299 x suppkey 10-29) is planned against each layout: a file "
    "is scanned iff its [min,max] ranges overlap the box.  The "
    "differential pins files_scanned / rows_scanned / rows_matched for "
    "BOTH layouts — z-order must prune most files while the natural "
    "layout scans nearly all (random key placement makes every zone "
    "map span the domain), and rows_matched must be identical (pruning "
    "is lossless).  The file assignment uses the scalable "
    "range-partitioned global rank (operators/topk.py), which is "
    "exactly how the real z-order WRITE works at scale "
    "(repartitionByRange on z, one file per range); Morton bits are "
    "exact integer arithmetic, portable to the oracle",
)
def q270(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
    )
    li = li.withColumn(
        "z", F.expr(_zorder_terms("pk", "sk", "spark"))
    ).localCheckpoint()

    matched = F.when(
        F.col("pk").between(100, 299) & F.col("sk").between(10, 29), 1
    ).otherwise(0)
    overlap = (
        (F.col("maxp") >= 100) & (F.col("minp") <= 299)
        & (F.col("maxs") >= 10) & (F.col("mins") <= 29)
    )

    def layout(name: str, order_cols) -> DataFrame:
        ranked = K.global_row_number(li, order_cols)
        tot = ranked.agg(F.count("*").alias("_n"))
        stats = (
            ranked.crossJoin(F.broadcast(tot))
            .select(
                F.expr(f"((rn - 1) * {_Q270_FILES}) div _n").alias("fid"),
                "pk",
                "sk",
            )
            .groupBy("fid")
            .agg(
                F.min("pk").alias("minp"),
                F.max("pk").alias("maxp"),
                F.min("sk").alias("mins"),
                F.max("sk").alias("maxs"),
                F.count("*").alias("c"),
                F.sum(matched).alias("m"),
            )
        )
        return stats.agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum(F.when(overlap, 1).otherwise(0))
            .cast("long")
            .alias("files_scanned"),
            F.sum(F.when(overlap, F.col("c")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("m").cast("long").alias("rows_matched"),
        ).select(F.lit(name).alias("layout"), "*")

    return layout("natural", [F.asc("ok"), F.asc("ln"), F.asc("pk"), F.asc("sk")]).unionByName(
        layout("zorder", [F.asc("z"), F.asc("pk"), F.asc("sk"), F.asc("ok"), F.asc("ln")])
    )


_Q271_BUDGET = 1000


@register(
    "q271_neyman_allocation",
    f"""WITH s AS (
          SELECT o_orderpriority AS stratum,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
                 o_orderkey AS k
          FROM orders),
       agg AS (
          SELECT stratum, count(*) AS n_h,
                 sum(cents) AS s1, sum(cents * cents) AS s2
          FROM s GROUP BY stratum),
       wtab AS (
          SELECT stratum, n_h,
                 CAST(floor(sqrt(CAST(n_h * ((n_h * s2 - s1 * s1)
                                             // (n_h - 1)) AS DOUBLE)))
                      AS BIGINT) AS w
          FROM agg),
       quota AS (
          SELECT stratum, n_h, w,
                 ({_Q271_BUDGET} * w) // sum(w) OVER () AS base,
                 ({_Q271_BUDGET} * w) % sum(w) OVER () AS rem
          FROM wtab),
       ranked AS (
          SELECT stratum, n_h, w, base,
                 row_number() OVER (ORDER BY rem DESC, stratum) AS rr,
                 {_Q271_BUDGET} - sum(base) OVER () AS leftover
          FROM quota),
       alloc AS (
          SELECT stratum, n_h, w,
                 base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS n_alloc
          FROM ranked),
       sel AS (
          SELECT s.stratum, s.k,
                 row_number() OVER (
                   PARTITION BY s.stratum
                   ORDER BY CAST(('0x' || substr(md5('q271|' || CAST(s.k AS VARCHAR)), 1, 15)) AS BIGINT), s.k
                 ) AS sr
          FROM s)
       SELECT a.stratum,
              CAST(a.n_h AS BIGINT) AS n_h,
              CAST(a.w AS BIGINT) AS w,
              CAST(a.n_alloc AS BIGINT) AS n_alloc,
              CAST(count(*) AS BIGINT) AS n_sampled,
              CAST(bit_xor(CAST(('0x' || substr(md5(CAST(sel.k AS VARCHAR)), 1, 15)) AS BIGINT)) AS BIGINT) AS sample_xor
       FROM alloc a JOIN sel ON sel.stratum = a.stratum AND sel.sr <= a.n_alloc
       GROUP BY a.stratum, a.n_h, a.w, a.n_alloc""",
    "Neyman-allocation stratified sampling (the variance-optimal "
    "survey design every eval-set builder should use instead of "
    "uniform sampling): per-stratum (order priority) allocation "
    "n_h proportional to N_h * S_h, computed ENGINE-EXACTLY — the "
    "variance numerator N*sum(x^2) - sum(x)^2 stays in DECIMAL(38,0) "
    "integers (cents^2 sums pass 1e22 at sf0.1; int64 is long gone), "
    "one integral division kept EXACT in decimal via the "
    "(v - v % d) / d identity (Spark's `div` returns BIGINT and wraps "
    "mod 2^64 past ~sf0.15; DuckDB's int128 `//` does not — the "
    "decimal path keeps both engines bit-identical at any scale), "
    "one IEEE sqrt (bit-portable, q197 precedent), then the "
    "q172/q197 largest-remainder method makes the allocations sum "
    "EXACTLY to the 1000-row budget.  Selection is deterministic "
    "hash-rank per stratum (salted md5 order) via the TWO-PHASE "
    "top_k_per_group_scalable shape — 5 strata means a plain "
    "PARTITION BY stratum window would hand the whole fact table to "
    "5 reducers at 100 TB; phase 1 ranks within (stratum, physical "
    "partition) so survivors are bounded by budget*partitions.  The "
    "sample itself — not just its size — is pinned by the xor "
    "fingerprint.  Plan: one map-combinable pass for moments, "
    "windows over the 5-row aggregate, two bounded rank phases",
)
def q271(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    s = o.select(
        F.col("o_orderpriority").alias("stratum"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.col("o_orderkey").alias("k"),
    )
    agg = s.groupBy("stratum").agg(
        F.count("*").alias("n_h"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents")).alias("s2"),
    )
    # variance numerator stays DECIMAL(38,0); the integral quotient is
    # computed as (v - v % d) / d, which is EXACT in decimal arithmetic
    # (remainder subtracted first, so the division has no fractional
    # part to round) — Spark's `div` operator returns BIGINT and wraps
    # modulo 2^64 past ~sf0.15, which would silently corrupt the
    # Neyman weights while DuckDB's int128 `//` stayed exact
    wtab = agg.select(
        "stratum",
        "n_h",
        F.floor(
            F.sqrt(
                F.expr(
                    "CAST(CAST(n_h AS DECIMAL(38,0)) * CAST("
                    " ((CAST(n_h AS DECIMAL(38,0)) * s2 - s1 * s1)"
                    "  - ((CAST(n_h AS DECIMAL(38,0)) * s2 - s1 * s1)"
                    "     % CAST(n_h - 1 AS DECIMAL(38,0))))"
                    " / CAST(n_h - 1 AS DECIMAL(38,0))"
                    " AS DECIMAL(38,0)) AS DOUBLE)"
                )
            )
        )
        .cast("long")
        .alias("w"),
    )
    win = Window.partitionBy()
    quota = wtab.select(
        "stratum",
        "n_h",
        "w",
        F.expr(f"({_Q271_BUDGET} * w) div sum(w) OVER ()").alias("base"),
        F.expr(f"({_Q271_BUDGET} * w) % sum(w) OVER ()").alias("rem"),
    )
    ranked = quota.select(
        "stratum",
        "n_h",
        "w",
        "base",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("stratum")))
        .alias("rr"),
        (F.lit(_Q271_BUDGET) - F.sum("base").over(win)).alias("leftover"),
    )
    alloc = ranked.select(
        "stratum",
        "n_h",
        "w",
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        ).alias("n_alloc"),
    )
    # selection: two-phase per-stratum rank (operators/topk.py).  There
    # are only 5 strata, so a plain PARTITION BY stratum window would
    # funnel the whole fact table through 5 reducers at scale; the
    # two-phase shape ranks within (stratum, physical partition) first
    # — survivors bounded by budget * num_partitions — then ranks the
    # survivors.  n_alloc <= budget always (largest-remainder sums to
    # the budget), so k = budget loses nothing.
    sel = K.top_k_per_group_scalable(
        s.select("stratum", "k"),
        ["stratum"],
        [
            T.hex_hash64(F.col("k").cast("string"), salt="q271").asc(),
            F.asc("k"),
        ],
        _Q271_BUDGET,
        rank_col="sr",
    )
    kh = T.hex_hash64(F.col("k").cast("string"))
    return (
        sel.join(F.broadcast(alloc), "stratum")
        .filter(F.col("sr") <= F.col("n_alloc"))
        .withColumn("h", kh)
        .groupBy("stratum", "n_h", "w", "n_alloc")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.expr("bit_xor(h)").cast("long").alias("sample_xor"),
        )
        .select(
            "stratum",
            F.col("n_h").cast("long").alias("n_h"),
            F.col("w").cast("long").alias("w"),
            F.col("n_alloc").cast("long").alias("n_alloc"),
            "n_sampled",
            "sample_xor",
        )
    )


def _q272_line(dialect: str) -> str:
    """Synthesized contact-log line per customer: a name token, an
    account number, an email, and a phone-shaped number — deterministic
    from the key so both engines build the identical corpus.  Only the
    string type name differs per dialect."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return (
        "'ticket from ' || c_name || ' acct '"
        f" || substr(md5(CAST(c_custkey AS {s})), 1, 4)"
        f" || lpad(CAST(c_custkey % 100000 AS {s}), 5, '0')"
        f" || ' email user' || CAST(c_custkey AS {s}) || '@example.com'"
        f" || ' phone 555-' || lpad(CAST(c_custkey % 10000 AS {s}), 4, '0')"
    )


_Q272_LINE_SQL = _q272_line("duck")
_Q272_PATTERNS = [
    ("email", "[a-z0-9]+@[a-z]+\\.[a-z]+", "<EMAIL>"),
    ("phone", "[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("digits", "[0-9]{5,}", "<NUM>"),
]


@register(
    "q272_pii_redaction",
    f"""WITH log AS (
          SELECT c_custkey AS k, {_Q272_LINE_SQL} AS line FROM customer),
       cnt AS (
          SELECT k,
                 len(regexp_extract_all(line, '{_Q272_PATTERNS[0][1]}')) AS n_email,
                 len(regexp_extract_all(line, '{_Q272_PATTERNS[1][1]}')) AS n_phone,
                 len(regexp_extract_all(line, '{_Q272_PATTERNS[2][1]}')) AS n_digits,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(line, '{_Q272_PATTERNS[0][1]}', '<EMAIL>', 'g'),
                     '{_Q272_PATTERNS[1][1]}', '<PHONE>', 'g'),
                   '{_Q272_PATTERNS[2][1]}', '<NUM>', 'g') AS clean
          FROM log)
       SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_email) AS BIGINT) AS n_email,
              CAST(sum(n_phone) AS BIGINT) AS n_phone,
              CAST(sum(n_digits) AS BIGINT) AS n_digits,
              CAST(sum(CASE WHEN regexp_matches(clean, '[0-9]{{5,}}')
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_residual,
              CAST(bit_xor(CAST(('0x' || substr(md5(clean), 1, 15)) AS BIGINT)) AS BIGINT) AS clean_xor
       FROM cnt""",
    "PII redaction audit (the scrub step every LLM training corpus "
    "runs before export): a synthesized contact log (name, account "
    "number, email, phone — deterministic from the customer key so "
    "the oracle builds the identical corpus) is redacted by an "
    "ordered regex cascade (email -> phone -> digit-run; order "
    "matters, the digit rule would eat the phone otherwise), and the "
    "differential pins per-type match counts, a RESIDUAL scan "
    "proving no 5+-digit run survives redaction, and the xor "
    "fingerprint of every redacted line — so the replacement "
    "byte-for-byte, not just the counts, is verified.  All JVM-side "
    "regexp_replace/regexp_count (whole-stage codegen, no UDF); at "
    "100 TB this is one narrow projection pass, map-only, no shuffle "
    "until the 1-row audit aggregate",
)
def q272(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    line = F.expr(_q272_line("spark"))
    df = c.select(F.col("c_custkey").alias("k"), line.alias("line"))
    clean = F.col("line")
    for _name, pat, rep in _Q272_PATTERNS:
        clean = F.regexp_replace(clean, pat, rep)
    # counts and redaction take the SAME path: Column-API patterns via
    # F.lit (an F.expr SQL string literal would let Spark's parser eat
    # the backslash — '\\.' would silently become the regex '.' in the
    # count path while regexp_replace kept the literal, a latent
    # count/replace divergence)
    red = df.select(
        "k",
        F.regexp_count(
            F.col("line"), F.lit(_Q272_PATTERNS[0][1])
        ).alias("n_email"),
        F.regexp_count(
            F.col("line"), F.lit(_Q272_PATTERNS[1][1])
        ).alias("n_phone"),
        F.regexp_count(
            F.col("line"), F.lit(_Q272_PATTERNS[2][1])
        ).alias("n_digits"),
        clean.alias("clean"),
    ).withColumn("h", T.hex_hash64(F.col("clean")))
    return red.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_email").cast("long").alias("n_email"),
        F.sum("n_phone").cast("long").alias("n_phone"),
        F.sum("n_digits").cast("long").alias("n_digits"),
        F.sum(
            F.when(F.col("clean").rlike("[0-9]{5,}"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_residual"),
        F.expr("bit_xor(h)").cast("long").alias("clean_xor"),
    )


@register(
    "q273_grouped_ols_trend",
    """WITH pts AS (
          SELECT o_orderpriority AS grp,
                 CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS x,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS y
          FROM orders),
       m AS (
          SELECT grp, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM pts GROUP BY grp)
       SELECT grp,
              CAST(n AS BIGINT) AS n,
              CAST((n * sxy - sx * sy) * 1000000
                   // (n * sxx - sx * sx) AS BIGINT) AS slope_ppm_cents_per_day,
              CAST((sy * 1000000 - ((n * sxy - sx * sy) * 1000000
                                    // (n * sxx - sx * sx)) * sx)
                   // (n * 1000000) AS BIGINT) AS intercept_cents
       FROM m""",
    "grouped closed-form OLS (per-segment trend fitting — the "
    "price-drift / KPI-slope readout every warehouse dashboard wants, "
    "done WITHOUT any iterative solver): slope = (n*Sxy - Sx*Sy) / "
    "(n*Sxx - Sx^2) from one map-combinable pass of cross-moments per "
    "group.  Every moment stays exact integer (DECIMAL(38,0) — x*y is "
    "day-index times cents, Sxy passes 1e16 at sf0.1 and the n*Sxy "
    "product passes int64 immediately), and the slope ships as an "
    "integral ppm ratio so the oracle comparison is exact, no "
    "IEEE-division drift.  At 100 TB this is the textbook 'heavy "
    "aggregate, tiny result' shape: one shuffle on the group key, "
    "partial aggregation does almost all the work map-side",
)
def q273(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    pts = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            "CAST(floor(unix_timestamp(o_orderdate)) AS BIGINT) div 86400"
        ).alias("x"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    m = pts.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
    )
    # div-ok: |slope| <= y-range * 6 / x-range (Cauchy-Schwarz over the
    # fixed 7-year order window) ~ 1.5e5 cents/day; x1e6 ~ 1.5e11 < int64
    slope = "((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx))"  # ppm-ok: sxy/sx/sy/sxx are DECIMAL(38,0) aggregates, the product stays decimal
    return m.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.expr(slope).cast("long").alias("slope_ppm_cents_per_day"),
        # pure integer arithmetic (both engines truncate div toward
        # zero, verified): intercept = (Sy*1e6 - slope_ppm*Sx) / (n*1e6)
        F.expr(
            f"(sy * 1000000 - CAST({slope} AS DECIMAL(38,0)) * sx)"
            " div (CAST(n AS DECIMAL(38,0)) * 1000000)"  # div-ok: intercept = ybar - slope*xbar, |cents| < ~2e9
        )
        .cast("long")
        .alias("intercept_cents"),
    )


@register(
    "q274_bmp_decode_quarantine",
    f"""WITH src AS (
          SELECT doc_id,
                 CASE CAST(doc_id % 7 AS INTEGER)
                   WHEN 1 THEN 'bad_magic'
                   WHEN 2 THEN 'bad_format'
                   WHEN 3 THEN 'corrupt'
                   ELSE 'ok' END AS status,
                 CASE WHEN doc_id % 7 = 3 THEN 46
                      ELSE 54 + 92 * ((strlen(text) + 29) // 30)
                      END AS n_bytes,
                 CASE WHEN doc_id % 7 NOT IN (1, 2, 3)
                      THEN list_sum(list_transform(
                             string_split(text, ''), x -> ord(x)))
                      ELSE NULL END AS pixel_sum
          FROM documents WHERE doc_id < 800 AND strlen(text) > 0)
       SELECT status,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
              CAST(coalesce(sum(pixel_sum), 0) AS BIGINT) AS sum_pixels,
              CAST(bit_xor({hex_hash64_sql("CAST(doc_id AS VARCHAR)")})
                   AS BIGINT) AS id_xor
       FROM src GROUP BY status""",
    "binary decode quarantine (P9's validation-split pattern applied "
    "to media payloads — reference load_hhs.py quarantines bad numeric "
    "rows; a 100 TB image pipeline must do the same for corrupt "
    "containers): real 24-bpp BMPs are deterministically corrupted "
    "per row (magic flipped / bpp rewritten / truncated mid-header), "
    "the decode pipeline classifies each failure into a stable reason "
    "taxonomy instead of killing the batch, and the split is total — "
    "one output row per payload.  The oracle recomputes every cell "
    "from the source text (intact size 54+92*height, truncated size "
    "46, R-channel sum = byte sum), so a decoder that silently "
    "'succeeds' on a corrupt file, misclassifies a reason, or drops a "
    "row breaks the differential.  Arrow mapInPandas, (id,payload) "
    "projection, corrupt fraction rides the decode pass — no second "
    "scan at scale",
)
def q274(spark: SparkSession, sf: str) -> DataFrame:
    from .. import multimodal as MM

    d = (
        load_table(spark, sf, "documents")
        .filter((F.col("doc_id") < 800) & (F.length("text") > 0))
        .withColumn("mode", (F.col("doc_id") % 7).cast("int"))
    )
    src = MM.with_corrupted_bmp_payload(d, mode_col="mode")
    split = MM.decode_quarantine_pipeline(src).withColumn(
        "h", T.hex_hash64(F.col("doc_id").cast("string"))
    )
    return split.groupBy("status").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_bytes").cast("long").alias("sum_bytes"),
        F.coalesce(F.sum("pixel_sum"), F.lit(0)).cast("long").alias("sum_pixels"),
        F.expr("bit_xor(h)").cast("long").alias("id_xor"),
    )


def _q275_oracle() -> str:
    norm = normalize_text_sql("text")
    h = hex_hash64_sql("CAST(doc_id AS VARCHAR)")
    return f"""WITH sh AS (
          SELECT doc_id, lang,
                 unnest(list_distinct(list_transform(
                     range(1, greatest(length(norm) - 2, 1) + 1),
                     i -> substr(norm, CAST(i AS INT), 3)))) AS g
          FROM (SELECT doc_id, lang, {norm} AS norm
                FROM documents WHERE strlen(text) > 0)),
       train AS (SELECT * FROM sh WHERE doc_id % 2 = 0),
       test  AS (SELECT * FROM sh WHERE doc_id % 2 = 1),
       dfc AS (SELECT lang, g, count(*) AS df FROM train GROUP BY lang, g),
       prof AS (
          SELECT lang AS plang, g FROM (
            SELECT lang, g,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY df DESC, g) AS rk
            FROM dfc) WHERE rk <= 20),
       tdocs AS (SELECT DISTINCT doc_id, lang FROM test),
       cand AS (SELECT DISTINCT plang FROM prof),
       hits AS (
          SELECT t.doc_id, p.plang, count(*) AS h
          FROM test t JOIN prof p ON t.g = p.g
          GROUP BY t.doc_id, p.plang),
       scored AS (
          SELECT b.doc_id, b.lang, b.plang, coalesce(h.h, 0) AS hits
          FROM (SELECT * FROM tdocs CROSS JOIN cand) b
          LEFT JOIN hits h
            ON b.doc_id = h.doc_id AND b.plang = h.plang),
       pred AS (
          SELECT doc_id, lang, plang AS pred FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY hits DESC, plang) AS rk
            FROM scored) WHERE rk = 1)
       SELECT lang, pred, CAST(count(*) AS BIGINT) AS n,
              CAST(bit_xor({h}) AS BIGINT) AS id_xor
       FROM pred GROUP BY lang, pred"""


@register(
    "q275_char_ngram_langid",
    _q275_oracle(),
    "character-trigram language identification (the n-gram-profile "
    "heuristic every ingest pipeline runs before routing text to "
    "per-language processing): train/test split by doc-id parity, "
    "per-language profiles = top-20 trigrams by document frequency "
    "(deterministic df-desc/trigram-asc rank), held-out docs scored "
    "by profile overlap with ties broken lexically, and the FULL "
    "confusion matrix + per-cell doc-id xor as the differential — so "
    "profile construction, scoring, and argmax are all pinned, not "
    "just an accuracy scalar.  (The synthetic corpus shares one "
    "vocabulary across langs, so the matrix is deliberately "
    "confusion-heavy — it exercises the tie-break path that a "
    "cleanly-separable corpus never would.)  At 100 TB: profiles are "
    "a ~100-row broadcast, trigram df is map-side-combinable over a "
    "bounded domain (<=37^3 keys), scoring is one broadcast join, and "
    "the argmax window partitions by doc_id — high-cardinality by "
    "construction, green under the explain-audit window rule",
)
def q275(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").filter(F.length("text") > 0)
    sh = d.select(
        "doc_id", "lang", F.explode(T.char_ngrams("text", n=3)).alias("g")
    )
    train = sh.filter(F.col("doc_id") % 2 == 0)
    test = sh.filter(F.col("doc_id") % 2 == 1)
    dfc = train.groupBy("lang", "g").agg(F.count("*").alias("df"))
    wprof = Window.partitionBy("lang").orderBy(F.desc("df"), F.asc("g"))
    prof = (
        dfc.withColumn("rk", F.row_number().over(wprof))
        .filter(F.col("rk") <= 20)
        .select(F.col("lang").alias("plang"), "g")
    )
    # distinct test docs come from the BASE table, not the exploded
    # frame — one fewer trigram explosion (the explode is the only
    # fact-sized cost in this query)
    tdocs = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang")
    cand = prof.select("plang").distinct()
    hits = (
        test.join(F.broadcast(prof), "g")
        .groupBy("doc_id", "plang")
        .agg(F.count("*").alias("h"))
    )
    scored = (
        tdocs.crossJoin(F.broadcast(cand))
        .join(hits, ["doc_id", "plang"], "left")
        .select(
            "doc_id", "lang", "plang", F.coalesce("h", F.lit(0)).alias("hits")
        )
    )
    wpred = Window.partitionBy("doc_id").orderBy(
        F.desc("hits"), F.asc("plang")
    )
    pred = (
        scored.withColumn("rk", F.row_number().over(wpred))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang", F.col("plang").alias("pred"))
    )
    return pred.withColumn(
        "h", T.hex_hash64(F.col("doc_id").cast("string"))
    ).groupBy("lang", "pred").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("bit_xor(h)").cast("long").alias("id_xor"),
    )


_Q276_DIM = 64


def _q276_oracle() -> str:
    return f"""WITH q AS (
          SELECT vec_id,
                 list_transform(embedding,
                     v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT))
                   AS x
          FROM embeddings),
       q1 AS (SELECT vec_id, x, list_sum(x) AS s FROM q),
       ex AS (SELECT i, x[i] AS xi, s
              FROM q1, range(1, {_Q276_DIM + 1}) t(i)),
       v1 AS (SELECT i, sum(xi * s) AS v FROM ex GROUP BY i),
       m1 AS (SELECT greatest(max(abs(v)), 1) AS m FROM v1),
       v1n AS (SELECT i,
                      CASE WHEN v < 0 THEN -1 ELSE 1 END
                        * ((abs(v) * 1000000) // m) AS vn
               FROM v1, m1),
       s2 AS (SELECT q1.vec_id, sum(q1.x[v1n.i] * v1n.vn) AS s2
              FROM q1, v1n GROUP BY q1.vec_id),
       ex2 AS (SELECT i, x[i] AS xi, s2.s2
               FROM q1 JOIN s2 USING (vec_id),
                    range(1, {_Q276_DIM + 1}) t(i)),
       v2 AS (SELECT i, sum(xi * s2) AS v FROM ex2 GROUP BY i),
       m2 AS (SELECT greatest(max(abs(v)), 1) AS m FROM v2)
       SELECT CAST(i AS INTEGER) AS i,
              CAST(CASE WHEN v < 0 THEN -1 ELSE 1 END
                     * ((abs(v) * 1000000) // m) AS BIGINT) AS v2_ppm
       FROM v2, m2"""


@register(
    "q276_power_iteration_pca",
    _q276_oracle(),
    "distributed power iteration for the dominant eigenvector of the "
    "embedding Gram matrix X'X (the first PCA axis — the standard "
    "whitening/drift-monitoring primitive for embedding corpora) "
    "computed ENGINE-EXACTLY in integers: components are quantized to "
    "int (floor(x*1000) — float->double cast is exact, the double "
    "multiply is one correctly-rounded IEEE op, identical in any "
    "engine), and each iteration is the identity (X'X)v = X'(Xv) — "
    "never materializing the d*d matrix: one pass computes s = x.v "
    "per row (a 64-literal zip_with, no join), the next aggregate "
    "forms v' = sum x*s per component.  Between iterations v "
    "renormalizes to ppm of its max-abs component with sign-safe "
    "truncating division (both engines floor on the abs value), so "
    "magnitudes stay bounded at ANY corpus size — sum(x_i*s2) is "
    "~1e3*6e10*N, DECIMAL(38,0) to ~1e19 rows.  The 64-row "
    "iterate is the ONLY driver-side state (the k-means-centroid "
    "broadcast pattern); data never shuffles — each pass is "
    "map-side-combined posexplode->sum.  Two iterations pinned; the "
    "oracle recomputes both exactly, so one wrong quantized product "
    "in 64*N breaks the differential",
)
def q276(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    q = e.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT))"
        ).alias("x"),
    )
    # pass 1: v1_i = sum_vec x_i * s with s = sum_j x_j (v0 = ones)
    q1 = q.select(
        "vec_id",
        "x",
        F.expr("aggregate(x, CAST(0 AS BIGINT), (a, b) -> a + b)").alias("s"),
    )
    v1_rows = (
        q1.select(F.posexplode("x").alias("p", "xi"), "s")
        .groupBy("p")
        .agg(F.sum(F.expr("CAST(xi AS DECIMAL(38,0)) * s")).alias("v"))
        .collect()
    )
    # 64-row iterate renormalized driver-side (exact Python ints) —
    # the k-means centroid-broadcast pattern: state is O(d), data
    # never leaves the executors
    vals = {int(r["p"]): int(r["v"]) for r in v1_rows}
    m = max(max(abs(v) for v in vals.values()), 1)
    v1n = [
        (1 if vals[p] >= 0 else -1) * (abs(vals[p]) * 1_000_000 // m)  # ppm-ok: driver-side Python int (arbitrary precision), 64 values
        for p in range(_Q276_DIM)
    ]
    arr = F.array(*[F.lit(v) for v in v1n])
    # pass 2: s2 = x . v1n per row, then v2_i = sum_vec x_i * s2
    q2 = q.select(
        "vec_id",
        "x",
        F.aggregate(
            F.zip_with(F.col("x"), arr, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, y: acc + y,
        ).alias("s2"),
    )
    v2 = (
        q2.select(F.posexplode("x").alias("p", "xi"), "s2")
        .groupBy("p")
        .agg(F.sum(F.expr("CAST(xi AS DECIMAL(38,0)) * s2")).alias("v"))
    )
    m2 = v2.agg(
        F.greatest(F.max(F.abs(F.col("v"))), F.lit(1).cast("decimal(38,0)"))
        .alias("m")
    )
    return (
        v2.crossJoin(F.broadcast(m2))
        .select(
            (F.col("p") + 1).cast("int").alias("i"),
            F.expr(
                "CAST(CASE WHEN v < 0 THEN -1 ELSE 1 END"
                # ppm-ok: v is DECIMAL(38,0), the *1e6 product stays decimal
                " * ((abs(v) * 1000000) div m) AS BIGINT)"  # div-ok: renormalized quotient <= 1e6 by construction
            ).alias("v2_ppm"),
        )
    )


_Q277_CAP = 3
_Q277_K = 20


@register(
    "q277_diversified_topk",
    f"""WITH scored AS (
          SELECT doc_id, source,
                 len(string_split(text, ' ')) AS score
          FROM documents),
       capped AS (
          SELECT doc_id, source, score FROM (
            SELECT *, row_number() OVER (PARTITION BY source
                                         ORDER BY score DESC, doc_id) AS rk
            FROM scored) WHERE rk <= {_Q277_CAP})
       SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                   AS BIGINT) AS rank,
              doc_id, source, CAST(score AS BIGINT) AS score
       FROM capped ORDER BY score DESC, doc_id LIMIT {_Q277_K}""",
    "diversified top-k (the retrieval/dataset-curation constraint "
    "'best K overall but at most C per source' — prevents one crawl "
    "domain from owning the whole selection): per-source cap via the "
    "TWO-PHASE top_k_per_group_scalable shape — source is a "
    "~20-value column at ANY corpus size, so the naive PARTITION BY "
    "source window is exactly the low-cardinality fact-table funnel "
    "the explain-audit window rule forbids (this query is the "
    "positive control for that rule: swap in top_k_per_group and the "
    "audit fails) — then global top-K via orderBy.limit, which "
    "Catalyst compiles to TakeOrderedAndProject: per-partition "
    "k-heaps, only K rows per partition reach the merge.  Exact "
    "(cap-then-rank is order-insensitive: the global top-K of the "
    "capped set is contained in the union of per-partition "
    "survivors); total order by (score desc, doc_id) everywhere",
)
def q277(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    scored = d.select(
        "doc_id", "source", F.size(T.tokens("text")).alias("score")
    )
    capped = K.top_k_per_group_scalable(
        scored,
        ["source"],
        [F.desc("score"), F.asc("doc_id")],
        _Q277_CAP,
        rank_col="_rk",
    ).drop("_rk")
    top = capped.orderBy(F.desc("score"), F.asc("doc_id")).limit(_Q277_K)
    # the K-row result ranks in one tiny window (bounded input: LIMIT)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("long")
        .alias("rank"),
        "doc_id",
        "source",
        F.col("score").cast("long").alias("score"),
    )


def _q278_oracle() -> str:
    s = "length(printf('%b', CAST(greatest({x}, 1) AS BIGINT))) - 1"
    sa, sb = s.format(x="a.share_ppm"), s.format(x="b.share_ppm")
    return f"""WITH per AS (
          SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                 CAST(least(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT) // 5000000, 9) AS INTEGER)
                   AS band
          FROM orders),
       cnt AS (SELECT yr, band, count(*) AS n FROM per GROUP BY yr, band),
       grid AS (
          SELECT yr, CAST(b.range AS INTEGER) AS band
          FROM (SELECT DISTINCT yr FROM cnt) CROSS JOIN range(0, 10) b),
       filled AS (
          SELECT g.yr, g.band, coalesce(c.n, 0) AS n
          FROM grid g LEFT JOIN cnt c
            ON g.yr = c.yr AND g.band = c.band),
       tot AS (SELECT yr, sum(n) AS t FROM filled GROUP BY yr),
       share AS (
          SELECT f.yr, f.band, f.n,
                 (f.n * 1000000) // t.t AS share_ppm
          FROM filled f JOIN tot t ON f.yr = t.yr)
       SELECT a.yr AS yr_from, b.yr AS yr_to,
              CAST(sum((b.share_ppm - a.share_ppm) * (({sb}) - ({sa})))
                   AS BIGINT) AS psi_po2,
              CAST(sum(a.n) AS BIGINT) AS n_from,
              CAST(sum(b.n) AS BIGINT) AS n_to
       FROM share a JOIN share b
         ON a.band = b.band AND b.yr = a.yr + 1
       GROUP BY a.yr, b.yr"""


@register(
    "q278_psi_drift_monitor",
    _q278_oracle(),
    "population-stability drift monitor between consecutive periods "
    "(the pre-deploy gate every feature store and training-data "
    "refresh runs: 'did this month's distribution move?'): per-year "
    "price-band shares in exact ppm, PSI with the log term "
    "po2-quantized via the q174 floor(log2) = len(bin(x))-1 idiom — "
    "fp ln() is engine-unstable near band boundaries, the integer "
    "form is bit-portable and keeps the PSI property that every "
    "band's contribution is >= 0 ((p-q) and (log p - log q) always "
    "share sign).  One map-side-combinable aggregate over the fact "
    "table is the ONLY data-sized stage; the band grid (years x 10), "
    "shares, and the consecutive-period self-join are all "
    "constant-size frames.  Zero-count bands ride a full year x band "
    "grid (shares clamp to 1 ppm under the log) so a band appearing "
    "or vanishing registers as drift instead of dropping out of the "
    "join",
)
def q278(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    per = o.select(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.least(
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " div 5000000"
            ),
            F.lit(9).cast("long"),
        )
        .cast("int")
        .alias("band"),
    )
    # localCheckpoint the first aggregate: every downstream frame
    # (grid, filled, tot, both self-join arms) re-derives it, and
    # without the barrier the plan re-scans the fact table once per
    # consumer — the checkpoint pins ONE data-sized pass; the
    # materialized frame is years x bands <= ~100 rows
    cnt = (
        per.groupBy("yr", "band")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    years = cnt.select("yr").distinct()
    bands = spark.range(10).select(F.col("id").cast("int").alias("band"))
    grid = years.crossJoin(F.broadcast(bands))
    # every frame past the first aggregate is constant-size (years x
    # 10 bands); pin the joins to broadcast so the static plan is
    # exchange-light instead of relying on AQE to discover it
    filled = grid.join(F.broadcast(cnt), ["yr", "band"], "left").select(
        "yr", "band", F.coalesce("n", F.lit(0)).alias("n")
    )
    tot = filled.groupBy("yr").agg(F.sum("n").alias("t"))
    share = filled.join(F.broadcast(tot), "yr").select(
        "yr",
        "band",
        "n",
        F.expr("(CAST(n AS DECIMAL(38,0)) * 1000000) div t")  # div-ok: band share of year total, quotient <= 1e6
        .alias("share_ppm"),
    )
    a = share.select(
        F.col("yr").alias("yr_from"),
        "band",
        F.col("n").alias("na"),
        F.col("share_ppm").alias("pa"),
    )
    b = share.select(
        F.col("yr").alias("yr_b"),
        "band",
        F.col("n").alias("nb"),
        F.col("share_ppm").alias("pb"),
    )
    slog = "length(bin(greatest({x}, 1))) - 1"
    return (
        a.join(
            F.broadcast(b),
            (a["band"] == b["band"])
            & (b["yr_b"] == a["yr_from"] + 1),
        )
        .groupBy("yr_from", F.col("yr_b").alias("yr_to"))
        .agg(
            F.sum(
                F.expr(
                    f"(pb - pa) * (({slog.format(x='pb')})"
                    f" - ({slog.format(x='pa')}))"
                )
            )
            .cast("long")
            .alias("psi_po2"),
            F.sum("na").cast("long").alias("n_from"),
            F.sum("nb").cast("long").alias("n_to"),
        )
    )


def _q279_oracle() -> str:
    h = hex_hash64_sql("CAST(c_custkey AS VARCHAR) || '|' || CAST(ver AS VARCHAR)", salt="gr")
    hx = hex_hash64_sql("CAST(entity AS VARCHAR) || '|' || g_name || '|' || CAST(g_cents AS VARCHAR)")
    return f"""WITH recs AS (
          SELECT c_custkey // 3 AS entity,
                 CAST(c_custkey % 3 AS INTEGER) AS ver,
                 CASE WHEN {h} % 5 = 0 THEN ''
                      ELSE c_name || ' v' || CAST(c_custkey % 3 AS VARCHAR)
                      END AS name,
                 CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
                 c_mktsegment AS seg
          FROM customer),
       golden AS (
          SELECT entity,
                 arg_max(name, CASE WHEN name = '' THEN -1 ELSE ver END)
                   AS g_name,
                 max(cents) AS g_cents,
                 min(seg) AS g_seg,
                 sum(CASE WHEN name = '' THEN 0 ELSE 1 END) AS n_named,
                 count(*) AS n_recs
          FROM recs GROUP BY entity)
       SELECT g_seg,
              CAST(count(*) AS BIGINT) AS n_entities,
              CAST(sum(g_cents) AS BIGINT) AS sum_cents,
              CAST(sum(CASE WHEN n_named = n_recs THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_fully_named,
              CAST(sum(CASE WHEN n_named = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_unnamed,
              CAST(bit_xor({hx}) AS BIGINT) AS golden_xor
       FROM golden GROUP BY g_seg"""


@register(
    "q279_golden_record_survivorship",
    _q279_oracle(),
    "golden-record construction (the MDM survivorship step after "
    "entity resolution: q76/q179 find the duplicate clusters, THIS "
    "op decides which attribute values survive into the master "
    "record): per-entity rules — freshest non-empty name "
    "(max_by/arg_max on a missing-aware recency key: empty demotes "
    "to -1, so completeness beats recency), highest balance, "
    "lexicographic segment canonicalization — with the per-entity "
    "results pinned by an xor over (entity, chosen name, chosen "
    "cents), so one wrong survivorship pick anywhere breaks the "
    "differential, not just the aggregate counts.  Missingness is "
    "encoded as '' rather than NULL deliberately: Spark max_by and "
    "DuckDB arg_max have subtly different NULL-skipping rules, and a "
    "portable survivorship spec must not depend on them.  At 100 TB "
    "this is ONE map-side-combinable aggregate per entity then a "
    "segment rollup — no joins, no windows; survivorship is the "
    "textbook 'aggregate with order-aware picks' shape",
)
def q279(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    ver = (F.col("c_custkey") % 3).cast("int")
    h = T.hex_hash64(
        F.concat(
            F.col("c_custkey").cast("string"), F.lit("|"), ver.cast("string")
        ),
        salt="gr",
    )
    recs = c.select(
        F.expr("c_custkey div 3").alias("entity"),
        ver.alias("ver"),
        F.when(h % 5 == 0, F.lit("")).otherwise(
            F.concat(F.col("c_name"), F.lit(" v"), ver.cast("string"))
        ).alias("name"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.col("c_mktsegment").alias("seg"),
    )
    golden = recs.groupBy("entity").agg(
        F.expr("max_by(name, IF(name = '', -1, ver))").alias("g_name"),
        F.max("cents").alias("g_cents"),
        F.min("seg").alias("g_seg"),
        F.sum(F.when(F.col("name") == "", 0).otherwise(1)).alias("n_named"),
        F.count("*").alias("n_recs"),
    )
    hx = T.hex_hash64(
        F.concat(
            F.col("entity").cast("string"),
            F.lit("|"),
            F.col("g_name"),
            F.lit("|"),
            F.col("g_cents").cast("string"),
        )
    )
    return golden.withColumn("hx", hx).groupBy("g_seg").agg(
        F.count("*").cast("long").alias("n_entities"),
        F.sum("g_cents").cast("long").alias("sum_cents"),
        F.sum(F.when(F.col("n_named") == F.col("n_recs"), 1).otherwise(0))
        .cast("long")
        .alias("n_fully_named"),
        F.sum(F.when(F.col("n_named") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_unnamed"),
        F.expr("bit_xor(hx)").cast("long").alias("golden_xor"),
    )


def _q280_oracle() -> str:
    h = hex_hash64_sql("CAST(o_orderkey AS VARCHAR)", salt="score")
    return f"""WITH scored AS (
          SELECT least({h} % 1000
                       + CASE WHEN o_orderstatus = 'F' THEN 150 ELSE 0 END,
                       999) AS s,
                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
          FROM orders),
       per AS (
          SELECT s, sum(y) AS np, sum(1 - y) AS nn
          FROM scored GROUP BY s),
       cum AS (
          SELECT s, np, nn,
                 coalesce(sum(nn) OVER (ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS below
          FROM per),
       tot AS (
          SELECT sum(2 * np * below + np * nn) AS u2,
                 sum(np) AS n_pos, sum(nn) AS n_neg
          FROM cum)
       SELECT CAST(n_pos AS BIGINT) AS n_pos,
              CAST(n_neg AS BIGINT) AS n_neg,
              CAST(u2 AS BIGINT) AS u2,
              CAST((u2 * 1000000) // (2 * n_pos * n_neg) AS BIGINT)
                AS auc_ppm
       FROM tot"""


@register(
    "q280_auc_rank_sum",
    _q280_oracle(),
    "exact AUC-ROC via the Mann-Whitney rank-sum identity (the "
    "classifier-eval primitive this registry's eval layer lacked "
    "beside NDCG/calibration/IPS): AUC = P(score_pos > score_neg) + "
    "P(tie)/2, computed as 2U = sum over score values of "
    "2*n_pos(s)*cum_neg_below(s) + n_pos(s)*n_neg(s) — ties handled "
    "EXACTLY by the half-credit term, no fp ranks, no sampling; "
    "auc_ppm = (2U * 1e6) div (2 * N_pos * N_neg) floors once at the "
    "end.  The score domain is bounded (1000 values), so the "
    "fact-sized work is ONE map-side-combinable aggregate; the "
    "running-below sum is a window over the 1000-row score "
    "histogram (bounded input — audit-green), and per-score products "
    "route through DECIMAL(38,0) since n_pos(s)*cum_below passes "
    "int64 around 1e10 rows.  This is how AUC must be computed at "
    "100 TB: histogram first, never a global sort of raw scores",
)
def q280(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    h = T.hex_hash64(F.col("o_orderkey").cast("string"), salt="score")
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    scored = o.select(
        F.least(
            h % 1000 + F.when(F.col("o_orderstatus") == "F", 150).otherwise(0),
            F.lit(999).cast("long"),
        ).alias("s"),
        y.alias("y"),
    )
    per = scored.groupBy("s").agg(
        F.sum("y").alias("np"), F.sum(1 - F.col("y")).alias("nn")
    )
    wbelow = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = per.select(
        "s",
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(wbelow), F.lit(0)).alias("below"),
    )
    tot = cum.agg(
        F.sum(
            F.expr(
                "2 * CAST(np AS DECIMAL(38,0)) * below"
                " + CAST(np AS DECIMAL(38,0)) * nn"
            )
        ).alias("u2"),
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
    )
    return tot.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.col("u2").cast("long").alias("u2"),
        F.expr(
            # ppm-ok: u2 is DECIMAL(38,0), the product stays decimal
            "CAST((u2 * 1000000)"
            " div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"  # div-ok: AUC fraction, quotient <= 1e6
        ).alias("auc_ppm"),
    )


_Q281_CUT = "'2001-01-01'"


def _q281_oracle() -> str:
    hx = hex_hash64_sql(
        "m || '|' || st || '|' || CAST(n AS VARCHAR) || '|' ||"
        " CAST(cents AS VARCHAR) || '|' || CAST(mn AS VARCHAR)"
    )
    base_agg = """SELECT substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS m,
                 o_orderstatus AS st, count(*) AS n,
                 sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS cents,
                 min(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS mn
          FROM orders WHERE {pred} GROUP BY m, st"""
    return f"""WITH base AS ({base_agg.format(pred=f"o_orderdate < DATE {_Q281_CUT}")}),
       delta AS ({base_agg.format(pred=f"o_orderdate >= DATE {_Q281_CUT}")}),
       maintained AS (
          SELECT coalesce(b.m, d.m) AS m, coalesce(b.st, d.st) AS st,
                 coalesce(b.n, 0) + coalesce(d.n, 0) AS n,
                 coalesce(b.cents, 0) + coalesce(d.cents, 0) AS cents,
                 least(coalesce(b.mn, 9223372036854775807),
                       coalesce(d.mn, 9223372036854775807)) AS mn
          FROM base b FULL OUTER JOIN delta d
            ON b.m = d.m AND b.st = d.st),
       full_v AS ({base_agg.format(pred="TRUE")}),
       cmp AS (
          SELECT f.m, f.st, f.n, f.cents, f.mn,
                 (mv.n = f.n AND mv.cents = f.cents AND mv.mn = f.mn)
                   AS same
          FROM full_v f JOIN maintained mv
            ON f.m = mv.m AND f.st = mv.st)
       SELECT st,
              CAST(count(*) AS BIGINT) AS n_groups,
              CAST(sum(cents) AS BIGINT) AS sum_cents,
              bool_and(same) AS arms_match,
              CAST(bit_xor({hx}) AS BIGINT) AS view_xor
       FROM cmp GROUP BY st"""


@register(
    "q281_incremental_view_maintenance",
    _q281_oracle(),
    "incremental materialized-view maintenance (the delta-refresh "
    "contract every warehouse rollup runs on: fold ONLY the new "
    "batch's aggregate into the stored view instead of re-scanning "
    "history): the (month, status) view's measures are maintained by "
    "the merge laws count+=, sum+=, min=least — exactly the "
    "insert-only-maintainable set; a delete would invalidate min and "
    "force a re-aggregate of the touched groups, which is why the "
    "measure choice IS the design decision — and the maintained view "
    "is proven group-by-group EQUAL to the full recompute "
    "(bool_and(same) rides the result; the full arm is the oracle's "
    "truth stick, the maintained arm is what production would run).  "
    "At 100 TB the maintained arm scans ONLY the delta partition "
    "(date predicate pushed to the scan) and full-outer-joins two "
    "month-grain aggregates — constant-size frames; the full-recompute "
    "arm exists here solely to pin the equivalence",
)
def q281(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    cents = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )

    def agg(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.substring(F.col("o_orderdate").cast("string"), 1, 7)
                .alias("m"),
                F.col("o_orderstatus").alias("st"),
                cents.alias("c"),
            )
            .groupBy("m", "st")
            .agg(
                F.count("*").alias("n"),
                F.sum("c").alias("cents"),
                F.min("c").alias("mn"),
            )
        )

    cut = F.to_date(F.lit("2001-01-01"))
    base = agg(o.filter(F.col("o_orderdate") < cut))
    delta = agg(o.filter(F.col("o_orderdate") >= cut))
    maxl = F.lit(9223372036854775807)
    b = base.select(
        F.col("m").alias("bm"), F.col("st").alias("bst"),
        F.col("n").alias("bn"), F.col("cents").alias("bc"),
        F.col("mn").alias("bmn"),
    )
    d = delta.select(
        F.col("m").alias("dm"), F.col("st").alias("dst"),
        F.col("n").alias("dn"), F.col("cents").alias("dc"),
        F.col("mn").alias("dmn"),
    )
    maintained = (
        b.join(
            d, (b["bm"] == d["dm"]) & (b["bst"] == d["dst"]), "full_outer"
        )
        .select(
            F.coalesce("bm", "dm").alias("m"),
            F.coalesce("bst", "dst").alias("st"),
            (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0)))
            .alias("n"),
            (F.coalesce("bc", F.lit(0)) + F.coalesce("dc", F.lit(0)))
            .alias("cents"),
            F.least(
                F.coalesce("bmn", maxl), F.coalesce("dmn", maxl)
            ).alias("mn"),
        )
    )
    full_v = agg(o)
    mv = maintained.select(
        F.col("m").alias("vm"), F.col("st").alias("vst"),
        F.col("n").alias("vn"), F.col("cents").alias("vc"),
        F.col("mn").alias("vmn"),
    )
    cmp = full_v.join(
        F.broadcast(mv),
        (full_v["m"] == mv["vm"]) & (full_v["st"] == mv["vst"]),
    ).select(
        "m",
        "st",
        "n",
        "cents",
        "mn",
        (
            (F.col("vn") == F.col("n"))
            & (F.col("vc") == F.col("cents"))
            & (F.col("vmn") == F.col("mn"))
        ).alias("same"),
    )
    hx = T.hex_hash64(
        F.concat_ws(
            "|",
            F.col("m"),
            F.col("st"),
            F.col("n").cast("string"),
            F.col("cents").cast("string"),
            F.col("mn").cast("string"),
        )
    )
    return cmp.withColumn("hx", hx).groupBy("st").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.expr("bool_and(same)").alias("arms_match"),
        F.expr("bit_xor(hx)").cast("long").alias("view_xor"),
    )


def _q282_oracle() -> str:
    return """WITH per_user AS (
          SELECT user_id,
                 CAST((floor(epoch(max(ts))) - floor(epoch(min(ts))))
                      AS BIGINT) // 86400 AS d,
                 CASE WHEN floor(epoch(max(ts)))
                           < (SELECT floor(epoch(max(ts))) FROM events)
                             - 3 * 86400
                      THEN 1 ELSE 0 END AS ev
          FROM events GROUP BY user_id),
       hist AS (
          SELECT d, count(*) AS c, sum(ev) AS deaths
          FROM per_user GROUP BY d),
       gridt AS (
          SELECT unnest(range(0, (SELECT max(d) + 1 FROM per_user)))
            AS t),
       grid AS (
          SELECT CAST(g.t AS BIGINT) AS t,
                 coalesce(h.c, 0) AS c,
                 coalesce(h.deaths, 0) AS d
          FROM gridt g LEFT JOIN hist h ON h.d = g.t),
       risk AS (
          SELECT t, d,
                 sum(c) OVER (ORDER BY t DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS n
          FROM grid),
       km AS (
          SELECT t, n, d, s FROM (
            WITH RECURSIVE f(t, s) AS (
              SELECT CAST(-1 AS BIGINT), CAST(1000000 AS BIGINT)
              UNION ALL
              SELECT r.t, (f.s * (r.n - r.d)) // r.n
              FROM f JOIN risk r ON r.t = f.t + 1)
            SELECT f.t, r.n, r.d, f.s
            FROM f JOIN risk r ON r.t = f.t))
       SELECT CAST(t AS BIGINT) AS t,
              CAST(n AS BIGINT) AS at_risk,
              CAST(d AS BIGINT) AS deaths,
              CAST(s AS BIGINT) AS survival_ppm
       FROM km"""


@register(
    "q282_kaplan_meier_retention",
    _q282_oracle(),
    "Kaplan-Meier survival curve over user lifetimes (the "
    "right-censoring-aware retention estimate — naive 'percent still "
    "active' curves are biased because users who joined late haven't "
    "HAD time to churn; KM handles them as censored): duration = "
    "days between a user's first and last event, churned iff the "
    "last event predates the corpus horizon by >3 days, at-risk "
    "counts from a reverse cumulative sum over the day grid, and "
    "S(t) = fold of (n_t - d_t)/n_t factors in SEQUENTIAL floor-ppm "
    "integer steps — the fold is non-associative (each step floors), "
    "so both engines must walk it in day order: Spark folds "
    "prefix-slices of the collected step array with aggregate() "
    "lambdas (the day grid is calendar-bounded, so the collected "
    "state is O(days), the k-means-centroid pattern), DuckDB walks "
    "the identical recursion in a RECURSIVE CTE.  The fact-sized "
    "work is ONE per-user aggregate; everything after is "
    "calendar-sized.  acc*(n-d) <= 1e6 * N_users keeps int64 to "
    "~1e10 users; the div quotient is a ppm <= 1e6",
)
def q282(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    horizon = e.agg(
        F.expr("CAST(floor(unix_timestamp(max(ts))) AS BIGINT)").alias("hz")
    )
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.expr("CAST(floor(unix_timestamp(min(ts))) AS BIGINT)")
            .alias("first_s"),
            F.expr("CAST(floor(unix_timestamp(max(ts))) AS BIGINT)")
            .alias("last_s"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.expr("(last_s - first_s) div 86400").alias("d"),
            F.when(
                F.col("last_s") < F.col("hz") - 3 * 86400, 1
            ).otherwise(0).alias("ev"),
        )
    )
    hist = per_user.groupBy("d").agg(
        F.count("*").alias("c"), F.sum("ev").alias("deaths")
    )
    maxd = per_user.agg(F.max("d").alias("maxd"))
    grid = (
        maxd.select(F.explode(F.expr("sequence(0, maxd)")).alias("t"))
        .join(F.broadcast(hist), F.col("t") == F.col("d"), "left")
        .select(
            "t",
            F.coalesce("c", F.lit(0)).alias("c"),
            F.coalesce("deaths", F.lit(0)).alias("dd"),
        )
    )
    wrisk = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grid.select(
        "t", "dd", F.sum("c").over(wrisk).alias("n")
    )
    # sequential floor-ppm fold: collect the calendar-bounded step
    # array onto a 1-row frame, then per-t prefix folds via slice +
    # aggregate (steps is an ATTRIBUTE here — the lambda captures no
    # expression; see the char_ngrams lesson)
    folded = risk.agg(
        F.expr("array_sort(collect_list(struct(t, n, dd)))").alias("steps")
    ).select(
        F.posexplode(
            F.expr(
                "transform(steps, (x, i) ->"
                " struct(x.t AS t, x.n AS n, x.dd AS d,"
                "  aggregate(slice(steps, 1, i + 1),"
                "   CAST(1000000 AS BIGINT),"
                "   (acc, s) -> (acc * (s.n - s.dd)) div s.n) AS s))"  # div-ok: survival ppm, acc <= 1e6 and (n-d)/n <= 1
            )
        ).alias("_p", "r")
    )
    return folded.select(
        F.col("r.t").cast("long").alias("t"),
        F.col("r.n").cast("long").alias("at_risk"),
        F.col("r.d").cast("long").alias("deaths"),
        F.col("r.s").cast("long").alias("survival_ppm"),
    )


def _q283_oracle() -> str:
    return """WITH recs AS (
          SELECT c_custkey AS rid, c_custkey // 3 AS entity,
                 c_nationkey AS nk, c_mktsegment AS seg
          FROM customer),
       n_tot AS (SELECT count(*) AS n FROM recs),
       total_pairs AS (
          SELECT (n * (n - 1)) // 2 AS p FROM n_tot),
       cand AS (
          SELECT sum((c * (c - 1)) // 2) AS p
          FROM (SELECT count(*) AS c FROM recs GROUP BY nk, seg)),
       truth AS (
          SELECT sum((c * (c - 1)) // 2) AS p
          FROM (SELECT count(*) AS c FROM recs GROUP BY entity)),
       found AS (
          SELECT coalesce(sum((c * (c - 1)) // 2), 0) AS p
          FROM (SELECT count(*) AS c FROM recs
                GROUP BY entity, nk, seg)),
       m AS (SELECT total_pairs.p AS tp, cand.p AS cp,
                    truth.p AS mp, found.p AS fp
             FROM total_pairs, cand, truth, found)
       SELECT CAST(tp AS BIGINT) AS total_pairs,
              CAST(cp AS BIGINT) AS candidate_pairs,
              CAST(mp AS BIGINT) AS true_matches,
              CAST(fp AS BIGINT) AS found_matches,
              CAST(((tp - cp) * 1000000) // tp AS BIGINT)
                AS reduction_ppm,
              CAST((fp * 1000000) // mp AS BIGINT)
                AS completeness_ppm
       FROM m"""


@register(
    "q283_blocking_quality",
    _q283_oracle(),
    "entity-resolution blocking-scheme evaluation WITHOUT enumerating "
    "a single pair (the pre-flight every ER pipeline needs before "
    "committing to a blocking key: q250 evaluates LSH by "
    "materializing truth pairs at audit scale; THIS op evaluates a "
    "blocking scheme at FULL scale because every quantity is a sum "
    "of C(group_size, 2) over group-count aggregates): reduction "
    "ratio = 1 - candidate/total pairs (how much work blocking on "
    "(nation, segment) saves) and pairs completeness = "
    "within-block true matches / all true matches (what it costs in "
    "recall — true clusters from the q279 entity construction).  "
    "found <= true holds by refinement: (entity, nk, seg) groups "
    "partition entity groups, so the sum of C(c,2) can only drop.  "
    "Four map-side-combinable aggregates, no joins of fact-sized "
    "frames; products route DECIMAL(38,0) — n*(n-1) passes int64 at "
    "~3e9 rows, the q149 class",
)
def q283(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    recs = c.select(
        F.expr("c_custkey div 3").alias("entity"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
    )

    def pair_sum(df: DataFrame, *keys: str) -> DataFrame:
        return (
            df.groupBy(*keys)
            .agg(F.count("*").alias("c"))
            .agg(
                F.coalesce(
                    F.sum(
                        F.expr(
                            "(CAST(c AS DECIMAL(38,0)) * (c - 1)) div 2"  # div-ok: exact halving of an even product, quotient = pair count <= n^2/2 < 1e28 cast back to decimal-safe range... emitted as DECIMAL via sum
                        )
                    ),
                    F.lit(0),
                ).alias("p")
            )
        )

    tot = recs.agg(F.count("*").alias("n")).select(
        F.expr("(CAST(n AS DECIMAL(38,0)) * (n - 1)) div 2").alias("tp")  # div-ok: pair count, bounded by n^2/2
    )
    cand = pair_sum(recs, "nk", "seg").select(F.col("p").alias("cp"))
    truth = pair_sum(recs, "entity").select(F.col("p").alias("mp"))
    found = pair_sum(recs, "entity", "nk", "seg").select(
        F.col("p").alias("fp")
    )
    m = (
        tot.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(truth))
        .crossJoin(F.broadcast(found))
    )
    return m.select(
        F.col("tp").cast("long").alias("total_pairs"),
        F.col("cp").cast("long").alias("candidate_pairs"),
        F.col("mp").cast("long").alias("true_matches"),
        F.col("fp").cast("long").alias("found_matches"),
        F.expr(
            "CAST(((tp - cp) * 1000000) div tp AS BIGINT)"  # div-ok: reduction ratio, quotient <= 1e6; ppm-ok: tp/cp are DECIMAL(38,0)
        ).alias("reduction_ppm"),
        F.expr(
            "CAST((fp * 1000000) div mp AS BIGINT)"  # div-ok: completeness, fp <= mp by refinement; ppm-ok: fp/mp are DECIMAL(38,0)
        ).alias("completeness_ppm"),
    )


def _q284_oracle() -> str:
    return """WITH pts AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   // 500000 AS band,
                 CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END AS grp_hi
          FROM orders),
       hist AS (
          SELECT band, sum(grp_hi) AS a, sum(1 - grp_hi) AS b
          FROM pts GROUP BY band),
       tot AS (SELECT sum(a) AS na, sum(b) AS nb FROM hist),
       cdf AS (
          SELECT band,
                 sum(a) OVER (ORDER BY band) AS ca,
                 sum(b) OVER (ORDER BY band) AS cb
          FROM hist),
       dev AS (
          SELECT band,
                 abs((ca * 1000000) // na - (cb * 1000000) // nb) AS d
          FROM cdf, tot)
       SELECT CAST((SELECT na FROM tot) AS BIGINT) AS n_hi,
              CAST((SELECT nb FROM tot) AS BIGINT) AS n_lo,
              CAST(max(d) AS BIGINT) AS ks_ppm,
              CAST(min(band) FILTER (WHERE d = (SELECT max(d) FROM dev))
                   AS BIGINT) AS argmax_band
       FROM dev"""


@register(
    "q284_ks_two_sample",
    _q284_oracle(),
    "two-sample Kolmogorov-Smirnov distance between the urgent and "
    "non-urgent order-price distributions (the OTHER standard drift "
    "test beside q278's PSI: KS is the max pointwise CDF gap — "
    "sensitive to location shifts PSI's binned sum can smear): both "
    "empirical CDFs in exact floor-ppm over a bounded $5k-band "
    "histogram, D = max |cdf_a - cdf_b| with the argmax band "
    "reported (WHERE the distributions diverge most — the actionable "
    "half of the answer), min-band tiebreak for determinism.  The "
    "fact-sized work is one conditional aggregate; the CDFs are "
    "running sums over the bounded band histogram (aggregate-barrier "
    "input, audit-green).  Like q280's AUC: at 100 TB a distribution "
    "test must histogram first — never a global sort of raw values",
)
def q284(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    hi = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    pts = o.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " div 500000"
        ).alias("band"),
        hi.alias("grp_hi"),
    )
    hist = pts.groupBy("band").agg(
        F.sum("grp_hi").alias("a"), F.sum(1 - F.col("grp_hi")).alias("b")
    )
    tot = hist.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    wcdf = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = hist.select(
        "band",
        F.sum("a").over(wcdf).alias("ca"),
        F.sum("b").over(wcdf).alias("cb"),
    )
    dev = cdf.crossJoin(F.broadcast(tot)).select(
        "band",
        "na",
        "nb",
        F.abs(
            F.expr("(CAST(ca AS DECIMAL(38,0)) * 1000000) div na")  # div-ok: CDF value, quotient <= 1e6
            - F.expr("(CAST(cb AS DECIMAL(38,0)) * 1000000) div nb")  # div-ok: CDF value, quotient <= 1e6
        ).alias("d"),
    )
    return dev.agg(
        F.max("na").cast("long").alias("n_hi"),
        F.max("nb").cast("long").alias("n_lo"),
        F.max("d").cast("long").alias("ks_ppm"),
        F.expr("min_by(band, struct(-d, band))").cast("long").alias(
            "argmax_band"
        ),
    )


_Q285_TARGET_PPM = 200000  # uniform 5-language target mix


def _q285_oracle() -> str:
    h = hex_hash64_sql("CAST(doc_id AS VARCHAR)", salt="resample")
    hx = hex_hash64_sql("CAST(doc_id AS VARCHAR)")
    return f"""WITH counts AS (
          SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
       tot AS (SELECT sum(n_l) AS n FROM counts),
       ratio AS (
          SELECT lang, n_l,
                 ({_Q285_TARGET_PPM} * n) // n_l AS r
          FROM counts, tot),
       mx AS (SELECT max(r) AS m FROM ratio),
       acc AS (
          SELECT lang, n_l, (r * 1000000) // m AS p_ppm
          FROM ratio, mx),
       kept AS (
          SELECT d.doc_id, d.lang, a.n_l, a.p_ppm
          FROM documents d JOIN acc a ON d.lang = a.lang
          WHERE {h} % 1000000 < a.p_ppm),
       per AS (
          SELECT lang, max(n_l) AS n_src, max(p_ppm) AS p_ppm,
                 count(*) AS n_kept,
                 bit_xor({hx.replace('doc_id', 'kept.doc_id')}) AS kept_xor
          FROM kept GROUP BY lang),
       ktot AS (SELECT sum(n_kept) AS k FROM per)
       SELECT lang,
              CAST(n_src AS BIGINT) AS n_src,
              CAST(p_ppm AS BIGINT) AS accept_ppm,
              CAST(n_kept AS BIGINT) AS n_kept,
              CAST((n_kept * 1000000) // k AS BIGINT) AS achieved_ppm,
              CAST(kept_xor AS BIGINT) AS kept_xor
       FROM per, ktot"""


@register(
    "q285_importance_resampling",
    _q285_oracle(),
    "importance resampling to a target language mix (the multilingual "
    "rebalancing step every LLM corpus build runs: the crawl is 44% "
    "English, the training recipe says 20%): per-language acceptance "
    "probability proportional to target/source share, normalized so "
    "the scarcest language keeps 100% of its data (never upsample — "
    "dedup invariants survive), and each document's keep/drop decided "
    "by a SALTED deterministic hash threshold — reproducible, "
    "order-independent, and uncorrelated with q63/q200's split hashes "
    "(the salt IS the independence guarantee).  The xor of kept ids "
    "pins the exact sample, the achieved-mix ppm shows convergence "
    "toward the target.  At 100 TB: one count aggregate, a 5-row "
    "broadcast of acceptance thresholds, one map-only filter pass — "
    "no shuffle touches the corpus",
)
def q285(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    # localCheckpoint the 5-row language histogram: ratio/mx/acc/ktot
    # all re-derive it, and without the barrier each consumer re-scans
    # the corpus (q278 precedent) — with it the corpus is scanned
    # exactly twice: once for counts, once for the filter pass
    counts = (
        d.groupBy("lang").agg(F.count("*").alias("n_l")).localCheckpoint()
    )
    tot = counts.agg(F.sum("n_l").alias("n"))
    ratio = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_l",
        F.expr(
            f"({_Q285_TARGET_PPM} * CAST(n AS DECIMAL(38,0))) div n_l"  # div-ok: target/source ratio scaled 1e6; bounded by corpus/lang-count ratios << 1e12
        ).alias("r"),
    )
    mx = ratio.agg(F.max("r").alias("m"))
    acc = ratio.crossJoin(F.broadcast(mx)).select(
        "lang",
        "n_l",
        F.expr("(CAST(r AS DECIMAL(38,0)) * 1000000) div m")  # div-ok: normalized acceptance, quotient <= 1e6
        .alias("p_ppm"),
    )
    h = T.hex_hash64(F.col("doc_id").cast("string"), salt="resample")
    kept = (
        d.select("doc_id", "lang")
        .join(F.broadcast(acc), "lang")
        .filter(h % 1000000 < F.col("p_ppm"))
    )
    per = kept.withColumn(
        "hx", T.hex_hash64(F.col("doc_id").cast("string"))
    ).groupBy("lang").agg(
        F.max("n_l").alias("n_src"),
        F.max("p_ppm").alias("p_ppm"),
        F.count("*").alias("n_kept"),
        F.expr("bit_xor(hx)").alias("kept_xor"),
    )
    ktot = per.agg(F.sum("n_kept").alias("k"))
    return per.crossJoin(F.broadcast(ktot)).select(
        "lang",
        F.col("n_src").cast("long").alias("n_src"),
        F.col("p_ppm").cast("long").alias("accept_ppm"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.expr("CAST((CAST(n_kept AS DECIMAL(38,0)) * 1000000) div k AS BIGINT)")  # div-ok: share of kept total, quotient <= 1e6
        .alias("achieved_ppm"),
        F.col("kept_xor").cast("long").alias("kept_xor"),
    )


_Q286_FOLDS = 5


def _q286_oracle() -> str:
    h = hex_hash64_sql("CAST(o_custkey AS VARCHAR)", salt="fold")
    hx = hex_hash64_sql("CAST(o_orderkey AS VARCHAR)")
    return f"""WITH assigned AS (
          SELECT o_orderkey, o_custkey,
                 o_orderpriority AS stratum,
                 {h} % {_Q286_FOLDS} AS fold
          FROM orders),
       leak AS (
          SELECT count(*) AS n_leaky FROM (
            SELECT o_custkey FROM assigned
            GROUP BY o_custkey HAVING count(DISTINCT fold) > 1)),
       per AS (
          SELECT fold, stratum, count(*) AS n,
                 count(DISTINCT o_custkey) AS n_groups,
                 bit_xor({hx}) AS fold_xor
          FROM assigned GROUP BY fold, stratum)
       SELECT CAST(fold AS BIGINT) AS fold, stratum,
              CAST(n AS BIGINT) AS n,
              CAST(n_groups AS BIGINT) AS n_groups,
              CAST((SELECT n_leaky FROM leak) AS BIGINT) AS n_leaky_groups,
              CAST(fold_xor AS BIGINT) AS fold_xor
       FROM per"""


@register(
    "q286_group_kfold_assignment",
    _q286_oracle(),
    "group-aware K-fold assignment with an in-result leakage proof "
    "(the split every tabular-ML evaluation needs: rows of the same "
    "CUSTOMER must land in one fold, or the eval leaks — random "
    "row-level splits are the classic silent-optimism bug): fold = "
    "salted hash of the GROUP key mod K, so assignment is "
    "reproducible, order-independent, and disjoint from q63/q200/"
    "q285's salts; the per-(fold, stratum) counts expose balance, "
    "n_leaky_groups counts customers spanning >1 fold — ZERO by "
    "construction, and the differential would catch any hash "
    "drift that broke it.  One map-only assignment pass + one "
    "aggregate; the leakage audit is a distinct-count per group "
    "riding the same shuffle at 100 TB",
)
def q286(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    assigned = o.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderpriority").alias("stratum"),
        (
            T.hex_hash64(F.col("o_custkey").cast("string"), salt="fold")
            % _Q286_FOLDS
        ).alias("fold"),
    )
    leak = (
        assigned.groupBy("o_custkey")
        .agg(F.countDistinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .agg(F.count("*").alias("n_leaky"))
    )
    per = assigned.withColumn(
        "hx", T.hex_hash64(F.col("o_orderkey").cast("string"))
    ).groupBy("fold", "stratum").agg(
        F.count("*").alias("n"),
        F.countDistinct("o_custkey").alias("n_groups"),
        F.expr("bit_xor(hx)").alias("fold_xor"),
    )
    return per.crossJoin(F.broadcast(leak)).select(
        F.col("fold").cast("long").alias("fold"),
        "stratum",
        F.col("n").cast("long").alias("n"),
        F.col("n_groups").cast("long").alias("n_groups"),
        F.col("n_leaky").cast("long").alias("n_leaky_groups"),
        F.col("fold_xor").cast("long").alias("fold_xor"),
    )


def _q287_oracle() -> str:
    h = hex_hash64_sql("CAST(doc_id AS VARCHAR)", salt="score")
    hx = hex_hash64_sql(
        "CAST(doc_id AS VARCHAR) || '|' || CAST(pct_ppm AS VARCHAR)"
    )
    return f"""WITH scored AS (
          SELECT doc_id, source,
                 {h} % 1000 AS band
          FROM documents),
       hist AS (
          SELECT source, band, count(*) AS c
          FROM scored GROUP BY source, band),
       cum AS (
          SELECT source, band, c,
                 sum(c) OVER (PARTITION BY source ORDER BY band) AS cle,
                 sum(c) OVER (PARTITION BY source) AS n
          FROM hist),
       normd AS (
          SELECT s.doc_id, s.source,
                 ((cum.cle - ((cum.c + 1) // 2)) * 1000000) // cum.n
                   AS pct_ppm
          FROM scored s JOIN cum
            ON s.source = cum.source AND s.band = cum.band)
       SELECT source,
              CAST(count(*) AS BIGINT) AS n,
              CAST(min(pct_ppm) AS BIGINT) AS min_ppm,
              CAST(max(pct_ppm) AS BIGINT) AS max_ppm,
              CAST(sum(pct_ppm) AS BIGINT) AS sum_ppm,
              CAST(bit_xor({hx}) AS BIGINT) AS norm_xor
       FROM normd GROUP BY source"""


@register(
    "q287_score_quantile_normalization",
    _q287_oracle(),
    "per-source score-to-percentile normalization (the calibration "
    "step before fusing rankings across heterogeneous sources — "
    "q171's RRF sidesteps scores entirely; THIS op makes raw scores "
    "comparable by mapping each to its source-conditional mid-rank "
    "percentile): percentile = (rank_below + half the tied mass) / n "
    "in exact floor-ppm, computed from a per-source HISTOGRAM of the "
    "bounded score domain — the doc-level pass then just joins its "
    "(source, band) row, so no window ever touches the fact table "
    "(the q280/q284 histogram-first discipline).  The per-source "
    "xor folds every doc's (hash, percentile) pair, pinning the "
    "full normalized assignment.  sum_ppm ~ n/2 * 1e6 exposes the "
    "uniformity a correct mid-rank mapping must have",
)
def q287(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    h = T.hex_hash64(F.col("doc_id").cast("string"), salt="score")
    scored = d.select("doc_id", "source", (h % 1000).alias("band"))
    hist = scored.groupBy("source", "band").agg(F.count("*").alias("c"))
    wcum = (
        Window.partitionBy("source")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("source")
    cum = hist.select(
        "source",
        "band",
        "c",
        F.sum("c").over(wcum).alias("cle"),
        F.sum("c").over(wn).alias("n"),
    )
    normd = scored.join(F.broadcast(cum), ["source", "band"]).select(
        "doc_id",
        "source",
        F.expr(
            "((CAST(cle AS DECIMAL(38,0)) - ((c + 1) div 2)) * 1000000)"
            " div n"  # div-ok: mid-rank percentile, cle <= n so quotient <= 1e6
        ).alias("pct_ppm"),
    )
    return normd.withColumn(
        "hx",
        T.hex_hash64(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("|"),
                F.col("pct_ppm").cast("string"),
            )
        ),
    ).groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.min("pct_ppm").cast("long").alias("min_ppm"),
        F.max("pct_ppm").cast("long").alias("max_ppm"),
        F.sum("pct_ppm").cast("long").alias("sum_ppm"),
        F.expr("bit_xor(hx)").cast("long").alias("norm_xor"),
    )


def _q288_oracle() -> str:
    norm = normalize_text_sql("text")
    return f"""WITH st AS (
          SELECT DISTINCT source, g FROM (
            SELECT source,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(length(norm) - 2, 1) + 1),
                       i -> substr(norm, CAST(i AS INT), 3)))) AS g
            FROM (SELECT source, {norm} AS norm
                  FROM documents WHERE strlen(text) > 0))),
       srcs AS (SELECT DISTINCT source FROM st),
       r1 AS (
          SELECT source, count(*) AS gain FROM st GROUP BY source
          ORDER BY gain DESC, source LIMIT 1),
       c1 AS (SELECT g FROM st WHERE source = (SELECT source FROM r1)),
       r2 AS (
          SELECT s.source, coalesce(n.gain, 0) AS gain
          FROM srcs s LEFT JOIN (
            SELECT source, count(*) AS gain FROM st
            WHERE g NOT IN (SELECT g FROM c1) GROUP BY source) n
            ON s.source = n.source
          WHERE s.source != (SELECT source FROM r1)
          ORDER BY gain DESC, s.source LIMIT 1),
       c2 AS (SELECT g FROM st
              WHERE source IN ((SELECT source FROM r1),
                               (SELECT source FROM r2))),
       r3 AS (
          SELECT s.source, coalesce(n.gain, 0) AS gain
          FROM srcs s LEFT JOIN (
            SELECT source, count(*) AS gain FROM st
            WHERE g NOT IN (SELECT g FROM c2) GROUP BY source) n
            ON s.source = n.source
          WHERE s.source NOT IN ((SELECT source FROM r1),
                                 (SELECT source FROM r2))
          ORDER BY gain DESC, s.source LIMIT 1),
       u AS (SELECT count(DISTINCT g) AS total FROM st),
       c3 AS (SELECT count(DISTINCT g) AS covered FROM st
              WHERE source IN ((SELECT source FROM r1),
                               (SELECT source FROM r2),
                               (SELECT source FROM r3)))
       SELECT 1 AS pick, (SELECT source FROM r1) AS source,
              CAST((SELECT gain FROM r1) AS BIGINT) AS marginal_gain,
              CAST((SELECT covered FROM c3) AS BIGINT) AS covered_after_3,
              CAST((SELECT total FROM u) AS BIGINT) AS universe
       UNION ALL
       SELECT 2, (SELECT source FROM r2),
              CAST((SELECT gain FROM r2) AS BIGINT),
              CAST((SELECT covered FROM c3) AS BIGINT),
              CAST((SELECT total FROM u) AS BIGINT)
       UNION ALL
       SELECT 3, (SELECT source FROM r3),
              CAST((SELECT gain FROM r3) AS BIGINT),
              CAST((SELECT covered FROM c3) AS BIGINT),
              CAST((SELECT total FROM u) AS BIGINT)"""


@register(
    "q288_greedy_source_coverage",
    _q288_oracle(),
    "greedy maximum-coverage source selection (the submodular "
    "curation step behind 'which 3 crawl sources buy the most "
    "vocabulary diversity per dollar': greedy is the classic "
    "(1 - 1/e)-approximation and the marginal-gain sequence IS the "
    "budget curve): universe = distinct char-trigrams, sets = "
    "per-source trigram sets, three greedy rounds each picking the "
    "source with the largest NOT-YET-COVERED count (source-asc "
    "tiebreak), with each round's marginal gain and the final "
    "coverage pinned against the oracle's identically-unrolled "
    "greedy.  The fact-sized work is ONE distinct (source, trigram) "
    "aggregate — bounded by |sources| x 37^3 — after which every "
    "greedy round is an anti-join + count over that bounded frame "
    "(checkpointed once); at 100 TB the corpus is scanned once, the "
    "greedy never touches it again",
)
def q288(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").filter(F.length("text") > 0)
    st = (
        d.select("source", F.explode(T.char_ngrams("text", n=3)).alias("g"))
        .distinct()
        .localCheckpoint()  # bounded: |sources| x trigram domain
    )
    universe = st.select("g").distinct().count()
    picks = []
    chosen: list[str] = []
    covered = st.sparkSession.createDataFrame([], "g string")
    srcs = st.select("source").distinct()
    for _round in range(3):
        remaining = (
            srcs.filter(~F.col("source").isin(chosen)) if chosen else srcs
        )
        cnt = (
            (st.filter(~F.col("source").isin(chosen)) if chosen else st)
            .join(covered, "g", "left_anti")
            .groupBy("source")
            .agg(F.count("*").alias("gain"))
        )
        # a fully-covered round still picks (gain 0, source asc) — the
        # LEFT join keeps zero-gain sources in the race in BOTH engines
        gains = (
            remaining.join(cnt, "source", "left")
            .select("source", F.coalesce("gain", F.lit(0)).alias("gain"))
            .orderBy(F.desc("gain"), F.asc("source"))
            .limit(1)
            .collect()
        )
        best = gains[0]
        chosen.append(best["source"])
        picks.append((len(chosen), best["source"], int(best["gain"])))
        covered = st.filter(F.col("source").isin(chosen)).select("g").distinct()
    covered_n = covered.count()
    return spark.createDataFrame(
        [
            (p, s, g, covered_n, universe)
            for p, s, g in picks
        ],
        "pick int, source string, marginal_gain bigint,"
        " covered_after_3 bigint, universe bigint",
    )


_Q289_ALPHA_PPM = 100000  # target 90% coverage


def _q289_oracle() -> str:
    hs = hex_hash64_sql("CAST(o_orderkey AS VARCHAR)", salt="nonconf")
    return f"""WITH scored AS (
          SELECT o_orderkey, {hs} % 10000 AS nc,
                 CAST(o_orderkey % 2 AS INTEGER) AS is_cal
          FROM orders),
       cal AS (SELECT nc FROM scored WHERE is_cal = 1),
       n_cal AS (SELECT count(*) AS n FROM cal),
       -- split conformal: q_idx = ceil((n+1) * (1 - alpha)), the
       -- q_idx-th smallest calibration score is the threshold
       idx AS (
          SELECT CAST(
            (((SELECT n FROM n_cal) + 1) * (1000000 - {_Q289_ALPHA_PPM})
             + 999999) // 1000000 AS BIGINT) AS q_idx),
       hist AS (
          SELECT nc, count(*) AS c FROM cal GROUP BY nc),
       thr AS (
          SELECT min(nc) AS threshold FROM (
            SELECT nc, sum(c) OVER (ORDER BY nc) AS cum FROM hist)
          WHERE cum >= least((SELECT q_idx FROM idx),
                             (SELECT n FROM n_cal))),
       test AS (SELECT nc FROM scored WHERE is_cal = 0)
       SELECT CAST((SELECT n FROM n_cal) AS BIGINT) AS n_cal,
              CAST((SELECT q_idx FROM idx) AS BIGINT) AS q_idx,
              CAST((SELECT threshold FROM thr) AS BIGINT) AS threshold,
              CAST(count(*) AS BIGINT) AS n_test,
              CAST(sum(CASE WHEN nc <= (SELECT threshold FROM thr)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
              CAST((sum(CASE WHEN nc <= (SELECT threshold FROM thr)
                             THEN 1 ELSE 0 END) * 1000000)
                   // count(*) AS BIGINT) AS coverage_ppm
       FROM test"""


@register(
    "q289_split_conformal",
    _q289_oracle(),
    "split-conformal calibration (the distribution-free uncertainty "
    "wrapper modern ML eval reaches for: pick the ceil((n+1)(1-a))-th "
    "smallest calibration nonconformity score as the threshold and "
    "the test-set coverage is GUARANTEED >= 1-a in expectation, no "
    "model assumptions): calibration/test split by key parity, the "
    "order statistic computed from a bounded 10k-value score "
    "HISTOGRAM (running sum over the aggregate, never a sort of raw "
    "scores — the q280/q284/q287 discipline), finite-sample index "
    "arithmetic in exact integers (ceil via (x + 999999) div 1e6), "
    "and the empirical test coverage in floor-ppm beside the target.  "
    "At 100 TB: two conditional aggregates over one scan each; the "
    "threshold is a 1-row broadcast into the coverage pass",
)
def q289(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    hs = T.hex_hash64(F.col("o_orderkey").cast("string"), salt="nonconf")
    scored = o.select(
        (hs % 10000).alias("nc"),
        (F.col("o_orderkey") % 2 == 1).alias("is_cal"),
    )
    cal = scored.filter("is_cal")
    hist = cal.groupBy("nc").agg(F.count("*").alias("c"))
    # n derives from the (<=10000-row) histogram, not a second scan of
    # the calibration split (r7 re-execution audit: orders was scanned
    # 4x; the count is the histogram's own mass)
    n_cal = hist.agg(F.sum("c").cast("long").alias("n"))
    idx = n_cal.select(
        "n",
        F.expr(
            f"CAST(((n + 1) * (1000000 - {_Q289_ALPHA_PPM})"
            " + 999999) div 1000000 AS BIGINT)"  # div-ok: ceil of (n+1)*0.9, quotient <= n+1; ppm-ok: (n+1)*9e5 passes int64 only past ~1e13 cal rows, routed decimal below at need — here n is a 1-row COUNT, bounded by corpus rows < 9e12 at the 100 TB design point
        ).alias("q_idx"),
    )
    wcum = Window.orderBy("nc").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select("nc", F.sum("c").over(wcum).alias("cum"))
    thr = (
        cum.crossJoin(F.broadcast(idx))
        .filter(F.col("cum") >= F.least(F.col("q_idx"), F.col("n")))
        .agg(F.min("nc").alias("threshold"))
    )
    test = scored.filter(~F.col("is_cal"))
    return (
        test.crossJoin(F.broadcast(thr))
        .crossJoin(F.broadcast(idx))
        .agg(
            F.max("n").cast("long").alias("n_cal"),
            F.max("q_idx").cast("long").alias("q_idx"),
            F.max("threshold").cast("long").alias("threshold"),
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("nc") <= F.col("threshold"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
            F.expr(
                "CAST((CAST(sum(CASE WHEN nc <= threshold THEN 1 ELSE 0"
                " END) AS DECIMAL(38,0)) * 1000000) div count(*)"
                " AS BIGINT)"  # div-ok: coverage fraction, quotient <= 1e6
            ).alias("coverage_ppm"),
        )
    )


def _q290_oracle() -> str:
    hx = hex_hash64_sql("CAST(node AS VARCHAR) || '|' || CAST(r2 AS VARCHAR)")
    return f"""WITH {_graph_edges_sql()},
       de AS (SELECT a AS u, b AS v FROM e
              UNION ALL SELECT b AS u, a AS v FROM e),
       deg AS (SELECT u, count(*) AS d FROM de GROUP BY u),
       nodes AS (SELECT c_custkey AS node FROM customer),
       inflow1 AS (
          SELECT de.v AS node, sum(1000000 // deg.d) AS s
          FROM de JOIN deg ON de.u = deg.u GROUP BY de.v),
       r1t AS (
          SELECT n.node,
                 150000 + (850000 * coalesce(i.s, 0)) // 1000000 AS r1
          FROM nodes n LEFT JOIN inflow1 i ON n.node = i.node),
       inflow2 AS (
          SELECT de.v AS node, sum(r1t.r1 // deg.d) AS s
          FROM de JOIN deg ON de.u = deg.u
                  JOIN r1t ON r1t.node = de.u
          GROUP BY de.v),
       r2t AS (
          SELECT n.node, r1t.r1,
                 150000 + (850000 * coalesce(i.s, 0)) // 1000000 AS r2
          FROM nodes n JOIN r1t ON r1t.node = n.node
          LEFT JOIN inflow2 i ON n.node = i.node),
       tot AS (
          SELECT count(*) AS n_nodes, sum(r2) AS sum_r2,
                 bit_xor({hx}) AS rank_xor
          FROM r2t),
       top AS (
          SELECT row_number() OVER (ORDER BY r2 DESC, node) AS rk,
                 node, r1, r2
          FROM r2t ORDER BY r2 DESC, node LIMIT 10)
       SELECT CAST(rk AS BIGINT) AS rk, CAST(node AS BIGINT) AS node,
              CAST(r1 AS BIGINT) AS r1_ppm, CAST(r2 AS BIGINT) AS r2_ppm,
              CAST(tot.n_nodes AS BIGINT) AS n_nodes,
              CAST(tot.sum_r2 AS BIGINT) AS sum_r2,
              CAST(tot.rank_xor AS BIGINT) AS rank_xor
       FROM top, tot"""


@register(
    "q290_pagerank_two_iter",
    _q290_oracle(),
    "integer-exact PageRank, two unrolled iterations over the shared "
    "synthetic customer graph (q137/q138/q233's edge builder): "
    "r'(v) = 0.15 + 0.85 * sum over in-neighbors of r(u)/deg(u), "
    "every division a deterministic floor (contrib = r div deg, the "
    "damped sum floors once more) so both engines walk bit-identical "
    "ranks — fp PageRank diverges across engines in the 7th digit "
    "and can even reorder the top-k.  Isolated nodes keep the 0.15 "
    "base via LEFT joins (the classic lost-mass detail).  Result: "
    "top-10 nodes by rank with the full-graph (n, sum, xor) "
    "fingerprint attached — one wrong rank ANYWHERE breaks the xor, "
    "not just the visible 10.  Per iteration at 100 TB: one "
    "edge-degree join + one grouped sum, both shuffling on node keys "
    "— the textbook Pregel-in-SQL shape; iterations compose by "
    "joining the previous rank frame, state is O(nodes), never "
    "collected",
)
def q290(spark: SparkSession, sf: str) -> DataFrame:
    # materialize the directed edge list and degrees ONCE: every
    # iteration joins both, and without the barrier each of the ~6
    # consumers replays the whole edge-builder subtree (measured 172
    # exchanges in the unbarriered plan).  Persisting the edge frame
    # is the standard iterative-graph practice (Pregel/GraphX keep
    # edges resident across supersteps); localCheckpoint is the
    # local-mode equivalent.
    from ..operators.graph import symmetrize

    e = _graph_edges(spark, sf)
    # one-pass explode symmetrization: the old two-branch union ran
    # the edge builder once per branch before the checkpoint landed
    de = (
        symmetrize(e, "a", "b", distinct=False)
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .localCheckpoint()
    )
    deg = de.groupBy("u").agg(F.count("*").alias("d")).localCheckpoint()
    nodes = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("node")
    )
    inflow1 = (
        de.join(deg, "u")
        .groupBy(F.col("v").alias("node"))
        .agg(F.sum(F.expr("1000000 div d")).alias("s"))
    )
    r1t = (
        nodes.join(inflow1, "node", "left")
        .select(
            "node",
            F.expr(
                "150000 + (850000 * CAST(coalesce(s, 0) AS DECIMAL(38,0)))"
                " div 1000000"  # div-ok: damped rank, quotient ~1e6 scale (sum of <=deg contribs)
            ).alias("r1"),
        )
        .localCheckpoint()  # the iterate: read by inflow2 AND r2t
    )
    inflow2 = (
        de.join(deg, "u")
        .join(r1t.select(F.col("node").alias("u"), "r1"), "u")
        .groupBy(F.col("v").alias("node"))
        .agg(F.sum(F.expr("r1 div d")).alias("s"))
    )
    r2t = nodes.join(r1t, "node").join(inflow2, "node", "left").select(
        "node",
        "r1",
        F.expr(
            "150000 + (850000 * CAST(coalesce(s, 0) AS DECIMAL(38,0)))"
            " div 1000000"  # div-ok: damped rank, quotient ~1e6 scale
        ).alias("r2"),
    )
    hx = T.hex_hash64(
        F.concat(
            F.col("node").cast("string"),
            F.lit("|"),
            F.col("r2").cast("string"),
        )
    )
    tot = r2t.withColumn("hx", hx).agg(
        F.count("*").alias("n_nodes"),
        F.sum("r2").alias("sum_r2"),
        F.expr("bit_xor(hx)").alias("rank_xor"),
    )
    top = r2t.orderBy(F.desc("r2"), F.asc("node")).limit(10)
    return (
        top.select(
            F.row_number()
            .over(Window.orderBy(F.desc("r2"), F.asc("node")))
            .cast("long")
            .alias("rk"),
            F.col("node").cast("long").alias("node"),
            F.col("r1").cast("long").alias("r1_ppm"),
            F.col("r2").cast("long").alias("r2_ppm"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "rk",
            "node",
            "r1_ppm",
            "r2_ppm",
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("sum_r2").cast("long").alias("sum_r2"),
            F.col("rank_xor").cast("long").alias("rank_xor"),
        )
    )


def _q291_oracle() -> str:
    return """WITH firstp AS (
          SELECT user_id, min(ts) AS pts FROM events
          WHERE event_type = 'purchase' GROUP BY user_id),
       path AS (
          SELECT e.user_id, e.event_id, e.ts,
                 row_number() OVER (PARTITION BY e.user_id
                                    ORDER BY e.ts, e.event_id) AS rn,
                 count(*) OVER (PARTITION BY e.user_id) AS n
          FROM events e JOIN firstp f ON e.user_id = f.user_id
          WHERE e.event_type = 'click' AND e.ts < f.pts),
       credited AS (
          SELECT user_id, event_id % 5 AS channel,
                 CASE WHEN n = 1 THEN 1000000
                      WHEN n = 2 THEN 500000
                      WHEN rn = 1 OR rn = n THEN 400000
                      ELSE 200000 // (n - 2)
                           + CASE WHEN rn - 1 <= 200000 % (n - 2)
                                  THEN 1 ELSE 0 END
                      END AS credit
          FROM path),
       tot AS (
          SELECT count(DISTINCT user_id) AS n_users,
                 sum(credit) AS total_ppm
          FROM credited)
       SELECT CAST(channel AS BIGINT) AS channel,
              CAST(count(*) AS BIGINT) AS n_touches,
              CAST(sum(credit) AS BIGINT) AS credit_ppm,
              CAST(tot.n_users AS BIGINT) AS n_users,
              (tot.total_ppm = tot.n_users * 1000000) AS exact_split
       FROM credited, tot GROUP BY channel, tot.n_users, tot.total_ppm"""


@register(
    "q291_position_attribution",
    _q291_oracle(),
    "U-shaped (position-based) multi-touch attribution — the 40/20/40 "
    "credit model between q124's first-touch and q148's time-decay: "
    "each converting user's pre-purchase click path gives 40% to the "
    "first and last touches and splits the middle 20% by "
    "largest-remainder in exact ppm (earliest middles absorb the "
    "remainder — deterministic, and every user's credits sum to "
    "EXACTLY 1e6, proven in-result by the exact_split flag riding "
    "every row: total_ppm == n_users * 1e6 or the differential "
    "breaks).  Per-user path windows partition on user_id — "
    "high-cardinality by construction, audit-green; credit is a "
    "row-local CASE; one channel aggregate ends it.  No fp anywhere: "
    "fractional attribution models drift across engines exactly "
    "where remainders land",
)
def q291(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    firstp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    clicks = e.filter(F.col("event_type") == "click").join(
        firstp, "user_id"
    ).filter(F.col("ts") < F.col("pts"))
    wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    path = clicks.select(
        "user_id",
        "event_id",
        F.row_number().over(wp).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, 1000000)
        .when(F.col("n") == 2, 500000)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), 400000)
        .otherwise(
            F.expr(
                "200000 div (n - 2)"
                " + IF(rn - 1 <= 200000 % (n - 2), 1, 0)"
            )
        )
    )
    credited = path.select(
        "user_id", (F.col("event_id") % 5).alias("channel"), credit.alias("credit")
    )
    tot = credited.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.sum("credit").alias("total_ppm"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count("*").alias("n_touches"),
            F.sum("credit").alias("credit_ppm"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("channel").cast("long").alias("channel"),
            F.col("n_touches").cast("long").alias("n_touches"),
            F.col("credit_ppm").cast("long").alias("credit_ppm"),
            F.col("n_users").cast("long").alias("n_users"),
            (
                F.col("total_ppm")
                == F.col("n_users") * F.lit(1000000).cast("long")  # ppm-ok: n_users bounded by corpus users; at 1e10 users the product is 1e16 < int64
            ).alias("exact_split"),
        )
    )


def _q292_oracle() -> str:
    return """WITH seq AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nxt,
                 CAST(user_id % 4 = 0 AS INTEGER) AS is_test
          FROM events),
       pairs AS (SELECT * FROM seq WHERE nxt IS NOT NULL),
       model AS (
          SELECT event_type, nxt AS pred FROM (
            SELECT event_type, nxt, count(*) AS c,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY count(*) DESC, nxt) AS rk
            FROM pairs WHERE is_test = 0 GROUP BY event_type, nxt)
          WHERE rk = 1),
       scored AS (
          SELECT p.event_type, p.nxt, m.pred
          FROM pairs p JOIN model m ON p.event_type = m.event_type
          WHERE p.is_test = 1)
       SELECT event_type, pred,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN nxt = pred THEN 1 ELSE 0 END) AS BIGINT)
                AS n_correct,
              CAST((sum(CASE WHEN nxt = pred THEN 1 ELSE 0 END) * 1000000)
                   // count(*) AS BIGINT) AS top1_acc_ppm
       FROM scored GROUP BY event_type, pred"""


@register(
    "q292_markov_next_event_eval",
    _q292_oracle(),
    "next-event prediction baseline, trained and EVALUATED in one "
    "differential (the sequence-model sanity floor every behavioral "
    "model must beat: q134 built the transition matrix, THIS op "
    "closes the loop with a train/test split and held-out top-1 "
    "accuracy): transitions from per-user lead() windows "
    "(high-cardinality user partitions — audit-green), the model is "
    "the argmax next state per current state on TRAIN users "
    "(count-desc/state-asc deterministic tiebreak — a 5x5 frame "
    "broadcast), and held-out users score against it.  Per-state "
    "accuracy beside the prediction exposes WHERE the baseline is "
    "strong — class-imbalance-blind aggregate accuracy is the "
    "classic eval mistake.  At 100 TB: one windowed pass for "
    "transitions, one bounded aggregate for the model, one broadcast "
    "join to score",
)
def q292(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(wseq).alias("nxt"),
        (F.col("user_id") % 4 == 0).alias("is_test"),
    ).filter(F.col("nxt").isNotNull())
    train = seq.filter(~F.col("is_test"))
    counts = train.groupBy("event_type", "nxt").agg(
        F.count("*").alias("c")
    )
    wrk = Window.partitionBy("event_type").orderBy(
        F.desc("c"), F.asc("nxt")
    )
    model = (
        counts.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("nxt").alias("pred"))
    )
    scored = seq.filter("is_test").join(F.broadcast(model), "event_type")
    return scored.groupBy("event_type", "pred").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("nxt") == F.col("pred"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        F.expr(
            "CAST((CAST(sum(CASE WHEN nxt = pred THEN 1 ELSE 0 END)"
            " AS DECIMAL(38,0)) * 1000000) div count(*) AS BIGINT)"  # div-ok: accuracy, quotient <= 1e6
        ).alias("top1_acc_ppm"),
    )


def _q293_oracle() -> str:
    return """WITH chars AS (
          SELECT doc_id, lang, unnest(string_split(text, '')) AS ch
          FROM documents WHERE strlen(text) > 0),
       hist AS (
          SELECT doc_id, lang, ch, count(*) AS c
          FROM chars GROUP BY doc_id, lang, ch),
       tot AS (SELECT doc_id, sum(c) AS n FROM hist GROUP BY doc_id),
       rolled AS (
          SELECT h.doc_id, h.lang, t.n,
                 sum(h.c * (length(printf('%b',
                       CAST(t.n // h.c AS BIGINT))) - 1)) AS est_bits
          FROM hist h JOIN tot t USING (doc_id)
          GROUP BY h.doc_id, h.lang, t.n),
       scored AS (
          SELECT doc_id, lang, n,
                 (est_bits * 1000000) // (8 * n) AS ratio_ppm
          FROM rolled)
       SELECT lang,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN ratio_ppm < 350000 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_flagged,
              CAST(min(ratio_ppm) AS BIGINT) AS min_ratio_ppm,
              CAST(max(ratio_ppm) AS BIGINT) AS max_ratio_ppm,
              CAST(sum(ratio_ppm) AS BIGINT) AS sum_ratio_ppm
       FROM scored GROUP BY lang"""


@register(
    "q293_entropy_compress_screen",
    _q293_oracle(),
    "order-0 entropy compressibility screen (the model-free cousin "
    "of the compression-ratio quality filters production corpus "
    "pipelines run — highly-compressible text is boilerplate, "
    "keyboard mash, or template spam): per-document character "
    "histogram, estimated bits = sum over chars of c * "
    "floor(log2(n/c)) with the log po2-quantized via the q174 "
    "bin-length idiom (fp log2 is engine-unstable at power "
    "boundaries), ratio = est_bits / (8n) in floor-ppm against the "
    "raw byte cost, flagging below 35% — repetitive docs score low "
    "because their histogram concentrates.  The explode is the only "
    "corpus-sized stage (linear in characters, map-side-combinable "
    "histogram); everything after is per-doc arithmetic and one "
    "language rollup",
)
def q293(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").filter(F.length("text") > 0)
    chars = d.select(
        "doc_id", "lang", F.explode(F.split("text", "")).alias("ch")
    )
    hist = chars.groupBy("doc_id", "lang", "ch").agg(
        F.count("*").alias("c")
    )
    wdoc = Window.partitionBy("doc_id")
    per = hist.select(
        "doc_id",
        "lang",
        "c",
        F.sum("c").over(wdoc).alias("n"),
    ).select(
        "doc_id",
        "lang",
        "c",
        "n",
        (
            F.col("c")
            * (F.length(F.bin(F.expr("n div c"))) - F.lit(1))
        ).alias("bits"),
    )
    rolled = per.groupBy("doc_id", "lang").agg(
        F.max("n").alias("n"), F.sum("bits").alias("est_bits")
    )
    scored = rolled.select(
        "lang",
        F.expr(
            "(CAST(est_bits AS DECIMAL(38,0)) * 1000000) div (8 * n)"  # div-ok: entropy <= 8 bits/char so ratio <= 1e6
        ).alias("ratio_ppm"),
    )
    return scored.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("ratio_ppm") < 350000, 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.min("ratio_ppm").cast("long").alias("min_ratio_ppm"),
        F.max("ratio_ppm").cast("long").alias("max_ratio_ppm"),
        F.sum("ratio_ppm").cast("long").alias("sum_ratio_ppm"),
    )


def _q294_oracle() -> str:
    return """WITH pts AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS price,
                 CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
          FROM orders),
       pairs AS (
          SELECT price, day, count(*) AS n_dup
          FROM pts GROUP BY price, day),
       scanned AS (
          SELECT price, day, n_dup,
                 max(day) OVER (ORDER BY price ASC, day DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS max_before
          FROM pairs),
       sky AS (
          SELECT price, day, n_dup FROM scanned
          WHERE max_before IS NULL OR max_before < day)
       SELECT CAST(row_number() OVER (ORDER BY price, day) AS BIGINT)
                AS rk,
              CAST(price AS BIGINT) AS price_cents,
              CAST(day AS BIGINT) AS day,
              CAST(n_dup AS BIGINT) AS n_dup
       FROM sky"""


@register(
    "q294_pareto_skyline",
    _q294_oracle(),
    "Pareto skyline (the classic dominance operator this registry "
    "lacked: 'orders no other order beats on BOTH cheapness and "
    "recency' — the multi-criteria shortlist behind supplier "
    "selection, instance picking, any price/quality tradeoff): "
    "strict 2-D dominance computed by the SORT-BASED scan — distinct "
    "(price, day) pairs in (price asc, day desc) order survive iff "
    "the exclusive running max of day over all earlier pairs is "
    "smaller (on DISTINCT pairs that single comparison is exactly "
    "textbook strict dominance; exact duplicates never dominate each "
    "other and ride along as a multiplicity count).  The running max "
    "uses the NEW two-phase global_running_max (operators/topk.py — "
    "the prefix-max sibling of global_running_sum), so no "
    "single-partition window ever sees the pair set; the fact-sized "
    "work is one distinct-pair aggregate.  Skyline of random-ish "
    "2-D data is ~O(log n) rows — the result is tiny at any scale",
)
def q294(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    pts = o.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("price"),
        F.expr(
            "CAST(floor(unix_timestamp(o_orderdate)) AS BIGINT) div 86400"
        ).alias("day"),
    )
    pairs = pts.groupBy("price", "day").agg(F.count("*").alias("n_dup"))
    scanned = K.global_running_max(
        pairs, [F.asc("price"), F.desc("day")], "day", out_col="max_before"
    )
    sky = scanned.filter(
        F.col("max_before").isNull() | (F.col("max_before") < F.col("day"))
    )
    # the skyline is ~O(log n) rows: the final rank window is bounded
    return sky.select(
        F.row_number()
        .over(Window.orderBy("price", "day"))
        .cast("long")
        .alias("rk"),
        F.col("price").cast("long").alias("price_cents"),
        F.col("day").cast("long").alias("day"),
        F.col("n_dup").cast("long").alias("n_dup"),
    )


def _q295_oracle() -> str:
    return """WITH c AS (SELECT c_custkey FROM customer
                WHERE c_mktsegment = 'BUILDING'),
       o AS (SELECT o_orderkey, o_custkey FROM orders
             WHERE o_orderpriority = '1-URGENT'),
       l AS (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45),
       hc AS (SELECT c_custkey AS k, count(*) AS n FROM c GROUP BY k),
       ho_c AS (SELECT o_custkey AS k, count(*) AS n FROM o GROUP BY k),
       ho_o AS (SELECT o_orderkey AS k, count(*) AS n FROM o GROUP BY k),
       hl AS (SELECT l_orderkey AS k, count(*) AS n FROM l GROUP BY k),
       co AS (SELECT coalesce(sum(hc.n * ho_c.n), 0) AS rows_
              FROM hc JOIN ho_c ON hc.k = ho_c.k),
       ol AS (SELECT coalesce(sum(ho_o.n * hl.n), 0) AS rows_
              FROM ho_o JOIN hl ON ho_o.k = hl.k),
       fin AS (SELECT count(*) AS rows_
               FROM c JOIN o ON o.o_custkey = c.c_custkey
                      JOIN l ON l.l_orderkey = o.o_orderkey),
       best AS (SELECT CASE WHEN (SELECT rows_ FROM co)
                                 <= (SELECT rows_ FROM ol)
                            THEN 'CO_then_L' ELSE 'OL_then_C' END AS w)
       SELECT 'CO_then_L' AS join_order,
              CAST((SELECT rows_ FROM co) AS BIGINT) AS intermediate_rows,
              CAST((SELECT rows_ FROM fin) AS BIGINT) AS final_rows,
              ((SELECT w FROM best) = 'CO_then_L') AS chosen
       UNION ALL
       SELECT 'OL_then_C',
              CAST((SELECT rows_ FROM ol) AS BIGINT),
              CAST((SELECT rows_ FROM fin) AS BIGINT),
              ((SELECT w FROM best) = 'OL_then_C')"""


@register(
    "q295_join_order_advisor",
    _q295_oracle(),
    "cost-based join-ORDER advisor (q235 picks the join STRATEGY, "
    "q240 estimates ONE join's size from sketches; this one ranks "
    "the orders of a filtered 3-way join from EXACT per-key count "
    "histograms — |A join B| = sum over keys of cA(k)*cB(k), the "
    "identity every cost model approximates): both candidate "
    "intermediates (customer-orders first vs orders-lineitem first) "
    "computed exactly, the true final cardinality verified by an "
    "actual count beside them, and the argmin order flagged — on "
    "this data the filters make the two intermediates differ by "
    "orders of magnitude, which is precisely the decision AQE "
    "cannot see before runtime.  At 100 TB the histograms are "
    "key-grained aggregates (this is what you compute when the "
    "answer must be exact; q240's CMS is the sketch sibling when it "
    "may be approximate); products route DECIMAL(38,0)",
)
def q295(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey")
    )

    def hist(df: DataFrame, key: str) -> DataFrame:
        return df.groupBy(F.col(key).alias("k")).agg(
            F.count("*").alias("n")
        )

    def pair_rows(ha: DataFrame, hb: DataFrame, alias: str) -> DataFrame:
        a = ha.select("k", F.col("n").alias("na"))
        b = hb.select("k", F.col("n").alias("nb"))
        return a.join(b, "k").agg(
            F.coalesce(
                F.sum(F.expr("CAST(na AS DECIMAL(38,0)) * nb")), F.lit(0)
            ).alias(alias)
        )

    co = pair_rows(hist(c, "c_custkey"), hist(o, "o_custkey"), "co_rows")
    ol = pair_rows(hist(o, "o_orderkey"), hist(li, "l_orderkey"), "ol_rows")
    fin = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .agg(F.count("*").alias("final_rows"))
    )
    m = co.crossJoin(F.broadcast(ol)).crossJoin(F.broadcast(fin))
    return m.selectExpr(
        "stack(2,"
        " 'CO_then_L', CAST(co_rows AS BIGINT),"
        " 'OL_then_C', CAST(ol_rows AS BIGINT)) AS (join_order,"
        " intermediate_rows)",
        "CAST(final_rows AS BIGINT) AS final_rows",
        "CASE WHEN co_rows <= ol_rows THEN 'CO_then_L'"
        " ELSE 'OL_then_C' END AS _w",
    ).select(
        "join_order",
        "intermediate_rows",
        "final_rows",
        (F.col("join_order") == F.col("_w")).alias("chosen"),
    )


def _q296_oracle() -> str:
    return """WITH base AS (
          SELECT o_custkey AS ck,
                 max(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400)
                   AS recency_day,
                 count(*) AS frequency,
                 sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS monetary
          FROM orders GROUP BY ck),
       scored AS (
          SELECT ck,
                 ntile(5) OVER (ORDER BY recency_day, ck) AS r,
                 ntile(5) OVER (ORDER BY frequency, ck) AS f,
                 ntile(5) OVER (ORDER BY monetary, ck) AS m,
                 monetary
          FROM base)
       SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
              CAST(m AS BIGINT) AS m,
              CAST(count(*) AS BIGINT) AS n_customers,
              CAST(sum(monetary) AS BIGINT) AS segment_cents
       FROM scored GROUP BY r, f, m"""


@register(
    "q296_rfm_segmentation",
    _q296_oracle(),
    "RFM (recency / frequency / monetary) quintile segmentation — "
    "the classic customer-value grid, and a three-dimensional "
    "exercise of the q68 lesson: each dimension needs a GLOBAL "
    "equi-depth quintile, and three naive ntile windows would funnel "
    "the customer table through one task three times; instead each "
    "dimension gets the two-phase global rank + closed-form exact "
    "ntile assignment (bit-identical to the window function, proven "
    "by the hypothesis test), composed by joining the three rank "
    "frames on the customer key.  The oracle uses plain ntile "
    "windows — same answer, which IS the differential's point.  At "
    "100 TB: one per-customer aggregate, three range-partitioned "
    "rank passes, one 125-cell rollup",
)
def q296(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    base = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.expr(
            "max(CAST(floor(unix_timestamp(o_orderdate)) AS BIGINT)"
            " div 86400)"
        ).alias("recency_day"),
        F.count("*").alias("frequency"),
        F.sum(
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            )
        ).alias("monetary"),
    ).localCheckpoint()  # read by three rank passes + the final join
    tot = base.agg(F.count("*").alias("nn"))

    def quintile(dim: str, out: str) -> DataFrame:
        ranked = K.global_row_number(
            base.select("ck", dim), [F.asc(dim), F.asc("ck")]
        )
        k = 5
        bucket = F.expr(
            f"CASE WHEN rn <= (nn % {k}) * (nn div {k} + 1)"
            f" THEN (rn - 1) div (nn div {k} + 1) + 1"
            f" ELSE (nn % {k})"
            f"  + (rn - (nn % {k}) * (nn div {k} + 1) - 1) div (nn div {k})"
            f"  + 1 END"
        )
        return ranked.crossJoin(F.broadcast(tot)).select(
            "ck", bucket.cast("long").alias(out)
        )

    scored = (
        quintile("recency_day", "r")
        .join(quintile("frequency", "f"), "ck")
        .join(quintile("monetary", "m"), "ck")
        .join(base.select("ck", "monetary"), "ck")
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("monetary").cast("long").alias("segment_cents"),
    )


_Q297_SESSION_S = 1800  # 30-minute sessions


def _q297_oracle() -> str:
    return f"""WITH bounds AS (
          SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t, 1 AS delta
          FROM events
          UNION ALL
          SELECT CAST(floor(epoch(ts)) AS BIGINT) + {_Q297_SESSION_S}, -1
          FROM events),
       swept AS (
          SELECT t, delta,
                 sum(delta) OVER (ORDER BY t, delta
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS conc
          FROM bounds),
       peak AS (SELECT max(conc) AS p FROM swept)
       SELECT CAST((SELECT count(*) FROM events) AS BIGINT) AS n_sessions,
              CAST((SELECT p FROM peak) AS BIGINT) AS peak_concurrency,
              CAST(min(t) AS BIGINT) AS first_peak_t
       FROM swept WHERE conc = (SELECT p FROM peak)"""


@register(
    "q297_peak_concurrency",
    _q297_oracle(),
    "peak concurrency via the boundary-sweep (the capacity-planning "
    "primitive: 'how many 30-minute sessions were ever live at "
    "once?'): every session contributes +1 at start and -1 at "
    "start+30min, the running sum of deltas in (t, delta) order is "
    "the live count at every boundary (delta asc ties put -1 before "
    "+1, the half-open-interval convention — back-to-back sessions "
    "never double-count), and the max is the peak, with the FIRST "
    "time it was reached reported (the actionable half).  The prefix "
    "sum runs on the two-phase global_running_sum shape — a naive "
    "ORDER BY window would funnel every boundary through one task; "
    "here boundaries range-partition by time and only per-slice "
    "totals meet the driver.  One union-of-projections pass, one "
    "ranked sweep, three scalar aggregates",
)
def q297(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    start = e.select(
        F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)").alias("t"),
        F.lit(1).alias("delta"),
    )
    end = e.select(
        (
            F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)")
            + _Q297_SESSION_S
        ).alias("t"),
        F.lit(-1).alias("delta"),
    )
    bounds = start.unionAll(end)
    swept = K.global_running_sum(
        bounds, [F.asc("t"), F.asc("delta")], "delta", out_col="before"
    ).select("t", "delta", (F.col("before") + F.col("delta")).alias("conc"))
    peak = swept.agg(F.max("conc").alias("p"))
    n = e.agg(F.count("*").alias("n_sessions"))
    return (
        swept.crossJoin(F.broadcast(peak))
        .filter(F.col("conc") == F.col("p"))
        .crossJoin(F.broadcast(n))
        .agg(
            F.max("n_sessions").cast("long").alias("n_sessions"),
            F.max("p").cast("long").alias("peak_concurrency"),
            F.min("t").cast("long").alias("first_peak_t"),
        )
    )


def _q298_oracle() -> str:
    # DuckDB's BIGINT `*` errors on overflow, so the squared prefix
    # sums route through HUGEINT (int128), mirroring Spark's
    # DECIMAL(38,0).  `//` on non-negative HUGEINTs is exact floor,
    # identical to Spark's (v - v % d) / d decimal identity.
    return f"""WITH daily AS (
          SELECT {day_str_sql('o_orderdate')} AS day, count(*) AS y
          FROM orders GROUP BY 1),
       pre AS (
          SELECT day, y,
                 row_number() OVER (ORDER BY day) AS i,
                 sum(CAST(y AS HUGEINT)) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sl,
                 sum(CAST(y AS HUGEINT) * y) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2l
          FROM daily),
       tot AS (
          SELECT count(*) AS n, sum(CAST(y AS HUGEINT)) AS s,
                 sum(CAST(y AS HUGEINT) * y) AS s2
          FROM daily),
       cand AS (
          SELECT day AS split_day,
                 i AS n_left, n - i AS n_right,
                 (sl * 1000000) // i AS mean_left_ppm,
                 ((s - sl) * 1000000) // (n - i) AS mean_right_ppm,
                 (s2l * 1000000 - (sl * sl * 1000000) // i)
                 + ((s2 - s2l) * 1000000
                    - ((s - sl) * (s - sl) * 1000000) // (n - i))
                   AS cost_ppm,
                 s2 * 1000000 - (s * s * 1000000) // n AS base_ppm
          FROM pre CROSS JOIN tot
          WHERE i < n)
       SELECT split_day,
              CAST(n_left AS BIGINT) AS n_left,
              CAST(n_right AS BIGINT) AS n_right,
              CAST(mean_left_ppm AS BIGINT) AS mean_left_ppm,
              CAST(mean_right_ppm AS BIGINT) AS mean_right_ppm,
              CAST(cost_ppm AS BIGINT) AS cost_ppm,
              CAST(base_ppm AS BIGINT) AS base_ppm,
              CAST(CASE WHEN base_ppm = 0 THEN 0
                   ELSE ((base_ppm - cost_ppm) * 1000000) // base_ppm
                   END AS BIGINT) AS reduction_ppm
       FROM cand ORDER BY cost_ppm, split_day LIMIT 1"""


def _exdiv(v: str, d: str) -> str:
    """Exact decimal floor division SQL: (v - v % d) / d, DECIMAL(38,0).

    The q271 lesson: Spark's IntegralDivide returns BIGINT and
    silently wraps modulo 2^64, so any quotient that can exceed int64
    must subtract the remainder first and divide in decimal (no
    fractional part remains, so the decimal division is exact).

    Sign semantics: with a non-negative dividend this is floor
    division (oracle mirror: HUGEINT `//`).  With a SIGNED dividend
    it is truncation toward zero in BOTH engines (both `%`s follow
    the dividend sign, and the division is then an exact multiple) —
    the oracle must mirror with the same `(v - v %% d) // d` identity,
    NOT bare `//` (q321's negative slopes).  Divisors positive.
    """
    return f"CAST((({v}) - (({v}) % ({d}))) / ({d}) AS DECIMAL(38,0))"


@register(
    "q298_changepoint_detection",
    _q298_oracle(),
    "single level-shift changepoint over the daily order-count series "
    "(the monitoring primitive behind 'when did the distribution "
    "move?' — data-drift triage, pipeline-regression forensics, "
    "SLA-break dating): the two-segment piecewise-constant fit "
    "minimizing total SSE, scanned over every candidate split day.  "
    "SSE is kept EXACT in scaled-integer form via the identity "
    "n*SSE = n*Sum(y^2) - S^2 evaluated as floor-ppm: cost_ppm = "
    "Sum(y^2)*1e6 - floor(S^2*1e6/n) per side, all in DECIMAL(38,0) "
    "with the (v - v %% d)/d exact floor division (q271 lesson — "
    "Spark `div` wraps at int64; the oracle mirrors with HUGEINT "
    "`//`).  Argmin tiebreak = earliest day.  Plan: one "
    "map-combinable daily aggregate collapses the fact table to "
    "~|days| rows; the prefix sums and candidate sweep run on that "
    "aggregate frame (window input passes the aggregate barrier, so "
    "the audit's fact-scan window rule does not fire), then "
    "TakeOrderedAndProject(1).  At 100 TB the only fact-sized pass "
    "is the first aggregate.  Output BIGINT casts bound: cost_ppm <= "
    "Sum(y^2)*1e6, int64-safe through ~sf50 daily volumes "
    "(~9e18); interior arithmetic exact far beyond",
)
def q298(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    daily = o.groupBy(day_str("o_orderdate").alias("day")).agg(
        F.count("*").alias("y")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.sum(F.col("y").cast("decimal(38,0)")).over(w).alias("sl"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).over(w).alias("s2l"),
    )
    tot = daily.agg(
        F.count("*").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("s"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("s2"),
    )
    cand = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("i") < F.col("n"))
        .select(
            F.col("day").alias("split_day"),
            F.col("i").cast("long").alias("n_left"),
            (F.col("n") - F.col("i")).cast("long").alias("n_right"),
            F.expr(_exdiv("sl * 1000000", "CAST(i AS DECIMAL(38,0))"))
            .cast("long")
            .alias("mean_left_ppm"),
            F.expr(
                _exdiv("(s - sl) * 1000000", "CAST(n - i AS DECIMAL(38,0))")
            )
            .cast("long")
            .alias("mean_right_ppm"),
            F.expr(
                "(s2l * CAST(1000000 AS DECIMAL(38,0)) - "
                + _exdiv("sl * sl * 1000000", "CAST(i AS DECIMAL(38,0))")
                + ") + ((s2 - s2l) * CAST(1000000 AS DECIMAL(38,0)) - "
                + _exdiv(
                    "(s - sl) * (s - sl) * CAST(1000000 AS DECIMAL(38,0))",
                    "CAST(n - i AS DECIMAL(38,0))",
                )
                + ")"
            ).alias("_cost"),
            F.expr(
                "s2 * CAST(1000000 AS DECIMAL(38,0)) - "
                + _exdiv("s * s * 1000000", "CAST(n AS DECIMAL(38,0))")
            ).alias("_base"),
        )
    )
    return (
        cand.orderBy("_cost", "split_day")
        .limit(1)
        .select(
            "split_day",
            "n_left",
            "n_right",
            "mean_left_ppm",
            "mean_right_ppm",
            F.col("_cost").cast("long").alias("cost_ppm"),
            F.col("_base").cast("long").alias("base_ppm"),
            F.when(F.col("_base") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    _exdiv(
                        "(_base - _cost)"
                        " * CAST(1000000 AS DECIMAL(38,0))",
                        "_base",
                    )
                ).cast("long")
            )
            .alias("reduction_ppm"),
        )
    )


_Q299_GRAM_SQL = hex_hash64_sql(
    "t[CAST(p AS INTEGER)] || ' ' || t[CAST(p AS INTEGER) + 1] || ' ' "
    "|| t[CAST(p AS INTEGER) + 2]",
    "win",
)


def _q299_oracle() -> str:
    return f"""WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       grams AS (
          SELECT doc_id, len(t) - 2 AS g, t,
                 unnest(range(1, len(t) - 1)) AS p
          FROM toks WHERE len(t) >= 3),
       hashed AS (
          SELECT doc_id, g, p, {_Q299_GRAM_SQL} % 1000000007 AS h
          FROM grams),
       wins AS (
          SELECT doc_id, p + off AS q, h * 64 + off AS key
          FROM hashed, unnest(range(0, 4)) AS u(off)
          WHERE p + off BETWEEN 4 AND g),
       sel AS (
          SELECT doc_id, q, min(key) AS mk FROM wins GROUP BY doc_id, q),
       fp AS (
          SELECT DISTINCT doc_id, mk // 64 AS h, q - (mk % 64) AS p
          FROM sel),
       per_hash AS (
          SELECT h, count(DISTINCT doc_id) AS nd FROM fp GROUP BY h),
       gsum AS (SELECT count(*) AS n_grams FROM hashed),
       fsum AS (
          SELECT count(*) AS n_fingerprints,
                 count(DISTINCT doc_id) AS n_docs_fingerprinted,
                 bit_xor({hex_hash64_sql(
                     "CAST(doc_id AS VARCHAR) || ':' || CAST(h AS VARCHAR)"
                     " || ':' || CAST(p AS VARCHAR)", "fpx")}) AS fp_xor
          FROM fp),
       hsum AS (
          SELECT count(*) AS n_distinct_hashes,
                 sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)
                   AS n_cross_doc_hashes
          FROM per_hash)
       SELECT CAST(n_docs_fingerprinted AS BIGINT) AS n_docs_fingerprinted,
              CAST(n_grams AS BIGINT) AS n_grams,
              CAST(n_fingerprints AS BIGINT) AS n_fingerprints,
              CAST(n_fingerprints * 1000000 // n_grams AS BIGINT)
                AS density_ppm,
              CAST(n_distinct_hashes AS BIGINT) AS n_distinct_hashes,
              CAST(n_cross_doc_hashes AS BIGINT) AS n_cross_doc_hashes,
              CAST(fp_xor AS BIGINT) AS fp_xor
       FROM gsum CROSS JOIN fsum CROSS JOIN hsum"""


@register(
    "q299_winnowing_fingerprints",
    _q299_oracle(),
    "robust winnowing fingerprint selection (Schleimer/Wilkerson/"
    "Aiken, the MOSS plagiarism-detection primitive and the "
    "guarantee-bearing alternative to q44's whole-doc rolling hash "
    "and q33's set fingerprint: any shared substring of >= w+k-1 "
    "tokens is GUARANTEED to share a selected fingerprint, while "
    "random mod-p sampling like q212's cut rule can miss arbitrarily "
    "long overlaps): per document, 3-token-gram hashes at every "
    "position; each sliding window of w=4 grams selects its minimum "
    "hash, rightmost position on ties.  The select-the-rightmost-min "
    "rule is one integer argmin: key = h*64 + (q - p) so min(key) "
    "gives the minimum hash and the SMALLEST window offset (= "
    "rightmost position) in a single map-combinable min — no nested "
    "windows, no per-window sort.  Fingerprints dedup to (doc, hash, "
    "pos); the report carries corpus density (fingerprints per gram, "
    "ppm — the winnowing paper's 2/(w+1) expectation), the "
    "cross-document hash count (the plagiarism/boilerplate signal), "
    "and an order-insensitive xor of every fingerprint for exactness."
    "  Plan: tokenization is row-local; the gram explode is bounded "
    "by corpus tokens and the window explode by a constant factor "
    "w=4; the argmin groups on (doc, window) — per-document "
    "cardinality, no skewable key; the rollups are fixed-width.  At "
    "100 TB every stage is map-side combinable or keyed on "
    "high-cardinality composites",
)
def q299(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    toks = d.select("doc_id", T.tokens("text").alias("t")).filter(
        F.size("t") >= 3
    )
    grams = toks.select(
        "doc_id",
        (F.size("t") - 2).alias("g"),
        "t",
        F.explode(F.sequence(F.lit(1), F.size("t") - 2)).alias("p"),
    )
    hashed = grams.select(
        "doc_id",
        "g",
        "p",
        (
            T.hex_hash64(
                F.concat_ws(
                    " ",
                    F.element_at("t", F.col("p")),
                    F.element_at("t", F.col("p") + 1),
                    F.element_at("t", F.col("p") + 2),
                ),
                salt="win",
            )
            % 1000000007
        ).alias("h"),
    )
    wins = (
        hashed.select(
            "doc_id",
            "g",
            "p",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("off"),
        )
        .filter(
            (F.col("p") + F.col("off") >= 4)
            & (F.col("p") + F.col("off") <= F.col("g"))
        )
        .select(
            "doc_id",
            (F.col("p") + F.col("off")).alias("q"),
            (F.col("h") * 64 + F.col("off")).alias("key"),
        )
    )
    sel = wins.groupBy("doc_id", "q").agg(F.min("key").alias("mk"))
    fp = sel.select(
        "doc_id",
        F.expr("mk div 64").alias("h"),  # div-ok: quotient = 60-bit gram hash % 1000000007 < 2^31
        (F.col("q") - F.col("mk") % 64).alias("p"),
    ).distinct()
    gsum = hashed.agg(F.count("*").alias("n_grams"))
    fsum = (
        fp.select(
            "doc_id",
            "h",
            "p",
            T.hex_hash64(
                F.concat_ws(
                    ":",
                    F.col("doc_id").cast("string"),
                    F.col("h").cast("string"),
                    F.col("p").cast("string"),
                ),
                salt="fpx",
            ).alias("fx"),
        )
        .agg(
            F.count("*").alias("n_fingerprints"),
            F.countDistinct("doc_id").alias("n_docs_fingerprinted"),
            F.expr("bit_xor(fx)").alias("fp_xor"),
        )
    )
    hsum = (
        fp.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .agg(
            F.count("*").alias("n_distinct_hashes"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias(
                "n_cross_doc_hashes"
            ),
        )
    )
    return (
        gsum.crossJoin(F.broadcast(fsum))
        .crossJoin(F.broadcast(hsum))
        .select(
            F.col("n_docs_fingerprinted").cast("long").alias(
                "n_docs_fingerprinted"
            ),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_fingerprints").cast("long").alias("n_fingerprints"),
            F.expr(
                "CAST(n_fingerprints AS DECIMAL(38,0)) * 1000000"
                " div n_grams"  # div-ok: fingerprint density, quotient <= 1e6
            )
            .cast("long")
            .alias("density_ppm"),
            F.col("n_distinct_hashes").cast("long").alias(
                "n_distinct_hashes"
            ),
            F.col("n_cross_doc_hashes").cast("long").alias(
                "n_cross_doc_hashes"
            ),
            F.col("fp_xor").cast("long").alias("fp_xor"),
        )
    )


def _q300_oracle() -> str:
    from ..functions.vector import int8_quantize_sql, int_dot_sql

    return f"""WITH qv AS (
          SELECT vec_id, label, {int8_quantize_sql('embedding')} AS q
          FROM embeddings),
       self AS (
          SELECT vec_id, label, q, {int_dot_sql('q', 'q')} AS na2 FROM qv),
       dims AS (
          SELECT label, unnest(range(1, 65)) AS pos, q FROM qv),
       percell AS (
          SELECT label, pos, sum(q[CAST(pos AS INTEGER)]) AS s,
                 count(*) AS c
          FROM dims GROUP BY 1, 2),
       cent AS (
          SELECT label, pos, (s - ((s % c) + c) % c) // c AS v
          FROM percell),
       vecs AS (
          SELECT label AS label_c, list(v ORDER BY pos) AS cv
          FROM cent GROUP BY label),
       cw AS (
          SELECT label_c, cv, {int_dot_sql('cv', 'cv')} AS nc2 FROM vecs),
       scoredall AS (
          SELECT s.vec_id, s.label,
                 (1000000 - CASE WHEN s.na2 = 0 OR c.nc2 = 0 THEN -1000000
                       ELSE CAST(floor({int_dot_sql('s.q', 'c.cv')}
                                 * 1000000.0
                                 / sqrt(CAST(s.na2 AS DOUBLE)
                                        * CAST(c.nc2 AS DOUBLE)))
                            AS BIGINT) END) * 1024 + c.label_c AS keyk
          FROM self s CROSS JOIN cw c),
       pred AS (
          SELECT vec_id, label, min(keyk) AS mk
          FROM scoredall GROUP BY vec_id, label),
       judged AS (
          SELECT vec_id,
                 1000000 - mk // 1024 AS conf,
                 CASE WHEN mk % 1024 <> label THEN 1 ELSE 0 END AS err
          FROM pred),
       ranked AS (
          SELECT err,
                 ntile(10) OVER (ORDER BY conf DESC, vec_id) AS decile
          FROM judged),
       per AS (
          SELECT decile, count(*) AS n_d, sum(err) AS err_d
          FROM ranked GROUP BY decile),
       tot AS (SELECT count(*) AS nn FROM judged),
       cum AS (
          SELECT decile,
                 sum(n_d) OVER (ORDER BY decile
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum_n,
                 sum(err_d) OVER (ORDER BY decile
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum_err
          FROM per)
       SELECT CAST(decile AS BIGINT) AS decile,
              CAST(cum_n AS BIGINT) AS cum_n,
              CAST(cum_err AS BIGINT) AS cum_err,
              CAST(cum_err * 1000000 // cum_n AS BIGINT) AS risk_ppm,
              CAST(cum_n * 1000000 // nn AS BIGINT) AS coverage_ppm
       FROM cum CROSS JOIN tot"""


@register(
    "q300_risk_coverage_curve",
    _q300_oracle(),
    "risk-coverage curve for selective prediction (the eval behind "
    "'route the low-confidence tail to a bigger model / a human': at "
    "each coverage level, the error rate among the predictions the "
    "model is MOST confident about — the acceptance test for "
    "abstention thresholds, cascade routers, and auto-label "
    "pipelines): a real nearest-centroid classifier over the "
    "embeddings table (per-label integer centroids of the "
    "int8-quantized vectors — the q216 construction — scored by "
    "floor-ppm cosine with the q259 zero-vector guard), argmax over "
    "centroids via one integer key min (keyk = (1e6 - conf)*1024 + "
    "label encodes conf-desc-then-label-asc, so both engines tie-"
    "break identically with a plain min), then the curve: vectors "
    "ranked by confidence (two-phase global_row_number — no single-"
    "partition window over the corpus), cut into coverage deciles by "
    "the closed-form exact ntile (bit-identical to the oracle's "
    "ntile(10), hypothesis-proven), cumulative errors over the "
    "10-row decile frame.  Plan at 100 TB: centroids are a "
    "|labels|-row broadcast, scoring is row-local (x|labels| "
    "constant fanout), the rank is range-partitioned, and the only "
    "windows run over 10 aggregate rows",
)
def q300(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vector import int8_quantize, int_dot

    e = load_table(spark, sf, "embeddings")
    qv = e.select(
        "vec_id", "label", int8_quantize("embedding").alias("q")
    )
    self_dot = qv.select(
        "vec_id", "label", "q", int_dot("q", "q").alias("na2")
    )
    dims = qv.select("label", F.posexplode("q").alias("pos", "val"))
    cent = (
        dims.groupBy("label", "pos")
        .agg(F.sum("val").alias("s"), F.count("*").alias("c"))
        .select(
            "label",
            "pos",
            F.expr("(s - ((s % c) + c) % c) div c").alias("v"),  # div-ok: floor mean of int8 values, |quotient| <= 127
        )
    )
    vecs = cent.groupBy(F.col("label").alias("label_c")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))),
            lambda x: x["v"],
        ).alias("cv")
    )
    cw = vecs.select("label_c", "cv", int_dot("cv", "cv").alias("nc2"))
    conf = F.when(
        (F.col("na2") == 0) | (F.col("nc2") == 0), F.lit(-1000000)
    ).otherwise(
        F.floor(
            int_dot("q", "cv")
            * F.lit(1000000.0)
            / F.sqrt(
                F.col("na2").cast("double") * F.col("nc2").cast("double")
            )
        ).cast("long")
    )
    scoredall = self_dot.crossJoin(F.broadcast(cw)).select(
        "vec_id",
        "label",
        ((F.lit(1000000) - conf) * 1024 + F.col("label_c")).alias("keyk"),
    )
    judged = (
        scoredall.groupBy("vec_id", "label")
        .agg(F.min("keyk").alias("mk"))
        .select(
            "vec_id",
            (F.lit(1000000) - F.expr("mk div 1024")).alias("conf"),  # div-ok: quotient = 1e6 - conf_ppm <= 2e6
            F.when(F.expr("mk % 1024") != F.col("label"), 1)
            .otherwise(0)
            .alias("err"),
        )
    )
    ranked = K.global_row_number(
        judged, [F.desc("conf"), F.asc("vec_id")]
    )
    tot = judged.agg(F.count("*").alias("nn"))
    k = 10
    decile = F.expr(
        f"CASE WHEN rn <= (nn % {k}) * (nn div {k} + 1)"
        f" THEN (rn - 1) div (nn div {k} + 1) + 1"
        f" ELSE (nn % {k})"
        f"  + (rn - (nn % {k}) * (nn div {k} + 1) - 1) div (nn div {k})"
        f"  + 1 END"
    )
    per = (
        ranked.crossJoin(F.broadcast(tot))
        .select(decile.alias("decile"), "err", "nn")
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_d"),
            F.sum("err").alias("err_d"),
            F.max("nn").alias("nn"),
        )
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        F.col("decile").cast("long").alias("decile"),
        F.sum("n_d").over(w).cast("long").alias("cum_n"),
        F.sum("err_d").over(w).cast("long").alias("cum_err"),
        "nn",
    ).select(
        "decile",
        "cum_n",
        "cum_err",
        F.expr(
            "CAST(cum_err AS DECIMAL(38,0)) * 1000000 div cum_n"  # div-ok: error rate, quotient <= 1e6
        )
        .cast("long")
        .alias("risk_ppm"),
        F.expr(
            "CAST(cum_n AS DECIMAL(38,0)) * 1000000 div nn"  # div-ok: coverage share, quotient <= 1e6
        )
        .cast("long")
        .alias("coverage_ppm"),
    )


_KCORE_K = 4


def _q301_oracle() -> str:
    hx = hex_hash64_sql("CAST(u AS VARCHAR)", salt="kc")
    rounds_sql = []
    prev = "e"
    for r in (1, 2, 3):
        rounds_sql.append(
            f"""d{r} AS (SELECT u, count(*) AS d
              FROM (SELECT a AS u FROM {prev}
                    UNION ALL SELECT b FROM {prev})
              GROUP BY u),
       s{r} AS (SELECT u FROM d{r} WHERE d >= {_KCORE_K}),
       e{r} AS (SELECT a, b FROM {prev}
                WHERE a IN (SELECT u FROM s{r})
                  AND b IN (SELECT u FROM s{r}))"""
        )
        prev = f"e{r}"
    metrics = " UNION ALL ".join(
        f"""SELECT {r} AS round,
               (SELECT count(*) FROM s{r}) AS n_nodes,
               (SELECT count(*) FROM e{r}) AS n_edges,
               (SELECT bit_xor({hx}) FROM s{r}) AS node_xor"""
        for r in (1, 2, 3)
    )
    rounds_joined = ",\n       ".join(rounds_sql)
    return f"""WITH {_graph_edges_sql()},
       {rounds_joined}
       SELECT CAST(round AS BIGINT) AS round,
              CAST(n_nodes AS BIGINT) AS n_nodes,
              CAST(n_edges AS BIGINT) AS n_edges,
              CAST(node_xor AS BIGINT) AS node_xor
       FROM ({metrics}) ORDER BY round"""


@register(
    "q301_kcore_peeling",
    _q301_oracle(),
    "k-core decomposition, three unrolled peeling rounds toward the "
    f"{_KCORE_K}-core of the shared synthetic customer graph (q137/"
    "q138/q233/q290's edge builder): each round drops every node "
    f"whose CURRENT induced degree is < {_KCORE_K} and restricts the "
    "edge set to surviving endpoints — the standard coreness "
    "pre-filter that strips low-engagement periphery before "
    "community/fraud analysis (the dense k-core is where "
    "coordinated-behavior signals live), and the classic example of "
    "an algorithm whose rounds CASCADE: a node at exactly degree "
    f"{_KCORE_K} can fall under the threshold only after a neighbor "
    "was peeled, so round counts strictly interleave recomputed "
    "degrees and induced subgraphs.  Per-round evidence row: "
    "surviving node count, induced edge count, and a 60-bit xor over "
    "the survivor set — one wrongly-peeled node anywhere breaks the "
    "xor.  Plan: per round one map-combinable degree aggregate plus "
    "two LeftSemi hash joins keyed on node ids (high-cardinality, no "
    "skewable key); the shrinking edge frame is localCheckpoint'ed "
    "per round (the q290 Pregel practice) so consumers never replay "
    "the builder chain.  At 100 TB each round is O(surviving edges) "
    "and the frame only shrinks; the oracle states the identical "
    "peeling as three unrolled CTE layers with IN-subquery "
    "restriction",
)
def q301(spark: SparkSession, sf: str) -> DataFrame:
    cur = _graph_edges(spark, sf).localCheckpoint()
    out = None
    for r in (1, 2, 3):
        sym = cur.select(F.col("a").alias("u")).unionAll(
            cur.select(F.col("b").alias("u"))
        )
        surv = (
            sym.groupBy("u")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select("u")
            .localCheckpoint()  # read by both semi joins + the metrics agg
        )
        cur = (
            cur.join(surv.select(F.col("u").alias("a")), "a", "semi")
            .join(surv.select(F.col("u").alias("b")), "b", "semi")
            .localCheckpoint()
        )
        nodes_m = surv.select(
            T.hex_hash64(F.col("u").cast("string"), salt="kc").alias("hx")
        ).agg(
            F.count("*").alias("n_nodes"),
            F.expr("bit_xor(hx)").alias("node_xor"),
        )
        edges_m = cur.agg(F.count("*").alias("n_edges"))
        row = nodes_m.crossJoin(F.broadcast(edges_m)).select(
            F.lit(r).cast("long").alias("round"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("node_xor").cast("long").alias("node_xor"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("round")


_PHRASE = ("merge", "join")


def _q302_oracle() -> str:
    hx = hex_hash64_sql(
        "CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)", salt="ph"
    )
    return f"""WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       pos AS (
          SELECT doc_id, CAST(p AS INTEGER) AS p,
                 t[CAST(p AS INTEGER)] AS tok
          FROM toks, unnest(range(1, len(t) + 1)) AS u(p)
          WHERE t[CAST(p AS INTEGER)] IN ('{_PHRASE[0]}', '{_PHRASE[1]}')),
       m AS (
          SELECT a.doc_id, a.p
          FROM pos a JOIN pos b
            ON b.doc_id = a.doc_id AND b.p = a.p + 1
          WHERE a.tok = '{_PHRASE[0]}' AND b.tok = '{_PHRASE[1]}'),
       per AS (
          SELECT doc_id, count(*) AS n_occ, min(p) AS first_pos
          FROM m GROUP BY doc_id),
       tot AS (
          SELECT count(DISTINCT doc_id) AS n_docs_matched,
                 count(*) AS n_occurrences,
                 bit_xor({hx}) AS occ_xor
          FROM m)
       SELECT CAST(doc_id AS BIGINT) AS doc_id,
              CAST(n_occ AS BIGINT) AS n_occ,
              CAST(first_pos AS BIGINT) AS first_pos,
              CAST(n_docs_matched AS BIGINT) AS n_docs_matched,
              CAST(n_occurrences AS BIGINT) AS n_occurrences,
              CAST(occ_xor AS BIGINT) AS occ_xor
       FROM per CROSS JOIN tot
       ORDER BY n_occ DESC, doc_id LIMIT 20"""


@register(
    "q302_phrase_search",
    _q302_oracle(),
    f"positional phrase search for '{_PHRASE[0]} {_PHRASE[1]}' (the "
    "exact-phrase retrieval primitive q224's docs/collection-"
    "frequency index cannot answer — phrase match needs POSITIONS, "
    "the classic positional-postings intersection from the IR "
    "textbooks): tokenize, keep only the two query terms' positional "
    "postings (the pruned index read — the corpus-sized token stream "
    "is filtered to the query vocabulary BEFORE any shuffle, exactly "
    "what reading two posting lists from a positional inverted index "
    "costs), then one equi-join on (doc, position+1) finds "
    "adjacency.  Result: top-20 matching docs by occurrence count "
    "(total-order tiebreak) with corpus totals and a 60-bit xor over "
    "every (doc, position) occurrence so one phantom/missing match "
    "anywhere breaks equality.  Plan: explode is bounded by corpus "
    "tokens, the IN filter cuts it to ~2 terms' postings, the "
    "adjacency join keys on (doc_id, p) — high-cardinality, no skew "
    "— and TakeOrderedAndProject caps the output; the 1-row totals "
    "frame rides a broadcast cross.  At 100 TB this is two posting "
    "scans + one co-partitioned join, never a corpus-wide pair "
    "enumeration",
)
def q302(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    pos = (
        d.select("doc_id", F.posexplode(T.tokens("text")).alias("p0", "tok"))
        .filter(F.col("tok").isin(*_PHRASE))
        .select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
        .localCheckpoint()  # read by both sides of the adjacency join
    )
    a = pos.filter(F.col("tok") == _PHRASE[0]).select("doc_id", "p")
    b = pos.filter(F.col("tok") == _PHRASE[1]).select(
        "doc_id", (F.col("p") - 1).alias("p")
    )
    m = a.join(b, ["doc_id", "p"])
    per = m.groupBy("doc_id").agg(
        F.count("*").alias("n_occ"), F.min("p").alias("first_pos")
    )
    hx = T.hex_hash64(
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("p").cast("string")
        ),
        salt="ph",
    )
    tot = m.withColumn("hx", hx).agg(
        F.countDistinct("doc_id").alias("n_docs_matched"),
        F.count("*").alias("n_occurrences"),
        F.expr("bit_xor(hx)").alias("occ_xor"),
    )
    return (
        per.orderBy(F.desc("n_occ"), F.asc("doc_id"))
        .limit(20)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_occ").cast("long").alias("n_occ"),
            F.col("first_pos").cast("long").alias("first_pos"),
            F.col("n_docs_matched").cast("long").alias("n_docs_matched"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("occ_xor").cast("long").alias("occ_xor"),
        )
        .orderBy(F.desc("n_occ"), F.asc("doc_id"))
    )


def _q303_oracle() -> str:
    return f"""WITH {_graph_edges_sql()},
       com AS (SELECT c_custkey AS node, c_nationkey AS com
               FROM customer),
       lab AS (
          SELECT e.a, e.b, ca.com AS ca, cb.com AS cb
          FROM e JOIN com ca ON ca.node = e.a
                 JOIN com cb ON cb.node = e.b),
       mt AS (SELECT count(*) AS m FROM lab),
       intra AS (SELECT ca AS com, count(*) AS e_c
                 FROM lab WHERE ca = cb GROUP BY 1),
       inc AS (
          SELECT com, count(*) AS d_c, count(DISTINCT node) AS n_members
          FROM (SELECT ca AS com, a AS node FROM lab
                UNION ALL SELECT cb, b FROM lab)
          GROUP BY com),
       per AS (
          SELECT inc.com, inc.n_members, inc.d_c,
                 coalesce(intra.e_c, 0) AS e_c
          FROM inc LEFT JOIN intra ON intra.com = inc.com),
       terms AS (
          SELECT com, n_members, d_c, e_c,
                 (CAST(e_c AS HUGEINT) * 1000000) // m AS intra_ppm,
                 (CAST(d_c AS HUGEINT) * d_c * 1000000)
                   // (4 * CAST(m AS HUGEINT) * m) AS expected_ppm
          FROM per CROSS JOIN mt),
       g AS (
          SELECT sum(e_c) AS sum_e,
                 sum(CAST(d_c AS HUGEINT) * d_c) AS sum_d2
          FROM per),
       gq AS (
          SELECT (CAST(sum_e AS HUGEINT) * 1000000) // m AS q_intra_ppm,
                 (sum_d2 * 1000000) // (4 * CAST(m AS HUGEINT) * m)
                   AS q_expected_ppm
          FROM g CROSS JOIN mt)
       SELECT CAST(com AS INTEGER) AS com,
              CAST(n_members AS BIGINT) AS n_members,
              CAST(d_c AS BIGINT) AS d_c,
              CAST(e_c AS BIGINT) AS e_c,
              CAST(intra_ppm AS BIGINT) AS intra_ppm,
              CAST(expected_ppm AS BIGINT) AS expected_ppm,
              CAST(intra_ppm - expected_ppm AS BIGINT) AS contrib_ppm,
              CAST(q_intra_ppm - q_expected_ppm AS BIGINT)
                AS modularity_ppm
       FROM terms CROSS JOIN gq ORDER BY com"""


@register(
    "q303_partition_modularity",
    _q303_oracle(),
    "Newman modularity of a labeled partition over the shared "
    "synthetic customer graph — the community-quality score behind "
    "'are these dedup/ER clusters real structure or noise?' (q76's "
    "connected components and q233's propagated labels produce "
    "partitions; this is their acceptance metric).  Communities = "
    "customer nation; Q = sum_c [e_c/m - (d_c/2m)^2] evaluated in "
    "exact floor-ppm integer terms per community (both engines floor "
    "the same two nonneg quotients, then subtract — no fp, no "
    "sign-dependent floor), with the graph restricted to edges whose "
    "BOTH endpoints are labeled (the hash-synthesized id n has no "
    "customer row; inner joins drop it identically in both engines)."
    "  Output: per-community membership, degree mass d_c, intra-edge "
    "count e_c, the two ppm terms and their difference, plus the "
    "global modularity on every row.  Plan: two equi-joins label the "
    "edge endpoints (node-keyed, high-cardinality), the labeled "
    "frame is localCheckpoint'ed once and feeds three "
    "map-combinable aggregates (m, intra counts, incidence counts); "
    "every downstream frame is bounded by the community domain (~25)."
    "  d_c^2 routes through DECIMAL(38,0)/HUGEINT — (2m)^2 x 1e6 "
    "~8e27 at 100 TB, far past int64 (the q271 class, handled from "
    "birth)",
)
def q303(spark: SparkSession, sf: str) -> DataFrame:
    e = _graph_edges(spark, sf)
    com = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("node"), F.col("c_nationkey").alias("com")
    )
    lab = (
        e.join(
            com.select(F.col("node").alias("a"), F.col("com").alias("ca")),
            "a",
        )
        .join(
            com.select(F.col("node").alias("b"), F.col("com").alias("cb")),
            "b",
        )
        .localCheckpoint()  # read by mt, intra, and inc
    )
    mt = lab.agg(F.count("*").alias("m"))
    intra = (
        lab.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("com"))
        .agg(F.count("*").alias("e_c"))
    )
    inc = (
        lab.select(F.col("ca").alias("com"), F.col("a").alias("node"))
        .unionAll(
            lab.select(F.col("cb").alias("com"), F.col("b").alias("node"))
        )
        .groupBy("com")
        .agg(
            F.count("*").alias("d_c"),
            F.countDistinct("node").alias("n_members"),
        )
    )
    per = (
        inc.join(intra, "com", "left")
        .select(
            "com",
            "n_members",
            "d_c",
            F.coalesce(F.col("e_c"), F.lit(0)).alias("e_c"),
        )
        .localCheckpoint()  # ~25 rows; read by terms and the global agg
    )
    terms = per.crossJoin(F.broadcast(mt)).select(
        "com",
        "n_members",
        "d_c",
        "e_c",
        F.expr(
            "CAST(e_c AS DECIMAL(38,0)) * 1000000 div m"  # div-ok: edge share, quotient <= 1e6
        ).alias("intra_ppm"),
        F.expr(
            _exdiv(
                "CAST(d_c AS DECIMAL(38,0)) * d_c * 1000000",
                "4 * CAST(m AS DECIMAL(38,0)) * m",
            )
        ).alias("expected_ppm"),
    )
    g = per.agg(
        F.sum("e_c").alias("sum_e"),
        F.sum(F.expr("CAST(d_c AS DECIMAL(38,0)) * d_c")).alias("sum_d2"),
    )
    gq = g.crossJoin(F.broadcast(mt)).select(
        F.expr(
            "CAST(sum_e AS DECIMAL(38,0)) * 1000000 div m"  # div-ok: edge share, quotient <= 1e6
        ).alias("q_intra_ppm"),
        F.expr(
            _exdiv(
                "sum_d2 * CAST(1000000 AS DECIMAL(38,0))",
                "4 * CAST(m AS DECIMAL(38,0)) * m",
            )
        ).alias("q_expected_ppm"),
    )
    return (
        terms.crossJoin(F.broadcast(gq))
        .select(
            F.col("com").cast("int").alias("com"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("d_c").cast("long").alias("d_c"),
            F.col("e_c").cast("long").alias("e_c"),
            F.col("intra_ppm").cast("long").alias("intra_ppm"),
            F.col("expected_ppm").cast("long").alias("expected_ppm"),
            (F.col("intra_ppm") - F.col("expected_ppm"))
            .cast("long")
            .alias("contrib_ppm"),
            (F.col("q_intra_ppm") - F.col("q_expected_ppm"))
            .cast("long")
            .alias("modularity_ppm"),
        )
        .orderBy("com")
    )


_MASE_CUT = "1999-01-01"


def _q304_oracle() -> str:
    return f"""WITH daily AS (
          SELECT {day_str_sql('o_orderdate')} AS day, count(*) AS y
          FROM orders GROUP BY 1),
       lagged AS (
          SELECT day, y,
                 lag(y, 7) OVER (ORDER BY day) AS y7
          FROM daily),
       err AS (
          SELECT day, abs(y - y7) AS e,
                 CASE WHEN day < '{_MASE_CUT}' THEN 1 ELSE 0 END AS tr
          FROM lagged WHERE y7 IS NOT NULL),
       sums AS (
          SELECT sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS n_train,
                 sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS n_test,
                 sum(CASE WHEN tr = 1 THEN e ELSE 0 END) AS sae_train,
                 sum(CASE WHEN tr = 0 THEN e ELSE 0 END) AS sae_test
          FROM err)
       SELECT CAST(n_train AS BIGINT) AS n_train,
              CAST(n_test AS BIGINT) AS n_test,
              CAST(sae_train AS BIGINT) AS sae_train,
              CAST(sae_test AS BIGINT) AS sae_test,
              CAST(CASE WHEN n_train = 0 THEN -1
                   ELSE (CAST(sae_train AS HUGEINT) * 1000000) // n_train
                   END AS BIGINT) AS mae_train_ppm,
              CAST(CASE WHEN n_test = 0 THEN -1
                   ELSE (CAST(sae_test AS HUGEINT) * 1000000) // n_test
                   END AS BIGINT) AS mae_test_ppm,
              CAST(CASE WHEN n_test = 0 OR sae_train = 0 THEN -1
                   ELSE (CAST(sae_test AS HUGEINT) * n_train * 1000000)
                        // (CAST(n_test AS HUGEINT) * sae_train)
                   END AS BIGINT) AS mase_ppm
       FROM sums"""


@register(
    "q304_forecast_eval_mase",
    _q304_oracle(),
    "seasonal-naive forecast evaluation with MASE (Hyndman's "
    "mean-absolute-scaled-error — THE scale-free forecast-accuracy "
    "standard, and the acceptance gate a capacity-planning or "
    "demand-forecast pipeline runs before trusting any fancier "
    "model: MASE >= 1e6 ppm means the model loses to 'same weekday "
    "last week'): daily order counts, forecast y[t] = y[t-7] over "
    "the observed-day sequence, errors split at "
    f"{_MASE_CUT} into the scaling (train) and evaluation (test) "
    "arms; mase_ppm = floor(sae_test * n_train * 1e6 / (n_test * "
    "sae_train)) with every quotient floored identically in both "
    "engines and empty/zero arms answered with a -1 sentinel "
    "instead of a divide.  Plan: ONE map-side-combinable daily "
    "aggregate collapses the fact table; the lag-7 window and the "
    "conditional sums run on the ~|days| aggregate frame (passes "
    "the audit's aggregate barrier); output is a single row.  The "
    "numerator product sae*n*1e6 routes through HUGEINT/DECIMAL "
    "headroom at 100 TB daily volumes",
)
def q304(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    daily = o.groupBy(day_str("o_orderdate").alias("day")).agg(
        F.count("*").alias("y")
    )
    lagged = daily.select(
        "day", "y", F.lag("y", 7).over(Window.orderBy("day")).alias("y7")
    )
    err = lagged.filter(F.col("y7").isNotNull()).select(
        F.abs(F.col("y") - F.col("y7")).alias("e"),
        F.when(F.col("day") < _MASE_CUT, 1).otherwise(0).alias("tr"),
    )
    sums = err.agg(
        F.sum(F.when(F.col("tr") == 1, 1).otherwise(0)).alias("n_train"),
        F.sum(F.when(F.col("tr") == 0, 1).otherwise(0)).alias("n_test"),
        F.sum(F.when(F.col("tr") == 1, F.col("e")).otherwise(0)).alias(
            "sae_train"
        ),
        F.sum(F.when(F.col("tr") == 0, F.col("e")).otherwise(0)).alias(
            "sae_test"
        ),
    )
    return sums.select(
        F.col("n_train").cast("long").alias("n_train"),
        F.col("n_test").cast("long").alias("n_test"),
        F.col("sae_train").cast("long").alias("sae_train"),
        F.col("sae_test").cast("long").alias("sae_test"),
        F.when(F.col("n_train") == 0, F.lit(-1))
        .otherwise(
            F.expr(
                _exdiv(
                    "CAST(sae_train AS DECIMAL(38,0)) * 1000000", "n_train"
                )
            )
        )
        .cast("long")
        .alias("mae_train_ppm"),
        F.when(F.col("n_test") == 0, F.lit(-1))
        .otherwise(
            F.expr(
                _exdiv("CAST(sae_test AS DECIMAL(38,0)) * 1000000", "n_test")
            )
        )
        .cast("long")
        .alias("mae_test_ppm"),
        F.when(
            (F.col("n_test") == 0) | (F.col("sae_train") == 0), F.lit(-1)
        )
        .otherwise(
            F.expr(
                _exdiv(
                    "CAST(sae_test AS DECIMAL(38,0)) * n_train * 1000000",
                    "CAST(n_test AS DECIMAL(38,0)) * sae_train",
                )
            )
        )
        .cast("long")
        .alias("mase_ppm"),
    )


def _q305_oracle() -> str:
    return """WITH docs AS (
          SELECT doc_id, length(bin(doc_id + 1)) - 1 AS bucket,
                 len(string_split(text, ' ')) AS n_tok
          FROM documents),
       db AS (SELECT bucket, count(*) AS n_docs, sum(n_tok) AS n_toks
              FROM docs GROUP BY bucket),
       post AS (
          SELECT unnest(string_split(text, ' ')) AS token, doc_id
          FROM documents),
       firsts AS (
          SELECT token, min(doc_id) + 1 AS first_rank FROM post
          GROUP BY token),
       vb AS (
          SELECT length(bin(first_rank)) - 1 AS bucket,
                 count(*) AS vocab_new
          FROM firsts GROUP BY 1),
       merged AS (
          SELECT db.bucket, db.n_docs, db.n_toks,
                 coalesce(vb.vocab_new, 0) AS vocab_new
          FROM db LEFT JOIN vb ON vb.bucket = db.bucket),
       cum AS (
          SELECT bucket,
                 sum(n_docs) OVER w AS docs_cum,
                 sum(n_toks) OVER w AS tokens_cum,
                 sum(vocab_new) OVER w AS vocab_cum
          FROM merged
          WINDOW w AS (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       final AS (
          SELECT bucket, docs_cum, tokens_cum, vocab_cum,
                 lag(vocab_cum) OVER (ORDER BY bucket) AS prev_vocab
          FROM cum)
       SELECT CAST(bucket AS INTEGER) AS bucket,
              CAST(docs_cum AS BIGINT) AS docs_cum,
              CAST(tokens_cum AS BIGINT) AS tokens_cum,
              CAST(vocab_cum AS BIGINT) AS vocab_cum,
              CAST((CAST(vocab_cum AS HUGEINT) * 1000000) // tokens_cum
                   AS BIGINT) AS ttr_ppm,
              CAST(CASE WHEN prev_vocab IS NULL OR prev_vocab = 0 THEN -1
                   ELSE (CAST(vocab_cum AS HUGEINT) * 1000000) // prev_vocab
                   END AS BIGINT) AS octave_growth_ppm
       FROM final ORDER BY bucket"""


@register(
    "q305_heaps_vocab_growth",
    _q305_oracle(),
    "Heaps'-law vocabulary-growth curve (the corpus statistic behind "
    "tokenizer-vocab sizing, dedup saturation checks, and 'is more "
    "data still adding new content?' capacity questions): docs in "
    "deterministic doc_id order are cut at power-of-two octave "
    "boundaries (bucket = floor(log2(rank)) via the q174 "
    "len(bin(x))-1 idiom — exact, no fp log); per octave the "
    "cumulative doc/token counts and the cumulative distinct "
    "vocabulary (each type attributed to its FIRST document, so "
    "vocab_cum at bucket b counts types first seen in ranks < "
    "2^(b+1) — computed from one min-per-token aggregate, never a "
    "cumulative re-scan), plus the type-token ratio and the "
    "per-octave vocabulary growth factor in exact floor-ppm (Heaps' "
    "beta = log2(growth) is monotone in the reported factor; a "
    "saturating corpus shows the factor collapsing toward 1e6).  "
    "Plan: two map-side-combinable aggregates over the token "
    "explode (min-rank per type, counts per octave); every window "
    "runs over the <=64-row octave frame behind an aggregate "
    "barrier.  At 100 TB nothing downstream of the two aggregates "
    "exceeds 64 rows",
)
def q305(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    docs = d.select(
        "doc_id",
        (F.length(F.bin(F.col("doc_id") + 1)) - 1).alias("bucket"),
        F.size(T.tokens("text")).alias("n_tok"),
    )
    db = docs.groupBy("bucket").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_toks")
    )
    post = d.select(F.explode(T.tokens("text")).alias("token"), "doc_id")
    vb = (
        post.groupBy("token")
        .agg((F.min("doc_id") + 1).alias("first_rank"))
        .select(
            (F.length(F.bin(F.col("first_rank"))) - 1).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("vocab_new"))
    )
    merged = db.join(vb, "bucket", "left").select(
        "bucket",
        "n_docs",
        "n_toks",
        F.coalesce(F.col("vocab_new"), F.lit(0)).alias("vocab_new"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "bucket",
        F.sum("n_docs").over(w).alias("docs_cum"),
        F.sum("n_toks").over(w).alias("tokens_cum"),
        F.sum("vocab_new").over(w).alias("vocab_cum"),
    ).select(
        "*",
        F.lag("vocab_cum").over(Window.orderBy("bucket")).alias(
            "prev_vocab"
        ),
    )
    return cum.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("docs_cum").cast("long").alias("docs_cum"),
        F.col("tokens_cum").cast("long").alias("tokens_cum"),
        F.col("vocab_cum").cast("long").alias("vocab_cum"),
        F.expr(
            "CAST(vocab_cum AS DECIMAL(38,0)) * 1000000 div tokens_cum"  # div-ok: TTR, quotient <= 1e6
        )
        .cast("long")
        .alias("ttr_ppm"),
        F.when(
            F.col("prev_vocab").isNull() | (F.col("prev_vocab") == 0),
            F.lit(-1),
        )
        .otherwise(
            F.expr(
                "CAST(vocab_cum AS DECIMAL(38,0)) * 1000000 div prev_vocab"  # div-ok: octave growth factor, quotient <= 2e6 (vocab at most doubles per octave... bounded by corpus growth x1e6/prev >= 1; <= tokens ratio ~2e6)
            )
        )
        .cast("long")
        .alias("octave_growth_ppm"),
    ).orderBy("bucket")


_LDIV_L = 3


def _q306_oracle() -> str:
    return f"""WITH joined AS (
          SELECT c.c_nationkey AS nk, c.c_mktsegment AS seg,
                 CAST(floor(CAST(c.c_acctbal AS DECIMAL(18,2)) / 1000)
                      AS INTEGER) AS bal_band,
                 o.o_orderpriority AS sens
          FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey),
       cell AS (
          SELECT nk, seg, bal_band, sens, count(*) AS n
          FROM joined GROUP BY 1, 2, 3, 4),
       grp AS (
          SELECT nk, seg, bal_band,
                 count(*) AS l, sum(n) AS n_rows, max(n) AS max_n
          FROM cell GROUP BY 1, 2, 3)
       SELECT CAST(nk AS INTEGER) AS nk, seg,
              CAST(bal_band AS INTEGER) AS bal_band,
              CAST(n_rows AS BIGINT) AS n_rows,
              CAST(l AS BIGINT) AS l,
              CAST((CAST(max_n AS HUGEINT) * 1000000) // n_rows
                   AS BIGINT) AS top_share_ppm
       FROM grp WHERE l < {_LDIV_L}
       ORDER BY nk, seg, bal_band"""


@register(
    "q306_l_diversity_audit",
    _q306_oracle(),
    "l-diversity audit — the release gate k-anonymity (q241) cannot "
    "express: a quasi-identifier group can have k >= 5 members yet "
    "fully leak its sensitive attribute if every member shares one "
    "value (the homogeneity attack from the l-diversity paper).  "
    "Customers' QI cells (nation x segment x coarse balance band — "
    "q241's exact banding) joined to their orders' priority as the "
    "sensitive attribute; every cell with fewer than "
    f"{_LDIV_L} distinct sensitive values is emitted with its row "
    "count, its diversity l, and the dominant value's share in "
    "exact floor-ppm (recursive (c,l)-diversity's c signal: a "
    "99%-dominant cell is a probabilistic leak even at l >= 2).  "
    "Plan: one equi-join (customer keyed, high cardinality), then "
    "two stacked map-side-combinable aggregates — (QI, sens) cells "
    "first, QI groups second — both bounded by the QI x sensitive "
    "domain, not the population; the report costs one scan at any "
    "scale",
)
def q306(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    band = F.floor(F.col("c_acctbal").cast("decimal(18,2)") / 1000).cast(
        "int"
    )
    joined = c.select(
        F.col("c_custkey").alias("ck"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        band.alias("bal_band"),
    ).join(
        o.select(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderpriority").alias("sens"),
        ),
        "ck",
    )
    cell = joined.groupBy("nk", "seg", "bal_band", "sens").agg(
        F.count("*").alias("n")
    )
    grp = cell.groupBy("nk", "seg", "bal_band").agg(
        F.count("*").alias("l"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
    )
    return (
        grp.filter(F.col("l") < _LDIV_L)
        .select(
            F.col("nk").cast("int").alias("nk"),
            "seg",
            F.col("bal_band").cast("int").alias("bal_band"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("l").cast("long").alias("l"),
            F.expr(
                "CAST(max_n AS DECIMAL(38,0)) * 1000000 div n_rows"  # div-ok: dominant share, quotient <= 1e6
            )
            .cast("long")
            .alias("top_share_ppm"),
        )
        .orderBy("nk", "seg", "bal_band")
    )


def _q307_oracle() -> str:
    return """WITH src AS (
          SELECT doc_id, string_split(text, '') AS ch, strlen(text) AS n,
                 greatest(1, (strlen(text) + 29) // 30) AS h
          FROM documents WHERE doc_id < 200 AND strlen(text) > 0),
       px AS (
          SELECT doc_id,
                 CASE WHEN p < n THEN ord(ch[CAST(p AS INTEGER) + 1])
                      ELSE 0 END AS v,
                 (p // 30) // 4 AS pr, (p % 30) // 6 AS pc
          FROM src, unnest(range(0, h * 30)) AS u(p)),
       pt AS (
          SELECT doc_id, pr, pc, count(*) AS n_px, sum(v) AS r_sum
          FROM px GROUP BY 1, 2, 3)
       SELECT CAST(doc_id AS BIGINT) AS doc_id,
              CAST(pr AS INTEGER) AS patch_row,
              CAST(pc AS INTEGER) AS patch_col,
              CAST(n_px AS INTEGER) AS n_px,
              CAST(r_sum AS BIGINT) AS r_sum,
              CAST((CAST(r_sum AS HUGEINT) * 1000000) // n_px AS BIGINT)
                AS mean_ppm
       FROM pt ORDER BY doc_id, patch_row, patch_col"""


@register(
    "q307_patch_grid_features",
    _q307_oracle(),
    "ViT-style patchification over a REAL image column (the "
    "vision-transformer / CLIP preprocessing primitive 'image -> N "
    "patch tokens', and the multimodal family's 2-D step beyond "
    "q53's whole-image decode and q84's resize): the text bytes are "
    "packed into genuine 24-bpp BMPs (width 30, bottom-up rows, "
    "4-byte stride padding — the real container, same as q53), "
    "decoded by the repo's own codec, and cut into a 4x6 patch "
    "lattice with edge patches keeping their true partial extent; "
    "per patch the exact pixel count and R-channel sum (computed "
    "with np.add.reduceat over the boundary indices — O(pixels), no "
    "per-patch Python loop) plus the floor-ppm mean.  The oracle "
    "recomputes every patch relationally from the source bytes "
    "(pixel p belongs to patch (p//30//4, p%%30//6); pad pixels are "
    "genuine zeros), so one flipped row, mis-strided read, or "
    "off-by-one patch boundary anywhere breaks the differential.  "
    "Plan: (id, payload)-only projection into an Arrow-batched "
    "mapInPandas; patch fanout is a constant factor of pixels "
    "already read; the bounded doc_id < 200 filter is pushed to the "
    "scan.  At 100 TB this is the map-only decode pass every "
    "image-training pipeline runs; nothing shuffles but the patch "
    "rows",
)
def q307(spark: SparkSession, sf: str) -> DataFrame:
    from .. import multimodal as MM

    d = load_table(spark, sf, "documents").filter(
        (F.col("doc_id") < 200) & (F.length("text") > 0)
    )
    patches = MM.patch_grid_pipeline(
        MM.with_bmp_payload(d), patch_h=4, patch_w=6
    )
    return patches.select(
        "doc_id",
        "patch_row",
        "patch_col",
        "n_px",
        "r_sum",
        F.expr(
            "CAST(r_sum AS DECIMAL(38,0)) * 1000000 div n_px"  # div-ok: mean byte value, quotient <= 255e6
        )
        .cast("long")
        .alias("mean_ppm"),
    ).orderBy("doc_id", "patch_row", "patch_col")


def _q308_oracle() -> str:
    return """WITH post AS (
          SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       freq AS (SELECT token, count(*) AS f FROM post GROUP BY token),
       tot AS (SELECT sum(f) AS total FROM freq),
       ranked AS (
          SELECT token, f,
                 row_number() OVER (ORDER BY f DESC, token) AS rn
          FROM freq),
       oct AS (
          SELECT length(bin(rn)) - 1 AS bucket,
                 count(*) AS n_types, sum(f) AS freq_sum
          FROM ranked GROUP BY 1),
       pts AS (
          SELECT bucket, n_types, freq_sum,
                 length(bin(freq_sum // n_types)) - 1 AS po2_mean
          FROM oct),
       fit AS (
          SELECT count(*) AS k, sum(bucket) AS sx, sum(po2_mean) AS sy,
                 sum(bucket * bucket) AS sxx,
                 sum(bucket * po2_mean) AS sxy
          FROM pts)
       SELECT CAST(bucket AS INTEGER) AS bucket,
              CAST(n_types AS BIGINT) AS n_types,
              CAST(freq_sum AS BIGINT) AS freq_sum,
              CAST((CAST(freq_sum AS HUGEINT) * 1000000) // total
                   AS BIGINT) AS share_ppm,
              CAST(po2_mean AS INTEGER) AS po2_mean,
              CAST(k * sxy - sx * sy AS BIGINT) AS slope_num,
              CAST(k * sxx - sx * sx AS BIGINT) AS slope_den
       FROM pts CROSS JOIN fit CROSS JOIN tot ORDER BY bucket"""


@register(
    "q308_zipf_rank_frequency",
    _q308_oracle(),
    "Zipf rank-frequency profile of the token distribution (the "
    "companion diagnostic to q305's Heaps curve — the two laws are "
    "duals, and together they answer 'is this corpus natural "
    "language, template spam, or synthetic?' before any model sees "
    "it): tokens ranked by frequency (two-phase global_row_number — "
    "the vocabulary is corpus-sized at 100 TB, so no single-"
    "partition window; the oracle states the plain window form), "
    "cut into power-of-two rank octaves (len(bin)-1, no fp log); "
    "per octave the type count, total frequency mass, and corpus "
    "share in exact floor-ppm — ideal Zipf(1) puts ~equal mass in "
    "every octave, so the share column IS the eyeball test.  The "
    "po2-quantized log-log regression is reported as its exact "
    "integer normal-equation pair (slope_num, slope_den): the "
    "quotient is ~-1 for natural text, and emitting the unreduced "
    "fraction avoids the engines' differing negative-floor "
    "conventions entirely.  Plan: one map-combinable frequency "
    "aggregate is the only corpus-sized stage; the rank is "
    "range-partitioned; octave rollup, fit, and totals are "
    "<=64-row constant frames",
)
def q308(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    freq = (
        d.select(F.explode(T.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("f"))
    )
    tot = freq.agg(F.sum("f").alias("total"))
    ranked = K.global_row_number(freq, [F.desc("f"), F.asc("token")])
    pts = (
        ranked.select(
            (F.length(F.bin(F.col("rn"))) - 1).alias("bucket"), "f"
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_types"), F.sum("f").alias("freq_sum"))
        .select(
            "bucket",
            "n_types",
            "freq_sum",
            (
                F.length(F.bin(F.expr("freq_sum div n_types"))) - 1  # div-ok: mean octave frequency, quotient <= corpus tokens
            ).alias("po2_mean"),
        )
        .localCheckpoint()  # <=64 rows; read by the fit agg and the report
    )
    fit = pts.agg(
        F.count("*").alias("k"),
        F.sum("bucket").alias("sx"),
        F.sum("po2_mean").alias("sy"),
        F.sum(F.expr("bucket * bucket")).alias("sxx"),
        F.sum(F.expr("bucket * po2_mean")).alias("sxy"),
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("n_types").cast("long").alias("n_types"),
            F.col("freq_sum").cast("long").alias("freq_sum"),
            F.expr(
                "CAST(freq_sum AS DECIMAL(38,0)) * 1000000 div total"  # div-ok: corpus share, quotient <= 1e6
            )
            .cast("long")
            .alias("share_ppm"),
            F.col("po2_mean").cast("int").alias("po2_mean"),
            F.expr("k * sxy - sx * sy").cast("long").alias("slope_num"),
            F.expr("k * sxx - sx * sx").cast("long").alias("slope_den"),
        )
        .orderBy("bucket")
    )


_RV_SHARDS = 8
_RV_MOD = 36028797018963968  # 2^55: headroom so key*16+s stays in int63


def _q309_oracle() -> str:
    hw = hex_hash64_sql(
        "CAST(k AS VARCHAR) || ':' || CAST(s AS VARCHAR)", salt="rv"
    )
    hk = hex_hash64_sql("CAST(own1.k AS VARCHAR)", salt="rvk")
    return f"""WITH keys AS (SELECT c_custkey AS k FROM customer),
       cand AS (
          SELECT k, CAST(s AS INTEGER) AS s,
                 (({hw}) % {_RV_MOD}) * 16 + s AS wkey
          FROM keys, unnest(range(0, {_RV_SHARDS})) AS u(s)),
       own1 AS (SELECT k, CAST(min(wkey) % 16 AS INTEGER) AS s1
                FROM cand GROUP BY k),
       own2 AS (SELECT k, CAST(min(wkey) % 16 AS INTEGER) AS s2
                FROM cand WHERE s >= 1 GROUP BY k),
       j AS (SELECT own1.k AS k, s1, s2, {hk} AS hk
             FROM own1 JOIN own2 ON own2.k = own1.k),
       before AS (SELECT s1 AS shard, count(*) AS n_before
                  FROM j GROUP BY 1),
       after AS (SELECT s2 AS shard, count(*) AS n_after
                 FROM j GROUP BY 1),
       shards AS (
          SELECT CAST(s AS INTEGER) AS shard
          FROM unnest(range(0, {_RV_SHARDS})) AS u(s)),
       pershard AS (
          SELECT sh.shard, coalesce(b.n_before, 0) AS n_before,
                 coalesce(a.n_after, 0) AS n_after
          FROM shards sh
          LEFT JOIN before b ON b.shard = sh.shard
          LEFT JOIN after a ON a.shard = sh.shard),
       gl AS (
          SELECT sum(CASE WHEN s1 <> s2 THEN 1 ELSE 0 END) AS moved_total,
                 sum(CASE WHEN s1 = 0 THEN 1 ELSE 0 END) AS shard0_owned,
                 bit_xor(CASE WHEN s1 <> s2 THEN hk ELSE 0 END)
                   AS moved_xor,
                 bit_xor(CASE WHEN s1 = 0 THEN hk ELSE 0 END)
                   AS shard0_xor
          FROM j)
       SELECT CAST(shard AS INTEGER) AS shard,
              CAST(n_before AS BIGINT) AS n_before,
              CAST(n_after AS BIGINT) AS n_after,
              CAST(moved_total AS BIGINT) AS moved_total,
              CAST(shard0_owned AS BIGINT) AS shard0_owned,
              CAST(CASE WHEN moved_total = shard0_owned
                        AND moved_xor = shard0_xor
                   THEN 1 ELSE 0 END AS INTEGER) AS minimal_disruption_ok
       FROM pershard CROSS JOIN gl ORDER BY shard"""


@register(
    "q309_rendezvous_routing",
    _q309_oracle(),
    f"rendezvous (highest-random-weight) shard routing over "
    f"{_RV_SHARDS} shards with an elasticity differential — the "
    "consistent-placement primitive behind shuffle services, "
    "stateful-stream key routing, and distributed caches (and the "
    "principled alternative to mod-N hashing, which reshuffles "
    "EVERYTHING when N changes): each key's owner is the shard with "
    "the minimum 60-bit keyed hash, computed as one integer argmin "
    "(wkey = (h %% 2^55)*16 + shard encodes hash-then-shard "
    "tiebreak in a single map-combinable min — the q299/q300 "
    "idiom).  The result proves HRW's minimal-disruption theorem "
    "IN-RESULT: recomputing owners with shard 0 decommissioned, "
    "exactly the keys shard 0 owned move (count AND 60-bit xor of "
    "the moved key set both match shard 0's holdings — "
    "minimal_disruption_ok = 1), everything else stays put.  Plan: "
    f"the x{_RV_SHARDS} candidate fanout is a constant factor, both "
    "owner aggregates are map-combinable mins keyed on the "
    "high-cardinality key, and every downstream frame is bounded "
    "by the shard count; at 100 TB this is one scan + two grouped "
    "mins",
)
def q309(spark: SparkSession, sf: str) -> DataFrame:
    keys = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("k")
    )
    cand = keys.select(
        "k",
        F.explode(
            F.array(*[F.lit(s) for s in range(_RV_SHARDS)])
        ).alias("s"),
    ).select(
        "k",
        "s",
        (
            (
                T.hex_hash64(
                    F.concat_ws(
                        ":", F.col("k").cast("string"), F.col("s").cast("string")
                    ),
                    salt="rv",
                )
                % _RV_MOD
            )
            * 16
            + F.col("s")
        ).alias("wkey"),
    )
    own1 = cand.groupBy("k").agg(
        (F.min("wkey") % 16).cast("int").alias("s1")
    )
    own2 = (
        cand.filter(F.col("s") >= 1)
        .groupBy("k")
        .agg((F.min("wkey") % 16).cast("int").alias("s2"))
    )
    j = (
        own1.join(own2, "k")
        .withColumn(
            "hk", T.hex_hash64(F.col("k").cast("string"), salt="rvk")
        )
        .localCheckpoint()  # read by before/after/global aggregates
    )
    before = j.groupBy(F.col("s1").alias("shard")).agg(
        F.count("*").alias("n_before")
    )
    after = j.groupBy(F.col("s2").alias("shard")).agg(
        F.count("*").alias("n_after")
    )
    shards = spark.range(_RV_SHARDS).select(
        F.col("id").cast("int").alias("shard")
    )
    pershard = (
        shards.join(before, "shard", "left")
        .join(after, "shard", "left")
        .select(
            "shard",
            F.coalesce(F.col("n_before"), F.lit(0)).alias("n_before"),
            F.coalesce(F.col("n_after"), F.lit(0)).alias("n_after"),
        )
    )
    glob = j.agg(
        F.sum(F.when(F.col("s1") != F.col("s2"), 1).otherwise(0)).alias(
            "moved_total"
        ),
        F.sum(F.when(F.col("s1") == 0, 1).otherwise(0)).alias(
            "shard0_owned"
        ),
        F.expr(
            "bit_xor(CASE WHEN s1 <> s2 THEN hk ELSE CAST(0 AS BIGINT) END)"
        ).alias("moved_xor"),
        F.expr(
            "bit_xor(CASE WHEN s1 = 0 THEN hk ELSE CAST(0 AS BIGINT) END)"
        ).alias("shard0_xor"),
    )
    return (
        pershard.crossJoin(F.broadcast(glob))
        .select(
            F.col("shard").cast("int").alias("shard"),
            F.col("n_before").cast("long").alias("n_before"),
            F.col("n_after").cast("long").alias("n_after"),
            F.col("moved_total").cast("long").alias("moved_total"),
            F.col("shard0_owned").cast("long").alias("shard0_owned"),
            F.when(
                (F.col("moved_total") == F.col("shard0_owned"))
                & (F.col("moved_xor") == F.col("shard0_xor")),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("minimal_disruption_ok"),
        )
        .orderBy("shard")
    )


def _q310_oracle() -> str:
    return """WITH d AS (SELECT doc_id, text FROM documents
                WHERE doc_id < 200),
       wins AS (
         SELECT doc_id, text, unnest(range(0, length(text) // 64)) AS w
         FROM d),
       en AS (
         SELECT doc_id, CAST(w AS INTEGER) AS win_idx,
                list_sum(list_transform(range(0, 32), i ->
                  (ord(substr(text, CAST(w * 64 + 2 * i + 1 AS INTEGER), 1))
                   + 256 * ord(substr(text,
                       CAST(w * 64 + 2 * i + 2 AS INTEGER), 1)))
                  * (ord(substr(text, CAST(w * 64 + 2 * i + 1 AS INTEGER), 1))
                     + 256 * ord(substr(text,
                         CAST(w * 64 + 2 * i + 2 AS INTEGER), 1)))
                )) AS energy
         FROM wins),
       tot AS (SELECT doc_id, count(*) AS n_win, sum(energy) AS tot_e
               FROM en GROUP BY doc_id),
       fl AS (
         SELECT e.doc_id, e.win_idx,
                CASE WHEN CAST(e.energy AS HUGEINT) * t.n_win > t.tot_e
                     THEN 1 ELSE 0 END AS act
         FROM en e JOIN tot t ON t.doc_id = e.doc_id),
       sg AS (
         SELECT doc_id, win_idx, act,
                lag(act) OVER (PARTITION BY doc_id ORDER BY win_idx) AS pa
         FROM fl),
       per AS (
         SELECT doc_id, count(*) AS n_windows, sum(act) AS n_active,
                coalesce(min(CASE WHEN act = 1 THEN win_idx END), -1)
                  AS first_active,
                coalesce(max(CASE WHEN act = 1 THEN win_idx END), -1)
                  AS last_active,
                sum(CASE WHEN act = 1 AND (pa IS NULL OR pa = 0)
                    THEN 1 ELSE 0 END) AS n_segments
         FROM sg GROUP BY doc_id)
       SELECT CAST(doc_id AS BIGINT) AS doc_id,
              CAST(n_windows AS BIGINT) AS n_windows,
              CAST(n_active AS BIGINT) AS n_active,
              CAST(n_segments AS BIGINT) AS n_segments,
              CAST(first_active AS BIGINT) AS first_active,
              CAST(last_active AS BIGINT) AS last_active,
              CAST((CAST(n_active AS HUGEINT) * 1000000) // n_windows
                   AS BIGINT) AS active_ratio_ppm
       FROM per ORDER BY doc_id"""


@register(
    "q310_audio_vad_trim",
    _q310_oracle(),
    "voice-activity segmentation + silence-trim boundaries over the "
    "REAL PCM path (the audio-curation step after q193's window "
    "energies: 'cut the silence, count the speech runs' — the "
    "preprocessing every ASR/audio-LM corpus build runs): 16-bit LE "
    "PCM framed into 32-sample windows (the same honest Arrow-"
    "batched mapInPandas DSP as q193), a window is ACTIVE iff its "
    "energy strictly exceeds the clip mean — the adaptive threshold "
    "is the integer cross-multiplication energy * n_win > total "
    "(exact, no division, scale-free per clip), routed through "
    "DECIMAL/HUGEINT for hour-long clips.  Per clip: window/active "
    "counts, trim boundaries (first/last active window, -1 sentinel "
    "for all-silent clips), the VAD segment count via the "
    "lag-over-(clip, window) run-start rule (a gaps-islands "
    "instance whose window partitions on the HIGH-cardinality clip "
    "id), and the active ratio in exact floor-ppm.  Plan: the "
    "energy pass is map-only; the per-clip mean join and the lag "
    "window both key on clip id; nothing is corpus-global.  Cites "
    "multimodal.py:audio_energy_windows (real DSP, no stub)",
)
def q310(spark: SparkSession, sf: str) -> DataFrame:
    from ..multimodal import audio_energy_windows, with_payload

    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    en = audio_energy_windows(with_payload(d)).localCheckpoint()
    tot = en.groupBy("doc_id").agg(
        F.count("*").alias("n_win"), F.sum("energy").alias("tot_e")
    )
    fl = en.join(tot, "doc_id").select(
        "doc_id",
        "win_idx",
        F.when(
            F.expr("CAST(energy AS DECIMAL(38,0)) * n_win > tot_e"), 1
        )
        .otherwise(0)
        .alias("act"),
    )
    sg = fl.select(
        "doc_id",
        "win_idx",
        "act",
        F.lag("act").over(
            Window.partitionBy("doc_id").orderBy("win_idx")
        ).alias("pa"),
    )
    per = sg.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        F.sum("act").alias("n_active"),
        F.coalesce(
            F.min(F.when(F.col("act") == 1, F.col("win_idx"))), F.lit(-1)
        ).alias("first_active"),
        F.coalesce(
            F.max(F.when(F.col("act") == 1, F.col("win_idx"))), F.lit(-1)
        ).alias("last_active"),
        F.sum(
            F.when(
                (F.col("act") == 1)
                & (F.col("pa").isNull() | (F.col("pa") == 0)),
                1,
            ).otherwise(0)
        ).alias("n_segments"),
    )
    return per.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_windows").cast("long").alias("n_windows"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_segments").cast("long").alias("n_segments"),
        F.col("first_active").cast("long").alias("first_active"),
        F.col("last_active").cast("long").alias("last_active"),
        F.expr(
            "CAST(n_active AS DECIMAL(38,0)) * 1000000 div n_windows"  # div-ok: activity ratio, quotient <= 1e6
        )
        .cast("long")
        .alias("active_ratio_ppm"),
    ).orderBy("doc_id")


_AA_EXPERIMENTS = 10
_AA_ALERT_PPM = 5000


def _q311_oracle() -> str:
    he = hex_hash64_sql("CAST(ck AS VARCHAR)", salt="aae")
    ha = hex_hash64_sql("CAST(ck AS VARCHAR)", salt="aab")
    return f"""WITH spend AS (
          SELECT o_custkey AS ck,
                 sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS cents
          FROM orders GROUP BY o_custkey),
       assigned AS (
          SELECT ck, cents,
                 CAST(({he}) % {_AA_EXPERIMENTS} AS INTEGER) AS expt,
                 CAST(({ha}) % 2 AS INTEGER) AS arm
          FROM spend),
       cells AS (
          SELECT expt,
                 sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
                 sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
                 sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS cents_a,
                 sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS cents_b
          FROM assigned GROUP BY expt),
       lifts AS (
          SELECT expt, n_a, n_b, cents_a, cents_b,
                 CAST((CAST(cents_a AS HUGEINT) * n_b * 1000000)
                      // (CAST(cents_b AS HUGEINT) * n_a) AS BIGINT)
                   - 1000000 AS lift_ppm
          FROM cells),
       gl AS (
          SELECT max(abs(lift_ppm)) AS max_abs_lift_ppm,
                 sum(CASE WHEN abs(lift_ppm) > {_AA_ALERT_PPM}
                     THEN 1 ELSE 0 END) AS n_false_alarms
          FROM lifts)
       SELECT CAST(expt AS INTEGER) AS expt,
              CAST(n_a AS BIGINT) AS n_a,
              CAST(n_b AS BIGINT) AS n_b,
              CAST(cents_a AS BIGINT) AS cents_a,
              CAST(cents_b AS BIGINT) AS cents_b,
              CAST(lift_ppm AS BIGINT) AS lift_ppm,
              CAST(max_abs_lift_ppm AS BIGINT) AS max_abs_lift_ppm,
              CAST(n_false_alarms AS BIGINT) AS n_false_alarms
       FROM lifts CROSS JOIN gl ORDER BY expt"""


@register(
    "q311_aa_calibration",
    _q311_oracle(),
    f"A/A calibration harness over {_AA_EXPERIMENTS} simultaneous "
    "pseudo-experiments (the health check every experimentation "
    "platform runs BEFORE trusting any A/B readout: hash users into "
    "disjoint experiments, hash-split each into two arms that "
    "received IDENTICAL treatment, and measure how big the "
    "no-effect 'lifts' come out — q136's assignment and q230's "
    "variance reduction assume this is calibrated): randomization "
    "unit is the customer (per-customer spend in exact cents, one "
    "map-combinable aggregate), assignment via two independent "
    "60-bit keyed hashes, per-experiment relative lift in exact "
    "floor-ppm via the cross-multiplied ratio (cents_a*n_b*1e6 // "
    "(cents_b*n_a) — positive-operand division only, so both "
    "engines floor identically; the subtraction centers it), and "
    f"the report flags |lift| > {_AA_ALERT_PPM} ppm as a false "
    "alarm with the max across experiments.  The numerator is "
    "~1e32 at 100 TB — DECIMAL(38,0)/HUGEINT from birth (the q271 "
    "class).  Plan: one fact aggregate, one "
    f"{_AA_EXPERIMENTS}-row cell rollup, constant frames after",
)
def q311(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    spend = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            )
        ).alias("cents")
    )
    assigned = spend.select(
        "cents",
        (
            T.hex_hash64(F.col("ck").cast("string"), salt="aae")
            % _AA_EXPERIMENTS
        )
        .cast("int")
        .alias("expt"),
        (T.hex_hash64(F.col("ck").cast("string"), salt="aab") % 2)
        .cast("int")
        .alias("arm"),
    )
    cells = assigned.groupBy("expt").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("cents")).otherwise(0)).alias(
            "cents_a"
        ),
        F.sum(F.when(F.col("arm") == 1, F.col("cents")).otherwise(0)).alias(
            "cents_b"
        ),
    )
    lifts = cells.select(
        "expt",
        "n_a",
        "n_b",
        "cents_a",
        "cents_b",
        (
            F.expr(
                _exdiv(
                    "CAST(cents_a AS DECIMAL(38,0)) * n_b * 1000000",
                    "CAST(cents_b AS DECIMAL(38,0)) * n_a",
                )
            )
            - 1000000
        )
        .cast("long")
        .alias("lift_ppm"),
    ).localCheckpoint()  # 10 rows; read by the report and the alarm agg
    gl = lifts.agg(
        F.max(F.abs(F.col("lift_ppm"))).alias("max_abs_lift_ppm"),
        F.sum(
            F.when(F.abs(F.col("lift_ppm")) > _AA_ALERT_PPM, 1).otherwise(0)
        ).alias("n_false_alarms"),
    )
    return (
        lifts.crossJoin(F.broadcast(gl))
        .select(
            F.col("expt").cast("int").alias("expt"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("cents_a").cast("long").alias("cents_a"),
            F.col("cents_b").cast("long").alias("cents_b"),
            "lift_ppm",
            F.col("max_abs_lift_ppm").cast("long").alias(
                "max_abs_lift_ppm"
            ),
            F.col("n_false_alarms").cast("long").alias("n_false_alarms"),
        )
        .orderBy("expt")
    )


_BT_VALID_AS_OF = "1997-06-01"
_BT_TX_AS_OF = "1997-05-15"


def _q312_oracle() -> str:
    hx = hex_hash64_sql(
        "CAST(c.o_orderkey AS VARCHAR) || ':' || CAST(c.ver AS VARCHAR)",
        salt="bt",
    )
    return f"""WITH vers AS (
          SELECT o_orderkey, CAST(v AS INTEGER) AS ver,
                 strftime(o_orderdate + (v * 30) * INTERVAL 1 DAY,
                          '%Y-%m-%d') AS valid_from,
                 strftime(o_orderdate + (v * 7) * INTERVAL 1 DAY,
                          '%Y-%m-%d') AS tx_from,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   + v * 111 AS cents
          FROM orders, unnest(range(0, 3)) AS u(v)),
       eligible AS (
          SELECT * FROM vers
          WHERE valid_from <= '{_BT_VALID_AS_OF}'
            AND tx_from <= '{_BT_TX_AS_OF}'),
       chosen AS (
          SELECT o_orderkey, max(ver) AS ver FROM eligible
          GROUP BY o_orderkey),
       state AS (
          SELECT c.ver AS ver, v.cents AS cents, {hx} AS hx
          FROM chosen c JOIN vers v
            ON v.o_orderkey = c.o_orderkey AND v.ver = c.ver)
       SELECT CAST(ver AS INTEGER) AS ver,
              CAST(count(*) AS BIGINT) AS n_orders,
              CAST(sum(cents) AS BIGINT) AS cents_sum,
              CAST(bit_xor(hx) AS BIGINT) AS state_xor
       FROM state GROUP BY ver ORDER BY ver"""


@register(
    "q312_bitemporal_asof",
    _q312_oracle(),
    "bitemporal as-of reconstruction (Snodgrass's two-axis temporal "
    "query, the combination q177's transaction-time travel and "
    "q205's valid-time SCD2 join each answer only half of: 'what "
    "did the warehouse BELIEVE on tx date T the world looked like "
    "on valid date V?' — the audit/restatement query every "
    "regulated pipeline must answer): each order carries three "
    "versions with diverging valid-from (every 30 days) and "
    "transaction-from (every 7 days — corrections land on a "
    f"different cadence than they take effect); at V={_BT_VALID_AS_OF}"
    f" / T={_BT_TX_AS_OF} the reconstructed state picks, per order, "
    "the max version visible on BOTH axes (the version generator is "
    "monotone on both, so the two-predicate filter + one "
    "map-combinable max is exact — the general non-monotone case is "
    "q279's max_by(struct) pick over the same frame).  Result: "
    "per-chosen-version counts, cent sums, and a 60-bit xor of "
    "every (order, version) pick — one wrong reconstruction "
    "anywhere breaks it.  Plan: the x3 version fanout is constant, "
    "both predicates push to the scan side of the fanout, the "
    "argmax groups on the high-cardinality order key, and the "
    "version re-join is equi-keyed; output is 3 rows",
)
def q312(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    vers = o.select(
        "o_orderkey",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("ver"),
        F.to_date("o_orderdate").alias("od"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents0"),
    ).select(
        "o_orderkey",
        "ver",
        day_str(F.date_add(F.col("od"), F.col("ver") * 30)).alias(
            "valid_from"
        ),
        day_str(F.date_add(F.col("od"), F.col("ver") * 7)).alias(
            "tx_from"
        ),
        (F.col("cents0") + F.col("ver") * 111).alias("cents"),
    )
    eligible = vers.filter(
        (F.col("valid_from") <= _BT_VALID_AS_OF)
        & (F.col("tx_from") <= _BT_TX_AS_OF)
    )
    chosen = eligible.groupBy("o_orderkey").agg(F.max("ver").alias("ver"))
    state = chosen.join(vers, ["o_orderkey", "ver"]).select(
        "ver",
        "cents",
        T.hex_hash64(
            F.concat_ws(
                ":",
                F.col("o_orderkey").cast("string"),
                F.col("ver").cast("string"),
            ),
            salt="bt",
        ).alias("hx"),
    )
    return (
        state.groupBy("ver")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("cents_sum"),
            F.expr("bit_xor(hx)").alias("state_xor"),
        )
        .select(
            F.col("ver").cast("int").alias("ver"),
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("cents_sum").cast("long").alias("cents_sum"),
            F.col("state_xor").cast("long").alias("state_xor"),
        )
        .orderBy("ver")
    )


_REC_CAP = 50
_REC_K = 10
_REC_EVAL_MOD = 5  # evaluate on a deterministic 20% customer sample


def _q313_oracle() -> str:
    hx = hex_hash64_sql(
        "CAST(ck AS VARCHAR) || ':' || CAST(hpk AS VARCHAR)", salt="rec"
    )
    hs = hex_hash64_sql("CAST(ck AS VARCHAR)", salt="rse")
    return f"""WITH li AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       oi AS (SELECT o_orderkey AS ok, o_custkey AS ck,
                     {day_str_sql('o_orderdate')} AS od
              FROM orders),
       bask AS (SELECT li.ok AS ok, li.pk AS pk, oi.ck AS ck, oi.od AS od
                FROM li JOIN oi ON oi.ok = li.ok),
       cpa AS (SELECT ck, pk, max(od) AS last_day FROM bask
               GROUP BY ck, pk),
       cp AS (SELECT * FROM cpa
              WHERE ({hs}) % {_REC_EVAL_MOD} = 0),
       hd1 AS (SELECT ck, max(last_day) AS hday FROM cp GROUP BY ck),
       hd AS (SELECT cp.ck AS ck, max(cp.pk) AS hpk
              FROM cp JOIN hd1 h
                ON h.ck = cp.ck AND cp.last_day = h.hday
              GROUP BY cp.ck),
       train AS (
          SELECT cp.ck AS ck, cp.pk AS pk
          FROM cp JOIN hd ON hd.ck = cp.ck
          WHERE cp.pk <> hd.hpk),
       elig AS (SELECT DISTINCT ck FROM train),
       co AS (SELECT a.pk AS apk, b.pk AS bpk, count(*) AS c
              FROM li a JOIN li b ON b.ok = a.ok AND b.pk <> a.pk
              GROUP BY 1, 2),
       cocap AS (
          SELECT apk, bpk, c FROM (
             SELECT apk, bpk, c,
                    row_number() OVER (PARTITION BY apk
                                       ORDER BY c DESC, bpk) AS r
             FROM co) WHERE r <= {_REC_CAP}),
       cand AS (
          SELECT t.ck AS ck, cc.bpk AS bpk, sum(cc.c) AS score
          FROM train t JOIN cocap cc ON cc.apk = t.pk
          GROUP BY t.ck, cc.bpk),
       cand2 AS (
          SELECT c.ck AS ck, c.bpk AS bpk, c.score AS score
          FROM cand c
          LEFT JOIN train t2 ON t2.ck = c.ck AND t2.pk = c.bpk
          WHERE t2.pk IS NULL),
       ranked AS (
          SELECT ck, bpk,
                 row_number() OVER (PARTITION BY ck
                                    ORDER BY score DESC, bpk) AS rn
          FROM cand2),
       hits AS (
          SELECT hd.ck AS ck, r.rn AS rn
          FROM hd JOIN ranked r ON r.ck = hd.ck AND r.bpk = hd.hpk),
       hsum AS (
          SELECT coalesce(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END), 0)
                   AS hits_at_1,
                 coalesce(sum(CASE WHEN rn <= {_REC_K} THEN 1 ELSE 0 END),
                          0) AS hits_at_k
          FROM hits),
       ev AS (
          SELECT count(*) AS n_eval, bit_xor({hx}) AS holdout_xor
          FROM hd SEMI JOIN elig ON elig.ck = hd.ck)
       SELECT CAST(n_eval AS BIGINT) AS n_eval,
              CAST(hits_at_1 AS BIGINT) AS hits_at_1,
              CAST(hits_at_k AS BIGINT) AS hits_at_k,
              CAST((CAST(hits_at_1 AS HUGEINT) * 1000000) // n_eval
                   AS BIGINT) AS hr1_ppm,
              CAST((CAST(hits_at_k AS HUGEINT) * 1000000) // n_eval
                   AS BIGINT) AS hrk_ppm,
              CAST(holdout_xor AS BIGINT) AS holdout_xor
       FROM ev CROSS JOIN hsum"""


@register(
    "q313_recsys_holdout_eval",
    _q313_oracle(),
    "leave-one-out recommender evaluation end-to-end (the offline "
    "acceptance test behind every co-purchase / 'users also bought' "
    "candidate generator, and the recsys sibling of q209's ANN "
    "recall eval): per customer the LAST-purchased distinct part "
    "(max purchase day, part-id tiebreak — two stacked "
    "map-combinable maxes, no per-customer window) is held out; a "
    "co-occurrence model built from order baskets (distinct-part "
    "pairs within an order — the fanout is C(basket,2), a property "
    "of basket size, not corpus size) is truncated to each part's "
    f"top-{_REC_CAP} co-items via the two-phase "
    "top_k_per_group_scalable (serving-style truncated posting "
    "lists — this cap is what bounds the candidate join at 100 TB); "
    "candidates = union of the training parts' lists minus the "
    "training parts themselves, scored by summed co-counts, "
    f"top-{_REC_K} per customer again two-phase.  Report: evaluated "
    "customers, hits@1 / hits@k, hit rates in exact floor-ppm, and "
    "a 60-bit xor over every (customer, holdout) pick so the "
    "holdout selection itself is differentially pinned.  The MODEL "
    "is built from every order; the EVALUATION runs on a "
    f"deterministic 1/{_REC_EVAL_MOD} hash sample of customers — "
    "the standard offline-eval protocol, and the explicit scale "
    "bound: the candidate frame is |sampled train parts| x cap, "
    "never |all customers| x cap (unsampled, that intermediate was "
    "measured 23M rows at sf0.1 and is the one term that would "
    "outgrow the cluster at 100 TB).  Plan: every join is "
    "equi-keyed on customer/part/order ids, both rankings are "
    "two-phase (no vocabulary- or customer-sized window "
    "partition), and the only super-linear term is the bounded "
    "basket-pair fanout",
)
def q313(spark: SparkSession, sf: str) -> DataFrame:
    # NOT checkpointed: a column-pruned parquet scan + distinct is
    # cheaper to re-evaluate than to pin in executor memory (the three
    # consumers each re-read two pushed-down columns; pinning ~600k
    # deserialized rows was the vanilla-1g-heap OOM driver at sf0.1)
    li = (
        load_table(spark, sf, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    oi = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        day_str("o_orderdate").alias("od"),
    )
    cp = (
        li.join(oi, "ok")
        .groupBy("ck", "pk")
        .agg(F.max("od").alias("last_day"))
        .filter(
            T.hex_hash64(F.col("ck").cast("string"), salt="rse")
            % _REC_EVAL_MOD
            == 0
        )
        .localCheckpoint()  # read by hd1, hd, and train
    )
    hd1 = (
        cp.groupBy("ck")
        .agg(F.max("last_day").alias("hday"))
        .select(F.col("ck").alias("hck"), "hday")
    )
    hd = (
        cp.join(
            hd1,
            (F.col("ck") == F.col("hck"))
            & (F.col("last_day") == F.col("hday")),
        )
        .select("ck", "pk")
        .groupBy("ck")
        .agg(F.max("pk").alias("hpk"))
        .localCheckpoint()  # read by train, hits, and the eval agg
    )
    train = (
        cp.join(hd, "ck")
        .filter(F.col("pk") != F.col("hpk"))
        .select("ck", "pk")
        .localCheckpoint()  # read by cand, the anti join, and elig
    )
    co = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.pk") != F.col("b.pk")),
        )
        .groupBy(
            F.col("a.pk").alias("apk"), F.col("b.pk").alias("bpk")
        )
        .agg(F.count("*").alias("c"))
    )
    cocap = K.top_k_per_group_scalable(
        co, ["apk"], [F.desc("c"), F.asc("bpk")], _REC_CAP
    ).select("apk", "bpk", "c")
    cand = (
        train.join(cocap, train["pk"] == cocap["apk"])
        .groupBy("ck", "bpk")
        .agg(F.sum("c").alias("score"))
    )
    cand2 = cand.join(
        train.select("ck", F.col("pk").alias("bpk")),
        ["ck", "bpk"],
        "anti",
    )
    ranked = K.top_k_per_group_scalable(
        cand2, ["ck"], [F.desc("score"), F.asc("bpk")], _REC_K, "rn"
    )
    hits = hd.join(
        ranked.select("ck", F.col("bpk").alias("hpk"), "rn"),
        ["ck", "hpk"],
    )
    hsum = hits.agg(
        F.coalesce(
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)), F.lit(0)
        ).alias("hits_at_1"),
        F.coalesce(
            F.sum(F.when(F.col("rn") <= _REC_K, 1).otherwise(0)), F.lit(0)
        ).alias("hits_at_k"),
    )
    ev = (
        hd.join(train.select("ck").distinct(), "ck", "semi")
        .select(
            T.hex_hash64(
                F.concat_ws(
                    ":",
                    F.col("ck").cast("string"),
                    F.col("hpk").cast("string"),
                ),
                salt="rec",
            ).alias("hx")
        )
        .agg(
            F.count("*").alias("n_eval"),
            F.expr("bit_xor(hx)").alias("holdout_xor"),
        )
    )
    return ev.crossJoin(F.broadcast(hsum)).select(
        F.col("n_eval").cast("long").alias("n_eval"),
        F.col("hits_at_1").cast("long").alias("hits_at_1"),
        F.col("hits_at_k").cast("long").alias("hits_at_k"),
        F.expr(
            "CAST(hits_at_1 AS DECIMAL(38,0)) * 1000000 div n_eval"  # div-ok: hit rate, quotient <= 1e6
        )
        .cast("long")
        .alias("hr1_ppm"),
        F.expr(
            "CAST(hits_at_k AS DECIMAL(38,0)) * 1000000 div n_eval"  # div-ok: hit rate, quotient <= 1e6
        )
        .cast("long")
        .alias("hrk_ppm"),
        F.col("holdout_xor").cast("long").alias("holdout_xor"),
    )


#: (tag, table, column) — the integer key/dimension columns profiled
#: by the join-discovery scan.  Plain list so Spark and the oracle
#: enumerate the identical column set.
_JD_COLS = [
    ("c_custkey", "customer", "c_custkey"),
    ("o_custkey", "orders", "o_custkey"),
    ("c_nationkey", "customer", "c_nationkey"),
    ("s_nationkey", "supplier", "s_nationkey"),
    ("n_nationkey", "nation", "n_nationkey"),
    ("p_partkey", "part", "p_partkey"),
    ("l_partkey", "lineitem", "l_partkey"),
    ("o_orderkey", "orders", "o_orderkey"),
    ("l_orderkey", "lineitem", "l_orderkey"),
]
_JD_FK_PPM = 950000


def _q314_oracle() -> str:
    stacks = "\n          UNION ALL ".join(
        f"SELECT '{tag}' AS tag, CAST({col} AS BIGINT) AS v FROM {tbl}"
        for tag, tbl, col in _JD_COLS
    )
    return f"""WITH stacked AS ({stacks}),
       d AS (SELECT DISTINCT tag, v FROM stacked),
       pert AS (SELECT tag, count(*) AS n FROM d GROUP BY tag),
       inter AS (
          SELECT a.tag AS ta, b.tag AS tb, count(*) AS i
          FROM d a JOIN d b ON b.v = a.v AND a.tag < b.tag
          GROUP BY 1, 2),
       grid AS (
          SELECT pa.tag AS ta, pa.n AS na, pb.tag AS tb, pb.n AS nb
          FROM pert pa JOIN pert pb ON pa.tag < pb.tag),
       rep AS (
          SELECT g.ta, g.tb, g.na, g.nb, coalesce(i.i, 0) AS i
          FROM grid g LEFT JOIN inter i
            ON i.ta = g.ta AND i.tb = g.tb)
       SELECT ta, tb,
              CAST(na AS BIGINT) AS n_a,
              CAST(nb AS BIGINT) AS n_b,
              CAST(i AS BIGINT) AS n_common,
              CAST((CAST(i AS HUGEINT) * 1000000) // (na + nb - i)
                   AS BIGINT) AS jaccard_ppm,
              CAST((CAST(i AS HUGEINT) * 1000000) // least(na, nb)
                   AS BIGINT) AS containment_ppm,
              CAST(CASE WHEN (CAST(i AS HUGEINT) * 1000000)
                             // least(na, nb) >= {_JD_FK_PPM}
                   THEN 1 ELSE 0 END AS INTEGER) AS fk_candidate
       FROM rep ORDER BY ta, tb"""


@register(
    "q314_join_key_discovery",
    _q314_oracle(),
    "join-key / foreign-key discovery by exact value-set overlap "
    "(the data-catalog primitive behind 'which columns join?' — "
    "schema matching, FK inference for lakehouse tables that "
    "declare no constraints, and the auto-join suggestion every "
    "BI layer ships): nine integer key/dimension columns across "
    "six tables are stacked as (column, value), deduplicated, and "
    "every column pair gets its exact intersection size via ONE "
    "value-keyed equi-join over the stacked distinct frame — no "
    "per-pair rescans (36 pairs costs the same join as 1).  "
    "Jaccard and containment in exact floor-ppm; containment >= "
    "95% flags an FK candidate, and the result demonstrates the "
    "classic false-positive this method must surface honestly: "
    "tiny domains (nationkey, 25 values) are fully contained in "
    "any dense surrogate range, so the flag must be read with "
    "domain size — which is why n_a/n_b ride every row.  Plan: "
    "per-column distincts are map-side-combinable over "
    "column-pruned scans, the stack is one union, the "
    "intersection join keys on the value (high cardinality), and "
    "the 9x9 grid/report frames are constants.  At 100 TB this is "
    "the scan-once profile a catalog crawler runs per table "
    "onboarding",
)
def q314(spark: SparkSession, sf: str) -> DataFrame:
    frames = []
    for tag, tbl, col in _JD_COLS:
        frames.append(
            load_table(spark, sf, tbl)
            .select(F.col(col).cast("long").alias("v"))
            .distinct()
            .select(F.lit(tag).alias("tag"), "v")
        )
    d = frames[0]
    for fr in frames[1:]:
        d = d.unionByName(fr)
    d = d.localCheckpoint()  # read by pert and both sides of the join
    pert = d.groupBy("tag").agg(F.count("*").alias("n"))
    inter = (
        d.alias("a")
        .join(
            d.alias("b"),
            (F.col("a.v") == F.col("b.v"))
            & (F.col("a.tag") < F.col("b.tag")),
        )
        .groupBy(F.col("a.tag").alias("ta"), F.col("b.tag").alias("tb"))
        .agg(F.count("*").alias("i"))
    )
    grid = (
        pert.select(F.col("tag").alias("ta"), F.col("n").alias("na"))
        .join(
            pert.select(F.col("tag").alias("tb"), F.col("n").alias("nb")),
            F.col("ta") < F.col("tb"),
        )
    )
    rep = grid.join(inter, ["ta", "tb"], "left").select(
        "ta",
        "tb",
        "na",
        "nb",
        F.coalesce(F.col("i"), F.lit(0)).alias("i"),
    )
    return rep.select(
        "ta",
        "tb",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("i").cast("long").alias("n_common"),
        F.expr(
            "CAST(i AS DECIMAL(38,0)) * 1000000 div (na + nb - i)"  # div-ok: Jaccard, quotient <= 1e6
        )
        .cast("long")
        .alias("jaccard_ppm"),
        F.expr(
            "CAST(i AS DECIMAL(38,0)) * 1000000 div least(na, nb)"  # div-ok: containment, quotient <= 1e6
        )
        .cast("long")
        .alias("containment_ppm"),
        F.when(
            F.expr(
                "CAST(i AS DECIMAL(38,0)) * 1000000 div least(na, nb)"  # div-ok: containment, quotient <= 1e6
            )
            >= _JD_FK_PPM,
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("fk_candidate"),
    ).orderBy("ta", "tb")


_DB_EPS = 30_000  # d2 <= eps^2 = 9e8 over the 1e6-square point field
_DB_MINPTS = 4  # neighbors within eps, excluding the point itself


def _q315_oracle() -> str:
    hx = hex_hash64_sql("CAST(id AS VARCHAR)", salt="db")
    return f"""WITH p AS (
          SELECT c_custkey AS id,
                 {hex_hash64_sql("CAST(c_custkey AS VARCHAR)", salt="x")}
                   % 1000000 AS x,
                 {hex_hash64_sql("CAST(c_custkey AS VARCHAR)", salt="y")}
                   % 1000000 AS y
          FROM customer),
       pr AS (
          SELECT a.id AS ida, b.id AS idb
          FROM p a JOIN p b ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= CAST({_DB_EPS} AS BIGINT) * {_DB_EPS}),
       sym AS (SELECT ida AS id, idb AS nb FROM pr
               UNION ALL SELECT idb, ida FROM pr),
       deg AS (SELECT id, count(*) AS k FROM sym GROUP BY id),
       lab0 AS (
          SELECT p.id, coalesce(deg.k, 0) AS k
          FROM p LEFT JOIN deg ON deg.id = p.id),
       core AS (SELECT id FROM lab0 WHERE k >= {_DB_MINPTS}),
       nearcore AS (
          SELECT DISTINCT s.id FROM sym s
          SEMI JOIN core c ON c.id = s.nb),
       lab AS (
          SELECT l.id,
                 CASE WHEN l.k >= {_DB_MINPTS} THEN 'core'
                      WHEN nc.id IS NOT NULL THEN 'border'
                      ELSE 'noise' END AS label
          FROM lab0 l LEFT JOIN nearcore nc ON nc.id = l.id)
       SELECT label,
              CAST(count(*) AS BIGINT) AS n,
              CAST(bit_xor({hx}) AS BIGINT) AS id_xor
       FROM lab GROUP BY label ORDER BY label"""


@register(
    "q315_dbscan_core_labels",
    _q315_oracle(),
    "DBSCAN density labeling (core / border / noise — the first and "
    "load-bearing pass of density clustering, and the principled "
    "outlier screen q131's MAD z-scores can't give 2-D data) over "
    "the q135 point field: eps-neighbor counts come from the "
    "grid-bucketed radius self-join (operators/spatial.py — cell = "
    "eps, one side replicated x9, exact integer d2 predicate; NEVER "
    "the O(n^2) pair scan, which is what the oracle states), a "
    f"point is core with >= {_DB_MINPTS} neighbors, border if "
    "non-core but eps-adjacent to a core (one semi-join of the "
    "pair list against the core set), noise otherwise — including "
    "zero-pair isolates, which ride a LEFT join from the full "
    "point frame.  Per-class counts and a 60-bit xor of each class "
    "membership pin every label.  Plan: the pair join is the "
    "bounded grid shape, degree/label stages key on point ids, the "
    "report is 3 rows.  Full DBSCAN = these labels + q76's "
    "connected components restricted to core-core edges.  COST "
    "MODEL (measured, not assumed): the work is Theta(eps-pairs), "
    "which grows with DENSITY squared — the fixed-area replication "
    "stress is a density stress, and eps was sized so the "
    "per-point neighborhood stays O(10) at the bench scales; on "
    "real geo data at 100 TB the area grows with the data and the "
    "same eps keeps the pair count linear.  An eps chosen without "
    "that check is how DBSCAN jobs melt down in production",
)
def q315(spark: SparkSession, sf: str) -> DataFrame:
    pts = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"),
        (
            T.hex_hash64(F.col("c_custkey").cast("string"), salt="x")
            % 1000000
        ).alias("x"),
        (
            T.hex_hash64(F.col("c_custkey").cast("string"), salt="y")
            % 1000000
        ).alias("y"),
    )
    # Checkpoint the PAIR list, not its symmetrized double: sym below is
    # a union of two selects over pr, so checkpointing sym instead would
    # (a) run the quadratic grid join twice — once per union branch —
    # and (b) store 2x the rows.  The r6 skewed-wave straggler gate
    # caught exactly that: every task read identical input, but the
    # final scheduling wave ran 5x the stage median because the
    # checkpoint store was at capacity and the last writers paid the
    # eviction/spill.  One checkpointed copy of pr halves both the
    # join work and the storage footprint; sym stays a cheap lazy
    # union over the cached pairs.
    pr = (
        SP.grid_radius_pairs(pts, "id", "x", "y", _DB_EPS)
        .select(F.col("id_a").alias("ida"), F.col("id_b").alias("idb"))
        .localCheckpoint()  # read 2x each by deg and the near-core semi join
    )
    sym = pr.select(F.col("ida").alias("id"), F.col("idb").alias("nb")).unionAll(
        pr.select(F.col("idb").alias("id"), F.col("ida").alias("nb"))
    )
    deg = sym.groupBy("id").agg(F.count("*").alias("k"))
    lab0 = (
        pts.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce(F.col("k"), F.lit(0)).alias("k"))
        .localCheckpoint()  # read by core and the label join
    )
    core = lab0.filter(F.col("k") >= _DB_MINPTS).select("id")
    nearcore = (
        sym.join(core.select(F.col("id").alias("nb")), "nb", "semi")
        .select("id")
        .distinct()
        .withColumn("is_near", F.lit(1))
    )
    lab = lab0.join(nearcore, "id", "left").select(
        "id",
        F.when(F.col("k") >= _DB_MINPTS, F.lit("core"))
        .when(F.col("is_near").isNotNull(), F.lit("border"))
        .otherwise(F.lit("noise"))
        .alias("label"),
    )
    return (
        lab.select(
            "label",
            T.hex_hash64(F.col("id").cast("string"), salt="db").alias("hx"),
        )
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr("bit_xor(hx)").cast("long").alias("id_xor"),
        )
        .orderBy("label")
    )


def _q316_oracle() -> str:
    return f"""WITH daily AS (
          SELECT {day_str_sql('o_orderdate')} AS day, count(*) AS y
          FROM orders GROUP BY 1),
       pre AS (
          SELECT day, y,
                 row_number() OVER (ORDER BY day) AS i,
                 sum(CAST(y AS HUGEINT)) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sl,
                 sum(CAST(y AS HUGEINT) * y) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2l
          FROM daily),
       tot AS (
          SELECT count(*) AS n, sum(CAST(y AS HUGEINT)) AS s,
                 sum(CAST(y AS HUGEINT) * y) AS s2
          FROM daily),
       rootc AS (
          SELECT day, i, sl, s2l,
                 (s2l * 1000000 - (sl * sl * 1000000) // i)
                 + ((s2 - s2l) * 1000000
                    - ((s - sl) * (s - sl) * 1000000) // (n - i)) AS cost
          FROM pre CROSS JOIN tot WHERE i < n),
       root AS (SELECT * FROM rootc ORDER BY cost, day LIMIT 1),
       leftc AS (
          SELECT p.day, p.i - 0 AS n_left, r.i AS seg_n,
                 (p.s2l * 1000000 - (p.sl * p.sl * 1000000) // p.i)
                 + ((r.s2l - p.s2l) * 1000000
                    - ((r.sl - p.sl) * (r.sl - p.sl) * 1000000)
                      // (r.i - p.i)) AS cost
          FROM pre p CROSS JOIN root r WHERE p.i < r.i),
       lbest AS (SELECT * FROM leftc ORDER BY cost, day LIMIT 1),
       rightc AS (
          SELECT p.day, p.i - r.i AS n_left, n - r.i AS seg_n,
                 ((p.s2l - r.s2l) * 1000000
                  - ((p.sl - r.sl) * (p.sl - r.sl) * 1000000)
                    // (p.i - r.i))
                 + ((s2 - p.s2l) * 1000000
                    - ((s - p.sl) * (s - p.sl) * 1000000) // (n - p.i))
                   AS cost
          FROM pre p CROSS JOIN root r CROSS JOIN tot
          WHERE p.i > r.i AND p.i < n),
       rbest AS (SELECT * FROM rightc ORDER BY cost, day LIMIT 1),
       lvls AS (
          SELECT 0 AS level, r.day AS split_day,
                 (SELECT n FROM tot) AS seg_n, r.i AS n_left,
                 r.cost AS cost FROM root r
          UNION ALL
          SELECT 1, day, seg_n, n_left, cost FROM lbest
          UNION ALL
          SELECT 2, day, seg_n, n_left, cost FROM rbest)
       SELECT CAST(level AS INTEGER) AS level, split_day,
              CAST(seg_n AS BIGINT) AS seg_n,
              CAST(n_left AS BIGINT) AS n_left,
              CAST(cost AS BIGINT) AS cost_ppm
       FROM lvls ORDER BY level"""


@register(
    "q316_binary_segmentation",
    _q316_oracle(),
    "two-level binary segmentation (hierarchical changepoints — the "
    "recursive extension of q298's single split, and the standard "
    "greedy multi-changepoint method: fix the best global split, "
    "then independently re-split each side): level 0 is q298's "
    "argmin over the full daily series; levels 1/2 re-run the "
    "two-segment SSE argmin INSIDE each child segment, with every "
    "segment sum derived from the SAME global prefix frame by "
    "subtraction (sl_i - sl_root — no per-segment re-aggregation, "
    "the algebra that makes recursive segmentation O(depth) passes "
    "over the ~|days| aggregate instead of re-scanning facts).  All "
    "arithmetic exact scaled-integer in DECIMAL(38,0)/HUGEINT with "
    "the (v - v %% d)/d floor identity (q271/q298 class); argmin "
    "tiebreak = earliest day at every level.  Plan: ONE "
    "map-combinable daily aggregate is the only fact-sized stage; "
    "the three candidate sweeps and TakeOrderedAndProject(1) picks "
    "run on the aggregate frame with 1-row split frames attached "
    "by broadcast cross",
)
def q316(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    daily = o.groupBy(day_str("o_orderdate").alias("day")).agg(
        F.count("*").alias("y")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.sum(F.col("y").cast("decimal(38,0)")).over(w).alias("sl"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).over(w).alias("s2l"),
    ).localCheckpoint()  # ~|days| rows; read by all three sweeps
    tot = daily.agg(
        F.count("*").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("s"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("s2"),
    )
    root = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("i") < F.col("n"))
        .select(
            "day",
            "i",
            "sl",
            "s2l",
            "n",
            "s",
            "s2",
            F.expr(
                "(s2l * CAST(1000000 AS DECIMAL(38,0)) - "
                + _exdiv("sl * sl * 1000000", "CAST(i AS DECIMAL(38,0))")
                + ") + ((s2 - s2l) * CAST(1000000 AS DECIMAL(38,0)) - "
                + _exdiv(
                    "(s - sl) * (s - sl) * CAST(1000000 AS DECIMAL(38,0))",
                    "CAST(n - i AS DECIMAL(38,0))",
                )
                + ")"
            ).alias("cost"),
        )
        .orderBy("cost", "day")
        .limit(1)
        .select(
            F.col("day").alias("rday"),
            F.col("i").alias("ri"),
            F.col("sl").alias("rsl"),
            F.col("s2l").alias("rs2l"),
            "n",
            "s",
            "s2",
            F.col("cost").alias("rcost"),
        )
        .localCheckpoint()  # 1 row; read by the root row + both children
    )
    lbest = (
        pre.crossJoin(F.broadcast(root))
        .filter(F.col("i") < F.col("ri"))
        .select(
            "day",
            F.col("i").alias("n_left"),
            F.col("ri").alias("seg_n"),
            F.expr(
                "(s2l * CAST(1000000 AS DECIMAL(38,0)) - "
                + _exdiv("sl * sl * 1000000", "CAST(i AS DECIMAL(38,0))")
                + ") + ((rs2l - s2l) * CAST(1000000 AS DECIMAL(38,0)) - "
                + _exdiv(
                    "(rsl - sl) * (rsl - sl)"
                    " * CAST(1000000 AS DECIMAL(38,0))",
                    "CAST(ri - i AS DECIMAL(38,0))",
                )
                + ")"
            ).alias("cost"),
        )
        .orderBy("cost", "day")
        .limit(1)
    )
    rbest = (
        pre.crossJoin(F.broadcast(root))
        .filter((F.col("i") > F.col("ri")) & (F.col("i") < F.col("n")))
        .select(
            "day",
            (F.col("i") - F.col("ri")).alias("n_left"),
            (F.col("n") - F.col("ri")).alias("seg_n"),
            F.expr(
                "((s2l - rs2l) * CAST(1000000 AS DECIMAL(38,0)) - "
                + _exdiv(
                    "(sl - rsl) * (sl - rsl)"
                    " * CAST(1000000 AS DECIMAL(38,0))",
                    "CAST(i - ri AS DECIMAL(38,0))",
                )
                + ") + ((s2 - s2l) * CAST(1000000 AS DECIMAL(38,0)) - "
                + _exdiv(
                    "(s - sl) * (s - sl) * CAST(1000000 AS DECIMAL(38,0))",
                    "CAST(n - i AS DECIMAL(38,0))",
                )
                + ")"
            ).alias("cost"),
        )
        .orderBy("cost", "day")
        .limit(1)
    )
    rootrow = root.select(
        F.lit(0).alias("level"),
        F.col("rday").alias("split_day"),
        F.col("n").cast("long").alias("seg_n"),
        F.col("ri").cast("long").alias("n_left"),
        F.col("rcost").cast("long").alias("cost_ppm"),
    )
    child = lambda df, lvl: df.select(  # noqa: E731
        F.lit(lvl).alias("level"),
        F.col("day").alias("split_day"),
        F.col("seg_n").cast("long").alias("seg_n"),
        F.col("n_left").cast("long").alias("n_left"),
        F.col("cost").cast("long").alias("cost_ppm"),
    )
    return (
        rootrow.unionByName(child(lbest, 1))
        .unionByName(child(rbest, 2))
        .orderBy("level")
    )


#: (pair tag, sql expr for x, sql expr for y) — shared by both engines
#: via the dialect-neutral expressions below.
_MI_PAIRS = [
    ("priority_x_band", "pri", "band"),
    ("priority_x_year", "pri", "yr"),
    ("band_x_year", "band", "yr"),
]


def _q317_oracle() -> str:
    blocks = []
    for tag, xa, xb in _MI_PAIRS:
        blocks.append(
            f"""SELECT '{tag}' AS pair, n_cells, mi_po2_ppm, max_lift_po2
            FROM (
              WITH cells AS (
                 SELECT {xa} AS x, {xb} AS y, count(*) AS c
                 FROM sel GROUP BY 1, 2),
              mx AS (SELECT x, sum(c) AS cx FROM cells GROUP BY x),
              my AS (SELECT y, sum(c) AS cy FROM cells GROUP BY y),
              nt AS (SELECT sum(c) AS n FROM cells),
              lifted AS (
                 SELECT c,
                        length(bin(greatest(
                          (CAST(c AS HUGEINT) * n * 1000000)
                            // (CAST(cx AS HUGEINT) * cy), 1))) - 1 - 19
                          AS lift
                 FROM cells JOIN mx USING (x) JOIN my USING (y)
                 CROSS JOIN nt)
              SELECT count(*) AS n_cells,
                     (sum(c * lift) * 1000000) // (SELECT n FROM nt)
                       AS mi_po2_ppm,
                     max(lift) AS max_lift_po2
              FROM lifted)"""
        )
    union = "\n          UNION ALL ".join(blocks)
    return f"""WITH sel AS (
          SELECT o_orderpriority AS pri,
                 CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) / 20000)
                      AS INTEGER) AS band,
                 CAST(year(o_orderdate) AS INTEGER) AS yr
          FROM orders)
       SELECT pair, CAST(n_cells AS BIGINT) AS n_cells,
              CAST(mi_po2_ppm AS BIGINT) AS mi_po2_ppm,
              CAST(max_lift_po2 AS BIGINT) AS max_lift_po2
       FROM ({union}) ORDER BY pair"""


@register(
    "q317_mutual_information_screen",
    _q317_oracle(),
    "pairwise mutual-information screen over discretized features "
    "(the feature-selection / target-leakage triage every training "
    "pipeline runs before fitting: 'which columns carry shared "
    "signal, and is any suspiciously predictive?' — the po2 sibling "
    "of q278's PSI, which only compares ONE feature across time): "
    "for each feature pair the contingency cells, the per-cell "
    "pointwise lift c_xy*N/(c_x*c_y) in exact scaled integers "
    "(HUGEINT/DECIMAL(38,0) — the product is ~1e30 at 100 TB), its "
    "log po2-quantized via the q174 len(bin)-1 idiom (fp ln is not "
    "bit-portable; po2 preserves sign and order), and MI as the "
    "cell-count-weighted lift sum in ppm.  Independence reads ~0, "
    "strong dependence positive, and max_lift_po2 flags the single "
    "most-informative cell (the leakage smoking gun).  Plan: one "
    "column-pruned fact scan per pair feeds a map-side-combinable "
    "cell aggregate bounded by the feature domains; margins, "
    "totals, and the report are constant frames",
)
def q317(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    sel = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.floor(F.col("o_totalprice").cast("decimal(18,2)") / 20000)
        .cast("int")
        .alias("band"),
        F.year("o_orderdate").cast("int").alias("yr"),
    )
    out = None
    for tag, xa, xb in _MI_PAIRS:
        cells = (
            sel.groupBy(F.col(xa).alias("x"), F.col(xb).alias("y"))
            .agg(F.count("*").alias("c"))
            .localCheckpoint()  # bounded by feature domains; 4 readers
        )
        mx = cells.groupBy("x").agg(F.sum("c").alias("cx"))
        my = cells.groupBy("y").agg(F.sum("c").alias("cy"))
        nt = cells.agg(F.sum("c").alias("n"))
        lifted = (
            cells.join(mx, "x")
            .join(my, "y")
            .crossJoin(F.broadcast(nt))
            .select(
                "c",
                "n",
                (
                    F.length(
                        F.bin(
                            F.greatest(
                                F.expr(
                                    _exdiv(
                                        "CAST(c AS DECIMAL(38,0)) * n"
                                        " * 1000000",
                                        "CAST(cx AS DECIMAL(38,0)) * cy",
                                    )
                                ).cast("long"),
                                F.lit(1),
                            )
                        )
                    )
                    - 1
                    - 19
                ).alias("lift"),
            )
        )
        row = lifted.agg(
            F.count("*").alias("n_cells"),
            F.expr(
                "CAST(sum(c * lift) AS DECIMAL(38,0)) * 1000000 div max(n)"  # div-ok: MI ppm, |quotient| <= 45e6 (|lift| <= 45)
            ).alias("mi_po2_ppm"),
            F.max("lift").alias("max_lift_po2"),
        ).select(
            F.lit(tag).alias("pair"),
            F.col("n_cells").cast("long").alias("n_cells"),
            F.col("mi_po2_ppm").cast("long").alias("mi_po2_ppm"),
            F.col("max_lift_po2").cast("long").alias("max_lift_po2"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("pair")


_KL_PANEL = ["src0", "src1", "src2", "src3", "src4"]


def _q318_oracle() -> str:
    panel = ", ".join(f"'{s}'" for s in _KL_PANEL)
    return f"""WITH post AS (
          SELECT source AS src, unnest(string_split(text, ' ')) AS token
          FROM documents WHERE source IN ({panel})),
       cnt AS (SELECT src, token, count(*) AS c FROM post
               GROUP BY src, token),
       tot AS (SELECT src, sum(c) AS nt FROM cnt GROUP BY src),
       voc AS (SELECT count(DISTINCT token) AS v FROM cnt),
       pairs AS (
          SELECT a.src AS sa, a.token AS token, a.c AS ca,
                 s.src AS sb, coalesce(b.c, 0) AS cb
          FROM cnt a
          JOIN (SELECT DISTINCT src FROM cnt) s ON s.src <> a.src
          LEFT JOIN cnt b ON b.src = s.src AND b.token = a.token),
       terms AS (
          SELECT sa, sb, ca,
                 length(bin(greatest(
                   (CAST(ca AS HUGEINT) * (tb.nt + v) * 1000000)
                     // (CAST(ta.nt AS HUGEINT) * (cb + 1)), 1))) - 1 - 19
                   AS lift
          FROM pairs
          JOIN tot ta ON ta.src = pairs.sa
          JOIN tot tb ON tb.src = pairs.sb
          CROSS JOIN voc),
       rep AS (
          SELECT sa, sb, count(*) AS n_types,
                 (sum(ca * lift) * 1000000) // sum(ca) AS kl_po2_ppm
          FROM terms GROUP BY sa, sb)
       SELECT sa, sb, CAST(n_types AS BIGINT) AS n_types,
              CAST(kl_po2_ppm AS BIGINT) AS kl_po2_ppm
       FROM rep ORDER BY sa, sb"""


@register(
    "q318_text_kl_drift",
    _q318_oracle(),
    "pairwise unigram KL divergence across a fixed source panel "
    "(the TEXT drift monitor — q278's PSI watches numeric bands, "
    "this watches the token distribution itself: 'does src2 write "
    "a different language than src0?', the routing/mixture "
    "diagnostic behind q285's resampler and q197's temperature "
    "mixture): per-source unigram counts, and for every ordered "
    "panel pair KL(a||b) = sum_t p_a(t) * log(p_a(t)/p_b(t)) with "
    "add-one smoothing on the reference side (unseen-in-b tokens "
    "via a LEFT join — they are exactly the high-contribution "
    "terms), the log po2-quantized (q174 idiom, sign-preserving), "
    "weights exact.  The PANEL is the scale contract: sources are "
    "unbounded at 100 TB, so the monitor compares a fixed review "
    "set (here 5 -> 20 ordered pairs) instead of all O(S^2) pairs; "
    "the token-keyed joins are vocabulary-sized, never "
    "corpus-sized.  Plan: one explode+aggregate per panel scan "
    "(pushed-down source filter), the pair fanout is a "
    "constant x4 per token, and the report is 20 rows",
)
def q318(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").filter(
        F.col("source").isin(*_KL_PANEL)
    )
    cnt = (
        d.select(
            F.col("source").alias("src"),
            F.explode(T.tokens("text")).alias("token"),
        )
        .groupBy("src", "token")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()  # vocab-sized; read by tot/voc/pairs
    )
    tot = cnt.groupBy("src").agg(F.sum("c").alias("nt"))
    voc = cnt.agg(F.countDistinct("token").alias("v"))
    srcs = cnt.select("src").distinct()
    pairs = (
        cnt.select(
            F.col("src").alias("sa"), "token", F.col("c").alias("ca")
        )
        .join(srcs.select(F.col("src").alias("sb")), F.expr("sb <> sa"))
        .join(
            cnt.select(
                F.col("src").alias("sb"),
                F.col("token").alias("token"),
                F.col("c").alias("cb0"),
            ),
            ["sb", "token"],
            "left",
        )
        .select(
            "sa",
            "sb",
            "ca",
            F.coalesce(F.col("cb0"), F.lit(0)).alias("cb"),
        )
    )
    terms = (
        pairs.join(
            tot.select(F.col("src").alias("sa"), F.col("nt").alias("na")),
            "sa",
        )
        .join(
            tot.select(F.col("src").alias("sb"), F.col("nt").alias("nb")),
            "sb",
        )
        .crossJoin(F.broadcast(voc))
        .select(
            "sa",
            "sb",
            "ca",
            (
                F.length(
                    F.bin(
                        F.greatest(
                            F.expr(
                                _exdiv(
                                    "CAST(ca AS DECIMAL(38,0))"
                                    " * (nb + v) * 1000000",
                                    "CAST(na AS DECIMAL(38,0)) * (cb + 1)",
                                )
                            ).cast("long"),
                            F.lit(1),
                        )
                    )
                )
                - 1
                - 19
            ).alias("lift"),
        )
    )
    return (
        terms.groupBy("sa", "sb")
        .agg(
            F.count("*").alias("n_types"),
            F.expr(
                "CAST(sum(ca * lift) AS DECIMAL(38,0)) * 1000000"
                " div sum(ca)"  # div-ok: KL po2 ppm, |quotient| <= 45e6
            ).alias("kl_po2_ppm"),
        )
        .select(
            "sa",
            "sb",
            F.col("n_types").cast("long").alias("n_types"),
            F.col("kl_po2_ppm").cast("long").alias("kl_po2_ppm"),
        )
        .orderBy("sa", "sb")
    )


_MR_ANCHORS = 20
_MR_K = 10
_MR_TRUNC = 16


def _q319_oracle() -> str:
    from ..functions.vector import int8_quantize_sql, int_dot_sql

    return f"""WITH qv AS (
          SELECT vec_id, {int8_quantize_sql('embedding')} AS q
          FROM embeddings),
       anch AS (SELECT vec_id AS aid, q AS qa, q[1:{_MR_TRUNC}] AS qa16
                FROM qv WHERE vec_id < {_MR_ANCHORS}),
       scored AS (
          SELECT a.aid, v.vec_id,
                 {int_dot_sql('v.q', 'a.qa')} AS df,
                 {int_dot_sql(f'v.q[1:{_MR_TRUNC}]', 'a.qa16')} AS dt
          FROM qv v CROSS JOIN anch a WHERE v.vec_id <> a.aid),
       topf AS (
          SELECT aid, vec_id FROM (
             SELECT aid, vec_id,
                    row_number() OVER (PARTITION BY aid
                                       ORDER BY df DESC, vec_id) AS r
             FROM scored) WHERE r <= {_MR_K}),
       topt AS (
          SELECT aid, vec_id FROM (
             SELECT aid, vec_id,
                    row_number() OVER (PARTITION BY aid
                                       ORDER BY dt DESC, vec_id) AS r
             FROM scored) WHERE r <= {_MR_K}),
       ov AS (
          SELECT f.aid, count(*) AS overlap
          FROM topf f JOIN topt t
            ON t.aid = f.aid AND t.vec_id = f.vec_id
          GROUP BY f.aid),
       per AS (
          SELECT a.aid, coalesce(ov.overlap, 0) AS overlap
          FROM anch a LEFT JOIN ov ON ov.aid = a.aid),
       gl AS (
          SELECT (sum(overlap) * 1000000) // (count(*) * {_MR_K})
                   AS mean_overlap_ppm
          FROM per)
       SELECT CAST(aid AS BIGINT) AS aid,
              CAST(overlap AS BIGINT) AS overlap_at_{_MR_K},
              CAST(mean_overlap_ppm AS BIGINT) AS mean_overlap_ppm
       FROM per CROSS JOIN gl ORDER BY aid"""


@register(
    "q319_matryoshka_truncation_eval",
    _q319_oracle(),
    "Matryoshka embedding-truncation evaluation (the MRL question "
    "every vector-store operator asks: 'can I serve the first "
    f"{_MR_TRUNC} of 64 dims and keep retrieval quality?' — a 4x "
    "index-size and bandwidth cut if yes): for a fixed "
    f"{_MR_ANCHORS}-anchor panel, exact top-{_MR_K} neighbor sets "
    "by full-dimension int8 dot product vs by the truncated "
    "prefix, and the per-anchor overlap between the two sets "
    "(Recall@k of the truncated index against the full index as "
    "ground truth — the q209 recall-eval protocol applied to "
    "dimensionality instead of LSH).  Both rankings come from ONE "
    "scored frame (scoring is row-local over a broadcast anchor "
    "panel; the truncated dot reuses the same quantized vectors "
    "via an array slice), both use the two-phase per-group top-k, "
    "and the overlap join keys on (anchor, vec).  Mean overlap in "
    "exact floor-ppm rides every row.  Plan: anchor panel is a "
    f"{_MR_ANCHORS}-row broadcast, the x{_MR_ANCHORS} fanout is "
    "the bounded eval cost (NOT all-pairs), and nothing downstream "
    "of the top-k filters exceeds anchors x k rows",
)
def q319(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vector import int8_quantize, int_dot

    e = load_table(spark, sf, "embeddings")
    qv = e.select("vec_id", int8_quantize("embedding").alias("q"))
    anch = qv.filter(F.col("vec_id") < _MR_ANCHORS).select(
        F.col("vec_id").alias("aid"),
        F.col("q").alias("qa"),
        F.slice("q", 1, _MR_TRUNC).alias("qa16"),
    )
    scored = (
        qv.crossJoin(F.broadcast(anch))
        .filter(F.col("vec_id") != F.col("aid"))
        .select(
            "aid",
            "vec_id",
            int_dot("q", "qa").alias("df"),
            int_dot(F.slice("q", 1, _MR_TRUNC), F.col("qa16")).alias("dt"),
        )
        .localCheckpoint()  # scored once, read by both top-k arms
    )
    topf = K.top_k_per_group_scalable(
        scored, ["aid"], [F.desc("df"), F.asc("vec_id")], _MR_K
    ).select("aid", "vec_id")
    topt = K.top_k_per_group_scalable(
        scored, ["aid"], [F.desc("dt"), F.asc("vec_id")], _MR_K
    ).select("aid", "vec_id")
    ov = topf.join(topt, ["aid", "vec_id"]).groupBy("aid").agg(
        F.count("*").alias("overlap")
    )
    per = (
        anch.select("aid")
        .join(ov, "aid", "left")
        .select(
            "aid", F.coalesce(F.col("overlap"), F.lit(0)).alias("overlap")
        )
        .localCheckpoint()  # 20 rows; read by the report and the mean
    )
    gl = per.agg(
        F.expr(
            "CAST(sum(overlap) AS DECIMAL(38,0)) * 1000000"
            f" div (count(*) * {_MR_K})"  # div-ok: mean overlap share, quotient <= 1e6
        ).alias("mean_overlap_ppm")
    )
    return (
        per.crossJoin(F.broadcast(gl))
        .select(
            F.col("aid").cast("long").alias("aid"),
            F.col("overlap").cast("long").alias(f"overlap_at_{_MR_K}"),
            F.col("mean_overlap_ppm").cast("long").alias(
                "mean_overlap_ppm"
            ),
        )
        .orderBy("aid")
    )


_SG_WINDOW = 2
_SG_MIN_COUNT = 5
_SG_TOPK = 20


def _q320_oracle() -> str:
    return f"""WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       pos AS (
          SELECT doc_id, CAST(p AS INTEGER) AS p, t[CAST(p AS INTEGER)] AS w
          FROM toks, unnest(range(1, len(t) + 1)) AS u(p)),
       uni AS (SELECT w, count(*) AS c FROM pos GROUP BY w),
       nt AS (SELECT count(*) AS n FROM pos),
       sg AS (
          SELECT a.w AS wa, b.w AS wb, count(*) AS c
          FROM pos a JOIN pos b
            ON b.doc_id = a.doc_id
           AND b.p > a.p AND b.p <= a.p + {_SG_WINDOW}
          GROUP BY 1, 2),
       scored AS (
          SELECT wa, wb, sg.c AS c,
                 CAST(length(bin(greatest(
                   (CAST(sg.c AS HUGEINT) * n * 1000000)
                     // (CAST(ua.c AS HUGEINT) * ub.c), 1))) - 1 - 19
                   AS BIGINT) AS pmi_po2
          FROM sg JOIN uni ua ON ua.w = sg.wa
                  JOIN uni ub ON ub.w = sg.wb
          CROSS JOIN nt
          WHERE sg.c >= {_SG_MIN_COUNT})
       SELECT wa, wb, CAST(c AS BIGINT) AS c, pmi_po2
       FROM scored
       ORDER BY pmi_po2 DESC, c DESC, wa, wb LIMIT {_SG_TOPK}"""


@register(
    "q320_skipgram_pmi",
    _q320_oracle(),
    f"skip-gram PMI collocations (window +{_SG_WINDOW}, the "
    "word2vec-style training-pair statistic and the collocation "
    "extraction q116's ADJACENT bigram lift cannot see — 'merge "
    "join' and 'merge ... join' one word apart are the same "
    "collocation): directed skip-grams from each position to the "
    f"next {_SG_WINDOW} positions (a constant x{_SG_WINDOW} fanout "
    "expressed as a banded self-join on (doc, position) — "
    "high-cardinality keys, no skew), unigram margins, pointwise "
    "mutual information as the exact integer lift c*N/(c_a*c_b) "
    "with the log po2-quantized (the q317 idiom — fp log2 is not "
    "bit-portable), a min-count floor of "
    f"{_SG_MIN_COUNT} (the standard noise gate: PMI of hapax pairs "
    "is pure variance), and the top-"
    f"{_SG_TOPK} by (pmi, support) under a total-order tiebreak.  "
    "Plan: the position explode is corpus-bounded, the skip-gram "
    "join is banded on position within (doc), margins are "
    "map-combinable, and TakeOrderedAndProject caps the result; "
    "the 1e30-scale lift numerator routes through "
    "HUGEINT/DECIMAL(38,0) from birth",
)
def q320(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    pos = d.select(
        "doc_id", F.posexplode(T.tokens("text")).alias("p0", "w")
    ).select(
        "doc_id", (F.col("p0") + 1).alias("p"), "w"
    ).localCheckpoint()  # read by margins and both sides of the band join
    uni = pos.groupBy("w").agg(F.count("*").alias("c"))
    nt = pos.agg(F.count("*").alias("n"))
    sg = (
        pos.alias("a")
        .join(
            pos.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.p") > F.col("a.p"))
            & (F.col("b.p") <= F.col("a.p") + _SG_WINDOW),
        )
        .groupBy(F.col("a.w").alias("wa"), F.col("b.w").alias("wb"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= _SG_MIN_COUNT)
    )
    scored = (
        sg.join(uni.select(F.col("w").alias("wa"), F.col("c").alias("ca")), "wa")
        .join(uni.select(F.col("w").alias("wb"), F.col("c").alias("cb")), "wb")
        .crossJoin(F.broadcast(nt))
        .select(
            "wa",
            "wb",
            "c",
            (
                F.length(
                    F.bin(
                        F.greatest(
                            F.expr(
                                _exdiv(
                                    "CAST(c AS DECIMAL(38,0)) * n * 1000000",
                                    "CAST(ca AS DECIMAL(38,0)) * cb",
                                )
                            ).cast("long"),
                            F.lit(1),
                        )
                    )
                )
                - 1
                - 19
            )
            .cast("long")
            .alias("pmi_po2"),
        )
    )
    return (
        scored.orderBy(
            F.desc("pmi_po2"), F.desc("c"), F.asc("wa"), F.asc("wb")
        )
        .limit(_SG_TOPK)
        .select("wa", "wb", F.col("c").cast("long").alias("c"), "pmi_po2")
        .orderBy(F.desc("pmi_po2"), F.desc("c"), F.asc("wa"), F.asc("wb"))
    )


def _q321_oracle() -> str:
    return f"""WITH monthly AS (
          SELECT c_nationkey AS nk, strftime(o_orderdate, '%Y-%m') AS mon,
                 count(*) AS y
          FROM orders JOIN customer ON c_custkey = o_custkey
          GROUP BY 1, 2),
       idx AS (
          SELECT nk, mon, y,
                 row_number() OVER (PARTITION BY nk ORDER BY mon) AS i
          FROM monthly),
       slopes AS (
          SELECT a.nk AS nk,
                 (CAST((b.y - a.y) AS HUGEINT) * 1000000
                  - (CAST((b.y - a.y) AS HUGEINT) * 1000000)
                    % (b.i - a.i)) // (b.i - a.i) AS s_ppm
          FROM idx a JOIN idx b ON b.nk = a.nk AND b.i > a.i),
       cnt AS (SELECT nk, count(*) AS np FROM slopes GROUP BY nk),
       ranked AS (
          SELECT nk, s_ppm,
                 row_number() OVER (PARTITION BY nk
                                    ORDER BY s_ppm, nk) AS r
          FROM slopes)
       SELECT CAST(ranked.nk AS INTEGER) AS nk,
              CAST(np AS BIGINT) AS n_pairs,
              CAST(s_ppm AS BIGINT) AS slope_ppm
       FROM ranked JOIN cnt ON cnt.nk = ranked.nk
       WHERE r = (np + 1) // 2
       ORDER BY ranked.nk"""


@register(
    "q321_grouped_theil_sen",
    _q321_oracle(),
    "grouped Theil-Sen robust trend (per-nation median of pairwise "
    "monthly slopes — the robust sibling of q273's grouped OLS and "
    "the per-group extension of q191's single Theil-Sen: one "
    "outlier month cannot move a median slope, which is why "
    "monitoring prefers it for per-segment growth): orders roll up "
    "to (nation, month) counts first — the pairwise-slope "
    "enumeration is O(months^2) PER GROUP on the aggregate frame "
    "(~80 months -> ~3k pairs), NEVER on facts; slopes are exact "
    "floor-ppm integers over the month index (dy*1e6 // di with "
    "di > 0 — positive divisor, engines floor identically), and "
    "the per-group lower median comes from a rank window over the "
    "bounded slope frame (partitioned by nation behind the "
    "monthly-aggregate barrier).  Plan: one fact join+aggregate is "
    "the only data-sized stage; everything after is "
    "O(groups x months^2) constant-bounded",
)
def q321(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.date_format("o_orderdate", "yyyy-MM").alias("mon"),
        )
        .agg(F.count("*").alias("y"))
    )
    idx = monthly.select(
        "nk",
        "y",
        F.row_number()
        .over(Window.partitionBy("nk").orderBy("mon"))
        .alias("i"),
    ).localCheckpoint()  # ~groups x months rows; both sides of pair join
    slopes = (
        idx.alias("a")
        .join(
            idx.alias("b"),
            (F.col("b.nk") == F.col("a.nk")) & (F.col("b.i") > F.col("a.i")),
        )
        .select(
            F.col("a.nk").alias("nk"),
            # signed dividend: the (v - v % d)/d identity gives
            # TRUNCATION toward zero in BOTH engines (both %s follow
            # the dividend sign; the division is then an exact
            # multiple), sidestepping Spark-div-truncates vs
            # DuckDB-//-floors divergence on negative slopes
            F.expr(
                _exdiv(
                    "CAST(b.y - a.y AS DECIMAL(38,0)) * 1000000",
                    "CAST(b.i - a.i AS DECIMAL(38,0))",
                )
            )
            .cast("long")
            .alias("s_ppm"),
        )
    )
    cnt = slopes.groupBy("nk").agg(F.count("*").alias("np"))
    ranked = slopes.select(
        "nk",
        "s_ppm",
        F.row_number()
        .over(Window.partitionBy("nk").orderBy("s_ppm", "nk"))
        .alias("r"),
    )
    return (
        ranked.join(cnt, "nk")
        .filter(F.col("r") == F.expr("(np + 1) div 2"))  # div-ok: median index, quotient <= pair count
        .select(
            F.col("nk").cast("int").alias("nk"),
            F.col("np").cast("long").alias("n_pairs"),
            F.col("s_ppm").cast("long").alias("slope_ppm"),
        )
        .orderBy("nk")
    )


_ANOVA_FACTORS = ["priority", "band", "year"]


def _q322_oracle() -> str:
    blocks = []
    for fac in _ANOVA_FACTORS:
        blocks.append(
            f"""SELECT '{fac}' AS factor, n_groups, ss_between_ppm
            FROM (
              WITH grp AS (
                 SELECT {fac} AS g, count(*) AS n,
                        sum(CAST(cents AS HUGEINT)) AS s
                 FROM sel GROUP BY 1),
              tot AS (
                 SELECT count(*) AS nn, sum(CAST(cents AS HUGEINT)) AS ss,
                        sum(CAST(cents AS HUGEINT) * cents) AS sq
                 FROM sel),
              parts AS (
                 SELECT (SELECT count(*) FROM grp) AS n_groups,
                        (SELECT sum((s * s) // n) FROM grp) AS ssb_raw,
                        nn, ss, sq
                 FROM tot)
              SELECT n_groups,
                     CASE WHEN sq * nn - ss * ss = 0 THEN 0
                          ELSE (greatest(ssb_raw * nn - ss * ss, 0)
                                * 1000000)
                               // (sq * nn - ss * ss) END AS ss_between_ppm
              FROM parts)"""
        )
    union = "\n          UNION ALL ".join(blocks)
    return f"""WITH sel AS (
          SELECT o_orderpriority AS priority,
                 CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) / 20000)
                      AS INTEGER) AS band,
                 CAST(year(o_orderdate) AS INTEGER) AS year,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders)
       SELECT factor, CAST(n_groups AS BIGINT) AS n_groups,
              CAST(ss_between_ppm AS BIGINT) AS eta2_ppm
       FROM ({union}) ORDER BY factor"""


@register(
    "q322_anova_effect_size",
    _q322_oracle(),
    "one-way ANOVA effect sizes (eta-squared = SS_between/SS_total) "
    "for a continuous metric against each categorical factor — the "
    "'which dimension explains the variance?' triage that pairs "
    "with q317's categorical-categorical MI screen (together they "
    "cover the feature-importance quadrant without fitting "
    "anything): order value in exact cents against priority / "
    "price band / year.  The whole statistic reduces to THREE "
    "map-side-combinable sums (n, sum, sum-of-squares — the q48 "
    "moment kernel) plus per-group (sum^2 // n): eta2_ppm = "
    "(n*SSB - S^2)*1e6 // (n*SQ - S^2) evaluated in "
    "HUGEINT/DECIMAL(38,0) (cents^2 sums are ~1e28 at 100 TB — "
    "the q271 overflow class, routed from birth); numerator and "
    "denominator are both nonnegative by Cauchy-Schwarz so the "
    "floors agree across engines.  Plan: one column-pruned fact "
    "scan per factor feeding a domain-bounded group aggregate; "
    "the report is 3 rows",
)
def q322(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    sel = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice").cast("decimal(18,2)") / 20000)
        .cast("int")
        .alias("band"),
        F.year("o_orderdate").cast("int").alias("year"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    # ONE grouping-sets pass (the q55 idiom): the per-factor loop built
    # six separate aggregates over the same scan — the r7 re-execution
    # audit showed orders scanned 4x (the factor-independent moment
    # totals re-ran once per branch with no exchange reuse).  GROUPING
    # SETS ((priority),(band),(year),()) computes every per-factor
    # group row AND the grand totals in a single expand+aggregate; the
    # eta2 combine then runs entirely on the (domain-bounded) group
    # table.  sq is only read off the () row but is map-side-combined
    # like the rest, so carrying it on all sets costs one extra sum.
    sel.createOrReplaceTempView("q322_sel")
    per = spark.sql(
        """SELECT priority, band, year,
                  grouping(priority) AS g_p, grouping(band) AS g_b,
                  grouping(year) AS g_y,
                  count(*) AS n,
                  sum(CAST(cents AS DECIMAL(38,0))) AS s,
                  sum(CAST(cents AS DECIMAL(38,0)) * cents) AS sq
           FROM q322_sel
           GROUP BY GROUPING SETS ((priority), (band), (year), ())"""
    )
    tot = per.filter("g_p = 1 AND g_b = 1 AND g_y = 1").select(
        F.col("n").alias("nn"), F.col("s").alias("ss"), F.col("sq")
    )
    factor = (
        F.when(F.col("g_p") == 0, F.lit("priority"))
        .when(F.col("g_b") == 0, F.lit("band"))
        .otherwise(F.lit("year"))
    )
    ssb = (
        per.filter("g_p + g_b + g_y = 2")  # exactly one factor grouped
        .groupBy(factor.alias("factor"))
        .agg(
            F.count("*").alias("n_groups"),
            F.sum(
                F.expr(_exdiv("s * s", "CAST(n AS DECIMAL(38,0))"))
            ).alias("ssb_raw"),
        )
    )
    return (
        ssb.crossJoin(F.broadcast(tot))
        .select(
            "factor",
            F.col("n_groups").cast("long").alias("n_groups"),
            F.when(
                F.expr("sq * nn - ss * ss = 0"), F.lit(0).cast("long")
            )
            .otherwise(
                F.expr(
                    _exdiv(
                        # greatest(.., 0): per-group floor of
                        # s^2/n can push the scaled SSB a hair
                        # under S^2 when eta^2 ~ 0; clamp so both
                        # engines divide a nonnegative value
                        "greatest(ssb_raw * nn - ss * ss,"
                        " CAST(0 AS DECIMAL(38,0)))"
                        " * CAST(1000000 AS DECIMAL(38,0))",
                        "sq * nn - ss * ss",
                    )
                ).cast("long")
            )
            .alias("eta2_ppm"),
        )
        .orderBy("factor")
    )


def _q323_oracle() -> str:
    return f"""WITH bf AS (
          SELECT CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) / 20000)
                      AS INTEGER) AS band, count(*) AS y
          FROM orders GROUP BY 1),
       pre AS (
          SELECT band, i, sl, s2l FROM (
            SELECT band,
                   row_number() OVER (ORDER BY band) AS i,
                   sum(CAST(y AS HUGEINT)) OVER w AS sl,
                   sum(CAST(y AS HUGEINT) * y) OVER w AS s2l
            FROM bf
            WINDOW w AS (ORDER BY band
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW))),
       pre0 AS (
          SELECT band, i, sl, s2l FROM pre
          UNION ALL
          SELECT -1, 0, CAST(0 AS HUGEINT), CAST(0 AS HUGEINT)),
       cst AS (
          SELECT a.i AS i0, b.i AS i1,
                 b.sl - a.sl AS s, b.i - a.i AS m,
                 (b.s2l - a.s2l) * 1000000
                 - ((b.sl - a.sl) * (b.sl - a.sl) * 1000000)
                   // (b.i - a.i) AS cost
          FROM pre0 a JOIN pre0 b ON b.i > a.i),
       nmax AS (SELECT max(i) AS n FROM pre),
       l1 AS (SELECT i1 AS j, cost FROM cst WHERE i0 = 0),
       l2m AS (SELECT c.i1 AS j, min(l1.cost + c.cost) AS mc
               FROM l1 JOIN cst c ON c.i0 = l1.j GROUP BY c.i1),
       l2 AS (SELECT m.j AS j, m.mc AS mc, min(l1.j) AS split
              FROM l2m m
              JOIN l1 ON TRUE
              JOIN cst c ON c.i0 = l1.j AND c.i1 = m.j
              WHERE l1.cost + c.cost = m.mc
              GROUP BY m.j, m.mc),
       l3m AS (SELECT c.i1 AS j, min(l2.mc + c.cost) AS mc
               FROM l2 JOIN cst c ON c.i0 = l2.j GROUP BY c.i1),
       l3 AS (SELECT m.j AS j, m.mc AS mc, min(l2.j) AS split
              FROM l3m m
              JOIN l2 ON TRUE
              JOIN cst c ON c.i0 = l2.j AND c.i1 = m.j
              WHERE l2.mc + c.cost = m.mc
              GROUP BY m.j, m.mc),
       fm AS (SELECT min(l3.mc + c.cost) AS total
              FROM l3 JOIN cst c ON c.i0 = l3.j
                      JOIN nmax ON c.i1 = nmax.n),
       p3 AS (SELECT min(l3.j) AS i3, min(fm.total) AS total
              FROM l3 JOIN cst c ON c.i0 = l3.j
                      JOIN nmax ON c.i1 = nmax.n
              CROSS JOIN fm
              WHERE l3.mc + c.cost = fm.total),
       p2 AS (SELECT l3.split AS i2, p3.i3, p3.total
              FROM l3 JOIN p3 ON l3.j = p3.i3),
       p1 AS (SELECT l2.split AS i1, p2.i2, p2.i3, p2.total
              FROM l2 JOIN p2 ON l2.j = p2.i2),
       bounds AS (
          SELECT 1 AS bucket, 0 AS lo, i1 AS hi, total FROM p1
          UNION ALL SELECT 2, i1, i2, total FROM p1
          UNION ALL SELECT 3, i2, i3, total FROM p1
          UNION ALL SELECT 4, i3, (SELECT n FROM nmax), total FROM p1),
       rep AS (
          SELECT b.bucket, b.total,
                 plo.band AS band_lo, phi.band AS band_hi,
                 c.m AS n_bands, c.s AS n_rows, c.cost AS cost_ppm
          FROM bounds b
          JOIN cst c ON c.i0 = b.lo AND c.i1 = b.hi
          JOIN pre plo ON plo.i = b.lo + 1
          JOIN pre phi ON phi.i = b.hi)
       SELECT CAST(bucket AS INTEGER) AS bucket,
              CAST(band_lo AS INTEGER) AS band_lo,
              CAST(band_hi AS INTEGER) AS band_hi,
              CAST(n_bands AS BIGINT) AS n_bands,
              CAST(n_rows AS BIGINT) AS n_rows,
              CAST(cost_ppm AS BIGINT) AS cost_ppm,
              CAST(total AS BIGINT) AS total_cost_ppm
       FROM rep ORDER BY bucket"""


@register(
    "q323_voptimal_histogram",
    _q323_oracle(),
    "v-optimal histogram construction, B=4 buckets by exact dynamic "
    "programming (Jagadish et al.'s optimal-histogram DP — THE "
    "statistics every cost-based optimizer wishes it had instead of "
    "equi-width q95 / equi-depth q129: bucket boundaries minimizing "
    "total within-bucket SSE of the frequency vector, the "
    "selectivity-estimation error): price bands roll up to a "
    "~30-row frequency vector; segment costs come from ONE prefix "
    "frame by subtraction (the q316 algebra — all O(n^2) segment "
    "costs from O(n) state); the B-layer DP is three bounded "
    "min-joins (layer b holds 'best cost of first j bands in b "
    "buckets' + its argmin split, ties to the smallest split), and "
    "the boundary set is reconstructed by walking the argmins back "
    "— every DP frame is O(bands^2), constant at ANY data scale.  "
    "Arithmetic exact scaled-integer in HUGEINT/DECIMAL(38,0) "
    "(counts^2 x 1e6 — the q271 class); equality joins on exact "
    "integer costs are safe precisely because nothing is floating. "
    " Plan: one map-combinable band aggregate is the only "
    "fact-sized stage; the report is 4 buckets with their true "
    "band ranges, row masses, and SSE shares",
)
def q323(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    bf = o.groupBy(
        F.floor(F.col("o_totalprice").cast("decimal(18,2)") / 20000)
        .cast("int")
        .alias("band")
    ).agg(F.count("*").alias("y"))
    w = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    pre = bf.select(
        "band",
        F.row_number().over(Window.orderBy("band")).alias("i"),
        F.sum(F.col("y").cast("decimal(38,0)")).over(w).alias("sl"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).over(w).alias("s2l"),
    ).localCheckpoint()  # ~30 rows; read by pre0/cst/boundary joins
    pre0 = pre.select("band", "i", "sl", "s2l").unionByName(
        spark.range(1).select(
            F.lit(-1).alias("band"),
            F.lit(0).cast("int").alias("i"),
            F.lit(0).cast("decimal(38,0)").alias("sl"),
            F.lit(0).cast("decimal(38,0)").alias("s2l"),
        )
    )
    cst = (
        pre0.alias("a")
        .join(pre0.alias("b"), F.col("b.i") > F.col("a.i"))
        .select(
            F.col("a.i").alias("i0"),
            F.col("b.i").alias("i1"),
            F.expr("b.sl - a.sl").alias("s"),
            (F.col("b.i") - F.col("a.i")).alias("m"),
            F.expr(
                "(b.s2l - a.s2l) * CAST(1000000 AS DECIMAL(38,0)) - "
                + _exdiv(
                    "(b.sl - a.sl) * (b.sl - a.sl)"
                    " * CAST(1000000 AS DECIMAL(38,0))",
                    "CAST(b.i - a.i AS DECIMAL(38,0))",
                )
            ).alias("cost"),
        )
        .localCheckpoint()  # ~n^2/2 rows (n ~ 30); read by every layer
    )
    nmax = pre.agg(F.max("i").alias("n"))
    l1 = cst.filter(F.col("i0") == 0).select(
        F.col("i1").alias("j"), "cost"
    )
    def layer(prev, mc_col):  # prev: (j, mc[, split])
        cand = prev.select(
            F.col("j").alias("pj"), F.col(mc_col).alias("pmc")
        ).join(cst, F.col("i0") == F.col("pj"))
        mins = cand.groupBy(F.col("i1").alias("j")).agg(
            F.min(F.expr("pmc + cost")).alias("mc")
        )
        return (
            cand.select(
                F.col("i1").alias("j"),
                F.expr("pmc + cost").alias("tc"),
                "pj",
            )
            .join(mins, "j")
            .filter(F.col("tc") == F.col("mc"))
            .groupBy("j", "mc")
            .agg(F.min("pj").alias("split"))
        )
    l2 = layer(l1, "cost").localCheckpoint()
    l3 = layer(l2, "mc").localCheckpoint()
    fin = (
        l3.select(F.col("j").alias("pj"), F.col("mc").alias("pmc"))
        .join(cst, F.col("i0") == F.col("pj"))
        .join(F.broadcast(nmax), F.col("i1") == F.col("n"))
        .select("pj", F.expr("pmc + cost").alias("tc"))
    )
    fmin = fin.agg(F.min("tc").alias("total"))
    p3 = (
        fin.join(F.broadcast(fmin), F.col("tc") == F.col("total"))
        .agg(F.min("pj").alias("i3"), F.min("total").alias("total"))
        .localCheckpoint()  # 1 row
    )
    p2 = l3.join(p3, l3["j"] == p3["i3"]).select(
        F.col("split").alias("i2"), "i3", "total"
    )
    p1 = (
        l2.join(p2, l2["j"] == p2["i2"])
        .select(F.col("split").alias("i1"), "i2", "i3", "total")
        .crossJoin(F.broadcast(nmax))
        .localCheckpoint()  # 1 row: (i1, i2, i3, total, n)
    )
    bounds = (
        p1.select(F.lit(1).alias("bucket"), F.lit(0).alias("lo"), F.col("i1").alias("hi"), "total")
        .unionByName(p1.select(F.lit(2).alias("bucket"), F.col("i1").alias("lo"), F.col("i2").alias("hi"), "total"))
        .unionByName(p1.select(F.lit(3).alias("bucket"), F.col("i2").alias("lo"), F.col("i3").alias("hi"), "total"))
        .unionByName(p1.select(F.lit(4).alias("bucket"), F.col("i3").alias("lo"), F.col("n").alias("hi"), "total"))
    )
    return (
        bounds.join(
            cst, (F.col("i0") == F.col("lo")) & (F.col("i1") == F.col("hi"))
        )
        .join(
            pre.select(F.col("i").alias("ilo"), F.col("band").alias("band_lo")),
            F.col("ilo") == F.col("lo") + 1,
        )
        .join(
            pre.select(F.col("i").alias("ihi"), F.col("band").alias("band_hi")),
            F.col("ihi") == F.col("hi"),
        )
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("band_lo").cast("int").alias("band_lo"),
            F.col("band_hi").cast("int").alias("band_hi"),
            F.col("m").cast("long").alias("n_bands"),
            F.col("s").cast("long").alias("n_rows"),
            F.col("cost").cast("long").alias("cost_ppm"),
            F.col("total").cast("long").alias("total_cost_ppm"),
        )
        .orderBy("bucket")
    )


def _q324_oracle() -> str:
    return """WITH toks AS (
          SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
          FROM documents),
       ranked AS (
          SELECT tok, row_number() OVER (ORDER BY tok) AS rn FROM toks),
       adj AS (
          SELECT b.tok AS tok, a.tok AS prev
          FROM ranked b LEFT JOIN ranked a ON a.rn = b.rn - 1),
       pl AS (
          SELECT tok,
                 CASE WHEN prev IS NULL THEN 0 ELSE
                   coalesce(nullif(list_position(
                     list_transform(range(1, least(strlen(tok),
                                                   strlen(prev)) + 1),
                       i -> substr(tok, CAST(i AS INTEGER), 1)
                            = substr(prev, CAST(i AS INTEGER), 1)),
                     false) - 1, -1),
                     least(strlen(tok), strlen(prev))) END AS p
          FROM adj),
       rep AS (
          SELECT count(*) AS n_types,
                 sum(strlen(tok)) AS raw_bytes,
                 sum(strlen(tok) - p + 1) AS coded_bytes,
                 max(p) AS max_prefix
          FROM pl)
       SELECT CAST(n_types AS BIGINT) AS n_types,
              CAST(raw_bytes AS BIGINT) AS raw_bytes,
              CAST(coded_bytes AS BIGINT) AS coded_bytes,
              CAST((CAST(raw_bytes - coded_bytes AS HUGEINT) * 1000000)
                   // raw_bytes AS BIGINT) AS savings_ppm,
              CAST(max_prefix AS BIGINT) AS max_prefix
       FROM rep"""


@register(
    "q324_front_coding_estimate",
    _q324_oracle(),
    "front-coding (incremental-prefix) dictionary size estimate — "
    "the term-dictionary compression every columnar string "
    "dictionary and search index uses (Lucene's shared-prefix "
    "blocks, Parquet's DELTA_BYTE_ARRAY), and the sizing input "
    "q243's encoding advisor lacks for strings: the distinct "
    "vocabulary in lexicographic order, each term stored as "
    "(shared-prefix length with its PREDECESSOR, suffix) — coded "
    "bytes = len - prefix + 1 per term.  The predecessor comes "
    "from the two-phase global rank + a rank-shift equi self-join "
    "(rn = rn-1) — NEVER a single-partition lag window over the "
    "vocabulary (the q271 window class; the vocabulary is "
    "corpus-sized at 100 TB); the common-prefix length is a "
    "zip-compare over char arrays + first-mismatch position, "
    "row-local and engine-identical.  Report: type count, raw vs "
    "front-coded bytes, savings in exact floor-ppm, max shared "
    "prefix.  Plan: one distinct aggregate, one range exchange "
    "for the rank, one co-partitioned shift join, one "
    "map-combinable rollup",
)
def q324(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    toks = (
        d.select(F.explode(T.tokens("text")).alias("tok"))
        .distinct()
    )
    ranked = K.global_row_number(toks, [F.asc("tok")]).localCheckpoint()
    adj = ranked.alias("b").join(
        ranked.select(
            (F.col("rn") + 1).alias("rn"), F.col("tok").alias("prev")
        ).alias("a"),
        "rn",
        "left",
    )
    ca = F.split(F.col("tok"), "")
    cb = F.split(F.col("prev"), "")
    minlen = F.least(F.length("tok"), F.length("prev"))
    eqs = F.zip_with(
        F.slice(ca, 1, minlen), F.slice(cb, 1, minlen), lambda x, y: x == y
    )
    pl = adj.select(
        "tok",
        F.when(F.col("prev").isNull(), F.lit(0))
        .otherwise(
            F.coalesce(
                F.nullif(F.array_position(eqs, F.lit(False)) - 1, F.lit(-1)),
                minlen,
            )
        )
        .alias("p"),
    )
    return pl.agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.length("tok")).cast("long").alias("raw_bytes"),
        F.sum(F.length("tok") - F.col("p") + 1)
        .cast("long")
        .alias("coded_bytes"),
        F.max("p").cast("long").alias("max_prefix"),
    ).select(
        "n_types",
        "raw_bytes",
        "coded_bytes",
        F.expr(
            "CAST(raw_bytes - coded_bytes AS DECIMAL(38,0)) * 1000000"
            " div raw_bytes"  # div-ok: savings share, quotient <= 1e6
        )
        .cast("long")
        .alias("savings_ppm"),
        "max_prefix",
    )


def _q325_oracle() -> str:
    return """WITH post AS (
          SELECT DISTINCT unnest(string_split(text, ' ')) AS tok, doc_id
          FROM documents),
       ranked AS (
          SELECT tok, doc_id,
                 row_number() OVER (PARTITION BY tok
                                    ORDER BY doc_id) AS rn
          FROM post),
       gaps AS (
          SELECT b.tok AS tok,
                 CASE WHEN a.doc_id IS NULL THEN b.doc_id + 1
                      ELSE b.doc_id - a.doc_id END AS gap
          FROM ranked b LEFT JOIN ranked a
            ON a.tok = b.tok AND a.rn = b.rn - 1),
       sized AS (
          SELECT tok, gap,
                 (length(bin(greatest(gap, 1))) - 1 + 7) // 7 AS vbytes
          FROM gaps),
       per AS (
          SELECT tok, count(*) AS df, sum(vbytes) AS post_bytes,
                 max(gap) AS max_gap
          FROM sized GROUP BY tok),
       rep AS (
          SELECT count(*) AS n_terms, sum(df) AS n_postings,
                 sum(post_bytes) AS varint_bytes,
                 sum(df) * 8 AS raw_bytes,
                 max(max_gap) AS max_gap
          FROM per)
       SELECT CAST(n_terms AS BIGINT) AS n_terms,
              CAST(n_postings AS BIGINT) AS n_postings,
              CAST(raw_bytes AS BIGINT) AS raw_bytes,
              CAST(varint_bytes AS BIGINT) AS varint_bytes,
              CAST((CAST(raw_bytes - varint_bytes AS HUGEINT) * 1000000)
                   // raw_bytes AS BIGINT) AS savings_ppm,
              CAST(max_gap AS BIGINT) AS max_gap
       FROM rep"""


@register(
    "q325_postings_compression_estimate",
    _q325_oracle(),
    "posting-list delta-gap + varint size estimate (the index-"
    "sizing arithmetic behind every inverted index — Lucene/ "
    "Elasticsearch postings are EXACTLY gap-encoded varints — and "
    "the capacity-planning companion to q224's logical index "
    "build): per term the sorted postings become first-id+1 and "
    "successive gaps (the shift comes from a rank self-join "
    "within (term) — the rank window partitions on the HIGH-"
    "cardinality term, never a global sort), each gap costs "
    "ceil(bits/7) varint bytes computed exactly via the q174 "
    "len(bin)-1 idiom — no fp log, engine-identical.  Report: "
    "term/posting counts, raw 8-byte-id cost vs varint cost, "
    "savings in exact floor-ppm, and the largest gap (the "
    "worst-case skip-list hop).  Plan: distinct postings + two "
    "term-keyed stages, all map-combinable or co-partitioned on "
    "the term; nothing global",
)
def q325(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    post = d.select(
        F.explode(T.tokens("text")).alias("tok"), "doc_id"
    ).distinct()
    ranked = post.select(
        "tok",
        "doc_id",
        F.row_number()
        .over(Window.partitionBy("tok").orderBy("doc_id"))
        .alias("rn"),
    ).localCheckpoint()  # read by both sides of the shift join
    gaps = ranked.alias("b").join(
        ranked.select(
            "tok", (F.col("rn") + 1).alias("rn"), F.col("doc_id").alias("prev")
        ).alias("a"),
        ["tok", "rn"],
        "left",
    ).select(
        "tok",
        F.when(F.col("prev").isNull(), F.col("b.doc_id") + 1)
        .otherwise(F.col("b.doc_id") - F.col("prev"))
        .alias("gap"),
    )
    sized = gaps.select(
        "tok",
        "gap",
        F.expr(
            "(length(bin(greatest(gap, 1))) - 1 + 7) div 7"  # div-ok: varint byte count, quotient <= 9
        ).alias("vbytes"),
    )
    per = sized.groupBy("tok").agg(
        F.count("*").alias("df"),
        F.sum("vbytes").alias("post_bytes"),
        F.max("gap").alias("max_gap"),
    )
    return per.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("n_postings"),
        (F.sum("df") * 8).cast("long").alias("raw_bytes"),
        F.sum("post_bytes").cast("long").alias("varint_bytes"),
        F.max("max_gap").cast("long").alias("max_gap"),
    ).select(
        "n_terms",
        "n_postings",
        "raw_bytes",
        "varint_bytes",
        F.expr(
            "CAST(raw_bytes - varint_bytes AS DECIMAL(38,0)) * 1000000"
            " div raw_bytes"  # div-ok: savings share, quotient <= 1e6
        )
        .cast("long")
        .alias("savings_ppm"),
        "max_gap",
    )


_OOF_FOLDS = 5
_OOF_PRIOR = 20


def _q326_oracle() -> str:
    hf = hex_hash64_sql("CAST(o_orderkey AS VARCHAR)", salt="oof")
    return f"""WITH rows_ AS (
          SELECT c_nationkey AS cat,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS y,
                 CAST(({hf}) % {_OOF_FOLDS} AS INTEGER) AS fold
          FROM orders JOIN customer ON c_custkey = o_custkey),
       gm AS (
          SELECT sum(CAST(y AS HUGEINT)) // count(*) AS prior
          FROM rows_),
       cell AS (
          SELECT cat, fold, count(*) AS n, sum(CAST(y AS HUGEINT)) AS s
          FROM rows_ GROUP BY cat, fold),
       catt AS (
          SELECT cat, sum(n) AS nc, sum(s) AS sc FROM cell
          GROUP BY cat),
       enc AS (
          SELECT c.cat, c.fold, c.n AS n_fold,
                 (t.sc + {_OOF_PRIOR} * prior)
                   // (t.nc + {_OOF_PRIOR}) AS enc_naive,
                 ((t.sc - c.s) + {_OOF_PRIOR} * prior)
                   // ((t.nc - c.n) + {_OOF_PRIOR}) AS enc_oof
          FROM cell c JOIN catt t ON t.cat = c.cat CROSS JOIN gm),
       per AS (
          SELECT cat, max(enc_naive) AS enc_naive,
                 sum(n_fold) AS n_rows,
                 max(abs(enc_naive - enc_oof)) AS max_gap_cents,
                 sum(n_fold * abs(enc_naive - enc_oof)) AS wsum
          FROM enc GROUP BY cat)
       SELECT CAST(cat AS INTEGER) AS cat,
              CAST(n_rows AS BIGINT) AS n_rows,
              CAST(enc_naive AS BIGINT) AS enc_naive_cents,
              CAST(max_gap_cents AS BIGINT) AS max_gap_cents,
              CAST((wsum * 1000000) // n_rows AS BIGINT)
                AS wmean_gap_milli_cents
       FROM per ORDER BY cat"""


@register(
    "q326_oof_target_encoding",
    _q326_oracle(),
    "out-of-fold target encoding with an IN-RESULT leakage "
    "differential (the footgun q109's smoothed encoder and q286's "
    "group folds each solve half of: a target encoding fit on ALL "
    "rows leaks the target into training folds, inflating every "
    "offline metric — the standard fix is per-fold encodings from "
    "the OTHER folds, and this query MEASURES the gap instead of "
    "asserting it): per (category, fold) cells, the naive "
    "all-rows smoothed mean (prior weight "
    f"{_OOF_PRIOR} toward the floored global mean) beside the "
    "leave-fold-out encoding ((S_cat - S_fold + m*prior)/"
    "(n_cat - n_fold + m)), all in exact floored cents; per "
    "category the max and row-weighted mean absolute gap — "
    "rare categories show cent-scale gaps (that IS the leakage "
    "signal), dense ones shrink toward zero.  Plan: one fact "
    "join + ONE (category x fold) cell aggregate; every encoding "
    "derives from cells by subtraction (never a per-fold rescan), "
    "and all downstream frames are bounded by |categories| x "
    f"{_OOF_FOLDS}",
)
def q326(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    rows_ = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_nationkey").alias("cat"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("y"),
        (
            T.hex_hash64(F.col("o_orderkey").cast("string"), salt="oof")
            % _OOF_FOLDS
        )
        .cast("int")
        .alias("fold"),
    )
    gm = rows_.agg(
        F.expr(
            _exdiv(
                "sum(CAST(y AS DECIMAL(38,0)))",
                "CAST(count(*) AS DECIMAL(38,0))",
            )
        ).alias("prior")
    )
    cell = rows_.groupBy("cat", "fold").agg(
        F.count("*").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("s"),
    ).localCheckpoint()  # |cats| x folds rows; read by catt and enc
    catt = cell.groupBy("cat").agg(
        F.sum("n").alias("nc"), F.sum("s").alias("sc")
    )
    enc = (
        cell.join(catt, "cat")
        .crossJoin(F.broadcast(gm))
        .select(
            "cat",
            F.col("n").alias("n_fold"),
            F.expr(
                _exdiv(
                    f"sc + {_OOF_PRIOR} * prior",
                    f"CAST(nc + {_OOF_PRIOR} AS DECIMAL(38,0))",
                )
            ).alias("enc_naive"),
            F.expr(
                _exdiv(
                    f"(sc - s) + {_OOF_PRIOR} * prior",
                    f"CAST((nc - n) + {_OOF_PRIOR} AS DECIMAL(38,0))",
                )
            ).alias("enc_oof"),
        )
    )
    return (
        enc.groupBy("cat")
        .agg(
            F.max("enc_naive").alias("enc_naive"),
            F.sum("n_fold").alias("n_rows"),
            F.max(F.abs(F.col("enc_naive") - F.col("enc_oof"))).alias(
                "max_gap"
            ),
            F.sum(
                F.col("n_fold")
                * F.abs(F.col("enc_naive") - F.col("enc_oof"))
            ).alias("wsum"),
        )
        .select(
            F.col("cat").cast("int").alias("cat"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("enc_naive").cast("long").alias("enc_naive_cents"),
            F.col("max_gap").cast("long").alias("max_gap_cents"),
            F.expr(
                "CAST(wsum AS DECIMAL(38,0)) * 1000000 div n_rows"  # div-ok: weighted mean gap (milli-cents), bounded by max gap x 1e6
            )
            .cast("long")
            .alias("wmean_gap_milli_cents"),
        )
        .orderBy("cat")
    )


def _q327_oracle() -> str:
    return """WITH ranked AS (
          SELECT c_custkey AS k,
                 row_number() OVER (ORDER BY c_custkey) AS r
          FROM customer),
       mom AS (
          SELECT count(*) AS n,
                 sum(CAST(k AS HUGEINT)) AS sx,
                 sum(CAST(r AS HUGEINT)) AS sy
          FROM ranked),
       cen AS (SELECT n, sx // n AS km, sy // n AS rm FROM mom),
       moc AS (
          SELECT sum((CAST(k AS HUGEINT) - km)
                     * (CAST(k AS HUGEINT) - km)) AS sxx,
                 sum((CAST(k AS HUGEINT) - km)
                     * (CAST(r AS HUGEINT) - rm)) AS sxy
          FROM ranked CROSS JOIN cen),
       beta AS (
          SELECT (sxy * 1000000 - (sxy * 1000000) % sxx) // sxx
                   AS beta_ppm
          FROM moc),
       err AS (
          SELECT abs(CAST(r AS HUGEINT) - rm
                     - ((CAST(k AS HUGEINT) - km) * beta_ppm
                        - ((CAST(k AS HUGEINT) - km) * beta_ppm)
                          % 1000000) // 1000000) AS e
          FROM ranked CROSS JOIN cen CROSS JOIN beta)
       SELECT CAST((SELECT n FROM cen) AS BIGINT) AS n,
              CAST((SELECT beta_ppm FROM beta) AS BIGINT) AS beta_ppm,
              CAST(max(e) AS BIGINT) AS max_abs_err,
              CAST((sum(e) * 1000000) // (SELECT n FROM cen) AS BIGINT)
                AS mean_abs_err_ppm
       FROM err"""


@register(
    "q327_learned_index_bound",
    _q327_oracle(),
    "learned-index error bound (the RMI/PGM question: 'if a linear "
    "model predicts each key's position, how far can it be off?' — "
    "max error IS the index's search-window size, the number that "
    "decides whether a learned index beats a B-tree): keys ranked "
    "by the two-phase global_row_number (never a single-partition "
    "window over the key column), a least-squares slope in exact "
    "integer arithmetic over FLOOR-CENTERED moments (km = Sx//n, "
    "rm = Sy//n — the centering convention is part of the spec, "
    "stated so both engines compute the identical estimator; "
    "centered Sxx ~ n*range^2 stays inside DECIMAL(38)/HUGEINT "
    "where the uncentered n*Sxx form would overflow at 100 TB), "
    "the slope quantized to ppm with the sign-safe (v - v %% d)/d "
    "truncation identity (q321 lesson — residuals ARE signed), and "
    "per-key absolute rank error of the QUANTIZED model — the "
    "model a learned index would actually deploy.  Report: n, "
    "slope ppm, max error (the search window) and mean error ppm. "
    " Plan: one range exchange for the rank, then three "
    "map-combinable moment/error aggregates; state is O(1)",
)
def q327(spark: SparkSession, sf: str) -> DataFrame:
    keys = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("k")
    )
    ranked = K.global_row_number(keys, [F.asc("k")], "r").localCheckpoint()
    mom = ranked.agg(
        F.count("*").alias("n"),
        F.sum(F.col("k").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("r").cast("decimal(38,0)")).alias("sy"),
    )
    cen = mom.select(
        "n",
        F.expr(_exdiv("sx", "CAST(n AS DECIMAL(38,0))")).alias("km"),
        F.expr(_exdiv("sy", "CAST(n AS DECIMAL(38,0))")).alias("rm"),
    ).localCheckpoint()  # 1 row
    moc = ranked.crossJoin(F.broadcast(cen)).agg(
        F.sum(
            F.expr(
                "(CAST(k AS DECIMAL(38,0)) - km)"
                " * (CAST(k AS DECIMAL(38,0)) - km)"
            )
        ).alias("sxx"),
        F.sum(
            F.expr(
                "(CAST(k AS DECIMAL(38,0)) - km)"
                " * (CAST(r AS DECIMAL(38,0)) - rm)"
            )
        ).alias("sxy"),
    )
    beta = moc.select(
        F.expr(
            _exdiv("sxy * CAST(1000000 AS DECIMAL(38,0))", "sxx")
        ).alias("beta_ppm")
    )
    err = ranked.crossJoin(F.broadcast(cen)).crossJoin(
        F.broadcast(beta)
    ).select(
        F.abs(
            F.expr(
                "CAST(r AS DECIMAL(38,0)) - rm - "
                + _exdiv(
                    "(CAST(k AS DECIMAL(38,0)) - km) * beta_ppm",
                    "CAST(1000000 AS DECIMAL(38,0))",
                )
            )
        ).alias("e"),
        "n",
        "beta_ppm",
    )
    return err.agg(
        F.max("n").cast("long").alias("n"),
        F.max("beta_ppm").cast("long").alias("beta_ppm"),
        F.max("e").cast("long").alias("max_abs_err"),
        F.expr(
            "CAST(sum(e) AS DECIMAL(38,0)) * 1000000 div max(n)"  # div-ok: mean rank error ppm, quotient <= max_err x 1e6
        )
        .cast("long")
        .alias("mean_abs_err_ppm"),
    ).select("n", "beta_ppm", "max_abs_err", "mean_abs_err_ppm")


_BF_M = 1 << 18  # bits
_BF_K = 3  # hash functions


def _q328_oracle() -> str:
    def h(i: int, key: str = "k") -> str:
        return (
            hex_hash64_sql(f"CAST({key} AS VARCHAR)", salt=f"b{i}")
            + f" % {_BF_M}"
        )

    hm = hex_hash64_sql("CAST(c_custkey AS VARCHAR)", salt="bm")
    poss = ", ".join(f"({h(i)})" for i in range(_BF_K))
    return f"""WITH split AS (
          SELECT c_custkey AS k, ({hm}) % 2 AS grp FROM customer),
       members AS (SELECT k FROM split WHERE grp = 0),
       probes AS (SELECT k FROM split WHERE grp = 1),
       bits AS (
          SELECT DISTINCT pos FROM members,
          unnest([{poss}]) AS u(pos)),
       probe_bits AS (
          SELECT k, pos FROM probes, unnest([{poss}]) AS u(pos)),
       matched AS (
          SELECT pb.k, count(*) AS hit
          FROM probe_bits pb SEMI JOIN bits b ON b.pos = pb.pos
          GROUP BY pb.k),
       fp AS (SELECT count(*) AS n_fp FROM matched
              WHERE hit = {_BF_K}),
       stats AS (
          SELECT (SELECT count(*) FROM members) AS n_members,
                 (SELECT count(*) FROM probes) AS n_probes,
                 (SELECT count(*) FROM bits) AS n_bits_set,
                 (SELECT n_fp FROM fp) AS n_fp)
       SELECT CAST(n_members AS BIGINT) AS n_members,
              CAST(n_probes AS BIGINT) AS n_probes,
              CAST(n_bits_set AS BIGINT) AS n_bits_set,
              CAST((CAST(n_bits_set AS HUGEINT) * 1000000) // {_BF_M}
                   AS BIGINT) AS occupancy_ppm,
              CAST(n_fp AS BIGINT) AS n_false_pos,
              CAST((CAST(n_fp AS HUGEINT) * 1000000) // n_probes
                   AS BIGINT) AS fpr_ppm
       FROM stats"""


@register(
    "q328_bloom_fpr_measured",
    _q328_oracle(),
    "Bloom-filter false-positive rate MEASURED, not assumed (the "
    "verification q113's bloom pre-screen and every "
    "bloom-join-pushdown claim rest on: does the deployed (m, k) "
    "actually deliver its promised FPR on THIS key distribution?): "
    f"half the keys (hash-split) build an m={_BF_M}-bit, "
    f"k={_BF_K}-hash filter as a DISTINCT set-bit relation; the "
    "other half — guaranteed true negatives — probe it, and a "
    "probe is a false positive iff ALL k of its bit positions are "
    "set (a bit-keyed semi join + count, never a bitmap in driver "
    "memory — the filter is a RELATION, which is exactly how a "
    "distributed bloom build shuffles before being packed).  "
    "Report: build/probe sizes, set-bit occupancy and measured "
    "FPR in exact floor-ppm.  SIZING NOTE (the scale contract): m "
    "is a constant here, so occupancy saturates if n grows "
    "unbounded — a production build sizes m ~ n*bits_per_key "
    "BEFORE this query verifies the result; the verification "
    "pattern itself is scale-free (bit-keyed equi joins).  Plan: "
    f"constant x{_BF_K} fanouts, one distinct on <= m values, one "
    "semi join, one grouped count",
)
def q328(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("k")
    )
    split = c.select(
        "k",
        (T.hex_hash64(F.col("k").cast("string"), salt="bm") % 2).alias(
            "grp"
        ),
    )
    def positions(df):
        return df.select(
            "k",
            F.explode(
                F.array(
                    *[
                        T.hex_hash64(
                            F.col("k").cast("string"), salt=f"b{i}"
                        )
                        % _BF_M
                        for i in range(_BF_K)
                    ]
                )
            ).alias("pos"),
            # explicit isnotnull: pos is never null (md5-derived), but
            # the semi join INFERS IsNotNull(pos) on its build side
            # only, de-canonicalizing the bits subtree vs the n_bits
            # count branch so the scan+explode+distinct ran twice (r7
            # final-plan audit); stating the constraint on both makes
            # the subtrees identical and exchange reuse fire
        ).filter(F.col("pos").isNotNull())
    members = split.filter(F.col("grp") == 0).select("k")
    probes = split.filter(F.col("grp") == 1).select("k")
    bits = positions(members).select("pos").distinct()
    matched = (
        positions(probes)
        .join(bits, "pos", "semi")
        .groupBy("k")
        .agg(F.count("*").alias("hit"))
    )
    # both population counts from ONE scan (the per-split count
    # branches re-ran the full customer scan each — the grp split is
    # hash-computed, so no pushed filter prunes either branch; r7
    # re-execution audit).  n_b and n_fp read the bits-distinct /
    # matched-groupBy exchanges their producers already shuffle.
    pops = split.agg(
        F.sum((F.col("grp") == 0).cast("long")).alias("n_members"),
        F.sum((F.col("grp") == 1).cast("long")).alias("n_probes"),
    )
    n_b = bits.agg(F.count("*").alias("n_bits_set"))
    n_fp = matched.filter(F.col("hit") == _BF_K).agg(
        F.count("*").alias("n_fp")
    )
    return (
        pops.crossJoin(F.broadcast(n_b))
        .crossJoin(F.broadcast(n_fp))
        .select(
            F.col("n_members").cast("long").alias("n_members"),
            F.col("n_probes").cast("long").alias("n_probes"),
            F.col("n_bits_set").cast("long").alias("n_bits_set"),
            F.expr(
                f"CAST(n_bits_set AS DECIMAL(38,0)) * 1000000 div {_BF_M}"  # div-ok: occupancy share, quotient <= 1e6
            )
            .cast("long")
            .alias("occupancy_ppm"),
            F.col("n_fp").cast("long").alias("n_false_pos"),
            F.expr(
                "CAST(n_fp AS DECIMAL(38,0)) * 1000000 div n_probes"  # div-ok: FPR share, quotient <= 1e6
            )
            .cast("long")
            .alias("fpr_ppm"),
        )
    )


@register(
    "q335_ivf_search_stored",
    _q73_oracle(),
    "q73's IVF search probing a PERSISTED index — the §8.12 store "
    "pattern applied to ANN serving (VERDICT r9 task #4: q73 rebuilt "
    "centroids and cell assignments on every query; dedup got its "
    "persisted index in r9, this is the search-side twin): "
    "similarity.build_ivf_store writes the cell-assigned vector table "
    "(sorted by cell, with precomputed norms) and the 16-row centroid "
    "table to parquet ONCE per corpus delivery, and ivf_search_stored "
    "scores only the stored centroids against the broadcast query, "
    "collects the 4 best cell ids (driver state bounded by n_probes "
    "by construction), filters the cell-sorted store — parquet "
    "row-group pruning; partition pruning on a cell-partitioned "
    "production store — and takes the exact floored-cosine top-10 "
    "inside the probed cells using the STORED norms (no per-query "
    "norm re-fold over the corpus).  The oracle IS q73's relational "
    "statement verbatim: the store is an implementation detail, so "
    "stored == recompute == relational truth is one driver hash "
    "equality (the q332/q334 proof shape); n_cells travels as column "
    "metadata in the parquet footer and a probe over-asking fails "
    "loudly (ADVICE-r9 params-with-the-store contract)",
)
def q335(spark: SparkSession, sf: str) -> DataFrame:
    # build + probe in one call; bench.py separates the phases via
    # STORE_SPLIT (VERDICT r9 task #5) — see q332
    return _q335_probe(spark, sf, _q335_build(spark, sf))


def _q335_build(spark: SparkSession, sf: str) -> str:
    """q335's one-time index build: embeddings -> cell-sorted assigned
    table (+ precomputed norms) and centroid table on parquet."""
    import os
    import shutil
    import tempfile

    from ..operators.similarity import build_ivf_store

    e = load_table(spark, sf, "embeddings")
    root = os.path.join(
        tempfile.gettempdir(),
        "hdt_q335_%s_%d"
        % (os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    shutil.rmtree(root, ignore_errors=True)
    assigned, cents = build_ivf_store(e, n_cells=16)
    # one-time index build per corpus delivery: the cell sort gives
    # every row group a tight cell min/max, which is what lets the
    # probe-time cell filter skip non-probed groups (q332's rationale)
    assigned.sort("cell").write.parquet(os.path.join(root, "assigned"))
    cents.write.parquet(os.path.join(root, "centroids"))
    return root


def _q335_probe(spark: SparkSession, sf: str, root: str) -> DataFrame:
    """q335's per-query probe against the persisted index at ``root``."""
    import os

    from ..operators.similarity import ivf_search_stored

    e = load_table(spark, sf, "embeddings")
    query = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    sa = spark.read.parquet(os.path.join(root, "assigned"))
    sc = spark.read.parquet(os.path.join(root, "centroids"))
    return ivf_search_stored(sa, sc, query, k=10, n_probes=4)


#: VERDICT r9 task #5: the three persisted-store queries pay their
#: one-time store build + write INSIDE the registered query by
#: construction (honest for the differential: the driver gates the
#: whole delivery cycle as one hash).  For benching, that build cost is
#: amortized once-per-delivery in production and must not read as
#: query cost in round-over-round diffs — bench.py times each phase
#: separately through this map and records them under "store_split" in
#: the bench detail, reconciled with SCALE.md §8.12's build/probe
#: table.
def _stream_store_root(tag: str, sf: str) -> str:
    import os
    import shutil
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(),
        "hdt_%s_store_%s_%d"
        % (tag, os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    shutil.rmtree(root, ignore_errors=True)
    return root


def _q181_build(spark: SparkSession, sf: str) -> str:
    """q181's one-time store build (bench store_split, VERDICT r10
    task #5: the streaming entries' wall was build + stream machinery
    read as query cost)."""
    from ..streaming.ingest import build_text_store

    return build_text_store(spark, sf, _stream_store_root("q181", sf))


def _q181_probe(spark: SparkSession, sf: str, root: str):
    from ..streaming.ingest import stream_incremental_dedup

    return stream_incremental_dedup(spark, sf, store_dir=root)


def _q338_build(spark: SparkSession, sf: str) -> str:
    from ..streaming.ingest import build_vector_store

    return build_vector_store(spark, sf, _stream_store_root("q338", sf))


def _q338_probe(spark: SparkSession, sf: str, root: str):
    from ..streaming.ingest import stream_embedding_admission

    return stream_embedding_admission(spark, sf, store_dir=root)


STORE_SPLIT: dict[str, tuple] = {
    "q332_incremental_dedup_stored": (_q332_build, _q332_probe),
    "q334_embedding_incremental_stored": (_q334_build, _q334_probe),
    "q335_ivf_search_stored": (_q335_build, _q335_probe),
    "q181_stream_incremental_dedup": (_q181_build, _q181_probe),
    "q338_stream_embedding_admission": (_q338_build, _q338_probe),
}


@register(
    "q336_jdbc_federation",
    """SELECT r.r_name,
              CAST(count(*) AS BIGINT) AS n_nations,
              min(n.n_name) AS first_nation
       FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY r.r_name""",
    "JDBC federation source (SURVEY §2.1 S7's federating alternative — "
    "the reference's actual source is a remote PostgreSQL, "
    "Reporting.py:7-10/load_hhs.py:179-185): the nation dimension is "
    "written to an embedded Derby database (the only JDBC engine in "
    "the sandbox — pyspark ships its jars; production swaps the "
    "URL/driver for pgJDBC, same code path) and read BACK through "
    "sources/jdbc.py:read_jdbc_table as a RANGED PARALLEL scan (4 "
    "partitions on n_nationkey — an unpartitioned JDBC read is one "
    "task holding one connection, the day-one federation mistake), "
    "then aggregated per region with the region dimension broadcast.  "
    "The oracle states the same join/aggregate over the parquet "
    "tables, so the differential gates the full JDBC round trip: "
    "type mapping (INT/VARCHAR), write batching, ranged predicate "
    "generation, and read-back fidelity",
)
def q336(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import tempfile

    from ..sources.jdbc import (
        derby_url,
        read_jdbc_table,
        register_derby_cleanup,
        write_jdbc_table,
    )

    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")

    # pid-suffixed db path, no EAGER rmtree: Derby keeps a database
    # booted for the JVM's lifetime, so deleting the directory under it
    # corrupts re-use within one process; ;create=true boots an
    # existing db and mode=overwrite recreates the table.  Erasure is
    # deferred to interpreter exit (shutdown=true then rmtree) so bench
    # reps / store-split reruns stop orphaning one database per process
    # per sf (ADVICE r10 #4).
    root = os.path.join(
        tempfile.gettempdir(),
        "hdt_q336_%s_%d"
        % (os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    url = derby_url(os.path.join(root, "db"))
    register_derby_cleanup(root, url)
    write_jdbc_table(
        nation, url, "nation", column_types="n_name VARCHAR(25)"
    )
    federated = read_jdbc_table(
        spark, url, "nation",
        partition_column="n_nationkey", lower=0, upper=25, num_partitions=4,
    )
    return (
        federated.groupBy("n_regionkey")
        .agg(
            F.count("*").cast("long").alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
        .join(
            F.broadcast(
                region.select(
                    F.col("r_regionkey").alias("n_regionkey"), "r_name"
                )
            ),
            "n_regionkey",
        )
        .select("r_name", "n_nations", "first_nation")
    )


def _q337_oracle(n_queries: int = 3, n_probes: int = 4, k: int = 10) -> str:
    """Multi-query IVF oracle: q73's statement generalized to a query
    BATCH — per-query probe-cell ranks, then per-query top-k."""
    cos = (
        "(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))))"
    )
    ec = cos.format(a="e.v", b="c.c")
    cq = cos.format(a="c.c", b="q.qv")
    ap = cos.format(a="a.v", b="p.qv")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         cents AS (SELECT vec_id AS cell, v AS c FROM e ORDER BY vec_id LIMIT 16),
         assigned AS (
           SELECT vec_id, v, cell FROM (
             SELECT e.vec_id, e.v, c.cell,
                    row_number() OVER (PARTITION BY e.vec_id
                                       ORDER BY {ec} DESC, c.cell ASC) AS rk
             FROM e CROSS JOIN cents c) WHERE rk = 1),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e
               WHERE vec_id < {n_queries}),
         probes AS (
           SELECT query_id, cell, qv FROM (
             SELECT q.query_id, c.cell, q.qv,
                    row_number() OVER (PARTITION BY q.query_id
                                       ORDER BY {cq} DESC, c.cell ASC) AS pr
             FROM cents c CROSS JOIN q) WHERE pr <= {n_probes}),
         scored AS (
           SELECT p.query_id, a.vec_id,
                  (floor(({ap}) * 1000000.0) / 1000000.0) AS sim
           FROM assigned a JOIN probes p ON a.cell = p.cell)
    SELECT query_id, vec_id, sim, rank FROM (
      SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id ASC) AS rank
      FROM scored) WHERE rank <= {k}"""


@register(
    "q337_ivf_batch_search",
    _q337_oracle(),
    "batched IVF search: exact floored-cosine top-10 for a BATCH of "
    "query vectors in ONE plan — the serving/labeling shape (k-NN for "
    "a whole batch) where q73/q335's per-query driver probe-collect "
    "would cost O(|Q|) round trips.  Probe selection stays in-plan: "
    "queries cross the broadcast 16-row centroid table, a per-query "
    "window ranks the 4 best cells (each window group is exactly 16 "
    "rows — never corpus-sized), and the |Q| x 4-row probe set "
    "(carrying query vectors + precomputed norms) broadcasts against "
    "the assignment table's cell key; the per-query top-10 runs "
    "through the two-phase top_k_per_group_scalable so no query's "
    "candidate set funnels through one task.  Sizing contract stated "
    "on the operator: right while the query batch fits in executor "
    "memory; corpus-vs-corpus kNN belongs to the LSH-bucketed "
    "per-vector top-k (q105).  The oracle is q73's statement "
    "generalized to the batch — per-query probe ranks, per-query "
    "top-k, floor6 sims, id tiebreaks",
)
def q337(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.similarity import build_ivf_store, ivf_search_batch

    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    assigned, cents = build_ivf_store(e, n_cells=16)
    return ivf_search_batch(assigned, cents, queries, k=10, n_probes=4)


@register(
    "q338_stream_embedding_admission",
    _q333_oracle(derived_cap_budget=D.ADMISSION_CAP_BUDGET),
    "the q333 vector-admission gate run as a STREAM "
    "(streaming/ingest.py:stream_embedding_admission) — q181's twin "
    "on the embedding side, completing the family's symmetry "
    "(q178/q331/q332 text :: q333/q334 vectors :: q181/q338 streams): "
    "batch vectors arrive as two microbatch files and foreachBatch "
    "probes the corpus's PERSISTED embedding store "
    "(build_embedding_lsh_store, written once before the stream; "
    "each arrival signs only itself and verifies with the STORED "
    "precomputed norms).  The bucket guard is corpus-side ON PURPOSE "
    "(a per-microbatch pair_budget would derive its keep-set from "
    "that microbatch's probe counts, so the union of arrival "
    "verdicts could differ from the whole-batch result) — and since "
    "r11 it is the admission cap DERIVED from the corpus at build "
    "time (min(cap_budget, max bucket size) for the 1-band vector "
    "store — dedup.derive_admission_cap) and stamped in the store's "
    "footer metadata, not the hard-coded constant §8.11b measured "
    "failing open; the probe reads the stamp by default.  Admission "
    "stays stateless given the store, so streaming == batch == "
    "relational truth is one hash equality (the oracle is q333's "
    "statement with the derived-cap CTEs swapped in).  At 100 TB the "
    "stored signature+norm tables are the probe index and streaming "
    "state is empty: arrival granularity cannot change the admitted "
    "set",
)
def q338(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.ingest import stream_embedding_admission

    return stream_embedding_admission(spark, sf)


def _q339_state_sql(version: int) -> str:
    """Relational restatement of snapshot version N of the q339 table:
    v1 = orders with o_orderkey % 5 = 0; v2 = v1 DELETE WHERE
    o_orderstatus = 'F'."""
    base = (
        "SELECT o_orderkey AS k, o_orderstatus AS st,"
        " CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents"
        " FROM orders WHERE o_orderkey % 5 = 0"
    )
    if version == 1:
        return base
    return f"SELECT * FROM ({base}) v1 WHERE NOT (st = 'F')"


@register(
    "q339_snapshot_delete",
    "WITH h1 AS (SELECT "
    + hex_hash64_sql("CAST(k AS VARCHAR) || '|' || st || '|' || CAST(cents AS VARCHAR)")
    + f""" AS h FROM ({_q339_state_sql(1)}) s1),
       h2 AS (SELECT """
    + hex_hash64_sql("CAST(k AS VARCHAR) || '|' || st || '|' || CAST(cents AS VARCHAR)")
    + f""" AS h FROM ({_q339_state_sql(2)}) s2)
       SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(bit_xor(h) AS BIGINT) AS xor_hash,
              CAST(sum(h % 1000000007) AS BIGINT) AS sum_mod
       FROM h1
       UNION ALL
       SELECT 2, CAST(count(*) AS BIGINT), CAST(bit_xor(h) AS BIGINT),
              CAST(sum(h % 1000000007) AS BIGINT)
       FROM h2""",
    "snapshot DELETE WHERE — the right-to-be-forgotten / takedown "
    "primitive a 100 TB training-corpus store runs on every legal "
    "request: version 1 commits an orders subset, version 2 is "
    "commit_delete(o_orderstatus = 'F') (survivors rewritten, prior "
    "files untouched), and BOTH versions are read back BY VERSION "
    "NUMBER and content-fingerprinted — so the differential gates "
    "delete semantics AND snapshot isolation (the deleted rows must "
    "still time-travel in v1, and must be gone from v2, as one hash "
    "equality per state).  Physical erasure is the documented "
    "two-step: commit_delete makes rows invisible now, vacuum() past "
    "the retention horizon removes the bytes (Delta's DELETE + "
    "VACUUM contract, pinned by test_commit_delete_and_time_travel). "
    "At 100 TB a partitioned table rewrites only partitions "
    "containing matches (snapshots.py module docstring)",
)
def q339(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..snapshots import SnapshotTable

    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") % 5 == 0)
    state = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "hdt_q339_%s_%d"
        % (os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(spark, root)
    t.commit_overwrite(state)
    t.commit_delete("st = 'F'")

    h = T.hex_hash64(
        F.concat(
            F.col("k").cast("string"), F.lit("|"), F.col("st"),
            F.lit("|"), F.col("cents").cast("string"),
        )
    )

    def fp(v: int) -> DataFrame:
        return (
            t.read(version=v)
            .select(h.alias("h"))
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
                F.sum(F.col("h") % 1000000007).cast("long").alias("sum_mod"),
            )
            .select(F.lit(v).cast("int").alias("version"), "*")
        )

    return fp(1).unionByName(fp(2))


def _q340_state_sql(version: int) -> str:
    """Relational restatement of snapshot version N of the q340
    PARTITIONED table: v1 = orders with o_orderkey % 5 = 0 keyed
    (k, st, cents); v2 = v1 DELETE WHERE st = 'F' AND k % 10 = 0
    (touches ONLY the 'F' partition, partially)."""
    base = (
        "SELECT o_orderkey AS k, o_orderstatus AS st,"
        " CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents"
        " FROM orders WHERE o_orderkey % 5 = 0"
    )
    if version == 1:
        return base
    return (
        f"SELECT * FROM ({base}) v1 "
        "WHERE NOT (st = 'F' AND k % 10 = 0)"
    )


@register(
    "q340_partitioned_snapshot_delete",
    "WITH h1 AS (SELECT "
    + hex_hash64_sql("CAST(k AS VARCHAR) || '|' || st || '|' || CAST(cents AS VARCHAR)")
    + f""" AS h FROM ({_q340_state_sql(1)}) s1),
       h2 AS (SELECT """
    + hex_hash64_sql("CAST(k AS VARCHAR) || '|' || st || '|' || CAST(cents AS VARCHAR)")
    + f""" AS h FROM ({_q340_state_sql(2)}) s2)
       SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(bit_xor(h) AS BIGINT) AS xor_hash,
              CAST(sum(h % 1000000007) AS BIGINT) AS sum_mod,
              TRUE AS untouched_reused
       FROM h1
       UNION ALL
       SELECT 2, CAST(count(*) AS BIGINT), CAST(bit_xor(h) AS BIGINT),
              CAST(sum(h % 1000000007) AS BIGINT), TRUE
       FROM h2""",
    "q339's DELETE WHERE on a PARTITIONED snapshot table (VERDICT r10 "
    "missing #1 closed): the orders subset commits partitioned by "
    "o_orderstatus, and the delete predicate (st = 'F' AND k % 10 = "
    "0) matches rows in ONLY the 'F' partition — so commit_delete "
    "rewrites the 'F' survivors alone and the new manifest REUSES the "
    "'O'/'P' partitions' data directories verbatim (O(touched "
    "partitions) per takedown, not O(table) — what a 100 TB corpus "
    "store needs on every legal request).  The oracle fingerprints "
    "BOTH versions (delete semantics + time-travel isolation, as "
    "q339) AND the untouched_reused column: the Spark side computes "
    "it FROM THE MANIFESTS (untouched partitions' directory lists "
    "identical across v1/v2, touched partition's rewritten), the "
    "oracle states TRUE — a broken reuse path flips the column and "
    "fails the hash, making directory reuse itself driver-gated.  "
    "Leaf-granular vacuum (partially reused commit dirs lose only "
    "unreferenced leaves) is pinned by "
    "test_partitioned_append_and_vacuum_leaf_gc",
)
def q340(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..snapshots import SnapshotTable

    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") % 5 == 0)
    state = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "hdt_q340_%s_%d"
        % (os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(spark, root, partition_by="st")
    t.commit_overwrite(state)
    t.commit_delete("st = 'F' AND k % 10 = 0")

    # directory-reuse proof, computed from the actual manifests: every
    # untouched partition's dir list must carry over verbatim, and the
    # touched partition must NOT (it was rewritten)
    p1 = t.manifest(1)["partitions"]
    p2 = t.manifest(2)["partitions"]
    reused = (
        all(p2.get(k) == dirs for k, dirs in p1.items() if k != "F")
        and p2.get("F") != p1.get("F")
    )

    h = T.hex_hash64(
        F.concat(
            F.col("k").cast("string"), F.lit("|"), F.col("st"),
            F.lit("|"), F.col("cents").cast("string"),
        )
    )

    def fp(v: int) -> DataFrame:
        return (
            t.read(version=v)
            .select(h.alias("h"))
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
                F.sum(F.col("h") % 1000000007).cast("long").alias("sum_mod"),
            )
            .select(
                F.lit(v).cast("int").alias("version"),
                "*",
                F.lit(bool(reused)).alias("untouched_reused"),
            )
        )

    return fp(1).unionByName(fp(2))


def _q341_oracle(
    n_cells: int = 16, n_anchors: int = 8, n_probes: int = 4, k: int = 3
) -> str:
    """Lloyd-refined IVF recall acceptance, fully unrolled:
    corpus = embeddings with vec_id >= n_anchors (anchors are
    OUT-OF-CORPUS queries — the serving scenario, and no self-match
    special-casing); centroids = rounds=2 integer Lloyd over the
    int8-quantized corpus (q158's CTEs with k = n_cells); probes =
    the n_probes nearest refined centroids by the SAME exact-integer
    d2 the assignment used; both the IVF arm and the exact arm rank by
    floored raw cosine with (sim desc, vec_id) tie-breaks."""
    from ..functions.vector import int8_quantize_sql

    cos_cv = cosine_sql(
        "CAST(cv.embedding AS DOUBLE[])", "CAST(av.embedding AS DOUBLE[])"
    )
    return f"""WITH qv AS (
         SELECT vec_id, {int8_quantize_sql('embedding')} AS v
         FROM embeddings WHERE vec_id >= {n_anchors}),
       seeds AS (
         SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
         FROM qv ORDER BY vec_id LIMIT {n_cells}),
       a1 AS (
         SELECT vec_id, v, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
         FROM (SELECT q.vec_id, q.v, s.cid,
                      {_kmeans_d2_sql('q.v', 's.c')} AS d2
               FROM qv q CROSS JOIN seeds s)),
       m1 AS (SELECT vec_id, v, cid FROM a1 WHERE rk = 1),
       cells AS (
         SELECT cid, i, sum(v[i]) AS s, count(*) AS n
         FROM m1 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
         GROUP BY cid, i),
       cent2 AS (
         SELECT cid, list((s - ((s % n + n) % n)) // n ORDER BY i) AS c
         FROM cells GROUP BY cid),
       a2 AS (
         SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
         FROM (SELECT q.vec_id, s.cid,
                      {_kmeans_d2_sql('q.v', 's.c')} AS d2
               FROM qv q CROSS JOIN cent2 s)),
       m2 AS (SELECT vec_id, cid FROM a2 WHERE rk = 1),
       anchors AS (
         SELECT vec_id AS aid, {int8_quantize_sql('embedding')} AS av
         FROM embeddings WHERE vec_id < {n_anchors}),
       probes AS (
         SELECT aid, cid FROM (
           SELECT a.aid, s.cid,
                  row_number() OVER (PARTITION BY a.aid
                                     ORDER BY {_kmeans_d2_sql('a.av', 's.c')},
                                              s.cid) AS pr
           FROM anchors a CROSS JOIN cent2 s) t
         WHERE pr <= {n_probes}),
       ivf AS (
         SELECT aid, nid FROM (
           SELECT p.aid, m.vec_id AS nid,
                  row_number() OVER (
                    PARTITION BY p.aid
                    ORDER BY floor(({cos_cv}) * 1000000.0) / 1000000.0 DESC,
                             m.vec_id) AS rk
           FROM probes p
           JOIN m2 m ON m.cid = p.cid
           JOIN embeddings cv ON cv.vec_id = m.vec_id
           JOIN embeddings av ON av.vec_id = p.aid) t
         WHERE rk <= {k}),
       exact AS (
         SELECT aid, nid FROM (
           SELECT a.aid, cv.vec_id AS nid,
                  row_number() OVER (
                    PARTITION BY a.aid
                    ORDER BY floor(({cos_cv}) * 1000000.0) / 1000000.0 DESC,
                             cv.vec_id) AS rk
           FROM anchors a
           JOIN embeddings av ON av.vec_id = a.aid
           CROSS JOIN embeddings cv
           WHERE cv.vec_id >= {n_anchors}) t
         WHERE rk <= {k}),
       ex_n AS (SELECT aid, count(*) AS n_exact FROM exact GROUP BY aid),
       ivf_n AS (SELECT aid, count(*) AS n_ivf FROM ivf GROUP BY aid),
       hits AS (
         SELECT exact.aid, count(*) AS n_hit
         FROM exact JOIN ivf ON exact.aid = ivf.aid AND exact.nid = ivf.nid
         GROUP BY exact.aid)
       SELECT a.aid AS query_id,
              CAST(coalesce(e.n_exact, 0) AS BIGINT) AS n_exact,
              CAST(coalesce(i.n_ivf, 0) AS BIGINT) AS n_ivf,
              CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
              CAST(coalesce(h.n_hit, 0) * 1000000
                   // coalesce(e.n_exact, 1) AS BIGINT) AS recall_ppm
       FROM anchors a
       LEFT JOIN ex_n e ON a.aid = e.aid
       LEFT JOIN ivf_n i ON a.aid = i.aid
       LEFT JOIN hits h ON a.aid = h.aid"""


@register(
    "q341_ivf_lloyd_recall",
    _q341_oracle(),
    "Lloyd-refined IVF with its recall acceptance in one differential "
    "(VERDICT r10 task #7): build_ivf_store_lloyd replaces the "
    "arbitrary lowest-id centroid seeds with rounds=2 deterministic "
    "INTEGER Lloyd refinement (the q158 machinery: int8-quantized "
    "vectors, exact integer L2, floor-mean updates, lowest-id "
    "tie-breaks — so the refinement is oracle-checkable, which "
    "floating-point k-means never is), and probe-time cell selection "
    "uses the SAME exact-integer d2 the assignment used (metric "
    "consistency).  8 out-of-corpus anchor queries (vec_id < 8; the "
    "corpus is vec_id >= 8 — the serving scenario, no self-match "
    "asymmetry) run BOTH arms: batched Lloyd-IVF top-3 "
    "(ivf_lloyd_search_batch — probe selection in-plan, q337's "
    "no-driver-round-trip shape) and exact brute-force top-3 by the "
    "identical floored cosine; per-anchor recall in exact ppm.  The "
    "oracle unrolls refinement, probe ranking, both arms, and the "
    "recall join — one hash gates the whole acceptance.  §8.13b "
    "measures what the refinement buys: cell-size skew before/after "
    "and the probe-wall effect of balanced cells",
)
def q341(spark: SparkSession, sf: str) -> DataFrame:
    # build + probe in one call; bench.py separates the phases via
    # STORE_SPLIT — see q332.  The parquet round trip is also the
    # rescan-audit shape: the probe plan reads the PERSISTED store,
    # never the Lloyd build lineage (which inherently scans the corpus
    # once per round — a one-time delivery cost, not a query cost).
    return _q341_probe(spark, sf, _q341_build(spark, sf))


def _q341_build(spark: SparkSession, sf: str) -> str:
    """q341's one-time Lloyd-IVF store build: refined assignment +
    integer centroids written sorted by cell."""
    import os

    from ..operators.similarity import build_ivf_store_lloyd

    e = load_table(spark, sf, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 8)
    root = _stream_store_root("q341", sf)
    assigned, cents = build_ivf_store_lloyd(corpus, n_cells=16, rounds=2)
    assigned.sort("cell").write.parquet(os.path.join(root, "assigned"))
    cents.write.parquet(os.path.join(root, "centroids"))
    return root


def _q341_probe(spark: SparkSession, sf: str, root: str) -> DataFrame:
    """q341's serving + acceptance pass against the persisted store."""
    import os

    from ..operators.similarity import ivf_lloyd_search_batch
    from ..operators import topk as K341
    from ..functions.vector import norm as _vnorm
    from ..functions.vector import dot as _vdot

    e = load_table(spark, sf, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 8)
    anchors = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    assigned = spark.read.parquet(os.path.join(root, "assigned"))
    cents = spark.read.parquet(os.path.join(root, "centroids"))
    ivf = ivf_lloyd_search_batch(
        assigned, cents, anchors, k=3, n_probes=4
    ).select("query_id", F.col("vec_id").alias("nid"))

    # exact arm: identical floored cosine, brute force over the corpus
    q = anchors.withColumn("_qnorm", _vnorm("qv"))
    quant = F.lit(float(10 ** 6))
    sim = _vdot(F.col("embedding"), F.col("qv")) / (
        _vnorm(F.col("embedding")) * F.col("_qnorm")
    )
    cand = corpus.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col("vec_id").alias("nid"),
        (F.floor(sim * quant) / quant).alias("sim"),
    )
    exact = K341.top_k_per_group_scalable(
        cand, ["query_id"], [F.desc("sim"), F.asc("nid")], 3
    ).select("query_id", "nid")

    ex_n = exact.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    ivf_n = ivf.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_ivf")
    )
    hits = (
        exact.join(ivf, ["query_id", "nid"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    return (
        anchors.select("query_id")
        .join(ex_n, "query_id", "left")
        .join(ivf_n, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_exact", F.lit(0)).cast("long").alias("n_exact"),
            F.coalesce("n_ivf", F.lit(0)).cast("long").alias("n_ivf"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.expr(
                "(coalesce(n_hit, 0) * 1000000) div coalesce(n_exact, 1)"  # ppm-ok: n_hit <= k = 3, product <= 3e6
            ).cast("long").alias("recall_ppm"),
        )
    )


# q341 composes a one-time store build with the serving/acceptance
# probe; registered late because the helpers live beside the query
STORE_SPLIT["q341_ivf_lloyd_recall"] = (_q341_build, _q341_probe)


def _q342_batch_sql() -> str:
    """q342's deterministic upsert batch over the v1 state: every
    'O'-partition row with k % 10 = 0 is UPDATED (cents + 111) and a
    sibling INSERT lands beside it under key k + 10^12 (collision-free
    at any realistic SF)."""
    base = _q340_state_sql(1)
    return (
        f"SELECT k, st, cents + 111 AS cents FROM ({base}) u "
        "WHERE st = 'O' AND k % 10 = 0 "
        "UNION ALL "
        f"SELECT k + 1000000000000 AS k, st, cents FROM ({base}) i "
        "WHERE st = 'O' AND k % 10 = 0"
    )


def _q342_state_sql(version: int) -> str:
    """v1 = q340's v1 (orders % 5 = 0, partitioned by st); v2 = v1
    MERGE (upsert) with the _q342_batch_sql batch on keys (k, st)."""
    base = _q340_state_sql(1)
    if version == 1:
        return base
    return (
        f"SELECT * FROM ({base}) s WHERE NOT (st = 'O' AND k % 10 = 0) "
        f"UNION ALL {_q342_batch_sql()}"
    )


@register(
    "q342_partitioned_snapshot_upsert",
    "WITH h1 AS (SELECT "
    + hex_hash64_sql("CAST(k AS VARCHAR) || '|' || st || '|' || CAST(cents AS VARCHAR)")
    + f""" AS h FROM ({_q342_state_sql(1)}) s1),
       h2 AS (SELECT """
    + hex_hash64_sql("CAST(k AS VARCHAR) || '|' || st || '|' || CAST(cents AS VARCHAR)")
    + f""" AS h FROM ({_q342_state_sql(2)}) s2)
       SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(bit_xor(h) AS BIGINT) AS xor_hash,
              CAST(sum(h % 1000000007) AS BIGINT) AS sum_mod,
              TRUE AS untouched_reused
       FROM h1
       UNION ALL
       SELECT 2, CAST(count(*) AS BIGINT), CAST(bit_xor(h) AS BIGINT),
              CAST(sum(h % 1000000007) AS BIGINT), TRUE
       FROM h2""",
    "q340's sibling for MERGE: upsert on the PARTITIONED snapshot "
    "table (keys (k, st) — the partition column is required among the "
    "match keys, else a key could change partitions and its old row "
    "would survive in an untouched directory).  The batch touches "
    "ONLY the 'O' partition (updates: cents + 111 on k % 10 = 0; "
    "inserts: the same rows re-keyed at k + 10^12), so commit_upsert "
    "rewrites the 'O' survivors + batch alone and the new manifest "
    "REUSES the 'F'/'P' directories verbatim — O(touched partitions) "
    "per merge.  The oracle fingerprints both versions AND the "
    "untouched_reused column computed FROM THE MANIFESTS, so merge "
    "semantics, snapshot isolation, and directory reuse are one "
    "driver hash (the q340 proof shape applied to upsert)",
)
def q342(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..snapshots import SnapshotTable

    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") % 5 == 0)
    state = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "hdt_q342_%s_%d"
        % (os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(spark, root, partition_by="st")
    t.commit_overwrite(state)

    touched = state.filter(
        (F.col("st") == "O") & (F.col("k") % 10 == 0)
    )
    batch = touched.select(
        "k", "st", (F.col("cents") + 111).alias("cents")
    ).unionByName(
        touched.select(
            (F.col("k") + F.lit(1000000000000).cast("long")).alias("k"),
            "st",
            "cents",
        )
    )
    t.commit_upsert(batch, keys=["k", "st"])

    p1 = t.manifest(1)["partitions"]
    p2 = t.manifest(2)["partitions"]
    reused = (
        all(p2.get(k) == dirs for k, dirs in p1.items() if k != "O")
        and p2.get("O") != p1.get("O")
    )

    h = T.hex_hash64(
        F.concat(
            F.col("k").cast("string"), F.lit("|"), F.col("st"),
            F.lit("|"), F.col("cents").cast("string"),
        )
    )

    def fp(v: int) -> DataFrame:
        return (
            t.read(version=v)
            .select(h.alias("h"))
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
                F.sum(F.col("h") % 1000000007).cast("long").alias("sum_mod"),
            )
            .select(
                F.lit(v).cast("int").alias("version"),
                "*",
                F.lit(bool(reused)).alias("untouched_reused"),
            )
        )

    return fp(1).unionByName(fp(2))


@register(
    "q343_takedown_erasure",
    "WITH s AS (SELECT "
    + hex_hash64_sql("CAST(k AS VARCHAR) || '|' || st || '|' || CAST(cents AS VARCHAR)")
    + f""" AS h FROM ({_q340_state_sql(1)}) b WHERE NOT (st = 'F'))
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(bit_xor(h) AS BIGINT) AS xor_hash,
              CAST(sum(h % 1000000007) AS BIGINT) AS sum_mod,
              TRUE AS old_leaf_erased,
              TRUE AS untouched_leaves_intact,
              TRUE AS v1_beyond_horizon
       FROM s""",
    "the right-to-be-forgotten TAKEDOWN composed end to end on the "
    "partitioned snapshot store — the two-step contract q339 states, "
    "now executed and PHYSICALLY verified: v1 commits the orders "
    "subset partitioned by o_orderstatus; commit_delete(st = 'F') "
    "logically erases the whole 'F' partition (v2 reuses the O/P "
    "directories, writes NOTHING); vacuum(retain_last=1) then makes "
    "the erasure physical at LEAF granularity — v1's 'F' directory is "
    "removed from disk while the O/P leaves INSIDE THE SAME commit "
    "directory survive (they are still referenced by v2), and time "
    "travel to v1 fails loudly at the retention horizon.  All three "
    "facts are computed from the filesystem/manifests and returned as "
    "columns beside the surviving state's fingerprint, so a broken "
    "leaf-GC, a clobbered reused directory, or a readable "
    "past-horizon version each flip a boolean and fail the driver "
    "hash.  This is the erasure path a 100 TB corpus store runs on "
    "every legal request; at scale the delete costs O(touched "
    "partitions) and the vacuum O(expired leaves)",
)
def q343(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..snapshots import SnapshotTable

    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") % 5 == 0)
    state = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "hdt_q343_%s_%d"
        % (os.path.basename(os.path.normpath(sf)), os.getpid()),
    )
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(spark, root, partition_by="st")
    t.commit_overwrite(state)
    p1 = t.manifest(1)["partitions"]
    t.commit_delete("st = 'F'")
    p2 = t.manifest(2)["partitions"]

    t.vacuum(retain_last=1)

    f_leaves = p1.get("F", [])
    old_leaf_erased = bool(f_leaves) and not any(
        os.path.exists(d) for d in f_leaves
    )
    untouched_intact = all(
        os.path.exists(d)
        for key, dirs in p2.items()
        for d in dirs
    ) and all(p2.get(k) == dirs for k, dirs in p1.items() if k != "F")
    try:
        t.read(version=1)
        v1_beyond_horizon = False
    except ValueError:
        v1_beyond_horizon = True

    h = T.hex_hash64(
        F.concat(
            F.col("k").cast("string"), F.lit("|"), F.col("st"),
            F.lit("|"), F.col("cents").cast("string"),
        )
    )
    return (
        t.read()
        .select(h.alias("h"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
            F.sum(F.col("h") % 1000000007).cast("long").alias("sum_mod"),
        )
        .select(
            "*",
            F.lit(bool(old_leaf_erased)).alias("old_leaf_erased"),
            F.lit(bool(untouched_intact)).alias("untouched_leaves_intact"),
            F.lit(bool(v1_beyond_horizon)).alias("v1_beyond_horizon"),
        )
    )


def _q345_state_sql(version: int) -> str:
    """Relational restatement of snapshot version N of the q345
    TWO-LEVEL partitioned table (VERDICT r11 task #3): v1 = orders
    with o_orderkey % 5 = 0 keyed (k, st, b, cents) where b = k % 3;
    v2 = v1 DELETE WHERE st = 'F' AND b = 1 AND k % 2 = 0 (touches
    ONLY the F/1 leaf, partially)."""
    base = (
        "SELECT o_orderkey AS k, o_orderstatus AS st,"
        " CAST(o_orderkey % 3 AS INTEGER) AS b,"
        " CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents"
        " FROM orders WHERE o_orderkey % 5 = 0"
    )
    if version == 1:
        return base
    return (
        f"SELECT * FROM ({base}) v1 "
        "WHERE NOT (st = 'F' AND b = 1 AND k % 2 = 0)"
    )


@register(
    "q345_two_level_snapshot_delete",
    "WITH h1 AS (SELECT "
    + hex_hash64_sql(
        "CAST(k AS VARCHAR) || '|' || st || '|' || CAST(b AS VARCHAR)"
        " || '|' || CAST(cents AS VARCHAR)"
    )
    + f""" AS h FROM ({_q345_state_sql(1)}) s1),
       h2 AS (SELECT """
    + hex_hash64_sql(
        "CAST(k AS VARCHAR) || '|' || st || '|' || CAST(b AS VARCHAR)"
        " || '|' || CAST(cents AS VARCHAR)"
    )
    + f""" AS h FROM ({_q345_state_sql(2)}) s2)
       SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(bit_xor(h) AS BIGINT) AS xor_hash,
              CAST(sum(h % 1000000007) AS BIGINT) AS sum_mod,
              TRUE AS sibling_leaf_reused, TRUE AS other_subtree_reused,
              TRUE AS touched_leaf_rewritten
       FROM h1
       UNION ALL
       SELECT 2, CAST(count(*) AS BIGINT), CAST(bit_xor(h) AS BIGINT),
              CAST(sum(h % 1000000007) AS BIGINT), TRUE, TRUE, TRUE
       FROM h2""",
    "q340's directory-reuse gate on a TWO-LEVEL partitioned snapshot "
    "table (VERDICT r11 task #3) — the date x source layout a 100 TB "
    "corpus store actually uses, here o_orderstatus x (k % 3) = 9 "
    "leaves nested _pt0=<st>/_pt1=<b>.  The delete predicate matches "
    "rows in ONLY the F/1 leaf, so commit_delete rewrites that single "
    "leaf and the manifest proof is taken at BOTH granularities: "
    "sibling_leaf_reused (F/0 and F/2 — same first-level value as the "
    "touched leaf — carry over verbatim: level-2 scoping works), "
    "other_subtree_reused (every O/* and P/* leaf carries over: "
    "level-1 subtree reuse), and touched_leaf_rewritten (F/1's "
    "directory list changed).  All three booleans are computed FROM "
    "THE MANIFESTS and sit in the driver hash beside both versions' "
    "fingerprints; the oracle restates the two states relationally "
    "and pins the booleans TRUE — a takedown that over-rewrites, "
    "under-rewrites, or clobbers a reused subtree flips a column and "
    "fails the differential.  Nested leaf vacuum + reopen adoption "
    "are pinned by tests/test_snapshots.py two_level cases",
)
def q345(spark: SparkSession, sf: str) -> DataFrame:
    from ..snapshots import SnapshotTable

    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") % 5 == 0)
    state = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        (F.col("o_orderkey") % 3).cast("int").alias("b"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    root = _stream_store_root("q345", sf)
    t = SnapshotTable(spark, root, partition_by=["st", "b"])
    t.commit_overwrite(state)
    t.commit_delete("st = 'F' AND b = 1 AND k % 2 = 0")

    p1 = t.manifest(1)["partitions"]
    p2 = t.manifest(2)["partitions"]
    sibling = all(
        p2.get(k) == p1.get(k) for k in ("F/0", "F/2")
    )
    other = all(
        p2.get(k) == dirs
        for k, dirs in p1.items()
        if not k.startswith("F/")
    )
    touched = p2.get("F/1") != p1.get("F/1")

    h = T.hex_hash64(
        F.concat(
            F.col("k").cast("string"), F.lit("|"), F.col("st"),
            F.lit("|"), F.col("b").cast("string"),
            F.lit("|"), F.col("cents").cast("string"),
        )
    )

    def fp(v: int) -> DataFrame:
        return (
            t.read(version=v)
            .select(h.alias("h"))
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
                F.sum(F.col("h") % 1000000007).cast("long").alias("sum_mod"),
            )
            .select(
                F.lit(v).cast("int").alias("version"),
                "*",
                F.lit(bool(sibling)).alias("sibling_leaf_reused"),
                F.lit(bool(other)).alias("other_subtree_reused"),
                F.lit(bool(touched)).alias("touched_leaf_rewritten"),
            )
        )

    return fp(1).unionByName(fp(2))


def _q344_oracle(
    n_cells: int = 16, n_anchors: int = 8, n_probes: int = 6, k: int = 3
) -> str:
    """The dedup-before-indexing capstone, fully unrolled (VERDICT r11
    task #1 / SCALE.md §8.13b composed): a duplicate-saturated corpus
    (every corpus vector contributes one replica of one of two
    template vectors — 50% duplicate mass concentrated in <= 2 cells),
    exact first-wins dedup on the int8-quantized signature, seed-IVF
    builds over BOTH corpora for the worst-4-cell probed-mass
    comparison, and q341-style per-anchor recall served from the
    DEDUPED store.  Raw-cosine cell assignment / probe selection
    mirror q73/q335 (double /,*,sqrt are bit-portable); candidate
    ranking is floored cosine."""
    from ..functions.vector import int8_quantize_sql

    cos = (
        "(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))))"
    )
    ec = cos.format(a="e.v", b="c.c")
    cq = cos.format(a="c.c", b="a.qv")
    aq = cos.format(a="m.v", b="a.qv")
    return f"""WITH corpus0 AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         FROM embeddings WHERE vec_id >= {n_anchors}),
       tpl AS (SELECT vec_id - {n_anchors} AS tid, v
               FROM corpus0 WHERE vec_id IN ({n_anchors}, {n_anchors + 1})),
       dup AS (SELECT vec_id, v FROM corpus0
               UNION ALL
               SELECT c.vec_id + 1000000000 AS vec_id, t.v
               FROM corpus0 c JOIN tpl t ON t.tid = c.vec_id % 2),
       sig AS (SELECT vec_id, v, {int8_quantize_sql('v')} AS s FROM dup),
       keep AS (SELECT min(vec_id) AS vec_id FROM sig GROUP BY s),
       dd AS (SELECT d.vec_id, d.v
              FROM dup d JOIN keep kp ON d.vec_id = kp.vec_id),
       cents_dup AS (SELECT vec_id AS cell, v AS c FROM dup
                     ORDER BY vec_id LIMIT {n_cells}),
       a_dup AS (SELECT vec_id, cell FROM (
           SELECT e.vec_id, c.cell,
                  row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY {ec} DESC, c.cell ASC) AS rk
           FROM dup e CROSS JOIN cents_dup c) t WHERE rk = 1),
       m_dup AS (SELECT cell, count(*) AS nn FROM a_dup GROUP BY cell),
       w4_dup AS (SELECT sum(nn) AS w4,
                         (SELECT sum(nn) FROM m_dup) AS tot
                  FROM (SELECT nn FROM m_dup
                        ORDER BY nn DESC, cell ASC LIMIT 4) z),
       cents_dd AS (SELECT vec_id AS cell, v AS c FROM dd
                    ORDER BY vec_id LIMIT {n_cells}),
       a_dd AS (SELECT vec_id, v, cell FROM (
           SELECT e.vec_id, e.v, c.cell,
                  row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY {ec} DESC, c.cell ASC) AS rk
           FROM dd e CROSS JOIN cents_dd c) t WHERE rk = 1),
       m_dd AS (SELECT cell, count(*) AS nn FROM a_dd GROUP BY cell),
       w4_dd AS (SELECT sum(nn) AS w4,
                        (SELECT sum(nn) FROM m_dd) AS tot
                 FROM (SELECT nn FROM m_dd
                       ORDER BY nn DESC, cell ASC LIMIT 4) z),
       anchors AS (
         SELECT vec_id AS aid, CAST(embedding AS DOUBLE[]) AS qv
         FROM embeddings WHERE vec_id < {n_anchors}),
       probes AS (
         SELECT aid, cell FROM (
           SELECT a.aid, c.cell,
                  row_number() OVER (PARTITION BY a.aid
                                     ORDER BY {cq} DESC, c.cell ASC) AS pr
           FROM anchors a CROSS JOIN cents_dd c) t
         WHERE pr <= {n_probes}),
       ivf AS (
         SELECT aid, nid FROM (
           SELECT p.aid, m.vec_id AS nid,
                  row_number() OVER (
                    PARTITION BY p.aid
                    ORDER BY floor(({aq}) * 1000000.0) / 1000000.0 DESC,
                             m.vec_id) AS rk
           FROM probes p
           JOIN a_dd m ON m.cell = p.cell
           JOIN anchors a ON a.aid = p.aid) t
         WHERE rk <= {k}),
       exact AS (
         SELECT aid, nid FROM (
           SELECT a.aid, m.vec_id AS nid,
                  row_number() OVER (
                    PARTITION BY a.aid
                    ORDER BY floor(({aq}) * 1000000.0) / 1000000.0 DESC,
                             m.vec_id) AS rk
           FROM anchors a CROSS JOIN dd m) t
         WHERE rk <= {k}),
       ex_n AS (SELECT aid, count(*) AS n_exact FROM exact GROUP BY aid),
       ivf_n AS (SELECT aid, count(*) AS n_ivf FROM ivf GROUP BY aid),
       hits AS (
         SELECT exact.aid, count(*) AS n_hit
         FROM exact JOIN ivf ON exact.aid = ivf.aid AND exact.nid = ivf.nid
         GROUP BY exact.aid)
       SELECT a.aid AS query_id,
              CAST(coalesce(e.n_exact, 0) AS BIGINT) AS n_exact,
              CAST(coalesce(i.n_ivf, 0) AS BIGINT) AS n_ivf,
              CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
              CAST(coalesce(h.n_hit, 0) * 1000000
                   // coalesce(e.n_exact, 1) AS BIGINT) AS recall_ppm,
              CAST(wd.w4 * 1000000 // wd.tot AS BIGINT) AS worst4_dup_ppm,
              CAST(we.w4 * 1000000 // we.tot AS BIGINT) AS worst4_dedup_ppm,
              CAST(wd.tot AS BIGINT) AS n_dup,
              CAST(we.tot AS BIGINT) AS n_dedup,
              (we.w4 * 1000000 // we.tot) < (wd.w4 * 1000000 // wd.tot)
                AS mass_drop_ok
       FROM anchors a
       LEFT JOIN ex_n e ON a.aid = e.aid
       LEFT JOIN ivf_n i ON a.aid = i.aid
       LEFT JOIN hits h ON a.aid = h.aid
       CROSS JOIN w4_dup wd CROSS JOIN w4_dd we"""


@register(
    "q344_dedup_ivf_capstone",
    _q344_oracle(),
    "SCALE.md §8.13b's prescription COMPOSED and driver-gated (VERDICT "
    "r11 task #1): the round-11 harness finding was that IVF hot cells "
    "come from DUPLICATE MASS, not seeding — Lloyd refinement rounds "
    "the edges, dedup-before-indexing fixes the cell.  This entry runs "
    "the full pipeline the lesson prescribes: (1) a duplicate-"
    "saturated corpus — every corpus vector contributes one exact "
    "replica of one of two template vectors, so 50% of the mass lands "
    "in <= 2 cells under ANY quantizer, the §8.9/§8.13b embdup shape "
    "restated relationally; (2) exact first-wins dedup on the int8-"
    "quantized signature (D1/D4's groupBy-min + semi-join shape on "
    "vector content; the q100/q173 near-dup machinery composes the "
    "same way for jittered replicas); (3) seed-IVF builds over BOTH "
    "corpora; (4) q341-style batch serving from the DEDUPED store.  "
    "The driver hash gates BOTH acceptance surfaces at once: per-"
    "anchor recall@3 in exact ppm (IVF arm vs exact arm by the "
    "identical floored cosine over the deduped corpus), AND the "
    "worst-4-cell probed-mass drop (worst4_dup_ppm ~64%, the per-"
    "query scan fraction a hot-cell store pays, vs worst4_dedup_ppm "
    "~30% — mass_drop_ok states the §8.13b table's conclusion as a "
    "gated boolean).  Store composition follows q332/q341: the build "
    "phase persists the deduped cell-sorted store plus the one-row "
    "mass-stats table, the probe phase reads ONLY persisted parquet "
    "(no build lineage in the audited plan; bench store_split times "
    "the phases separately).  At 100 TB worst-4-cell mass IS the "
    "worst-case per-query scan fraction — the engine now enforces its "
    "own lesson instead of just recording it",
)
def q344(spark: SparkSession, sf: str) -> DataFrame:
    return _q344_probe(spark, sf, _q344_build(spark, sf))


def _q344_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """The duplicate-saturated corpus: corpus0 plus one replica of
    template (vec_id 8 or 9, chosen by vec_id % 2) per corpus row."""
    e = load_table(spark, sf, "embeddings")
    corpus0 = e.filter(F.col("vec_id") >= 8).select("vec_id", "embedding")
    tpl = corpus0.filter(F.col("vec_id").isin(8, 9)).select(
        (F.col("vec_id") - 8).alias("tid"),
        F.col("embedding").alias("temb"),
    )
    replicas = (
        corpus0.select(
            (F.col("vec_id") % 2).alias("tid"),
            (F.col("vec_id") + 1_000_000_000).alias("vec_id"),
        )
        .join(F.broadcast(tpl), "tid")
        .select("vec_id", F.col("temb").alias("embedding"))
    )
    return corpus0.unionByName(replicas)


def _q344_build(spark: SparkSession, sf: str) -> str:
    """q344's one-time delivery cost: dedup prepass -> deduped IVF
    store (cell-sorted, stored norms) + the one-row mass-stats table
    comparing worst-4-cell probed mass against the undeduped build."""
    import os

    from ..functions.vector import int8_quantize
    from ..operators.similarity import build_ivf_cells, build_ivf_store

    root = _stream_store_root("q344", sf)
    # tiny frames (<= ~4k rows x dim 64): the checkpoint bounds the
    # union/join lineage across the sig pass + two builds, the k-row
    # scalar case of the §8.6 rule, not the big-frame trap
    dup = _q344_corpus(spark, sf).localCheckpoint()

    # exact first-wins dedup on the quantized signature (D1/D4 shape)
    keep = (
        dup.withColumn("_sig", int8_quantize("embedding"))
        .groupBy("_sig")
        .agg(F.min("vec_id").alias("vec_id"))
        .select("vec_id")
    )
    dd = dup.join(keep, "vec_id", "semi").localCheckpoint()

    def worst4(assigned) -> DataFrame:
        m = assigned.groupBy("cell").agg(F.count("*").alias("nn"))
        top4 = (
            m.orderBy(F.desc("nn"), F.asc("cell"))
            .limit(4)
            .agg(F.sum("nn").alias("w4"))
        )
        return top4.crossJoin(m.agg(F.sum("nn").alias("tot")))

    a_dup, _ = build_ivf_cells(dup, n_cells=16)
    assigned_dd, cents_dd = build_ivf_store(dd, n_cells=16)

    stats = (
        worst4(a_dup)
        .select(
            F.expr("CAST(w4 AS DECIMAL(38,0)) * 1000000 div tot")  # div-ok: mass share, quotient <= 1e6
            .cast("long")
            .alias("worst4_dup_ppm"),
            F.col("tot").cast("long").alias("n_dup"),
        )
        .crossJoin(
            worst4(assigned_dd).select(
                F.expr("CAST(w4 AS DECIMAL(38,0)) * 1000000 div tot")  # div-ok: mass share, quotient <= 1e6
                .cast("long")
                .alias("worst4_dedup_ppm"),
                F.col("tot").cast("long").alias("n_dedup"),
            )
        )
        .withColumn(
            "mass_drop_ok",
            F.col("worst4_dedup_ppm") < F.col("worst4_dup_ppm"),
        )
    )
    assigned_dd.sort("cell").write.parquet(os.path.join(root, "assigned"))
    cents_dd.write.parquet(os.path.join(root, "centroids"))
    stats.coalesce(1).write.parquet(os.path.join(root, "stats"))
    return root


def _q344_probe(spark: SparkSession, sf: str, root: str) -> DataFrame:
    """q344's serving + acceptance pass: batch IVF over the persisted
    DEDUPED store vs the exact arm over the same store's vectors, with
    the persisted mass stats joined beside every anchor row."""
    import os

    from ..functions.vector import dot as _vdot
    from ..functions.vector import norm as _vnorm
    from ..operators import topk as K344
    from ..operators.similarity import ivf_search_batch

    e = load_table(spark, sf, "embeddings")
    anchors = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    sa = spark.read.parquet(os.path.join(root, "assigned"))
    sc = spark.read.parquet(os.path.join(root, "centroids"))
    stats = spark.read.parquet(os.path.join(root, "stats"))

    # 6/16 probes: the honest seed-build serving point — on a
    # near-uniform corpus the lowest-id seeds scatter true neighbors
    # across cells, so the seed store needs more probes than q341's
    # Lloyd store for a non-vacuous recall floor (every anchor >= 1/3
    # at all SFs, none saturated); §8.13b's composed claim is about
    # hot-cell MASS, which dedup fixes, not seed recall, which it
    # cannot
    ivf = ivf_search_batch(sa, sc, anchors, k=3, n_probes=6).select(
        "query_id", F.col("vec_id").alias("nid")
    )

    # exact arm: brute force over the SAME stored vectors (the deduped
    # corpus IS the assigned table), identical floored cosine with the
    # stored norms
    q = anchors.withColumn("_qnorm", _vnorm("qv"))
    quant = F.lit(float(10 ** 6))
    sim = _vdot(F.col("embedding"), F.col("qv")) / (
        F.col("_vnorm") * F.col("_qnorm")
    )
    cand = sa.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col("vec_id").alias("nid"),
        (F.floor(sim * quant) / quant).alias("sim"),
    )
    exact = K344.top_k_per_group_scalable(
        cand, ["query_id"], [F.desc("sim"), F.asc("nid")], 3
    ).select("query_id", "nid")

    ex_n = exact.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    ivf_n = ivf.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_ivf")
    )
    hits = (
        exact.join(ivf, ["query_id", "nid"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    return (
        anchors.select("query_id")
        .join(ex_n, "query_id", "left")
        .join(ivf_n, "query_id", "left")
        .join(hits, "query_id", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            F.coalesce("n_exact", F.lit(0)).cast("long").alias("n_exact"),
            F.coalesce("n_ivf", F.lit(0)).cast("long").alias("n_ivf"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.expr(
                "(coalesce(n_hit, 0) * 1000000) div coalesce(n_exact, 1)"  # ppm-ok: n_hit <= k = 3, product <= 3e6
            ).cast("long").alias("recall_ppm"),
            "worst4_dup_ppm",
            "worst4_dedup_ppm",
            "n_dup",
            "n_dedup",
            "mass_drop_ok",
        )
    )


STORE_SPLIT["q344_dedup_ivf_capstone"] = (_q344_build, _q344_probe)


def _q346_state_sql() -> str:
    """Relational restatement of q346's FINAL state (version 3): the
    q340 base table (orders, o_orderkey % 5 = 0, partitioned by st)
    with BOTH racing upserts applied — the winner's 'O'-partition
    update (k % 10 = 0 -> cents + 111) and the rebased loser's
    'F'-partition update (k % 10 = 5 -> cents + 222)."""
    return (
        "SELECT k, st, CASE"
        " WHEN st = 'O' AND k % 10 = 0 THEN cents + 111"
        " WHEN st = 'F' AND k % 10 = 5 THEN cents + 222"
        " ELSE cents END AS cents"
        f" FROM ({_q340_state_sql(1)}) b"
    )


@register(
    "q346_rebase_concurrency",
    "WITH fin AS (" + _q346_state_sql() + "), h AS (SELECT "
    + hex_hash64_sql(
        "CAST(k AS VARCHAR) || '|' || st || '|' || CAST(cents AS VARCHAR)"
    )
    + """ AS h FROM fin)
       SELECT TRUE AS rebase_committed,
              TRUE AS loser_single_rewrite,
              TRUE AS winner_leaf_kept,
              TRUE AS untouched_leaf_reused,
              TRUE AS overlap_conflicts,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(bit_xor(h) AS BIGINT) AS xor_hash,
              CAST(sum(h % 1000000007) AS BIGINT) AS sum_mod
       FROM h""",
    "the disjoint-partition commit REBASE driver-gated (VERDICT r11 "
    "wrong #3 closed): q269 gates the conflict-and-retry protocol on "
    "an unpartitioned table, where the loser's retry re-runs its "
    "whole rewrite; at 100 TB with frequent takedowns that retry is a "
    "full partition rewrite for nothing when the winner touched "
    "DISJOINT partitions.  This stages the exact race two ingest "
    "jobs run: the loser's scoped rewrite ('F'-partition upsert) is "
    "FULLY WRITTEN before the winner publishes its own "
    "('O'-partition upsert) at the same version; the loser's CAS "
    "then loses and _publish_scoped rebases — Delta's conflict "
    "check: winner-touched manifest keys (directory lists changed "
    "since the loser's base) are disjoint from the loser's, so the "
    "loser grafts its already-written 'F' leaf onto the winner's "
    "manifest and commits v3 with ZERO new data written.  Gated "
    "facts, all computed from manifests/filesystem: the rebase "
    "committed as v3; exactly TWO upsert commit directories exist "
    "(one rewrite per committer — a re-run loser would have left an "
    "orphaned third); v3 keeps the winner's rewritten 'O' leaf "
    "verbatim; the untouched 'P' partition's v1 directory flows "
    "through both commits; and a staged OVERLAPPING upsert (touching "
    "the winner-rewritten 'O' partition from the same stale base) "
    "still raises SnapshotConflict — correctness first where the "
    "rewrite is actually stale.  The oracle restates the final "
    "merged state relationally and pins every boolean TRUE — a lost "
    "update, a clobbered winner leaf, a double rewrite, or a "
    "rebase-through-overlap each flips a column or the fingerprint",
)
def q346(spark: SparkSession, sf: str) -> DataFrame:
    import os

    from ..snapshots import SnapshotConflict, SnapshotTable

    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") % 5 == 0)
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    ).localCheckpoint()

    root = _stream_store_root("q346", sf)
    t = SnapshotTable(spark, root, partition_by="st")
    t.commit_overwrite(base)  # v1
    m1 = t.manifest(1)["partitions"]

    # stage the race exactly as two jobs run commit_upsert: the LOSER
    # computes its target version and FINISHES its scoped rewrite
    # ('F' survivors + batch) before the winner publishes
    loser_batch = base.filter(
        (F.col("st") == "F") & (F.col("k") % 10 == 5)
    ).withColumn("cents", F.col("cents") + 222)
    lv = t.current_version() + 1  # 2
    l_schema = t._evolve_schema(t._table_schema(lv - 1), loser_batch.schema)
    l_touched = t._touched_partitions(loser_batch)
    l_survivors = (
        t.read()
        .filter(t._touched_filter(l_touched))
        .join(loser_batch.select("k", "st"), ["k", "st"], "left_anti")
    )
    l_merged = l_survivors.unionByName(loser_batch).localCheckpoint()
    l_map = t._write_data_partitioned(l_merged, lv, "upsert")

    # winner publishes v2 first (upsert touching only 'O')
    winner_batch = base.filter(
        (F.col("st") == "O") & (F.col("k") % 10 == 0)
    ).withColumn("cents", F.col("cents") + 111)
    t.commit_upsert(winner_batch, keys=["k", "st"])  # v2
    m2 = t.manifest(2)["partitions"]

    # loser's CAS loses at v2 and rebases onto the winner -> v3 with
    # zero new data written
    v3 = t._publish_scoped(
        lv, "upsert", l_schema, l_map,
        {t._key_of(tp) for tp in l_touched}, loser_batch.schema,
        blind=False,
    )
    m3 = t.manifest(3)["partitions"]

    rebase_committed = v3 == 3
    data_root = os.path.join(root, "data")
    loser_single_rewrite = (
        sum(1 for d in os.listdir(data_root) if "-upsert-" in d) == 2
    )
    winner_leaf_kept = m3.get("O") == m2.get("O")
    untouched_leaf_reused = (
        m3.get("P") == m1.get("P") and m2.get("P") == m1.get("P")
    )

    # an OVERLAPPING stale rewrite must still conflict: stage a second
    # loser whose batch touches the winner-rewritten 'O' partition
    # from the same stale base (version 1)
    o_batch = (
        base.filter((F.col("st") == "O") & (F.col("k") % 10 == 0))
        .limit(5)
        .withColumn("cents", F.col("cents") + 999)
    )
    o_touched = t._touched_partitions(o_batch)
    o_map = t._write_data_partitioned(o_batch, 2, "upsert")
    overlap_conflicts = False
    try:
        t._publish_scoped(
            2, "upsert", l_schema, o_map,
            {t._key_of(tp) for tp in o_touched}, o_batch.schema,
            blind=False,
        )
    except SnapshotConflict:
        overlap_conflicts = True

    h = T.hex_hash64(
        F.concat(
            F.col("k").cast("string"), F.lit("|"), F.col("st"),
            F.lit("|"), F.col("cents").cast("string"),
        )
    )
    return (
        t.read(version=3)
        .select(h.alias("h"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
            F.sum(F.col("h") % 1000000007).cast("long").alias("sum_mod"),
        )
        .select(
            F.lit(bool(rebase_committed)).alias("rebase_committed"),
            F.lit(bool(loser_single_rewrite)).alias("loser_single_rewrite"),
            F.lit(bool(winner_leaf_kept)).alias("winner_leaf_kept"),
            F.lit(bool(untouched_leaf_reused)).alias(
                "untouched_leaf_reused"
            ),
            F.lit(bool(overlap_conflicts)).alias("overlap_conflicts"),
            "n_rows",
            "xor_hash",
            "sum_mod",
        )
    )
