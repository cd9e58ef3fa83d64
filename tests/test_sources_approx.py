"""Tests: JSONL source quarantine split + approximate aggregates
(sketches are the scale path where exact distinct/percentile shuffles
would dominate; correctness is tolerance-bounded, so they are tested
here rather than hash-gated against the DuckDB oracle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from health_data_transformation_spark.sources.json import read_jsonl, write_jsonl


def test_read_jsonl_splits_corrupt_lines(spark, tmp_path):
    path = str(tmp_path / "in.jsonl")
    lines = [
        '{"id": 1, "name": "alpha"}',
        '{"id": 2, "name": "beta"}',
        'not json at all',
        '{"id": "not-a-number", "name": "gamma"}',
    ]
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    valid, invalid = read_jsonl(spark, path, schema)
    assert sorted(r["id"] for r in valid.collect()) == [1, 2]
    bad = [r["raw_line"] for r in invalid.collect()]
    assert len(bad) == 2 and "not json at all" in bad


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("doc-"), F.col("id")).alias("name")
    )
    out = str(tmp_path / "out")
    write_jsonl(df, out)
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    valid, invalid = read_jsonl(spark, out, schema)
    assert valid.count() == 100 and invalid.count() == 0


def test_approx_count_distinct_within_tolerance(spark):
    from health_data_transformation_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    exact = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    approx = li.select(
        F.approx_count_distinct("l_orderkey", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05


def test_approx_percentile_within_tolerance(spark):
    from health_data_transformation_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    exact = li.select(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p")
    ).collect()[0]["p"]
    approx = li.select(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("p")
    ).collect()[0]["p"]
    assert abs(approx - exact) / exact < 0.01


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from health_data_transformation_spark.sources.formats import (
        read_columnar,
        write_columnar,
    )
    from health_data_transformation_spark.sources.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "orders_orc")
    write_columnar(orders, path, fmt="orc", partition_by=["o_orderpriority"])
    back = read_columnar(spark, path, fmt="orc")

    assert back.count() == orders.count()
    # partition column survives; value multiset is unchanged
    a = orders.groupBy("o_orderpriority").count().collect()
    b = back.groupBy("o_orderpriority").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # range predicate reaches the ORC scan
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    filtered = back.filter(back.o_totalprice > 100000.0)
    plan = filtered._jdf.queryExecution().explainString(mode)
    assert "GreaterThan(o_totalprice" in plan
