"""Tests for the streaming ingest path (SURVEY.md §2.5 / §7.1 step 6)
and the skew-mitigation operators (100 TB design note in operators/skew.py).
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from health_data_transformation_spark.operators.skew import (
    salted_aggregate,
    salted_join,
    with_salt,
)
from health_data_transformation_spark.streaming.ingest import stream_load_hhs
from tests.conftest import HHS_FILE_1, HHS_FILE_2, write_lines


def test_stream_load_hhs_incremental(spark, warehouse, tmp_path):
    """Files landing between runs are each processed exactly once; the
    resulting warehouse state equals two batch loads (load_hhs.py per-file
    CLI semantics, README.md:26-46)."""
    landing = str(tmp_path / "landing")
    checkpoint = str(tmp_path / "ckpt")
    os.makedirs(landing)

    write_lines(os.path.join(landing, "week1.csv"), HHS_FILE_1)
    reports1 = stream_load_hhs(spark, landing, warehouse, checkpoint)
    assert sum(r.input_rows for r in reports1) == 6
    beds = warehouse.read("hospital_bed_information")
    assert beds.count() == 4  # H4 quarantined, in-batch dup collapsed

    # second run with a new file: only the new file is processed
    write_lines(os.path.join(landing, "week2.csv"), HHS_FILE_2)
    reports2 = stream_load_hhs(spark, landing, warehouse, checkpoint)
    assert sum(r.input_rows for r in reports2) == 2
    # H1/2022-09-23 re-delivered -> first-wins dedup drops it; H5 is new
    assert sum(r.table_rows_added["hospital_bed_information"] for r in reports2) == 1
    assert warehouse.read("hospital_bed_information").count() == 5

    # third run with nothing new: no micro-batch fires
    reports3 = stream_load_hhs(spark, landing, warehouse, checkpoint)
    assert sum(r.input_rows for r in reports3) == 0
    assert warehouse.read("hospital_bed_information").count() == 5


def test_stream_restart_after_lost_checkpoint_is_idempotent(
    spark, warehouse, tmp_path
):
    """Losing the checkpoint replays all files, but the D4 idempotent
    anti-join append keeps the warehouse state identical."""
    landing = str(tmp_path / "landing")
    checkpoint = str(tmp_path / "ckpt")
    os.makedirs(landing)
    write_lines(os.path.join(landing, "week1.csv"), HHS_FILE_1)

    stream_load_hhs(spark, landing, warehouse, checkpoint)
    before = sorted(
        warehouse.read("hospital_bed_information")
        .select("hospital_fk", "collection_week")
        .collect()
    )

    shutil.rmtree(checkpoint)
    reports = stream_load_hhs(spark, landing, warehouse, checkpoint)
    assert sum(r.input_rows for r in reports) == 6  # replayed
    after = sorted(
        warehouse.read("hospital_bed_information")
        .select("hospital_fk", "collection_week")
        .collect()
    )
    assert before == after


def test_with_salt_deterministic_and_bounded(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    a = with_salt(df, 8).select("_salt").distinct().collect()
    salts = sorted(r["_salt"] for r in a)
    assert all(0 <= s < 8 for s in salts)
    # deterministic: same rows -> same salt on recompute
    x = with_salt(df, 8).groupBy("_salt").count().orderBy("_salt").collect()
    y = with_salt(df, 8).groupBy("_salt").count().orderBy("_salt").collect()
    assert x == y


def test_salted_aggregate_matches_direct_groupby(spark):
    df = spark.range(10_000).select(
        # skewed: ~90% of rows share key 0
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.lit(1)).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    direct = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"])
        for r in salted_aggregate(df, ["k"], {"s": F.sum("v")}, buckets=16).collect()
    }
    assert direct == salted


def test_salted_join_equals_plain_join(spark):
    big = spark.range(5000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(5).select(
        F.col("id").alias("k"), F.concat(F.lit("name-"), F.col("id")).alias("name")
    )
    plain = set(
        tuple(r) for r in big.join(dim, "k").select("k", "v", "name").collect()
    )
    salted = set(
        tuple(r)
        for r in salted_join(big, dim, "k", hot_keys=[0, 1], buckets=4)
        .select("k", "v", "name")
        .collect()
    )
    assert plain == salted


def test_stream_load_quality_filename_date(spark, warehouse, tmp_path):
    """Quality files land as quality-YYYY-MM-DD.csv; the snapshot date
    comes from the filename and first-wins dedup applies per
    (facility_id, data_date) across runs."""
    import datetime as dt

    from health_data_transformation_spark.streaming.ingest import (
        stream_load_quality,
    )
    from tests.conftest import CMS_FILE_1, write_lines

    landing = str(tmp_path / "landing")
    checkpoint = str(tmp_path / "ckpt")
    os.makedirs(landing)
    write_lines(os.path.join(landing, "quality-2023-01-01.csv"), CMS_FILE_1)

    reports = stream_load_quality(spark, landing, warehouse, checkpoint)
    assert sum(r.input_rows for r in reports) == 5
    hqi = warehouse.read("hospital_quality_information")
    # 5 rows, H1 duplicated in-batch -> 4 kept
    assert hqi.count() == 4
    dates = {r["data_date"] for r in hqi.select("data_date").distinct().collect()}
    assert dates == {dt.date(2023, 1, 1)}

    # same content, new snapshot date -> all rows are NEW keys
    write_lines(os.path.join(landing, "quality-2023-02-01.csv"), CMS_FILE_1)
    reports2 = stream_load_quality(spark, landing, warehouse, checkpoint)
    assert sum(r.input_rows for r in reports2) == 5
    assert warehouse.read("hospital_quality_information").count() == 8


def test_stream_admission_store_dir_equals_inline(spark, tmp_path):
    """The store_dir path (bench store_split's pre-built store) is
    result-identical to the inline-build path for both streaming
    admission gates — the split must never change what is admitted."""
    from health_data_transformation_spark.streaming.ingest import (
        build_text_store,
        stream_incremental_dedup,
    )

    sf = "/root/testdata/sf0.001"

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    inline = canon(stream_incremental_dedup(spark, sf))
    root = str(tmp_path / "store")
    build_text_store(spark, sf, root)
    split = canon(stream_incremental_dedup(spark, sf, store_dir=root))
    assert split == inline
    # the pre-built store carries the derived admission cap stamp
    sb = spark.read.parquet(os.path.join(root, "_store_buckets"))
    assert "hdt_admission_cap" in (sb.schema["bucket"].metadata or {})
