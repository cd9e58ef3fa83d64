"""Golden end-to-end loader tests (SURVEY.md §5 layers 1-2, 4).

Each assertion cites the reference behavior it preserves.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from health_data_transformation_spark.ingest import load_hhs, load_quality


def test_load_hhs_golden(spark, warehouse, hhs_csv_1):
    report = load_hhs(spark, hhs_csv_1, warehouse)

    # 6 data rows; H4 rejected (negative metric, load_hhs.py:104); H1 week
    # 2022-09-23 duplicated in-batch -> one winner
    assert report.input_rows == 6
    assert report.invalid_rows == 1
    assert report.table_rows_added["hospitals"] == 3  # H1, H2, H3
    assert report.table_rows_added["hospital_bed_information"] == 4

    beds = warehouse.read("hospital_bed_information")
    assert beds.count() == 4

    # sentinel -999999 -> NULL, row retained (load_hhs.py:49)
    h2 = beds.filter(F.col("hospital_fk") == "H2").collect()[0]
    assert h2["all_adult_hospital_beds_7_day_avg"] is None
    # empty metric -> NULL passes the >= 0 check (load_hhs.py:104 short-circuit)
    h3 = beds.filter(F.col("hospital_fk") == "H3").collect()[0]
    assert h3["all_adult_hospital_beds_7_day_avg"] is None
    # negative-metric row quarantined entirely
    assert beds.filter(F.col("hospital_fk") == "H4").count() == 0

    # quarantine sink mirrors invalid_data/*.csv (load_hhs.py:152-155)
    quarantined = spark.read.option("header", True).csv(
        warehouse.root + "/invalid/hhs"
    )
    assert quarantined.count() == 1
    assert quarantined.collect()[0]["hospital_pk"] == "H4"
    assert "non_negative" in quarantined.collect()[0]["_failed_rules"]


def test_load_hhs_first_wins_and_idempotency(spark, warehouse, hhs_csv_1, hhs_csv_2):
    load_hhs(spark, hhs_csv_1, warehouse)
    beds_before = (
        warehouse.read("hospital_bed_information")
        .filter((F.col("hospital_fk") == "H1"))
        .orderBy("collection_week")
        .collect()
    )

    report2 = load_hhs(spark, hhs_csv_2, warehouse)
    # H1/2022-09-23 re-delivered -> dropped (first-wins, load_hhs.py:103);
    # H5 is new
    assert report2.table_rows_added["hospital_bed_information"] == 1
    assert report2.duplicate_rows == 1

    beds_after = (
        warehouse.read("hospital_bed_information")
        .filter((F.col("hospital_fk") == "H1"))
        .orderBy("collection_week")
        .collect()
    )
    assert [r.asDict() for r in beds_before] == [r.asDict() for r in beds_after]

    # re-delivering the SAME file is a complete no-op (D4 idempotency)
    report3 = load_hhs(spark, hhs_csv_2, warehouse)
    assert report3.table_rows_added["hospital_bed_information"] == 0
    assert report3.table_rows_added["hospitals"] == 0


def test_load_quality_golden(spark, warehouse, cms_csv_1):
    report = load_quality(spark, cms_csv_1, "2022-10-01", warehouse)

    # 5 rows; H1 duplicated in-batch -> 4 appended, 1 duplicate
    assert report.input_rows == 5
    assert report.invalid_rows == 0
    assert report.table_rows_added["hospital_quality_information"] == 4
    assert report.duplicate_rows == 1

    q = warehouse.read("hospital_quality_information")
    rows = {r["facility_id"]: r for r in q.collect()}
    # 'Not Available' -> 0 (load_quality.py:103)
    assert rows["H2"]["hospital_overall_rating"] == 0.0
    # empty rating -> NULL (lenient cast)
    assert rows["H3"]["hospital_overall_rating"] is None
    # Yes/No -> boolean (load_quality.py:105)
    assert rows["H1"]["emergency_services"] is True
    assert rows["H2"]["emergency_services"] is False
    # data_date stamped on every row (load_quality.py:106-107)
    assert str(rows["H1"]["data_date"]) == "2022-10-01"


def test_load_quality_new_snapshot_same_facilities(spark, warehouse, cms_csv_1):
    load_quality(spark, cms_csv_1, "2022-10-01", warehouse)
    # same facilities at a NEW data_date are fresh rows, not duplicates
    # (key is facility_id+data_date, load_quality.py:119-126)
    report = load_quality(spark, cms_csv_1, "2023-01-01", warehouse)
    assert report.table_rows_added["hospital_quality_information"] == 4
    assert warehouse.read("hospital_quality_information").count() == 8


def test_compact_preserves_contents(spark, warehouse, hhs_csv_1, hhs_csv_2):
    load_hhs(spark, hhs_csv_1, warehouse)
    load_hhs(spark, hhs_csv_2, warehouse)
    before = sorted(
        tuple(r) for r in warehouse.read("hospital_bed_information").collect()
    )
    import glob
    import os

    files_before = len(
        glob.glob(
            os.path.join(warehouse.path("hospital_bed_information"), "**", "*.parquet"),
            recursive=True,
        )
    )
    n_files = warehouse.compact("hospital_bed_information")
    after = sorted(
        tuple(r) for r in warehouse.read("hospital_bed_information").collect()
    )
    assert after == before
    assert n_files <= files_before
    # idempotent append still works post-compaction
    report = load_hhs(spark, hhs_csv_2, warehouse)
    assert report.table_rows_added["hospital_bed_information"] == 0


def test_incremental_rollup_refresh(spark, warehouse, hhs_csv_1, hhs_csv_2, tmp_path):
    """Continuous-aggregate maintenance: each load refreshes only the
    collection_weeks it touched; untouched rollup partitions keep their
    files (and contents equal a full recompute)."""
    import glob
    import os

    import pyspark.sql.functions as F

    from health_data_transformation_spark.operators.rollup import (
        refresh_rollup,
        touched_partitions,
    )

    rollup_path = str(tmp_path / "rollup_weekly_beds")

    def weekly_agg(df):
        return df.groupBy("collection_week").agg(
            F.count("*").alias("n_hospitals"),
            F.sum(F.col("total_icu_beds_7_day_avg").cast("decimal(18,2)"))
            .cast("double")
            .alias("icu_beds"),
        )

    def refresh_after(load_report_weeks):
        fact = warehouse.read("hospital_bed_information")
        return refresh_rollup(
            fact, rollup_path, "collection_week", load_report_weeks, weekly_agg
        )

    load_hhs(spark, hhs_csv_1, warehouse)
    fact1 = warehouse.read("hospital_bed_information")
    refresh_after(touched_partitions(fact1, "collection_week"))
    first_files = {
        p for p in glob.glob(os.path.join(rollup_path, "*", "*.parquet"))
    }
    mtimes = {p: os.path.getmtime(p) for p in first_files}

    # second load touches only 2022-10-07 (H1 re-delivery is deduped away)
    load_hhs(spark, hhs_csv_2, warehouse)
    import datetime as dt

    refresh_after([dt.date(2022, 10, 7)])

    # untouched week partitions were not rewritten
    for p, m in mtimes.items():
        if "2022-10-07" not in p and os.path.exists(p):
            assert os.path.getmtime(p) == m

    # rollup equals a full recompute of the fact table
    full = {
        (str(r["collection_week"]), r["n_hospitals"], r["icu_beds"])
        for r in weekly_agg(warehouse.read("hospital_bed_information")).collect()
    }
    stored = {
        (str(r["collection_week"]), r["n_hospitals"], r["icu_beds"])
        for r in spark.read.parquet(rollup_path)
        .select("collection_week", "n_hospitals", "icu_beds")
        .collect()
    }
    assert stored == full


def test_upsert_last_wins(spark, warehouse, hhs_csv_1):
    """The MERGE-style complement of first-wins: re-delivered keys
    REPLACE the stored rows; untouched rows survive."""
    import datetime as dt

    from health_data_transformation_spark.schemas import TABLE_SCHEMAS

    load_hhs(spark, hhs_csv_1, warehouse)
    beds = warehouse.read("hospital_bed_information")
    h1_before = beds.filter(
        (F.col("hospital_fk") == "H1")
        & (F.col("collection_week") == dt.date(2022, 9, 23))
    ).collect()[0]
    assert h1_before["all_adult_hospital_beds_7_day_avg"] == 100.0
    n_before = beds.count()

    # corrected re-delivery of H1/2022-09-23
    fixed = h1_before.asDict()
    fixed["all_adult_hospital_beds_7_day_avg"] = 123.0
    batch = spark.createDataFrame(
        [tuple(fixed[f.name] for f in TABLE_SCHEMAS["hospital_bed_information"].fields)],
        TABLE_SCHEMAS["hospital_bed_information"],
    )
    applied = warehouse.upsert_last_wins(batch, "hospital_bed_information")
    assert applied == 1

    after = warehouse.read("hospital_bed_information")
    assert after.count() == n_before  # replaced, not appended
    h1_after = after.filter(
        (F.col("hospital_fk") == "H1")
        & (F.col("collection_week") == dt.date(2022, 9, 23))
    ).collect()[0]
    assert h1_after["all_adult_hospital_beds_7_day_avg"] == 123.0
    # a row in the same partition but different key survives untouched
    assert after.filter(
        (F.col("hospital_fk") == "H2")
        & (F.col("collection_week") == dt.date(2022, 9, 23))
    ).count() == 1
    # rows in other partitions untouched
    assert after.filter(
        F.col("collection_week") == dt.date(2022, 9, 30)
    ).count() == 1


def test_load_hhs_header_only_file(spark, warehouse, tmp_path):
    """An empty delivery (header, no rows) is a clean no-op load."""
    from tests.conftest import HHS_HEADER, write_lines

    path = write_lines(str(tmp_path / "empty.csv"), [HHS_HEADER])
    report = load_hhs(spark, path, warehouse)
    assert report.input_rows == 0
    assert report.invalid_rows == 0
    assert all(v == 0 for v in report.table_rows_added.values())


def test_load_hhs_all_invalid_file(spark, warehouse, tmp_path):
    """A file where every row fails validation quarantines everything
    and appends nothing."""
    from tests.conftest import HHS_HEADER, write_lines

    rows = [
        HHS_HEADER,
        # negative metric -> quarantined
        'B1,Bad One,TX,1 St,Austin,78701,48453,"POINT (-97.7 30.3)",'
        "2022-09-23,-1,1,1,1,1,1,1,1,x",
        # null hospital_pk -> quarantined
        ',No Key,TX,2 St,Austin,78701,48453,"POINT (-97.7 30.3)",'
        "2022-09-23,1,1,1,1,1,1,1,1,x",
    ]
    path = write_lines(str(tmp_path / "bad.csv"), rows)
    report = load_hhs(spark, path, warehouse)
    assert report.input_rows == 2
    assert report.invalid_rows == 2
    assert report.table_rows_added["hospital_bed_information"] == 0
    assert not warehouse.exists("hospital_bed_information") or (
        warehouse.read("hospital_bed_information").count() == 0
    )


def test_warehouse_scan_prunes_partitions(spark, warehouse, hhs_csv_1):
    """A collection_week filter on the partitioned fact table must reach
    the scan as a partition filter (pruning, not post-scan filtering)."""
    import datetime as dt

    load_hhs(spark, hhs_csv_1, warehouse)
    df = warehouse.read("hospital_bed_information").filter(
        F.col("collection_week") == dt.date(2022, 9, 23)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate appears in PartitionFilters, and pruning
    # leaves a single matching partition directory to read
    assert plan.count("collection_week") >= 1
    assert df.count() == 3  # H1, H2, H3 for that week


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """A selective filter on the DIM side of a join must prune the
    partitioned FACT side at runtime (DPP) — the fact filter is not
    known until the dim is evaluated, so static PartitionFilters can't
    do it; the plan must carry a dynamicpruning subquery on the
    partition column.  This is the mechanism that keeps a 100 TB
    date-partitioned fact from full-scanning when joined to a
    filtered calendar/dim table."""
    fact_dir = str(tmp_path / "fact")
    fact = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 10).alias("day_bucket"),
        (F.col("id") * 3).alias("v"),
    )
    fact.write.partitionBy("day_bucket").parquet(fact_dir)
    dim = spark.range(10).select(
        F.col("id").alias("day_bucket"),
        (F.col("id") % 2 == 0).alias("keep"),
    )
    f = spark.read.parquet(fact_dir)
    joined = f.join(dim.filter(F.col("keep")), "day_bucket").select(
        F.sum("v").alias("s")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    [row] = joined.collect()
    expected = sum(i * 3 for i in range(1000) if (i % 10) % 2 == 0)
    assert row["s"] == expected
