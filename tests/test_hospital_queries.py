"""Q1-Q8b over a loaded warehouse: semantics vs. hand-computed goldens
from the fixture files (reference: /root/reference/Reporting.py)."""

from __future__ import annotations

import pytest

from health_data_transformation_spark.ingest import load_hhs, load_quality
from health_data_transformation_spark.plans import hospital_queries as Q


@pytest.fixture()
def loaded(spark, warehouse, hhs_csv_1, hhs_csv_2, cms_csv_1):
    load_hhs(spark, hhs_csv_1, warehouse)
    load_hhs(spark, hhs_csv_2, warehouse)
    load_quality(spark, cms_csv_1, "2022-10-01", warehouse)
    return warehouse


def test_q1_records_for_week(loaded):
    # week 2022-09-23: H1, H2, H3 (H4 quarantined; dup H1 collapsed)
    assert Q.q1_records_for_week(loaded, "2022-09-23").collect()[0]["n_records"] == 3


def test_q2_weekly_counts(loaded):
    rows = Q.q2_weekly_record_counts(loaded, "2022-10-01").collect()
    assert [(str(r["collection_week"]), r["n_records"]) for r in rows] == [
        ("2022-09-23", 3),
        ("2022-09-30", 1),
    ]


def test_q3_bed_sums(loaded):
    row = Q.q3_bed_sums_for_week(loaded, "2022-09-23").collect()[0]
    # adult beds: H1=100 (first-wins), H2=NULL (sentinel), H3=NULL -> 100
    assert row["total_adult_beds"] == 100.0
    # pediatric: 10 + 8 + 6 = 24
    assert row["total_pediatric_beds"] == 24.0


def test_q4_recent_weeks_ascending(loaded):
    rows = Q.q4_recent_week_sums(loaded, n_weeks=2).collect()
    weeks = [str(r["collection_week"]) for r in rows]
    assert weeks == ["2022-09-30", "2022-10-07"]  # 2 most recent, ascending


def test_q5_rating_ratio(loaded):
    rows = {r["hospital_overall_rating"]: r["occupancy_ratio"]
            for r in Q.q5_bed_usage_by_rating(loaded).collect()}
    # rating 4.0 = H1 (weeks 09-23 and 09-30):
    # used = (50+5) + (55+6) = 116; available = (100+10) + (110+12) = 232
    assert rows[4.0] == 0.5


def test_q6_total_usage(loaded):
    rows = Q.q6_total_bed_usage(loaded, "2022-09-30").collect()
    by_week = {str(r["collection_week"]): r for r in rows}
    # 09-23: used = (50+5+10) + (40+4+7) + (30+3+6) = 155
    assert by_week["2022-09-23"]["all_beds_used"] == 155.0
    assert by_week["2022-09-23"]["covid_beds_used"] == 8.0 + 5.0 + 4.0


def test_q7_emergency_by_state(loaded):
    rows = {r["state"]: r["n_hospitals"]
            for r in Q.q7_emergency_services_by_state(loaded).collect()}
    # emergency_services: H1 (PA) yes, H2 (CA) no, H3 (NY) yes, H9 not loaded
    # into hospitals (absent from HHS) -> drops out of the join
    assert rows == {"PA": 1, "NY": 1}


def test_q8a_ownership(loaded):
    rows = Q.q8a_bed_usage_by_ownership(loaded, "Proprietary").collect()
    # only H1 is Proprietary: per-week ratio = 55/110 = 0.5
    assert [(str(r["collection_week"]), r["occupancy_ratio"]) for r in rows] == [
        ("2022-09-23", 0.5),
        ("2022-09-30", 0.5),
    ]


def test_q8b_top_bottom_states(loaded):
    rows = Q.q8b_top_bottom_rated_states(loaded, "2022-10-01", k=1).collect()
    got = {(r["side"], r["state"]) for r in rows}
    # ratings by state: PA (H1) = 4, CA (H2) = 0, NY (H3) = NULL-dropped
    assert got == {("top", "PA"), ("bottom", "CA")}
