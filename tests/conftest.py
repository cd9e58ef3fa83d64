"""Shared fixtures: session-scoped SparkSession + FIXTURES.md-shaped CSVs."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from health_data_transformation_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hdt-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


HHS_HEADER = (
    "hospital_pk,hospital_name,state,address,city,zip,fips_code,"
    "geocoded_hospital_address,collection_week,"
    "all_adult_hospital_beds_7_day_avg,all_pediatric_inpatient_beds_7_day_avg,"
    "all_adult_hospital_inpatient_bed_occupied_7_day_coverage,"
    "all_pediatric_inpatient_bed_occupied_7_day_avg,total_icu_beds_7_day_avg,"
    "icu_beds_used_7_day_avg,inpatient_beds_used_covid_7_day_avg,"
    "staffed_icu_adult_patients_confirmed_covid_7_day_avg,extra_ignored_col"
)

# FIXTURES.md F1 edge rows:
# - H1 normal (two weeks)
# - H2 has the -999999 sentinel (suppressed -> NULL, row kept)
# - H3 has an empty metric (NaN -> NULL passes the >=0 check, row kept)
# - H4 has a plain negative metric (row quarantined)
# - H1 duplicated within the file (in-batch dedup)
HHS_FILE_1 = [
    HHS_HEADER,
    'H1,Alpha Hospital,PA,1 Main St,Pittsburgh,15213,42003,"POINT (-79.9 40.4)",'
    "2022-09-23,100,10,50,5,20,10,8,3,x",
    'H1,Alpha Hospital,PA,1 Main St,Pittsburgh,15213,42003,"POINT (-79.9 40.4)",'
    "2022-09-30,110,12,55,6,20,11,9,4,x",
    'H2,Beta Hospital,CA,2 Side St,Fresno,93701,06019,"POINT (-119.8 36.7)",'
    "2022-09-23,-999999,8,40,4,15,7,5,2,x",
    'H3,Gamma Hospital,NY,3 High St,Albany,12207,36001,"POINT (-73.8 42.7)",'
    "2022-09-23,,6,30,3,12,6,4,1,x",
    'H4,Delta Hospital,TX,4 Low St,Austin,78701,48453,"POINT (-97.7 30.3)",'
    "2022-09-23,-5,7,35,3,14,6,5,2,x",
    'H1,Alpha Hospital DUP,PA,1 Main St,Pittsburgh,15213,42003,"POINT (-79.9 40.4)",'
    "2022-09-23,999,99,99,9,99,99,9,9,x",
]

# second file: H1/2022-09-23 re-delivered (idempotency), H5 new
HHS_FILE_2 = [
    HHS_HEADER,
    'H1,Alpha Hospital,PA,1 Main St,Pittsburgh,15213,42003,"POINT (-79.9 40.4)",'
    "2022-09-23,777,77,77,7,77,77,7,7,x",
    'H5,Epsilon Hospital,WA,5 New St,Seattle,98101,53033,"POINT (-122.3 47.6)",'
    "2022-10-07,60,5,25,2,10,5,3,1,x",
]

CMS_HEADER = (
    '"Facility ID","Hospital Name","Hospital Type","Hospital Ownership",'
    '"Emergency Services","Hospital overall rating","Extra Col"'
)

CMS_FILE_1 = [
    CMS_HEADER,
    '"H1","Alpha","Acute Care Hospitals","Proprietary","Yes","4","z"',
    '"H2","Beta","Acute Care Hospitals","Government - Local","No","Not Available","z"',
    '"H3","Gamma","Critical Access Hospitals","Voluntary non-profit - Private","Yes","","z"',
    '"H9","Unknown","Acute Care Hospitals","Proprietary","Yes","2","z"',
    '"H1","Alpha DUP","Acute Care Hospitals","Proprietary","Yes","5","z"',
]


def write_lines(path: str, lines: list[str]) -> str:
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


@pytest.fixture()
def hhs_csv_1(tmp_path):
    return write_lines(str(tmp_path / "hhs1.csv"), HHS_FILE_1)


@pytest.fixture()
def hhs_csv_2(tmp_path):
    return write_lines(str(tmp_path / "hhs2.csv"), HHS_FILE_2)


@pytest.fixture()
def cms_csv_1(tmp_path):
    return write_lines(str(tmp_path / "cms1.csv"), CMS_FILE_1)


@pytest.fixture()
def warehouse(spark, tmp_path):
    from health_data_transformation_spark.catalog import Warehouse

    return Warehouse(spark, str(tmp_path / "warehouse"))
