"""Typed CSV readers for the two ingest feeds (SURVEY.md §2.1 S1-S3).

Explicit schema + header, never inferSchema: the reference's
``pd.read_csv`` with inferred dtypes (load_hhs.py:46) is replaced by a
declared contract; real HHS/CMS files carry 100+ extra columns, which
are tolerated and dropped by selecting only the declared ones.

S3 (the raw re-scan for quarantine) is unnecessary in Spark: the raw
string frame is just the pre-normalization projection of the same scan,
kept lazily — no second file read.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schemas import CMS_RAW_COLUMNS, HHS_RAW_SCHEMA


def read_hhs_csv(spark: SparkSession, path: str) -> DataFrame:
    """Weekly HHS CSV: declared columns only, metrics as double
    (Spark cast-to-null == pandas coerce), week still string."""
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    # tolerate extra columns: project + cast to the declared schema
    out_cols = []
    for field in HHS_RAW_SCHEMA.fields:
        if field.name in df.columns:
            # try_cast: malformed numerics coerce to NULL (ANSI-safe)
            out_cols.append(
                F.col(field.name).try_cast(field.dataType).alias(field.name)
            )
        else:
            out_cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*out_cols)


def read_cms_csv(spark: SparkSession, path: str) -> DataFrame:
    """CMS quality CSV: the 5 used columns, all strings
    (load_quality.py:98-99 usecols + dtype=object)."""
    df = spark.read.option("header", True).csv(path)
    out_cols = [
        (F.col(c) if c in df.columns else F.lit(None)).cast("string").alias(c)
        for c in CMS_RAW_COLUMNS
    ]
    return df.select(*out_cols)
