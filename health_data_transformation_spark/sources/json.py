"""JSONL (newline-delimited JSON) source/sink.

The reference ingests CSV only (load_hhs.py:46, load_quality.py:98);
JSONL is the other ubiquitous interchange format for document/event
pipelines, so the engine supports it with the same contract as the CSV
readers: explicit schema (never inferSchema in a production path),
permissive-with-quarantine parsing.

Malformed-record handling mirrors the CSV quarantine split (SURVEY.md
§1.3): PERMISSIVE mode routes unparseable lines to a corrupt-record
column, and ``read_jsonl`` splits them out so the caller gets the same
``(valid, invalid)`` pair the CSV loaders produce.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON with an explicit schema.

    Returns ``(valid, invalid)``: rows that parsed under the schema, and
    raw malformed lines (single-column DataFrame) for quarantine.
    """
    with_corrupt = StructType(
        [*schema.fields, StructField(CORRUPT_COL, StringType())]
    )
    raw = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark requires caching/materializing before filtering on the
    # corrupt column alone; referencing data columns too avoids that,
    # but cache() is the documented safe pattern
    raw = raw.cache()
    valid = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    invalid = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return valid, invalid


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame as newline-delimited JSON."""
    df.write.mode(mode).json(path)
