"""Readers for the driver-generated testdata tables (TESTDATA.md).

All reads are plain ``spark.read.parquet`` — schema comes from the files
(explicit StructTypes are used for the *CSV* ingest paths in
``sources.csv``; parquet is self-describing and Catalyst prunes columns
/ pushes filters into the scan automatically).

The one wrinkle: ``events.ts`` is INT64 TIMESTAMP(NANOS) parquet, which
Spark reads as LongType under ``nanosAsLong`` (see session.py).  We
convert nanoseconds -> microseconds with integer division (truncation),
which is byte-identical to how DuckDB ingests the same column — keeping
the differential oracle exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_compat

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: columns stored as nanosecond timestamps that surface as LongType
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing nano-timestamp columns."""
    ensure_compat(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for col in _NANO_TS_COLS.get(name, ()):
        if dtypes.get(col) == "bigint":
            # integer `div` keeps full 64-bit precision (a double round-trip
            # would lose sub-microsecond bits at 1.7e18 magnitudes)
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for spark.sql use."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
