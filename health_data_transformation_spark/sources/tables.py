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
        elif dtypes.get(col) == "timestamp_ntz":
            # newer parquet readers surface TIMESTAMP(NANOS) as ntz
            # (micros-truncated, same as DuckDB); with the session tz
            # pinned to UTC the ltz cast is wall-clock identical and
            # restores TIMESTAMP for unix_micros/watermark consumers
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _iso_to_epoch_micros(value: str) -> int:
    """'YYYY-MM-DD[ HH:MM:SS]' -> microseconds since epoch (UTC, naive)."""
    import calendar
    from datetime import datetime

    fmt = "%Y-%m-%d %H:%M:%S" if " " in value else "%Y-%m-%d"
    return calendar.timegm(datetime.strptime(value, fmt).timetuple()) * 1_000_000


def load_events_range(
    spark: SparkSession,
    sf_dir: str,
    lo: str | None = None,
    hi: str | None = None,
    lo_inclusive: bool = True,
    hi_inclusive: bool = False,
) -> DataFrame:
    """Events scan with the time-range predicate applied to the RAW
    nanosecond column, *before* the timestamp conversion.

    The ns->us conversion is a computed column, so a filter written
    against the converted timestamp cannot reach the parquet scan (only
    IsNotNull pushes — SCALE.md §2's known wart).  Filtering the stored
    INT64 directly restores row-group statistics skipping and (at 100 TB)
    partition pruning.  For whole-microsecond bounds the rewrite is
    exact: ts_us = ts_ns div 1000 is monotone and the boundary
    lo_us*1000 is hit exactly, so  ts_ns >= lo_us*1000  <=>
    ts_us >= lo_us  (same for the strict/<=/</ variants).

    Falls back to post-conversion filtering if the column already
    arrived as a real timestamp type.
    """
    ensure_compat(spark)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw_ts_type = dict(raw.dtypes).get("ts")
    if raw_ts_type != "bigint":
        # filter the STORED column (ntz or ltz) so the predicate reaches
        # the scan, then normalize the type; filtering after the cast
        # would hide the bound behind a computed column
        ts = F.col("ts")
        cast = lambda v: F.lit(v).cast(raw_ts_type)  # noqa: E731
        conds = []
        if lo is not None:
            conds.append(ts >= cast(lo) if lo_inclusive else ts > cast(lo))
        if hi is not None:
            conds.append(ts <= cast(hi) if hi_inclusive else ts < cast(hi))
        for c in conds:
            raw = raw.filter(c)
        if raw_ts_type == "timestamp_ntz":
            raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
        return raw
    ns = F.col("ts")
    conds = []
    if lo is not None:
        lo_ns = _iso_to_epoch_micros(lo) * 1000
        conds.append(ns >= lo_ns if lo_inclusive else ns > lo_ns + 999)
    if hi is not None:
        hi_ns = _iso_to_epoch_micros(hi) * 1000
        conds.append(ns <= hi_ns + 999 if hi_inclusive else ns < hi_ns)
    for c in conds:
        raw = raw.filter(c)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for spark.sql use."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
