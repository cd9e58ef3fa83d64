"""Columnar interchange formats beyond the warehouse default (parquet).

The reference's storage layer is a single PostgreSQL instance
(load_hhs.py:179-185); this engine's is format-pluggable files.  ORC is
the second columnar format large Spark estates standardize on — same
predicate-pushdown / column-pruning / partition-layout properties as
parquet, handled by Spark's native vectorized reader — so supporting it
is a write-option, not an engine change.  These helpers exist to pin
the contract with tests (round-trip fidelity, pushdown into the ORC
scan) rather than to wrap anything deep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: formats with native vectorized readers + filter pushdown in Spark
COLUMNAR_FORMATS = ("parquet", "orc")


def write_columnar(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    if fmt not in COLUMNAR_FORMATS:
        raise ValueError(f"unsupported columnar format: {fmt!r}")
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_columnar(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt not in COLUMNAR_FORMATS:
        raise ValueError(f"unsupported columnar format: {fmt!r}")
    return spark.read.format(fmt).load(path)
