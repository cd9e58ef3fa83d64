"""JDBC federation seam (SURVEY §2.1 S7): end-to-end against the
embedded Derby engine pyspark ships (the Hive-metastore dependency) —
same ``spark.read/write.jdbc`` code path a production PostgreSQL
federation uses, different URL/driver string."""

from __future__ import annotations

import os

import pytest

from health_data_transformation_spark.sources.jdbc import (
    derby_url,
    read_jdbc_table,
    write_jdbc_table,
)
from health_data_transformation_spark.sources.tables import load_table


def _derby_available() -> bool:
    import glob

    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    return bool(glob.glob(os.path.join(jars, "derby-*.jar")))


pytestmark = pytest.mark.skipif(
    not _derby_available(), reason="no embedded Derby jar on the classpath"
)


def test_jdbc_round_trip_partitioned_and_predicates(spark, tmp_path):
    url = derby_url(str(tmp_path / "db"))
    nation = load_table(spark, "/root/testdata/sf0.001", "nation")
    write_jdbc_table(nation, url, "nation", column_types="n_name VARCHAR(25)")

    # ranged parallel read: num_partitions tasks, content identical
    back = read_jdbc_table(
        spark, url, "nation",
        partition_column="n_nationkey", lower=0, upper=25, num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in nation.collect()
    )

    # explicit-predicate read: one partition per clause, disjoint
    # clauses reconstruct the table (identifiers quoted — Spark writes
    # quoted lowercase and Derby case-folds unquoted names)
    pred = read_jdbc_table(
        spark, url, "nation",
        predicates=['"n_regionkey" < 2', '"n_regionkey" >= 2'],
    )
    assert pred.rdd.getNumPartitions() == 2
    assert pred.count() == nation.count()

    # append mode batches through the same seam (the S5 shape)
    write_jdbc_table(
        nation, url, "nation", mode="append", column_types="n_name VARCHAR(25)"
    )
    assert read_jdbc_table(spark, url, "nation").count() == 2 * nation.count()

    # guards
    with pytest.raises(ValueError, match="not both"):
        read_jdbc_table(
            spark, url, "nation",
            partition_column="n_nationkey", lower=0, upper=25,
            num_partitions=4, predicates=["1=1"],
        )
    with pytest.raises(ValueError, match="num_partitions"):
        read_jdbc_table(spark, url, "nation", partition_column="n_nationkey")
