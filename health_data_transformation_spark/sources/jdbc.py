"""JDBC federation source/sink (SURVEY §2.1 S7's federating alternative).

The reference's actual source is a remote PostgreSQL reached through
psycopg (Reporting.py:7-10, load_hhs.py:179-185); this engine's
warehouse is parquet, but a migrating user federates against the live
database on day one — before any bulk export exists.  ``spark.read
.jdbc`` is that seam: the database stays the system of record and
Spark plans a parallel ranged scan over it.

Scale contract (the part worth stating, because JDBC is the ONLY
source here whose parallelism is not free):

* An unpartitioned JDBC read is ONE task holding ONE connection — at
  any real table size that is the bottleneck, not Spark.  Always pass
  ``partition_column``/``lower``/``upper``/``num_partitions`` (Spark
  turns them into ``num_partitions`` ranged WHERE clauses, one
  connection each) or explicit ``predicates``.
* Filters and projections ARE pushed through JDBC (Catalyst compiles
  them into the generated per-partition SELECT), so ``.select`` /
  ``.filter`` on the returned frame prune server-side.
* The stride choice is the JDBC twin of shuffle-partition sizing: aim
  for partitions the database can serve in seconds; a skewed
  partition column makes one connection drag the whole stage (same
  §8-series skew reasoning as every other hot key in this repo).
* 100 TB guidance: federation is for DIMENSION-scale tables and
  incremental slivers (the reference's weekly batch is exactly that);
  fact-scale history should land in the parquet/snapshot warehouse
  via one bulk export and stay there — the engine's other 330+ plans
  assume scan-prunable columnar storage, which a JDBC cursor is not.

The sandbox carries no PostgreSQL server or pgJDBC jar, but pyspark
ships Derby (the Hive-metastore dependency), so the seam is tested
END-TO-END against an embedded Derby database — same code path,
different URL/driver string in production (e.g.
``jdbc:postgresql://host/db`` + the pgJDBC jar on the executor
classpath).  Nothing here is PostgreSQL-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Embedded Derby (in pyspark's jars — the only in-sandbox JDBC
#: engine).  Production callers pass their own driver, e.g.
#: "org.postgresql.Driver".
DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def derby_url(path: str, create: bool = True) -> str:
    """Embedded-Derby JDBC URL for a database directory."""
    return f"jdbc:derby:{path}" + (";create=true" if create else "")


def _default_driver(url: str, driver: str | None) -> str | None:
    """Derby URLs get :data:`DERBY_DRIVER` unless the caller overrides
    — the explicit driver option keeps the read/write path identical
    to a production call (which always names its driver class)."""
    if driver is None and url.startswith("jdbc:derby:"):
        return DERBY_DRIVER
    return driver


_DERBY_CLEANUPS: set[str] = set()


def register_derby_cleanup(root: str, url: str) -> None:
    """Best-effort atexit erasure of an embedded-Derby scratch database
    (ADVICE r10 #4: the pid-suffixed q336 databases were deliberately
    never removed — Derby keeps a database booted for the JVM's
    lifetime, so an eager rmtree corrupts same-process reuse; at
    interpreter exit nothing will reuse it).  Shutdown-then-rmtree:
    Derby signals a SUCCESSFUL single-db shutdown by raising
    SQLException 08006, so the exception is expected; the rmtree runs
    regardless.  Idempotent per root."""
    if root in _DERBY_CLEANUPS:
        return
    _DERBY_CLEANUPS.add(root)
    import atexit
    import shutil

    def _cleanup() -> None:
        try:
            from pyspark.sql import SparkSession

            s = SparkSession.getActiveSession()
            if s is not None:
                base = url.split(";", 1)[0]
                try:
                    s._jvm.java.sql.DriverManager.getConnection(
                        base + ";shutdown=true"
                    )
                except Exception:
                    pass  # 08006 = clean shutdown; gateway-down = moot
        except Exception:
            pass
        shutil.rmtree(root, ignore_errors=True)

    atexit.register(_cleanup)


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str | None = None,
    column_types: str | None = None,
) -> None:
    """Write ``df`` to a JDBC table (the reference's INSERT sink shape,
    batched by construction: Spark writes each partition over one
    connection with executeBatch — the S5 row without the row-at-a-time
    fallback).

    ``column_types`` (Spark's ``createTableColumnTypes``) overrides
    DDL types; Derby maps StringType to CLOB by default, which cannot
    be GROUP BYed server-side, so callers pass e.g.
    ``"n_name VARCHAR(25)"`` for string keys.
    """
    driver = _default_driver(url, driver)
    w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        w = w.option("driver", driver)
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    w.mode(mode).save()


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
    driver: str | None = None,
) -> DataFrame:
    """Read a JDBC table as a DataFrame, parallelized when asked.

    ``partition_column`` (+ ``lower``/``upper``/``num_partitions``)
    gives the standard ranged parallel read; ``predicates`` gives one
    partition per explicit WHERE clause (the escape hatch for skewed or
    non-numeric keys).  The two are mutually exclusive, matching the
    underlying API.  With neither, the read is a single task — fine
    for dimension tables, wrong for anything big (see module
    docstring).

    ``predicates`` strings are sent to the database VERBATIM — quote
    identifiers per the target's dialect.  Spark writes columns as
    quoted lowercase, so on case-folding engines (Derby, PostgreSQL)
    an unquoted ``n_regionkey < 2`` upcases to a missing column;
    write ``\"n_regionkey\" < 2``.
    """
    if partition_column is not None and predicates is not None:
        raise ValueError("pass partition_column bounds or predicates, not both")
    driver = _default_driver(url, driver)
    props = {"driver": driver} if driver else {}
    if predicates is not None:
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    if partition_column is not None:
        if lower is None or upper is None or num_partitions is None:
            raise ValueError(
                "partition_column needs lower, upper and num_partitions — "
                "an unbounded ranged read silently degrades to one task"
            )
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower,
            upperBound=upper,
            numPartitions=num_partitions,
            properties=props,
        )
    return spark.read.jdbc(url, table, properties=props)
