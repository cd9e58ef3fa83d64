"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.5 extension; the Spark primitive for operators the
built-in windowed aggregations can't express).

Demonstrated operator: per-user running totals with explicit state.
The same skeleton carries any keyed accumulator (fraud scores, rate
limiters, session feature vectors): state is a tuple per key, updates
are Arrow-batched pandas, eviction is via GroupStateTimeout.

Determinism: the monetary column is pre-quantized to integer cents
JVM-side (decimal cast), so the Python-side sum is exact integer math —
order-insensitive and bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..session import ensure_compat

STATE_SCHEMA = "n LONG, total_cents LONG"
OUTPUT_SCHEMA = "user_id LONG, n LONG, total_cents LONG"


def stateful_user_totals(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 300
) -> DataFrame:
    """events parquet as a stream -> per-user (count, exact total) held in
    explicit keyed state, emitted each trigger in update mode.

    With Trigger.AvailableNow the bounded run ends after the data is
    consumed, so the memory sink holds the final running total per user
    — equal to the batch GROUP BY by construction.
    """
    ensure_compat(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")

    stage = tempfile.mkdtemp(prefix="hdt_stateful_events_")
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    stream = spark.readStream.schema(static.schema).parquet(stage)

    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    keyed = stream.select("user_id", cents.alias("cents")).groupBy("user_id")

    def update(key, batches: Iterator["pd.DataFrame"], state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0)
        for batch in batches:
            n += len(batch)
            total += int(batch["cents"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total_cents": [total]})

    out = keyed.applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    name = f"stateful_{uuid.uuid4().hex[:8]}"
    # each shuffle partition materializes a state-store instance; for a
    # bounded keyed-state run the per-store fixed cost dominates, so run
    # the stateful stage narrow (key count here is small; a production
    # stream sizes this to keys x state-size / executor memory)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        query = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        try:
            query.awaitTermination(timeout_sec)
        finally:
            query.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # update mode appends one row per (key, trigger); keep the last emit
    # per key (single AvailableNow trigger => already unique, but stay
    # robust to multi-batch file splits)
    memo = spark.table(name)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        memo.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


TWS_OUTPUT_SCHEMA = "user_id LONG, n LONG, max_cents LONG"


def tws_user_stats(spark: SparkSession, sf_dir: str, timeout_sec: int = 300) -> DataFrame:
    """Per-user (count, max) via ``transformWithStateInPandas`` — the
    second-generation arbitrary-state API (typed state handles, timers,
    RocksDB-backed stores) that supersedes applyInPandasWithState.

    ENVIRONMENT-GATED: the TWS Python runner requires ``google.protobuf``
    (not installed in this container), so this raises a clear error where
    the dependency is missing; the applyInPandasWithState twin above is
    the dependency-free path.  tests/test_rangejoin_stateful.py skips
    accordingly.

    Same bounded-run harness as stateful_user_totals: events parquet as
    an AvailableNow stream, memory sink, final emit per key equals the
    batch GROUP BY.  State is one ValueState tuple per key — O(keys),
    spillable via RocksDB at production key cardinalities.
    """
    import pandas as pd

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf for its "
            "Python runner; install protobuf or use stateful_user_totals"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ensure_compat(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")

    stage = tempfile.mkdtemp(prefix="hdt_tws_events_")
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    stream = spark.readStream.schema(static.schema).parquet(stage)

    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    keyed = stream.select("user_id", cents.alias("cents")).groupBy("user_id")

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n LONG, max_cents LONG")

        def handleInputRows(self, key, rows, timer_values):
            prev = self._agg.get() if self._agg.exists() else (0, None)
            n, mx = prev[0], prev[1]
            for batch in rows:
                n += len(batch)
                bmax = int(batch["cents"].max()) if len(batch) else None
                mx = bmax if mx is None else (mx if bmax is None else max(mx, bmax))
            self._agg.update((n, mx))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n], "max_cents": [mx]})

        def close(self) -> None:
            pass

    out = keyed.transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

    name = f"tws_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # transformWithState requires the RocksDB state store provider
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        query = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        try:
            query.awaitTermination(timeout_sec)
        finally:
            query.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )

    memo = spark.table(name)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        memo.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
