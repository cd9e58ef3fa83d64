"""Structured Streaming surface (SURVEY.md §2.5, §7.1 step 6).

The reference's ingest is manual per-file CLI (README.md:26-46); its
natural Spark mapping is a file-source stream with
``Trigger.AvailableNow`` — process everything currently present as one
bounded run, exactly the reference's batch cadence but restartable and
incremental via checkpoint.

``stream_window_counts`` is the driver-facing demonstration: parquet
file source -> event-time tumbling windows -> memory sink.  Its result
is deterministically equal to the batch GROUP BY (the oracle), proving
the streaming plan computes the same aggregation.
"""

from __future__ import annotations

import contextlib
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.deterministic import bucket_str, dec_sum
from ..session import ensure_compat


def normalize_event_ts(stream: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce the event-time column to TIMESTAMP (ltz).

    The testdata writes ``events.ts`` as parquet INT64 TIMESTAMP(NANOS),
    which Spark surfaces either as LongType (``nanosAsLong``) or as
    TIMESTAMP_NTZ depending on version.  Watermarks require TIMESTAMP
    proper; with the session timezone pinned to UTC (session.py) the
    ntz -> ltz cast is value-identical wall-clock time.
    """
    dtype = dict(stream.dtypes).get(col)
    if dtype == "bigint":
        # integer `div` keeps full 64-bit precision (matches DuckDB's
        # nanos->micros truncation, keeping the differential oracle exact)
        return stream.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if dtype == "timestamp_ntz":
        return stream.withColumn(col, F.col(col).cast("timestamp"))
    return stream


@contextlib.contextmanager
def narrow_shuffle(spark: SparkSession, n: int = 8):
    """Bounded-run stateful streaming allocates one state store per
    shuffle partition per stateful operator per microbatch; at local
    test scale that fixed cost dominates, so stateful streaming runs
    here use ``n`` partitions (production sizes this to key
    cardinality)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def stream_window_counts(
    spark: SparkSession, sf_dir: str, minutes: int = 15, timeout_sec: int = 300
) -> DataFrame:
    """events parquet as a *stream* -> 15-min tumbling counts/sums.

    Complete-mode memory sink: fine for a bounded AvailableNow run with
    a small aggregate state (one row per window).  Production sinks
    would be parquet/Delta with append mode + watermark.
    """
    ensure_compat(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the file-stream source requires a *directory*; stage a symlink dir
    # (read-only testdata cannot be rearranged)
    import os
    import tempfile

    stage = tempfile.mkdtemp(prefix="hdt_stream_events_")
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    stream = spark.readStream.schema(static.schema).parquet(stage)
    stream = normalize_event_ts(stream)

    agg = stream.groupBy(bucket_str("ts", minutes).alias("window_start")).agg(
        F.count("*").alias("n_events"),
        dec_sum("value", 2).alias("total_value"),
    )

    name = f"stream_win_{uuid.uuid4().hex[:8]}"
    with narrow_shuffle(spark):
        query = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        try:
            query.awaitTermination(timeout_sec)
        finally:
            query.stop()
    return spark.table(name)


def stream_session_windows(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 15, timeout_sec: int = 300
) -> DataFrame:
    """events parquet as a stream -> built-in ``session_window`` (dynamic
    event-time windows that merge while events arrive within the gap).

    The streaming twin of the batch sessionization operator
    (operators/sessions.py, q46): same gap semantics (an event exactly
    ``gap`` after the last starts a new session), state = one interval
    per open session per key, merged incrementally.
    """
    ensure_compat(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    import os
    import tempfile
    import uuid

    stage = tempfile.mkdtemp(prefix="hdt_stream_sessions_")
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    stream = spark.readStream.schema(static.schema).parquet(stage)
    stream = normalize_event_ts(stream)

    agg = (
        stream.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )

    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    with narrow_shuffle(spark):
        query = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        try:
            query.awaitTermination(timeout_sec)
        finally:
            query.stop()
    return spark.table(name)


def _staged_events_stream(spark: SparkSession, sf_dir: str):
    import os
    import tempfile

    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stage = tempfile.mkdtemp(prefix="hdt_stream_ssj_")
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    stream = spark.readStream.schema(static.schema).parquet(stage)
    stream = normalize_event_ts(stream)
    return stream


def stream_stream_join(
    spark: SparkSession, sf_dir: str, window_s: int = 1800, timeout_sec: int = 300
) -> DataFrame:
    """Stream-stream interval join: purchases joined to the same user's
    clicks in the preceding ``window_s`` seconds, both sides watermarked.

    The watermark + the time-bound join condition let Spark EVICT join
    state (a click older than purchase-watermark - window can never
    match again) — without them, stream-stream join state grows without
    bound.  Batch twin: operators/rangejoin.py (same predicate).
    """
    ensure_compat(spark)
    import uuid

    purchases = (
        _staged_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        _staged_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_s} SECONDS"))
        & (F.col("c_ts") < F.col("p_ts")),
        "inner",
    ).select("purchase_id", "user_id", "click_id")

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    with narrow_shuffle(spark):
        query = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            query.awaitTermination(timeout_sec)
        finally:
            query.stop()
    return spark.table(name)


def stream_dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    schema,
    keys: list[str],
    event_time_col: str,
    watermark: str = "7 days",
) -> DataFrame:
    """Streaming exactly-once-per-key ingest plan (D4 as a stream).

    ``dropDuplicatesWithinWatermark`` bounds the dedup state: a key
    re-delivered within the watermark is dropped, state older than the
    watermark is evicted — the streaming form of the reference's
    duplicate probe (load_hhs.py:8-32) with O(keys-in-window) state
    instead of O(all-history).
    """
    stream = spark.readStream.schema(schema).option("header", True).csv(source_dir)
    return stream.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def stream_dedup_events(
    spark: SparkSession, sf_dir: str, watermark: str = "7 days", timeout_sec: int = 300
) -> DataFrame:
    """Re-delivered events deduped exactly-once-per-key in flight.

    The staging dir holds TWO copies of the events file consumed as two
    microbatches (maxFilesPerTrigger=1): batch 1 passes through,
    batch 2 is eliminated by ``dropDuplicatesWithinWatermark`` state
    (or as late data behind the advanced watermark — either way the
    duplicate never lands).  The surviving rows equal the batch
    distinct-by-key table, which is the oracle; state is
    O(keys within watermark), not O(history).
    """
    import os
    import tempfile
    import uuid

    ensure_compat(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")

    stage = tempfile.mkdtemp(prefix="hdt_stream_dedup_")
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    if os.path.isdir(src):
        static.write.parquet(os.path.join(stage, "copy1.parquet"))
        static.write.parquet(os.path.join(stage, "copy2.parquet"))
    else:
        os.symlink(src, os.path.join(stage, "copy1.parquet"))
        os.symlink(src, os.path.join(stage, "copy2.parquet"))

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    stream = normalize_event_ts(stream)
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )

    name = f"dedup_{uuid.uuid4().hex[:8]}"
    with narrow_shuffle(spark):
        query = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            query.awaitTermination(timeout_sec)
        finally:
            query.stop()
    return spark.table(name)


def stream_late_data_drop(
    spark: SparkSession,
    sf_dir: str,
    day: str = "2024-01-10",
    timeout_sec: int = 300,
) -> DataFrame:
    """Watermark late-data differential: append-mode hourly counts
    where a final microbatch of late rows targets windows the watermark
    already CLOSED — every one of them must be dropped.

    Measured semantics of the microbatch engine (and what this stages):
    a late row is dropped iff its window was evicted in a PRIOR batch;
    a row merely below the watermark whose window is still in state
    merges normally.  So the guarantee needs three arrivals:

    - arrival 1: the day's 00-06 rows PLUS the 23:00 hour (the
      watermark advancer) — fills state, watermark still at epoch;
    - arrival 2: the 12:00-14:00 rows (may be empty at tiny SFs; the
      batch itself is what matters).  It runs with watermark ~21:xx
      (advancer - 2 h), which closes and emits every window ending
      before ~21:00: the 00-06 set and arrival 2's own 12-14 windows;
    - arrival 3: copies of the 06-12 rows time-shifted into 00-06 —
      every target window is now evicted, so ALL of them drop
      (numRowsDroppedByWatermark > 0), emitting nothing.

    Final output = on-time hourly counts for 00-06 and 12-14 only; the
    23:00 window never closes and is withheld.  The oracle states
    exactly that, so admitted-late rows (duplicate or inflated
    windows), missing emissions, or a leaked open window all
    hash-mismatch.  Margins are data-independent: every asserted
    window end is hours below the advancer-derived watermark,
    regardless of scale factor.

    At 100 TB this is the mechanism that BOUNDS streaming state: the
    watermark evicts windows older than the lateness SLA, keeping
    state O(windows in SLA), not O(history).
    """
    ensure_compat(spark)
    import os
    import tempfile
    import time as _time

    from ..sources.tables import load_events_range

    nxt = f"{day[:8]}{int(day[8:]) + 1:02d}"
    ev = load_events_range(spark, sf_dir, lo=day, hi=nxt).select(
        "event_id", "ts", "user_id"
    )
    hour = F.hour("ts")
    arrival1 = ev.filter((hour < 6) | (hour == 23))
    arrival2 = ev.filter((hour >= 12) & (hour < 14))
    arrival3 = (
        ev.filter((hour >= 6) & (hour < 12))
        .withColumn("ts", F.col("ts") - F.expr("INTERVAL 6 HOURS"))
    )

    stage = tempfile.mkdtemp(prefix="hdt_stream_late_")
    out_dir = os.path.join(stage, "_windows")

    def stage_file(df, name: str, mtime: float) -> None:
        tmp = os.path.join(stage, "_tmp_" + name)
        df.coalesce(1).write.parquet(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = os.path.join(stage, name)
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    now = _time.time()
    stage_file(arrival1, "arrival1.parquet", now - 240)
    stage_file(arrival2, "arrival2.parquet", now - 120)
    stage_file(arrival3, "arrival3.parquet", now)

    stream = (
        spark.readStream.schema(arrival1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("user_id") % 1000003).alias("user_mod_sum"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("user_mod_sum").cast("long").alias("user_mod_sum"),
        )
    )
    name = f"late_drop_{uuid.uuid4().hex[:8]}"
    with narrow_shuffle(spark):
        query = (
            agg.writeStream.format("parquet")
            .queryName(name)
            .outputMode("append")
            .option("path", out_dir)
            .option(
                "checkpointLocation", os.path.join(stage, "_checkpoint")
            )
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_sec)
    return spark.read.parquet(out_dir)
