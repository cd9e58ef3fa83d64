"""As-of join and sessionization operator semantics."""

from __future__ import annotations

from datetime import datetime

from health_data_transformation_spark.operators.asof import asof_join
from health_data_transformation_spark.operators.sessions import (
    session_bounds,
    sessionize,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "p1"), (1, _ts("2024-01-01T12:00:00"), "p2"),
         (2, _ts("2024-01-01T09:00:00"), "p3")],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30:00"), 100), (1, _ts("2024-01-01T11:00:00"), 200),
         (2, _ts("2024-01-01T09:30:00"), 300)],
        "k long, ts timestamp, rv long",
    )
    out = asof_join(left, right, ["k"], "ts", "ts", ["rv"])
    got = {r["name"]: r["rv"] for r in out.collect()}
    # p1 -> 09:30 row; p2 -> 11:00 row; p3 has no prior right row -> NULL
    assert got == {"p1": 100, "p2": 200, "p3": None}


def test_asof_join_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T10:00:00"), "p")],
                                 "k long, ts timestamp, name string")
    right = spark.createDataFrame([(1, _ts("2024-01-01T10:00:00"), 7)],
                                  "k long, ts timestamp, rv long")
    out = asof_join(left, right, ["k"], "ts", "ts", ["rv"]).collect()
    assert out[0]["rv"] == 7  # ties: right_time <= left_time matches


def test_sessionize_gaps(spark):
    rows = [
        (1, _ts("2024-01-01T10:00:00"), 1),
        (1, _ts("2024-01-01T10:10:00"), 2),   # same session (10 min)
        (1, _ts("2024-01-01T11:30:00"), 3),   # new session (80 min gap)
        (2, _ts("2024-01-01T10:00:00"), 4),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = sessionize(df, ["user_id"], "ts", 30, tiebreak="event_id")
    got = {r["event_id"]: r["session_idx"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}

    bounds = session_bounds(df, ["user_id"], "ts", 30, tiebreak="event_id")
    b = {(r["user_id"], r["session_idx"]): r["n_events"] for r in bounds.collect()}
    assert b == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_sessionize_exact_gap_not_new(spark):
    # a gap of exactly 30 min stays in the same session (strict >)
    rows = [(1, _ts("2024-01-01T10:00:00"), 1), (1, _ts("2024-01-01T10:30:00"), 2)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = sessionize(df, ["user_id"], "ts", 30, tiebreak="event_id")
    assert {r["session_idx"] for r in out.collect()} == {1}

def test_asof_join_null_value_from_matched_row_not_resurrected(spark):
    """A right row whose value column is NULL attaches that NULL — the
    payload travels as one struct, so an older row's value is never
    resurrected (ADVICE r1: TTL/value row-consistency)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "p")],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 100), (1, _ts("2024-01-01T11:00:00"), None)],
        "k long, ts timestamp, rv long",
    )
    out = asof_join(left, right, ["k"], "ts", "ts", ["rv"]).collect()
    assert out[0]["rv"] is None  # matched row IS the 11:00 one; its rv is NULL


def test_asof_join_ttl_uses_matched_rows_timestamp(spark):
    """TTL ages against the same row the values come from: a fresh right
    row with a NULL value must not let a stale older value through."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "p")],
        "k long, ts timestamp, name string",
    )
    # old row (3h stale) has a value; recent row (30min) has NULL value
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 100), (1, _ts("2024-01-01T11:30:00"), None)],
        "k long, ts timestamp, rv long",
    )
    out = asof_join(
        left, right, ["k"], "ts", "ts", ["rv"], tolerance_us=3_600_000_000
    ).collect()
    assert out[0]["rv"] is None  # within TTL -> matched row's NULL, not 100

    # and a genuinely stale match is nulled entirely
    out2 = asof_join(
        left,
        right.filter("rv IS NOT NULL"),
        ["k"], "ts", "ts", ["rv"],
        tolerance_us=3_600_000_000,
    ).collect()
    assert out2[0]["rv"] is None
