"""CDC / slowly-changing-dimension operators (no table format required).

The reference keeps every quality snapshot as rows keyed by
(facility_id, data_date) (load_quality.py:119-126) — history exists but
answering "what was the rating when?" needs a scan of all snapshots.
SCD2 is the warehouse-native shape: one row per version with a validity
interval, maintained incrementally per incoming snapshot.

Without Delta/Iceberg MERGE, both operators are pure DataFrame algebra
(anti-join + union + comparison), idempotent, and partition-friendly:
`scd2_apply` touches only keys present in the update batch; everything
else passes through untouched.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _neq(a: str, b: str) -> Column:
    """Null-safe 'differs' for one attribute pair."""
    return ~F.col(a).eqNullSafe(F.col(b))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """CDC between two snapshots: (keys..., change_type) with change_type
    in {'inserted', 'deleted', 'changed'}; unchanged keys are omitted.
    One full-outer join on the keys — no per-row processing.
    """
    keys = list(keys)
    # presence markers are explicit columns: a NULL attribute value must
    # not fake absence, and the join keys coalesce under full outer
    o = old.select(
        *keys,
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"_new_{c}") for c in compare_cols],
    )
    joined = o.join(n, keys, "full_outer")
    changed = None
    for c in compare_cols:
        d = _neq(f"_old_{c}", f"_new_{c}")
        changed = d if changed is None else (changed | d)
    change_type = (
        F.when(F.col("_in_old").isNull(), F.lit("inserted"))
        .when(F.col("_in_new").isNull(), F.lit("deleted"))
        .when(changed, F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )


def build_quality_history(warehouse) -> DataFrame:
    """Reconstruct the SCD2 rating history from the warehouse's
    snapshot-model quality table (one row per facility per data_date,
    the reference's layout) by replaying snapshots in date order.

    Answers "what was this facility's rating on day X?" with an interval
    lookup instead of a scan over every snapshot.
    """
    hqi = warehouse.read("hospital_quality_information")
    dates = sorted(
        r[0] for r in hqi.select("data_date").distinct().collect()
    )
    attr_cols = ["hospital_overall_rating", "emergency_services"]
    from ..functions.frames import literal_frame

    history = literal_frame(
        hqi.sparkSession,
        "facility_id string, hospital_overall_rating double, "
        "emergency_services boolean, valid_from date, valid_to date",
        [],
    )
    for d in dates:
        snap = hqi.filter(F.col("data_date") == F.lit(d)).select(
            "facility_id", *attr_cols, "data_date"
        )
        history = scd2_apply(
            history, snap, ["facility_id"], attr_cols, "data_date"
        )
        # keep the replay's lineage short: materialize each round so the
        # plan does not grow linearly with snapshot count
        history = history.localCheckpoint()
    return history


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    effective_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one snapshot to an SCD2 history table.

    ``history`` rows carry ``valid_from``/``valid_to`` (null = open).
    For each update row: if the key is new or its attributes differ from
    the key's open row, the open row is closed at the effective date and
    a new open version is inserted; unchanged updates are no-ops
    (idempotent re-delivery).  Returns the new history DataFrame.
    """
    keys = list(keys)
    eff = F.col(effective_col)

    open_rows = history.filter(F.col(valid_to).isNull())
    closed_rows = history.filter(F.col(valid_to).isNotNull())

    u = updates.select(
        *keys,
        *[F.col(c).alias(f"_u_{c}") for c in attr_cols],
        eff.alias("_eff"),
    )
    j = open_rows.join(u, keys, "full_outer")

    differs = None
    for c in attr_cols:
        d = ~F.col(c).eqNullSafe(F.col(f"_u_{c}"))
        differs = d if differs is None else (differs | d)
    has_open = F.col(valid_from).isNotNull()
    has_update = F.col("_eff").isNotNull()

    # 1) open rows with no update, or update identical -> stay open
    unchanged_open = j.filter(
        has_open & (~has_update | ~differs)
    ).select(*keys, *attr_cols, valid_from, F.lit(None).cast("date").alias(valid_to))

    # 2) open rows superseded by a differing update -> closed at _eff
    newly_closed = j.filter(has_open & has_update & differs).select(
        *keys, *attr_cols, valid_from, F.col("_eff").cast("date").alias(valid_to)
    )

    # 3) differing update or brand-new key -> new open version
    new_open = j.filter(has_update & (~has_open | differs)).select(
        *keys,
        *[F.col(f"_u_{c}").alias(c) for c in attr_cols],
        F.col("_eff").cast("date").alias(valid_from),
        F.lit(None).cast("date").alias(valid_to),
    )

    return (
        closed_rows.select(*keys, *attr_cols, valid_from, valid_to)
        .unionByName(unchanged_open)
        .unionByName(newly_closed)
        .unionByName(new_open)
    )
