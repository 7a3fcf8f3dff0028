"""Event-sequence behavioral analytics: ordered funnels and cohort
retention — the two classic event-table rollups every product/ops
pipeline runs next to sessionization.

Reference parity: the reference's event surface stops at ingesting the
events table (``modules/auto_loader_steps.py`` streams it into Delta);
these are the standard downstream queries its users run on Databricks
SQL, re-expressed as engine operators so they gate like everything
else.

Both operators are pure joins/aggregations keyed on ``user_id`` — the
per-step funnel joins reuse one hash partitioning, and cohort math is
two aggregates — so cost is linear in events at any scale; no windows
over the full table, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_conversions(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """ORDERED funnel: how many users performed step₁, then step₂
    STRICTLY AFTER their first step₁, then step₃ strictly after that
    earliest valid step₂, … (the standard first-touch funnel — each
    stage anchors at the earliest event that continues the sequence,
    which maximizes downstream conversions, so counts are the true
    ordered maximum, not an arbitrary-path sample).

    Plan: one filtered min-aggregate per step, each joined to the
    previous step's anchor times — L small hash joins all keyed on the
    user, reusing one partitioning; no per-user event sorting, no
    window over the raw table.

    Output: (step_idx, step_name, n_users), step_idx 1-based.
    """
    if not steps:
        raise ValueError("funnel_conversions needs at least one step")
    spark = events.sparkSession
    anchors: DataFrame | None = None
    counts: list[tuple[int, str, int]] = []
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        if anchors is None:
            anchors = ev.groupBy("_u").agg(F.min("_ts").alias("_anchor"))
        else:
            anchors = (
                ev.join(anchors, "_u")
                .filter(F.col("_ts") > F.col("_anchor"))
                .groupBy("_u")
                .agg(F.min("_ts").alias("_anchor"))
            )
        anchors = anchors.localCheckpoint()  # L tiny user-level frames
        counts.append((i + 1, step, anchors.count()))
    return spark.createDataFrame(
        counts, "step_idx int, step_name string, n_users long"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Daily cohort retention: users are cohorted by their FIRST
    activity day; each later active day counts them at
    ``day_offset = active_day − cohort_day``. The classic retention
    triangle (cohort × offset → distinct active users).

    Two aggregates and one join on the user key: first-day per user,
    then distinct (user, day) activity joined back — integers and
    dates end to end, engine-exact.

    Output: (cohort_day date, day_offset int, n_active long).
    """
    first = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.min(F.to_date(ts_col)).alias("cohort_day")
    )
    active = events.select(
        F.col(user_col).alias("_u"), F.to_date(ts_col).alias("_day")
    ).distinct()
    out = (
        active.join(first, "_u")
        .withColumn("day_offset", F.datediff("_day", "cohort_day"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
    )
    if max_offset is not None:
        out = out.filter(F.col("day_offset") <= max_offset)
    return out
