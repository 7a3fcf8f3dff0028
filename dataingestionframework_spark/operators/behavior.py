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
    granularity: str = "day",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention triangle: users are cohorted by their FIRST
    activity period (day or week); each later active period counts
    them at its offset from the cohort period — the classic retention
    matrix (cohort × offset → distinct active users).

    Two aggregates and one join on the user key (first-seen per user,
    then cohort×offset distinct count) — never the naive event-log
    self-join, which is quadratic-prone at 100 TB. Integers and
    dates/timestamps end to end, engine-exact.

    Output: daily → (cohort_day date, day_offset int, n_active long);
    weekly → (cohort_wk timestamp, week_offset int, n_active long).
    """
    if granularity == "day":
        period = F.to_date(ts_col)
        cohort_name, offset_name = "cohort_day", "day_offset"
    elif granularity == "week":
        period = F.date_trunc("week", F.col(ts_col))
        cohort_name, offset_name = "cohort_wk", "week_offset"
    else:
        raise ValueError(f"granularity must be day|week, got {granularity!r}")
    ev = events.select(F.col(user_col).alias("_u"), period.alias("_p"))
    first = ev.groupBy("_u").agg(F.min("_p").alias(cohort_name))
    joined = ev.join(first, "_u")
    if granularity == "day":
        offset = F.datediff("_p", cohort_name)
    else:
        # date-based, not timestamp-seconds/604800: date_trunc('week')
        # boundaries are 7d±1h apart across DST transitions, and
        # floor((7d-1h)/7d) = 0 would assign activity to the wrong
        # week. datediff on dates is calendar-exact in any timezone.
        offset = F.floor(
            F.datediff(F.to_date("_p"), F.to_date(cohort_name)) / 7
        ).cast("int")
    out = (
        joined.withColumn(offset_name, offset)
        .groupBy(cohort_name, offset_name)
        .agg(F.count_distinct("_u").alias("n_active"))
    )
    if max_offset is not None:
        out = out.filter(F.col(offset_name) <= max_offset)
    return out
