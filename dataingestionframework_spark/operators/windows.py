"""Window-function operators.

The reference has zero window functions — it emulates them with
union+group-by pivots (``notebooks/Autoloader_daily_log_report.sql:143-200``)
and correlated MAX subqueries (``notebooks/Data Ingestion Helper.py:237-242``).
These are the idiomatic replacements (SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_per_group(
    df: DataFrame, group_cols: list[str], order_col: str, k: int = 1, tiebreak: str | None = None
) -> DataFrame:
    """Top-k rows per group by ``order_col`` DESC (deterministic tiebreak)."""
    order = [F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: new session when the gap to the previous
    event exceeds ``gap_minutes``. lag + cumulative-sum — one shuffle on
    the key, both windows share the same partitioning (no second shuffle).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak))
    # cast-to-double keeps sub-second precision (unix_timestamp truncates);
    # the intermediate timestamp cast accepts TIMESTAMP_NTZ input too
    sec = F.col(ts_col).cast("timestamp").cast("double")
    prev_sec = F.lag(ts_col).over(w).cast("timestamp").cast("double")
    gap = sec - prev_sec
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-session aggregates over :func:`sessionize` output."""
    s = sessionize(df, key_col, ts_col, gap_minutes, tiebreak)
    return s.groupBy(key_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
