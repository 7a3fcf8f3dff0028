"""Window-function operators.

The reference has zero window functions — it emulates them with
union+group-by pivots (``notebooks/Autoloader_daily_log_report.sql:143-200``)
and correlated MAX subqueries (``notebooks/Data Ingestion Helper.py:237-242``).
These are the idiomatic replacements (SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import is_finite


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

    NULL-ts rows are DROPPED (a missing timestamp is a missing
    observation — it belongs to no point on the session timeline, and
    engines disagree on where NULL sorts in a window ORDER BY, so any
    other treatment is engine-defined).
    """
    df = df.filter(F.col(ts_col).isNotNull())
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


def ewma_finite(
    df: DataFrame,
    value_col: str,
    partition_by: list[str],
    order_by: list[str],
    alpha: float = 0.5,
    window: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """Finite-window exponentially weighted moving average.

    True recursive EWMA needs unbounded recursion (not expressible as a
    window frame); the standard distributed form truncates the kernel:
    weights (1-α)^i over the last ``window`` rows, renormalized over
    the rows actually present, so the head of each partition is an
    expanding-window average, not a NULL ramp. Expressed as a fixed sum
    of ``lag`` terms — pure window expressions, whole-stage codegen'd,
    one shuffle on the partition keys. With (1-α)^window ≈ 1e-2..1e-3
    the truncation error is below any monitoring threshold; a larger
    ``window`` buys precision for ``window`` extra lag columns, still
    O(rows).

    The term order is fixed (i = 0..window-1, left-assoc adds), so the
    double result is bit-reproducible across engines that evaluate the
    same expression — the property the oracle twin relies on.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i in range(window):
        v = F.lag(F.col(value_col), i).over(w)
        wt = float((1.0 - alpha) ** i)
        num = num + F.coalesce(v, F.lit(0.0)) * F.lit(wt)
        den = den + F.when(v.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    # all-NULL window (e.g. NULL value_col at a partition head) -> NULL,
    # not 0.0/0.0 = NaN — matches trailing_zscore's NULL-on-degenerate
    # convention so downstream filters/rounding never see NaN.
    return df.withColumn(out_col, F.when(den > 0, num / den))


def autocorrelation(
    df: DataFrame,
    value_col: str,
    partition_by: list[str],
    order_by: list[str],
    lags: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Per-key autocorrelation function: Pearson corr(x_t, x_{t-k}) for
    each requested lag — the standard seasonality/persistence probe
    over a keyed series (hourly counts, daily volumes).

    This is the pairwise-complete ACF variant (corr over the (x_t,
    x_{t-k}) pairs that exist, each lag with its own pair mean), which
    is exactly SQL's ``corr(x, lag(x, k))`` — the property the oracle
    twin leans on; the classical biased estimator (global mean, /n)
    differs at the series edges. One shuffle on the partition keys;
    the lag columns ride a single window pass, the corr aggregates one
    hash agg. Output: (keys..., n, acf_<k>...).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    lagged = df.select(
        *partition_by,
        value_col,
        *[F.lag(value_col, k).over(w).alias(f"_lag{k}") for k in lags],
    )
    return lagged.groupBy(*partition_by).agg(
        F.count(value_col).alias("n"),
        *[
            F.round(F.corr(value_col, f"_lag{k}"), 4).alias(f"acf_{k}")
            for k in lags
        ],
    )


def cusum_changepoint(
    df: DataFrame,
    value_col: str,
    partition_by: list[str],
    order_by: list[str],
) -> DataFrame:
    """CUSUM change-point detection per key: the order position where
    the cumulative deviation from the series mean peaks — the classic
    level-shift locator for monitoring series.

    Exactness across engines: the deviation is kept in INTEGERS by
    scaling out the mean's division — S'_t = n·Σ_{i≤t} x_i − t·Σ x
    (= n·S_t where S_t is the usual cumsum of x−mean). The argmax and
    tie-break (earliest position) are then exact integer comparisons,
    immune to float summation order — which is what lets a SQL twin
    match bit-for-bit. ``value_col`` is cast to long (counts/amounts);
    two window passes over one shuffle on the keys.

    Output: one row per key — (keys..., order cols at the peak,
    max_dev = max |S'_t|, n_points).
    """
    keyw = Window.partitionBy(*partition_by)
    ordw = keyw.orderBy(*order_by)
    runw = ordw.rowsBetween(Window.unboundedPreceding, 0)
    v = F.col(value_col).cast("long")
    scored = df.select(
        *partition_by,
        *order_by,
        F.abs(
            F.count(F.lit(1)).over(keyw) * F.sum(v).over(runw)
            - F.row_number().over(ordw) * F.sum(v).over(keyw)
        ).alias("_dev"),
        F.count(F.lit(1)).over(keyw).alias("n_points"),
    )
    pick = F.row_number().over(
        keyw.orderBy(F.col("_dev").desc(), *order_by)
    )
    return (
        scored.withColumn("_pick", pick)
        .filter(F.col("_pick") == 1)
        .drop("_pick")
        .withColumnRenamed("_dev", "max_dev")
    )


def trailing_zscore(
    df: DataFrame,
    value_col: str,
    partition_by: list[str],
    order_by: list[str],
    lookback: int = 12,
    min_periods: int = 6,
    z_col: str = "z",
    n_col: str = "z_n",
) -> DataFrame:
    """Self-excluding trailing z-score for anomaly detection.

    Mean/stddev over ROWS BETWEEN ``lookback`` PRECEDING AND 1
    PRECEDING — the current row is excluded so a genuine spike cannot
    inflate its own baseline. ``z`` is NULL until ``min_periods``
    history rows exist or when the trailing stddev is 0 (constant
    history), so warm-up rows never alert. One shuffle on the
    partition keys; the frame aggregate is a single pass per
    partition.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-lookback, -1)
    )
    m = F.avg(value_col).over(w)
    s = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = F.when((n >= min_periods) & (s > 0), (F.col(value_col) - m) / s)
    return df.withColumn(n_col, n).withColumn(z_col, z)


def seasonal_naive_error(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_col: str = "event_type",
    period: int = 24,
) -> DataFrame:
    """Seasonality check via the seasonal-naive baseline (the MASE
    denominator of Hyndman's forecast-accuracy canon): aggregate to an
    hourly series per group, then compare the mean absolute error of
    the lag-``period`` forecast (same hour yesterday) against the
    lag-1 naive (previous hour). ratio < 1 ⇒ the series has real
    daily seasonality worth modeling; ≥ 1 ⇒ the 24 h pattern is noise.
    The standard pre-forecasting triage for metric pipelines.

    Plan: one tumbling-hour aggregate (linear scan), then TIME-BASED
    lags via equi self-joins on (group, hour − period h) and (group,
    hour − 1 h) over the HOURLY table (group-cardinality × hours rows
    — tiny), so the raw table is never window-sorted and the seasonal
    baseline really is "same hour ``period`` hours ago": on series
    with missing hours a row-offset lag would silently misalign (it
    means "``period`` observed hours back"), which round-6 advice
    flagged — hours with no observation ``period`` hours earlier now
    contribute NULL and drop out of the MAE, on both engines. Hourly
    sums are rounded to 6dp before differencing so both engines
    difference the same numbers.

    Output: (group, n_hours, mae_seasonal 4dp, mae_naive 4dp,
    mase_ratio 4dp; ratio NULL when mae_naive is 0).
    """
    # NULL / non-finite observations are MISSING rows (a single NaN
    # or ±Inf would poison its hour's sum, then overflow the
    # micro-unit integer cast; keeping NULL rows would manufacture
    # NULL-valued hours that count toward n_hours)
    finite = events.filter(is_finite(F.col(value_col)))
    hourly = (
        finite.groupBy(
            F.col(group_col).alias("_g"),
            F.date_trunc("hour", F.col(ts_col)).alias("_h"),
        )
        .agg(F.round(F.sum(value_col), 6).alias("_v"))
        # micro-unit parity envelope: beyond |sum| ≈ 1e8 a double's ulp
        # (~1.5e-8 at 1e8, growing linearly) approaches the 5e-7
        # half-boundary of the 6-dp round above, so engine-specific
        # summation order stops being absorbed by the rounding — and at
        # |diff| > 9.2e12 the ×1e6 BIGINT cast below overflows outright
        # (round-7 advice). Hours whose sums exceed the envelope are
        # excluded on BOTH engines (filtered on the already-rounded
        # value, which is bit-identical, so the exclusion set is too);
        # a series carrying such magnitudes belongs to the range
        # monitor, not a 4-dp seasonality triage.
        .filter(F.abs(F.col("_v")) <= F.lit(1e8))
    )
    p_season = hourly.select(
        "_g",
        (F.col("_h") + F.expr(f"INTERVAL {int(period)} HOURS")).alias("_h"),
        F.col("_v").alias("_vp"),
    )
    p_prev = hourly.select(
        "_g",
        (F.col("_h") + F.expr("INTERVAL 1 HOURS")).alias("_h"),
        F.col("_v").alias("_v1"),
    )
    # per-row absolute errors as integer MICRO-units: the hourly values
    # are 6dp, so abs-diff × 1e6 is (up to double noise ≪ 0.5) an exact
    # integer; integer sums are order-independent, which makes the MAE
    # bit-identical across engines — a plain avg(double) accumulates in
    # engine-specific order and can land on opposite sides of a 4dp
    # rounding boundary (observed: 74.48225 → 74.4823 vs 74.4822)
    d_season = F.round(F.abs(F.col("_v") - F.col("_vp")) * 1e6).cast("long")
    d_naive = F.round(F.abs(F.col("_v") - F.col("_v1")) * 1e6).cast("long")
    lagged = (
        hourly.join(p_season, ["_g", "_h"], "left")
        .join(p_prev, ["_g", "_h"], "left")
        .select("_g", d_season.alias("_dp"), d_naive.alias("_d1"))
    )
    return (
        lagged.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.count("*").alias("n_hours"),
            F.sum("_dp").alias("_sp"),
            F.count("_dp").alias("_np"),
            F.sum("_d1").alias("_s1"),
            F.count("_d1").alias("_n1"),
        )
        .select(
            group_col,
            "n_hours",
            # half-up 4dp rounding done in INTEGER arithmetic:
            # round(sum/(count*1e6), 4) = (2*sum + 100*count) div
            # (200*count) tenths-of-micro — engines' round(double, 4)
            # provably disagree on exact .00005 boundaries (observed
            # 74.48225 -> 74.4823 Spark vs 74.4822 DuckDB), integer
            # div cannot
            F.when(
                F.col("_np") > 0,
                F.expr("(2*_sp + 100*_np) div (200*_np)") / F.lit(1e4),
            ).alias("mae_seasonal"),
            F.when(
                F.col("_n1") > 0,
                F.expr("(2*_s1 + 100*_n1) div (200*_n1)") / F.lit(1e4),
            ).alias("mae_naive"),
        )
        .withColumn(
            "mase_ratio",
            F.when(
                F.col("mae_naive") > 0,
                F.round(F.col("mae_seasonal") / F.col("mae_naive"), 4),
            ),
        )
    )
