"""Join operators Spark lacks natively.

As-of join: for each left row, the most recent right row at-or-before
its timestamp, per key. Spark has no native ASOF JOIN (DuckDB/pandas
do); the scalable formulation is the union+window trick:

    tag both sides → union → window (key ORDER BY ts, right-first on
    ties) → last_value(right cols) ignoring nulls → keep left rows

One shuffle on the key, no range-explosion, no pandas. This beats both
the naive range-join (quadratic per key) and ``merge_asof`` inside
``applyInPandas`` (Python + full data through Arrow) at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) left side with a
    deterministic per-row salt, replicate the right side ``salt`` ways,
    join on (key, salt). A single hot key spreads over ``salt`` tasks.

    AQE's skew-join split (on by default here) handles most skew at
    runtime; explicit salting is for the pathological single-key case
    AQE can't split further, or for deterministic layout control.
    Deterministic salt (hash of all left columns) keeps retries stable.
    """
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("_salt", salt_col.cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, [on, "_salt"], how).drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row: columns of the latest right row with
    ``right.ts <= left.ts`` on the same key (NULLs if none).

    ``tolerance_seconds`` drops matches older than the tolerance
    (like pandas ``merge_asof(tolerance=...)``).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    l = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in right_cols],
    ).withColumn("_rts", F.col("_ts"))

    lcols = left.columns
    unioned = l.select(
        *[F.col(c) for c in lcols],
        "_side",
        "_ts",
        F.lit(None).cast("timestamp").alias("_rts"),
        *[F.lit(None).cast(dict(r.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
    ).unionByName(
        r.select(
            *[
                F.col(on) if c == on else F.lit(None).cast(dict(l.dtypes).get(c, "string")).alias(c)
                for c in lcols
            ],
            "_side",
            "_ts",
            "_rts",
            *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        )
    )

    # right rows sort before left rows at the same instant (asof is <=)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[F.col(c) for c in lcols],
        "_side",
        "_ts",
        F.last("_rts", ignorenulls=True).over(w).alias("_match_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    out = filled.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.col("_ts").cast("timestamp").cast("double")
            - F.col("_match_ts").cast("timestamp").cast("double")
        ) <= tolerance_seconds
        out = out.select(
            *[F.col(c) for c in lcols],
            F.when(in_tol, F.col("_match_ts")).alias("_match_ts"),
            *[
                F.when(in_tol, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in right_cols
            ],
        )
    return out.withColumnRenamed("_match_ts", f"{right_ts}{suffix}").drop("_side", "_ts")
