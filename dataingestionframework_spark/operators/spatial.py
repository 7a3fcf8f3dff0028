"""Spatial radius joins via uniform-grid blocking.

The distributed spatial-join recipe: bucket points into cells of side =
radius, explode ONE side to its 3×3 cell neighborhood, equi-join on the
cell key, verify exact distance only on in-cell candidates. Cost is
Σ cell_occupancy² over neighboring cells instead of n² — the same
bucket-then-verify architecture as the LSH dedup stack, with geometry
supplying the bucket function. Skewed cells (urban hot spots) are
ordinary hot hash-join keys: AQE skew-join splits them.

Only planar Euclidean geometry here (portable double math, engine-
reproducible). Haversine/great-circle drops in by swapping the distance
expression and sizing cells by max latitude distortion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def radius_self_join(
    df: DataFrame,
    radius: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All pairs (id_a < id_b) within Euclidean ``radius``.

    Each pair is emitted exactly once: the left side explodes to its
    9-cell neighborhood, the right side keeps its base cell, so a given
    (a, b) meets on exactly one cell key per orientation and the
    id_a < id_b filter keeps one orientation. No distinct needed, no
    Cartesian anywhere.

    Returns (id_a, id_b, dist) with dist rounded to 4 dp (same doubles
    both engines: the distance expression has a fixed operation order).
    """
    r = float(radius)
    pts = df.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
        F.floor(F.col(x_col).cast("double") / F.lit(r)).alias("cx"),
        F.floor(F.col(y_col).cast("double") / F.lit(r)).alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(offsets).alias("o"),
        F.col("cx"),
        F.col("cy"),
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    right = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy
    return (
        left.join(right, ["jx", "jy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d2 <= F.lit(r * r))
        .select("id_a", "id_b", F.round(F.sqrt(d2), 4).alias("dist"))
    )
