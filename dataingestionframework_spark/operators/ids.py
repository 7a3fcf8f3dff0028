"""Scalable global row numbering.

``row_number() OVER (ORDER BY ...)`` plans a single-partition window —
every row through one task, the classic cluster-killer for "assign
contiguous example ids before sharding". The scalable form is the
two-pass offset scheme (the same idea as ``zipWithIndex``, kept inside
the DataFrame API so Catalyst sees it):

1. bucket rows by a monotone function of the leading sort key;
2. count rows per bucket (tiny aggregate), turn counts into cumulative
   offsets — the only global sort in the plan runs over the
   bucket-cardinality table, not the data;
3. broadcast the offsets back and window WITHIN each bucket, which
   hash-partitions by bucket and runs every partition in parallel.

``id == offset(bucket) + local row_number`` equals the global
row_number exactly because the bucket function is monotone in the sort
key. Capability extension; public pattern (Spark's own zipWithIndex,
RDD.scala).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_row_ids(
    df: DataFrame,
    order_cols: list[str],
    bucket: Column,
    id_name: str = "dense_id",
    start: int = 1,
) -> DataFrame:
    """Contiguous ids ``start, start+1, ...`` in ``order_cols`` order
    without a single-partition window over the data.

    ``bucket`` must be monotone non-decreasing in the leading sort key
    (e.g. ``floor(col / width)`` for numerics, or range boundaries from
    sampled quantiles) and the full ``order_cols`` tuple must be a
    total order (append a unique key). Bucket cardinality should be
    modest (hundreds-thousands): the offset table is the only thing
    globally sorted and is broadcast back.
    """
    b = df.withColumn("__bucket", bucket)
    counts = b.groupBy("__bucket").agg(F.count("*").alias("__cnt"))
    # cumulative count of all EARLIER buckets = this bucket's offset;
    # the single-partition window here is over len(counts) rows only
    cum = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__cnt").over(cum), F.lit(0)).alias("__offset"),
    )
    local = Window.partitionBy("__bucket").orderBy(*order_cols)
    return (
        b.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            id_name,
            (F.row_number().over(local) + F.col("__offset") + F.lit(start - 1)).cast(
                "long"
            ),
        )
        .drop("__bucket", "__offset")
    )
