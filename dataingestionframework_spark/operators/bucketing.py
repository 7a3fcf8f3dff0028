"""Bucketed tables: shuffle-free co-located joins.

The 100 TB lever the brief calls out: write both join sides bucketed by
the join key (``bucketBy`` + ``saveAsTable``), and Catalyst plans the
join without an Exchange on either side — the bucket layout IS the
shuffle, paid once at write time and amortized over every later join.

The reference never partitions or buckets anything (SURVEY §4); this is
the layout-management capability its 100 TB deployment would need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally
    sorted) by the join key."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket counts Catalyst elides both shuffle Exchanges
    (verify with ``.explain``: no ``Exchange hashpartitioning`` above
    the scans)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
