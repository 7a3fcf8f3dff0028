"""Incrementally-maintained rollup tables (continuous aggregates).

Generalizes the reference's daily report materialization
(``notebooks/Autoloader_daily_log_report.sql:237-277`` — DELETE today +
INSERT recompute) into a streaming-maintained aggregate: each
micro-batch's partial aggregate is MERGEd into the rollup table, so the
rollup is always current and each batch costs O(batch), not O(table).

The merge combines partials additively (count/sum) — the standard
commutative-monoid trick that makes the maintenance exactly-once-safe
per epoch when combined with the pipeline's EPOCH_COMMIT guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog.table import ManagedTable


def rollup_batch(
    batch_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "hour",
) -> DataFrame:
    """Partial aggregate of one micro-batch."""
    return (
        batch_df.groupBy(
            F.date_trunc(window, F.col(ts_col)).alias("bucket"), F.col(key_col)
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )


def merge_rollup(table: ManagedTable, partial: DataFrame, key_col: str = "event_type") -> None:
    """Additively merge a batch partial into the rollup table."""
    if not table.exists():
        table.create(partial.schema)
    table.merge(
        partial,
        on=["bucket", key_col],
        when_matched_update={
            "n": F.col("tgt.n") + F.col("src.n"),
            "total_value": F.col("tgt.total_value") + F.col("src.total_value"),
        },
        when_not_matched_insert=True,
    )


def streaming_rollup(
    events_stream: DataFrame,
    table: ManagedTable,
    checkpoint: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "hour",
    bounded: bool = True,
):
    """Maintain ``table`` as the always-current windowed rollup of the
    stream. foreachBatch → partial agg → additive MERGE.

    The additive MERGE double-counts a redelivered micro-batch
    (foreachBatch is at-least-once), so the handle skips epochs already
    recorded in the table's epoch sidecar — the same
    :func:`~dataingestionframework_spark.session.store_epoch` guard the
    psi/cms/kmeans stores carry; this is what makes the docstring's
    "exactly-once-safe per epoch" claim true rather than aspirational.
    Like those stores, the rollup table couples to ONE checkpoint
    lineage: epoch ids restart at 0 under a fresh checkpoint, so a new
    checkpoint needs a new (or truncated) rollup table.
    """
    from ..session import record_store_epoch, store_epoch

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if epoch_id <= store_epoch(spark, table.root):
            return  # at-least-once redelivery of a merged epoch
        merge_rollup(table, rollup_batch(batch_df, ts_col, key_col, window), key_col)
        record_store_epoch(spark, table.root, epoch_id)

    writer = (
        events_stream.writeStream.foreachBatch(handle)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if bounded:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(120)
        return q
    return writer.trigger(processingTime="1 seconds").start()
