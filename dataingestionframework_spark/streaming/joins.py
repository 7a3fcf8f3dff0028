"""Stream-stream joins with event-time bounds.

Extension beyond the reference (whose streams never join). A
stream-stream inner join needs BOTH sides watermarked and a time-range
predicate so Spark can bound the join state: each side buffers only
rows younger than watermark + interval, evicting as event time
advances — state stays proportional to the interval, not the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    within: str = "1 hour",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``on`` where the right event happened at or
    before the left event and within ``within`` of it.

    ``how='left_outer'`` adds the null-extension semantics: an
    unmatched left row is emitted (right columns null) only once the
    watermark proves no matching right row can still arrive — so outer
    results trail the watermark delay, they are not instant. Right
    columns (except the key) come back prefixed. Works on batch frames
    too (same plan, no watermark needed) — which is exactly how the
    streaming result is oracle-checked in tests.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    rkey = f"{right_prefix}{on}"
    r = right.select(
        F.col(on).alias(rkey),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c != on
        ],
    )
    rts = f"{right_prefix}{right_ts}"
    # The time bounds must be INSIDE the join condition (not a
    # post-join filter) so Spark derives per-side state watermarks and
    # actually evicts buffered rows as event time advances.
    cond = (
        (F.col(on) == F.col(rkey))
        & (F.col(rts) <= F.col(left_ts))
        & (F.col(rts) >= F.col(left_ts) - F.expr(f"INTERVAL {within}"))
    )
    out = left.join(r, cond, how)
    # right-only rows (full_outer) carry the key only on the right side
    return out.withColumn(on, F.coalesce(F.col(on), F.col(rkey))).drop(rkey)
