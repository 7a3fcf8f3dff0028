"""Custom stateful streaming operators via ``applyInPandasWithState``.

Extension beyond the reference (which has no stateful streaming, T8).
State lives in Spark's checkpointed state store per key; the callback
sees Arrow batches, so the Python boundary is batch-granular.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_counters(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_counters(events: DataFrame) -> DataFrame:
    """Running per-user event count + value sum, emitted every batch.

    Streaming: checkpointed state, update mode. Batch frames fall back
    to a plain aggregation (the state of a bounded input after one pass).
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_counters,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
