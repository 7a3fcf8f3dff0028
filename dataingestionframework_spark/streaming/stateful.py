"""Custom stateful streaming operators via ``applyInPandasWithState``.

Extension beyond the reference (which has no stateful streaming, T8).
State lives in Spark's checkpointed state store per key; the callback
sees Arrow batches, so the Python boundary is batch-granular.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
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
        # finite-only sum: pandas' skipna drops NaN/None but would
        # happily propagate ±Inf into the running state, diverging
        # from the batch oracle's isfinite filter (round-7 advice) —
        # non-finite readings are missing observations here too
        v = pdf["value"].to_numpy(dtype="float64", na_value=float("nan"))
        total += float(v[np.isfinite(v)].sum())
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

        from ..functions import is_finite

        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            # finite-only, zero-default sum: the streaming state starts
            # at 0.0 and skips non-finite readings — mirror both here
            F.round(
                F.coalesce(
                    F.sum(F.when(is_finite(F.col("value")), F.col("value"))),
                    F.lit(0.0),
                ),
                2,
            ).alias("total_value"),
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_counters,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE_SCHEMA = "start_ms long, end_ms long, n long"


def closed_user_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessions emitted ON CLOSE via event-time state timeout.

    The state carries (start, end, n) per user; each batch extends it
    and re-arms a timeout at ``session_end + gap``. When the watermark
    passes that point with no new events, Spark invokes the callback
    with ``hasTimedOut`` — the session row is emitted once and the state
    removed (bounded state at any corpus size: one small tuple per
    ACTIVE user, evicted on idle). Append mode: downstream sinks see
    each closed session exactly once.
    """
    gap_ms = gap_minutes * 60 * 1000

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                }
            )
            return
        lo = hi = None
        n_new = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts = pd.to_datetime(pdf["ts"])
            n_new += len(pdf)
            mn, mx = ts.min(), ts.max()
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        if n_new:
            lo_ms = int(lo.value // 1_000_000)
            hi_ms = int(hi.value // 1_000_000)
            if state.exists:
                s, e, n = state.get
                lo_ms, hi_ms, n_new = min(s, lo_ms), max(e, hi_ms), n + n_new
            state.update((lo_ms, hi_ms, n_new))
            state.setTimeoutTimestamp(hi_ms + gap_ms)
        yield pd.DataFrame(
            columns=["user_id", "session_start", "session_end", "n_events"]
        )

    return (
        events.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------

TWS_OUT_SCHEMA = (
    "user_id long, n_events long, total_value double, n_types long"
)


def _make_profile_processor():
    """Build the TWS profile processor CLASS at module level so its
    state algebra is testable WITHOUT the TWS transport: the container
    lacks protobuf (the TWS state-server protocol needs it — waiver in
    DEPLOY.md), so the stream path can't run here; instead the pytest
    drives ``handleInputRows`` directly against stub state handles over
    randomized micro-batch splits and asserts convergence to the batch
    aggregation. Only the wire protocol is left unexercised."""
    from pyspark.sql.streaming import StatefulProcessor

    class _Profile(StatefulProcessor):
        def init(self, handle):
            self._counts = handle.getValueState(
                "counts", "n long, total double"
            )
            self._types = handle.getMapState(
                "types", "t string", "seen boolean"
            )

        def handleInputRows(self, key, rows, timerValues):
            got = self._counts.get()
            n, total = got if got is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                # finite-only: mirror the batch fallback's is_finite
                # filter (pandas skipna drops NaN/None but not ±Inf)
                v = pdf["value"].to_numpy(dtype="float64", na_value=float("nan"))
                total += float(v[np.isfinite(v)].sum())
                for t in pdf["event_type"].unique():
                    self._types.updateValue((str(t),), (True,))
            self._counts.update((n, total))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "n_types": [n_types],
                }
            )

        def close(self):
            pass

    return _Profile


def running_user_profile_tws(events: DataFrame) -> DataFrame:
    """Per-user running profile on the Spark 4 ``transformWithState``
    API: event count + value sum in a ``ValueState``, the set of seen
    event types in a ``MapState`` (the state store holds one entry per
    (user, type) — no unbounded Python-side set). Emits the updated
    profile for every user seen in the micro-batch (update mode).

    The older ``applyInPandasWithState`` twin is
    :func:`running_user_counters`; this is the forward-looking surface
    (typed state handles, timers, TTL) introduced in Spark 4.0. Batch
    frames fall back to the equivalent one-pass aggregation.
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        from ..functions import is_finite

        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            # finite-only, zero-default sum: the streaming state starts
            # at 0.0 and skips non-finite readings — mirror both here
            F.round(
                F.coalesce(
                    F.sum(F.when(is_finite(F.col("value")), F.col("value"))),
                    F.lit(0.0),
                ),
                2,
            ).alias("total_value"),
            F.count_distinct("event_type").alias("n_types"),
        )

    return events.groupBy("user_id").transformWithStateInPandas(
        _make_profile_processor()(),
        outputStructType=TWS_OUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


EWMA_OUT_SCHEMA = "user_id long, n_seen long, ewma double"
EWMA_STATE_SCHEMA = "vals array<double>, n long"
EWMA_ALPHA = 0.5
EWMA_WINDOW = 8


def _update_ewma(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    vals, n = state.get if state.exists else ([], 0)
    vals = list(vals)
    rows = pd.concat(list(pdfs))
    # event-time order WITHIN the batch; cross-batch order is the
    # micro-batch arrival order (the parity query feeds time-split files)
    rows = rows.sort_values(["ts", "event_id"])
    for v in rows["value"]:
        # non-finite observations are MISSING (family contract shared
        # with ewma_finite / psi / seasonal_naive): they count toward
        # n_seen but never enter the value window — one NaN/±Inf would
        # otherwise poison every EWMA it stays in for 8 emissions
        fv = float(v) if v is not None else float("nan")
        if np.isfinite(fv):
            vals.append(fv)
        n += 1
    vals = vals[-EWMA_WINDOW:]
    state.update((vals, n))
    num = 0.0
    den = 0.0
    for i in range(len(vals)):          # i=0 → OLDEST retained value
        w = EWMA_ALPHA_POWERS[len(vals) - 1 - i]
        num += vals[i] * w
        den += w
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_seen": [n],
            # all-non-finite history → no estimate (NULL, matching the
            # oracle's sum(NULL)/sum(NULL))
            "ewma": [round(num / den, 4) if den > 0 else None],
        }
    )


EWMA_ALPHA_POWERS = [(1.0 - EWMA_ALPHA) ** i for i in range(EWMA_WINDOW)]


def running_user_ewma(events: DataFrame) -> DataFrame:
    """Per-user finite-window EWMA as CUSTOM STATEFUL STREAMING state:
    the state is the last ``EWMA_WINDOW`` values (bounded — the 100 TB
    requirement for unbounded streams), updated per micro-batch with
    Arrow-batched callbacks, emitted in update mode. The last emitted
    row per user equals the batch ``operators.windows.ewma_finite`` at
    that user's final event — the parity the gate checks.

    Batch frames fall back to the window-algebra form restricted to
    each user's last row.

    NULL-ts rows are dropped up front (missing-observation contract,
    uniform across the time-series family): an EWMA is time-ordered,
    and a row with no timestamp has no position in the order — nor do
    engines agree where NULL would sort.
    """
    from pyspark.sql import functions as _F

    events = events.filter(_F.col("ts").isNotNull())
    if not events.isStreaming:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from ..functions import is_finite

        from ..operators.windows import ewma_finite

        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        # family contract: non-finite observations count toward n_seen
        # but never enter the value window (mirrors _update_ewma)
        e = ewma_finite(
            events.filter(is_finite(F.col("value"))),
            "value", ["user_id"], ["ts", "event_id"],
            alpha=EWMA_ALPHA, window=EWMA_WINDOW,
        )
        last = (
            e.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("user_id", F.round("ewma", 4).alias("ewma"))
        )
        ns = events.groupBy("user_id").agg(F.count("*").alias("n_seen"))
        # null-safe: a NULL user is a real stream key (groupBy state
        # keys on it), so the count row must pick up its ewma too
        return ns.join(
            last, ns["user_id"].eqNullSafe(last["user_id"]), "left"
        ).select(ns["user_id"], "n_seen", "ewma")
    return events.groupBy("user_id").applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
