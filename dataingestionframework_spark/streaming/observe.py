"""Streaming observability (reference T9:
``query.isActive/lastProgress/awaitTermination`` polling,
``modules/auto_loader_steps.py:509-515``) — as a listener, not a poll loop."""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Records per-batch progress rows; queryable from tests/ops."""

    def __init__(self):
        self.progress: list[dict] = []
        self.terminated: list[str] = []
        self._lock = threading.Lock()

    def onQueryStarted(self, event):  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        observed = {}
        try:
            observed = {
                name: row.asDict() for name, row in p.observedMetrics.items()
            }
        except Exception:  # noqa: BLE001 — metrics are best-effort telemetry
            pass
        with self._lock:
            self.progress.append(
                {
                    "id": str(p.id),
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "inputRowsPerSecond": p.inputRowsPerSecond,
                    "observedMetrics": observed,
                }
            )

    def observed(self, name: str) -> list[dict]:
        """All recorded values of one named observe() tap, in batch order."""
        with self._lock:
            return [
                p["observedMetrics"][name]
                for p in self.progress
                if name in p.get("observedMetrics", {})
            ]

    def onQueryTerminated(self, event):  # noqa: N802
        with self._lock:
            self.terminated.append(str(event.id))

    def wait_for_progress(self, n: int = 1, timeout_s: float = 15.0) -> bool:
        """Block until ≥ n progress events arrived (listener delivery is
        ASYNC — a query can finish before its events are dispatched).
        Returns True if reached, False on timeout."""
        import time

        deadline = time.time() + timeout_s
        while time.time() < deadline:
            with self._lock:
                if len(self.progress) >= n:
                    return True
            time.sleep(0.1)
        return False

    def onQueryIdle(self, event):  # noqa: N802
        pass


def attach(spark: SparkSession) -> ProgressRecorder:
    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    return rec
