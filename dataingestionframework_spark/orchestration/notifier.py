"""Alert/notification interface.

The reference hard-wires Google Chat webhook cards
(``modules/send_google_chat.py:24-139``). Ours is a pluggable interface
with local implementations; a webhook implementation slots in without
touching pipeline code (and is intentionally NOT bundled — no network
side effects from a data engine).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Protocol


@dataclass
class Alert:
    severity: str            # "error" | "warning" | "info"
    title: str
    body: str
    header_id: int | None = None
    created_at: datetime = field(
        default_factory=lambda: datetime.now(timezone.utc)
    )


class Notifier(Protocol):
    def send(self, alert: Alert) -> None: ...


class LoggingNotifier:
    """Default: alerts go to the Python logger."""

    def __init__(self, logger: logging.Logger | None = None):
        self.logger = logger or logging.getLogger("dataingestionframework_spark.alerts")

    def send(self, alert: Alert) -> None:
        level = {"error": logging.ERROR, "warning": logging.WARNING}.get(
            alert.severity, logging.INFO
        )
        self.logger.log(level, "[header=%s] %s: %s", alert.header_id, alert.title, alert.body)


class CollectingNotifier:
    """Test double: keeps alerts in memory."""

    def __init__(self):
        self.alerts: list[Alert] = []

    def send(self, alert: Alert) -> None:
        self.alerts.append(alert)
