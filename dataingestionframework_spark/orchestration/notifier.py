"""Alert/notification interface.

The reference hard-wires Google Chat webhook cards
(``modules/send_google_chat.py:24-139``). Ours is a pluggable interface:
:class:`LoggingNotifier` (default) and :class:`CollectingNotifier` for
local use, plus :class:`WebhookNotifier` — a vendor-neutral HTTP POST of
the same severity/title/body/sections card content, stdlib-only. No
notifier is wired into pipelines implicitly; callers opt in.
"""

from __future__ import annotations

import json
import logging
import urllib.error
import urllib.request
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


def alert_card(alert: Alert) -> dict:
    """Vendor-neutral card payload — the same content the reference's
    chat cards carry (``modules/send_google_chat.py:24-139``: colored
    severity header, source/job section, message body, timestamp), but
    as plain JSON any webhook consumer (chat adapter, pager, log
    collector) can map onto its own card schema."""
    return {
        "severity": alert.severity,
        "title": alert.title,
        "header_id": alert.header_id,
        "created_at": alert.created_at.isoformat(),
        "card": {
            "header": {
                "title": alert.title,
                "subtitle": f"severity={alert.severity}",
            },
            "sections": [
                {"label": "message", "text": alert.body},
                {"label": "header_id", "text": str(alert.header_id)},
                {"label": "time", "text": alert.created_at.isoformat()},
            ],
        },
    }


class WebhookNotifier:
    """POST alerts as JSON cards to an arbitrary webhook URL.

    stdlib ``urllib`` only; delivery failures are logged (and optionally
    raised) — an alerting hiccup must never take down the pipeline run
    that triggered it, matching the reference's fire-and-forget POST.
    """

    def __init__(
        self,
        url: str,
        timeout_s: float = 10.0,
        raise_on_error: bool = False,
        logger: logging.Logger | None = None,
    ):
        self.url = url
        self.timeout_s = timeout_s
        self.raise_on_error = raise_on_error
        self.logger = logger or logging.getLogger("dataingestionframework_spark.alerts")

    def send(self, alert: Alert) -> None:
        body = json.dumps(alert_card(alert)).encode("utf-8")
        req = urllib.request.Request(
            self.url,
            data=body,
            headers={"Content-Type": "application/json; charset=UTF-8"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                resp.read()
        except (urllib.error.URLError, OSError) as e:
            self.logger.error("webhook delivery failed (%s): %s", self.url, e)
            if self.raise_on_error:
                raise
