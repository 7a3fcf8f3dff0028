"""Scheduling: quartz-cron evaluation, SLA cutoff, day-of-week flags.

Replaces the reference's Databricks-Jobs control plane:

- job creation with cron + timeouts (``modules/create_workflow_jobs.py:179-366``)
- the SLA-driven runner that starts due jobs and cancels ones past
  their cutoff (``notebooks/Run jobs.py:81-202``)
- the cron "description" UDF (``modules/validate_configurations.py:50-54``,
  which wraps ``cron_descriptor`` but is actually applied with pandas)

All pure Python on the driver — scheduling decisions are metadata, not
data. The runner executes pipelines through the normal library path.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, time, timedelta

from ..specs import IngestionSpec

_DOW_NAMES = ["SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT"]
_MON_NAMES = ["", "JAN", "FEB", "MAR", "APR", "MAY", "JUN",
              "JUL", "AUG", "SEP", "OCT", "NOV", "DEC"]


def _parse_field(field: str, lo: int, hi: int, names: list[str] | None = None) -> set[int]:
    """One quartz cron field → the set of matching values."""
    field = field.strip().upper()
    if names:
        for i, n in enumerate(names):
            if n:
                field = field.replace(n, str(i))
    out: set[int] = set()
    for part in field.split(","):
        if part in ("*", "?"):
            return set(range(lo, hi + 1))
        step = 1
        if "/" in part:
            part, step_s = part.split("/")
            step = int(step_s)
            if part in ("*", ""):
                part = f"{lo}-{hi}"
        if "-" in part:
            a, b = part.split("-")
            out.update(range(int(a), int(b) + 1, step))
        else:
            v = int(part)
            out.update(range(v, hi + 1, step) if step > 1 else [v])
    return out


def _nearest_weekday(year: int, month: int, day: int) -> int | None:
    """Quartz ``nW``: the weekday (Mon-Fri) nearest to ``day``, without
    leaving the month. Months lacking day ``n`` don't fire at all
    (quartz skips them — e.g. ``31W`` never fires in September)."""
    import calendar

    last = calendar.monthrange(year, month)[1]
    if day > last:
        return None
    wd = datetime(year, month, day).weekday()  # Mon=0..Sun=6
    if wd == 5:  # Saturday → Friday, unless that leaves the month
        return day - 1 if day > 1 else day + 2
    if wd == 6:  # Sunday → Monday, unless that leaves the month
        return day + 1 if day < last else day - 2
    return day


@dataclass
class CronSchedule:
    """Quartz 6/7-field cron: sec min hour dom mon dow [year].

    Supports the syntax the reference's configs use (``0 0 3 * * ?``)
    plus lists/ranges/steps/names and the quartz day specials:
    ``L`` / ``L-n`` / ``nW`` / ``LW`` in day-of-month, ``nL`` (last
    weekday-n of month) and ``dow#n`` (nth weekday of month) in
    day-of-week.
    """

    expr: str

    def __post_init__(self):
        f = self.expr.split()
        if len(f) not in (6, 7):
            raise ValueError(f"expected 6/7-field quartz cron, got {self.expr!r}")
        self.seconds = _parse_field(f[0], 0, 59)
        self.minutes = _parse_field(f[1], 0, 59)
        self.hours = _parse_field(f[2], 0, 23)
        self.months = _parse_field(f[4], 1, 12, _MON_NAMES)

        dom_raw = f[3].strip().upper()
        self._dom_special: tuple | None = None
        if dom_raw == "LW":
            self._dom_special = ("LW",)
            self.dom = set()
        elif dom_raw == "L" or dom_raw.startswith("L-"):
            offset = int(dom_raw[2:]) if dom_raw.startswith("L-") else 0
            self._dom_special = ("L", offset)
            self.dom = set()
        elif dom_raw.endswith("W") and dom_raw[:-1].isdigit():
            self._dom_special = ("W", int(dom_raw[:-1]))
            self.dom = set()
        else:
            self.dom = _parse_field(dom_raw, 1, 31)

        # quartz: 1=SUN..7=SAT; normalize to 0=SUN..6=SAT
        raw = f[5].strip().upper()
        for i, n in enumerate(_DOW_NAMES):
            raw = raw.replace(n, str(i + 1))
        self._dow_special: tuple | None = None
        if "#" in raw:
            d, nth = raw.split("#")
            self._dow_special = ("#", (int(d) - 1) % 7, int(nth))
            self.dow = set()
        elif raw == "L":
            # quartz: bare L in day-of-week means Saturday
            self.dow = {6}
        elif raw.endswith("L") and raw[:-1].isdigit():
            self._dow_special = ("L", (int(raw[:-1]) - 1) % 7)
            self.dow = set()
        else:
            self.dow = {
                (v - 1) % 7 for v in _parse_field(raw, 0, 7)
            } if raw not in ("*", "?") else set(range(7))

        self._dom_any = dom_raw in ("*", "?") and self._dom_special is None
        self._dow_any = raw in ("*", "?") and self._dow_special is None

    def _dom_matches(self, dt: datetime) -> bool:
        import calendar

        if self._dom_special is None:
            return dt.day in self.dom
        last = calendar.monthrange(dt.year, dt.month)[1]
        kind = self._dom_special[0]
        if kind == "L":
            return dt.day == last - self._dom_special[1]
        if kind == "W":
            return dt.day == _nearest_weekday(dt.year, dt.month, self._dom_special[1])
        # LW: last weekday of the month
        d = last
        while datetime(dt.year, dt.month, d).weekday() >= 5:
            d -= 1
        return dt.day == d

    def _dow_matches(self, dt: datetime) -> bool:
        import calendar

        py_dow = (dt.weekday() + 1) % 7  # 0=SUN..6=SAT
        if self._dow_special is None:
            return py_dow in self.dow
        kind = self._dow_special[0]
        if kind == "L":  # last <dow> of the month
            last = calendar.monthrange(dt.year, dt.month)[1]
            return py_dow == self._dow_special[1] and dt.day > last - 7
        # '#': nth <dow> of the month
        _, want, nth = self._dow_special
        return py_dow == want and (dt.day - 1) // 7 + 1 == nth

    def matches(self, dt: datetime) -> bool:
        dom_constrained = not self._dom_any
        dow_constrained = not self._dow_any
        if dom_constrained and dow_constrained:
            day_ok = self._dom_matches(dt) or self._dow_matches(dt)
        elif dom_constrained:
            day_ok = self._dom_matches(dt)
        else:
            day_ok = self._dow_matches(dt)
        return (
            dt.second in self.seconds
            and dt.minute in self.minutes
            and dt.hour in self.hours
            and dt.month in self.months
            and day_ok
        )

    def next_fire(self, after: datetime, horizon_days: int = 366) -> datetime | None:
        """Next matching instant after ``after`` (minute resolution scan
        guided by the field sets; plenty for daily-grain schedules)."""
        t = after.replace(microsecond=0) + timedelta(seconds=1)
        end = after + timedelta(days=horizon_days)
        sec = min(self.seconds)
        while t <= end:
            if t.month not in self.months:
                t = (t.replace(day=1, hour=0, minute=0, second=0) + timedelta(days=32)).replace(day=1)
                continue
            if not self._dom_any and not self._dow_any:
                day_ok = self._dom_matches(t) or self._dow_matches(t)
            elif not self._dom_any:
                day_ok = self._dom_matches(t)
            else:
                day_ok = self._dow_matches(t)
            if not day_ok:
                t = (t + timedelta(days=1)).replace(hour=0, minute=0, second=0)
                continue
            if t.hour not in self.hours:
                t = (t + timedelta(hours=1)).replace(minute=0, second=0)
                continue
            if t.minute not in self.minutes:
                t = (t + timedelta(minutes=1)).replace(second=0)
                continue
            if sec >= t.second:
                return t.replace(second=sec)
            t = (t + timedelta(minutes=1)).replace(second=0)
        return None


def describe_cron(expr: str) -> str:
    """Human description of the common quartz shapes (the reference
    renders this with the cron_descriptor package into job_config)."""
    try:
        c = CronSchedule(expr)
    except (ValueError, IndexError):
        return f"invalid cron: {expr}"
    if len(c.hours) == 1 and len(c.minutes) == 1 and len(c.dom) == 31 and len(c.dow) == 7:
        h, m = next(iter(c.hours)), next(iter(c.minutes))
        return f"daily at {h:02d}:{m:02d}"
    if len(c.hours) == 24 and len(c.minutes) == 1:
        return f"hourly at minute {next(iter(c.minutes)):02d}"
    if len(c.dow) < 7 and len(c.hours) == 1:
        days = "/".join(_DOW_NAMES[d] for d in sorted(c.dow))
        return f"at {next(iter(c.hours)):02d}:{next(iter(c.minutes)):02d} on {days}"
    return f"cron {expr}"


@dataclass
class SlaPolicy:
    """Reference ``Run jobs.py``: per-day run flags + HH:MM SLA cutoff."""

    run_days: set[int] | None = None       # 0=SUN..6=SAT; None = all
    sla_cutoff: time | None = None         # cancel if still running past this

    def should_run_today(self, now: datetime) -> bool:
        if self.run_days is None:
            return True
        return (now.weekday() + 1) % 7 in self.run_days

    def past_cutoff(self, now: datetime) -> bool:
        return self.sla_cutoff is not None and now.time() > self.sla_cutoff


class JobRunner:
    """Local scheduler loop: decide which specs are due, run them
    through the pipeline, alert on failure, cancel past SLA.

    ``tick(now)`` is pure decision logic (testable without sleeping);
    ``run_due`` executes. A Databricks/Airflow adapter would implement
    the same decide/execute split against its own API.
    """

    def __init__(
        self,
        pipeline,
        notifier=None,
        slas: dict[int, SlaPolicy] | None = None,
        min_retry_interval_s: float = 5.0,
        sleep_fn=None,
    ):
        import time as _time

        from .notifier import LoggingNotifier

        self.pipeline = pipeline
        self.notifier = notifier or LoggingNotifier()
        self.slas = slas or {}
        self.last_fired: dict[int, datetime] = {}
        # reference parity: min_retry_interval_millis=5000
        # (modules/create_workflow_jobs.py:278-280); sleep_fn injectable
        # so tests don't actually wait
        self.min_retry_interval_s = min_retry_interval_s
        self.sleep_fn = sleep_fn or _time.sleep
        self.attempts: dict[int, int] = {}

    def due(self, specs: list[IngestionSpec], now: datetime) -> list[IngestionSpec]:
        out = []
        for s in specs:
            sla = self.slas.get(s.header_id, SlaPolicy())
            if not sla.should_run_today(now) or sla.past_cutoff(now):
                continue
            if not s.job.cron:
                continue
            sched = CronSchedule(s.job.cron)
            prev = self.last_fired.get(s.header_id)
            nxt = sched.next_fire(prev or (now - timedelta(days=1)))
            if nxt is not None and nxt <= now:
                out.append(s)
        return out

    def run_due(self, specs: list[IngestionSpec], now: datetime | None = None) -> dict[int, str]:
        from datetime import timezone

        from .notifier import Alert

        now = now or datetime.now(timezone.utc).replace(tzinfo=None)
        results: dict[int, str] = {}
        for spec in self.due(specs, now):
            self.last_fired[spec.header_id] = now
            max_attempts = 1 + max(0, spec.job.retries)
            for attempt in range(1, max_attempts + 1):
                self.attempts[spec.header_id] = attempt
                try:
                    self.pipeline.run_batch(spec)
                    results[spec.header_id] = (
                        "succeeded" if attempt == 1 else f"succeeded (attempt {attempt})"
                    )
                    break
                except Exception as e:  # noqa: BLE001 — runner must keep going
                    if attempt < max_attempts:
                        # reference retries failed tasks up to JobSpec.retries
                        # times with a minimum interval between attempts
                        self.notifier.send(
                            Alert(
                                "warning",
                                f"ingest attempt {attempt} failed, retrying: "
                                f"{spec.source_name}",
                                str(e),
                                spec.header_id,
                            )
                        )
                        self.sleep_fn(self.min_retry_interval_s)
                        continue
                    results[spec.header_id] = f"failed: {e}"
                    self.notifier.send(
                        Alert(
                            "error",
                            f"ingest failed after {attempt} attempts: "
                            f"{spec.source_name}",
                            str(e),
                            spec.header_id,
                        )
                    )
        return results
