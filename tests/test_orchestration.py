"""Scheduler: cron parsing/eval, SLA, runner loop, notifier, maintenance."""

import os
from datetime import datetime, time

import pytest

from dataingestionframework_spark.orchestration.notifier import Alert, CollectingNotifier
from dataingestionframework_spark.orchestration.scheduler import (
    CronSchedule,
    JobRunner,
    SlaPolicy,
    describe_cron,
)
from dataingestionframework_spark.specs import ColumnSpec, IngestionSpec, JobSpec


def test_cron_daily_3am():
    c = CronSchedule("0 0 3 * * ?")  # the reference's own schedule
    assert c.matches(datetime(2026, 8, 13, 3, 0, 0))
    assert not c.matches(datetime(2026, 8, 13, 4, 0, 0))
    nxt = c.next_fire(datetime(2026, 8, 13, 4, 0, 0))
    assert nxt == datetime(2026, 8, 14, 3, 0, 0)
    nxt2 = c.next_fire(datetime(2026, 8, 13, 2, 59, 59))
    assert nxt2 == datetime(2026, 8, 13, 3, 0, 0)


def test_cron_fields():
    c = CronSchedule("0 */15 8-17 * * MON-FRI")
    assert c.matches(datetime(2026, 8, 12, 9, 30, 0))   # Wednesday
    assert not c.matches(datetime(2026, 8, 15, 9, 30, 0))  # Saturday
    assert not c.matches(datetime(2026, 8, 12, 9, 20, 0))
    assert describe_cron("0 0 3 * * ?") == "daily at 03:00"
    assert "invalid" in describe_cron("nope")


def test_cron_day_specials():
    # L: last day of month (Feb 2026 = 28th)
    last = CronSchedule("0 0 3 L * ?")
    assert last.matches(datetime(2026, 2, 28, 3, 0, 0))
    assert not last.matches(datetime(2026, 2, 27, 3, 0, 0))
    assert last.next_fire(datetime(2026, 2, 1, 0, 0, 0)) == datetime(2026, 2, 28, 3, 0, 0)
    # L-2: two days before the last day
    assert CronSchedule("0 0 3 L-2 * ?").matches(datetime(2026, 2, 26, 3, 0, 0))
    # 15W: nearest weekday to the 15th (Aug 15 2026 = Saturday → Friday 14th)
    w = CronSchedule("0 0 3 15W * ?")
    assert w.matches(datetime(2026, 8, 14, 3, 0, 0))
    assert not w.matches(datetime(2026, 8, 15, 3, 0, 0))
    # LW: last weekday of the month (Aug 31 2026 = Monday)
    lw = CronSchedule("0 0 3 LW * ?")
    assert lw.matches(datetime(2026, 8, 31, 3, 0, 0))
    # 6L: last Friday of the month (quartz 6=FRI; Aug 2026 → the 28th)
    fl = CronSchedule("0 0 3 ? * 6L")
    assert fl.matches(datetime(2026, 8, 28, 3, 0, 0))
    assert not fl.matches(datetime(2026, 8, 21, 3, 0, 0))
    # MON#2: second Monday (Aug 2026 → the 10th)
    nth = CronSchedule("0 0 3 ? * MON#2")
    assert nth.matches(datetime(2026, 8, 10, 3, 0, 0))
    assert not nth.matches(datetime(2026, 8, 3, 3, 0, 0))
    assert nth.next_fire(datetime(2026, 8, 1, 0, 0, 0)) == datetime(2026, 8, 10, 3, 0, 0)


def test_sla_policy():
    sla = SlaPolicy(run_days={1, 2, 3, 4, 5}, sla_cutoff=time(18, 0))
    assert sla.should_run_today(datetime(2026, 8, 12, 9, 0))      # Wed
    assert not sla.should_run_today(datetime(2026, 8, 15, 9, 0))  # Sat
    assert sla.past_cutoff(datetime(2026, 8, 12, 19, 0))
    assert not sla.past_cutoff(datetime(2026, 8, 12, 12, 0))


class _FakePipeline:
    def __init__(self, fail_ids=(), fail_times=None):
        self.ran = []
        self.fail_ids = set(fail_ids)
        # header_id -> how many leading attempts raise (then succeed)
        self.fail_times = dict(fail_times or {})

    def run_batch(self, spec):
        self.ran.append(spec.header_id)
        hid = spec.header_id
        if self.fail_times.get(hid, 0) > 0:
            self.fail_times[hid] -= 1
            raise RuntimeError("transient boom")
        if hid in self.fail_ids:
            raise RuntimeError("boom")


def _spec(hid, cron="0 0 3 * * ?"):
    return IngestionSpec(
        header_id=hid, source_name=f"s{hid}", table_name=f"main.s{hid}",
        source_path="/tmp/x", file_format="csv",
        columns=[ColumnSpec("a", "a", "int", 1)],
        job=JobSpec(cron=cron),
    )


def test_runner_fires_due_jobs_and_alerts():
    pipe = _FakePipeline(fail_ids={2})
    notifier = CollectingNotifier()
    runner = JobRunner(pipe, notifier, sleep_fn=lambda s: None)
    specs = [_spec(1), _spec(2)]
    now = datetime(2026, 8, 13, 3, 0, 30)
    results = runner.run_due(specs, now)
    assert results[1] == "succeeded" and results[2].startswith("failed")
    # hard failure: JobSpec.retries=2 → 3 attempts, 2 retry warnings + 1 error
    assert pipe.ran == [1, 2, 2, 2]
    assert [a.severity for a in notifier.alerts] == ["warning", "warning", "error"]
    assert all(a.header_id == 2 for a in notifier.alerts)
    # second tick same day: not due again
    assert runner.run_due(specs, datetime(2026, 8, 13, 3, 5, 0)) == {}


def test_runner_retries_transient_failure_then_succeeds():
    """Reference parity (modules/create_workflow_jobs.py:278-280): a
    failed run is re-attempted up to JobSpec.retries times with a
    minimum interval; a transient failure ends in success."""
    pipe = _FakePipeline(fail_times={1: 1})
    notifier = CollectingNotifier()
    slept = []
    runner = JobRunner(pipe, notifier, sleep_fn=slept.append,
                       min_retry_interval_s=5.0)
    results = runner.run_due([_spec(1)], datetime(2026, 8, 13, 3, 0, 30))
    assert results[1] == "succeeded (attempt 2)"
    assert pipe.ran == [1, 1]
    assert runner.attempts[1] == 2
    assert slept == [5.0]  # min retry interval honored between attempts
    assert [a.severity for a in notifier.alerts] == ["warning"]  # no error


def test_runner_no_retries_when_disabled():
    spec = _spec(1)
    spec.job.retries = 0
    pipe = _FakePipeline(fail_ids={1})
    runner = JobRunner(pipe, CollectingNotifier(), sleep_fn=lambda s: None)
    results = runner.run_due([spec], datetime(2026, 8, 13, 3, 0, 30))
    assert results[1].startswith("failed") and pipe.ran == [1]


def test_cron_dow_bare_L_and_w_skips_short_months():
    # bare L in day-of-week = Saturday (quartz)
    sat = CronSchedule("0 0 3 ? * L")
    assert sat.matches(datetime(2026, 8, 15, 3, 0, 0))      # Saturday
    assert not sat.matches(datetime(2026, 8, 14, 3, 0, 0))  # Friday
    # 31W in a 30-day month: quartz skips the month entirely
    w31 = CronSchedule("0 0 3 31W * ?")
    assert not any(
        w31.matches(datetime(2026, 9, d, 3, 0, 0)) for d in range(1, 31)
    )
    assert w31.matches(datetime(2026, 8, 31, 3, 0, 0))      # Monday the 31st


def test_webhook_notifier_posts_card():
    import http.server
    import json
    import threading

    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append(
                (self.path, self.headers["Content-Type"], json.loads(self.rfile.read(n)))
            )
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, *a):
            pass

    from dataingestionframework_spark.orchestration.notifier import WebhookNotifier

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/hook"
        WebhookNotifier(url).send(Alert("error", "ingest failed: s1", "boom", 7))
        assert len(received) == 1
        path, ctype, payload = received[0]
        assert path == "/hook" and ctype.startswith("application/json")
        assert payload["severity"] == "error" and payload["header_id"] == 7
        assert payload["card"]["header"]["title"] == "ingest failed: s1"
        assert {s["label"] for s in payload["card"]["sections"]} == {
            "message", "header_id", "time",
        }
    finally:
        srv.shutdown()


def test_webhook_notifier_swallows_delivery_failure():
    from dataingestionframework_spark.orchestration.notifier import WebhookNotifier

    # nothing listens on this port; must not raise unless asked to
    n = WebhookNotifier("http://127.0.0.1:1/hook", timeout_s=0.2)
    n.send(Alert("info", "t", "b"))
    import pytest as _pytest

    strict = WebhookNotifier("http://127.0.0.1:1/hook", timeout_s=0.2, raise_on_error=True)
    with _pytest.raises(Exception):
        strict.send(Alert("info", "t", "b"))


def test_runner_respects_sla_cutoff():
    pipe = _FakePipeline()
    runner = JobRunner(pipe, CollectingNotifier(),
                       slas={1: SlaPolicy(sla_cutoff=time(4, 0))})
    # 5am > 4am cutoff → do not start
    assert runner.run_due([_spec(1)], datetime(2026, 8, 13, 5, 0, 0)) == {}


def test_runner_end_to_end_with_real_pipeline(spark, catalog, tmp_root):
    """Scheduler → pipeline → reconciliation, on real files."""
    import os

    from dataingestionframework_spark.ingest.pipeline import IngestionPipeline
    from dataingestionframework_spark.ingest.reconcile import PASS_FLAG, daily_report

    src = os.path.join(tmp_root, "sched_src")
    os.makedirs(src)
    with open(os.path.join(src, "f1.csv"), "w") as f:
        f.write("a\n1\n2\n3\n")
    pipe = IngestionPipeline(catalog)
    spec = IngestionSpec(
        header_id=31, source_name="sched", table_name="main.sched",
        source_path=src, file_format="csv", has_header=True,
        columns=[ColumnSpec("a", "a", "int", 1)],
        job=JobSpec(cron="0 0 3 * * ?"),
    )
    runner = JobRunner(pipe, CollectingNotifier())
    results = runner.run_due([spec], datetime(2026, 8, 13, 3, 0, 10))
    assert results == {31: "succeeded"}
    rep = daily_report(catalog, pipe.tables, [spec]).first()
    assert rep.RowCountMatchFlag == PASS_FLAG and rep.TableRowCount == 3


def test_optimize_zorder_clusters_files(spark, catalog):
    from dataingestionframework_spark.ingest.maintenance import optimize_table

    t = catalog.table("m.opt")
    df = spark.range(0, 10000).selectExpr("id", "id % 97 AS k", "rand(42) AS v")
    t.overwrite(df.repartition(16))
    optimize_table(t, zorder_cols=["k"], target_partitions=4)
    assert t.count() == 10000
    # clustered: each file's k-range is narrow → files are disjoint runs
    files = [f for f in os.listdir(t.data_dir()) if f.endswith(".parquet")]
    assert 1 <= len(files) <= 6


def test_wait_for_files(tmp_root):
    from dataingestionframework_spark.ingest.maintenance import wait_for_files

    empty = os.path.join(tmp_root, "empty")
    os.makedirs(empty)
    assert not wait_for_files(empty, timeout_s=0.3, poll_s=0.1)
    with open(os.path.join(empty, "x.csv"), "w") as f:
        f.write("a\n")
    assert wait_for_files(empty, timeout_s=2, poll_s=0.1)
