"""Ingestion pipeline: batch + streaming, quarantine, PII, drift,
idempotent re-run, reconciliation report."""

import os

import pytest
from pyspark.sql import functions as F

from dataingestionframework_spark.catalog.system import SystemTables
from dataingestionframework_spark.errors import BadRecordsError
from dataingestionframework_spark.ingest.pipeline import IngestionPipeline
from dataingestionframework_spark.ingest.reconcile import PASS_FLAG, daily_report
from dataingestionframework_spark.specs import ColumnSpec, IngestionSpec

CSV_GOOD = "Id,Item,Dt,Value\n1,widget,2024-01-01,10.50\n2,gadget,2024-01-02,20.25\n"
CSV_BAD = "Id,Item,Dt,Value\n3,ok,2024-01-03,1.00\nnot-an-int,bad,xxxx,zz\n"
CSV_DRIFT = "Id,Item,Dt,Value,Color\n4,thing,2024-01-04,5.00,red\n"


def _cols():
    return [
        ColumnSpec("Id", "Id", "int", 1),
        ColumnSpec("Item", "ItemName", "string", 2, is_pii=True),
        ColumnSpec("Dt", "Dt", "date", 3),
        ColumnSpec("Value", "Value", "decimal(10,2)", 4),
    ]


def _spec(tmp_root, src_dir, **kw):
    defaults = dict(
        header_id=7,
        source_name="csvtest",
        table_name="main.csvtest",
        source_path=src_dir,
        file_format="csv",
        has_header=True,
        columns=_cols(),
        corrupt_location=os.path.join(tmp_root, "corrupt"),
        error_location=os.path.join(tmp_root, "errors"),
        pii_table_name="main.csvtest_pii",
    )
    defaults.update(kw)
    return IngestionSpec(**defaults)


@pytest.fixture()
def src_dir(tmp_root):
    d = os.path.join(tmp_root, "src")
    os.makedirs(d)
    with open(os.path.join(d, "f1.csv"), "w") as f:
        f.write(CSV_GOOD)
    return d


def test_batch_ingest_csv(spark, catalog, src_dir, tmp_root):
    pipe = IngestionPipeline(catalog)
    spec = _spec(tmp_root, src_dir)
    res = pipe.run_batch(spec)
    assert res.rows_loaded == 2 and res.batch_id == 1

    out = catalog.table("main.csvtest").read()
    assert set(out.columns) >= {"Id", "ItemName", "Dt", "Value", "BatchId", "InsertDate",
                                "ModifiedDateTime"}
    rows = {r.Id: r for r in out.collect()}
    assert str(rows[1].Value) == "10.50" and rows[2].ItemName == "gadget"
    assert rows[1].BatchId == 1

    # PII table exists with redacted column; main table is clear
    pii = catalog.table("main.csvtest_pii").read().collect()
    assert all(r.ItemName == "xxxxxxx" for r in pii)

    # batch id advances on re-run
    res2 = pipe.run_batch(spec)
    assert res2.batch_id == 2
    assert catalog.table("main.csvtest").count() == 4


def test_quarantine_bad_records(spark, catalog, tmp_root):
    d = os.path.join(tmp_root, "srcbad")
    os.makedirs(d)
    with open(os.path.join(d, "bad.csv"), "w") as f:
        f.write(CSV_BAD)
    pipe = IngestionPipeline(catalog)
    spec = _spec(tmp_root, d, header_id=8, table_name="main.badtest",
                 source_name="badtest", pii_table_name="")
    with pytest.raises(BadRecordsError):
        pipe.run_batch(spec)
    # whole batch quarantined
    q = spark.read.parquet(spec.corrupt_location)
    assert q.count() == 2
    # offending file moved to the error location
    assert len(os.listdir(spec.error_location)) == 1
    assert not os.path.exists(os.path.join(d, "bad.csv"))
    # failure logged with status 3
    logs = pipe.tables.logs.read()
    assert logs.filter((F.col("LogEntryType") == "ERROR") & (F.col("StatusID") == 3)).count() == 1


def test_schema_drift_adds_string_column(spark, catalog, tmp_root):
    d = os.path.join(tmp_root, "srcdrift")
    os.makedirs(d)
    with open(os.path.join(d, "f1.csv"), "w") as f:
        f.write(CSV_GOOD)
    pipe = IngestionPipeline(catalog)
    spec = _spec(tmp_root, d, header_id=9, table_name="main.drifttest",
                 source_name="drifttest", pii_table_name="", corrupt_location="")
    pipe.run_batch(spec)

    with open(os.path.join(d, "f2.csv"), "w") as f:
        f.write(CSV_DRIFT)
    # next batch run sniffs the new header column, evolves the spec
    # (string-typed, like the reference's addNewColumns), and loads it
    pipe.run_batch(spec)
    out = catalog.table("main.drifttest").read()
    assert "Color" in out.columns
    vals = {r.Id: r.Color for r in out.collect()}
    assert vals[4] == "red" and vals[1] is None
    drift_logged = pipe.tables.logs.read().filter(F.col("LogEntryType") == "SCHEMA_DRIFT")
    assert drift_logged.count() >= 1


def test_overwrite_mode(spark, catalog, src_dir, tmp_root):
    pipe = IngestionPipeline(catalog)
    spec = _spec(tmp_root, src_dir, header_id=10, overwrite=True,
                 table_name="main.ow", source_name="ow", pii_table_name="")
    pipe.run_batch(spec)
    pipe.run_batch(spec)
    assert catalog.table("main.ow").count() == 2  # overwritten, not appended


def test_streaming_available_now(spark, catalog, src_dir, tmp_root):
    pipe = IngestionPipeline(catalog)
    spec = _spec(tmp_root, src_dir, header_id=11, table_name="main.stream1",
                 source_name="stream1", pii_table_name="", corrupt_location="",
                 checkpoint_location=os.path.join(tmp_root, "ckpt"))
    q = pipe.run_stream(spec, bounded=True, timeout_s=120)
    assert catalog.table("main.stream1").count() == 2
    # second file arrives; a new bounded run picks up ONLY the new file
    with open(os.path.join(src_dir, "f2.csv"), "w") as f:
        f.write("Id,Item,Dt,Value\n5,late,2024-01-05,1.00\n")
    pipe.run_stream(spec, bounded=True, timeout_s=120)
    out = catalog.table("main.stream1").read()
    assert out.count() == 3
    assert out.filter(F.col("Id") == 5).count() == 1


def test_stream_drift_restarts_with_evolved_schema(spark, catalog, src_dir, tmp_root):
    """T7: mid-stream drift aborts the epoch pre-commit, records the new
    column, and the automatic restart reprocesses the drift file with
    the evolved schema — no rows lost, no rows duplicated."""
    pipe = IngestionPipeline(catalog)
    spec = _spec(tmp_root, src_dir, header_id=14, table_name="main.sdrift",
                 source_name="sdrift", pii_table_name="", corrupt_location="",
                 checkpoint_location=os.path.join(tmp_root, "sdrift_ckpt"))
    pipe.run_stream(spec, bounded=True, timeout_s=120)
    assert catalog.table("main.sdrift").count() == 2

    with open(os.path.join(src_dir, "f2_drift.csv"), "w") as f:
        f.write(CSV_DRIFT)
    pipe.run_stream(spec, bounded=True, timeout_s=120)

    out = catalog.table("main.sdrift").read()
    assert "Color" in out.columns
    assert out.count() == 3
    vals = {r.Id: r.Color for r in out.collect()}
    assert vals[4] == "red" and vals[1] is None
    logs = pipe.tables.logs.read()
    assert logs.filter(F.col("LogEntryType") == "SCHEMA_DRIFT").count() == 1
    assert logs.filter(F.col("LogEntryType") == "RESTART").count() == 1


def test_daily_report_pass(spark, catalog, src_dir, tmp_root):
    pipe = IngestionPipeline(catalog)
    spec = _spec(tmp_root, src_dir, header_id=12, table_name="main.rpt",
                 source_name="rpt", pii_table_name="", corrupt_location="")
    pipe.run_batch(spec)
    rep = daily_report(catalog, pipe.tables, [spec]).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r.SourceRowCount == r.TableRowCount == r.LoggedRowCount == 2
    assert r.RowCountMatchFlag == PASS_FLAG
    assert r.JobTimeoutStatus == "OK"
    # newest source-file mtime surfaced in the reference's report format
    # (MM/dd/yyyy hh:mm — Autoloader_daily_log_report.sql:71)
    import re

    assert re.fullmatch(r"\d{2}/\d{2}/\d{4} \d{2}:\d{2}", r.SourceFileModified)


def test_expectations_gate_routes_bad_rows(spark, catalog, tmp_root):
    from dataingestionframework_spark.ingest.expectations import Expectation

    d = os.path.join(tmp_root, "srcexp")
    os.makedirs(d)
    with open(os.path.join(d, "f1.csv"), "w") as f:
        f.write(
            "Id,Item,Dt,Value\n"
            "1,widget,2024-01-02,10.50\n"
            "2,gadget,2024-01-03,-3.00\n"   # violates value_nonneg
            "3,,2024-01-04,7.25\n"          # violates item_not_null
        )
    pipe = IngestionPipeline(catalog)
    spec = _spec(
        tmp_root, d,
        header_id=31, table_name="main.exptest", source_name="exptest",
        pii_table_name="",
        expectations=[
            Expectation("value_nonneg", "Value", "between", lo=0.0, hi=1e9),
            Expectation("item_not_null", "ItemName", "not_null"),
        ],
    )
    res = pipe.run_batch(spec)
    assert res.rows_loaded == 1  # only the clean row lands

    kept = catalog.table("main.exptest").read().collect()
    assert [r.Id for r in kept] == [1]

    viol = spark.read.parquet(os.path.join(spec.error_location, "_expectations"))
    got = {r.Id: r._failed_rules for r in viol.collect()}
    assert got == {2: "value_nonneg", 3: "item_not_null"}

    logs = pipe.tables.logs.read()
    assert (
        logs.filter(F.col("LogEntryType") == "EXPECTATION").count() == 1
    )
