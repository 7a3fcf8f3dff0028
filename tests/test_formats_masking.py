"""JSON ingestion path (reference fastingestlogs shape), masking
strategies, maintenance, production-config parity."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dataingestionframework_spark.ingest.masking import mask_columns
from dataingestionframework_spark.ingest.pipeline import IngestionPipeline
from dataingestionframework_spark.specs import ColumnSpec, IngestionSpec, spec_from_document

# FIXTURES §1.3: wide all-string JSON, append mode, no header
FASTINGEST_COLS = [
    "asctime", "levelname", "name", "message", "Stage", "StageStatus", "JobID",
    "rootRunId", "currentRunId", "User", "userId", "notebookId", "notebook_name",
    "sessionId", "ServerAddress", "DBName", "Port", "ConnectionOptions",
    "SourceSchemaName", "DestinationSchemaName", "TableName", "SaveLocation",
    "MIConnection", "writemode", "zorder", "SaveTableName",
]


def test_json_ingest_wide_all_string(spark, catalog, tmp_root):
    src = os.path.join(tmp_root, "jsrc")
    os.makedirs(src)
    rows = [
        {c: f"{c}_val_{i}" for c in FASTINGEST_COLS}
        for i in range(3)
    ]
    with open(os.path.join(src, "log1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    spec = IngestionSpec(
        header_id=41, source_name="fastingestlogs", table_name="main.fastingestlogs",
        source_path=src, file_format="json",
        columns=[ColumnSpec(c, c, "string", i + 1) for i, c in enumerate(FASTINGEST_COLS)],
    )
    pipe = IngestionPipeline(catalog)
    res = pipe.run_batch(spec)
    assert res.rows_loaded == 3
    out = catalog.table("main.fastingestlogs").read()
    assert set(FASTINGEST_COLS) <= set(out.columns)
    got = {r.asctime for r in out.collect()}
    assert got == {"asctime_val_0", "asctime_val_1", "asctime_val_2"}
    # append mode: second run doubles
    pipe.run_batch(spec)
    assert catalog.table("main.fastingestlogs").count() == 6


def test_mask_strategies(spark):
    df = spark.createDataFrame([(1, "alice", 9.5)], "id long, name string, score double")
    red = mask_columns(df, ["name"], "redact").first()
    assert red.name == "xxxxxxx" and red.score == 9.5
    hashed = mask_columns(df, ["name", "score"], "hash").first()
    assert len(hashed.name) == 64 and len(hashed.score) == 64  # sha256 hex
    assert hashed.name != hashed.score
    nulled = mask_columns(df, ["name"], "nullify").first()
    assert nulled.name is None and nulled.id == 1
    with pytest.raises(ValueError):
        mask_columns(df, ["name"], "rot13")


def test_optimize_for_spec_uses_zorder_flags(spark, catalog):
    from dataingestionframework_spark.ingest.maintenance import optimize_for_spec

    t = catalog.table("m.z")
    t.overwrite(
        spark.range(0, 2000).selectExpr("id", "CAST(id % 13 AS INT) AS zcol").repartition(8)
    )
    spec = IngestionSpec(
        header_id=1, source_name="z", table_name="m.z", source_path="/tmp",
        file_format="csv",
        columns=[ColumnSpec("id", "id", "bigint", 1),
                 ColumnSpec("zcol", "zcol", "int", 2, zorder=True)],
    )
    optimize_for_spec(t, spec)
    assert t.count() == 2000


def test_production_config_document_parity():
    """The reference's production parquet config (mixed types, FIXTURES
    §1.4) parses with correct type mapping."""
    path = ("/root/reference/config/Production/main_config/"
            "contact_centre_transformed_zendesk_ticket_fields.json")
    if not os.path.exists(path):
        pytest.skip("reference snapshot not present")
    from pyspark.sql import types as T

    with open(path) as f:
        s = spec_from_document(json.load(f))
    assert s.file_format == "parquet"
    tgt = s.target_schema(with_audit=False)
    by_name = {f.name: f.dataType for f in tgt.fields}
    assert by_name["ticket_fields_id"] == T.LongType()
    assert by_name["is_active"] == T.BooleanType()
    assert by_name["Updated_Date"] == T.TimestampType()
    assert by_name["position"] == T.IntegerType()


def test_orc_batch_ingest(spark, catalog, tmp_root):
    """ORC source format: self-describing like parquet, same rescue
    contract, same pipeline path."""
    from dataingestionframework_spark.ingest.pipeline import IngestionPipeline
    from dataingestionframework_spark.specs import ColumnSpec, IngestionSpec

    src = os.path.join(tmp_root, "orc_src")
    spark.createDataFrame(
        [(1, "widget", 10.5), (2, "gadget", 3.25)], "Id int, Item string, Value double"
    ).coalesce(1).write.orc(src)

    spec = IngestionSpec(
        header_id=41, source_name="orctest", table_name="main.orctest",
        source_path=src, file_format="orc",
        columns=[
            ColumnSpec("Id", "Id", "int", 1),
            ColumnSpec("Item", "ItemName", "string", 2),
            ColumnSpec("Value", "Value", "double", 3),
        ],
    )
    res = IngestionPipeline(catalog).run_batch(spec)
    assert res.rows_loaded == 2
    rows = {r.Id: r for r in catalog.table("main.orctest").read().collect()}
    assert rows[2].ItemName == "gadget" and rows[1].Value == 10.5


def test_parameterized_sql_named_markers(spark):
    """SQL front door with named parameter markers — injection-safe
    parameterization (spark.sql(query, args=...))."""
    df = spark.sql(
        "SELECT :label AS label, id FROM range(10) WHERE id < :cutoff",
        args={"label": "x", "cutoff": 3},
    )
    assert [(r.label, r.id) for r in df.collect()] == [("x", 0), ("x", 1), ("x", 2)]


def test_parquet_zstd_codec_roundtrip(spark, tmp_root):
    """Column-store compression knob: zstd parquet writes (the 100 TB
    default — better ratio than snappy at similar scan cost) round-trip
    and are visibly zstd on disk."""
    import os

    p = os.path.join(tmp_root, "zstd")
    spark.range(10000).selectExpr("id", "md5(cast(id as string)) AS s").write.option(
        "compression", "zstd"
    ).parquet(p)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert files and all(".zstd." in f for f in files)
    assert spark.read.parquet(p).count() == 10000
