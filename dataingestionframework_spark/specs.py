"""Typed ingestion specs — the engine's logical plan for a pipeline.

The reference's IR is a set of Delta config tables loaded from JSON
documents validated against ``config/config_template.json:1-142`` and
flattened by ``modules/validate_configurations.py:56-118``. We keep the
same JSON document shape (so reference configs load unchanged) but make
the in-memory form typed dataclasses instead of rows + f-string SQL.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field

from pyspark.sql import types as T

from .errors import DuplicateHeaderError, SpecValidationError

# Lowercase Delta DDL type strings → Spark types
# (reference value domain: modules/validate_configurations.py:117 +
#  config/*/main_config/*.json; SURVEY §1.2)
_SIMPLE_TYPES: dict[str, T.DataType] = {
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "binary": T.BinaryType(),
}


def ddl_to_spark_type(ddl: str) -> T.DataType:
    s = ddl.strip().lower()
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]
    if s.startswith("decimal"):
        inside = s[s.index("(") + 1 : s.index(")")] if "(" in s else "10,0"
        p, _, sc = inside.partition(",")
        return T.DecimalType(int(p), int(sc or 0))
    if s.startswith("array<") and s.endswith(">"):
        return T.ArrayType(ddl_to_spark_type(s[6:-1]))
    raise SpecValidationError(f"unsupported DeltaDataType: {ddl!r}")


@dataclass
class ColumnSpec:
    """One row of the reference's ``column_config``
    (schema/schemas/3_column_configuration.py:72-83)."""

    source_name: str
    target_name: str
    data_type: str = "string"
    order: int = 0
    is_pii: bool = False
    zorder: bool = False
    is_current: bool = True

    def spark_type(self) -> T.DataType:
        return ddl_to_spark_type(self.data_type)


@dataclass
class JobSpec:
    """Scheduling/runtime knobs — the reference's ``job_config``
    (schema/schemas/7_job_config_table.py:72-85)."""

    cron: str = ""
    warning_duration_s: int = 600
    timeout_s: int = 1200
    retries: int = 2
    cluster_max_workers: int = 2
    emails: list[str] = field(default_factory=list)
    pause_status: str = "PAUSED"


@dataclass
class IngestionSpec:
    """One pipeline — the reference's ``header_config`` row + children
    (schema/schemas/2_header_configuration.py:72-91)."""

    header_id: int
    source_name: str
    table_name: str            # target, "schema.table"
    source_path: str
    file_format: str = "csv"   # csv | json | parquet
    has_header: bool = True
    delimiter: str = ","
    overwrite: bool = False
    continuous: bool = False
    batch_file_count: int = 1
    max_files_per_trigger: int | None = None
    # cloudFiles option analogues (modules/auto_loader_steps.py:85-96):
    # skip unreadable/vanished files instead of failing the stream
    ignore_corrupt_files: bool = False
    ignore_missing_files: bool = False
    corrupt_location: str = ""
    error_location: str = ""
    checkpoint_location: str = ""
    pii_table_name: str = ""
    mask_strategy: str = "redact"   # redact | hash | nullify
    # 100 TB extension: partition the target table (e.g. ["InsertDate"])
    # — the reference has no PARTITIONED BY anywhere (SURVEY §4)
    partition_columns: list[str] = field(default_factory=list)
    columns: list[ColumnSpec] = field(default_factory=list)
    job: JobSpec = field(default_factory=JobSpec)
    # data-level quality rules (ingest/expectations.py); row-level kinds
    # gate rows into the error location during ingest
    expectations: list = field(default_factory=list)

    # ------------------------------------------------------------------
    def ordered_columns(self) -> list[ColumnSpec]:
        """ColumnOrder drives projection order (reference keeps physical
        order with ``CHANGE COLUMN … AFTER``; we keep it logical)."""
        return sorted([c for c in self.columns if c.is_current], key=lambda c: c.order)

    def source_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.source_name, c.spark_type(), True) for c in self.ordered_columns()]
        )

    def target_schema(self, with_audit: bool = True) -> T.StructType:
        fields = [
            T.StructField(c.target_name, c.spark_type(), True) for c in self.ordered_columns()
        ]
        if with_audit:
            fields += AUDIT_FIELDS
        return T.StructType(fields)

    def pii_columns(self) -> list[str]:
        return [c.target_name for c in self.ordered_columns() if c.is_pii]

    def zorder_columns(self) -> list[str]:
        return [c.target_name for c in self.ordered_columns() if c.zorder]


# Audit columns appended to every target table
# (modules/delta_table_create_tables.py:107; populated modules/auto_loader_steps.py:423-425)
AUDIT_FIELDS = [
    T.StructField("BatchId", T.IntegerType(), True),
    T.StructField("InsertDate", T.DateType(), True),
    T.StructField("ModifiedDateTime", T.TimestampType(), True),
]

# ---------------------------------------------------------------------------
# JSON document loading (reference config/*.json shape)
# ---------------------------------------------------------------------------

# Minimal JSON-Schema equivalent of config/config_template.json:1-142.
# Accepts BOTH the reference's document shape (DeltaTableSchema +
# DeltaTableName + SourceContainer, e.g.
# config/Development/main_config/default_al_csv_test.json:1-61) and our
# simplified one (SourceName + TableName).
CONFIG_SCHEMA = {
    "type": "object",
    "required": ["HeaderID", "SourceFilePath", "SourceFileFormat", "Columns"],
    "anyOf": [
        {"required": ["SourceName", "TableName"]},
        {"required": ["DeltaTableName"]},
    ],
    "properties": {
        "HeaderID": {"type": "integer"},
        "SourceName": {"type": "string"},
        "TableName": {"type": "string"},
        "SourceContainer": {"type": "string"},
        "DeltaTableSchema": {"type": "string"},
        "DeltaTableName": {"type": "string"},
        "SourceFilePath": {"type": "string"},
        "SourceFileFormat": {"enum": ["csv", "json", "parquet", "orc"]},
        "SourceFileHeader": {"type": "integer"},
        "SourceFileDelimiter": {"type": "string"},
        "OverWriteFlag": {"type": "integer"},
        "ContinuousRunFlag": {"type": "integer"},
        "BatchFileCount": {"type": "integer"},
        "IgnoreCorruptFiles": {"type": "integer"},
        "IgnoreMissingFiles": {"type": "integer"},
        "JobConfig": {"type": "object"},
        "Expectations": {
            "type": "array",
            "items": {
                "type": "object",
                "required": ["Name", "Column", "Kind"],
                "properties": {
                    "Name": {"type": "string"},
                    "Column": {"type": "string"},
                    "Kind": {"enum": ["not_null", "unique", "between",
                                      "in_set", "matches"]},
                    "Lo": {"type": "number"},
                    "Hi": {"type": "number"},
                    "Allowed": {"type": "array"},
                    "Pattern": {"type": "string"},
                },
            },
        },
        "Columns": {
            "type": "array",
            "minItems": 1,
            "items": {
                "type": "object",
                "required": ["SourceColumnName", "DeltaColumnName", "DeltaDataType",
                             "ColumnOrder"],
                "properties": {
                    "SourceColumnName": {"type": "string"},
                    "DeltaColumnName": {"type": "string"},
                    "DeltaDataType": {"type": "string"},
                    "ColumnOrder": {"type": "integer"},
                    "IsPII": {"type": "integer"},
                    "ZOrder": {"type": "integer"},
                },
            },
        },
    },
}


def spec_from_document(doc: dict) -> IngestionSpec:
    """Parse one reference-shaped JSON config document into a spec.

    Mirrors the flattening in ``modules/validate_configurations.py:56-118``
    (pop JobConfig / explode Columns, lowercase the type strings)."""
    try:
        import jsonschema

        jsonschema.validate(doc, CONFIG_SCHEMA)
    except ImportError:
        pass
    except Exception as e:  # jsonschema.ValidationError
        raise SpecValidationError(str(e)) from e

    jc = doc.get("JobConfig", {}) or {}
    cols = [
        ColumnSpec(
            source_name=c["SourceColumnName"],
            target_name=c["DeltaColumnName"],
            data_type=str(c["DeltaDataType"]).lower(),
            order=int(c["ColumnOrder"]),
            is_pii=bool(c.get("IsPII", 0)),
            zorder=bool(c.get("ZOrder", 0)),
        )
        for c in doc["Columns"]
    ]
    table_name = doc.get("TableName") or ".".join(
        p for p in (doc.get("DeltaTableSchema", ""), doc["DeltaTableName"]) if p
    )
    pii_table = doc.get("PIITableName", "")
    if pii_table and doc.get("PIISchema"):
        pii_table = f"{doc['PIISchema']}.{pii_table}"
    return IngestionSpec(
        header_id=int(doc["HeaderID"]),
        source_name=doc.get("SourceName") or doc.get("DeltaTableName") or table_name,
        table_name=table_name,
        source_path=doc["SourceFilePath"],
        file_format=doc["SourceFileFormat"],
        has_header=bool(doc.get("SourceFileHeader", 1)),
        delimiter=doc.get("SourceFileDelimiter") or ",",
        overwrite=bool(doc.get("OverWriteFlag", 0)),
        continuous=bool(doc.get("ContinuousRunFlag", 0)),
        batch_file_count=int(doc.get("BatchFileCount", 1)),
        ignore_corrupt_files=bool(doc.get("IgnoreCorruptFiles", 0)),
        ignore_missing_files=bool(doc.get("IgnoreMissingFiles", 0)),
        corrupt_location=doc.get("CorruptFilePath", ""),
        error_location=doc.get("ErrorFilePath", ""),
        checkpoint_location=doc.get("CheckpointPath", ""),
        pii_table_name=pii_table,
        partition_columns=list(doc.get("PartitionColumns", [])),
        columns=cols,
        job=JobSpec(
            cron=jc.get("CronSyntax", ""),
            warning_duration_s=int(jc.get("WarningDuration", 600)),
            timeout_s=int(jc.get("TimeOut", 1200)),
            retries=int(jc.get("Retries", 2)),
            cluster_max_workers=int(jc.get("ClusterMaxWorkers", 2)),
            emails=list(jc.get("Emails", [])),
            pause_status=jc.get("PauseStatus", "PAUSED"),
        ),
        expectations=_parse_expectations(doc.get("Expectations", [])),
    )


def _parse_expectations(items: list[dict]) -> list:
    """Config-document expectations → Expectation rules (extension: the
    reference validates configs, not data)."""
    from .ingest.expectations import Expectation  # lazy: avoids import cycle

    out = []
    for it in items:
        out.append(
            Expectation(
                name=it["Name"],
                column=it["Column"],
                kind=it["Kind"],
                lo=it.get("Lo"),
                hi=it.get("Hi"),
                allowed=tuple(it.get("Allowed", ())),
                pattern=it.get("Pattern"),
            )
        )
    return out


def load_specs(config_dir: str) -> list[IngestionSpec]:
    """Load + validate every ``*.json`` config in a directory; enforce
    HeaderID uniqueness (reference: modules/insert_config.py:94-120)."""
    specs = []
    for path in sorted(glob.glob(os.path.join(config_dir, "*.json"))):
        with open(path) as f:
            specs.append(spec_from_document(json.load(f)))
    seen: dict[int, str] = {}
    for s in specs:
        if s.header_id in seen:
            raise DuplicateHeaderError(
                f"HeaderID {s.header_id} used by both {seen[s.header_id]!r} and {s.source_name!r}"
            )
        seen[s.header_id] = s.source_name
    return specs
