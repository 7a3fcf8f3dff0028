"""System tables: config store, control state machine, ops log, status dim.

Re-expresses the reference's eight-table control plane
(``config/schemas_tables.json:1-54`` + ``schema/schemas/*.py``) on
:class:`ManagedTable`. The staging→MERGE→soft-delete config sync of
``modules/insert_config.py:482-494`` becomes :meth:`ConfigStore.sync`;
the dual log+control write of
``modules/log_table_control_table_upsert.py:9-75`` becomes
:meth:`OpsLog.write`.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..specs import IngestionSpec
from .table import ManagedTable, TableCatalog

# Status dimension seeded like modules/insert_config.py:125-142
STATUS_ROWS = [(0, "Not Started"), (1, "In Progress"), (2, "Succeeded"), (3, "Failed")]

HEADER_SCHEMA = T.StructType([
    T.StructField("HeaderID", T.LongType(), False),
    T.StructField("SourceName", T.StringType(), True),
    T.StructField("TableName", T.StringType(), True),
    T.StructField("SourceFilePath", T.StringType(), True),
    T.StructField("SourceFileFormat", T.StringType(), True),
    T.StructField("SourceFileHeader", T.ByteType(), True),
    T.StructField("SourceFileDelimiter", T.StringType(), True),
    T.StructField("OverWriteFlag", T.ByteType(), True),
    T.StructField("ContinuousRunFlag", T.ByteType(), True),
    T.StructField("BatchFileCount", T.IntegerType(), True),
    T.StructField("IsCurrent", T.ByteType(), True),
    T.StructField("ModifiedDateTime", T.TimestampType(), True),
])

COLUMN_SCHEMA = T.StructType([
    T.StructField("HeaderID", T.LongType(), False),
    T.StructField("SourceColumnName", T.StringType(), True),
    T.StructField("DeltaColumnName", T.StringType(), True),
    T.StructField("DeltaDataType", T.StringType(), True),
    T.StructField("ColumnOrder", T.IntegerType(), True),
    T.StructField("IsPII", T.ByteType(), True),
    T.StructField("ZOrder", T.ByteType(), True),
    T.StructField("IsCurrent", T.ByteType(), True),
])

CONTROL_SCHEMA = T.StructType([
    T.StructField("HeaderID", T.LongType(), False),
    T.StructField("StatusID", T.IntegerType(), True),
    T.StructField("PreviousBatchID", T.LongType(), True),
    T.StructField("LatestBatchID", T.LongType(), True),
    T.StructField("JobID", T.StringType(), True),
    T.StructField("LastUpdateTime", T.TimestampType(), True),
])

LOG_SCHEMA = T.StructType([
    T.StructField("LogID", T.StringType(), False),   # uuid — reference LogID collides within 1s
    T.StructField("HeaderID", T.LongType(), True),
    T.StructField("BatchID", T.LongType(), True),
    T.StructField("LogEntryType", T.StringType(), True),   # START/AUTO_LOADER/ROW_COUNT/END/ERROR
    T.StructField("LogDescription", T.StringType(), True),
    T.StructField("StatusID", T.IntegerType(), True),
    T.StructField("LogDateTime", T.TimestampType(), True),
])

STATUS_SCHEMA = T.StructType([
    T.StructField("StatusID", T.IntegerType(), False),
    T.StructField("StatusName", T.StringType(), True),
])


class SystemTables:
    """Creates + hands out the control-plane tables under one catalog."""

    NAMES = ("header_config", "column_config", "process_control", "logs", "status")

    def __init__(self, catalog: TableCatalog, schema: str = "autoloader"):
        self.catalog = catalog
        self.schema = schema
        catalog.create_schema(schema)

    def _t(self, name: str) -> ManagedTable:
        return self.catalog.table(f"{self.schema}.{name}")

    @property
    def header(self) -> ManagedTable:
        return self._t("header_config")

    @property
    def columns(self) -> ManagedTable:
        return self._t("column_config")

    @property
    def control(self) -> ManagedTable:
        return self._t("process_control")

    @property
    def logs(self) -> ManagedTable:
        return self._t("logs")

    @property
    def status(self) -> ManagedTable:
        return self._t("status")

    def create_all(self) -> "SystemTables":
        self.header.create(HEADER_SCHEMA)
        self.columns.create(COLUMN_SCHEMA)
        self.control.create(CONTROL_SCHEMA)
        self.logs.create(LOG_SCHEMA)
        if not self.status.exists():
            self.status.create(STATUS_SCHEMA)
            self.status.append_rows(
                [{"StatusID": i, "StatusName": n} for i, n in STATUS_ROWS]
            )
        return self


class ConfigStore:
    """Spec persistence with upsert + soft-delete semantics.

    :meth:`sync` is the reference's config pipeline
    (``modules/insert_config.py:202-345``): MERGE on HeaderID with
    ``WHEN NOT MATCHED BY SOURCE THEN UPDATE SET IsCurrent=0``.
    """

    def __init__(self, tables: SystemTables):
        self.tables = tables
        self.spark: SparkSession = tables.catalog.spark

    def _header_df(self, specs: list[IngestionSpec]) -> DataFrame:
        rows = [
            (
                s.header_id, s.source_name, s.table_name, s.source_path, s.file_format,
                int(s.has_header), s.delimiter, int(s.overwrite), int(s.continuous),
                s.batch_file_count, 1, None,
            )
            for s in specs
        ]
        return self.spark.createDataFrame(rows, HEADER_SCHEMA).withColumn(
            "ModifiedDateTime", F.current_timestamp()
        )

    def _column_df(self, specs: list[IngestionSpec]) -> DataFrame:
        rows = [
            (s.header_id, c.source_name, c.target_name, c.data_type, c.order,
             int(c.is_pii), int(c.zorder), 1)
            for s in specs
            for c in s.columns
        ]
        return self.spark.createDataFrame(rows, COLUMN_SCHEMA)

    def sync(self, specs: list[IngestionSpec]) -> None:
        st = self.tables
        st.create_all()
        # header upsert + soft-delete of vanished configs
        st.header.merge(
            self._header_df(specs),
            on=["HeaderID"],
            when_matched_update="all",
            when_not_matched_insert=True,
            when_not_matched_by_source_update={"IsCurrent": F.lit(0).cast("tinyint")},
        )
        # column upsert keyed (HeaderID, ColumnOrder) — reference
        # modules/insert_config.py:301-345
        st.columns.merge(
            self._column_df(specs),
            on=["HeaderID", "ColumnOrder"],
            when_matched_update="all",
            when_not_matched_insert=True,
            when_not_matched_by_source_update={"IsCurrent": F.lit(0).cast("tinyint")},
        )
        # control insert-if-absent — modules/insert_config.py:443-468
        seed = self.spark.createDataFrame(
            [(s.header_id, 0, 0, 0, None, None) for s in specs], CONTROL_SCHEMA
        ).withColumn("LastUpdateTime", F.current_timestamp())
        st.control.merge(seed, on=["HeaderID"], when_matched_update=None,
                         when_not_matched_insert=True)

    def load_specs(self) -> list[IngestionSpec]:
        """Rehydrate current specs from the system tables."""
        from ..specs import ColumnSpec

        headers = self.tables.header.read().filter("IsCurrent = 1").collect()
        cols = self.tables.columns.read().filter("IsCurrent = 1").collect()
        by_header: dict[int, list] = {}
        for r in cols:
            by_header.setdefault(r.HeaderID, []).append(r)
        specs = []
        for h in headers:
            specs.append(
                IngestionSpec(
                    header_id=h.HeaderID,
                    source_name=h.SourceName,
                    table_name=h.TableName,
                    source_path=h.SourceFilePath,
                    file_format=h.SourceFileFormat,
                    has_header=bool(h.SourceFileHeader),
                    delimiter=h.SourceFileDelimiter or ",",
                    overwrite=bool(h.OverWriteFlag),
                    continuous=bool(h.ContinuousRunFlag),
                    batch_file_count=h.BatchFileCount or 1,
                    columns=[
                        ColumnSpec(
                            source_name=c.SourceColumnName,
                            target_name=c.DeltaColumnName,
                            data_type=c.DeltaDataType,
                            order=c.ColumnOrder,
                            is_pii=bool(c.IsPII),
                            zorder=bool(c.ZOrder),
                        )
                        for c in sorted(by_header.get(h.HeaderID, []), key=lambda c: c.ColumnOrder)
                    ],
                )
            )
        return specs


class OpsLog:
    """Dual log-append + control-update helper (reference C8:
    ``modules/log_table_control_table_upsert.py:9-75``)."""

    def __init__(self, tables: SystemTables):
        self.tables = tables
        self.spark = tables.catalog.spark

    def write(
        self,
        header_id: int,
        entry_type: str,
        description: str,
        status_id: int,
        batch_id: int = 0,
        job_id: str | None = None,
        update_control: bool = True,
    ) -> str:
        """Append one log row + update the control row — Arrow fast path
        (driver-side parquet I/O; no Spark job for 1-row metadata ops)."""
        from datetime import datetime, timezone

        log_id = uuid.uuid4().hex
        now = datetime.now(timezone.utc).replace(tzinfo=None)  # session TZ is UTC
        self.tables.logs.append_rows(
            [
                {
                    "LogID": log_id,
                    "HeaderID": header_id,
                    "BatchID": batch_id,
                    "LogEntryType": entry_type,
                    "LogDescription": description,
                    "StatusID": status_id,
                    "LogDateTime": now,
                }
            ]
        )
        if update_control:
            sets: dict[str, object] = {"StatusID": status_id, "LastUpdateTime": now}
            if batch_id:
                import pyarrow.parquet as pq

                ctl = pq.read_table(self.tables.control.data_dir()).to_pandas()
                mine = ctl[ctl["HeaderID"] == header_id]
                prev = int(mine["LatestBatchID"].iloc[0]) if len(mine) and mine["LatestBatchID"].notna().iloc[0] else 0
                sets["PreviousBatchID"] = prev
                sets["LatestBatchID"] = batch_id
            if job_id is not None:
                sets["JobID"] = job_id
            self.tables.control.update_rows("HeaderID", header_id, sets)
        return log_id
