"""Batch file sources with declared schema + corrupt-record capture.

Replaces the reference's Auto Loader reader options
(``modules/auto_loader_steps.py:85-114``): PERMISSIVE mode with
``columnNameOfCorruptRecord=_rescued_data`` stands in for the
proprietary ``rescuedDataColumn``; the declared ``StructType`` comes
from the spec instead of sampled inference + schemaHints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..specs import IngestionSpec

RESCUED = "_rescued_data"


def _schema_with_rescue(spec: IngestionSpec) -> T.StructType:
    return T.StructType(
        list(spec.source_schema().fields) + [T.StructField(RESCUED, T.StringType(), True)]
    )


def read_batch(spark: SparkSession, spec: IngestionSpec, path: str | None = None) -> DataFrame:
    """Read the source directory as a batch DataFrame per the spec."""
    src = path or spec.source_path
    fmt = spec.file_format.lower()
    if fmt == "csv":
        return (
            spark.read.schema(_schema_with_rescue(spec))
            .options(
                header=str(spec.has_header).lower(),
                sep=spec.delimiter,
                mode="PERMISSIVE",
                columnNameOfCorruptRecord=RESCUED,
                ignoreMissingFiles="true",
            )
            .csv(src)
        )
    if fmt == "json":
        return (
            spark.read.schema(_schema_with_rescue(spec))
            .options(mode="PERMISSIVE", columnNameOfCorruptRecord=RESCUED,
                     ignoreMissingFiles="true")
            .json(src)
        )
    if fmt in ("parquet", "orc"):
        # Parquet/ORC are self-describing: no corrupt-record column; add
        # an always-null rescue column for a uniform downstream contract.
        reader = spark.read.options(ignoreMissingFiles="true")
        df = reader.parquet(src) if fmt == "parquet" else reader.orc(src)
        return df.withColumn(RESCUED, F.lit(None).cast("string"))
    raise ValueError(f"unsupported file format: {spec.file_format!r}")


def with_file_metadata(df: DataFrame) -> DataFrame:
    """Project lineage columns from the ``_metadata`` virtual column
    (reference: ``notebooks/Data Ingestion Steps.py:39``)."""
    return df.select(
        "*",
        F.col("_metadata.file_path").alias("source_file_path"),
        F.col("_metadata.file_modification_time").alias("source_file_mtime"),
    )
