"""Structured Streaming file sources.

Replaces the reference's ``cloudFiles`` reader
(``modules/auto_loader_steps.py:85-114``) with the built-in streaming
file source: incremental directory listing, ``maxFilesPerTrigger``
batch sizing, declared schema (no inference restarts), and
``Trigger.AvailableNow`` for bounded drains instead of the reference's
control-table polling loop (``modules/auto_loader_steps.py:500-528``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..specs import IngestionSpec
from .batch import RESCUED, _schema_with_rescue


def read_stream(spark: SparkSession, spec: IngestionSpec, path: str | None = None) -> DataFrame:
    src = path or spec.source_path
    fmt = spec.file_format.lower()
    max_files = spec.max_files_per_trigger or (100 if spec.continuous else max(1, spec.batch_file_count))
    reader = spark.readStream.option("maxFilesPerTrigger", str(max_files))
    # cloudFiles ignoreCorruptFiles / ignoreMissingFiles analogues
    # (modules/auto_loader_steps.py:85-96): the generic file-source
    # options skip unreadable or vanished files instead of failing the
    # stream. (cloudFiles allowOverwrites has no OSS equivalent — the
    # file stream source tracks files by path and never reprocesses.)
    if spec.ignore_corrupt_files:
        reader = reader.option("ignoreCorruptFiles", "true")
    if spec.ignore_missing_files:
        reader = reader.option("ignoreMissingFiles", "true")
    if fmt == "csv":
        return (
            reader.schema(_schema_with_rescue(spec))
            .options(
                header=str(spec.has_header).lower(),
                sep=spec.delimiter,
                mode="PERMISSIVE",
                columnNameOfCorruptRecord=RESCUED,
            )
            .csv(src)
        )
    if fmt == "json":
        return (
            reader.schema(_schema_with_rescue(spec))
            .options(mode="PERMISSIVE", columnNameOfCorruptRecord=RESCUED)
            .json(src)
        )
    if fmt in ("parquet", "orc"):
        from pyspark.sql import functions as F

        reader = reader.schema(spec.source_schema())
        stream = reader.parquet(src) if fmt == "parquet" else reader.orc(src)
        return stream.withColumn(RESCUED, F.lit(None).cast("string"))
    raise ValueError(f"unsupported file format: {spec.file_format!r}")
