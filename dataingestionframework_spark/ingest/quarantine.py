"""Corrupt-record gate + quarantine.

Reference behavior (``modules/auto_loader_steps.py:277-315``): if any
row has ``_rescued_data`` non-null, write the *whole batch* to the
corrupt location, move the offending source files to the error
location, and raise ``'Bad records'``.

Fixes over the reference (documented, SURVEY §7.4): it scans the batch
twice (count then collect) and its file-move loop raises after the
first file so later files never move — we do one pass and move all.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import BadRecordsError
from ..sources.batch import RESCUED


def corrupt_file_paths(df: DataFrame) -> list[str]:
    """Distinct source files containing corrupt rows (one job, no double scan)."""
    if RESCUED not in df.columns:
        return []
    rows = (
        df.filter(F.col(RESCUED).isNotNull())
        .select(F.col("_metadata.file_path").alias("p"))
        .distinct()
        .collect()
    )
    return [r.p for r in rows]


def quarantine_batch(
    df: DataFrame,
    corrupt_location: str,
    error_location: str | None = None,
    raise_on_bad: bool = True,
) -> int:
    """Gate a batch on corrupt rows. Returns the corrupt-row count.

    If any corrupt rows exist: whole batch → ``corrupt_location``
    (parquet), offending source files → ``error_location``, then raise
    :class:`BadRecordsError` (unless ``raise_on_bad=False``).
    """
    if RESCUED not in df.columns:
        return 0
    bad_files = corrupt_file_paths(df)
    if not bad_files:
        return 0
    n_bad = df.filter(F.col(RESCUED).isNotNull()).count()
    df.write.mode("overwrite").parquet(corrupt_location)
    if error_location:
        os.makedirs(error_location, exist_ok=True)
        for p in bad_files:
            local = p.removeprefix("file://")
            if os.path.exists(local):
                dest = os.path.join(
                    error_location, f"{uuid.uuid4().hex[:8]}-{os.path.basename(local)}"
                )
                shutil.move(local, dest)
    if raise_on_bad:
        raise BadRecordsError(n_bad, corrupt_location)
    return n_bad
