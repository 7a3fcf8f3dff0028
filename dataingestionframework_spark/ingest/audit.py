"""Audit columns + projection/rename in spec order.

Reference semantics: three audit columns added per micro-batch
(``modules/auto_loader_steps.py:423-425``), projection of configured
columns in ColumnOrder (``:166-177,340``) and rename source→target
(``:342-343``). We do projection+rename+audit in one ``select`` so
Catalyst sees a single narrow projection it can push into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..specs import IngestionSpec


def project_rename_audit(df: DataFrame, spec: IngestionSpec, batch_id: int) -> DataFrame:
    cols = [
        F.col(c.source_name).cast(c.spark_type()).alias(c.target_name)
        for c in spec.ordered_columns()
    ]
    return df.select(
        *cols,
        F.lit(batch_id).cast("int").alias("BatchId"),
        F.current_date().alias("InsertDate"),
        F.current_timestamp().alias("ModifiedDateTime"),
    )
