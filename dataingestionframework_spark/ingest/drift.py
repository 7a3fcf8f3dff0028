"""Schema-drift detection and propagation.

Reference behavior (``modules/auto_loader_steps.py:189-275``): per
micro-batch, diff ``batch_df.dtypes`` against the column config; new
source columns are inserted into ``column_config`` (typed STRING,
``:231-235``), the target table gets ``ALTER TABLE ADD COLUMNS``, and
physical position is forced with ``CHANGE COLUMN … AFTER``.

Ours: one set-difference on ``df.columns``, a single spec update (new
columns appended at the end of ColumnOrder, typed string), and the
write path relies on mergeSchema — no per-column ALTER loop, no
physical reordering (column order stays logical, SURVEY §7.4).
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame

from ..sources.batch import RESCUED
from ..specs import ColumnSpec, IngestionSpec

AUDIT_COLS = {"BatchId", "InsertDate", "ModifiedDateTime"}


def detect_new_columns(df: DataFrame, spec: IngestionSpec) -> list[str]:
    known = {c.source_name for c in spec.columns} | AUDIT_COLS | {RESCUED}
    known |= {"source_file_path", "source_file_mtime"}
    return [c for c in df.columns if c not in known]


def evolve_spec(spec: IngestionSpec, new_cols: list[str]) -> IngestionSpec:
    """Append drift columns to the spec (STRING-typed, like the reference)."""
    if not new_cols:
        return spec
    next_order = max((c.order for c in spec.columns), default=0) + 1
    added = [
        ColumnSpec(source_name=c, target_name=c, data_type="string", order=next_order + i)
        for i, c in enumerate(new_cols)
    ]
    return replace(spec, columns=list(spec.columns) + added)
