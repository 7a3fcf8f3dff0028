"""PII masking strategies.

The reference overwrites every ``IsPII=1`` column with ``lit('xxxxxxx')``
into a parallel table (``modules/auto_loader_steps.py:345-371``). We keep
that as the ``redact`` strategy and generalize with deterministic
``hash`` (sha256 — joinable pseudonym) and ``nullify``.
All strategies are pure column expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REDACT_TOKEN = "xxxxxxx"  # reference constant, modules/auto_loader_steps.py:351


def _mask_expr(col: Column, strategy: str) -> Column:
    if strategy == "redact":
        return F.lit(REDACT_TOKEN)
    if strategy == "hash":
        return F.sha2(col.cast("string"), 256)
    if strategy == "nullify":
        return F.lit(None)
    raise ValueError(f"unknown mask strategy: {strategy!r}")


def mask_columns(df: DataFrame, pii_cols: list[str], strategy: str = "redact") -> DataFrame:
    """Return a masked copy of ``df`` (original dtypes preserved only for
    ``nullify``; redact/hash produce strings, as the reference does)."""
    if not pii_cols:
        return df
    exprs = [
        _mask_expr(F.col(c), strategy).alias(c) if c in pii_cols else F.col(c)
        for c in df.columns
    ]
    return df.select(*exprs)
