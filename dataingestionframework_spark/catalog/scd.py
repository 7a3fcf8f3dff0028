"""SCD Type-2 (interval-versioned dimension) maintenance.

The reference tracks only a current flag (``IsCurrent=1`` soft-delete in
``modules/insert_config.py:202-270``) — SCD1.5: history is who was
current, not when. This operator keeps the full interval history:
every change CLOSES the old row (``valid_to`` = effective date,
``is_current`` = false) and INSERTS the new version
(``valid_from`` = effective, open-ended) — the standard warehouse
dimension pattern the reference's users would reach for next.

Scale shape: one full-outer-style join of the CURRENT slice against the
source on the business key (historical rows never join — they pass
through untouched), then a union write. On Delta this is the classic
two-branch MERGE; here it is one deterministic plan over the same keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    table,
    source: DataFrame,
    keys: list[str],
    tracked_cols: list[str],
    effective: str | Column,
) -> None:
    """Apply ``source`` (one row per business key) to an SCD2 dimension
    ``table`` whose schema is: keys + tracked_cols + ``valid_from``
    (date), ``valid_to`` (date, NULL = open), ``is_current`` (boolean).

    - changed keys: current row closed at ``effective``, new version
      inserted open-ended
    - new keys: inserted open-ended
    - unchanged keys and historical (already-closed) rows: untouched

    ``effective`` is an explicit date (column or literal string) — the
    caller owns event time; nothing here reads the wall clock, so
    replays are deterministic.
    """
    eff = F.lit(effective).cast("date") if isinstance(effective, str) else effective
    full = table.read()
    hist = full.filter(~F.col("is_current"))
    cur = full.filter(F.col("is_current"))

    src = source.select(
        *keys,
        *tracked_cols,
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )

    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"src.{c}"))

    j = cur.alias("cur").join(src.alias("src"), keys, "full_outer")
    src_present = F.col("src.is_current").isNotNull()
    cur_present = F.col("cur.is_current").isNotNull()

    # current rows: closed if their key changed, kept verbatim otherwise
    kept_or_closed = j.filter(cur_present).select(
        *keys,
        *[F.col(f"cur.{c}").alias(c) for c in tracked_cols],
        F.col("cur.valid_from").alias("valid_from"),
        F.when(src_present & changed, eff).otherwise(F.col("cur.valid_to")).alias(
            "valid_to"
        ),
        F.when(src_present & changed, F.lit(False))
        .otherwise(F.col("cur.is_current"))
        .alias("is_current"),
    )
    # new versions: changed keys + brand-new keys
    inserts = j.filter(src_present & (~cur_present | changed)).select(
        *keys,
        *[F.col(f"src.{c}").alias(c) for c in tracked_cols],
        F.col("src.valid_from").alias("valid_from"),
        F.col("src.valid_to").alias("valid_to"),
        F.col("src.is_current").alias("is_current"),
    )
    out = hist.select(*kept_or_closed.columns).unionByName(kept_or_closed).unionByName(
        inserts
    )
    table.overwrite(out, _op="scd2")
