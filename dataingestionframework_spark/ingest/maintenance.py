"""Table maintenance: compaction + Z-order-style clustering + source polling.

Reference C7 (``modules/auto_loader_steps.py:481-498``): post-load
``OPTIMIZE table [ZORDER BY (cols)]`` using Z-columns from the config.
On plain parquet the equivalent clustering is a range-repartition on
the cluster columns + sort-within-partitions rewrite: files become
disjoint runs of the cluster key, so min/max row-group stats give the
same data-skipping effect Z-ordering gives Delta.

Reference S6 (``notebooks/Data Ingestion Helper.py:334-352``): block
until the source directory is non-empty — kept, with a deadline.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame

from ..catalog.table import ManagedTable
from ..specs import IngestionSpec


def optimize_table(
    table: ManagedTable,
    zorder_cols: list[str] | None = None,
    target_partitions: int | None = None,
) -> None:
    """Compact + cluster. With ``zorder_cols``: range-partition on the
    columns then sort within partitions (parquet min/max stats then
    support skip-scans on those columns — the OPTIMIZE ZORDER analogue)."""
    df = table.read()
    n = target_partitions or max(1, table.spark.sparkContext.defaultParallelism // 4)
    if zorder_cols and len(zorder_cols) > 1:
        # true multi-dim clustering: interleaved-bit Morton key, so
        # min/max pruning works on every cluster column
        from ..operators.bucketing import zorder_sort

        clustered = zorder_sort(df, zorder_cols, partitions=n)
    elif zorder_cols:
        clustered = df.repartitionByRange(n, *zorder_cols).sortWithinPartitions(*zorder_cols)
    else:
        clustered = df.coalesce(n)
    table.overwrite(clustered)


def incremental_agg_refresh(
    src: ManagedTable,
    agg: ManagedTable,
    keys: list[str],
    value_col: str,
    since_version: int,
) -> int:
    """Incremental materialized-aggregate maintenance from the commit
    log: apply only the rows that changed after ``since_version`` to a
    (keys, n, total) aggregate table — additive +insert/−delete deltas
    MERGEd by key — instead of recomputing from the full source.

    Returns the source version the aggregate is now current to (pass it
    back as ``since_version`` next refresh). Cost per refresh is
    O(changes) + a merge shuffled on the agg table's keys: at 100 TB the
    fact table is never re-scanned (for append-only ranges
    ``read_changes`` reads only the new files), which is the entire
    point of maintaining a continuous aggregate.

    Delete images subtract; a key whose count reaches 0 keeps its row
    with n=0 (harmless for additive aggs; filter n>0 on read, or vacuum
    periodically) — Delta's own CDF-driven MERGE has the same property.
    """
    from pyspark.sql import functions as F

    to_version = max(e["version"] for e in src._history_lines())
    if to_version == since_version:
        return to_version
    ch = src.read_changes(since_version, to_version)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    delta = ch.groupBy(*keys).agg(
        F.sum(sign).alias("n"),
        F.sum(sign * F.col(value_col)).alias("total"),
    )
    agg.merge(
        delta,
        on=keys,
        when_matched_update={
            "n": F.col("tgt.n") + F.col("src.n"),
            "total": F.col("tgt.total") + F.col("src.total"),
        },
        when_not_matched_insert=True,  # brand-new keys start at their delta
    )
    return to_version


def incremental_join_agg_refresh(
    src: ManagedTable,
    dim: DataFrame,
    join_key: str,
    agg: ManagedTable,
    keys: list[str],
    value_col: str,
    since_version: int,
) -> int:
    """Incremental maintenance of a JOIN-then-aggregate materialized
    view: ΔF ⋈ D, aggregated with ±signs, MERGEd into the stored view —
    the fact table is never re-scanned and the join runs only over the
    changed rows.

    This is the standard delta rule for a view V = γ(F ⋈ D) when only
    the fact side changes between refreshes: ΔV = γ(ΔF ⋈ D). The
    dimension is broadcast (dims are small next to facts; for a big
    dimension, swap in a bucketed equi-join — the delta is still
    O(changes)). A changed DIMENSION row is out of scope for this rule
    (it touches every joined fact row); handle dim changes by re-keying
    the affected groups or rebuilding, as every incremental-view system
    does for the n-side of a 1:n join.

    Returns the fact-table version the view is now current to.
    """
    from pyspark.sql import functions as F

    to_version = max(e["version"] for e in src._history_lines())
    if to_version == since_version:
        return to_version
    ch = src.read_changes(since_version, to_version)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    delta = (
        ch.join(F.broadcast(dim), join_key)
        .groupBy(*keys)
        .agg(
            F.sum(sign).alias("n"),
            F.sum(sign * F.col(value_col)).alias("total"),
        )
    )
    agg.merge(
        delta,
        on=keys,
        when_matched_update={
            "n": F.col("tgt.n") + F.col("src.n"),
            "total": F.col("tgt.total") + F.col("src.total"),
        },
        when_not_matched_insert=True,
    )
    return to_version


def optimize_for_spec(table: ManagedTable, spec: IngestionSpec) -> None:
    """Apply the spec's ZOrder column flags (reference pulls them from
    column_config where ZOrder=1)."""
    optimize_table(table, spec.zorder_columns() or None)


def wait_for_files(path: str, timeout_s: float = 60.0, poll_s: float = 1.0) -> bool:
    """Block until ``path`` contains at least one file (or timeout).
    Returns True if files appeared."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            if any(
                e.is_file() and not e.name.startswith((".", "_"))
                for e in os.scandir(path)
            ):
                return True
        except FileNotFoundError:
            pass
        time.sleep(poll_s)
    return False
