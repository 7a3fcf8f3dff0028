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


def parquet_layout_report(spark, path: str, columns=None):
    """Footer-only parquet layout audit: one row per (file, row group,
    column) with the footer's value counts, null counts, min/max stats
    and compressed/uncompressed bytes — the data-skipping feedback
    loop. At 100 TB this is how you VERIFY a layout decision instead
    of guessing: if a filter column's per-row-group [min,max] ranges
    all span the global range, no scan will ever skip a group and the
    table needs a sort/Z-order rewrite (operators.bucketing /
    optimize_table); tight disjoint ranges mean pruning is working.

    Distributed by construction: the driver only LISTS the files; each
    task opens its files and reads the footer (O(KB) per file — data
    pages are never touched). Reading 100k file footers is a 100k-row
    job, not a 100 TB scan.

    min/max are emitted as strings (the footer's logical values,
    stringified) so one schema covers every column type; cast on the
    consumer side. Columns without statistics yield NULL min/max.
    """
    import glob as _glob
    import os as _os

    files = (
        sorted(_glob.glob(_os.path.join(path, "*.parquet")))
        if _os.path.isdir(path)
        else [path]
    )
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    keep = set(columns) if columns else None

    def scan(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        cols = [
            "file_name", "row_group_id", "row_group_rows", "column_name",
            "num_values", "null_count", "min_value", "max_value",
            "compressed_bytes", "uncompressed_bytes",
        ]
        for pdf in batches:
            out = []
            for f in pdf["file_path"]:
                md = pq.ParquetFile(f).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        name = c.path_in_schema
                        if keep and name not in keep:
                            continue
                        st = c.statistics
                        has_mm = st is not None and st.has_min_max
                        out.append((
                            _os.path.basename(f), rg, g.num_rows, name,
                            c.num_values,
                            st.null_count
                            if st is not None and st.has_null_count
                            else None,
                            str(st.min) if has_mm else None,
                            str(st.max) if has_mm else None,
                            c.total_compressed_size,
                            c.total_uncompressed_size,
                        ))
            yield pd.DataFrame(out, columns=cols)

    fdf = spark.createDataFrame([(f,) for f in files], "file_path string")
    schema = (
        "file_name string, row_group_id int, row_group_rows long, "
        "column_name string, num_values long, null_count long, "
        "min_value string, max_value string, "
        "compressed_bytes long, uncompressed_bytes long"
    )
    n_tasks = max(1, min(len(files), 64))
    return fdf.repartition(n_tasks).mapInPandas(scan, schema=schema)
