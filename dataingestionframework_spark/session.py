"""SparkSession construction and per-session tuning.

The reference configures its session implicitly via Databricks
(``notebooks/Data Ingestion Helper.py:43`` sets only the timezone).
We centralize session creation so every entry point — tests, bench,
driver contract — gets the same scale-aware defaults:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- shuffle partitions sized to the local core count (not the 200 default)
- UTC session timezone (oracle comparability; production: explicit TZ)
- Arrow enabled for the Pandas-UDF fast path
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs we also re-assert on sessions we did not create
# (the verify driver builds its own SparkSession).
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "dataingestionframework_spark",
              cores: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the process-wide SparkSession with scale-aware defaults."""
    n = cores or default_parallelism()
    b = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # localCheckpoint blocks and shuffle files are reclaimed only
        # when ContextCleaner observes a driver GC; the 30 min default
        # exceeds any bench/test session, so block-manager state
        # accumulates across hundreds of queries and late queries
        # degrade 2-10x (NOTES.md round 8). A few minutes keeps session
        # state flat without paying a forced full-GC pause every 60 s —
        # session hygiene belongs here, not in a System.gc() loop
        # inside the benchmark harness. Env-overridable for A/B runs.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "3min"),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Re-assert runtime-settable confs on an externally-created session.

    The correctness driver constructs its own SparkSession; timezone and
    AQE settings are runtime-mutable, so every public query entry calls
    this first to guarantee oracle-comparable semantics.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — keep going
    if shuffle_partitions is None:
        shuffle_partitions = default_parallelism()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    except Exception:
        pass
    return spark


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark: SparkSession, changelog: bool = True) -> SparkSession:
    """Switch stateful streaming to the RocksDB state store.

    The default HDFSBacked provider keeps every state row on the JVM
    heap — fine for demo state, fatal when stream-stream joins or
    dedup-within-watermark accumulate tens of GB per executor. RocksDB
    spills to local SSD and (with changelog checkpointing) uploads only
    per-batch deltas instead of full snapshots, so state size is bounded
    by disk, not heap. Runtime-settable; takes effect for queries
    STARTED after the call (running queries keep their provider).
    """
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true" if changelog else "false",
    )
    return spark


def path_exists(spark: SparkSession, path: str) -> bool:
    """Explicit Hadoop FileSystem existence probe.

    The honest alternative to ``try: spark.read...  except Exception``
    around "surface may not exist yet" reads: a bare except also
    swallows transient failures (permission blip, eventual-consistency
    listing, corrupt footer) while the surface EXISTS, silently turning
    a should-retry error into first-run initialization — which for an
    accumulating store means discarding all prior state. Probing
    existence first lets every real read error propagate so the caller
    (a foreachBatch body, a maintenance job) fails and retries.
    """
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


# driver-side fast path for the epoch sidecar: foreachBatch bodies run
# on the driver, so within one process the last-merged epoch is a dict
# lookup; the file is only read after a restart and only written when
# the epoch advances. Keyed by absolute store path.
_EPOCH_CACHE: dict[str, int] = {}


def _epoch_file(store_path: str) -> str:
    return store_path.rstrip("/") + "__epoch"


def store_epoch(spark: SparkSession, store_path: str) -> int:
    """Last foreachBatch epoch merged into an accumulating parquet
    store (``-1`` if never recorded). Durable record: a tiny text
    sidecar at ``<store>__epoch`` written through the Hadoop
    FileSystem API (object-store portable, no Spark job — a parquet
    sidecar would cost a full job per micro-batch).

    foreachBatch is at-least-once: a failed/retried trigger redelivers
    the SAME epoch id, and ids are monotonically increasing within one
    checkpoint lineage — so "merge only if batch_id > store_epoch" is
    exactly the dedup the Structured Streaming guide prescribes for
    idempotent sinks. One store is therefore coupled to ONE checkpoint
    lineage (restart with a fresh checkpoint → fresh store), the same
    contract a Delta txn-version sink carries.
    """
    cached = _EPOCH_CACHE.get(store_path)
    if cached is not None:
        return cached
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(_epoch_file(store_path))
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return -1
    stream = fs.open(jpath)
    try:
        reader = sc._jvm.java.io.BufferedReader(
            sc._jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        line = reader.readLine()
    finally:
        stream.close()
    epoch = int(line.strip()) if line and line.strip() else -1
    _EPOCH_CACHE[store_path] = epoch
    return epoch


def record_store_epoch(spark: SparkSession, store_path: str, batch_id: int) -> None:
    """Record ``batch_id`` as merged (see :func:`store_epoch`). Written
    AFTER the data merge: the residual crash window between the two
    writes re-merges one batch on retry — strictly smaller exposure
    than no dedup at all; true atomicity needs a transactional store
    (the Delta ``txn`` pattern, documented in DEPLOY.md)."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(_epoch_file(store_path))
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)  # overwrite
    try:
        out.write(bytearray(f"{int(batch_id)}\n", "utf-8"))
    finally:
        out.close()
    _EPOCH_CACHE[store_path] = int(batch_id)
