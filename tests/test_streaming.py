"""Streaming windowed aggregation + stateful dedup + observability.

Strategy: run the same plan in batch mode as the oracle, then drive the
streaming version from a file source with availableNow and compare
after watermark closure (complete/update semantics permitting).
"""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _events(spark):
    from dataingestionframework_spark.plans.tables import load

    return load(spark, SF_DIR, "events")


def test_tumbling_window_batch_oracle(spark):
    from dataingestionframework_spark.streaming.windows import tumbling_window_agg

    out = tumbling_window_agg(_events(spark)).collect()
    assert len(out) > 0
    byhour = [(r.window_start, r.event_type, r.n) for r in out]
    # cross-check one bucket against a direct filter count
    w0, et0, n0 = byhour[0]
    direct = (
        _events(spark)
        .filter(
            (F.col("event_type") == et0)
            & (F.date_trunc("hour", "ts") == w0)
        )
        .count()
    )
    assert direct == n0


def test_session_window_agg_batch(spark):
    from dataingestionframework_spark.streaming.windows import session_window_agg

    out = session_window_agg(_events(spark), gap="30 minutes")
    rows = out.collect()
    assert all(r.session_end >= r.session_start for r in rows)
    # session count should match the batch sessionizer's
    from dataingestionframework_spark.operators.windows import session_stats

    batch_sessions = session_stats(_events(spark), gap_minutes=30).count()
    assert len(rows) == batch_sessions


def test_streaming_tumbling_from_file_source(spark, tmp_root):
    from dataingestionframework_spark.streaming.windows import tumbling_window_agg
    from dataingestionframework_spark.streaming.observe import attach

    src = os.path.join(tmp_root, "stream_src")
    _events(spark).limit(500).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    rec = attach(spark)
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    agg = tumbling_window_agg(stream, watermark="5 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM tumbling_out").collect()
    expected = tumbling_window_agg(spark.read.parquet(src)).collect()
    assert len(got) == len(expected)
    g = {(r.window_start, r.event_type): (r.n, r.total_value) for r in got}
    e = {(r.window_start, r.event_type): (r.n, r.total_value) for r in expected}
    assert g == e
    # listener observed progress
    assert any(p["numInputRows"] > 0 for p in rec.progress)


def test_streaming_dedup_within_watermark(spark, tmp_root):
    from dataingestionframework_spark.streaming.windows import streaming_dedup

    src = os.path.join(tmp_root, "dup_src")
    ev = _events(spark).limit(100)
    ev.union(ev).coalesce(1).write.parquet(src)  # every event twice
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_dedup(stream, keys=["event_id"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(DISTINCT event_id) AS k, count(*) AS n FROM dedup_out").first()
    assert n.n == n.k == 100
