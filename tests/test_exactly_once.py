"""Exactly-once foreachBatch replay guard + continuous-stream cancel."""

import os
import time

from pyspark.sql import functions as F

from dataingestionframework_spark.ingest.pipeline import IngestionPipeline
from dataingestionframework_spark.specs import ColumnSpec, IngestionSpec


def _spec(tmp_root, src, hid=21, **kw):
    defaults = dict(
        header_id=hid, source_name=f"s{hid}", table_name=f"main.s{hid}",
        source_path=src, file_format="csv", has_header=True,
        columns=[ColumnSpec("Id", "Id", "int", 1), ColumnSpec("V", "V", "string", 2)],
        checkpoint_location=os.path.join(tmp_root, f"ckpt{hid}"),
    )
    defaults.update(kw)
    return IngestionSpec(**defaults)


def _write_csv(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        f.write("Id,V\n" + "".join(f"{i},{v}\n" for i, v in rows))


def test_epoch_replay_is_idempotent(spark, catalog, tmp_root):
    """Simulate the crash-replay: run the epoch handler twice with the
    same epoch id — the second invocation must be a no-op."""
    src = os.path.join(tmp_root, "src_eo")
    _write_csv(src, "f1.csv", [(1, "a"), (2, "b")])
    pipe = IngestionPipeline(catalog)
    spec = _spec(tmp_root, src)
    target = pipe.prepare(spec)

    from dataingestionframework_spark.sources.batch import read_batch, with_file_metadata

    batch = with_file_metadata(read_batch(spark, spec))

    def handle(batch_df, epoch_id):
        if epoch_id <= pipe._last_committed_epoch(spec.header_id):
            return
        bid = pipe._next_batch_id(spec)
        pipe.process_batch(batch_df, spec, target, bid)
        pipe.log.write(spec.header_id, "EPOCH_COMMIT", str(epoch_id), 1, bid,
                       update_control=False)

    handle(batch, 0)
    handle(batch, 0)   # replay of the same epoch
    assert catalog.table(spec.table_name).count() == 2  # not 4
    handle(batch, 1)   # genuinely new epoch
    assert catalog.table(spec.table_name).count() == 4


def test_streaming_run_commits_epochs(spark, catalog, tmp_root):
    src = os.path.join(tmp_root, "src_ep")
    _write_csv(src, "f1.csv", [(1, "a")])
    pipe = IngestionPipeline(catalog)
    spec = _spec(tmp_root, src, hid=22)
    pipe.run_stream(spec, bounded=True, timeout_s=120)
    logs = pipe.tables.logs.read()
    assert logs.filter(F.col("LogEntryType") == "EPOCH_COMMIT").count() >= 1
    assert catalog.table(spec.table_name).count() == 1


def test_cancel_continuous_stream(spark, catalog, tmp_root):
    src = os.path.join(tmp_root, "src_cancel")
    _write_csv(src, "f1.csv", [(1, "a")])
    pipe = IngestionPipeline(catalog)
    spec = _spec(tmp_root, src, hid=23)
    q = pipe.run_stream(spec, bounded=False, processing_time="1 seconds")
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline and not catalog.table(spec.table_name).count():
            time.sleep(0.5)
        assert q.isActive
        assert pipe.cancel_stream(spec.header_id)
        assert not q.isActive
        assert not pipe.cancel_stream(spec.header_id)  # second cancel: no-op
    finally:
        if q.isActive:
            q.stop()
