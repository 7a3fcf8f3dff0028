"""As-of join, IVF ANN, stateful streaming, bidirectional reconcile."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_asof_join_basic(spark):
    from dataingestionframework_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"), (2, "2024-01-01 10:00:00")],
        "k long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", "a"), (1, "2024-01-01 11:00:00", "b"),
         (3, "2024-01-01 08:00:00", "c")],
        "k long, ts string, v string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["v"])
    got = {(r.k, str(r.ts)): r.v_right for r in out.collect()}
    assert got[(1, "2024-01-01 10:00:00")] == "a"   # 09:00 is latest ≤ 10:00
    assert got[(1, "2024-01-01 12:00:00")] == "b"   # 11:00 wins over 09:00
    assert got[(2, "2024-01-01 10:00:00")] is None  # no right rows for key 2
    assert out.count() == 3                          # left-preserving


def test_asof_join_tolerance(spark):
    from dataingestionframework_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 08:00:00", "old")], "k long, ts string, v string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    hit = asof_join(left, right, "k", "ts", "ts", ["v"], tolerance_seconds=3 * 3600)
    miss = asof_join(left, right, "k", "ts", "ts", ["v"], tolerance_seconds=3600)
    assert hit.first().v_right == "old"
    assert miss.first().v_right is None


def test_ivf_topk_finds_neighbours(spark):
    from dataingestionframework_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assigned, centroids = ivf_assign(emb, n_clusters=8)
    assigned = assigned.persist()
    assert assigned.select("ivf_cell").distinct().count() <= 8

    q = emb.filter(F.col("vec_id") == 1).first().embedding
    exact = {r.vec_id for r in cosine_topk(emb, q, k=5).collect()}
    approx = {r.vec_id for r in ivf_topk(assigned, q, centroids, k=5, nprobe=4).collect()}
    # with half the cells probed, recall should be substantial; the query
    # vector's own row must be found (it lives in the nearest cell)
    assert 1 in approx
    assert len(exact & approx) >= 3
    assigned.unpersist()


def test_ivf_partitioned_layout_prunes_and_recall_sweep(spark, tmp_root):
    """The 100 TB IVF layout: centroids fit once and persisted BESIDE
    the table, ivf_cell materialized as a partition column, so a later
    session loads the centroids (no ML fit job) and a probe's IN-filter
    prunes to nprobe directories at the scan (PartitionFilters); recall
    rises monotonically with nprobe until nprobe = n_clusters recovers
    the exact answer."""
    from dataingestionframework_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_fit,
        ivf_topk,
        load_centroids,
        save_centroids,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = f"{tmp_root}/emb_ivf"
    # build side: fit once, persist centroids beside the table
    fitted = ivf_fit(emb, n_clusters=8)
    save_centroids(f"{path}/_ivf_centroids.json", fitted)
    assigned, _ = ivf_assign(emb, centroids=fitted)
    assigned.write.partitionBy("ivf_cell").parquet(path, mode="append")
    stored = spark.read.parquet(path)

    # serve side: load persisted centroids — no KMeans fit job
    centroids = load_centroids(f"{path}/_ivf_centroids.json")
    assert centroids == fitted

    q = emb.filter(F.col("vec_id") == 1).first().embedding
    exact = {r.vec_id for r in cosine_topk(emb, q, k=5).collect()}

    probe = ivf_topk(stored, q, centroids, k=5, nprobe=2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan

    recalls = []
    for nprobe in (1, 2, 4, 8):
        got = {r.vec_id for r in ivf_topk(stored, q, centroids, k=5, nprobe=nprobe).collect()}
        recalls.append(len(exact & got) / len(exact))
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"
    assert recalls[-1] == 1.0  # probing every cell = exact scan


def test_pq_funnel_exact_when_shortlist_covers(spark, tmp_root):
    """PQ tier invariants: codebook shape m×n_codes×(dim/m) and JSON
    round-trip; codes land in [0, n_codes); rerank with a
    corpus-covering shortlist reproduces the exact top-k (the funnel is
    lossless when stage 1 prunes nothing); ADC-only top-k degrades
    gracefully (still finds a majority of true neighbours here)."""
    from dataingestionframework_spark.operators.similarity import (
        load_centroids,
        pq_adc_topk,
        pq_encode,
        pq_fit,
        pq_rerank_topk,
        save_centroids,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    books = pq_fit(emb, m=8, n_codes=16, seed=42)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)  # 64 dims / 8
    save_centroids(f"{tmp_root}/pq.json", books)
    assert load_centroids(f"{tmp_root}/pq.json") == books

    enc = pq_encode(emb, books).persist()
    code_bounds = enc.select(
        F.min(F.array_min("pq_code")).alias("lo"),
        F.max(F.array_max("pq_code")).alias("hi"),
        F.min(F.size("pq_code")).alias("m"),
    ).first()
    assert code_bounds.lo >= 0 and code_bounds.hi < 16 and code_bounds.m == 8

    q = emb.filter(F.col("vec_id") == 1).first().embedding
    qlit = F.array(*[F.lit(float(x)) for x in q])
    l2 = F.aggregate(
        F.zip_with(F.col("embedding"), qlit,
                   lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    exact = [r.vec_id for r in emb.select("vec_id", l2.alias("d"))
             .orderBy(F.col("d").asc(), "vec_id").limit(5).collect()]

    full = pq_rerank_topk(enc, q, books, k=5, shortlist=n)
    assert [r.vec_id for r in full.collect()] == exact

    adc = {r.vec_id for r in pq_adc_topk(enc, q, books, k=5).collect()}
    assert 1 in adc  # the query's own row has ADC distance ~0
    enc.unpersist()


def test_stateful_running_counters_stream(spark, tmp_root):
    from dataingestionframework_spark.streaming.stateful import running_user_counters

    src = os.path.join(tmp_root, "state_src")
    from dataingestionframework_spark.plans.tables import load

    ev = load(spark, SF_DIR, "events").limit(300)
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        running_user_counters(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("counters_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            # last emitted row per user = final state
            "SELECT * FROM counters_out"
        ).collect()
    }
    expected = {
        r.user_id: (r.n_events, r.total_value)
        for r in running_user_counters(spark.read.parquet(src)).collect()
    }
    assert got == expected


def test_reconcile_spec_with_table(spark, catalog):
    from dataingestionframework_spark.ingest.drift import reconcile_spec_with_table
    from dataingestionframework_spark.specs import ColumnSpec, IngestionSpec

    t = catalog.table("m.recon")
    df = spark.createDataFrame([(1, "x", 1)], "a long, b string, extra int")
    t.overwrite(df)

    spec = IngestionSpec(
        header_id=1, source_name="r", table_name="m.recon", source_path="/tmp",
        file_format="csv",
        columns=[
            ColumnSpec("a", "a", "bigint", 1),
            ColumnSpec("b", "b", "string", 2),
            ColumnSpec("c", "c_new", "string", 3),   # spec-only column
        ],
    )
    actions = reconcile_spec_with_table(spec, t)
    assert actions["added_to_table"] == ["c_new"]
    assert actions["missing_from_spec"] == ["extra"]
    out = t.read()
    assert "c_new" in out.columns
    assert out.first().c_new is None  # NULL-backfilled


def test_knn_brute_right_side_guard(spark):
    """The broadcast-kNN operator refuses an oversized right side
    instead of collecting it onto the driver."""
    from dataingestionframework_spark.operators.similarity import knn_join_brute

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with pytest.raises(ValueError, match="knn_join_bucketed"):
        knn_join_brute(emb.limit(10), emb, k=3, max_broadcast_rows=5)


def test_knn_join_bucketed_matches_brute_and_sweeps(spark):
    """Distributed IVF-cell kNN join: exhaustive probe equals the
    broadcast-kNN result exactly; recall rises monotonically with
    nprobe; the plan contains no BroadcastNestedLoop."""
    from dataingestionframework_spark.operators.similarity import (
        knn_join_brute,
        knn_join_bucketed,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    left = emb.filter(F.col("vec_id") < 20)
    right = emb.filter(F.col("vec_id") >= 20)
    exact = {(r.left_id, r.right_id) for r in knn_join_brute(left, right, k=3).collect()}

    recalls = []
    for nprobe in (1, 2, 4, 8):
        got = {
            (r.left_id, r.right_id)
            for r in knn_join_bucketed(
                left, right, k=3, n_clusters=8, nprobe=nprobe
            ).collect()
        }
        recalls.append(len(exact & got) / len(exact))
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"
    assert recalls[-1] == 1.0  # exhaustive probe = exact join

    plan = knn_join_bucketed(left, right, k=3, n_clusters=8, nprobe=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan


def test_stateful_session_eviction_on_event_time_timeout(spark, tmp_root):
    """applyInPandasWithState with EventTimeTimeout: an idle user's
    session closes (emitted once, state removed) when the watermark
    passes session_end + gap, driven by later files from other users."""
    from dataingestionframework_spark.streaming.stateful import closed_user_sessions

    import glob
    import shutil
    import time

    src = os.path.join(tmp_root, "sess_src")
    os.makedirs(src)

    def put(rows, name):
        # flat files: the file stream source does not recurse into the
        # per-write output directories
        d = f"{tmp_root}/w_{name}"
        spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(d)
        shutil.copy(glob.glob(f"{d}/part-*.parquet")[0], f"{src}/{name}.parquet")
        time.sleep(1.1)  # distinct mtimes → deterministic batch order

    # batch 1: user 1 has a 2-event session at 10:00-10:05
    put([(1, "2024-01-01 10:00:00", 1.0), (1, "2024-01-01 10:05:00", 2.0)], "f1")
    # batch 2: user 2 much later — its max ts sets the NEXT batch's
    # watermark to 12:00, past user 1's 10:35 timeout
    put([(2, "2024-01-01 12:00:00", 3.0), (2, "2024-01-01 12:30:00", 1.0)], "f2")
    # batch 3 runs under the 12:00 watermark — fires user 1's timeout
    # (the watermark a batch evaluates against is computed at the END of
    # the previous batch)
    put([(2, "2024-01-01 13:00:00", 1.0)], "f3")

    schema = spark.read.parquet(f"{src}/f1.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        closed_user_sessions(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", f"{tmp_root}/sess_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM sessions_out").collect()
    # user 1's session closed by user 2's watermark advance; user 2's
    # session is still open (no later watermark) and must NOT be emitted
    assert [(r.user_id, str(r.session_start), str(r.session_end), r.n_events)
            for r in rows] == [(1, "2024-01-01 10:00:00", "2024-01-01 10:05:00", 2)]


def test_profile_single_pass_counts(spark):
    from dataingestionframework_spark.operators.profile import profile

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, 3.5)],
        "k long, s string, v double",
    )
    rows = {r.column: r for r in profile(df).collect()}
    assert rows["k"].n_rows == 3 and rows["k"].n_nonnull == 3
    assert rows["k"].n_distinct == 2
    assert rows["k"].min_num == 1.0 and rows["k"].max_num == 2.0
    assert rows["s"].n_nonnull == 2 and rows["s"].min_str == "a"
    assert rows["s"].min_num is None
    assert rows["v"].n_nonnull == 2 and rows["v"].max_num == 3.5


def test_expectations_rules(spark):
    from dataingestionframework_spark.ingest.expectations import (
        Expectation,
        evaluate,
    )

    df = spark.createDataFrame(
        [(1, "x", 5.0), (2, "y", 50.0), (2, None, -1.0)],
        "k long, s string, v double",
    )
    rules = [
        Expectation("k_unique", "k", "unique"),
        Expectation("s_not_null", "s", "not_null"),
        Expectation("v_range", "v", "between", lo=0.0, hi=10.0),
        Expectation("s_domain", "s", "in_set", allowed=("x", "y")),
        Expectation("s_format", "s", "matches", pattern="^[a-z]$"),
    ]
    got = {r.rule: (r.n_failed, r.passed) for r in evaluate(df, rules).collect()}
    assert got["k_unique"] == (1, False)      # one duplicated value
    assert got["s_not_null"] == (1, False)
    assert got["v_range"] == (2, False)       # -1.0 and 50.0 out of range
    assert got["s_domain"] == (0, True)       # nulls not counted by in_set
    assert got["s_format"] == (0, True)


def test_profile_approx_distinct_mode(spark):
    from dataingestionframework_spark.operators.profile import profile

    df = spark.range(0, 5000).selectExpr("id % 100 AS k")
    row = profile(df, ["k"], exact_distinct=False).first()
    assert row.n_rows == 5000
    assert abs(row.n_distinct - 100) <= 10  # HLL within 10%
    # approx mode avoids the Expand node (the exact mode's scale cost)
    plan = (
        df.agg(F.count("k"), F.approx_count_distinct("k"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan


def test_tws_running_profile_stream_matches_batch(spark, tmp_root):
    """Spark 4 transformWithStateInPandas: streaming running profile
    (ValueState counts + MapState distinct types) converges to the
    batch one-pass aggregation over the same input.

    Skips when protobuf is absent: the TWS state-server protocol
    (pyspark.sql.streaming.proto.StateMessage_pb2) imports
    google.protobuf at runtime and this container doesn't ship it.
    The batch fallback is covered unconditionally below.
    """
    pytest.importorskip("google.protobuf")
    from dataingestionframework_spark.streaming.stateful import (
        running_user_profile_tws,
    )

    src = os.path.join(tmp_root, "tws_src")
    from dataingestionframework_spark.plans.tables import load

    ev = load(spark, SF_DIR, "events").limit(300)
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        running_user_profile_tws(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.n_events, r.total_value, r.n_types)
        for r in spark.sql("SELECT * FROM tws_out").collect()
    }
    expected = {
        r.user_id: (r.n_events, r.total_value, r.n_types)
        for r in running_user_profile_tws(spark.read.parquet(src)).collect()
    }
    assert got == expected


def test_tws_running_profile_batch_fallback(spark):
    from dataingestionframework_spark.plans.tables import load
    from dataingestionframework_spark.streaming.stateful import (
        running_user_profile_tws,
    )

    ev = load(spark, SF_DIR, "events").limit(300)
    got = {r.user_id: (r.n_events, r.n_types)
           for r in running_user_profile_tws(ev).collect()}
    expected = {
        r.user_id: (r.cnt, r.nt)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("cnt"),
             F.count_distinct("event_type").alias("nt"))
        .collect()
    }
    assert got == expected


def test_polymorphic_udtf_analyze_schema(spark):
    """§2.10 depth: a POLYMORPHIC Python UDTF (Spark 4 analyze()) whose
    output schema is computed from its literal argument at plan time —
    the table-function surface for schema-bearing decoders (fixed-width
    splitters, typed extractors) without hardcoding column counts."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitN:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"part{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            parts = (text or "").split(" ")
            yield tuple(parts[i] if i < len(parts) else None for i in range(n))

    spark.udtf.register("split_n_test", SplitN)
    got = spark.sql(
        "SELECT s.* FROM VALUES ('a b c'), ('x y') t(v), "
        "LATERAL split_n_test(v, 3) s"
    ).collect()
    assert [tuple(r) for r in got] == [("a", "b", "c"), ("x", "y", None)]
    # a different literal arg yields a different schema — same UDTF
    two = spark.sql("SELECT s.* FROM VALUES ('p q') t(v), LATERAL split_n_test(v, 2) s")
    assert two.columns == ["part0", "part1"]


def test_map_in_arrow_batch_transform(spark):
    """§2.10: mapInArrow — the zero-copy Arrow RecordBatch surface (one
    level below mapInPandas: no pandas conversion at all). Used where
    the per-batch work is columnar-native (pyarrow.compute) — the right
    tool for binary/tensor payload transforms."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def double_and_tag(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [batch.column("id"), pc.multiply(batch.column("v"), 2)],
                ["id", "v2"],
            )

    df = spark.range(1000).selectExpr("id", "id * 10 AS v")
    out = df.mapInArrow(double_and_tag, "id long, v2 long")
    rows = {r.id: r.v2 for r in out.collect()}
    assert len(rows) == 1000 and rows[7] == 140 and rows[999] == 19980


def test_arrow_python_udf_plans_arrow_eval(spark):
    """Arrow-optimized scalar Python UDF (useArrow=True, Spark 4):
    executes correctly AND plans as ArrowEvalPython — the sanctioned
    Python-boundary node (plan_audit bans row-pickling
    BatchEvalPython). Completes the §2.10 Python-surface matrix:
    pandas_udf / mapInPandas / applyInPandas(+WithState) / UDTF /
    mapInArrow / GROUPED_AGG / arrow-scalar-udf."""
    from pyspark.sql import functions as F

    rev = F.udf(lambda s: s[::-1] if s else s, "string", useArrow=True)
    df = spark.createDataFrame(
        [(1, "abc"), (2, "xy"), (3, None)], "id long, s string"
    ).withColumn("r", rev("s"))
    got = {r.id: r.r for r in df.collect()}
    assert got == {1: "cba", 2: "yx", 3: None}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_python_datasource_writer_batch_and_stream(spark, tmp_root):
    """Custom Python DataSource WRITE path (sources/pysink.py): batch
    save writes part files + one manifest; orphan (uncommitted) parts
    are invisible to the manifest reader; the streaming form commits
    one manifest per epoch and an availableNow drain lands every row
    exactly once."""
    import json
    import os

    from dataingestionframework_spark.sources.pysink import (
        NdjsonDirDataSource,
        committed_rows,
    )

    spark.dataSource.register(NdjsonDirDataSource)

    # batch write + manifest commit
    out = os.path.join(tmp_root, "ndjson_out")
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    df.write.format("ndjson_dir").mode("append").option("path", out).save()
    assert os.path.exists(os.path.join(out, "_manifest.json"))
    got = {(r["id"], r["v"]) for r in committed_rows(out)}
    assert got == {(1, "a"), (2, "b"), (3, "c")}

    # an orphan part (crashed attempt) is ignored by the manifest reader
    with open(os.path.join(out, "part-orphan.ndjson"), "w") as f:
        f.write(json.dumps({"id": 99, "v": "zz"}) + "\n")
    assert (99, "zz") not in {(r["id"], r["v"]) for r in committed_rows(out)}

    # streaming write: per-epoch manifests, exactly-once under availableNow
    src = os.path.join(tmp_root, "ndjson_src")
    sout = os.path.join(tmp_root, "ndjson_stream_out")
    spark.createDataFrame(
        [(10, "x"), (11, "y")], "id long, v string"
    ).coalesce(1).write.parquet(src)
    q = (
        spark.readStream.schema("id long, v string").parquet(src)
        .writeStream.format("ndjson_dir")
        .option("path", sout)
        .option("checkpointLocation", os.path.join(tmp_root, "ndjson_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert any(f.startswith("_epoch-") for f in os.listdir(sout))
    sgot = {(r["id"], r["v"]) for r in committed_rows(sout)}
    assert sgot == {(10, "x"), (11, "y")}
