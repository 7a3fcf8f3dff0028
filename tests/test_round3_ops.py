"""Round-3 operators: EWMA anomaly, entity linkage, SemDeDup, int8
quantization, aHash image near-dup, triangle counts, fuzzy
decontamination — planted-fixture unit proofs (the oracle gate proves
them again against DuckDB at sf0.01)."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_ewma_finite_matches_hand_computation(spark):
    from dataingestionframework_spark.operators.windows import ewma_finite

    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate([10, 20, 30, 40])],
        "k int, seq int, value double",
    )
    out = {
        r.seq: r.ewma
        for r in ewma_finite(
            df, "value", ["k"], ["seq"], alpha=0.5, window=8
        ).collect()
    }
    # row 0: only itself; row 1: (20*1 + 10*.5)/1.5; row 3: weights 1,.5,.25,.125
    assert out[0] == pytest.approx(10.0)
    assert out[1] == pytest.approx((20 + 10 * 0.5) / 1.5)
    assert out[3] == pytest.approx(
        (40 + 30 * 0.5 + 20 * 0.25 + 10 * 0.125) / (1 + 0.5 + 0.25 + 0.125)
    )


def test_trailing_zscore_excludes_current_row_and_warmup(spark):
    from dataingestionframework_spark.operators.windows import trailing_zscore

    rows = [(1, i, 10.0) for i in range(8)] + [(1, 8, 100.0)]
    df = spark.createDataFrame(rows, "k int, seq int, value double")
    out = {
        r.seq: r
        for r in trailing_zscore(
            df, "value", ["k"], ["seq"], lookback=12, min_periods=6
        ).collect()
    }
    # warm-up rows (n < 6) and constant-history rows (s = 0) never alert
    assert all(out[i].z is None for i in range(8))
    # the spike's own value cannot inflate its baseline: trailing history
    # is constant 10.0 -> s = 0 -> z is NULL, not a huge-but-wrong number
    assert out[8].z is None
    # with variance in history the spike alerts
    rows = [(1, i, float(10 + (i % 3))) for i in range(8)] + [(1, 8, 100.0)]
    df = spark.createDataFrame(rows, "k int, seq int, value double")
    z = {
        r.seq: r.z
        for r in trailing_zscore(
            df, "value", ["k"], ["seq"], lookback=12, min_periods=6
        ).collect()
    }
    assert z[8] is not None and z[8] > 3


def test_blocked_fuzzy_pairs_respects_blocks(spark):
    from dataingestionframework_spark.operators.linkage import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "jon smith", "US"),
            (2, "john smith", "US"),   # dist 1, same block
            (3, "jon smith", "DE"),    # identical name, DIFFERENT block
            (4, "mary jones", "US"),   # too far
        ],
        "id long, name string, country string",
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in blocked_fuzzy_pairs(
            df, "id", "name", ["country"], max_distance=1
        ).collect()
    }
    assert got == {(1, 2, 1)}


def test_semantic_dedup_drops_planted_near_identical(spark, emb):
    from dataingestionframework_spark.operators.similarity import semantic_dedup

    base = emb.select("vec_id", "embedding")
    # plant an exact copy of vec 17 under a fresh id
    clone = base.filter(F.col("vec_id") == 17).select(
        F.lit(99999).cast("long").alias("vec_id"), "embedding"
    )
    df = base.unionByName(clone)
    cents = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    kept = {r.vec_id for r in semantic_dedup(df, cents, threshold=0.99).collect()}
    assert 17 in kept and 99999 not in kept  # lowest id survives


def test_int8_quantize_error_exact_on_two_level_dims(spark):
    from dataingestionframework_spark.operators.similarity import int8_quantize_error

    # dim1 constant -> zero error; dim2 hits exactly representable codes
    df = spark.createDataFrame(
        [(1, [5.0, 0.0]), (2, [5.0, 255.0]), (3, [5.0, 128.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in int8_quantize_error(df).collect()}
    for r in out.values():
        assert r.rmse == 0.0 and r.max_abs_err == 0.0


def test_int8_quantize_error_bounded_by_half_step(spark, emb):
    from dataingestionframework_spark.operators.similarity import int8_quantize_error

    ex = emb.select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double")))
    )
    spread = ex.groupBy("pos").agg((F.max("col") - F.min("col")).alias("w"))
    max_half_step = spread.agg(F.max(F.col("w") / 255.0 / 2.0)).first()[0]
    worst = int8_quantize_error(emb).agg(F.max("max_abs_err")).first()[0]
    assert worst <= max_half_step + 1e-9


def test_ahash_blocking_finds_identical_payloads_only(spark):
    from dataingestionframework_spark.operators.multimodal import (
        ahash_near_dup_pairs,
        ahash_stub,
    )

    df = spark.createDataFrame(
        [
            (1, bytearray(b"image-bytes-AAAA")),
            (2, bytearray(b"image-bytes-AAAA")),  # exact dup -> hamming 0
            (3, bytearray(b"image-bytes-AAAB")),  # 1 byte off -> avalanche
        ],
        "doc_id long, payload binary",
    )
    pairs = {(r.id_a, r.id_b, r.hamming) for r in
             ahash_near_dup_pairs(df, max_hamming=3).collect()}
    assert pairs == {(1, 2, 0)}
    # sketch is deterministic and 4x16-bit
    sk = {r.doc_id: (r.ab0, r.ab1, r.ab2, r.ab3)
          for r in ahash_stub(df).collect()}
    assert sk[1] == sk[2] and sk[1] != sk[3]
    assert all(0 <= v < (1 << 16) for v in sk[1] + sk[3])


def test_triangle_counts_on_k4(spark):
    from dataingestionframework_spark.operators.graph import triangle_counts

    # K4: 4 triangles, every vertex in exactly 3; edges fed unordered +
    # duplicated + self-loop to prove canonicalization
    e = [(a, b) for a in range(4) for b in range(4) if a != b] + [(2, 2)]
    df = spark.createDataFrame(e, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_fuzzy_decontaminate_flags_paraphrased_leak(spark, docs):
    from dataingestionframework_spark.operators.corpus import fuzzy_decontaminate

    bench = docs.filter(F.col("doc_id") < 5)
    # corpus doc 9001 = bench doc 2 with a word appended: high Jaccard,
    # not an exact copy; 9002 is unrelated
    leak = bench.filter(F.col("doc_id") == 2).select(
        F.lit(9001).cast("long").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang", "source", "n_chars",
    )
    clean = docs.filter(F.col("doc_id") == 100).select(
        F.lit(9002).cast("long").alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    corpus = leak.unionByName(clean)
    got = {r.doc_id: r for r in
           fuzzy_decontaminate(corpus, bench, threshold=0.3).collect()}
    assert 9001 in got and got[9001].bench_id == 2
    assert got[9001].jaccard_sim >= 0.3
    assert 9002 not in got


def test_ewma_anomaly_query_plan_is_window_only(spark):
    """The anomaly query must stay pure window algebra: no Python
    evaluation, no Cartesian, a single Exchange on user_id."""
    from dataingestionframework_spark.plans.queries import ewma_anomaly_events

    plan = ewma_anomaly_events(
        spark, SF_DIR
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_bpe_pair_counts_handles_short_words(spark):
    from dataingestionframework_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "ab a abc"), (2, "x")], "doc_id long, text string"
    )
    got = {(r.pair, r.n) for r in bpe_pair_counts(df, top_k=10).collect()}
    # "ab" from both "ab" and "abc"; 1-char words contribute nothing
    assert got == {("ab", 2), ("bc", 1)}


def test_incremental_join_agg_refresh_matches_full_recompute(spark, tmp_root):
    import os

    from pyspark.sql import types as T

    from dataingestionframework_spark.catalog.table import ManagedTable
    from dataingestionframework_spark.ingest.maintenance import (
        incremental_join_agg_refresh,
    )

    dim = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "A")], "k long, seg string"
    )
    facts = ManagedTable(spark, os.path.join(tmp_root, "f"))
    mv = ManagedTable(spark, os.path.join(tmp_root, "mv"))
    mv.create(T.StructType([
        T.StructField("seg", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("total", T.DecimalType(28, 2), True),
    ]))
    rows = spark.createDataFrame(
        [(10, 1, "10.00"), (11, 2, "5.00"), (12, 3, "2.50"), (13, 1, "1.00")],
        "id long, k long, price string",
    ).select("id", "k", F.col("price").cast("decimal(18,2)").alias("price"))
    facts.append(rows.filter(F.col("id") < 12))
    v = incremental_join_agg_refresh(facts, dim, "k", mv, ["seg"], "price", 0)
    facts.append(rows.filter(F.col("id") >= 12))
    v = incremental_join_agg_refresh(facts, dim, "k", mv, ["seg"], "price", v)
    facts.delete(F.col("id") == 11)
    incremental_join_agg_refresh(facts, dim, "k", mv, ["seg"], "price", v)
    got = {(r.seg, r.n, float(r.total)) for r in
           mv.read().filter(F.col("n") > 0).collect()}
    # full recompute: A -> ids 10,12,13 (13.50); B deleted entirely
    assert got == {("A", 3, 13.50)}


def test_pareto_frontier_is_undominated(spark):
    from dataingestionframework_spark.plans.queries import pareto_frontier_orders

    rows = pareto_frontier_orders(spark, SF_DIR).orderBy("d").collect()
    assert rows, "frontier must be non-empty"
    # strictly increasing best_price along increasing dates
    prices = [r.best_price for r in rows]
    assert prices == sorted(prices) and len(set(prices)) == len(prices)


def test_radius_self_join_matches_brute_force(spark):
    import itertools
    import random

    from dataingestionframework_spark.operators.spatial import radius_self_join

    rng = random.Random(7)
    pts = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(120)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {(r.id_a, r.id_b) for r in radius_self_join(df, radius=9.0).collect()}
    want = {
        (a[0], b[0])
        for a, b in itertools.combinations(pts, 2)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= 81.0
    }
    want = {(min(a, b), max(a, b)) for a, b in want}
    assert got == want and len(want) > 0


def test_radius_self_join_no_cartesian(spark):
    from dataingestionframework_spark.operators.spatial import radius_self_join

    df = spark.range(50).select(
        F.col("id"),
        (F.col("id") * 7 % 100).cast("double").alias("x"),
        (F.col("id") * 13 % 100).cast("double").alias("y"),
    )
    plan = (
        radius_self_join(df, radius=10.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_resample_interp_blends_between_anchors(spark):
    """3 hourly anchors with a 2-hour hole: interior gaps blend
    time-weighted; head/tail are clamped to the nearest anchor."""
    from dataingestionframework_spark.plans.queries import resample_interp_events

    # use the real query at sf0.001 and spot-check the invariant: every
    # gap row lies between the straddling non-gap values
    rows = resample_interp_events(spark, SF_DIR).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for series in by_user.values():
        series.sort(key=lambda r: r.h)
        anchors = [(i, r.filled) for i, r in enumerate(series) if not r.is_gap]
        for (i0, v0), (i1, v1) in zip(anchors, anchors[1:]):
            lo, hi = min(v0, v1), max(v0, v1)
            for j in range(i0 + 1, i1):
                assert lo - 1e-9 <= series[j].filled <= hi + 1e-9
                checked += 1
    assert checked > 0


def test_embedding_ann_intake_incremental_equals_declarative(spark, emb, tmp_root):
    """Two micro-batches through the streaming ANN intake == the
    declarative survivor set (no smaller-id neighbor at cos >= tau),
    with batch 2 seeing batch 1 ONLY via the persisted IVF index."""
    import os

    from dataingestionframework_spark.functions import cosine_similarity
    from dataingestionframework_spark.ingest.corpus import (
        embedding_incremental_ann_intake,
    )
    from dataingestionframework_spark.operators.bucketing import (
        drop_table_and_location,
    )

    e = emb.select("vec_id", "embedding").filter(F.col("vec_id") < 120)
    cents = [
        list(r.embedding)
        for r in e.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    src = os.path.join(tmp_root, "src")
    os.makedirs(src)
    import time as _t

    now = _t.time()
    for i, (lo, hi) in enumerate(((0, 60), (60, 120))):
        p = os.path.join(src, f"b{i}.parquet")
        e.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).coalesce(
            1
        ).write.parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (now - 600 + i * 300,) * 2)
    idx = "dif_test_ann_intake_idx"
    drop_table_and_location(spark, idx)
    try:
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "*.parquet"))
        )
        q = embedding_incremental_ann_intake(
            stream,
            os.path.join(tmp_root, "sink"),
            os.path.join(tmp_root, "ckpt"),
            idx,
            cents,
            threshold=0.4,
        )
        q.awaitTermination(180)
        got = {
            r.vec_id
            for r in spark.read.parquet(os.path.join(tmp_root, "sink")).collect()
        }
        # declarative twin
        a = e.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
        b = e.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
        dup = (
            a.join(b, F.col("ib") < F.col("ia"))
            .filter(
                F.round(cosine_similarity(F.col("va"), F.col("vb")), 6) >= 0.4
            )
            .select(F.col("ia").alias("vec_id"))
            .distinct()
        )
        want = {
            r.vec_id
            for r in e.select("vec_id").join(dup, "vec_id", "left_anti").collect()
        }
        assert got == want and got
        # the index holds EVERY intake vector (dropped ones still block)
        assert spark.table(idx).count() == 120
    finally:
        drop_table_and_location(spark, idx)


def test_video_frame_near_dup_detects_shared_prefix(spark):
    from dataingestionframework_spark.plans.queries import video_frame_near_dup

    rows = video_frame_near_dup(spark, SF_DIR).collect()
    assert rows, "corpus has shared 192-byte prefixes; pairs expected"
    assert all(r.shared_frames >= 2 for r in rows)


def test_running_user_ewma_batch_fallback_matches_lag_algebra(spark):
    """The batch fallback of the stateful EWMA equals ewma_finite at
    each user's final event (same alpha/window constants)."""
    from dataingestionframework_spark.streaming.stateful import running_user_ewma

    df = spark.createDataFrame(
        [(i, i, 1 + (i % 2), float(10 * (i + 1))) for i in range(10)],
        "event_id long, ts long, user_id long, value double",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    got = {r.user_id: (r.n_seen, r.ewma) for r in running_user_ewma(df).collect()}
    # user 1: values 10,30,50,70,90 ; user 2: 20,40,60,80,100
    w = [0.5 ** i for i in range(5)]
    for uid, vals in ((1, [90, 70, 50, 30, 10]), (2, [100, 80, 60, 40, 20])):
        want = round(sum(v * wi for v, wi in zip(vals, w)) / sum(w), 4)
        assert got[uid] == (5, want)


def test_bpe_encode_applies_merges_greedily(spark):
    from dataingestionframework_spark.operators.text import bpe_encode

    # merges: (l,o)->lo rank0, (lo,w)->low rank1, (e,r)->er rank2
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    df = spark.createDataFrame(
        [(1, "low lower"), (2, "xyz"), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.n_chars) for r in
           bpe_encode(df, merges).collect()}
    # "low" -> [low] = 1; "lower" -> [low, er] = 2 (lowest-rank first)
    assert got[1] == (3, 9)
    # no applicable merges: one token per char
    assert got[2] == (3, 3)
    assert got[3] == (0, 0)
