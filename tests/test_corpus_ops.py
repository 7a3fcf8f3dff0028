"""Corpus-assembly operators (operators/corpus.py): packing,
decontamination, split/shard. Value-level parity with DuckDB is the
oracle gate's job; these tests check the algebraic invariants the
oracle can't see."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dataingestionframework_spark.operators.corpus import (
    decontaminate,
    pack_sequences,
    tfidf_top_terms,
    train_split_shard,
)
from dataingestionframework_spark.plans.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF_DIR, "documents")


def test_pack_sequences_invariants(spark, docs):
    seq_len = 128
    packed = pack_sequences(docs, seq_len=seq_len, pack_key="lang").cache()
    # Every sequence is exactly full except the last one per group.
    fills = (
        packed.groupBy("pack_key", "seq_id")
        .agg(F.sum("slice_tokens").alias("fill"))
        .withColumn(
            "last_seq",
            F.col("seq_id")
            == F.max("seq_id").over(Window.partitionBy("pack_key")),
        )
    )
    bad = fills.filter(
        (~F.col("last_seq")) & (F.col("fill") != seq_len)
    ).count()
    assert bad == 0
    over = fills.filter(F.col("fill") > seq_len).count()
    assert over == 0
    # No tokens lost: per-doc slice sums equal the doc token count.
    from dataingestionframework_spark.functions import token_count

    per_doc = packed.groupBy("doc_id").agg(
        F.sum("slice_tokens").alias("packed_tok")
    )
    orig = docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    lost = (
        orig.join(per_doc, "doc_id", "left")
        .filter(
            (F.col("packed_tok").isNull())
            | (F.col("packed_tok") != F.col("n_tok"))
        )
        .count()
    )
    assert lost == 0
    packed.unpersist()


def test_decontaminate_benchmark_docs_fully_flagged(spark, docs):
    # A corpus containing the benchmark itself: benchmark docs (with >=
    # n tokens) must all be flagged with overlap == their gram count.
    bench = docs.filter(F.col("doc_id") < 20)
    out = decontaminate(docs, bench, n=3, min_overlap=1)
    flagged = {
        r["doc_id"]
        for r in out.filter("contaminated").select("doc_id").collect()
    }
    assert set(range(20)) <= flagged


def test_tfidf_rank_is_dense_per_doc(spark, docs):
    out = tfidf_top_terms(docs.limit(50), k=3)
    counts = out.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("rank").alias("mr")
    )
    assert counts.filter(F.col("n") != F.col("mr")).count() == 0
    assert out.filter(F.col("rank") > 3).count() == 0


def test_train_split_shard_deterministic_and_balanced(spark, docs):
    a = train_split_shard(docs, n_shards=16, seed=7)
    b = train_split_shard(docs, n_shards=16, seed=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    total = docs.count()
    frac = {
        r["split"]: r["n"] / total
        for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    # 90/5/5 within loose binomial bounds at n=50.
    assert 0.7 < frac.get("train", 0) < 1.0
    # Different seed reassigns some documents.
    c = train_split_shard(docs, n_shards=16, seed=8)
    assert a.exceptAll(c).count() > 0


def test_seeded_shuffle_is_permutation_and_deterministic(spark, docs):
    from dataingestionframework_spark.operators.corpus import seeded_shuffle

    out = seeded_shuffle(docs.select("doc_id"), seed=3).cache()
    n = docs.count()
    # dense 0..n-1 permutation
    ranks = [r.shuffle_rank for r in out.select("shuffle_rank").collect()]
    assert sorted(ranks) == list(range(n))
    # deterministic across re-execution
    again = seeded_shuffle(docs.select("doc_id"), seed=3)
    assert out.orderBy("doc_id").collect() == again.orderBy("doc_id").collect()
    # a different seed produces a different order (overwhelmingly likely)
    other = seeded_shuffle(docs.select("doc_id"), seed=4)
    assert out.orderBy("doc_id").collect() != other.orderBy("doc_id").collect()
    out.unpersist()


def test_global_sort_rank_matches_single_partition_sort(spark):
    from dataingestionframework_spark.operators.corpus import global_sort_rank

    df = spark.range(0, 1000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("h")
    )
    got = {r.id: r.rank for r in global_sort_rank(df, "h").collect()}
    expect = {
        r.id: i
        for i, r in enumerate(df.orderBy("h").collect())
    }
    assert got == expect


def test_corpus_diff_statuses(spark):
    from dataingestionframework_spark.operators.corpus import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "doc_id long, text string"
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_sample_frames_matches_python_reference(spark):
    import hashlib

    from dataingestionframework_spark.operators.multimodal import sample_frames

    rows = [(1, b"x" * 100), (2, b"abcdefgh" * 40), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = sample_frames(df, "payload", frame_bytes=32, stride=2).collect()
    expect = []
    for rid, payload in rows:
        if payload is None:
            continue
        n = (len(payload) + 31) // 32
        for i in range(0, n, 2):
            chunk = payload[i * 32 : (i + 1) * 32]
            expect.append(
                (rid, i, len(chunk), hashlib.md5(chunk.hex().encode()).hexdigest())
            )
    got = sorted((r.doc_id, r.frame_idx, r.frame_size, r.frame_md5) for r in out)
    assert got == sorted(expect)


def test_resize_stub_matches_python_reference(spark):
    import hashlib

    from dataingestionframework_spark.operators.multimodal import resize_stub

    rows = [(1, bytes(range(100))), (2, b"xy"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.orig_size, r.resized_size, r.resized_md5)
        for r in resize_stub(df, "payload", stride=3).collect()
    }
    expect = {}
    for rid, payload in rows:
        if payload is None:
            continue
        resized = payload[::3]
        expect[rid] = (
            len(payload), len(resized),
            hashlib.md5(resized.hex().encode()).hexdigest(),
        )
    assert got == expect
