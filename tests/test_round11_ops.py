"""Round-11 optimization-equivalence tests.

1. ``verify_pairs_jaccard_arrays`` (the batch-scale array-intersect
   verify the streaming near-dup intake now uses) is row-identical to
   the corpus-scale join-shape ``verify_pairs_jaccard`` — including on
   hostile rows (NULL/empty/whitespace/short texts).
2. ``classification_metrics``'s single-pass two-role rewrite keeps the
   exact output (schema AND rows) of the former two-agg + full-outer
   shape, including NULL-as-a-class and pred-only/label-only classes.
3. The near-dup foreachBatch handler releases its per-batch pins: the
   parity query leaves no leaked persistent RDDs behind.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_verify_pairs_jaccard_arrays_equivalence(spark):
    from dataingestionframework_spark.operators.dedup import (
        verify_pairs_jaccard,
        verify_pairs_jaccard_arrays,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "completely different words here entirely unrelated"),
            (5, None),
            (6, ""),
            (7, "   "),
            (8, "two words"),  # fewer tokens than n=3: zero grams
            (9, "the quick brown"),  # exactly one gram
        ],
        "doc_id long, text string",
    )
    # all ordered pairs as candidates: verification must agree everywhere
    ids = docs.select("doc_id")
    cand = (
        ids.select(F.col("doc_id").alias("id_a"))
        .join(ids.select(F.col("doc_id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    for thr in (0.2, 0.5, 1.0):
        a = verify_pairs_jaccard(cand, docs, threshold=thr)
        b = verify_pairs_jaccard_arrays(cand, docs, threshold=thr)
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb, f"threshold={thr}: {ra} != {rb}"
    # identical pairs verify at exactly 1.0 and survive threshold 1.0
    top = verify_pairs_jaccard_arrays(cand, docs, threshold=1.0).collect()
    assert {(r.id_a, r.id_b, r.jaccard_sim) for r in top} == {(1, 3, 1.0)}
    # the threshold<=0 guard matches the join shape's
    with pytest.raises(ValueError):
        verify_pairs_jaccard_arrays(cand, docs, threshold=0.0)


def test_classification_metrics_two_role_rewrite(spark):
    from dataingestionframework_spark.operators.profile import (
        classification_metrics,
    )

    rows = [
        ("en", "en"),
        ("en", "de"),
        ("de", "de"),
        ("de", "de"),
        ("fr", "en"),  # label-only class "fr"
        ("en", "it"),  # pred-only class "it"
        (None, None),  # NULL==NULL counts as a true positive
        (None, "en"),
        ("de", None),
    ]
    df = spark.createDataFrame(rows, "lang string, lang_pred string")
    out = {r["class"]: r for r in classification_metrics(df, "lang", "lang_pred").collect()}
    assert set(out) == {"en", "de", "fr", "it", None}
    # schema: counters stay non-nullable longs (cross-engine type gate)
    m = classification_metrics(df, "lang", "lang_pred")
    for f in m.schema.fields:
        if f.name in ("n_true", "n_pred", "tp"):
            assert not f.nullable and f.dataType.simpleString() == "bigint"
    en = out["en"]
    assert (en.n_true, en.n_pred, en.tp) == (3, 3, 1)
    de = out["de"]
    assert (de.n_true, de.n_pred, de.tp) == (3, 3, 2)
    fr = out["fr"]
    assert (fr.n_true, fr.n_pred, fr.tp) == (1, 0, 0)
    assert fr.precision is None and fr.recall == 0.0 and fr.f1 is None
    it = out["it"]
    assert (it.n_true, it.n_pred, it.tp) == (0, 1, 0)
    assert it.precision == 0.0 and it.recall is None and it.f1 is None
    nu = out[None]
    assert (nu.n_true, nu.n_pred, nu.tp) == (2, 2, 1)
    assert nu.precision == 0.5 and nu.recall == 0.5 and nu.f1 == 0.5


def test_profile_stacked_distinct_matches_countdistinct(spark):
    """The stacked string-keyed distinct pass must equal native
    countDistinct on the values where injectivity is subtle: ±0.0,
    NaN, NULLs, empty vs blank strings — and binary columns must fall
    back to the wide-agg countDistinct."""
    from pyspark.sql import types as T

    from dataingestionframework_spark.operators.profile import profile

    rows = [
        (1, 0.0, "a", bytearray(b"\x00")),
        (2, -0.0, "", bytearray(b"\x00\x00")),
        (3, float("nan"), " ", bytearray(b"\x01")),
        (4, float("nan"), None, None),
        (5, None, "a", bytearray(b"\x00")),
        (5, 2.5, "b", bytearray(b"")),
    ]
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("bin", T.BinaryType()),
    ])
    df = spark.createDataFrame(rows, schema)
    out = {r.column: r for r in profile(df, ["k", "x", "s", "bin"]).collect()}
    # exact distincts: k {1,2,3,4,5}; x {0.0, NaN, 2.5} (NaN is one
    # value and countDistinct NORMALIZES -0.0 to 0.0 — the stacked pass
    # must reproduce that); s {"a","",""," ","b"} -> 4; bin 4 distinct
    assert out["k"].n_distinct == 5
    assert out["x"].n_distinct == 3
    assert out["s"].n_distinct == 4
    assert out["bin"].n_distinct == 4
    assert out["x"].n_nonnull == 5
    assert out["s"].n_nonnull == 5
    # cross-check every column against native countDistinct
    for c in ("k", "x", "s", "bin"):
        expect = df.agg(F.countDistinct(c)).first()[0]
        assert out[c].n_distinct == expect, c


def test_near_dup_handler_releases_batch_pins(spark, tmp_path):
    import os

    from dataingestionframework_spark.ingest.corpus import (
        corpus_incremental_near_dup_intake,
    )
    from dataingestionframework_spark.operators.bucketing import (
        drop_table_and_location,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta token{i} eta theta iota")
         for i in range(40)],
        "doc_id long, text string",
    )
    src = tmp_path / "src"
    src.mkdir()
    import time as _time

    now = _time.time()
    for i, (lo, hi) in enumerate(((0, 20), (20, 40))):
        p = str(src / f"b{i}.parquet")
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("overwrite").parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (now - 600 + i * 300,) * 2)
    idx = "dif_test_r11_nd_idx"
    drop_table_and_location(spark, idx)
    base = _n_persistent(spark)
    try:
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*.parquet"))
        )
        q = corpus_incremental_near_dup_intake(
            stream, str(tmp_path / "sink"), str(tmp_path / "ckpt"), idx,
            threshold=0.3,
        )
        q.awaitTermination(300)
        # per-batch pins (batch image, drop set) and the candidate cache
        # are released inside the handler, not left to the periodic GC
        assert _n_persistent(spark) - base <= 1
        out = spark.read.parquet(str(tmp_path / "sink"))
        assert out.count() > 0
    finally:
        drop_table_and_location(spark, idx)
