"""Round-7 operator tests: winnowing fingerprints (guarantee, density,
copy detection, hot-fp cap), k-anonymity class-size histogram, hot-key
skew profile, and the advice-item regression pins (threshold-before-
round, DST-safe cohorts, degenerate zipf groups, time-based seasonal
lags)."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------

K, W = 5, 4


def _fps(spark, rows):
    from dataingestionframework_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return winnowing_fingerprints(df, k=K, w=W)


def test_winnowing_guarantee_shared_run(spark):
    """The winnowing THEOREM (Schleimer et al. §2): two docs sharing a
    token run of length >= w + k - 1 share at least one fingerprint
    HASH, wherever the run sits in either doc."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 >= 4+5-1
    a = "one two three " + shared + " nine ten"
    b = shared + " completely different tail here now"
    fps = _fps(spark, [(1, a), (2, b)])
    h1 = {r.fp_hash for r in fps.filter(F.col("doc_id") == 1).collect()}
    h2 = {r.fp_hash for r in fps.filter(F.col("doc_id") == 2).collect()}
    assert h1 & h2, "guaranteed shared fingerprint missing"


def test_winnowing_no_fingerprints_below_window(spark):
    """Docs with fewer than k + w - 1 tokens have no full window and
    emit NOTHING (not a partial-window artifact)."""
    fps = _fps(spark, [(1, "a b c d e f g"), (2, "x y")])  # 7 < 8, 2 < 5
    assert fps.count() == 0


def test_winnowing_density_bound(spark):
    """Fingerprint count per doc is between n_windows/w (every window
    could pick the same key only if runs repeat) and n_windows — and
    near the expected 2/(w+1) density on random-ish text."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    from dataingestionframework_spark.operators.dedup import (
        winnowing_fingerprints,
    )
    from dataingestionframework_spark.functions import tokens

    fps = winnowing_fingerprints(docs, k=K, w=W)
    per = {r.doc_id: r.n for r in fps.groupBy("doc_id").agg(
        F.count("*").alias("n")).collect()}
    toks = {r.doc_id: r.n for r in docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n")).collect()}
    checked = 0
    for d, n_tok in toks.items():
        n_win = n_tok - K + 1 - W + 1
        if n_win < 1:
            assert d not in per
            continue
        n_fp = per[d]
        assert 1 <= n_fp <= n_win
        checked += 1
    assert checked > 50


def test_winnowing_candidate_pairs_finds_plant(spark):
    """A planted near-copy (same text, one token changed mid-doc) is
    recovered by the fingerprint equi-join with n_shared >= 2."""
    from dataingestionframework_spark.operators.dedup import (
        winnowing_candidate_pairs,
    )

    base = " ".join(f"tok{i}" for i in range(60))
    toks = base.split()
    toks[30] = "MUTATED"
    fps = _fps(spark, [(1, base), (2, " ".join(toks)), (3, " ".join(
        f"zzz{i}" for i in range(60)))])
    pairs = {(r.id_a, r.id_b) for r in winnowing_candidate_pairs(
        fps, min_shared=2).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_winnowing_hot_fp_cap_drops_boilerplate(spark):
    """max_fp_df drops fingerprints shared by more docs than the cap —
    the C(m,2) hot-bucket guard."""
    from dataingestionframework_spark.operators.dedup import (
        winnowing_candidate_pairs,
    )

    boiler = " ".join(f"same{i}" for i in range(30))
    fps = _fps(spark, [(i, boiler) for i in range(1, 6)])
    uncapped = winnowing_candidate_pairs(fps, min_shared=1).count()
    capped = winnowing_candidate_pairs(fps, min_shared=1, max_fp_df=2).count()
    assert uncapped == 10 and capped == 0  # C(5,2) vs all dropped


# ---------------------------------------------------------------------------
# k-anonymity histogram / skew profile
# ---------------------------------------------------------------------------


def test_k_anonymity_histogram_math(spark):
    from dataingestionframework_spark.operators.profile import (
        k_anonymity_audit,
    )

    rows = [
        ("us", "a", 1), ("us", "a", 2),           # class size 2, l=2
        ("us", "b", 1), ("us", "b", 1),           # class size 2, l=1
        ("de", "a", 3),                           # class size 1, l=1
        (None, "a", 4), (None, "a", 4),           # NULL QI is a class
    ]
    df = spark.createDataFrame(rows, "country string, seg string, s int")
    got = {r.class_size: (r.n_classes, r.n_rows, r.min_l)
           for r in k_anonymity_audit(df, ["country", "seg"],
                                      sensitive_col="s").collect()}
    assert got == {2: (3, 6, 1), 1: (1, 1, 1)}


def test_k_anonymity_without_sensitive_col(spark):
    from dataingestionframework_spark.operators.profile import (
        k_anonymity_audit,
    )

    df = spark.createDataFrame([("x", 1), ("x", 2)], "q string, v int")
    row = k_anonymity_audit(df, ["q"]).collect()[0]
    assert (row.class_size, row.n_classes, row.min_l) == (2, 1, None)


def test_skew_profile_math_and_null_key(spark):
    from dataingestionframework_spark.operators.profile import skew_profile

    rows = [("a",)] * 6 + [("b",)] * 2 + [(None,)] * 4
    df = spark.createDataFrame(rows, "k string")
    got = {r.key: r for r in skew_profile(df, "k", top_n=10).collect()}
    assert got["a"].cnt == 6 and got["a"].rank == 1
    # NULL key IS profiled (cast to string null -> key None)
    assert got[None].cnt == 4 and got[None].rank == 2
    # 3 keys, 12 rows: mean 4 -> skew of 'a' = 6/4
    assert abs(got["a"].skew_factor - 1.5) < 1e-9
    assert abs(got["a"].share - 0.5) < 1e-9


def test_skew_profile_top_n_tie_break(spark):
    from dataingestionframework_spark.operators.profile import skew_profile

    rows = [(k,) for k in ["x", "y", "z"] for _ in range(3)]
    df = spark.createDataFrame(rows, "k string")
    got = [r.key for r in skew_profile(df, "k", top_n=2).collect()]
    assert got == ["x", "y"]  # equal counts -> key asc decides the cut


# ---------------------------------------------------------------------------
# advice-item regression pins
# ---------------------------------------------------------------------------


def test_containment_threshold_on_unrounded_ratio(spark):
    """A pair whose true containment rounds UP to the threshold but is
    strictly below it must be excluded (threshold-before-round)."""
    from dataingestionframework_spark.operators.dedup import containment_join

    # 9,999 distinct grams in A, 9,999*0.4 - 1 = 3998.6 -> intersection
    # 3999 of 10000 grams = 0.3999 raw: rounds to 0.4 (placeholder for
    # the class); with a small corpus use threshold 0.5 on 2/3 vs 1/3.
    a = "w1 w2 w3 w4 w5 w6 w7"          # grams(3): 5
    b = "w1 w2 w3 w4 x y z"             # shares grams w1w2w3,w2w3w4 = 2/5 = 0.4
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    got = containment_join(df, threshold=0.41)
    assert got.filter((F.col("id_a") == 2) & (F.col("id_b") == 1)).count() == 0
    got2 = containment_join(df, threshold=0.4)
    assert got2.filter(
        (F.col("id_a") == 2) & (F.col("id_b") == 1)
    ).count() == 1


def test_zipf_slope_degenerate_group_is_null(spark):
    """A group whose top-R cut has one distinct rank (single token)
    yields NULL slope, not NaN (var_pop = 0 guard)."""
    from dataingestionframework_spark.operators.corpus import zipf_slope

    df = spark.createDataFrame(
        [(1, "only only only", "solo")], "doc_id long, text string, lang string"
    )
    row = zipf_slope(df, group_col="lang").collect()[0]
    assert row.zipf_slope is None


def test_cohort_week_offset_is_date_based(spark):
    """Weekly offsets come from calendar datediff, not raw seconds —
    activity 7 calendar days after the cohort week start is offset 1
    even when timestamps sit at awkward hours."""
    from dataingestionframework_spark.operators.behavior import (
        cohort_retention,
    )

    rows = [
        (1, "2024-01-01 23:30:00"),   # cohort week = 2024-01-01
        (1, "2024-01-08 00:30:00"),   # 6d1h later, next calendar week
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    )
    got = {r.week_offset: r.n_active for r in cohort_retention(
        df, granularity="week").collect()}
    assert got == {0: 1, 1: 1}


def test_seasonal_lag_is_time_based_not_row_based(spark):
    """With a missing hour in the series, the 1-hour-naive lag must
    skip it (NULL) instead of differencing against the previous
    OBSERVED hour — the round-6 advice misalignment."""
    from dataingestionframework_spark.operators.windows import (
        seasonal_naive_error,
    )

    rows = [
        ("g", "2024-01-01 00:10:00", 10.0),
        ("g", "2024-01-01 01:10:00", 20.0),
        # hour 02 missing
        ("g", "2024-01-01 03:10:00", 99.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts string, value double").select(
        "event_type", F.to_timestamp("ts").alias("ts"), "value"
    )
    row = seasonal_naive_error(df, period=24).collect()[0]
    # only ONE valid naive pair (00->01, |20-10| = 10); a row-lag would
    # also difference 03 against 01 (|99-20| = 79 -> mae 44.5)
    assert row.mae_naive == 10.0
    assert row.mae_seasonal is None  # no hour has a 24h-earlier twin


def test_prefix_dim_recall_full_prefix_is_perfect_and_zero_reported(spark):
    """The full-dimension 'prefix' reproduces the full ranking exactly
    (recall 1.0), and a query×prefix pair with zero overlap still gets
    its row (recall 0.0), not silence."""
    from dataingestionframework_spark.operators.similarity import (
        prefix_dim_recall,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {(r.query_id, r.prefix_dim): r for r in prefix_dim_recall(
        emb, query_ids=[0, 1], prefix_dims=[64], k=10).collect()}
    assert got[(0, 64)].n_overlap == 10 and got[(0, 64)].recall == 1.0
    assert got[(1, 64)].recall == 1.0

    # orthogonal prefix: vectors whose first dims are identical carry
    # no ranking signal; every (query, prefix) row must still appear
    rows = [(i, [0.0, 0.0] + [float((i * 7 + j) % 5) for j in range(6)])
            for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = prefix_dim_recall(df, query_ids=[0], prefix_dims=[2, 8], k=5)
    got2 = {(r.query_id, r.prefix_dim): r for r in out.collect()}
    assert set(got2) == {(0, 2), (0, 8)}  # zero-signal prefix reported too


# ---------------------------------------------------------------------------
# fuzz-gate regression pins (adversarial-data findings, round 7)
# ---------------------------------------------------------------------------


def test_text_stats_empty_doc_null_ratios(spark):
    """Empty/whitespace-only docs: NULL ratios, no ANSI divide-by-zero
    (Spark 4 default ANSI mode made x/0 a hard error — fuzz find)."""
    from dataingestionframework_spark.operators.text import with_text_stats

    df = spark.createDataFrame(
        [(1, ""), (2, "  \t "), (3, "one two")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_tokens, r.ttr) for r in with_text_stats(df).collect()}
    assert got[1] == (0, None) and got[2] == (0, None)
    assert got[3][0] == 2 and got[3][1] == 1.0


def test_weighted_sample_zero_weight_filtered(spark):
    """weight <= 0 rows have zero selection probability and are
    filtered (A-ES semantics), not an ANSI 1/0 error."""
    from dataingestionframework_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, 2.0), (4, None)],
        "doc_id long, w double",
    )
    got = {r.doc_id for r in weighted_sample(df, "w", k=10).collect()}
    assert got == {1, 3}


def test_argmax_family_tie_breaks_to_smallest_key(spark):
    """Equal extremum values resolve to the smallest orderkey on both
    top and bottom — not engine-defined max_by tie luck."""
    q = __import__(
        "dataingestionframework_spark.plans.queries", fromlist=["QUERIES"]
    )
    import duckdb

    import __spark_entry__ as m

    rows = [
        (10, "p", 5.0), (11, "p", 5.0),     # tied max
        (12, "p", 1.0), (13, "p", 1.0),     # tied min
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).withColumn("o_orderstatus", F.lit("O"))
    df.createOrReplaceTempView("_argmax_tie")
    got = spark.sql("""
        SELECT max_by(o_orderkey, struct(o_totalprice, -o_orderkey)) AS top,
               min_by(o_orderkey, struct(o_totalprice, o_orderkey)) AS bot
        FROM _argmax_tie
    """).collect()[0]
    assert (got.top, got.bot) == (10, 12)
    _ = q, duckdb, m  # imports exercised above; keep linters quiet
