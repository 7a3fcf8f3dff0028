"""Round-8 regression pins: the shared finiteness predicate, the
monitor-family measurement envelopes (EWMA 1e9 input envelope,
seasonal-naive 1e8 hourly-sum envelope), the winnowing position-
envelope guard (loud, not silent corruption), skew-profile NULL-key
ordering, and the stateful-EWMA non-finite contract."""

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

INF = float("inf")
NAN = float("nan")


# ---------------------------------------------------------------------------
# is_finite — the Spark twin of DuckDB's isfinite()
# ---------------------------------------------------------------------------


def test_is_finite_matches_duckdb_isfinite(spark):
    import duckdb

    from dataingestionframework_spark.functions import is_finite

    vals = [1.5, 0.0, -7.0, INF, -INF, NAN, None, 9.99e12, -1e308]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r.f for r in df.select(is_finite(F.col("v")).alias("f"))
        .collect()
    ]
    def lit(v):
        if v is None:
            return "NULL"
        return repr(v).replace("inf", "'infinity'::DOUBLE").replace(
            "nan", "'nan'::DOUBLE"
        )

    want = [
        duckdb.sql(
            "SELECT v IS NOT NULL AND isfinite(v) FROM "
            f"(SELECT CAST({lit(v)} AS DOUBLE) AS v)"
        ).fetchone()[0]
        for v in vals
    ]
    assert got == want == [True, True, True, False, False, False, False,
                           True, True]


# ---------------------------------------------------------------------------
# EWMA measurement envelope: non-finite AND out-of-envelope are missing
# ---------------------------------------------------------------------------


def test_stateful_ewma_skips_nonfinite_but_counts_them(spark):
    from dataingestionframework_spark.streaming.stateful import (
        running_user_ewma,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 7, 10.0),
        (2, "2024-01-01 01:00:00", 7, NAN),
        (3, "2024-01-01 02:00:00", 7, INF),
        (4, "2024-01-01 03:00:00", 7, 20.0),
        # user 8: nothing finite -> NULL ewma, n_seen still 2
        (5, "2024-01-01 00:00:00", 8, -INF),
        (6, "2024-01-01 01:00:00", 8, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.user_id: r for r in running_user_ewma(df).collect()}
    assert out[7].n_seen == 4
    # window holds [10.0, 20.0]: ewma = (20*1 + 10*0.5) / 1.5
    assert out[7].ewma == pytest.approx(round(25.0 / 1.5, 4))
    assert out[8].n_seen == 2 and out[8].ewma is None


def test_ewma_anomaly_excludes_out_of_envelope_magnitudes(spark):
    """|value| > 1e9 readings are outside the 4-dp display contract's
    precision envelope and must not reach the detector on either
    engine (round-7 fuzz failure: 9.99e12 pushed the EWMA past
    double's 15.9 significant digits)."""
    from dataingestionframework_spark.plans.queries import QUERIES

    out = QUERIES["ewma_anomaly_events"](spark, SF_DIR)
    mx = out.agg(F.max(F.abs("value"))).first()[0]
    assert mx is None or mx <= 1e9


# ---------------------------------------------------------------------------
# seasonal-naive hourly-sum envelope
# ---------------------------------------------------------------------------


def test_seasonal_naive_excludes_out_of_envelope_hours(spark):
    from dataingestionframework_spark.operators.windows import (
        seasonal_naive_error,
    )

    rows = []
    # 48 in-envelope hourly observations with a clean daily pattern
    for d in range(2):
        for h in range(24):
            rows.append(
                (len(rows), f"2024-01-{d + 1:02d} {h:02d}:30:00",
                 1, "view", float(100 + h))
            )
    # one hostile hour whose sum blows the 1e8 envelope
    rows.append((999, "2024-01-03 05:30:00", 1, "view", 9.99e12))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
        "event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = seasonal_naive_error(df).collect()
    assert len(out) == 1
    r = out[0]
    # the hostile hour is excluded: 48 in-envelope hours remain, the
    # seasonal lag is a perfect forecast on day 2
    assert r.n_hours == 48
    assert r.mae_seasonal == 0.0
    assert r.mase_ratio == 0.0


# ---------------------------------------------------------------------------
# winnowing position envelope: loud error, exact packing at the edge
# ---------------------------------------------------------------------------


def test_winnowing_raises_past_position_envelope(spark, monkeypatch):
    """A gram position past 2^bits must raise with a message naming the
    segmentation fix — NOT silently bleed into the hash bits (round-7
    verdict item 3: the 1M-gram precondition was untested). Patched to
    6 bits so the boundary is reachable with 70 tokens."""
    import dataingestionframework_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "_WINNOW_POS_BITS", 6)
    words = [f"w{i}x" for i in range(70)]  # 66 grams at k=5 > 2^6
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    with pytest.raises(Exception, match="segment"):
        dd.winnowing_fingerprints(df, k=5, w=4).collect()


def test_winnowing_exact_at_envelope_edge(spark, monkeypatch):
    """At the LAST in-envelope position (pos == 2^bits - 1) the packed
    key still splits back into (hash, pos) losslessly."""
    import dataingestionframework_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "_WINNOW_POS_BITS", 7)
    n_tokens = 131  # 127 grams at k=5: max pos = 126 = 2^7 - 2
    words = [f"tok{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    fps = dd.winnowing_fingerprints(df, k=5, w=4).collect()
    assert fps, "expected fingerprints from a 131-token doc"
    assert all(0 <= r.fp_pos < (1 << 7) for r in fps)
    assert all(r.fp_hash < (1 << 40) for r in fps)


# ---------------------------------------------------------------------------
# skew profile: NULL key ordering pinned NULLS LAST on ties
# ---------------------------------------------------------------------------


def test_skew_profile_null_key_sorts_last_on_tie(spark):
    from dataingestionframework_spark.operators.profile import skew_profile

    rows = [(None,), (None,), ("a",), ("a",), ("b",)]
    df = spark.createDataFrame(rows, "k string")
    out = skew_profile(df, "k", top_n=10).collect()
    keys = [r.key for r in out]
    # cnt=2 tie between 'a' and NULL: 'a' must rank before NULL
    assert keys == ["a", None, "b"]
    assert [r.rank for r in out] == [1, 2, 3]


# ---------------------------------------------------------------------------
# stream counters: ±Inf readings are missing observations
# ---------------------------------------------------------------------------


def test_running_counters_batch_fallback_skips_nonfinite(spark):
    from dataingestionframework_spark.streaming.stateful import (
        running_user_counters,
    )

    rows = [
        (1, 7, 10.0), (2, 7, INF), (3, 7, NAN), (4, 7, 5.5),
        (5, 8, -INF),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    out = {r.user_id: r for r in running_user_counters(df).collect()}
    assert out[7].n_events == 4 and out[7].total_value == 15.5
    assert out[8].n_events == 1 and out[8].total_value == 0.0


def test_update_counters_callback_skips_nonfinite():
    """Drive the applyInPandasWithState callback directly (no stream):
    the running total must match the batch fallback's finite-only sum."""
    import pandas as pd

    from dataingestionframework_spark.streaming.stateful import (
        _update_counters,
    )

    class _State:
        exists = False

        def __init__(self):
            self.stored = None

        def update(self, v):
            self.stored = v

    st = _State()
    pdf = pd.DataFrame({"value": [10.0, INF, NAN, None, 5.5]})
    out = list(_update_counters((7,), iter([pdf]), st))
    assert st.stored == (5, 15.5)
    assert out[0]["total_value"][0] == 15.5


# ---------------------------------------------------------------------------
# round-8 operators: cooccurrence lift, HBOS, FD profile, RBO
# ---------------------------------------------------------------------------


def test_cooccurrence_lift_basic(spark):
    from dataingestionframework_spark.operators.behavior import (
        cooccurrence_lift,
    )

    rows = [
        (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"),
        (4, "b"), (4, "b"),  # duplicate item in a basket counts once
    ]
    df = spark.createDataFrame(rows, "bk long, it string")
    out = {(r.item_a, r.item_b): r for r in cooccurrence_lift(
        df, "bk", "it", min_support=2, top_n=10
    ).collect()}
    ab = out[("a", "b")]
    # a,b co-occur in baskets 1,2 of 4 baskets; n_a=3, n_b=3
    assert ab.n_ab == 2 and ab.n_a == 3 and ab.n_b == 3
    assert ab.lift == pytest.approx(round(2 * 4 / 9.0, 6))
    assert ("a", "c") not in out  # support 1 < min_support


def test_cooccurrence_hot_basket_capped(spark):
    from dataingestionframework_spark.operators.behavior import (
        cooccurrence_lift,
    )

    rows = [(1, f"i{j}") for j in range(50)] + [
        (2, "x"), (2, "y"), (3, "x"), (3, "y"),
    ]
    df = spark.createDataFrame(rows, "bk long, it string")
    out = cooccurrence_lift(
        df, "bk", "it", min_support=1, max_basket_size=10, top_n=1000
    ).collect()
    # the 50-item basket is dropped entirely; only (x, y) remains
    assert {(r.item_a, r.item_b) for r in out} == {("x", "y")}


def test_hbos_scores_thin_buckets_highest(spark):
    from dataingestionframework_spark.operators.profile import hbos_outliers

    rows = [(i, 10.0, "common") for i in range(99)] + [(999, 99999.0, "rare")]
    df = spark.createDataFrame(rows, "id long, v double, c string")
    out = hbos_outliers(df, "id", "v", "c", lo=0.0, hi=100000.0,
                        n_buckets=10, top_n=3)
    top = out.collect()[0]
    assert top.id == 999  # alone in its bucket AND its category
    # score = -ln(1/100) - ln(1/100)
    assert top.score == pytest.approx(round(-2 * math.log(0.01), 6))


def test_fd_profile_exact_and_violated(spark):
    from dataingestionframework_spark.operators.profile import fd_profile

    rows = [(1, "x"), (1, "x"), (2, "x"), (2, "y"), (2, "y"), (3, None)]
    df = spark.createDataFrame(rows, "a long, b string")
    out = {r.determinant: r for r in fd_profile(
        df, [("a", "b"), ("b", "a")]
    ).collect()}
    fa = out["a"]
    # a=2 maps to both x and y: keep max(1,2)=2 of 3 -> 1 violation
    assert fa.n_rows == 6 and fa.n_distinct_det == 3
    assert fa.n_violations == 1
    assert fa.confidence == pytest.approx(round(5 / 6, 6))


def test_rbo_identical_and_disjoint_rankings(spark):
    from dataingestionframework_spark.operators.retrieval import (
        rbo_rank_agreement,
    )

    # identical rankings -> rbo == 1.0
    rows = [("g", i, float(100 - i), float(100 - i)) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, id long, sa double, sb double")
    out = rbo_rank_agreement(df, "g", "id", "sa", "sb", k=10, p=0.9).collect()
    assert len(out) == 1 and out[0].rbo == pytest.approx(1.0)
    assert out[0].n_common == 10

    # fully reversed rankings of 2k items -> top-k prefixes disjoint
    rows2 = [("g", i, float(i), float(-i)) for i in range(40)]
    df2 = spark.createDataFrame(rows2, "g string, id long, sa double, sb double")
    out2 = rbo_rank_agreement(df2, "g", "id", "sa", "sb", k=10, p=0.9).collect()
    assert out2 == []  # no item in both prefixes -> no group row


def test_rbo_monotone_in_overlap(spark):
    from dataingestionframework_spark.operators.retrieval import (
        rbo_rank_agreement,
    )

    # ranking B = A with the tail swapped: high agreement but < 1
    sa = list(range(30, 0, -1))
    sb = sa.copy()
    sb[8], sb[9] = sb[9], sb[8]
    rows = [("g", i, float(sa[i]), float(sb[i])) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, id long, sa double, sb double")
    r = rbo_rank_agreement(df, "g", "id", "sa", "sb", k=10, p=0.9).collect()[0]
    assert 0.9 < r.rbo < 1.0


# ---------------------------------------------------------------------------
# degenerate-input guards (the empty/single fuzz-profile class)
# ---------------------------------------------------------------------------


def test_knn_join_brute_empty_and_small_right(spark):
    from dataingestionframework_spark.operators.similarity import (
        knn_join_brute,
    )

    left = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    empty = left.filter("vec_id < 0")
    assert knn_join_brute(left, empty, k=3).count() == 0
    # right smaller than k: emit what exists, ranks 1..n_right
    one = left.filter("vec_id = 1")
    out = knn_join_brute(left, one, k=3).collect()
    assert len(out) == 2 and all(r.rank == 1 for r in out)


def test_kmeans_lloyd_empty_input(spark):
    from dataingestionframework_spark.operators.similarity import (
        kmeans_lloyd,
    )

    df = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    assigned, cents, counts = kmeans_lloyd(df, k=4, iters=1)
    assert assigned.count() == 0 and cents == {} and counts == {}


def test_global_sort_rank_empty(spark):
    from dataingestionframework_spark.operators.corpus import seeded_shuffle

    df = spark.createDataFrame([], "doc_id long")
    assert seeded_shuffle(df, seed=7).count() == 0


# ---------------------------------------------------------------------------
# streaming PSI intake: additive store == one-shot counts, any order
# ---------------------------------------------------------------------------


def test_psi_store_order_invariant(spark, tmp_path):
    import datetime as dt

    from dataingestionframework_spark.operators.profile import (
        psi_bucket_merge_into_store,
        psi_drift,
        psi_from_store,
    )

    cutoff = dt.datetime(2024, 1, 16)
    rows = [
        (i, dt.datetime(2024, 1, 10 + (i % 12), 6), float(i * 37 % 500))
        for i in range(120)
    ] + [(900, dt.datetime(2024, 1, 20), NAN), (901, dt.datetime(2024, 1, 21), INF)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")

    def run(order):
        store = str(tmp_path / f"store_{'_'.join(map(str, order))}")
        for i in order:
            psi_bucket_merge_into_store(
                df.filter(F.pmod("event_id", F.lit(3)) == i),
                store, "value", "ts", cutoff, lo=0.0, hi=500.0,
            )
        return sorted(
            tuple(r) for r in psi_from_store(spark, store).collect()
        )

    a = run([0, 1, 2])
    b = run([2, 0, 1])
    assert a == b
    batch = sorted(
        tuple(r)
        for r in psi_drift(
            df.filter(F.col("ts") < F.lit(cutoff)),
            df.filter(F.col("ts") >= F.lit(cutoff)),
            "value", lo=0.0, hi=500.0,
        ).collect()
    )
    assert a == batch


def test_mi_profile_exact_dependency_and_independence(spark):
    from dataingestionframework_spark.operators.profile import mi_profile

    # B is a function of A: MI == H(B); C is independent of A: MI ~ 0
    # (c cycles on i//4 so every (a, c) cell appears equally often)
    rows = [(i % 4, (i % 4) * 10, (i // 4) % 2) for i in range(64)]
    df = spark.createDataFrame(rows, "a int, b int, c int")
    out = {(r.col_a, r.col_b): r for r in mi_profile(
        df, [("a", "b"), ("a", "c")]
    ).collect()}
    fab = out[("a", "b")]
    assert fab.mi == pytest.approx(fab.h_b, abs=1e-6)  # H(B|A) = 0
    assert fab.h_a == pytest.approx(round(math.log(4), 6))
    fac = out[("a", "c")]
    assert fac.mi == pytest.approx(0.0, abs=1e-6)  # balanced grid


def test_vector_quality_status_ladder(spark):
    from dataingestionframework_spark.operators.similarity import (
        vector_quality_status,
    )

    rows = [
        (1, [1.0, 2.0]),
        (2, None),
        (3, [1.0]),            # wrong dim
        (4, [NAN, 1.0]),
        (5, [INF, 1.0]),
        (6, [0.0, 0.0]),
        (7, [1.0, None]),      # NULL element -> non_finite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.vec_status for r in vector_quality_status(
        df, expected_dim=2
    ).collect()}
    assert out == {1: "ok", 2: "null", 3: "wrong_dim", 4: "non_finite",
                   5: "non_finite", 6: "zero_norm", 7: "non_finite"}


def test_threshold_sweep_confusion_math(spark):
    from dataingestionframework_spark.operators.profile import threshold_sweep

    # scores 0.1..1.0, label = score > 0.55
    rows = [(i / 10.0, i / 10.0 > 0.55) for i in range(1, 11)]
    rows += [(None, True), (0.9, None)]  # no-signal rows excluded
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = {r.threshold: r for r in threshold_sweep(
        df, "score", "label", [0.5, 0.8]
    ).collect()}
    t5 = out[0.5]
    # flagged = scores >= 0.5 -> 6 rows (0.5..1.0); positives = 0.6..1.0
    assert (t5.n_flagged, t5.tp, t5.fp, t5.fn) == (6, 5, 1, 0)
    assert t5.precision == pytest.approx(round(5 / 6, 6))
    assert t5.recall == 1.0 and t5.f1 == pytest.approx(round(10 / 11, 6))
    t8 = out[0.8]
    assert (t8.n_flagged, t8.tp, t8.fp, t8.fn) == (3, 3, 0, 2)


def test_attribution_last_touch_basic(spark):
    from dataingestionframework_spark.operators.behavior import (
        attribution_last_touch,
    )

    rows = [
        # user 1: click then view then purchase -> view credited
        (1, "2024-01-01 01:00:00", 1, "click", 0.0),
        (2, "2024-01-01 02:00:00", 1, "view", 0.0),
        (3, "2024-01-01 03:00:00", 1, "purchase", 100.0),
        # user 2: touch AFTER the purchase -> direct (NULL channel)
        (4, "2024-01-02 05:00:00", 2, "click", 0.0),
        (5, "2024-01-02 04:00:00", 2, "purchase", 50.0),
        # user 3: no touches at all -> direct
        (6, "2024-01-03 00:00:00", 3, "purchase", 25.0),
        # user 4: tie on touch ts -> higher event_id wins
        (7, "2024-01-04 00:00:00", 4, "click", 0.0),
        (8, "2024-01-04 00:00:00", 4, "view", 0.0),
        (9, "2024-01-04 01:00:00", 4, "purchase", 10.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.channel: r for r in attribution_last_touch(
        df, ["click", "view"], "purchase"
    ).collect()}
    assert out["view"].n_conversions == 2  # user 1 + user 4 (id 8 wins tie)
    assert out["view"].credited_value == 110.0
    assert out[None].n_conversions == 2 and out[None].credited_value == 75.0
    assert "click" not in out


def test_cohen_kappa_perfect_chance_and_constant(spark):
    from dataingestionframework_spark.operators.profile import cohen_kappa

    # perfect agreement
    d1 = spark.createDataFrame([("a", "a"), ("b", "b")] * 10, "a string, b string")
    r = cohen_kappa(d1, "a", "b").collect()[0]
    assert r.kappa == 1.0 and r.po == 1.0

    # independent raters on a balanced 2x2 grid: kappa ~ 0
    rows = [(x, y) for x in "ab" for y in "ab" for _ in range(5)]
    d2 = spark.createDataFrame(rows, "a string, b string")
    r2 = cohen_kappa(d2, "a", "b").collect()[0]
    assert r2.kappa == pytest.approx(0.0, abs=1e-6)

    # both raters constant: pe = 1 -> kappa NULL, po = 1
    d3 = spark.createDataFrame([("a", "a")] * 8, "a string, b string")
    r3 = cohen_kappa(d3, "a", "b").collect()[0]
    assert r3.kappa is None and r3.po == 1.0

    # NULL labels are categories: NULL vs NULL agrees
    d4 = spark.createDataFrame(
        [("a", "a"), (None, None), ("a", None), (None, "a")],
        "a string, b string",
    )
    r4 = cohen_kappa(d4, "a", "b").collect()[0]
    assert r4.po == 0.5
