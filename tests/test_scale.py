"""Opt-in plan-scaling sweep: `pytest -m scale`.

Replicates sf0.1 tables x10 in memory with shifted keys and asserts
wall-clock grows far sub-quadratically. The point is to catch a plan
regression (a lost pushdown, a join gone nested-loop, an agg gone
single-partition) as a TEST FAILURE instead of a narrated bench note:
a linear plan lands at ~1-2x the x1 wall (scheduling/codegen constants
dominate at this size — measured +0-40% in NOTES.md); a quadratic or
collect-driven plan blows straight through the 6x + slack threshold.

Thresholds are deliberately loose (the VM has +/-40% wall noise): they
only distinguish "scales" from "does not scale".
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import DataFrame, functions as F

pytestmark = pytest.mark.scale

SCALE_SF_DIR = "/root/testdata/sf0.1"
REPL = 10          # x10 data
MAX_RATIO = 6.0    # x10 data must cost < 6x the x1 wall ...
SLACK_SEC = 3.0    # ... plus absolute scheduling slack


def _rep(df: DataFrame, shift_cols: list[str], i: int, shift: int) -> DataFrame:
    out = df
    for c in shift_cols:
        out = out.withColumn(c, F.col(c) + F.lit(i * shift))
    return out


def _replicate(df: DataFrame, shift_cols: list[str], times: int, shift: int) -> DataFrame:
    parts = [_rep(df, shift_cols, i, shift) for i in range(times)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _wall(fn, runs: int = 2) -> float:
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _assert_scales(name: str, t1: float, t10: float) -> None:
    limit = MAX_RATIO * t1 + SLACK_SEC
    assert t10 < limit, (
        f"{name}: x{REPL} data took {t10:.2f}s vs {t1:.2f}s at x1 "
        f"(limit {limit:.2f}s) — the plan is not scaling linearly"
    )


@pytest.fixture(scope="module")
def sf(spark):
    def load(table: str) -> DataFrame:
        from dataingestionframework_spark.plans.tables import load

        return load(spark, SCALE_SF_DIR, table)

    return load


def test_groupby_agg_scales(spark, sf):
    """TPC-H Q1 shape: scan + partial-agg + final-agg, zero joins."""
    li = sf("lineitem")

    def q(df):
        return (
            df.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity"),
                F.sum("l_extendedprice"),
                F.avg("l_discount"),
                F.count("*"),
            )
            .collect()
        )

    q(li)  # warm codegen once for both sizes
    t1 = _wall(lambda: q(li))
    big = _replicate(li, ["l_orderkey"], REPL, 100_000_000)
    t10 = _wall(lambda: q(big))
    _assert_scales("groupby_agg", t1, t10)


def test_three_way_join_agg_scales(spark, sf):
    """customer x orders x lineitem equi-join + agg: the shuffle-join
    shape; keys shift consistently so x10 joins stay 1:N, not N:N."""
    cust, orders, li = sf("customer"), sf("orders"), sf("lineitem")
    K = 100_000_000

    def q(c, o, l):
        return (
            c.join(o, F.col("c_custkey") == F.col("o_custkey"))
            .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("c_mktsegment")
            .agg(F.sum("l_extendedprice").alias("rev"), F.count("*").alias("n"))
            .collect()
        )

    q(cust, orders, li)  # warm
    t1 = _wall(lambda: q(cust, orders, li))
    c10 = _replicate(cust, ["c_custkey"], REPL, K)
    o10 = _replicate(orders, ["o_orderkey", "o_custkey"], REPL, K)
    l10 = _replicate(li, ["l_orderkey"], REPL, K)
    t10 = _wall(lambda: q(c10, o10, l10))
    _assert_scales("three_way_join_agg", t1, t10)


def test_exact_dedup_scales(spark, sf):
    """Fingerprint groupBy dedup over documents: linear one-shuffle
    funnel; x10 docs (distinct ids, repeated texts -> bigger groups)."""
    from dataingestionframework_spark.operators.dedup import exact_duplicates

    docs = sf("documents")

    def q(df):
        return exact_duplicates(df).filter(F.col("n_copies") > 1).count()

    q(docs)  # warm
    t1 = _wall(lambda: q(docs))
    big = _replicate(docs, ["doc_id"], REPL, 100_000_000)
    t10 = _wall(lambda: q(big))
    _assert_scales("exact_dedup", t1, t10)


def _perturbed_docs(docs: DataFrame, times: int, shift: int) -> DataFrame:
    """Replicate docs with shifted ids AND per-replica token suffixes —
    every gram differs across replicas, so replication scales the
    corpus without fabricating cross-replica near-duplicates (which
    would quadratically inflate the candidate set by construction and
    measure the data, not the plan)."""
    from dataingestionframework_spark.functions import tokens

    parts = []
    for i in range(times):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
        if i > 0:
            p = p.withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(
                        tokens(F.col("text")),
                        lambda t: F.concat(t, F.lit(f"r{i}")),
                    ),
                ),
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def test_minhash_banding_scales(spark, sf):
    """The MinHash funnel (signatures -> banding -> candidate pairs):
    one explode + one wide min-agg + a bucket-key self-join, all linear
    in docs. The flagship dedup plan must not regress to anything
    pairwise."""
    from dataingestionframework_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    docs = sf("documents")

    def q(df):
        return minhash_lsh_candidates(df, max_bucket_size=200).count()

    q(docs)  # warm the 64-column codegen once
    t1 = _wall(lambda: q(docs))
    big = _perturbed_docs(docs, REPL, 100_000_000)
    t10 = _wall(lambda: q(big))
    _assert_scales("minhash_banding", t1, t10)


def test_substring_dedup_scales(spark, sf):
    """Sliding-window substring dedup (hash-gram config): window
    explode -> gram-frequency agg -> positional anti-join -> per-doc
    reassembly, linear in total tokens."""
    from dataingestionframework_spark.operators.text import (
        remove_duplicate_spans,
    )

    docs = sf("documents")

    def q(df):
        return (
            remove_duplicate_spans(df, k=8, hash_grams=True)
            .agg(F.sum("n_removed"))
            .collect()
        )

    q(docs)  # warm
    t1 = _wall(lambda: q(docs))
    big = _perturbed_docs(docs, REPL, 100_000_000)
    t10 = _wall(lambda: q(big))
    _assert_scales("substring_dedup", t1, t10)


def test_semantic_dedup_scales_with_proportional_k(spark, sf):
    """SemDeDup's scaling law: cost is Σ cluster², so K must grow with
    N to hold cluster size constant (the published recipe — cluster
    count ∝ corpus size). x10 perturbed replicas + x10 centroids →
    same per-cluster quadratic, 10x the clusters → linear wall. A
    fixed-K x10 run would be the quadratic counterexample, not a plan
    regression."""
    from dataingestionframework_spark.operators.similarity import semantic_dedup

    emb = sf("embeddings").select("vec_id", "embedding")

    def cents_of(df):
        return df.filter(F.col("vec_id") % 1_000_000 < 8).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        )

    def q(df):
        semantic_dedup(df, cents_of(df), threshold=0.4).count()

    q(emb)  # warm codegen
    t1 = _wall(lambda: q(emb))
    # replicas get perturbed vectors (distinct points, same geometry) —
    # identical copies would inflate every cluster x10 instead of
    # adding new clusters
    parts = []
    for i in range(REPL):
        p = emb.select(
            (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x.cast("double") + F.lit(i * 0.01)
            ).alias("embedding"),
        )
        parts.append(p)
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    t10 = _wall(lambda: q(big))
    _assert_scales("semantic_dedup", t1, t10)


def test_radius_join_scales_at_constant_density(spark, sf):
    """Grid-blocked spatial join: x10 points spread over x10 area
    (constant density — the physical reality of more geography, not
    denser geography) must stay linear: cell occupancy is constant, so
    candidate pairs grow with N, not N²."""
    from dataingestionframework_spark.operators.spatial import radius_self_join

    cust = sf("customer").select(F.col("c_custkey").alias("id"))

    def pts_of(df, tiles: int):
        h = lambda salt: F.conv(  # noqa: E731
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col("id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        tile = F.col("id") % F.lit(tiles)
        return df.select(
            "id",
            ((h("x|") % 10000).cast("double") / 10.0
             + (tile % 4).cast("double") * 1000.0).alias("x"),
            ((h("y|") % 10000).cast("double") / 10.0
             + F.floor(tile / 4).cast("double") * 1000.0).alias("y"),
        )

    def q(pts):
        radius_self_join(pts, radius=15.0).count()

    p1 = pts_of(cust, 1)
    q(p1)  # warm
    t1 = _wall(lambda: q(p1))
    big_ids = _replicate(cust, ["id"], REPL, 10_000_000)
    # 10 tiles: one per replica → area x10, density constant
    t10 = _wall(lambda: q(pts_of(big_ids, 10)))
    _assert_scales("radius_join", t1, t10)


def test_embedding_gram_scales(spark, sf):
    """One-pass Gram/scatter matrix: per-batch BLAS partials + a
    d²-key merge. Wall must scale with ROWS only — the shuffle carries
    O(partitions·d²) matrix entries regardless of data size, so ×10
    rows costs ≲ ×10 (a plan that shuffles row data or collects
    vectors blows the limit)."""
    from dataingestionframework_spark.operators.similarity import (
        embedding_gram,
    )

    emb = sf("embeddings").select("vec_id", "embedding")

    def q(df):
        return embedding_gram(df).collect()

    q(emb)  # warm codegen once
    t1 = _wall(lambda: q(emb))
    big = _replicate(emb, ["vec_id"], REPL, 1_000_000)
    t10 = _wall(lambda: q(big))
    _assert_scales("embedding_gram", t1, t10)


def test_warc_corpus_funnel_scales(spark, sf):
    """The crawl-to-corpus flagship funnel (WARC build+parse -> web
    normalize -> URL/quality/content dedup -> split) at x1 vs x10
    documents: every stage is a narrow map or a hash shuffle on
    canonical keys, so wall must grow ~linearly."""
    from dataingestionframework_spark.plans.queries import _warc_corpus_funnel

    docs = sf("documents").filter(F.col("doc_id") < 400).select(
        "doc_id", "lang", "source", "text"
    )

    def q(d):
        return _warc_corpus_funnel(d).collect()

    q(docs)  # warm codegen
    t1 = _wall(lambda: q(docs))
    big = _replicate(docs, ["doc_id"], REPL, 1_000_000)
    t10 = _wall(lambda: q(big))
    _assert_scales("warc_corpus_funnel", t1, t10)


def test_tar_parse_scales(spark, sf):
    """WebDataset shard parsing at x1 vs x10 shards: per-shard work is
    linear in member bytes and shards parallelize — wall must grow
    ~linearly with shard count."""
    import io
    import tarfile

    from dataingestionframework_spark.sources.tar import (
        tar_parse,
        webdataset_samples,
    )

    rows = sf("documents").select("doc_id", "text").limit(200).collect()
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for r in rows:
            data = r.text.encode()
            ti = tarfile.TarInfo(f"{r.doc_id:08d}.txt")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    blob = bytearray(buf.getvalue())

    def shards_df(n):
        return spark.createDataFrame([(blob,)] * n, "content binary")

    def q(df):
        return webdataset_samples(tar_parse(df)).groupBy().agg(
            F.count("*"), F.sum("total_bytes")
        ).collect()

    q(shards_df(2))  # warm
    t1 = _wall(lambda: q(shards_df(4)))
    t10 = _wall(lambda: q(shards_df(40)))
    _assert_scales("tar_parse", t1, t10)


def test_bm25_scoring_scales(spark, sf):
    """BM25 top-k at x1 vs x10 documents: stats are 1-row broadcasts,
    scores are scan-side, top-k is TakeOrderedAndProject — linear."""
    from dataingestionframework_spark.operators.retrieval import bm25_topk

    docs = sf("documents").select("doc_id", "text")

    def q(d):
        return bm25_topk(d, ["data", "pipeline"], k=10).collect()

    q(docs)  # warm
    t1 = _wall(lambda: q(docs))
    big = _replicate(docs, ["doc_id"], REPL, 1_000_000)
    t10 = _wall(lambda: q(big))
    _assert_scales("bm25_scoring", t1, t10)


def test_warc_gz_parse_scales(spark, sf):
    """.warc.gz shard parsing at x1 vs x10 shards: gzip-member split
    is O(bytes) per shard (chunked memoryview cursor) and shards
    parallelize — wall must grow ~linearly with shard count."""
    import gzip

    from dataingestionframework_spark.sources.warc import warc_gz_parse

    rows = sf("documents").select("doc_id", "text").limit(200).collect()
    shard = b"".join(
        gzip.compress(
            (
                b"WARC/1.0\r\nWARC-Type: response\r\n"
                + f"WARC-Record-ID: <urn:x:{r.doc_id}>\r\n".encode()
                + f"Content-Length: {len(r.text.encode())}\r\n\r\n".encode()
                + r.text.encode() + b"\r\n\r\n"
            ),
            mtime=0,
        )
        for r in rows
    )
    blob = bytearray(shard)

    def q(n):
        df = spark.createDataFrame([(blob,)] * n, "content binary")
        return warc_gz_parse(df).groupBy().agg(
            F.count("*"), F.sum("content_length")
        ).collect()

    q(2)  # warm
    t1 = _wall(lambda: q(4))
    t10 = _wall(lambda: q(40))
    _assert_scales("warc_gz_parse", t1, t10)


def test_kmeans_lloyd_scales(spark, sf):
    """Spherical Lloyd: every iteration is one scan-side assignment +
    one k·d-cell agg — wall must track data volume, never k·n²."""
    from dataingestionframework_spark.operators.similarity import kmeans_lloyd

    emb = sf("embeddings").select("vec_id", "embedding")

    def q(df):
        assigned, _, _ = kmeans_lloyd(df, k=4, iters=2)
        assigned.groupBy("cluster_id").count().collect()

    t1 = _wall(lambda: q(emb))
    t10 = _wall(lambda: q(_replicate(emb, ["vec_id"], REPL, 10_000_000)))
    _assert_scales("kmeans_lloyd", t1, t10)


def test_dsir_importance_scales(spark, sf):
    """DSIR scoring: two B-row distribution aggs + broadcast-join mean
    — linear in tokens; the log-ratio table never grows with data."""
    from dataingestionframework_spark.operators.corpus import dsir_importance

    docs = sf("documents").select("doc_id", "lang", "text")

    def q(df):
        dsir_importance(df, df.filter(F.col("lang") == "en")).count()

    t1 = _wall(lambda: q(docs))
    t10 = _wall(lambda: q(_replicate(docs, ["doc_id"], REPL, 10_000_000)))
    _assert_scales("dsir_importance", t1, t10)


def test_table_diff_scales(spark, sf):
    """Keyed snapshot diff: two fingerprint projections + one
    full-outer equi-join — linear in rows, 32 bytes/row on the wire."""
    from dataingestionframework_spark.operators.profile import table_diff

    docs = sf("documents").select("doc_id", "text", "lang")

    def q(df):
        cur = df.withColumn(
            "text",
            F.when(F.col("doc_id") % 13 == 5, F.concat(F.col("text"), F.lit("!")))
            .otherwise(F.col("text")),
        )
        table_diff(cur, df, ["doc_id"]).groupBy("diff_status").count().collect()

    t1 = _wall(lambda: q(docs))
    t10 = _wall(lambda: q(_replicate(docs, ["doc_id"], REPL, 10_000_000)))
    _assert_scales("table_diff", t1, t10)


def test_distinct_ngram_scales(spark, sf):
    """Distinct-n diversity: gram explode + one distinct-count agg —
    linear in tokens."""
    from dataingestionframework_spark.operators.corpus import (
        distinct_ngram_ratio,
    )

    docs = sf("documents").select("doc_id", "source", "text")

    def q(df):
        distinct_ngram_ratio(df, n=2, group_col="source").collect()

    t1 = _wall(lambda: q(docs))
    t10 = _wall(lambda: q(_replicate(docs, ["doc_id"], REPL, 10_000_000)))
    _assert_scales("distinct_ngram_ratio", t1, t10)


def test_prefix_join_hot_gram_cap_candidates_scale(spark):
    """Hot prefix-gram cap (set_similarity_join_exact max_prefix_df):
    on a corpus where one rare gram sits in every templated doc's
    prefix, capped CANDIDATE COUNT must grow linearly with the
    templated-subset size (uncapped grows as C(m,2) — quadratic)."""
    from dataingestionframework_spark.operators.dedup import (
        _prefix_join_candidates,
    )

    def corpus(n_hot):
        groups = n_hot // 3  # pool size stays 3 at every scale
        rows = [(i, f"u{i} hot p{i % groups}") for i in range(n_hot)]
        rows += [
            (n_hot + j, f"w{j}a w{j}b w{j}c p{j % groups}")
            for j in range(10 * n_hot)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    c1 = _prefix_join_candidates(corpus(30), "text", "doc_id", 1, 0.5, 10).count()
    c10 = _prefix_join_candidates(corpus(300), "text", "doc_id", 1, 0.5, 10).count()
    assert c1 == 30
    # linear: x10 docs -> x10 candidates (quadratic would be ~x100)
    assert c10 <= 12 * c1, f"capped candidates not linear: {c1} -> {c10}"


def test_containment_join_scales(spark, sf):
    """Asymmetric prefix-filter containment: candidate generation is
    prefix(A) ⋈ all-grams(B) on rarest grams — near-linear on natural
    corpora; the exact verify runs on candidates only."""
    from dataingestionframework_spark.operators.dedup import containment_join

    docs = sf("documents").select("doc_id", "text")

    def q(df):
        containment_join(df, n=3, threshold=0.4, max_id=200).count()

    t1 = _wall(lambda: q(docs))
    t10 = _wall(lambda: q(_replicate(docs, ["doc_id"], REPL, 10_000_000)))
    _assert_scales("containment_join", t1, t10)


def test_lang_id_ngram_scales(spark, sf):
    """Language ID: one corpus explode+hash pass, centroid table is
    L×dim broadcast, per-doc argmax — linear in corpus tokens."""
    from dataingestionframework_spark.operators.text import lang_id_ngram

    docs = sf("documents").select("doc_id", "lang", "text")

    def q(df):
        lang_id_ngram(df, n=3, dim=64).groupBy("lang_pred").count().collect()

    t1 = _wall(lambda: q(docs))
    t10 = _wall(lambda: q(_replicate(docs, ["doc_id"], REPL, 10_000_000)))
    _assert_scales("lang_id_ngram", t1, t10)


def test_funnel_conversions_scales(spark, sf):
    """Funnel: one filtered min-agg per step joined on the user key —
    linear in events, no raw-table window."""
    from dataingestionframework_spark.operators.behavior import (
        funnel_conversions,
    )

    ev = sf("events").select("user_id", "ts", "event_type")

    def q(df):
        funnel_conversions(df, ["view", "click", "purchase"]).collect()

    t1 = _wall(lambda: q(ev))
    t10 = _wall(lambda: q(_replicate(ev, ["user_id"], REPL, 10_000_000)))
    _assert_scales("funnel_conversions", t1, t10)


def test_ks_statistic_scales(spark, sf):
    """KS: one (value, group) count over the scan; the ECDF window
    runs on the aggregated distinct-value table only."""
    from pyspark.sql import functions as F

    from dataingestionframework_spark.operators.profile import ks_statistic

    ev = sf("events").select(
        "event_type", F.round(F.col("value"), 3).alias("v")
    )

    def q(df):
        ks_statistic(df, "v", "event_type", "click", "error").collect()

    t1 = _wall(lambda: q(ev))
    # replicate by shifting nothing (no id col needed) — union 10 copies
    t10 = _wall(lambda: q(_replicate(ev.withColumn("_i", F.lit(0)), ["_i"], REPL, 1)))
    _assert_scales("ks_statistic", t1, t10)


def test_oov_rate_scales(spark, sf):
    """OOV: token explode + global count + TakeOrderedAndProject top-K
    + broadcast join — linear in tokens."""
    from dataingestionframework_spark.operators.corpus import oov_rate

    docs = sf("documents").select("doc_id", "text")

    def q(df):
        oov_rate(df, vocab_k=50).count()

    t1 = _wall(lambda: q(docs))
    t10 = _wall(lambda: q(_replicate(docs, ["doc_id"], REPL, 10_000_000)))
    _assert_scales("oov_rate", t1, t10)


def test_winnowing_scales(spark, sf):
    """Winnowing: gram explode + per-doc frame-min window + distinct +
    fingerprint equi-join — every stage partitions on doc_id or
    fp_hash, linear in corpus tokens."""
    from dataingestionframework_spark.operators.dedup import (
        winnowing_candidate_pairs,
        winnowing_fingerprints,
    )

    docs = sf("documents").select("doc_id", "text")

    def q(df):
        fps = winnowing_fingerprints(df, k=5, w=4)
        winnowing_candidate_pairs(fps, min_shared=2, max_fp_df=50).count()

    t1 = _wall(lambda: q(docs))
    t10 = _wall(lambda: q(_replicate(docs, ["doc_id"], REPL, 10_000_000)))
    _assert_scales("winnowing", t1, t10)


def test_skew_profile_scales(spark, sf):
    """Skew profile: one hash agg + scalar broadcast + top-k — linear."""
    from dataingestionframework_spark.operators.profile import skew_profile

    orders = sf("orders").select("o_custkey")

    def q(df):
        skew_profile(df, "o_custkey", top_n=20).count()

    t1 = _wall(lambda: q(orders))
    t10 = _wall(lambda: q(_replicate(orders, ["o_custkey"], REPL, 10_000_000)))
    _assert_scales("skew_profile", t1, t10)


def test_cooccurrence_lift_scales(spark, sf):
    """Co-occurrence lift: distinct + basket-key self-join + pair agg +
    totals joins — x10 baskets with the same per-basket size is linear
    (pair count grows with baskets, not quadratically with rows)."""
    from dataingestionframework_spark.operators.behavior import (
        cooccurrence_lift,
    )

    li = sf("lineitem").select("l_orderkey", "l_partkey")

    def q(df):
        cooccurrence_lift(
            df, "l_orderkey", "l_partkey", min_support=2, top_n=50
        ).count()

    t1 = _wall(lambda: q(li))
    t10 = _wall(
        lambda: q(_replicate(li, ["l_orderkey"], REPL, 100_000_000))
    )
    _assert_scales("cooccurrence_lift", t1, t10)


def test_hbos_outliers_scales(spark, sf):
    """HBOS: two tiny histogram aggregates + one scoring scan + top-k."""
    from dataingestionframework_spark.operators.profile import hbos_outliers

    o = sf("orders").select("o_orderkey", "o_totalprice", "o_orderpriority")

    def q(df):
        hbos_outliers(
            df, "o_orderkey", "o_totalprice", "o_orderpriority",
            lo=0.0, hi=500000.0, top_n=50,
        ).count()

    t1 = _wall(lambda: q(o))
    t10 = _wall(lambda: q(_replicate(o, ["o_orderkey"], REPL, 100_000_000)))
    _assert_scales("hbos_outliers", t1, t10)


def test_fd_profile_scales(spark, sf):
    """FD audit: two hash aggregates per pair, second input |distinct A|."""
    from dataingestionframework_spark.operators.profile import fd_profile

    o = sf("orders").select("o_orderkey", "o_custkey", "o_orderstatus")

    def q(df):
        fd_profile(
            df, [("o_custkey", "o_orderstatus"), ("o_orderkey", "o_custkey")]
        ).count()

    t1 = _wall(lambda: q(o))
    t10 = _wall(
        lambda: q(_replicate(o, ["o_orderkey", "o_custkey"], REPL, 100_000_000))
    )
    _assert_scales("fd_profile", t1, t10)


def test_rbo_rank_agreement_scales(spark, sf):
    """RBO: per-group rank windows + a broadcast k-row spine — linear
    in rows; x10 GROUPS (shifted doc ids re-bucketed by lang suffix)
    with the same per-group size."""
    from dataingestionframework_spark.operators.retrieval import (
        rbo_rank_agreement,
    )

    d = sf("documents").select(
        "lang", "doc_id", F.col("n_chars").cast("double").alias("sa"),
        (F.col("n_chars") % 997).cast("double").alias("sb"),
    )

    def q(df):
        rbo_rank_agreement(df, "lang", "doc_id", "sa", "sb", k=20).count()

    rep = _replicate(d, ["doc_id"], REPL, 10_000_000).withColumn(
        "lang",
        F.concat(F.col("lang"), (F.col("doc_id") / 10_000_000).cast("int").cast("string")),
    )
    t1 = _wall(lambda: q(d))
    t10 = _wall(lambda: q(rep))
    _assert_scales("rbo_rank_agreement", t1, t10)


def test_mi_profile_scales(spark, sf):
    """MI audit: one pair-count agg per pair + tiny regroupings."""
    from dataingestionframework_spark.operators.profile import mi_profile

    o = sf("orders").select("o_orderkey", "o_orderpriority", "o_orderstatus")

    def q(df):
        mi_profile(df, [("o_orderpriority", "o_orderstatus")]).count()

    t1 = _wall(lambda: q(o))
    t10 = _wall(lambda: q(_replicate(o, ["o_orderkey"], REPL, 100_000_000)))
    _assert_scales("mi_profile", t1, t10)


def test_vector_quality_scales(spark, sf):
    """Vector gate: one scan-side status projection + tiny agg."""
    from dataingestionframework_spark.operators.similarity import (
        vector_quality_status,
    )

    e = sf("embeddings").select("vec_id", "embedding")

    def q(df):
        vector_quality_status(df, expected_dim=64).groupBy(
            "vec_status"
        ).count().collect()

    t1 = _wall(lambda: q(e))
    t10 = _wall(lambda: q(_replicate(e, ["vec_id"], REPL, 10_000_000)))
    _assert_scales("vector_quality", t1, t10)


def test_threshold_sweep_scales(spark, sf):
    """Threshold sweep: one scan exploded against a 9-row spine into
    one |T|-key aggregate — linear regardless of |T|."""
    from dataingestionframework_spark.operators.profile import threshold_sweep

    d = sf("documents").select(
        (F.col("n_chars") % 1000 / 1000.0).alias("score"),
        (F.col("n_chars") > 400).alias("label"),
        "doc_id",
    )

    def q(df):
        threshold_sweep(
            df, "score", "label", [i / 10.0 for i in range(1, 10)]
        ).count()

    t1 = _wall(lambda: q(d))
    t10 = _wall(lambda: q(_replicate(d, ["doc_id"], REPL, 10_000_000)))
    _assert_scales("threshold_sweep", t1, t10)


# ---------------------------------------------------------------------------
# x100 sweeps for the quadratic-PRONE operators (round-8 verdict item 3):
# the ops whose naive form is all-pairs. Base is sf0.001 so x100 stays
# test-sized; the assertion compares x100 against x10 of the SAME base —
# a linear plan costs ~10x the x10 wall, a quadratic one ~100x.
# ---------------------------------------------------------------------------

REPL100 = 100
MAX_RATIO_100 = 12.0  # x10 more data than the x10 run, +20% modeling slack


@pytest.fixture(scope="module")
def sf001(spark):
    def load(table: str) -> DataFrame:
        from dataingestionframework_spark.plans.tables import load

        return load(spark, "/root/testdata/sf0.001", table)

    return load


def _assert_scales_100(name: str, t10: float, t100: float) -> None:
    limit = MAX_RATIO_100 * t10 + SLACK_SEC
    assert t100 < limit, (
        f"{name}: x{REPL100} data took {t100:.2f}s vs {t10:.2f}s at "
        f"x{REPL} (limit {limit:.2f}s) — super-linear growth"
    )


def test_cooccurrence_lift_scales_x100(spark, sf001):
    from dataingestionframework_spark.operators.behavior import (
        cooccurrence_lift,
    )

    li = sf001("lineitem").select("l_orderkey", "l_partkey")

    def q(df):
        cooccurrence_lift(
            df, "l_orderkey", "l_partkey", min_support=2, top_n=50
        ).count()

    t10 = _wall(lambda: q(_replicate(li, ["l_orderkey"], REPL, 100_000_000)))
    t100 = _wall(
        lambda: q(_replicate(li, ["l_orderkey"], REPL100, 100_000_000))
    )
    _assert_scales_100("cooccurrence_lift", t10, t100)


def test_cooccurrence_hot_basket_cap_engages(spark, sf001):
    """Skewed hot basket (10^4 items in ONE basket): the
    max_basket_size cap must (a) drop it — output identical to the
    corpus with the basket pre-removed — and (b) keep the wall flat
    (uncapped, the one basket alone contributes C(10^4,2) ≈ 5·10^7
    pairs and dominates everything)."""
    from dataingestionframework_spark.operators.behavior import (
        cooccurrence_lift,
    )

    li = sf001("lineitem").select("l_orderkey", "l_partkey")
    hot = spark.range(10_000).select(
        F.lit(999_999_999).alias("l_orderkey"),
        (F.col("id") + 5_000_000).alias("l_partkey"),
    )
    with_hot = li.unionByName(hot)

    def run(df):
        return sorted(
            tuple(r)
            for r in cooccurrence_lift(
                df, "l_orderkey", "l_partkey", min_support=2,
                max_basket_size=1000, top_n=50,
            ).collect()
        )

    t0 = time.perf_counter()
    got_hot = run(with_hot)
    t_hot = time.perf_counter() - t0
    t0 = time.perf_counter()
    got_base = run(li)
    t_base = time.perf_counter() - t0
    assert got_hot == got_base  # the capped basket contributes nothing
    assert t_hot < 6.0 * t_base + SLACK_SEC, (
        f"hot-basket run {t_hot:.2f}s vs {t_base:.2f}s base — cap did "
        "not keep the quadratic term out of the plan"
    )


def test_containment_join_scales_x100(spark, sf001):
    from dataingestionframework_spark.operators.dedup import containment_join

    docs = sf001("documents").select("doc_id", "text")

    def q(df):
        containment_join(df, n=3, threshold=0.4, max_id=200).count()

    t10 = _wall(lambda: q(_replicate(docs, ["doc_id"], REPL, 10_000_000)))
    t100 = _wall(
        lambda: q(_replicate(docs, ["doc_id"], REPL100, 10_000_000))
    )
    _assert_scales_100("containment_join", t10, t100)


def test_winnowing_scales_x100(spark, sf001):
    from dataingestionframework_spark.operators.dedup import (
        winnowing_candidate_pairs,
        winnowing_fingerprints,
    )

    docs = sf001("documents").select("doc_id", "text")

    def q(df):
        fps = winnowing_fingerprints(df, k=5, w=4)
        winnowing_candidate_pairs(fps, min_shared=2, max_fp_df=50).count()

    t10 = _wall(lambda: q(_replicate(docs, ["doc_id"], REPL, 10_000_000)))
    t100 = _wall(
        lambda: q(_replicate(docs, ["doc_id"], REPL100, 10_000_000))
    )
    _assert_scales_100("winnowing", t10, t100)


def test_set_similarity_join_scales_x100(spark, sf001):
    from dataingestionframework_spark.operators.dedup import (
        set_similarity_join_exact,
    )

    docs = sf001("documents").select("doc_id", "text")

    def q(df):
        set_similarity_join_exact(
            df, n=3, threshold=0.7, max_prefix_df=200
        ).count()

    t10 = _wall(lambda: q(_replicate(docs, ["doc_id"], REPL, 10_000_000)))
    t100 = _wall(
        lambda: q(_replicate(docs, ["doc_id"], REPL100, 10_000_000))
    )
    _assert_scales_100("set_similarity_join", t10, t100)


def test_prefix_join_capped_candidates_linear_x100(spark):
    """Deterministic (no wall-clock) x100 pin: with one hot prefix gram
    shared by every templated doc, CAPPED candidate count must grow
    x100 when the templated subset grows x100 — uncapped grows C(m,2),
    i.e. x10,000."""
    from dataingestionframework_spark.operators.dedup import (
        _prefix_join_candidates,
    )

    def corpus(n_hot):
        groups = n_hot // 3
        rows = [(i, f"u{i} hot p{i % groups}") for i in range(n_hot)]
        rows += [
            (n_hot + j, f"w{j}a w{j}b w{j}c p{j % groups}")
            for j in range(10 * n_hot)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    c1 = _prefix_join_candidates(corpus(30), "text", "doc_id", 1, 0.5, 10).count()
    c100 = _prefix_join_candidates(
        corpus(3000), "text", "doc_id", 1, 0.5, 10
    ).count()
    assert c1 == 30
    assert c100 <= 120 * c1, (
        f"capped candidates not linear at x100: {c1} -> {c100}"
    )
