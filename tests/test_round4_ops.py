"""Round-4 session-2 operators: web normalization, scalable dense ids,
MMR re-ranking, and the two-watermark late-drop semantics the
stream_late_drop_parity gate query depends on."""

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# operators/web.py
# ---------------------------------------------------------------------------


def test_canonicalize_url_normalization_rules(spark):
    from dataingestionframework_spark.operators.web import canonicalize_url

    cases = [
        # scheme/host case, www., default port, fragment
        ("HTTPS://WWW.Example.COM:443/a/b#frag", "https://example.com/a/b"),
        # param sort + utm strip
        (
            "https://example.com/p?z=9&utm_source=x&a=1",
            "https://example.com/p?a=1&z=9",
        ),
        # empty path -> /
        ("https://example.com", "https://example.com/"),
        # all params stripped -> no '?'
        ("https://example.com/p?utm_a=1&utm_b=2", "https://example.com/p"),
        # non-443 port preserved; non-utm params keep values
        ("http://example.com:8080/x?b=2&a=1", "http://example.com:8080/x?a=1&b=2"),
        # RFC 3986 default-port rule is scheme-aware:
        # http's default :80 dropped ...
        ("http://example.com:80/x", "http://example.com/x"),
        # ... but https keeps :80 (non-default) ...
        ("https://example.com:80/x", "https://example.com:80/x"),
        # ... and http keeps :443 (non-default for http)
        ("http://example.com:443/x", "http://example.com:443/x"),
    ]
    df = spark.createDataFrame(cases, "url string, expected string")
    got = df.select(
        "expected", canonicalize_url(F.col("url")).alias("canonical")
    ).collect()
    for r in got:
        assert r.canonical == r.expected, r


def test_html_extract_handles_missing_title_and_links(spark):
    from dataingestionframework_spark.operators.web import (
        html_links,
        html_title,
        html_visible_text,
    )

    df = spark.createDataFrame(
        [("<body><p>just  text</p></body>",)], "html string"
    )
    r = df.select(
        html_title(F.col("html")).alias("t"),
        F.size(html_links(F.col("html"))).alias("n"),
        html_visible_text(F.col("html")).alias("b"),
    ).first()
    assert r.t == ""
    assert r.n == 0
    assert r.b == "just text"


# ---------------------------------------------------------------------------
# operators/ids.py
# ---------------------------------------------------------------------------


def test_dense_row_ids_matches_global_row_number(spark):
    from dataingestionframework_spark.operators.ids import dense_row_ids

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "n_chars"
    )
    got = dense_row_ids(
        docs, ["n_chars", "doc_id"], F.floor(F.col("n_chars") / F.lit(64))
    )
    rows = got.orderBy("dense_id").collect()
    expected = sorted(
        ((r.n_chars, r.doc_id) for r in rows), key=lambda x: (x[0], x[1])
    )
    assert [(r.n_chars, r.doc_id) for r in rows] == expected
    assert [r.dense_id for r in rows] == list(range(1, len(rows) + 1))


def test_dense_row_ids_no_single_partition_window_over_data(spark):
    """The data-side window must be hash-partitioned by bucket; the only
    SinglePartition exchange allowed feeds the tiny bucket-count
    cumulative sum (its subtree aggregates, never raw-scans)."""
    from dataingestionframework_spark.operators.ids import dense_row_ids

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "n_chars"
    )
    out = dense_row_ids(
        docs, ["n_chars", "doc_id"], F.floor(F.col("n_chars") / F.lit(64))
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__bucket" in plan
    # every SinglePartition exchange in the plan must sit below an
    # aggregate (the bucket-count table), not consume the raw scan
    for chunk in plan.split("Exchange SinglePartition")[1:]:
        assert "HashAggregate" in chunk.split("Exchange", 1)[0] or (
            "AQEShuffleRead" in chunk
        ), plan


# ---------------------------------------------------------------------------
# operators/similarity.py::mmr_rerank
# ---------------------------------------------------------------------------


def _mmr_reference(ids, rel, vecs, k, lam):
    """Pure-python greedy MMR, the public Carbonell-Goldstein form."""
    import math

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a)) or 1e-12
        nb = math.sqrt(sum(x * x for x in b)) or 1e-12
        return round(sum(x * y for x, y in zip(a, b)) / (na * nb), 9)

    selected = []
    remaining = list(range(len(ids)))
    while remaining and len(selected) < k:
        best, best_score = None, None
        for i in remaining:
            msim = max((cos(vecs[i], vecs[j]) for j in selected), default=0.0)
            score = round(lam * rel[i] - (1 - lam) * msim, 9)
            key = (-score, ids[i])
            if best is None or key < best_score:
                best, best_score = i, key
        selected.append(best)
        remaining.remove(best)
    return [ids[i] for i in selected]


def test_mmr_rerank_matches_python_reference(spark):
    from dataingestionframework_spark.operators.similarity import mmr_rerank

    rng = np.random.default_rng(7)
    rows = []
    per_query = {}
    for q in range(4):
        ids = list(range(100, 130))
        vecs = rng.normal(size=(30, 8)).round(3).tolist()
        rel = rng.uniform(0, 1, size=30).round(3).tolist()
        per_query[q] = (ids, rel, vecs)
        rows += [(q, i, r, v) for i, r, v in zip(ids, rel, vecs)]
    df = spark.createDataFrame(
        rows, "query_id long, cand_id long, relevance double, embedding array<double>"
    )
    got = mmr_rerank(df, k=10, lam=0.6).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.mmr_rank)):
        by_q.setdefault(r.query_id, []).append(r.cand_id)
    for q, (ids, rel, vecs) in per_query.items():
        assert by_q[q] == _mmr_reference(ids, rel, vecs, 10, 0.6), q


def test_mmr_rerank_diversifies_near_duplicates(spark):
    """Two near-identical top candidates: plain top-k keeps both, MMR
    demotes the twin below a less-relevant-but-different candidate."""
    from dataingestionframework_spark.operators.similarity import mmr_rerank

    rows = [
        (0, 1, 0.99, [1.0, 0.0, 0.0]),
        (0, 2, 0.98, [0.999, 0.01, 0.0]),  # twin of 1
        (0, 3, 0.60, [0.0, 1.0, 0.0]),
        (0, 4, 0.50, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, cand_id long, relevance double, embedding array<double>"
    )
    order = [
        r.cand_id
        for r in sorted(mmr_rerank(df, k=3, lam=0.5).collect(), key=lambda r: r.mmr_rank)
    ]
    assert order[0] == 1
    assert order[1] == 3  # diversity beats the near-duplicate twin
    assert 2 not in order[:2]


# ---------------------------------------------------------------------------
# two-watermark late-drop semantics (SPARK-39781) pinned
# ---------------------------------------------------------------------------


def test_late_filter_lags_eviction_by_one_batch(spark, tmp_root):
    """stream_late_drop_parity's contract: a late row one batch after
    its window is still MERGED (late-filter wm lags a batch), but two
    batches after, a row for a closed window is DROPPED. Four 1-file
    micro-batches with pinned event times prove both edges."""
    src = os.path.join(tmp_root, "src")
    os.makedirs(src)
    batches = [
        [(1, "2024-01-01 10:00:00")],  # wm -> 09:50 after this batch
        [(2, "2024-01-01 00:00:00")],  # 1 batch late: late-wm still epoch -> kept
        [(3, "2024-01-01 00:01:00")],  # 2 batches late: late-wm 09:50 -> dropped
        [(4, "2024-01-01 23:00:00")],  # flush sentinel
    ]
    now = time.time()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "id int, ts string").select(
            "id", F.col("ts").cast("timestamp").alias("ts")
        )
        p = os.path.join(src, f"b{i}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (now - 1200 + i * 300,) * 2)
    schema = spark.read.parquet(os.path.join(src, "b0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*.parquet"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_lag_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    q.stop()
    got = {
        (r.ws.isoformat(), r.n)
        for r in spark.table("late_lag_probe").collect()
        if r.ws.isoformat() < "2024-01-01T23:00:00"
    }
    assert got == {
        ("2024-01-01T10:00:00", 1),
        ("2024-01-01T00:00:00", 1),  # row 2 kept (one-batch lag), row 3 dropped
    }
    assert dropped == 1
