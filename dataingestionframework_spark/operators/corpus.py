"""Training-corpus assembly operators: packing, decontamination,
keyword extraction, boilerplate detection, split/shard assignment.

These sit downstream of dedup (operators/dedup.py, operators/graph.py)
in an LLM data pipeline: once the corpus is clean, it must be checked
against evaluation benchmarks (decontaminate), scored for boilerplate
(repeated_gram_ratio), split train/val/test deterministically
(train_split_shard), and packed into fixed-length training sequences
(pack_sequences).

Reference parity: the reference stops at ingest + distinct()
(modules/auto_loader_steps.py:289); everything here is part of the
LLM-corpus extension surface.

Scale notes (100 TB):
- pack_sequences: ONE shuffle (window partitioned by the pack key) —
  never a global sort. The pack key (language, domain, shard) bounds
  per-reducer state; token offsets are running sums inside each key.
- decontaminate: benchmark gram sets (eval suites) are tiny versus the
  corpus — broadcast them; the corpus side stays map-local after its
  gram explode.
- tfidf_top_terms / repeated_gram_ratio: gram-explode + two hash aggs
  (term df, per-doc stats) — the same one-shuffle-per-agg shape as the
  sketch pipeline. Ranking is integer-keyed so engine float ulps can't
  flip the order.
- train_split_shard: pure map-side expressions, zero shuffles; the
  md5-derived hash is engine-portable, so an auditor can recompute any
  document's split in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import exploded_word_ngrams, token_count, tokens
from .text import portable_gram_hash

PORTABLE_HASH_SPACE = float(1 << 60)


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    pack_key: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pre-training
    layout): within each ``pack_key`` group, documents are concatenated
    in ``id_col`` order and cut into fixed ``seq_len``-token sequences;
    documents span sequence boundaries, so no padding is ever emitted.

    Returns one row per (document × sequence) slice:
    (pack_key, seq_id, doc_id, slice_tokens, doc_offset) where
    ``slice_tokens`` is how many of the doc's tokens land in that
    sequence and ``doc_offset`` is the doc's global token start within
    the group. sum(slice_tokens) per seq_id == seq_len except the last
    sequence of each group.

    First-fit bin packing needs a sequential scan; concat-and-chunk is
    the closed-form (and the layout actually used for LLM pre-training),
    which keeps it one window + one explode — fully parallel per key.
    """
    w = (
        Window.partitionBy("pack_key")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select(
        F.col(pack_key).alias("pack_key"),
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    pos = sized.withColumn("cum_end", F.sum("n_tok").over(w)).withColumn(
        "doc_offset", F.col("cum_end") - F.col("n_tok")
    )
    c = F.lit(seq_len)
    slices = pos.select(
        "pack_key",
        "doc_id",
        "doc_offset",
        "cum_end",
        F.explode(
            F.sequence(
                F.floor(F.col("doc_offset") / c),
                F.floor((F.col("cum_end") - 1) / c),
            )
        ).alias("seq_id"),
    )
    return slices.select(
        "pack_key",
        "seq_id",
        "doc_id",
        (
            F.least(F.col("cum_end"), (F.col("seq_id") + 1) * c)
            - F.greatest(F.col("doc_offset"), F.col("seq_id") * c)
        ).alias("slice_tokens"),
        "doc_offset",
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: count distinct word ``n``-grams each
    corpus document shares with a benchmark corpus (an eval suite) and
    flag documents at or above ``min_overlap`` shared grams.

    Every corpus document is retained in the output
    (doc_id, overlap_grams, contaminated) — the caller chooses to drop
    or down-weight. Benchmark gram sets are tiny next to a 100 TB
    corpus, so the distinct gram list is broadcast by default and the
    corpus side never shuffles on the gram.
    """
    bench_grams = (
        exploded_word_ngrams(benchmark, text_col, id_col, n)
        .select("gram")
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = exploded_word_ngrams(corpus, text_col, id_col, n).select(
        id_col, "gram"
    ).distinct()
    overlap = (
        doc_grams.join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("overlap_grams"))
    )
    return (
        corpus.select(id_col)
        .join(overlap, id_col, "left")
        .select(
            id_col,
            F.coalesce("overlap_grams", F.lit(0)).alias("overlap_grams"),
            (F.coalesce("overlap_grams", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    score = tf · (ln((N+1)/(df+1)) + 1) (smoothed idf). The within-doc
    ranking is keyed on (tf desc, df asc, term asc) — integers and a
    string, never the float score — so Spark and any oracle engine rank
    identically even when two scores differ only in the last ulp.

    Two hash aggregates (term counts per doc, doc-frequency per term)
    and one windowed top-k; N arrives as a 1-row broadcast (constant
    cost — no driver round-trip, the plan stays lazy).
    """
    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")).alias(
            "term"
        ),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df", "score")
    )


def repeated_gram_ratio(
    docs: DataFrame,
    n: int = 3,
    boilerplate_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate detection: per document, the fraction of its
    distinct word ``n``-grams that also occur in at least one OTHER
    document. Documents above ``boilerplate_threshold`` are flagged —
    the CCNet-style signal that a page is template/menu text rather
    than prose.

    Shape: gram explode → distinct (doc, gram) → gram doc-frequency
    (one agg) → per-doc shared/total counts (one agg). No pairwise
    anything — cost is linear in total grams.
    """
    doc_grams = exploded_word_ngrams(docs, text_col, id_col, n).select(
        F.col(id_col).alias("doc_id"), "gram"
    ).distinct()
    gram_df = doc_grams.groupBy("gram").agg(F.count("*").alias("gdf"))
    stats = (
        doc_grams.join(gram_df, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("gdf") >= 2, 1).otherwise(0)).alias(
                "shared_grams"
            ),
        )
    )
    return stats.select(
        "doc_id",
        "n_grams",
        "shared_grams",
        F.round(F.col("shared_grams") / F.col("n_grams"), 6).alias(
            "dup_gram_ratio"
        ),
        (
            F.col("shared_grams") / F.col("n_grams")
            > F.lit(boilerplate_threshold)
        ).alias("boilerplate"),
    )


def _unit_hash(label: str, seed: int, id_col: Column) -> Column:
    """Deterministic engine-portable hash of (label, seed, id) mapped
    to [0, 1): md5 top 60 bits / 2^60. DuckDB twin:
    ``('0x' || substring(md5(...), 1, 15))::UBIGINT / 2^60``."""
    key = F.concat_ws(":", F.lit(label), F.lit(str(seed)), id_col.cast("string"))
    return portable_gram_hash(key) / F.lit(PORTABLE_HASH_SPACE)


def train_split_shard(
    docs: DataFrame,
    weights: tuple[float, float, float] = (0.9, 0.05, 0.05),
    n_shards: int = 1024,
    seed: int = 42,
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic train/val/test assignment + output sharding +
    within-shard shuffle key, all from engine-portable md5 hashes of
    the document id. Zero shuffles — pure map-side expressions — and
    any row's assignment is reproducible in plain SQL, so a split can
    be audited without rerunning the pipeline.

    ``group_col`` makes the SPLIT leak-free: the split hash keys on
    the group (source/domain/canonical-url host) instead of the doc,
    so near-duplicate documents sharing a group can never straddle
    train and val — the split-contamination rule every serious eval
    setup enforces. Sharding and shuffle order stay doc-keyed either
    way (still zero shuffles — the group key is already on the row).

    Returns (doc_id, split, shard, order_key): write each (split,
    shard) partition sorted by order_key for a reproducible global
    shuffle without a global sort.
    """
    train_w, val_w, _ = weights
    # NULL group hashes as the empty-string group — concat_ws would
    # silently drop the NULL AND its separator, giving a different
    # (and engine-unportable) hash input than the SQL twin's
    # coalesce(group, '')
    split_key = (
        F.coalesce(F.col(group_col).cast("string"), F.lit(""))
        if group_col
        else F.col(id_col)
    )
    u = _unit_hash("split", seed, split_key)
    split = (
        F.when(u < train_w, "train")
        .when(u < train_w + val_w, "val")
        .otherwise("test")
    )
    shard = F.pmod(
        portable_gram_hash(
            F.concat_ws(":", F.lit("shard"), F.lit(str(seed)), F.col(id_col).cast("string"))
        ),
        F.lit(n_shards),
    )
    order_key = portable_gram_hash(
        F.concat_ws(":", F.lit("order"), F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    return docs.select(
        id_col,
        split.alias("split"),
        shard.cast("int").alias("shard"),
        order_key.alias("order_key"),
    )


def cap_per_group(
    docs: DataFrame,
    group_col: str = "source",
    cap: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain frequency cap: keep at most ``cap`` rows per
    ``group_col``, chosen by a deterministic portable-hash order of the
    id (md5, ties broken by the id itself) — a pure function of the
    data, reproducible in any SQL engine, unlike ``rand()`` sampling.

    Web-crawl corpora cap documents per domain so a single site cannot
    dominate training data. One window rank partitioned by the group —
    a single shuffle on ``group_col``; no global sort. At 100 TB a
    hot domain with billions of pages would skew the window partition:
    pre-aggregate counts and only window groups over the cap, or salt
    the rank with a two-phase top-k (the bounded per-group heap the
    windowed rank compiles to under AQE handles moderate skew).

    Adds ``pick_rank`` (1-based deterministic order within the group).
    """
    order_key = portable_gram_hash(
        F.concat_ws(":", F.lit("cap"), F.col(id_col).cast("string"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_key.asc(), F.col(id_col).asc())
    )
    return (
        docs.withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= cap)
    )


def global_sort_rank(
    df: DataFrame,
    order_col: str,
    rank_col: str = "rank",
    prefix_chars: int = 2,
) -> DataFrame:
    """Dense 0-based global rank by a uniformly-distributed hex-string
    column WITHOUT a single-partition window or a driver-side sort.

    The scalable global-rank pattern: the leading ``prefix_chars`` hex
    characters of ``order_col`` are a DETERMINISTIC range partitioner
    (hex-prefix order == full-string lexicographic order, and a uniform
    hash fills the 16^prefix buckets evenly). Per-bucket row counts are
    a tiny aggregate (≤ 16^prefix rows) collected to build cumulative
    offsets; final rank = bucket offset + row_number within the bucket.
    One windowed shuffle on the bucket key + one count-only pass — the
    same two-pass shape as ``zipWithIndex``, but deterministic across
    re-executions (no sampled range boundaries) and never more than
    16^prefix rows on the driver.

    Ranks are stable only when ``order_col`` values are distinct (ties
    get an arbitrary-but-valid order); hash keys like md5-of-id satisfy
    this for all practical purposes.
    """
    bucket = F.conv(F.substring(F.col(order_col), 1, prefix_chars), 16, 10).cast("int")
    with_b = df.withColumn("_bucket", bucket)
    counts = {r["_bucket"]: r["n"] for r in
              with_b.groupBy("_bucket").agg(F.count("*").alias("n")).collect()}
    if not counts:  # empty input: F.create_map() of nothing is VOID-typed
        return df.withColumn(rank_col, F.lit(None).cast("bigint")).filter(
            F.lit(False)
        )
    acc, offsets = 0, {}
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    omap = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("_bucket").orderBy(order_col)
    return (
        with_b.withColumn(
            rank_col,
            (F.row_number().over(w) - 1 + omap[F.col("_bucket")]).cast("bigint"),
        )
        .drop("_bucket")
    )


def seeded_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Deterministic global shuffle for training-order randomization:
    every row gets a dense 0-based position in the order of
    ``md5(seed || ':' || id)``. Re-running with the same seed gives the
    same order on any cluster size; changing the seed reshuffles.

    The hash is engine-portable (md5 of a decimal-string key), so an
    auditor can recompute any document's position in plain SQL; the
    rank comes from :func:`global_sort_rank` — no single-partition
    window, no driver sort, safe at any corpus size.
    """
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    return global_sort_rank(df.withColumn("_shuffle_key", h), "_shuffle_key", rank_col).drop(
        "_shuffle_key"
    )


def temperature_mix_rates(
    docs: DataFrame,
    alpha: float = 0.7,
    target_total: int | None = None,
    group_col: str = "lang",
) -> DataFrame:
    """Temperature-based corpus mixing rates (the multilingual-LM
    resampling scheme: sample group g with probability ∝ n_g^alpha,
    alpha<1 up-weights low-resource groups, alpha=1 is natural
    frequency, alpha=0 is uniform).

    Returns one row per group: (group, n_docs, mix_weight, sample_rate,
    expected_docs) where mix_weight = n_g^alpha / Σ n_h^alpha,
    expected_docs = target_total · mix_weight (target_total defaults to
    the corpus size), and sample_rate = min(1, expected_docs / n_g) —
    the per-group Bernoulli keep rate that realizes the mix without
    replacement.

    Shape: one hash-agg over the corpus → a group-cardinality frame
    (tiny; one row per language/domain). The weight normalization is a
    window over that tiny frame, never over the corpus.
    """
    counts = docs.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").alias("n_docs")
    )
    wall = Window.partitionBy()
    weighted = counts.withColumn("_w", F.pow(F.col("n_docs"), F.lit(alpha)))
    total = F.coalesce(
        F.lit(target_total), F.sum("n_docs").over(wall)
    ).cast("double")
    return (
        weighted.withColumn("mix_weight", F.col("_w") / F.sum("_w").over(wall))
        .withColumn("expected_docs", total * F.col("mix_weight"))
        .withColumn(
            "sample_rate",
            F.least(F.lit(1.0), F.col("expected_docs") / F.col("n_docs")),
        )
        .select(
            "group",
            "n_docs",
            F.round("mix_weight", 9).alias("mix_weight"),
            F.round("sample_rate", 9).alias("sample_rate"),
            F.round("expected_docs", 4).alias("expected_docs"),
        )
    )


def temperature_sample(
    docs: DataFrame,
    alpha: float = 0.7,
    target_total: int | None = None,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministically realize a temperature mix: keep each document
    iff its engine-portable unit hash falls below its group's
    :func:`temperature_mix_rates` sample_rate.

    Unlike ``sampleBy`` (partition-order-dependent RNG), the keep
    decision is a pure function of (seed, doc id) — reproducible across
    cluster sizes and auditable in plain SQL. The rates frame is one
    row per group, broadcast; the corpus side never shuffles.
    """
    rates = temperature_mix_rates(docs, alpha, target_total, group_col).select(
        F.col("group").alias(group_col), "sample_rate"
    )
    u = _unit_hash("tmix", seed, F.col(id_col))
    return (
        docs.join(F.broadcast(rates), group_col)
        .filter(u < F.col("sample_rate"))
        .drop("sample_rate")
    )


def select_within_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-greedy corpus selection under a per-group token budget:
    within each language/domain, keep the highest-quality documents
    whose cumulative token count stays ≤ ``budget_tokens`` (the
    data-mixing step that turns 'we can afford N tokens of French' into
    an actual document set).

    Deterministic: quality is rounded to 4 dp and ties break on doc id,
    so the selection is a pure function of the corpus. One windowed
    shuffle per group key — per-reducer state is one running sum;
    partition skew follows corpus language skew, the same profile every
    per-language stage here has.

    Returns (group, id, quality, n_tokens, cum_tokens) for the kept
    docs. Docs with 0 tokens are excluded up front.
    """
    from .text import bpe_token_count, quality_score

    w = Window.partitionBy(group_col).orderBy(
        F.desc("quality"), F.col(id_col)
    )
    sized = (
        docs.select(
            F.col(group_col).alias("group"),
            F.col(id_col),
            F.round(quality_score(F.col(text_col)), 4).alias("quality"),
            bpe_token_count(F.col(text_col)).alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumnRenamed("group", group_col)
    )
    return (
        sized.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .select(
            F.col(group_col).alias("group"), id_col, "quality", "n_tokens", "cum_tokens"
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions: every id classified
    as added / removed / changed / unchanged by content fingerprint.

    One full-outer shuffle join on the id; contents never move — each
    side is reduced to (id, md5 fingerprint) at the scan, so at 100 TB
    the join exchanges 48-byte rows, not documents. Feed 'added' +
    'changed' into the incremental dedup/quality path and 'removed'
    into retention tooling.
    """
    # presence is tracked by an explicit marker, NOT by fingerprint
    # nullness: md5(NULL text) is NULL, and using it as the existence
    # test misclassifies a NULL-text doc present in both versions as
    # 'added' (fuzz-gate find); eqNullSafe keeps NULL==NULL 'unchanged'
    fp = lambda d, side: d.select(  # noqa: E731
        F.col(id_col),
        F.md5(F.col(text_col).cast("string")).alias(f"_fp_{side}"),
        F.lit(True).alias(f"_in_{side}"),
    )
    o = fp(old, "old")
    n = fp(new, "new")
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(~F.coalesce(F.col("_in_old"), F.lit(False)), "added")
        .when(~F.coalesce(F.col("_in_new"), F.lit(False)), "removed")
        .when(F.col("_fp_old").eqNullSafe(F.col("_fp_new")), "unchanged")
        .otherwise("changed")
    )
    return joined.select(id_col, status.alias("status"))


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirtakis A-ES, public algorithm): each row gets key = u^(1/w) with
    u a portable unit hash of (seed, id); the k largest keys form an
    exact weighted sample without replacement.

    The mixture-sampling primitive for training-data assembly (pick k
    docs biased by quality/length/domain weight) made REPRODUCIBLE:
    the sample is a pure function of (data, seed) — no rand(), so any
    engine re-derives the identical set. Scale shape: scan-side key
    expression + top-k (TakeOrderedAndProject — per-partition heaps,
    no global sort). Rows with weight <= 0 (or NULL) have zero
    selection probability and are FILTERED, which is the A-ES
    semantics — not left to trip an ANSI divide-by-zero.
    """
    u = _unit_hash("aes", seed, F.col(id_col))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        docs.filter(F.col(weight_col).cast("double") > 0)
        .withColumn("aes_key", key)
        .orderBy(F.desc("aes_key"), F.col(id_col))
        .limit(k)
        .drop("aes_key")
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.3,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Fuzzy benchmark decontamination: flag corpus documents whose
    word-``n``-gram Jaccard similarity to ANY benchmark document is ≥
    ``threshold`` — catching paraphrased/reformatted eval leakage the
    exact-overlap :func:`decontaminate` counter misses.

    Same MinHash-LSH architecture as the near-dup stack, pointed
    across two datasets: signatures for both sides, candidate
    (corpus, benchmark) pairs from an equi-join on (band_id,
    band_hash) — corpus×bucket, never corpus×benchmark — then exact
    Jaccard verification on candidates only. Corpus and benchmark ids
    must be disjoint (they share one id space in the verify join).

    Returns one row per CONTAMINATED corpus doc:
    (doc_id, bench_id, jaccard_sim) with the strongest benchmark match
    (ties → lowest bench id).
    """
    from .dedup import minhash_band_rows, minhash_signatures, verify_pairs_jaccard_arrays

    # ONE signature pass over corpus ∪ benchmark (ids are disjoint by
    # contract): a single gram explode + one 64-min aggregation instead
    # of two pipelines; band rows split back by a broadcast of the
    # benchmark ids (the eval suite is the small side by definition).
    # Measured 2.47 s → 2.17 s median for candidate gen at sf0.1.
    u = corpus.select(id_col, text_col).unionByName(
        benchmark.select(id_col, text_col)
    )
    sig = minhash_signatures(u, text_col, id_col, n, num_hashes)
    band = minhash_band_rows(sig, id_col, num_hashes, bands)
    bid = F.broadcast(benchmark.select(F.col(id_col).alias("_bid")))
    cband = band.join(bid, band[id_col] == F.col("_bid"), "left_anti").select(
        F.col(id_col).alias("id_a"), "band_id", "band_hash"
    )
    bband = band.join(bid, band[id_col] == F.col("_bid"), "left_semi").select(
        F.col(id_col).alias("id_b"), "band_id", "band_hash"
    )
    cand = cband.join(bband, ["band_id", "band_hash"]).select("id_a", "id_b").distinct()
    # candidate count is bounded by the contamination rate × banding
    # false-positive factor — batch-scale, where the lazy array verify
    # wins (see verify_pairs_jaccard_arrays; measured 1.9 s → 1.4 s
    # here on 27 candidates)
    verified = verify_pairs_jaccard_arrays(
        cand, corpus.unionByName(benchmark), text_col, id_col, n, threshold
    )
    # per-doc strongest match via ONE hash aggregation: min_by over
    # (-sim, bench_id) is the row_number window's exact order
    # (jaccard desc, ties to the lowest bench id) without the
    # per-partition sort (guide §2.3)
    return (
        verified.groupBy("id_a")
        .agg(
            F.expr(
                "min_by(struct(id_b, jaccard_sim), struct(-jaccard_sim, id_b))"
            ).alias("_best")
        )
        .select(
            F.col("id_a").alias(id_col),
            F.col("_best.id_b").alias("bench_id"),
            F.col("_best.jaccard_sim").alias("jaccard_sim"),
        )
    )


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    pre_tok: str = "<PRE>",
    suf_tok: str = "<SUF>",
    mid_tok: str = "<MID>",
) -> DataFrame:
    """Fill-in-the-middle pretraining transform (Bavarian et al.'s PSM
    layout): deterministically cut each document into prefix / middle /
    suffix and emit ``<PRE>prefix<SUF>suffix<MID>middle``, teaching an
    autoregressive model to infill — the standard augmentation for code
    corpora, applied at a document granularity here.

    Cut points derive from the engine-portable md5 hash of
    (seed, doc id), so the transform is reproducible across runs AND
    rebuildable by a SQL twin: ``a ∈ [1, L−2]``, ``b ∈ [a+1, L−1]``,
    all three pieces non-empty. Documents shorter than 3 characters
    pass through unchanged (NULL cuts). Pure column expressions —
    scan-side, zero shuffles, linear at any scale.
    """
    from .text import portable_gram_hash

    txt = F.col(text_col)
    ln = F.length(txt)
    key = lambda tag: F.concat_ws(  # noqa: E731
        ":", F.lit(tag), F.lit(str(seed)), F.col(id_col).cast("string")
    )
    a = (F.lit(1) + F.pmod(portable_gram_hash(key("fim1")), ln - 2)).cast("int")
    b = (a + 1 + F.pmod(portable_gram_hash(key("fim2")), ln - a - 1)).cast("int")
    fim = F.concat(
        F.lit(pre_tok),
        F.substr(txt, F.lit(1), a),
        F.lit(suf_tok),
        F.substr(txt, b + 1, ln - b),
        F.lit(mid_tok),
        F.substr(txt, a + 1, b - a),
    )
    ok = ln >= 3
    return df.withColumn("cut_a", F.when(ok, a)).withColumn(
        "cut_b", F.when(ok, b)
    ).withColumn("fim_text", F.when(ok, fim).otherwise(txt))


def source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Cross-source contamination matrix: exact word-n-gram Jaccard
    between every pair of sub-corpora — the audit that catches one
    source republishing another (mirrors, scrapes, benchmark leakage
    between training subsets) before both are sampled as if
    independent.

    Shape: grams explode once per document (posexplode + lead window),
    map to their source, distinct to per-source gram SETS, then a
    self-equi-join on the gram — per-gram fan-out is bounded by the
    number of sources sharing it (≤ |groups|), so with a bounded group
    count this is linear in corpus size, never all-pairs over
    documents. For thousands of groups swap the exact join for MinHash
    sketches per group (operators.dedup.minhash_signatures) and
    estimate the same matrix. Pairs with zero shared grams are omitted.
    """
    from ..functions import exploded_word_ngrams

    src_map = df.select(F.col(id_col), F.col(group_col).alias("_grp"))
    grams = exploded_word_ngrams(df, text_col, id_col, n=n)
    # the distinct (source, gram) index feeds three branches (sizes +
    # both join sides); materialize it once — Spark shares no common
    # subplans, so the corpus-sized gram explode would otherwise run 3×
    sg = (
        grams.join(src_map, id_col)
        .select(F.col("_grp").alias("grp"), "gram")
        .distinct()
        .localCheckpoint()
    )
    sizes = sg.groupBy("grp").agg(F.count("*").alias("n_grams"))
    a = sg.select(F.col("grp").alias("src_a"), "gram")
    b = sg.select(F.col("grp").alias("src_b"), "gram")
    pairs = (
        a.join(b, "gram")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_common"))
    )
    za = sizes.select(F.col("grp").alias("src_a"), F.col("n_grams").alias("_na"))
    zb = sizes.select(F.col("grp").alias("src_b"), F.col("n_grams").alias("_nb"))
    return (
        pairs.join(za, "src_a")
        .join(zb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Chosen/rejected pair construction for preference training
    (RLHF/DPO data prep): per prompt group, pair the best-scored
    response with the worst-scored one. ONE hash aggregation — the
    argmax/argmin ride a lexicographic struct max/min (score, -id,
    id), so there is no window sort and no self-join, and ties are
    deterministic (best: lowest id wins; worst: highest id wins, so
    a 2-response tie still yields distinct rows when scores differ).

    Groups with a single response or zero score spread produce no
    pair (margin must be > 0 — a pair that prefers nothing teaches
    nothing). Scores should be pre-rounded by the caller (house
    style) so cross-engine tie behavior is stable.

    Output: (prompt, chosen_id, rejected_id, chosen_score,
    rejected_score, margin). ``id_col`` must be numeric (the
    deterministic tiebreak rides its negation inside the struct
    ordering); map string ids to a dense numeric id first
    (operators/ids.py) if needed.
    """
    neg_id = (-F.col(id_col)).alias("_nid")
    s = F.struct(F.col(score_col).alias("_s"), neg_id, F.col(id_col).alias("_id"))
    agg = df.groupBy(prompt_col).agg(
        F.max(s).alias("_best"), F.min(s).alias("_worst")
    )
    return (
        agg.select(
            prompt_col,
            F.col("_best._id").alias("chosen_id"),
            F.col("_worst._id").alias("rejected_id"),
            F.col("_best._s").alias("chosen_score"),
            F.col("_worst._s").alias("rejected_score"),
            (F.col("_best._s") - F.col("_worst._s")).alias("margin"),
        )
        .filter(F.col("margin") > 0)
    )


def dsir_importance(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    alpha: float = 0.5,
    round_dp: int = 6,
) -> DataFrame:
    """DSIR-style hashed-unigram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every raw document by how target-like its token distribution
    is — weight = mean over its tokens of ln(P_target(b) / P_raw(b)),
    where b is the token's portable md5 hash bucket and both
    distributions are add-``alpha`` smoothed bag-of-bucket estimates
    (target estimated from ``target``, raw from ``df`` itself).
    Resample the corpus by keeping the top-weight tail or sampling
    proportional to exp(weight).

    Plan shape: two linear count aggregations produce the B-row
    distribution tables; their totals ride 1-row crossJoin broadcasts
    (house pattern); scoring is one token explode + one broadcast join
    against the B-row log-ratio table + one groupBy(id) mean. Nothing
    quadratic, no global sort. At 100 TB fit the log-ratio table once
    and persist it beside the corpus like the IVF centroids — scoring
    new data then touches only the new partitions.

    Output: (id_col, n_tokens, dsir_weight) for every raw doc with at
    least one token, weight rounded to ``round_dp``; weight > 0 reads
    "more target-like than the raw average". The md5 bucketing, exact
    integer counts, and boundary rounding make the whole contract
    reproducible in plain SQL.
    """
    from .text import portable_gram_hash as _pgh

    def bucketed(frame: DataFrame, *keep: str) -> DataFrame:
        tok = F.explode(tokens(F.col(text_col))).alias("_tok")
        ex = frame.select(*keep, tok)
        return ex.select(
            *keep, F.pmod(_pgh(F.col("_tok")), F.lit(buckets)).alias("_b")
        )

    raw_b = bucketed(df, id_col)
    rd = raw_b.groupBy("_b").agg(F.count("*").alias("_rn"))
    td = bucketed(target).groupBy("_b").agg(F.count("*").alias("_tn"))
    # one full-outer bucket join feeds BOTH the totals (target buckets
    # absent from raw still count toward T) and the log-ratio table, so
    # the plan carries a single 1-row scalar broadcast
    dist = rd.join(td, "_b", "full")
    tot = dist.agg(F.sum("_rn").alias("_R"), F.sum("_tn").alias("_T"))

    a, ab = float(alpha), float(alpha) * buckets
    ratio = (
        dist.filter(F.col("_rn").isNotNull())  # score only raw-side buckets
        .crossJoin(F.broadcast(tot))
        .select(
            "_b",
            (
                F.log((F.coalesce(F.col("_tn"), F.lit(0)) + a) / (F.col("_T") + ab))
                - F.log((F.col("_rn") + a) / (F.col("_R") + ab))
            ).alias("_lr"),
        )
    )
    return (
        raw_b.join(F.broadcast(ratio), "_b")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("_lr"), round_dp).alias("dsir_weight"),
        )
    )


def chat_transcripts(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """SFT chat-transcript assembly: per conversation, order the turns,
    render each as ``<|role|>text\\n``, concatenate, and emit the
    assistant LOSS-MASK spans as 1-based [start, end) character
    offsets over the rendered transcript — the exact artifact an
    instruction-tuning pipeline feeds the trainer (loss on assistant
    tokens only).

    ONE shuffle: the running-offset window (partitionBy conv, orderBy
    turn) and the final groupBy(conv) share the same hash partitioning,
    so Catalyst reuses the exchange. Per-conversation state is bounded
    by the longest conversation — the same bound any tokenizer pass
    needs. No global sort; collect_list + array_sort orders turns
    within each group only.

    Output per conversation: n_turns, the transcript, transcript_chars,
    mask_starts / mask_ends (turn-ordered int arrays, empty when the
    conversation has no assistant turns — never NULL).
    """
    seg = F.concat(
        F.lit("<|"), F.col(role_col), F.lit("|>"), F.col(text_col), F.lit("\n")
    )
    w = (
        Window.partitionBy(conv_col)
        .orderBy(turn_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(F.length(seg)).over(w), F.lit(0))
    start = prior + F.length(F.col(role_col)) + F.lit(5)  # after "<|role|>"
    end = start + F.length(F.col(text_col))
    mask = F.when(
        F.col(role_col) == "assistant",
        F.struct(
            F.col(turn_col).alias("_t"),
            start.alias("_s"),
            end.alias("_e"),
        ),
    )
    staged = df.select(
        conv_col,
        F.struct(F.col(turn_col).alias("_t"), seg.alias("_seg")).alias("_turn"),
        mask.alias("_mask"),
    )
    grouped = staged.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        F.array_sort(F.collect_list("_turn")).alias("_turns"),
        F.array_sort(F.collect_list("_mask")).alias("_masks"),
    )
    transcript = F.array_join(
        F.transform(F.col("_turns"), lambda x: x["_seg"]), ""
    )
    return grouped.select(
        conv_col,
        "n_turns",
        transcript.alias("transcript"),
        F.length(transcript).alias("transcript_chars"),
        F.transform(F.col("_masks"), lambda m: m["_s"]).alias("mask_starts"),
        F.transform(F.col("_masks"), lambda m: m["_e"]).alias("mask_ends"),
    )


def distinct_ngram_ratio(
    df: DataFrame,
    n: int = 2,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level distinct-n diversity (the distinct-1/distinct-2
    metric of Li et al. 2016, applied as corpus QA): per group, the
    fraction of word n-gram OCCURRENCES that are distinct. Low values
    flag template farms and self-repetitive sources before they skew
    training; complements the per-document repetition screens
    (repeated_gram_ratio is cross-doc boilerplate, this is in-group
    vocabulary collapse).

    One gram explode + one aggregation with a distinct count (Spark's
    two-phase Expand rewrite — still a single shuffle keyed on the
    group). Output: (group, n_grams, n_distinct, distinct_ratio 6dp).
    """
    grams = exploded_word_ngrams(
        df.select(id_col, group_col, text_col), text_col, id_col, n
    ).join(df.select(id_col, group_col), id_col)
    return grams.groupBy(group_col).agg(
        F.count("*").alias("n_grams"),
        F.countDistinct("gram").alias("n_distinct"),
        F.round(F.countDistinct("gram") / F.count("*"), 6).alias(
            "distinct_ratio"
        ),
    )


def zipf_slope(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    top_r: int = 100,
) -> DataFrame:
    """Zipf rank-frequency slope per group — the corpus-health metric
    (natural language sits near slope −1 on the log-log rank/frequency
    line; template farms and synthetic spam flatten it, boilerplate
    floods steepen it). Computed as the OLS slope of ln(freq) on
    ln(rank) over each group's ``top_r`` most frequent tokens.

    Plan: one token explode + (group, token) count, one per-group rank
    window over the group-cardinality count table, one covariance
    aggregate — the corpus scan is linear, the regression runs on
    ``groups × top_r`` rows. Ties rank deterministically (count desc,
    token asc) so the top-R cut is engine-stable.

    Output: (group, n_terms, zipf_slope 4dp).
    """
    toks = df.select(
        F.col(group_col), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    counts = toks.groupBy(group_col, "_t").agg(F.count("*").alias("_c"))
    w = Window.partitionBy(group_col).orderBy(
        F.col("_c").desc(), F.col("_t").asc()
    )
    ranked = (
        counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= top_r)
        .select(
            group_col,
            F.log(F.col("_r").cast("double")).alias("_x"),
            F.log(F.col("_c").cast("double")).alias("_y"),
        )
    )
    return ranked.groupBy(group_col).agg(
        F.count("*").alias("n_terms"),
        # var_pop = 0 (single distinct rank in the group) would make
        # Spark emit NaN from 0.0/0.0 where DuckDB's regr_slope returns
        # NULL — guard so degenerate groups yield NULL on both engines
        F.when(
            F.var_pop("_x") > 0,
            F.round(F.covar_pop("_x", "_y") / F.var_pop("_x"), 4),
        ).alias("zipf_slope"),
    )


def oov_rate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_k: int = 1000,
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_k`` token vocabulary — the cheap tokenizer-fit screen:
    docs whose tokens mostly fall outside the working vocabulary are
    encoding noise, wrong-language strays, or code in a prose corpus,
    and they inflate token budgets downstream. (The corpus-level
    complement is ``text.vocab_coverage`` — the v50/v90/v99 curve that
    picks ``vocab_k``; this operator then GATES individual docs
    against the chosen K.)

    Plan: one global token count → top-K cut as orderBy().limit()
    (Spark's TakeOrderedAndProject — per-partition heaps merged on the
    driver, NOT a single-partition sort window, which matters when the
    distinct-token table itself is huge) with deterministic ties
    (count desc, token asc) → the K-row vocab broadcast back onto the
    exploded scan, one per-doc aggregate. Counts OCCURRENCES (not
    types): a doc repeating one alien token 500 times is 100% OOV.

    Output: input ids + (n_tok, n_oov, oov_rate 4dp); empty/NULL text
    yields (0, 0, 0.0).
    """
    toks = df.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("_t")
    )
    counts = toks.filter(F.col("_t").isNotNull()).groupBy("_t").agg(
        F.count("*").alias("_c")
    )
    vocab = (
        counts.orderBy(F.col("_c").desc(), F.col("_t").asc())
        .limit(vocab_k)
        .select("_t", F.lit(True).alias("_in_vocab"))
    )
    tagged = toks.join(F.broadcast(vocab), "_t", "left")
    per_doc = tagged.groupBy(id_col).agg(
        F.sum(F.col("_t").isNotNull().cast("long")).alias("n_tok"),
        F.sum(
            (F.col("_t").isNotNull() & F.col("_in_vocab").isNull()).cast("long")
        ).alias("n_oov"),
    )
    return per_doc.withColumn(
        "oov_rate",
        F.when(
            F.col("n_tok") > 0,
            F.round(F.col("n_oov") / F.col("n_tok"), 4),
        ).otherwise(F.lit(0.0)),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Pointwise-mutual-information collocation mining — the standard
    corpus-analysis pass for multiword expressions (Church & Hanks):
    PMI(w1, w2) = ln(P(w1 w2) / (P(w1)·P(w2))), pair probability over
    adjacent-bigram occurrences, unigram probabilities over token
    occurrences. High-PMI pairs are phrases ("hong kong"); a corpus
    whose top PMI list is template boilerplate has a diversity problem.

    ``min_count`` floors the pair count first (PMI is notoriously
    noisy on hapax pairs). Plan: ONE posexplode token pass feeds both
    the unigram counts and (via a lead window on the doc key — the
    exploded_word_ngrams shape, not element_at inside a lambda, which
    re-evaluates the token array per bigram, O(tokens²)/doc) the
    adjacent-bigram counts; three counting aggregates + two equi-joins
    on the PAIR table (vocab-sized, not corpus-sized), top-k via
    TakeOrderedAndProject with deterministic ties (pmi desc, w1, w2).

    Output: (w1, w2, n_pair, pmi 4dp), ``top_k`` rows.
    """
    tok_rows = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.transform(tokens(F.col(text_col)), F.lower)).alias(
            "_pos", "w"
        ),
    )
    w_next = Window.partitionBy("_id").orderBy("_pos")
    grams = (
        tok_rows.select(
            F.col("w").alias("w1"),
            F.lead("w", 1).over(w_next).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    uni = tok_rows.select("w")
    c12 = grams.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    c1 = uni.groupBy(F.col("w").alias("w1")).agg(F.count("*").alias("n_w1"))
    c2 = uni.groupBy(F.col("w").alias("w2")).agg(F.count("*").alias("n_w2"))
    totals = grams.agg(F.count("*").alias("t_pair")).crossJoin(
        uni.agg(F.count("*").alias("t_uni"))
    )
    scored = (
        c12.filter(F.col("n_pair") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("t_pair"))
                    / (
                        (F.col("n_w1") / F.col("t_uni"))
                        * (F.col("n_w2") / F.col("t_uni"))
                    )
                ),
                4,
            ),
        )
    )
    return (
        scored.orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(top_k)
        .select("w1", "w2", "n_pair", "pmi")
    )


def padding_waste_report(
    docs: DataFrame,
    candidate_lens,
    text_col: str = "text",
) -> DataFrame:
    """Batch-shape planning for training readers: for each candidate
    fixed sequence length, how many tokens of PADDING the corpus would
    cost (docs shorter than the boundary pad up; longer docs fill
    ceil(n/len) sequences whose last one pads) and how many sequences
    it yields — the report that picks max_len / bucket boundaries
    before a single GPU-hour is spent on pad tokens. (Sequence packing
    — pack_sequences — eliminates padding entirely; this quantifies
    what NOT packing costs at each boundary, or the waste of a
    bucketed-padding reader.)

    One token-count scan, one explode over the (tiny) candidate list,
    one aggregate — integers end to end.

    Output per candidate length: (seq_len, n_docs, total_tokens,
    n_sequences, pad_tokens, pad_ratio 4dp).
    """
    lens = sorted(int(x) for x in candidate_lens)
    if not lens or lens[0] <= 0:
        raise ValueError("candidate_lens must be positive ints")
    toks = docs.select(token_count(F.col(text_col)).alias("n_tok")).filter(
        F.col("n_tok") > 0
    )
    tagged = toks.select(
        "n_tok",
        F.explode(F.array(*[F.lit(c) for c in lens])).alias("seq_len"),
    ).withColumn(
        "n_seq", F.ceil(F.col("n_tok") / F.col("seq_len")).cast("long")
    )
    return (
        tagged.groupBy("seq_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_seq").alias("n_sequences"),
            F.sum(
                F.col("n_seq") * F.col("seq_len") - F.col("n_tok")
            ).alias("pad_tokens"),
        )
        .withColumn(
            "pad_ratio",
            F.round(
                F.col("pad_tokens")
                / (F.col("pad_tokens") + F.col("total_tokens")),
                4,
            ),
        )
    )
