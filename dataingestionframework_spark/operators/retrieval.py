"""Lexical retrieval: BM25 scoring and inverted-index construction.

Complements the embedding-side ANN operators (operators/similarity.py)
with the keyword side of corpus search — dedup forensics ("which docs
mention this phrase"), contamination triage, and hybrid retrieval all
start from BM25/posting lists. Capability extension beyond the
reference surface (the reference has no text analytics).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import tokens


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 (Robertson-Sparck Jones, public) for a
    short keyword query.

    Scale shape for few-term queries: pass 1 aggregates the corpus
    statistics BM25 needs — N, avgdl, and one document frequency per
    term — into a SINGLE row (a broadcast join of one row is constant
    cost); pass 2 computes every per-doc score as pure column
    expressions over the token array (tf per term is a scan-side
    ``filter`` count — no explode, no per-term shuffle) and takes
    top-k via TakeOrderedAndProject. Total cost: two scans + one 1-row
    broadcast, independent of query length for realistic queries.

    Output: (id, doc_len, score) with ``score`` rounded to 4 so the
    DuckDB oracle hash-matches despite float summation order.
    """
    terms = [t.lower() for t in query_terms]
    ws = F.transform(tokens(F.col(text_col)), F.lower)
    dl = F.size(ws)
    base = docs.select(F.col(id_col), ws.alias("ws"), dl.alias("doc_len"))

    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        *[
            F.sum(
                (F.array_contains("ws", t)).cast("long")
            ).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    )

    def idf(i):
        n, dfc = F.col("n_docs"), F.col(f"df_{i}")
        return F.log((n - dfc + 0.5) / (dfc + 0.5) + 1.0)

    def tf(t):
        return F.size(F.filter(F.col("ws"), lambda w: w == t)).cast("double")

    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.col("avgdl")
    )
    score = None
    for i, t in enumerate(terms):
        part = idf(i) * tf(t) * F.lit(k1 + 1.0) / (tf(t) + norm)
        score = part if score is None else score + part
    return (
        base.join(F.broadcast(stats))
        .select(
            id_col,
            "doc_len",
            F.round(score, 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def build_inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Term → posting-list table: one row per term with its document
    frequency and the sorted posting list of (doc, tf) pairs.

    One explode + one (term, doc) count + one per-term reassembly —
    the standard two-shuffle index build, linear in total tokens. At
    100 TB the posting arrays for stop-like terms get large: filter
    them with ``min_df``'s sibling max-df in the caller, or store the
    index bucketed by term (write_bucketed) so query-time term lookups
    prune to one bucket.

    Output: (term, df, postings array<struct<doc,tf>> sorted by doc).
    """
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.transform(tokens(F.col(text_col)), F.lower)).alias("term"),
    )
    tf = toks.groupBy("term", "doc").agg(F.count("*").alias("tf"))
    idx = tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.array_sort(
            F.collect_list(F.struct(F.col("doc"), F.col("tf")))
        ).alias("postings"),
    )
    return idx.filter(F.col("df") >= min_df)


def hashed_embedding(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Feature-hashing text embeddings (Weinberger et al. 2009, public):
    each token lands in bucket ``h(w) mod dim`` with sign from a second
    hash bit; per-doc bucket sums are L2-normalized. The deterministic,
    model-free text → vector link in front of the ANN operators
    (IVF/PQ/SRP all consume its output shape) — and the plumbing is
    identical when a real encoder replaces the hash (mapInPandas batch
    inference writing the same (id, dim, value) layout).

    Scale shape: one explode (one hash per token, NOT dim hashes), one
    (id, dim) sum shuffle, one per-doc window for the norm. Output is
    LONG format (id, dim, value) — the layout that joins/pivots cheaply
    and keeps sparse dims free.
    """
    from ..operators.text import portable_gram_hash

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.transform(tokens(F.col(text_col)), F.lower)).alias("term"),
    )
    h = portable_gram_hash(F.col("term"))
    # sign from hash bit 32 — integer ops only (float division of a
    # 60-bit hash would lose the low bits)
    signed = toks.select(
        "id",
        F.pmod(h, F.lit(dim)).cast("int").alias("dim"),
        (F.pmod(F.shiftrightunsigned(h, 32), F.lit(2)) * 2 - 1)
        .cast("double")
        .alias("sign"),
    )
    sums = signed.groupBy("id", "dim").agg(F.sum("sign").alias("v"))
    from pyspark.sql import Window

    norm = F.sqrt(F.sum(F.col("v") * F.col("v")).over(Window.partitionBy("id")))
    return sums.select(
        "id",
        "dim",
        F.round(F.col("v") / F.greatest(norm, F.lit(1e-12)), 6).alias("value"),
    )


__all__ = ["bm25_topk", "build_inverted_index", "hashed_embedding"]


def rbo_rank_agreement(
    scored: DataFrame,
    group_col: str,
    id_col: str,
    score_a_col: str,
    score_b_col: str,
    k: int = 20,
    p: float = 0.9,
) -> DataFrame:
    """Rank-Biased Overlap between two rankings of the same items
    (Webber, Moffat & Zobel, TOIS'10) — the top-weighted agreement
    metric used to compare retrieval systems (BM25 vs embeddings, old
    vs new quality scorer) without assuming conjointness beyond the
    compared prefixes. Truncated-at-``k`` form, normalized so identical
    prefixes score 1.0:

        RBO = (1−p)/(1−p^k) · Σ_{d=1..k} p^{d−1} · |A_d ∩ B_d| / d

    Mechanism without any per-depth loop: an item at ranks (ra, rb)
    enters the prefix intersection at depth e = max(ra, rb), so the
    depth sum regroups per ITEM as W(e) = Σ_{d=e..k} p^{d−1}/d — a
    ``k``-row weight spine computed once with a tiny cumulative window
    and broadcast. Plan: two top-k ranks per group (row_number windows
    over the group shuffle), an equi self-join on (group, id), one
    broadcast spine join, one final group aggregate. Per-group cost is
    O(k); group count is unbounded — shuffles only on the group key.

    Ties break on ``id`` ascending in BOTH rankings (engine-portable
    determinism). Output: (group, n_common, rbo 6dp) per group.
    """
    if not 0 < p < 1:
        raise ValueError("p must be in (0, 1)")
    from pyspark.sql import Window

    g = F.col(group_col)
    wa = Window.partitionBy(g).orderBy(
        F.col(score_a_col).desc(), F.col(id_col).asc()
    )
    wb = Window.partitionBy(g).orderBy(
        F.col(score_b_col).desc(), F.col(id_col).asc()
    )
    ranked = scored.select(
        g.alias("grp"),
        F.col(id_col).alias("_id"),
        F.row_number().over(wa).alias("_ra"),
        F.row_number().over(wb).alias("_rb"),
    )
    both = (
        ranked.filter((F.col("_ra") <= k) & (F.col("_rb") <= k))
        .select("grp", "_id", F.greatest("_ra", "_rb").alias("_e"))
    )
    spark = scored.sparkSession
    # k-row weight spine: W(e) = sum_{d=e..k} p^(d-1)/d via a
    # cumulative window from the deep end (identical accumulation
    # order in the DuckDB twin)
    spine = spark.range(1, k + 1).select(F.col("id").cast("int").alias("_d"))
    ww = Window.orderBy(F.col("_d").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    weights = spine.select(
        F.col("_d").alias("_e"),
        F.sum(F.pow(F.lit(float(p)), F.col("_d") - 1) / F.col("_d"))
        .over(ww)
        .alias("_w"),
    )
    norm = (1.0 - p) / (1.0 - p ** k)
    return (
        both.join(F.broadcast(weights), "_e")
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count("*").alias("n_common"),
            F.round(F.sum("_w") * F.lit(norm), 6).alias("rbo"),
        )
    )
