"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (100 TB): every variant is a shuffle-on-key plan —
exact dedup is one hash aggregation on the fingerprint; MinHash-LSH
shuffles once on (band_id, band_hash) buckets so candidate generation
is linear in corpus size instead of O(n²); the exact-Jaccard verifier
only runs on LSH candidates. No driver-side loops, no collect().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import jaccard, word_ngrams
from .text import fingerprint

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical texts by md5 fingerprint.

    Returns (fingerprint, keep_id = min id, n_copies). One hash-agg
    shuffle on a 128-bit key — the canonical 100 TB exact-dedup plan.
    Reference analogue: ``distinct()`` pre-quarantine dedup
    (``modules/auto_loader_steps.py:289,303``), generalized.
    """
    return (
        df.select(fingerprint(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def drop_exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (min id) per distinct text. Window-free:
    a semi-join on the kept ids — two shuffles, no global sort; AQE
    picks broadcast when the kept-id side is small enough."""
    keep = exact_duplicates(df, text_col, id_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (the verifier; quadratic — bound it or feed it LSH pairs)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_id: int | None = None,
) -> DataFrame:
    """All-pairs word-n-gram Jaccard ≥ threshold.

    O(n²) cross join — correctness oracle / verifier only. At scale,
    generate candidates with :func:`minhash_lsh_candidates` and verify
    those pairs with :func:`verify_pairs_jaccard` instead.
    """
    base = df.select(F.col(id_col), F.col(text_col))
    if max_id is not None:
        base = base.filter(F.col(id_col) < max_id)
    g = base.select(id_col, word_ngrams(F.col(text_col), n).alias("grams"))
    a = g.select(F.col(id_col).alias("id_a"), F.col("grams").alias("grams_a"))
    b = g.select(F.col(id_col).alias("id_b"), F.col("grams").alias("grams_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("grams_a"), F.col("grams_b")), 4).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """MinHash signatures as ``num_hashes`` columns ``h0..h{k-1}``.

    Shape matters at scale: grams are exploded to rows ONCE, then the
    whole hash family is ``min(xxhash64(gram, seed=i))`` aggregates in a
    single groupBy — one shuffle, every hash vectorized/codegen'd.
    (Building an array of 64 ``array_min(transform(...))`` expressions
    instead re-inlines the n-gram construction 64×; measured 400+ s vs
    ~2 s on 5k docs.)
    """
    grams = df.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    return grams.groupBy(id_col).agg(
        *[F.min(F.xxhash64("gram", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash banding.

    signature → split into ``bands`` groups of ``num_hashes/bands``
    values → hash each band → self-join per (band_id, band_hash) bucket.
    The self-join shuffles on the bucket key only; AQE's skew-join
    handles hot buckets (e.g. boilerplate-heavy corpora).
    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes)
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"h{j}")
                                    for j in range(b * rows_per_band, (b + 1) * rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_hash")
    a = banded.select(F.col(id_col).alias("id_a"), "band_id", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band_id", "band_hash")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def verify_pairs_jaccard(
    candidates: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard verification of LSH candidate pairs (two equi-joins)."""
    g = df.select(F.col(id_col), word_ngrams(F.col(text_col), n).alias("grams"))
    ga = g.select(F.col(id_col).alias("id_a"), F.col("grams").alias("grams_a"))
    gb = g.select(F.col(id_col).alias("id_b"), F.col("grams").alias("grams_b"))
    return (
        candidates.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("grams_a"), F.col("grams_b")), 4).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


def near_duplicates_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup detection: LSH candidates → exact verification."""
    cands = minhash_lsh_candidates(df, text_col, id_col, n, num_hashes, bands)
    return verify_pairs_jaccard(cands, df, text_col, id_col, n, threshold)


# ---------------------------------------------------------------------------
# SimHash near-dup (Hamming distance on 64-bit sketches)
# ---------------------------------------------------------------------------


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Blocks on the top ``prefix_bits`` of the sketch (documents within
    small Hamming distance usually share a 16-bit prefix) so the
    self-join is bucket-local, then verifies with ``bit_count(xor)``.
    """
    from .text import simhash64_df

    s = simhash64_df(df, text_col, id_col, n)
    s = s.withColumn("block", F.shiftrightunsigned(F.col("sh"), 64 - prefix_bits))
    a = s.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), "block")
    b = s.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), "block")
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
