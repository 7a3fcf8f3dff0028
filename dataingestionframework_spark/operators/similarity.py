"""Embedding similarity search over ``array<float>`` columns.

Two tiers, per the standard ANN playbook:

- :func:`cosine_topk` — brute-force exact scan. At 100 TB this is one
  pass over the corpus with a broadcast 1-row query side and a top-k
  (``ORDER BY … LIMIT k``) that Spark executes as per-partition top-k +
  driver merge (TakeOrderedAndProject) — no global sort shuffle.
- :func:`lsh_cosine_topk` — random-hyperplane (SRP) LSH bucketing: only
  rows whose sign-sketch shares a bucket with the query are scored.
  Sub-linear scan at the cost of recall; bucket key is pushed to the
  parquet scan as an equality filter when the sketch is materialized.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cosine_similarity, vec_dot


def _query_lit(query_vec: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.

    Deterministic ordering: (rounded sim DESC, id ASC) so ties are stable
    across engines and runs.
    """
    q = _query_lit(query_vec)
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


def with_srp_sketch(
    df: DataFrame,
    vec_col: str = "embedding",
    planes: int = 16,
    dim: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Add a signed-random-projection bucket id (``srp_bucket``).

    Hyperplanes are generated deterministically from ``seed`` with a
    splitmix-style integer mix (no numpy state on executors); the dot
    products are pure column expressions.
    """
    import math

    def mix(i: int) -> float:
        # deterministic pseudo-gaussian-ish value in [-1, 1)
        x = (i * 6364136223846793005 + seed * 1442695040888963407) & (2**64 - 1)
        x ^= x >> 33
        x = (x * 0xFF51AFD7ED558CCD) & (2**64 - 1)
        x ^= x >> 33
        u = x / 2**64
        return math.cos(2 * math.pi * u)  # bounded, symmetric around 0

    bucket = F.lit(0).cast("long")
    for p in range(planes):
        plane = F.array(*[F.lit(mix(p * dim + d)) for d in range(dim)])
        bit = F.when(vec_dot(F.col(vec_col), plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, p)
    return df.withColumn("srp_bucket", bucket)


def lsh_cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only rows in the query's SRP bucket.

    With a pre-materialized ``srp_bucket`` column (and files sorted or
    partitioned by it), the bucket equality predicate prunes at the scan.
    """
    dim = len(query_vec)
    sketched = with_srp_sketch(df, vec_col, planes, dim, seed)
    qdf = with_srp_sketch(
        df.sparkSession.createDataFrame([(list(map(float, query_vec)),)], f"{vec_col}: array<double>"),
        vec_col,
        planes,
        dim,
        seed,
    )
    qbucket = qdf.select("srp_bucket").first()[0]
    return cosine_topk(
        sketched.filter(F.col("srp_bucket") == qbucket), query_vec, k, vec_col, id_col
    )


def ivf_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
    sample_fraction: float = 1.0,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: k-means centroids (fit on a sample), each
    row assigned to its nearest centroid (``ivf_cell``).

    Assignment is a pure column expression — argmin over the broadcast
    centroid array — so it runs scan-side with no shuffle. At 100 TB
    the cell column is materialized and the table partitioned by it, so
    a probe reads only ``nprobe`` cells' files.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    fit_df = df if sample_fraction >= 1.0 else df.sample(sample_fraction, seed=seed)
    train = fit_df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_clusters, seed=seed).fit(train)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]

    # argmin_{c} ||v - c||² via the smallest (distance, cell) struct
    scored = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(x) for x in c]),
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    assigned = df.withColumn("ivf_cell", F.element_at(F.array_sort(scored), 1)["cell"])
    return assigned, centroids


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the ``nprobe`` nearest IVF cells, brute-force within them.

    ``df`` must carry ``ivf_cell`` (from :func:`ivf_assign`). The cell
    filter is a plain equality-IN predicate → partition pruning when the
    table is laid out by cell.
    """
    q = list(map(float, query_vec))
    dists = [
        (sum((a - b) ** 2 for a, b in zip(q, c)), i) for i, c in enumerate(centroids)
    ]
    probe_cells = [i for _, i in sorted(dists)[:nprobe]]
    return cosine_topk(
        df.filter(F.col("ivf_cell").isin(probe_cells)), q, k, vec_col, id_col
    )


def knn_join_brute(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-NN join: for each left row, top-k right rows by cosine.

    The right side is collected to a numpy matrix and broadcast; each
    left partition scores an Arrow batch at a time with one BLAS matmul
    (``mapInPandas`` — the vectorized path; the pure-expression
    ``zip_with`` form is ~5× slower at 64 dims). Partitioning of the
    left side is preserved — no shuffle. For big-×-big at 100 TB,
    pre-bucket both sides with :func:`with_srp_sketch` or
    :func:`ivf_assign` and join on the bucket first.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    r_rows = right.select(F.col(right_id), F.col(vec_col)).collect()
    r_ids = np.array([row[0] for row in r_rows], dtype=np.int64)
    r_mat = np.array([row[1] for row in r_rows], dtype=np.float64)
    r_norm = r_mat / np.maximum(np.linalg.norm(r_mat, axis=1, keepdims=True), 1e-12)
    bc = left.sparkSession.sparkContext.broadcast((r_ids, r_norm))

    out_schema = T.StructType(
        [
            T.StructField("left_id", T.LongType()),
            T.StructField("right_id", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            l_mat = np.array(list(pdf["lvec"]), dtype=np.float64)
            l_norm = l_mat / np.maximum(np.linalg.norm(l_mat, axis=1, keepdims=True), 1e-12)
            sims = np.round(l_norm @ mat.T, 6)
            # top-k with deterministic ties: sort by (-sim, right_id)
            order = np.lexsort((np.broadcast_to(ids, sims.shape), -sims), axis=1)[:, :k]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "left_id": np.repeat(pdf["left_id"].to_numpy(), k),
                    "right_id": ids[order].ravel(),
                    "cosine_sim": np.take_along_axis(sims, order, axis=1).ravel(),
                    "rank": np.tile(np.arange(1, k + 1), n),
                }
            )

    l = left.select(F.col(left_id).alias("left_id"), F.col(vec_col).alias("lvec"))
    return l.mapInPandas(score, schema=out_schema)
