"""Scaling spot-bench: time a fixed set of corpus-scaling registry
queries on generated data (tools/gen_scale_data.py) at a given core
count. One timed run per query after a warm-up run of the session.

Usage:
  SPARK_GRAFT_CPUS=32 python tools/scale_bench.py /tmp/gen_sf1 [--runs 2]

Prints one line per query: name, seconds per run. Companion to the
round-11 scaling table in OPTIMIZATION_r11.md — absolute numbers are
generator-specific; the 8c/32c ratio per (query, SF) is the result.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataingestionframework_spark.plans.queries import QUERIES
from dataingestionframework_spark.session import get_spark

# corpus-scaling queries only: the bounded-sample gates (lsh_index_*,
# stream parities, doc_id<300 slices) are constant-size by design and
# cannot show scaling
NAMES = [
    "set_similarity_join_docs",
    "fuzzy_decontaminate_docs",
    "minhash_near_dup",
    "simhash_near_dup",
    "dedup_cluster_canonical",
    "substring_dedup_docs",
    "lang_id_ngram_docs",
    "lang_id_metrics_docs",
    "bigram_lm_score_docs",
    "bfs_distances_docs",
    "entity_match_customers",
    "kmeans_cluster_embeddings",
    "pq_ann_topk",
    "knn_join_bucketed",
    "embedding_near_dup",
    "cooccurrence_lift_lineitem",
    "cms_frequency_orders",
    "approx_distinct_parts",
    "profile_orders",
    "q5_region_volume",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    spark = get_spark("scale_bench")
    spark.range(1000).selectExpr("sum(id)").collect()
    cores = os.environ.get("SPARK_GRAFT_CPUS", "?")
    print(f"# scale_bench sf_dir={args.sf_dir} cores={cores}")
    for name in args.queries or NAMES:
        fn = QUERIES[name]
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            try:
                fn(spark, args.sf_dir).collect()
                times.append(round(time.perf_counter() - t0, 2))
            except Exception as e:
                print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
                times = []
                break
            finally:
                spark.sparkContext.setJobDescription(None)
        if times:
            print(f"{name}: {times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
