"""Physical-plan hygiene audit over every driver-contract query.

Flags the scale anti-patterns the 100 TB checklist bans:

- CartesianProduct / BroadcastNestedLoopJoin  (quadratic joins)
- BatchEvalPython                             (row-at-a-time Python UDF;
                                               ArrowEvalPython & friends
                                               are the sanctioned path)
- global Sort not feeding a limit             (full-sort shuffle; top-k
                                               queries must compile to
                                               TakeOrderedAndProject)

Each query may declare known, justified exceptions in ALLOW below with
a reason — the audit prints them as `allowed` instead of failing.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")

# name -> {pattern: reason}
ALLOW: dict[str, dict[str, str]] = {
    # 1-row scalar subquery joined without a key: Spark plans a
    # broadcast nested loop over exactly one row — constant cost
    "skew_profile_orders": {
        "BroadcastNestedLoopJoin": "1-row (total_rows, n_keys) scalar broadcast"
    },
    "mrl_prefix_recall_embeddings": {
        "BroadcastNestedLoopJoin": (
            "3-row query-vector broadcast x corpus scan (brute-force "
            "scoring side; the scale path is IVF probes)"
        )
    },
    "q15_top_supplier": {
        "BroadcastNestedLoopJoin": "1-row max-revenue scalar broadcast"
    },
    "q22_wealthy_inactive": {
        "BroadcastNestedLoopJoin": "1-row global-average scalar broadcast"
    },
    "pandas_udf_zscore": {
        "BroadcastNestedLoopJoin": "1-row (mu, sigma) stats broadcast"
    },
    "q11_value_share": {
        "BroadcastNestedLoopJoin": "1-row global-total scalar broadcast"
    },
    "tfidf_top_terms_docs": {
        "BroadcastNestedLoopJoin": "1-row corpus-size (N) scalar broadcast"
    },
    "pmi_collocations_docs": {
        "BroadcastNestedLoopJoin": "1-row (t_pair, t_uni) totals broadcast"
    },
    "equi_depth_buckets_docs": {
        "BroadcastNestedLoopJoin": "1-row quartile cut-point broadcast"
    },
    "curriculum_order_docs": {
        "BroadcastNestedLoopJoin": "1-row quartile cut-point broadcast"
    },
    "bloom_anti_join_lineitem": {
        "BroadcastNestedLoopJoin": "1-row bloom-bitmap broadcast"
    },
    "hll_mergeable_rollup": {
        "BroadcastNestedLoopJoin": "1-row exact-total scalar broadcast"
    },
    "bm25_search_docs": {
        "BroadcastNestedLoopJoin": "1-row corpus-stats (N, avgdl, dfs) broadcast"
    },
    "hybrid_search_rrf": {
        "BroadcastNestedLoopJoin": "1-row corpus-stats broadcast (BM25 branch)"
    },
    "bigram_lm_score_docs": {
        "BroadcastNestedLoopJoin": "1-row vocabulary-size (V) scalar broadcast"
    },
    "bigram_lm_persisted_docs": {
        "BroadcastNestedLoopJoin": "1-row vocabulary-size (V) scalar broadcast"
    },
    "psi_drift_events": {
        "BroadcastNestedLoopJoin": "1-row bucket-totals scalar broadcast"
    },
    "dsir_importance_docs": {
        "BroadcastNestedLoopJoin": "1-row (R, T) distribution-totals broadcast"
    },
    "cooccurrence_lift_lineitem": {
        "BroadcastNestedLoopJoin": "1-row basket-count scalar broadcast"
    },
    "hbos_outliers_orders": {
        "BroadcastNestedLoopJoin": "1-row total-rows scalar broadcast"
    },
    "mi_profile_orders": {
        "BroadcastNestedLoopJoin": "1-row entropy-sum scalar broadcasts"
    },
    "cohen_kappa_docs": {
        "BroadcastNestedLoopJoin": "1-row pe-numerator scalar broadcast"
    },
    "threshold_sweep_docs": {
        "BroadcastNestedLoopJoin": (
            "9-row threshold-spine broadcast (keyless map-side explode "
            "into one |T|-key aggregate)"
        ),
        "global-sort": "result ordering over |T| = 9 rows",
    },
}

PATTERNS = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")


def audit_one(name: str, plan: str) -> list[str]:
    problems = []
    allowed = ALLOW.get(name, {})
    for pat in PATTERNS:
        if pat in plan:
            if pat in allowed:
                print(f"  allowed {name}: {pat} ({allowed[pat]})")
            else:
                problems.append(pat)
    # global sort that isn't a top-k: Sort [..] true (global) without
    # TakeOrderedAndProject and without a following limit marker
    if re.search(r"Sort \[.*\], true,", plan) and "TakeOrderedAndProject" not in plan:
        if "GlobalLimit" not in plan:
            if "global-sort" in allowed:
                print(f"  allowed {name}: global-sort ({allowed['global-sort']})")
            else:
                problems.append("global Sort without limit")
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from dataingestionframework_spark.plans.queries import QUERIES
    from dataingestionframework_spark.session import get_spark

    spark = get_spark("plan-audit")
    n_clean = n_flagged = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_flagged += 1
            continue
        problems = audit_one(name, plan)
        if problems:
            print(f"FLAG  {name}: {', '.join(problems)}")
            n_flagged += 1
        else:
            n_clean += 1
    print(f"\n{n_clean} clean, {n_flagged} flagged")
    sys.exit(1 if n_flagged else 0)


if __name__ == "__main__":
    main()
