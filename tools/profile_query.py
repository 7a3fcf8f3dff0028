"""Per-query profiling harness for the optimization rounds.

Usage:
  python tools/profile_query.py [--sf DIR] [--runs N] [--plans OUTDIR]
                                [--noop] query [query ...]

For each named registry query: run it `--runs` times on the bench
session (same get_spark defaults as bench.py), timing the same action
the bench times (`collect()`), or — with `--noop` — the noop sink
(guide §1.4) so the computation is timed without driver-side result
pickling. With `--plans OUTDIR`, also write `explain("formatted")` to
`OUTDIR/<query>_<tag>.txt` (tag from --tag, default "before").

Job descriptions are set per query (guide §1.5) so event logs / UI
attribute stages correctly.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataingestionframework_spark.plans.queries import QUERIES
from dataingestionframework_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory for explain captures")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--noop", action="store_true", help="time the noop sink instead of collect()")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm the JVM

    for name in args.queries:
        fn = QUERIES[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        med = sorted(times)[len(times) // 2]
        print(
            f"{name}: median={med:.3f}s min={min(times):.3f}s "
            f"runs={[round(t, 3) for t in times]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
