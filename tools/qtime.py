"""Time individual registered queries in one warm session.

Usage: python tools/qtime.py q1 q2 ... [-n ITERS] [--sf DIR] [--explain OUT]

For each query: builds the DataFrame via its registered spark_fn and
times plan+execute+collect (the bench harness window) ITERS times,
printing every sample and the upper median. ``--explain`` additionally
writes the formatted physical plan to OUT/<name>.txt. The session mirrors
bench.py (same get_spark, warmup read) so numbers are comparable to
bench_report.json entries up to host noise.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None)
    args = ap.parse_args()

    from lhbench_spark.queries import all_queries
    from lhbench_spark.session import get_spark

    spark = get_spark("qtime", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("id % 97 AS k").groupBy("k").count().collect()
    qs = all_queries()
    for name in args.names:
        qd = qs[name]
        samples = []
        tracker = spark.sparkContext.statusTracker()
        for i in range(args.n):
            spark.catalog.clearCache()
            group = f"qtime-{name}-{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.monotonic()
            df = qd.spark_fn(spark, args.sf)
            rows = df.collect()
            dt = time.monotonic() - t0
            spark.sparkContext.setJobGroup("", "")
            n_jobs = len(tracker.getJobIdsForGroup(group))
            samples.append(dt)
            print(
                f"{name} iter{i + 1}: {dt:.3f}s rows={len(rows)} jobs={n_jobs}",
                flush=True,
            )
        s = sorted(samples)
        print(
            f"{name} upper-median: {s[len(s) // 2]:.3f}s min: {s[0]:.3f}s",
            flush=True,
        )
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qd.spark_fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(plan)
    return 0


if __name__ == "__main__":
    sys.exit(main())
