"""Per-query profiler for optimization rounds (guide §1).

Usage:
    python tools/qprof.py q145_pipeline_replay [more...] [--reps 2]
        [--sf-dir /root/testdata/sf0.1] [--explain plans/r14/suffix]

For each named query: warm once at sf0.001 (JIT/codegen), then time
``reps`` noop-sink runs at the target scale, reporting each rep, the
Spark job count and total task count per rep (status-tracker deltas),
and optionally dumping ``.explain("formatted")`` to
``plans/<dir>/<query>_<suffix>.txt``.

This is measurement tooling only — never on any query path.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries
from real_time_data_pipeline_for_restaurant_analytics_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--explain", default=None,
                    help="plans/<dir>/<suffix>: dump formatted plan to "
                    "plans/<dir>/<query>_<suffix>.txt")
    args = ap.parse_args()

    spark = get_spark(app_name="qprof")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    tracker = spark.sparkContext.statusTracker()

    for name in args.queries:
        q = qs[name]
        if not args.no_warm:
            t0 = time.perf_counter()
            q.build(spark, args.warm_dir).write.format("noop").mode("overwrite").save()
            print(f"{name} warm: {time.perf_counter() - t0:.3f}s", flush=True)
        if args.explain:
            d, _, suffix = args.explain.rpartition("/")
            os.makedirs(d or "plans", exist_ok=True)
            df = q.build(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(d or "plans", f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"{name} plan -> {path}", flush=True)
        for rep in range(args.reps):
            spark.sparkContext._jvm.System.gc()
            jobs_before = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = q.build(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            jobs_after = len(tracker.getJobIdsForGroup(None) or [])
            print(
                f"{name} rep{rep + 1}: {wall:.3f}s  jobs={jobs_after - jobs_before}",
                flush=True,
            )


if __name__ == "__main__":
    main()
