"""Isolate one (or a few) registered queries: time them with the noop
sink (min over runs), count Spark jobs, and optionally dump
explain("formatted") to a file — the guide §1 measurement loop in one
command, without paying for the whole bench.

Usage:
  python scripts/profile_query.py QUERY [QUERY...] \
      [--sf-dir DIR] [--runs N] [--explain-dir DIR] [--cpus N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    if args.cpus is not None:
        os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    from cig_etl_s3_to_sql_data_ingestor_spark.queries import QUERIES
    from cig_etl_s3_to_sql_data_ingestor_spark.session import get_spark

    spark = get_spark(app_name="profile-query")
    sc = spark.sparkContext
    # Warmup mirrors bench.py: executors + codegen + Arrow workers.
    QUERIES["distinct_keys"](spark, args.sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    tracker = sc.statusTracker()
    for name in args.queries:
        fn = QUERIES[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            spark.catalog.clearCache()
            df = fn(spark, args.sf_dir)
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        best, times = float("inf"), []
        jobs_delta = None
        for _ in range(args.runs):
            spark.catalog.clearCache()
            n0 = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobDescription(None)
            n1 = len(tracker.getJobIdsForGroup(None) or [])
            times.append(dt)
            if dt < best:
                best, jobs_delta = dt, n1 - n0
        print(
            f"{name}: min={best:.3f}s runs={[round(t, 3) for t in times]} "
            f"jobs={jobs_delta}",
            flush=True,
        )


if __name__ == "__main__":
    main()
