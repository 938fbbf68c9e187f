"""Per-query wall-time decomposition for optimization work: split one
registered query's timed action into

  - build_sec : python plan construction (the registered callable; any
                driver-side fitted-artifact collects happen here)
  - exec_sec  : the timed action (collect()/count(), same rule as
                bench.py)
  - jobs/stages/tasks: Spark scheduler counts for the exec phase via
                the status tracker (how many sequential round trips the
                plan costs — at bench scale fixed per-job overhead of
                ~30-120 ms dominates many queries, so job count is the
                first thing to know)

Repeats N times (first repeat = cold within the session) and prints a
JSON line per repeat plus a median summary. Usage:

    python tools/profile_query.py <query> [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from retail_sales_analysis_etl_bi_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import __spark_entry__ as entry
    from bench import COUNT_ONLY_PREFIXES, _post_query_hygiene

    qs = entry.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries {unknown!r}")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # one warm-up action so JVM/codegen startup isn't billed to the
    # first profiled query (same rationale as bench.py's warm-ups)
    qs["q01_top5_products_by_revenue"](spark, sf_dir).count()
    tracker = spark.sparkContext.statusTracker()

    for name in names:
        count_only = name.startswith(COUNT_ONLY_PREFIXES)
        builds, execs = [], []
        for i in range(repeats):
            jobs_before = set(tracker.getJobIdsForGroup() or [])
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            n = df.count() if count_only else len(df.collect())
            t2 = time.perf_counter()
            jobs_after = set(tracker.getJobIdsForGroup() or [])
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            print(
                json.dumps(
                    {
                        "query": name,
                        "repeat": i,
                        "build_sec": round(t1 - t0, 3),
                        "exec_sec": round(t2 - t1, 3),
                        "rows": n,
                        "new_jobs": len(jobs_after - jobs_before),
                    }
                )
            )
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "build_med": round(statistics.median(builds), 3),
                    "exec_med": round(statistics.median(execs), 3),
                    "total_med": round(
                        statistics.median(b + e for b, e in zip(builds, execs)), 3
                    ),
                }
            ),
            flush=True,
        )
        # same between-queries hygiene as bench.py so persists built by
        # one profiled query don't subsidize the next
        _post_query_hygiene(spark)


if __name__ == "__main__":
    main()
