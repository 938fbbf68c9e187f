"""Core-count scaling sample (r16, VERDICT item 6): run a set of heavy
queries at the CURRENT $SPARK_GRAFT_CPUS against a (large, /tmp)
fixture and emit one JSON line per query with warm medians, so two
invocations (8 vs 32 cores) give measured parallelism ratios at a
scale where per-action overhead does not dominate.

Query choice: linear-cost representatives of the paths this round
touched (width fixes, persists) plus untouched controls. The
quadratic-by-construction pair/dedup families are excluded — on a
K-replicated corpus their cost model changes with K, which would
measure the fixture, not the engine.

Usage: SPARK_GRAFT_CPUS=8 python tools/scaling_sample.py /tmp/sf2 out.json
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

QUERIES = [
    "q02_monthly_revenue_trend",
    "k4_category_revenue_share",
    "bi_revenue_cube_status_year",
    "agg_rollup_year_month",
    "window_top3_parts_per_brand",
    "bi_pareto_brand_products",
    "join_scd2_pit_attribution",
    "etl_column_profile",
    "events_json_and_moments",
    "events_sessionization",
    "events_value_mad_twophase",
    "text_langid_threshold_sweep",
    "text_boilerplate_by_source",
    "corpus_source_tv_drift",
    "text_repetition_signals",
    "sim_ivf_ann_topk",
]


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import __spark_entry__ as entry
    from bench import COUNT_ONLY_PREFIXES, _post_query_hygiene

    qs = entry.queries()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs["q01_top5_products_by_revenue"](spark, sf_dir).count()  # warm-up

    results = {}
    for name in QUERIES:
        count_only = name.startswith(COUNT_ONLY_PREFIXES)
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            if count_only:
                df.count()
            else:
                df.collect()
            runs.append(time.perf_counter() - t0)
        _post_query_hygiene(spark)
        results[name] = round(statistics.median(runs), 3)
        print(json.dumps({"query": name, "runs": [round(r, 3) for r in runs]}))

    payload = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "sf_dir": sf_dir,
        "repeats": repeats,
        "medians": results,
        "total_median_sum": round(sum(results.values()), 3),
    }
    line = json.dumps(payload)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
