"""Standalone per-query timing evidence (r11 VERDICT item 2): measure
ONE registered query in a fresh session — cold (fitted-artifact builds
included) and N warm repeats — and append the measurement to
BENCH_STANDALONE.json at the repo root.

Purpose: whole-run bench totals on this box swing ±20% with ambient
load (COVERAGE.md §r10→r11 root cause), so a per-query regression
claim needs a SAME-CODE standalone measurement to compare against.
This tool makes that evidence committed and reproducible instead of
anecdotal: each entry records the query, sf_dir, cold seconds, warm
seconds (median of repeats), git HEAD, and a wall-clock-free monotonic
methodology (time.perf_counter around .collect()).

Usage: python tools/bench_standalone.py <query_name> [sf_dir] [warm_repeats]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from retail_sales_analysis_etl_bi_project_spark.session import get_spark  # noqa: E402

OUT = os.path.join(ROOT, "BENCH_STANDALONE.json")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import __spark_entry__ as entry
    from bench import COUNT_ONLY_PREFIXES

    qs = entry.queries()
    if name not in qs:
        raise SystemExit(f"unknown query {name!r}")
    spark = get_spark()

    # Same timed ACTION as bench.py, or the numbers aren't comparable:
    # fact-sized results are count()ed there (COUNT_ONLY_PREFIXES), so
    # collect()ing here would both blow driver memory at sf0.1 and
    # time a different operation than the BENCH entry this tool exists
    # to be compared against (review finding, r12).
    count_only = name.startswith(COUNT_ONLY_PREFIXES)

    def action() -> int:
        df = qs[name](spark, sf_dir)
        return df.count() if count_only else len(df.collect())

    t0 = time.perf_counter()
    rows = action()
    cold = time.perf_counter() - t0

    warms = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        action()
        warms.append(time.perf_counter() - t0)

    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=ROOT,
        capture_output=True,
        text=True,
    ).stdout.strip()
    entry_rec = {
        "query": name,
        "sf_dir": sf_dir,
        "rows": rows,
        "cold_sec": round(cold, 3),
        "warm_sec_median": round(statistics.median(warms), 3),
        "warm_sec_all": [round(w, 3) for w in warms],
        "git_head": head,
    }
    existing = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            existing = json.load(f)
    existing.append(entry_rec)
    with open(OUT, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(entry_rec))


if __name__ == "__main__":
    main()
