"""Same-HEAD headline variance band (r14 VERDICT item 4): run the
headline bench N times at ONE git HEAD and commit the per-query median
and spread plus a derived regression threshold, so future round-over-
round regressions are adjudicated against a measured distribution
instead of a fresh standalone re-measure cycle every round.

Method: N full `bench.py` runs in fresh subprocesses (each with its
own JVM — the unit the per-round driver measures), parsing each run's
BENCH_LOCAL.json per-query medians. For every query the artifact
records min/median/max across runs and the relative half-spread
(max-min)/(2*median). The regression threshold is derived from the
observed distribution: a query is flagged only if its next reading
exceeds  median * (1 + 2 * rel_halfspread_p95)  — twice the 95th-
percentile relative half-spread across all queries, i.e. clearly
outside the band the box itself produces on byte-identical code.

Usage: python tools/bench_variance.py [n_runs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "BENCH_VARIANCE.json")
LOCAL = os.path.join(ROOT, "BENCH_LOCAL.json")


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=ROOT,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()

    # per-run checkpoint (a killed fleet-of-runs must not lose the
    # completed runs): raw runs accumulate in a sidecar, and resuming
    # at the SAME HEAD picks up where the last invocation stopped
    raw_path = OUT + ".runs"
    totals: list[float] = []
    per_query: dict[str, list[float]] = {}
    done = 0
    if os.path.exists(raw_path):
        try:
            with open(raw_path) as f:
                raw = json.load(f)
        except (OSError, ValueError):
            raw = {}
        if raw.get("git_head") == head:
            totals = raw.get("totals", [])
            per_query = raw.get("per_query", {})
            done = len(totals)
            print(f"resuming: {done} prior runs at {head}", flush=True)
    for i in range(done, n_runs):
        subprocess.run(
            [sys.executable, "-u", os.path.join(ROOT, "bench.py")],
            cwd=ROOT,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            check=True,
            timeout=1800,
        )
        with open(LOCAL) as f:
            run = json.load(f)
        totals.append(run["value"])
        for q, t in run["queries"].items():
            per_query.setdefault(q, []).append(t)
        with open(raw_path, "w") as f:
            json.dump(
                {"git_head": head, "totals": totals, "per_query": per_query},
                f,
            )
        print(f"run {i + 1}/{n_runs}: total {run['value']}s", flush=True)

    queries = {}
    rel_spreads = []
    for q, ts in sorted(per_query.items()):
        med = statistics.median(ts)
        half = (max(ts) - min(ts)) / 2.0
        rel = half / med if med > 0 else 0.0
        rel_spreads.append(rel)
        queries[q] = {
            "median_sec": round(med, 3),
            "min_sec": round(min(ts), 3),
            "max_sec": round(max(ts), 3),
            "rel_halfspread": round(rel, 4),
        }
    rel_spreads.sort()
    # 95th percentile by nearest-rank (small n, no interpolation games)
    p95 = rel_spreads[max(0, int(0.95 * len(rel_spreads)) - 1)]
    doc = {
        "artifact": "same-HEAD headline variance band",
        "git_head": head,
        "n_runs": n_runs,
        "total_sec_runs": [round(t, 1) for t in totals],
        "total_sec_median": round(statistics.median(totals), 1),
        "total_rel_halfspread": round(
            (max(totals) - min(totals)) / (2 * statistics.median(totals)), 4
        ),
        "rel_halfspread_p95": round(p95, 4),
        "regression_rule": (
            "a per-query reading at a later HEAD counts as a real "
            "regression only if it exceeds BOTH this artifact's "
            "per-query max_sec * 1.2 AND its median_sec * "
            f"{1 + 2 * p95:.3f} (= 1 + 2 * rel_halfspread_p95); "
            "anything inside either band is the box's own same-code "
            "variance (this artifact measures it directly — one of "
            "the N runs was box-wide ~1.4x slower on byte-identical "
            "code) and needs no standalone re-measure cycle"
        ),
        "queries": queries,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {OUT}: {n_runs} runs at {head}, p95 half-spread {p95:.3f}")


if __name__ == "__main__":
    main()
