"""Round-11 diagnosis harness for the text_tfidf_topterms headline
regression (r9 0.66 s -> r10 1.92 s median, cold 0.97 s).

Reproduces the bench's exact measurement discipline (REPEATS runs,
count() for tfidf, post-query hygiene) in three phases:

  A. fresh session -> tfidf x3            (isolated warm cost)
  B. run the dedup headline prefix (the r10-changed queries that hold
     the cross-query _PAIRS_CACHE/_CC_CACHE persists) -> tfidf x3
  C. release the dedup caches -> tfidf x3 (is the pinned storage the cause?)

Usage: python tools/diag_tfidf.py [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    import __spark_entry__ as entrymod
    from bench import _post_query_hygiene
    from retail_sales_analysis_etl_bi_project_spark.session import get_spark

    spark = get_spark("diag-tfidf")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run3(name: str, count_only: bool = True) -> list[float]:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            n = df.count() if count_only else len(df.collect())
            runs.append(round(time.perf_counter() - t0, 3))
            assert n >= 0
        return runs

    # warm-up (bench parity: JVM + parquet footers for documents)
    qs["q01_top5_products_by_revenue"](spark, SF_DIR).count()
    qs["dedup_hash_groups"](spark, SF_DIR).count()

    a = run3("text_tfidf_topterms")
    print(f"A isolated tfidf: {a} median={statistics.median(a)}", flush=True)

    for name in (
        "dedup_minhash_lsh",
        "dedup_cluster_components",
        "dedup_simhash",
        "dedup_graph_stats",
    ):
        t0 = time.perf_counter()
        len(qs[name](spark, SF_DIR).collect())
        print(f"  ran {name}: {round(time.perf_counter() - t0, 2)}s", flush=True)
        _post_query_hygiene(spark)

    b = run3("text_tfidf_topterms")
    print(f"B after dedup prefix: {b} median={statistics.median(b)}", flush=True)

    from retail_sales_analysis_etl_bi_project_spark.plans import dedup_queries

    for cache in (dedup_queries._PAIRS_CACHE, dedup_queries._CC_CACHE):
        for df in cache.values():
            df.unpersist(blocking=True)
        cache.clear()
    _post_query_hygiene(spark)

    c = run3("text_tfidf_topterms")
    print(f"C after cache release: {c} median={statistics.median(c)}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
