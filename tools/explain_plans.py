"""Dump physical-plan summaries for the headline queries: verifies the
plans we claim in SCALE.md (broadcast joins, pushed filters, partial
aggregation, TakeOrderedAndProject) are the plans Spark actually runs.

Usage: python tools/explain_plans.py [sf_dir] > PLANS.txt
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from retail_sales_analysis_etl_bi_project_spark.session import get_spark
import __spark_entry__ as entrymod

INTERESTING = re.compile(
    r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|Exchange|HashAggregate"
    r"|TakeOrderedAndProject|PushedFilters|PartitionFilters|WholeStageCodegen"
    r"|Window|Scan parquet"
)


def summarize(name, df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    lines = [
        ln for ln in buf.getvalue().splitlines() if INTERESTING.search(ln)
    ]
    return f"== {name} ==\n" + "\n".join(lines[:40])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("explain-plans")
    qs = entrymod.queries()
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "q01_top5_products_by_revenue",
        "q02_monthly_revenue_trend",
        "q03_revenue_by_supplier_nation",
        "tpch_q1_pricing_summary",
        "tpch_q5_local_supplier_volume",
        "etl_fact_assembly",
        "etl_quality_audit",
        "etl_silver_filters",
        "corpus_sample_and_pack",
        "dedup_hash_groups",
        "dedup_minhash_lsh",
        "dedup_cluster_components",
        "corpus_filter_pipeline",
        "sim_ivf_ann_topk",
        "sim_ivfpq_adc_topk",
        "text_repetition_signals",
        "events_hourly_agg",
        "events_sessionization",
        "join_asof_last_purchase",
        "join_range_value_bands",
    ]
    for name in names:
        print(summarize(name, qs[name](spark, sf_dir)))
        print()
    print(warehouse_pruning_section(spark))
    print()
    print(bucketed_join_section(spark))


def warehouse_pruning_section(spark):
    """Evidence that the month-partitioned gold layout actually prunes:
    build the warehouse via run_etl/save_warehouse, aggregate ONE month
    with a month_key predicate, and show the scan's PartitionFilters
    (the partition layout is what replaces the reference's FK indexes —
    SCALE.md; /root/reference/sql/ddl_oracle.sql:88-91)."""
    import tempfile

    from pyspark.sql import functions as F

    from retail_sales_analysis_etl_bi_project_spark.run_etl import main as etl_main

    out = tempfile.mkdtemp(prefix="wh_plans_")
    etl_main(["--out", out, "--rows", "5000"])
    fact = spark.read.parquet(f"{out}/gold/fact_sales")
    month = fact.select(F.min("month_key")).first()[0]
    q = (
        fact.filter(F.col("month_key") == month)
        .groupBy("product_key")
        .agg(F.sum(F.col("total_amount").cast("decimal(18,2)")).alias("rev"))
    )
    return summarize(f"warehouse_fact_one_month (month_key={month})", q)


def bucketed_join_section(spark):
    """Evidence that the bucketed gold layout joins shuffle-free: write
    orders and customer bucketed on the key, join with broadcast/AQE
    off, and show a SortMergeJoin plan with zero Exchange operators
    (save_bucketed — the write-once shuffle that amortizes every
    downstream fact⋈dim join at 100 TB)."""
    from retail_sales_analysis_etl_bi_project_spark.operators.catalog import (
        save_bucketed,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    db = "plans_bucketed"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    save_bucketed(orders, "orders_b", "o_custkey", n_buckets=16, database=db)
    save_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b", "o_custkey", n_buckets=16, database=db,
    )
    old = {
        c: spark.conf.get(c)
        for c in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j = spark.table(f"{db}.orders_b").join(
            spark.table(f"{db}.customer_b"), "o_custkey"
        )
        n_exchanges = j._jdf.queryExecution().executedPlan().toString().count(
            "Exchange"
        )
        return (
            summarize("bucketed_orders_x_customer (16 buckets)", j)
            + f"\n-- Exchange operators in plan: {n_exchanges} (bucketed scan"
            " supplies the join partitioning; shuffle paid once at write)"
        )
    finally:
        for c, v in old.items():
            spark.conf.set(c, v)
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


if __name__ == "__main__":
    main()
