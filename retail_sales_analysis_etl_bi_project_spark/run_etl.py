"""End-to-end retail ETL entry point — the engine's equivalent of
``python etl/etl.py`` (reference main pipeline, etl/etl.py:312-316).

    python -m retail_sales_analysis_etl_bi_project_spark.run_etl \
        [--data-dir DIR] [--out DIR] [--rows N]

With --data-dir pointing at reference-shaped CSVs
(customers/products/stores/sales.csv) it runs extract -> clean ->
staging -> star-schema warehouse -> validation report, writing parquet
under --out. Without --data-dir it generates reference-distribution
data declaratively (sources/generator.py) first — covering the missing
sales.csv blob (SURVEY.md §7.3).

Unlike the reference (which cleans at import time and ships 5k-row
INSERT chunks to Oracle), every stage here is one lazy Catalyst plan
executed distributed at write time.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from .operators.report import validation_report, write_validation_report
from .plans.retail_etl import (
    build_warehouse,
    clean_customers,
    clean_products,
    clean_sales_observed,
    clean_stores,
    save_warehouse,
)
from .session import get_spark
from .sources.csv import read_raw_csv, write_staging
from .sources.generator import gen_customers, gen_products, gen_sales, gen_stores


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config-root",
        help="dir containing config.ini / .env — layered settings "
        "(reference etl/hybrid_settings.py); CLI flags override",
    )
    ap.add_argument("--data-dir", help="dir with reference-shaped raw CSVs")
    ap.add_argument("--out", help="output base dir (default ./warehouse)")
    ap.add_argument("--rows", type=int, help="generator base rows")
    args = ap.parse_args(argv)

    # Precedence (reference parity): CLI flag > env var > .env file >
    # config.ini > coded default. Always layered: without --config-root
    # the ini/.env are looked up in cwd (reference hybrid_settings
    # loads unconditionally too), so env-var overrides work either way.
    from .config import load_settings

    settings = load_settings(args.config_root)
    data_dir = args.data_dir or settings.data_path or None
    n_rows = args.rows or settings.generator_rows
    if args.out:  # --out overrides both configured paths
        staging_base = f"{args.out}/staging"
        gold_base = f"{args.out}/gold"
        report_path = f"{args.out}/validation_report.txt"
    else:
        from pathlib import Path

        staging_base = settings.staging_path
        gold_base = settings.warehouse_path
        report_path = str(Path(gold_base).parent / "validation_report.txt")

    spark = get_spark(
        "retail-etl",
        master=settings.master or None,
        shuffle_partitions=settings.shuffle_partitions or None,
        extra_conf=(
            {"spark.driver.memory": settings.driver_memory}
            if settings.driver_memory
            else None
        ),
    )
    spark.sparkContext.setLogLevel(settings.log_level)

    if data_dir:
        raw = {
            t: read_raw_csv(spark, f"{data_dir}/{t}.csv", t)
            for t in ("customers", "products", "stores", "sales")
        }
    else:
        n = n_rows
        products = gen_products(spark, n)
        raw = {
            "customers": gen_customers(spark, n),
            "products": products,
            "stores": gen_stores(spark, max(5000, n // 10)),
            "sales": gen_sales(spark, products, n * 5, n, n, max(5000, n // 10)),
        }
        # generator emits typed columns; bronze contract is strings
        raw = {
            t: df.select(*[F.col(c).cast("string") for c in df.columns])
            for t, df in raw.items()
        }

    # sales silver carries in-flight observe() counters: the staging
    # write below is the action that fires them, so the quality numbers
    # in the report come from the SAME scan that wrote silver — no
    # second audit pass (plans/retail_etl.py clean_sales_observed).
    sales_clean, sales_obs_in, sales_obs_out = clean_sales_observed(raw["sales"])
    cleaned = {
        "customers": clean_customers(raw["customers"]),
        "products": clean_products(raw["products"]),
        "stores": clean_stores(raw["stores"]),
        "sales": sales_clean,
    }
    for t, df in cleaned.items():
        write_staging(df, f"{staging_base}/stg_{t}")

    wh = build_warehouse(
        cleaned["customers"], cleaned["products"], cleaned["stores"], cleaned["sales"]
    )
    save_warehouse(wh, gold_base)

    report = validation_report(
        cleaned,
        fact_name="sales",
        fk_map=[
            ("customers", "customer_id"),
            ("products", "product_id"),
            ("stores", "store_id"),
        ],
    )
    m_in, m_out = sales_obs_in.get, sales_obs_out.get
    report += (
        "\n-- silver in-flight counters (observe, zero extra passes) --\n"
        f"sales raw rows: {m_in['n_raw']}\n"
        f"sales clean rows: {m_out['n_clean']} "
        f"(dropped {m_in['n_raw'] - m_out['n_clean']})\n"
        f"sales null total_amount kept for audit: {m_out['n_null_amount']}\n"
        f"sales discounts null-filled to 0: {m_out['n_discount_filled']}\n"
    )
    write_validation_report(report_path, report)
    print(report)


if __name__ == "__main__":
    main()
