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
    clean_sales,
    clean_stores,
    save_warehouse,
)
from .session import get_spark
from .sources.csv import read_raw_csv, write_staging
from .sources.generator import gen_customers, gen_products, gen_sales, gen_stores


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", help="dir with reference-shaped raw CSVs")
    ap.add_argument("--out", default="./warehouse", help="output base dir")
    ap.add_argument("--rows", type=int, default=50_000, help="generator base rows")
    args = ap.parse_args(argv)

    spark = get_spark("retail-etl")

    if args.data_dir:
        raw = {
            t: read_raw_csv(spark, f"{args.data_dir}/{t}.csv", t)
            for t in ("customers", "products", "stores", "sales")
        }
    else:
        n = args.rows
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

    cleaned = {
        "customers": clean_customers(raw["customers"]),
        "products": clean_products(raw["products"]),
        "stores": clean_stores(raw["stores"]),
        "sales": clean_sales(raw["sales"]),
    }
    for t, df in cleaned.items():
        write_staging(df, f"{args.out}/staging/stg_{t}")

    wh = build_warehouse(
        cleaned["customers"], cleaned["products"], cleaned["stores"], cleaned["sales"]
    )
    save_warehouse(wh, f"{args.out}/gold")

    report = validation_report(
        cleaned,
        fact_name="sales",
        fk_map=[
            ("customers", "customer_id"),
            ("products", "product_id"),
            ("stores", "store_id"),
        ],
    )
    write_validation_report(f"{args.out}/validation_report.txt", report)
    print(report)


if __name__ == "__main__":
    main()
