"""Generator parity tests (S7): distributions and invariants from
scripts/generate_data.py + data/validation_report.txt, validated with
the engine's own audit operators (A7/A8/J8) — the reference's
validation-report mechanism reproduced on engine-generated data."""

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.dims import (
    fk_violations,
    null_audit,
)
from retail_sales_analysis_etl_bi_project_spark.sources.generator import (
    gen_customers,
    gen_products,
    gen_sales,
    gen_stores,
)

N = 5000


def test_row_counts_and_no_nulls(spark):
    customers = gen_customers(spark, N)
    products = gen_products(spark, N)
    sales = gen_sales(spark, products, N * 5, N, N, N // 10)
    assert customers.count() == N
    assert products.count() == N
    assert sales.count() == N * 5
    audit = null_audit(customers).collect()[0]
    assert all(v == 0 for v in audit.asDict().values())


def test_fk_integrity_zero_violations(spark):
    products = gen_products(spark, N)
    customers = gen_customers(spark, N)
    stores = gen_stores(spark, N // 10)
    sales = gen_sales(spark, products, N * 5, N, N, N // 10)
    rep = fk_violations(
        sales,
        [
            (customers, "customer_id", "customer_id", "bad_customer", True),
            (products, "product_id", "product_id", "bad_product", True),
            (stores, "store_id", "store_id", "bad_store", True),
        ],
    ).collect()[0]
    assert all(v == 0 for v in rep.asDict().values())


def test_business_rules_hold(spark):
    products = gen_products(spark, N)
    sales = gen_sales(spark, products, N * 2, N, N, N // 10)
    # cost < price (etl.py:74 invariant holds at generation time)
    assert products.filter(F.col("cost") >= F.col("price")).count() == 0
    # quantity in 1..5, discount in the weighted set
    assert sales.filter(~F.col("quantity").between(1, 5)).count() == 0
    # unit_price = price*(1-disc/100) round 2 (generate_data.py:249)
    joined = sales.join(products.select("product_id", "price"), "product_id")
    bad = joined.filter(
        F.abs(
            F.col("unit_price")
            - F.round(F.col("price") * (1 - F.col("discount_pct") / 100), 2)
        )
        > 0.011
    )
    assert bad.count() == 0


def test_weighted_quantity_distribution(spark):
    products = gen_products(spark, 100)
    sales = gen_sales(spark, products, 50_000, 100, 100, 10)
    dist = {
        r.quantity: r.cnt
        for r in sales.groupBy("quantity").agg(F.count("*").alias("cnt")).collect()
    }
    total = sum(dist.values())
    assert abs(dist[1] / total - 0.6) < 0.02
    assert abs(dist[2] / total - 0.2) < 0.02
