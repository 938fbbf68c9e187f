"""End-to-end reference-pipeline test: generate reference-shaped data,
run the full ETL (clean -> dims -> fact), answer the four flagship
queries on the engine's own warehouse — the reference's correctness
notion (SURVEY.md §5) executed entirely inside the engine."""

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.functions.derived import age_bucket
from retail_sales_analysis_etl_bi_project_spark.plans.retail_etl import (
    build_warehouse,
    clean_customers,
    clean_products,
    clean_sales,
    clean_stores,
)
from retail_sales_analysis_etl_bi_project_spark.sources.generator import (
    gen_customers,
    gen_products,
    gen_sales,
    gen_stores,
)

N = 2000


def _warehouse(spark):
    customers = gen_customers(spark, N)
    products = gen_products(spark, N)
    stores = gen_stores(spark, N // 10)
    sales = gen_sales(spark, products, N * 5, N, N, N // 10)
    # generator emits typed data; route through cleaning as strings to
    # exercise the full bronze->silver path
    sales_raw = sales.select(*[F.col(c).cast("string") for c in sales.columns])
    return build_warehouse(
        clean_customers(
            customers.select(*[F.col(c).cast("string") for c in customers.columns])
        ),
        clean_products(
            products.select(*[F.col(c).cast("string") for c in products.columns])
        ),
        clean_stores(
            stores.select(*[F.col(c).cast("string") for c in stores.columns])
        ),
        clean_sales(sales_raw),
    )


def test_warehouse_shapes_and_keys(spark):
    wh = _warehouse(spark)
    fact = wh["fact_sales"]
    # both key families present (SURVEY §1.4)
    for c in ["customer_id", "customer_key", "product_key", "store_key", "date_key"]:
        assert c in fact.columns
    # every fact row resolved all surrogate keys (FK-clean generator)
    assert fact.filter(F.col("customer_key").isNull()).count() == 0
    assert fact.filter(F.col("date_key").isNull()).count() == 0
    # dim_date covers exactly the distinct sales days
    assert wh["dim_date"].count() == fact.select("date_key").distinct().count()


def test_flagship_queries_run_on_warehouse(spark):
    wh = _warehouse(spark)
    fact, dim_p, dim_c = wh["fact_sales"], wh["dim_product"], wh["dim_customer"]
    # Q1 top-5 products by revenue (natural-key join, as docx:q1)
    q1 = (
        fact.join(dim_p, "product_id")
        .groupBy("product_name")
        .agg(F.sum("total_amount").alias("revenue"))
        .orderBy(F.desc("revenue"))
        .limit(5)
        .collect()
    )
    assert len(q1) == 5 and q1[0].revenue >= q1[4].revenue
    # Q4 age buckets (docx:q4)
    q4 = (
        fact.join(dim_c, "customer_id")
        .groupBy(age_bucket("age").alias("age_group"))
        .agg(F.sum("total_amount").alias("revenue"))
        .collect()
    )
    groups = {r.age_group for r in q4}
    assert groups <= {"18-25", "26-35", "36-45", "46-60", "60+"}
    assert len(groups) >= 4
