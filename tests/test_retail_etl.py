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


def test_clean_sales_observed_counts_in_flight(spark):
    """observe() counters must equal the re-aggregated truth: the drop
    count (raw - clean), the surviving NULL coercions, and the null-fill
    count — all collected during ONE action, no second scan."""
    from retail_sales_analysis_etl_bi_project_spark.plans.retail_etl import (
        clean_sales,
        clean_sales_observed,
    )

    raw = spark.createDataFrame(
        [
            # sales_id, customer_id, product_id, store_id, quantity,
            # sales_date(d-M-yyyy), discount_pct, unit_price, total_amount
            ("1", "10", "20", "30", "2", "5-3-2024", "0.1", "9.99", "19.98"),
            ("2", "11", "21", "31", "1", "6-3-2024", "0.0", "5.00", "5.00"),   # GENUINE 0.0, kept
            ("3", "12", "22", "32", "1", "not-a-date", "0.2", "4.00", "4.00"), # bad date -> dropped
            ("4", "13", "23", "33", "3", "7-3-2024", None, "2.00", "6.00"),    # discount filled
            ("5", "14", "24", "34", "1", "8-3-2024", "0.3", "1.00", "oops"),   # amount -> NULL, kept
            ("6", "15", "25", "35", "0", "9-3-2024", None, "5.00", "0.00"),    # qty=0 -> dropped
        ],
        "sales_id string, customer_id string, product_id string, store_id string, "
        "quantity string, sales_date string, discount_pct string, unit_price string, "
        "total_amount string",
    )
    cleaned, obs_in, obs_out = clean_sales_observed(raw)
    n_clean_action = cleaned.count()  # the ONE action that fires both observations

    assert obs_in.get == {"n_raw": 6}
    got = obs_out.get
    assert n_clean_action == got["n_clean"] == 4
    assert got["n_null_amount"] == 1     # 'oops' coerced to NULL, row kept
    # ONLY the surviving null (row 4): row 2's genuine 0.0 must NOT be
    # counted as a fill, and dropped row 6's null never reaches the
    # counter (observed pre-fill, post-filter — r5 review finding)
    assert got["n_discount_filled"] == 1
    # and the counters equal the re-aggregated truth
    truth = clean_sales(raw)
    assert truth.count() == 4
    assert truth.filter("total_amount IS NULL").count() == 1
    assert truth.filter("discount_pct = 0.0").count() == 2  # genuine + filled
