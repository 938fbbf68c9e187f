"""The complete reference ETL pipeline (etl/etl.py end-to-end), rebuilt
as lazy DataFrame plans over reference-shaped data: raw -> cleaned
silver -> star-schema gold. Where the reference eagerly materialized
five pandas frames and shipped them to Oracle in 5k-row chunks, this
builds one Catalyst plan per output table and lets Spark execute it
distributed.

clean_* functions reproduce etl/etl.py:63-104 rule-for-rule; the
warehouse build reproduces etl/etl.py:109-122 (dim_date),
:251-306 (dims + fact with surrogate keys). Fact keeps natural AND
surrogate keys (SURVEY.md §1.4 inconsistency resolved by carrying both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import (
    between_filter,
    coerce_date_dayfirst,
    coerce_numeric,
    fill_nulls,
    trim_cols,
)
from ..operators.dims import assemble_fact, build_dim_date, with_surrogate_key


def clean_customers(df: DataFrame) -> DataFrame:
    """etl/etl.py:63-68: trim names, coerce age, keep 18<=age<=100."""
    df = trim_cols(df, "first_name", "last_name")
    df = coerce_numeric(df, {"customer_id": "bigint", "age": "bigint"})
    return df.filter(between_filter("age", 18, 100))


def clean_products(df: DataFrame) -> DataFrame:
    """etl/etl.py:71-80: coerce price/cost, keep cost<price, accept the
    reference's size_ rename on input but keep `size` externally
    (SURVEY.md §1.4)."""
    if "size_" in df.columns:
        df = df.withColumnRenamed("size_", "size")
    df = coerce_numeric(
        df, {"product_id": "bigint", "price": "double", "cost": "double"}
    )
    return df.filter(F.col("cost") < F.col("price"))


def clean_stores(df: DataFrame) -> DataFrame:
    """etl/etl.py:82-84: trim store names."""
    df = coerce_numeric(df, {"store_id": "bigint"})
    return trim_cols(df, "store_name")


def clean_sales(df: DataFrame) -> DataFrame:
    """etl/etl.py:86-99: parse d-M-yyyy dayfirst (invalid -> drop),
    coerce numerics (invalid -> NULL), quantity>0, discount null->0."""
    return fill_nulls(_clean_sales_prefill(df), {"discount_pct": 0.0})


def _clean_sales_prefill(df: DataFrame) -> DataFrame:
    """clean_sales minus the final discount null-fill — split out so the
    observed variant can count the to-be-filled nulls BEFORE the fill
    erases them (a post-fill count of 0.0s would also count genuine
    zero discounts)."""
    df = coerce_date_dayfirst(df, "sales_date")
    df = df.filter(F.col("sales_date").isNotNull())
    df = coerce_numeric(
        df,
        {
            "sales_id": "bigint",
            "customer_id": "bigint",
            "product_id": "bigint",
            "store_id": "bigint",
            "quantity": "bigint",
            "discount_pct": "double",
            "unit_price": "double",
            "total_amount": "double",
        },
    )
    return df.filter(F.col("quantity") > 0)


def clean_sales_observed(df: DataFrame):
    """clean_sales with IN-FLIGHT data-quality counters: the reference
    audits quality with a second aggregation pass (etl/etl.py's count
    checks; our etl_quality_audit twin), which at 100 TB is a second
    full scan. ``df.observe`` attaches the counters to the cleaning
    plan itself — Spark accumulates them DURING whatever action first
    executes the plan (the silver write), so the audit costs zero extra
    passes and zero shuffles.

    Returns (cleaned_df, input_obs, output_obs). After the first action
    on cleaned_df:
      input_obs.get  -> {'n_raw': rows entering the silver stage}
      output_obs.get -> {'n_clean': rows surviving all filters,
                         'n_null_amount': total_amount coercion
                         failures that survived (audited, not dropped),
                         'n_discount_filled': discounts null-filled to 0}
    The drop count is n_raw - n_clean — the reference's headline
    quality number — derived without ever re-scanning."""
    from pyspark.sql import Observation

    input_obs = Observation("sales_silver_in")
    df = df.observe(input_obs, F.count(F.lit(1)).alias("n_raw"))
    pre = _clean_sales_prefill(df)
    output_obs = Observation("sales_silver_out")
    # observed BEFORE the null-fill: n_discount_filled counts exactly
    # the rows the fill will touch — counting 0.0s after the fill would
    # also count genuine zero discounts (r5 review finding)
    pre = pre.observe(
        output_obs,
        F.count(F.lit(1)).alias("n_clean"),
        F.count(F.when(F.col("total_amount").isNull(), 1)).alias("n_null_amount"),
        F.count(F.when(F.col("discount_pct").isNull(), 1)).alias("n_discount_filled"),
    )
    return fill_nulls(pre, {"discount_pct": 0.0}), input_obs, output_obs


def build_warehouse(
    customers: DataFrame,
    products: DataFrame,
    stores: DataFrame,
    sales: DataFrame,
) -> dict[str, DataFrame]:
    """Full gold build (etl/etl.py:109-122, 251-306): four dims with
    surrogate keys, dim_date from distinct sales days, fact with
    broadcast key lookups carrying both key families."""
    dim_customer = with_surrogate_key(customers, "customer_id", "customer_key")
    dim_product = with_surrogate_key(products, "product_id", "product_key")
    dim_store = with_surrogate_key(stores, "store_id", "store_key")
    dim_date = build_dim_date(sales, "sales_date")

    fact = sales.withColumn("date_key_nat", F.to_date("sales_date"))
    fact = assemble_fact(
        fact,
        [
            (dim_customer, "customer_id", "customer_key"),
            (dim_product, "product_id", "product_key"),
            (dim_store, "store_id", "store_key"),
            (
                dim_date.withColumnRenamed("calendar_date", "date_key_nat"),
                "date_key_nat",
                "date_key",
            ),
        ],
    )
    fact_sales = fact.select(
        "sales_id",
        # natural keys (docx queries join on these — SURVEY §1.4)
        "customer_id", "product_id", "store_id",
        # surrogate keys (DDL fact uses these — sql/ddl_oracle.sql:77-80)
        "customer_key", "product_key", "store_key", "date_key",
        "quantity", "unit_price", "discount_pct", "total_amount",
    )
    return {
        "dim_customer": dim_customer,
        "dim_product": dim_product,
        "dim_store": dim_store,
        "dim_date": dim_date,
        "fact_sales": fact_sales,
    }


def save_warehouse(tables: dict[str, DataFrame], base_path: str) -> None:
    """Gold sink: fact partitioned by month prefix of date_key so
    date-range queries prune partitions (replaces the reference's FK
    indexes — SURVEY.md §4); dims unpartitioned (small)."""
    for name, df in tables.items():
        writer = df.write.mode("overwrite")
        if name == "fact_sales":
            writer = (
                df.withColumn("month_key", (F.col("date_key") / 100).cast("int"))
                .write.mode("overwrite")
                .partitionBy("month_key")
            )
        writer.parquet(f"{base_path}/{name}")
