"""Unit tests for the expression library: exact money math and date
conventions (the two places SURVEY.md §7.3 flags silent-wrongness
risk)."""

from decimal import Decimal

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.functions.dates import (
    date_key,
    weekday_iso,
)
from retail_sales_analysis_etl_bi_project_spark.functions.derived import age_bucket
from retail_sales_analysis_etl_bi_project_spark.functions.money import (
    dec,
    revenue_expr,
    sum_money,
)


def test_sum_money_matches_python_decimal(spark):
    vals = [("19.99",), ("0.01",), ("123456.78",), ("5.55",)]
    df = spark.createDataFrame(vals, "x string")
    got = df.agg(sum_money(dec("x"), "total")).collect()[0].total
    want = float(sum(Decimal(v[0]) for v in vals))
    assert got == want  # exact decimal sum, no float drift


def test_revenue_expr_exact(spark):
    df = spark.createDataFrame([(100.0, 0.05)], "l_extendedprice double, l_discount double")
    got = df.select(revenue_expr().cast("double").alias("r")).collect()[0].r
    assert got == 95.0


def test_date_key_and_weekday(spark):
    df = spark.createDataFrame([("2024-02-29 13:45:00",)], "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    row = df.select(
        date_key("ts").alias("dk"), weekday_iso("ts").alias("wd")
    ).collect()[0]
    assert row.dk == 20240229
    assert row.wd == 4  # 2024-02-29 is a Thursday; ISO 1=Monday


def test_age_bucket_boundaries(spark):
    df = spark.createDataFrame(
        [(18,), (25,), (26,), (45,), (46,), (60,), (61,)], "age int"
    )
    got = [r.b for r in df.select(age_bucket("age").alias("b")).collect()]
    assert got == ["18-25", "18-25", "26-35", "36-45", "46-60", "46-60", "60+"]
