"""Unit tests for the silver cleaning rules (P3-P10) with the
coerce-to-null edge cases SURVEY.md §7.3 flags as risks."""

import datetime

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.functions.cleaning import (
    between_filter,
    coerce_date_dayfirst,
    coerce_numeric,
    fill_nulls,
    trim_cols,
)
from retail_sales_analysis_etl_bi_project_spark.plans.retail_etl import (
    clean_customers,
    clean_products,
    clean_sales,
)


def test_coerce_numeric_invalid_to_null(spark):
    """pandas to_numeric(errors='coerce') parity: garbage -> NULL."""
    df = spark.createDataFrame(
        [("1",), ("2.5",), ("abc",), (" 3 ",), ("",), (None,), ("1e2",)],
        "x string",
    )
    out = coerce_numeric(df, {"x": "double"})
    vals = [r.x for r in out.collect()]
    assert vals == [1.0, 2.5, None, 3.0, None, None, 100.0]


def test_coerce_date_dayfirst(spark):
    """d-M-yyyy dayfirst parse: 05-09-2024 is 5 Sep; garbage -> NULL;
    non-zero-padded accepted (reference writes %d-%m-%Y)."""
    df = spark.createDataFrame(
        [("05-09-2024",), ("5-9-2024",), ("31-12-2023",), ("2024-01-01",), ("junk",)],
        "sales_date string",
    )
    out = coerce_date_dayfirst(df, "sales_date")
    vals = [r.sales_date for r in out.collect()]
    assert vals[0] == datetime.datetime(2024, 9, 5)
    assert vals[1] == datetime.datetime(2024, 9, 5)
    assert vals[2] == datetime.datetime(2023, 12, 31)
    assert vals[3] is None  # wrong format -> NULL, not error
    assert vals[4] is None


def test_between_filter_age_bounds(spark):
    df = spark.createDataFrame([(17,), (18,), (100,), (101,), (None,)], "age int")
    kept = [r.age for r in df.filter(between_filter("age", 18, 100)).collect()]
    assert kept == [18, 100]  # NULL age dropped, matching pandas boolean mask


def test_trim_and_fill(spark):
    df = spark.createDataFrame([("  a  ", None), ("b", 5.0)], "name string, d double")
    out = fill_nulls(trim_cols(df, "name"), {"d": 0.0})
    rows = out.collect()
    assert rows[0].name == "a" and rows[0].d == 0.0
    assert rows[1].name == "b" and rows[1].d == 5.0


def test_clean_customers_rules(spark):
    df = spark.createDataFrame(
        [
            ("1", " Asha ", " Rao ", "Female", "30", "c", "s", "Gold"),
            ("2", "Bad", "Age", "Male", "17", "c", "s", "Bronze"),
            ("3", "Not", "Number", "Other", "x", "c", "s", "Silver"),
        ],
        "customer_id string, first_name string, last_name string, gender string,"
        "age string, city string, state string, membership_level string",
    )
    out = clean_customers(df).collect()
    assert len(out) == 1
    assert out[0].first_name == "Asha" and out[0].age == 30


def test_clean_products_cost_lt_price_and_size(spark):
    df = spark.createDataFrame(
        [
            ("1", "P1", "Electronics", "Tablet", "B", "100.0", "60.0", "Red", "M"),
            ("2", "P2", "Toys", "Car", "B", "50.0", "70.0", "Blue", "L"),
        ],
        "product_id string, product_name string, category string, sub_category string,"
        "brand string, price string, cost string, color string, size_ string",
    )
    out = clean_products(df)
    assert "size" in out.columns and "size_" not in out.columns
    rows = out.collect()
    assert [r.product_id for r in rows] == [1]


def test_clean_sales_rules(spark):
    df = spark.createDataFrame(
        [
            ("1", "1", "1", "1", "2", "15-06-2024", None, "10.0", "20.0"),
            ("2", "1", "1", "1", "0", "15-06-2024", "5", "10.0", "0.0"),
            ("3", "1", "1", "1", "1", "not-a-date", "5", "10.0", "10.0"),
        ],
        "sales_id string, customer_id string, product_id string, store_id string,"
        "quantity string, sales_date string, discount_pct string, unit_price string,"
        "total_amount string",
    )
    rows = clean_sales(df).collect()
    assert len(rows) == 1  # qty=0 dropped, bad date dropped
    assert rows[0].discount_pct == 0.0  # null -> 0 fill
