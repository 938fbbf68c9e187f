"""Salted-aggregation tests: result identical to plain groupBy
regardless of the random salt."""

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.skew import (
    salted_sum_count,
)


def test_salted_equals_plain_groupby(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("k"), F.col("id").cast("decimal(12,2)").alias("v")
    )
    plain = {
        r.k: (r.total, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r.k: (r.total, r.n)
        for r in salted_sum_count(df, ["k"], F.col("v"), salts=8).collect()
    }
    assert plain == salted  # associative decimal sums: salt-invariant


def test_salted_runs_repeatedly_same_result(spark):
    df = spark.range(0, 5_000).select(
        F.lit("hot").alias("k"), F.lit(1).cast("decimal(10,2)").alias("v")
    )
    r1 = salted_sum_count(df, ["k"], F.col("v")).collect()[0]
    r2 = salted_sum_count(df, ["k"], F.col("v")).collect()[0]
    assert (r1.total, r1.n) == (r2.total, r2.n) == (5000, 5000)
