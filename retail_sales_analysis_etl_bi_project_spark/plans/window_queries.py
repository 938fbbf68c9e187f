"""Driver-checkable window-function queries. The reference itself uses
no window functions (SURVEY.md §2.8) beyond sequence-based surrogate
keys; these cover the window surface a BI engine needs (top-k per group,
running totals, period-over-period growth) on the driver star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.money import dec, revenue_expr
from ..sources.tables import load_table
from .bi import REVENUE_SQL
from .registry import query


@query(
    "window_top3_parts_per_brand",
    oracle=f"""
    WITH rev AS (
      SELECT p.p_brand AS brand, p.p_name AS product_name,
             CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    )
    SELECT brand, product_name, revenue, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY brand
                                        ORDER BY revenue DESC, product_name) AS INTEGER)
                  AS rank
      FROM rev
    ) WHERE rank <= 3
    ORDER BY brand, rank
    """,
)
def window_top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: top-3 products by revenue within each brand.
    Aggregates first (shrinks to |brand x name|), windows on the small
    aggregate — never window over the raw fact."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_name").alias("product_name"))
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("brand").orderBy(F.desc("revenue"), "product_name")
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .orderBy("brand", "rank")
    )


@query(
    "window_customer_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over order history — explicit ROWS
    frame + unique-key tiebreak so the cumulative is deterministic, and
    exact decimal so partial order doesn't matter."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@query(
    "window_monthly_growth",
    oracle=f"""
    WITH monthly AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS year,
             CAST(month(o.o_orderdate) AS INTEGER) AS month,
             CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    )
    SELECT year, month, revenue,
           revenue - lag(revenue) OVER (ORDER BY year, month) AS growth
    FROM monthly
    ORDER BY year, month
    """,
)
def window_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: lag over the (tiny) monthly
    aggregate. The single-partition window is safe because it runs on
    |months| rows, not the fact."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.year("o_orderdate").alias("year"), F.month("o_orderdate").alias("month")
        )
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
    )
    w = Window.orderBy("year", "month")
    return monthly.select(
        "year",
        "month",
        "revenue",
        (F.col("revenue") - F.lag("revenue").over(w)).alias("growth"),
    ).orderBy("year", "month")
