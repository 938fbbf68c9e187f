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
    # fact at cluster width before the join+decimal pass (r16, guide
    # §2.2/§2.5 — see plans/bi.py q02; decimal sums associative)
    from ..sources.tables import load_fact_wide

    lineitem = load_fact_wide(spark, sf_dir, "lineitem", "l_orderkey")
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
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
           CAST(CAST(o_totalprice AS DECIMAL(12,2))
                - lag(CAST(o_totalprice AS DECIMAL(12,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS DOUBLE) AS order_growth
    FROM orders
    """,
)
def window_customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total AND order-over-order growth per customer — the two
    window-frame families (cumulative ROWS frame + lag offset) over one
    shared per-customer window, so the round-2 window_monthly_growth
    slot could merge in here without losing lag/growth hash evidence
    (and at the per-key grain, which is the shape that actually
    stresses a cluster — a months-grain lag runs on ~80 rows). Explicit
    ROWS frame + unique-key tiebreak keep the cumulative deterministic;
    exact decimal keeps it partition-order-independent."""
    orders = load_table(spark, sf_dir, "orders")
    order = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    price = dec("o_totalprice")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(price).over(w).cast("double").alias("running_total"),
        (price - F.lag(price).over(order)).cast("double").alias("order_growth"),
    )
