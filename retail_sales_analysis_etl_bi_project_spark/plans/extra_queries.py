"""Additional driver-checked queries rounding out the operator surface:

- semi-join membership (J8's positive form; reference isin,
  generate_data.py:299-304)
- derived profit / taxed pricing (P11/P12 business rules,
  README.md:95-98, generate_data.py:249-250)
- TPC-H Q1/Q5 analogs — the classic pricing-summary and
  local-supplier-volume shapes on the driver star schema, exercising
  multi-aggregate scans and a 5-way join chain
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dec
from ..sources.tables import load_table
from .bi import REVENUE_SQL
from .registry import query


@query(
    "join_semi_active_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one finished order —
    the membership test the reference did with isin (J8). Semi joins
    never duplicate or widen rows; Spark builds the hash table on the
    (filtered, pre-projected) orders side."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return customer.join(finished, "c_custkey", "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM((CAST(l_extendedprice AS DECIMAL(12,2)) *
                     (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) *
                    (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))
                AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-scan multi-aggregate with a pushed-down
    date filter — the canonical columnar-scan + partial-agg benchmark.
    All sums exact decimal; averages = exact sum / exact count.

    Fact at cluster width before the decimal multi-aggregate (r16 —
    see plans/bi.py q02). The date predicate still reaches the scan:
    Catalyst pushes filters through RepartitionByExpression (verified
    in plans/r16/tpch_q1_pricing_summary_after.txt PushedFilters)."""
    from ..sources.tables import load_fact_wide

    lineitem = load_fact_wide(spark, sf_dir, "lineitem", "l_orderkey")
    one = F.lit(1).cast("decimal(12,2)")
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price * (one + dec("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    ORDER BY revenue DESC
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join chain with a cross-dimension equality
    (customer nation == supplier nation) and a region filter. The fact
    shuffles once (for the orders join under the broadcast threshold it
    doesn't shuffle at all); all dims broadcast; the region filter
    prunes the nation broadcast before it reaches the fact."""
    from ..functions.money import revenue_expr

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")

    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"))
    )
