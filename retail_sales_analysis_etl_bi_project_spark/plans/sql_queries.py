"""Spark SQL surface (SURVEY.md §3.2): the flagship queries expressed as
SQL text over registered views, proving the engine answers the
reference's BI path (raw SQL submitted to the warehouse) as well as the
DataFrame path. Same oracles as the DataFrame twins — both must
hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views
from .bi import REVENUE_SQL
from .registry import query

# Spark SQL and DuckDB SQL are close enough on this grammar that one
# string serves as both the engine query and the oracle.
_Q1 = f"""
    SELECT p.p_name AS product_name,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_name
    ORDER BY revenue DESC, product_name
    LIMIT 5
"""

@query("sql_q01_top5_products", oracle=_Q1)
def sql_q01_top5_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docx:q1 via spark.sql — Catalyst parses/plans the same physical
    plan as the DataFrame builder (BroadcastHashJoin + partial agg +
    TakeOrderedAndProject). The single SQL-API parity query: it proves
    the spark.sql path end-to-end; the other flagship shapes are
    verified through their DataFrame builders."""
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q1)
