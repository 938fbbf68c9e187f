"""Exact money arithmetic.

The reference stores money as Oracle NUMBER(p,2) (sql/ddl_oracle.sql:46-47,
82-84) — exact decimal. Spark doubles are NOT a faithful replacement for
aggregation: a distributed sum of doubles is order-dependent, so results
would vary run-to-run and differ from any single-threaded oracle. We
therefore cast money columns to DecimalType before aggregating (exact,
associative, deterministic at any parallelism) and cast the final result
back to double for a compact output schema.

At 100 TB this costs one extra CPU op per row in exchange for
deterministic, reproducible aggregates — the right trade for a BI engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 12 digits / 2 decimal places covers the reference's NUMBER(12,2)
# unit_price (sql/ddl_oracle.sql:82) and TPC-H extendedprice (<= ~5e5,
# 2dp). Kept narrow so decimal-widening in products/sums stays well under
# the 38-digit cap in BOTH Spark and the DuckDB oracle.
MONEY = "decimal(12,2)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def revenue_expr(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """Discounted revenue, the reference's ``unit_price = price*(1-disc)``
    business rule (scripts/generate_data.py:249-250) on TPC-H columns.
    Computed in decimal so aggregation is exact."""
    return dec(price) * (F.lit(1).cast(MONEY) - dec(discount))


def sum_money(col: Column, alias: str) -> Column:
    """Exact decimal SUM, exposed as double. Equivalent DuckDB oracle:
    CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)."""
    return F.sum(col).cast("double").alias(alias)
