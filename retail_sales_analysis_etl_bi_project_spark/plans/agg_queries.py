"""Aggregate-surface extensions beyond the reference (which only has
plain GROUP BY sums — SURVEY.md §2.4): hierarchical ROLLUP totals and
exact percentiles, both oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import (
    fixed_point_final,
    fixed_point_partial,
    fixed_point_sum_sql,
    revenue_expr,
)
from ..sources.tables import load_table
from .bi import REVENUE_SQL
from .registry import banded_oracle, query


@query(
    "agg_rollup_year_month",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS year,
           CAST(month(o.o_orderdate) AS INTEGER) AS month,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY ROLLUP(1, 2)
    ORDER BY 1, 2
    """,
)
def agg_rollup_year_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(year, month): monthly rows + yearly subtotals + grand
    total. The BI 'drill-up' companion to q02.

    Two-phase shape: Spark implements rollup as Expand (one copy of
    every input row per grouping set), so rolling up the raw join
    output triples the rows entering the aggregate's shuffle — at
    100 TB that's the dominant cost. Instead a plain groupBy(year,
    month) collapses the join first (partial-aggregated, fixed-width),
    and the rollup's Expand runs over the ~#months-sized aggregate.
    Decimal sums are associative, so sum-of-monthly-sums is exactly the
    one-pass value the DuckDB twin computes."""
    # fact at cluster width before the join+decimal pass (r16, guide
    # §2.2/§2.5 — see plans/bi.py q02; decimal sums associative)
    from ..sources.tables import load_fact_wide

    lineitem = load_fact_wide(spark, sf_dir, "lineitem", "l_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
        )
        .agg(F.sum(revenue_expr()).alias("_rev"))
    )
    return (
        monthly.rollup("year", "month")
        .agg(F.sum("_rev").cast("double").alias("revenue"))
        .orderBy("year", "month")
    )


@query(
    "agg_order_value_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def agg_order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles of order value per priority class. Spark
    ``percentile`` and DuckDB ``quantile_cont`` both use linear
    interpolation over the sorted multiset -> identical doubles. (At
    100 TB use agg_order_value_percentiles_approx — exact percentile
    sorts per group.)"""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
            F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@query("agg_sketch_profile")  # sketch-based -> rows-only
def agg_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The honest 100 TB approximate-aggregation path, both sketches in
    one single-pass groupBy:

    - approx_percentile (KLL-style): a bounded-memory mergeable sketch
      per group — no per-group sort; partial sketches merge map-side
      like any aggregate.
    - approx_count_distinct (HyperLogLog++, rsd=1%): fixed-memory
      map-side-mergeable distinct counts, versus exact distinct's full
      shuffle of every key.

    DuckDB's sketch implementations differ, so no hash oracle; accuracy
    vs the exact variants (agg_order_value_percentiles / the exact
    distinct in k_core_kpis) is tolerance-checked in
    tests/test_agg_approx.py (driver applies the rows-only check)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p50"),
            F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)).alias("p90"),
            F.approx_percentile("o_totalprice", F.lit(0.99), F.lit(10000)).alias("p99"),
            F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# Tolerance-banded exact twin (r11 VERDICT item 5): DuckDB computes
# the EXACT per-priority percentiles (quantile_disc — element-valued,
# like Spark's approx_percentile) and exact distinct customers; the
# gate checks the sketch values land inside the documented bands.
# Bands: approx_percentile at accuracy=10000 guarantees rank error
# <= n/10000 — on this smooth price distribution a 2% relative VALUE
# band is generous at every test SF; approx_count_distinct at rsd=1%
# gets a 5-sigma 5% band. Keys and the exact n_orders must match
# exactly.
banded_oracle(
    "agg_sketch_profile",
    """
    SELECT o_orderpriority,
           CAST(quantile_disc(o_totalprice, 0.5) AS DOUBLE) AS p50,
           CAST(quantile_disc(o_totalprice, 0.9) AS DOUBLE) AS p90,
           CAST(quantile_disc(o_totalprice, 0.99) AS DOUBLE) AS p99,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS approx_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
    {
        "p50": ("rel", 0.02),
        "p90": ("rel", 0.02),
        "p99": ("rel", 0.02),
        "approx_customers": ("rel", 0.05),
    },
)


@query(
    "agg_incremental_kpi_merge",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
           CAST(month(o_orderdate) AS INTEGER) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {fixed_point_sum_sql('o_totalprice')} AS revenue
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def agg_incremental_kpi_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-KPI maintenance: the monthly revenue
    KPI computed as merge(partial(history), partial(new arrivals))
    instead of a full recompute — the shape a daily 100 TB pipeline
    needs (re-aggregate ONLY the newly landed partition; the history's
    partials are a stored table read back at delta size, not fact
    size).

    Exactness is the point being proven: counts and fixed-point revenue
    accumulators are ALGEBRAIC aggregates (integer sums), so any
    regrouping merges to bit-identical results — the DuckDB oracle does
    the one-pass full recompute and must hash-match the merged path.
    Non-algebraic KPIs (exact distinct customers) deliberately do NOT
    appear here: they don't merge; at scale they go through sketch
    merge (agg_sketch_profile's HLL) or a dedicated distinct pipeline.

    The history/delta split is simulated by date — deliberately
    MID-month (< 2001-01-15 vs the rest), so the January-2001 group
    genuinely receives partials from BOTH branches and the hash match
    exercises a real merge, not a disjoint union of groups. Both
    branches prune on the same scan, and each partial aggregate is
    map-side-combined before its shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit("2001-01-15").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
        ).agg(
            F.count(F.lit(1)).alias("_n"),
            fixed_point_partial("o_totalprice").alias("_acc"),
        )

    # The split must be TOTAL: `< split` / `~(< split)` would both drop
    # a NULL o_orderdate (three-valued logic), losing the (NULL, NULL)
    # group the oracle's plain GROUP BY keeps. NULL dates ride the
    # delta branch via an explicit isNull arm — an Or(IsNull, Gteq)
    # parquet still pushes.
    hist = partial(orders.filter(F.col("o_orderdate") < split))
    delta = partial(
        orders.filter(
            F.col("o_orderdate").isNull() | (F.col("o_orderdate") >= split)
        )
    )
    return (
        hist.unionByName(delta)
        .groupBy("year", "month")
        .agg(
            F.sum("_n").alias("n_orders"),
            fixed_point_final("_acc").alias("revenue"),
        )
        .orderBy("year", "month")
    )


@query("agg_incremental_distinct_hll")  # sketch family: no SQL twin —
# DuckDB's HLL isn't parameter- or merge-compatible with DataSketches;
# correctness is pinned by tests/test_agg_approx.py instead (merged
# sketches == one-pass sketches EXACTLY, and within tolerance of exact)
def agg_incremental_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per month maintained INCREMENTALLY — the
    non-algebraic companion to agg_incremental_kpi_merge: exact
    COUNT(DISTINCT) does not merge across a history/delta split (the
    same customer may appear in both), which is precisely why
    agg_incremental_kpi_merge excludes it. HLL sketches restore the
    algebra: per-register max commutes and is idempotent, so
    union(sketch(history), sketch(delta)) is BIT-IDENTICAL to
    sketch(all) — a replayed delta can't even double-count. At 100 TB
    the stored partials are one ~KB sketch per (year, month) instead
    of a distinct shuffle over the fact.

    Spark-first: the built-in DataSketches HLL aggregates
    (hll_sketch_agg / hll_union_agg / hll_sketch_estimate), all
    JVM-side, partial-aggregated before the shuffle like any agg."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit("2001-01-15").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
        ).agg(F.hll_sketch_agg("o_custkey").alias("_sk"))

    hist = partial(orders.filter(F.col("o_orderdate") < split))
    delta = partial(
        orders.filter(
            F.col("o_orderdate").isNull() | (F.col("o_orderdate") >= split)
        )
    )
    return (
        hist.unionByName(delta)
        .groupBy("year", "month")
        .agg(F.hll_union_agg("_sk").alias("_sk"))
        .select(
            "year",
            "month",
            F.hll_sketch_estimate("_sk").alias("n_customers_approx"),
        )
        .orderBy("year", "month")
    )


# Tolerance-banded exact twin (r11 VERDICT item 5): the union of the
# history/delta branches is the whole orders table, so the exact
# per-month distinct is one plain aggregate; DataSketches HLL at the
# default lgK=12 has rse ~0.8% — a 5% band is >5 sigma. NULL months
# group as NULL on both engines. The estimate is the only banded
# column; year/month keys must match exactly.
banded_oracle(
    "agg_incremental_distinct_hll",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
           CAST(month(o_orderdate) AS INTEGER) AS month,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers_approx
    FROM orders
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    {"n_customers_approx": ("rel", 0.05)},
)
