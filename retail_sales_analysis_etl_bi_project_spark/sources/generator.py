"""Declarative synthetic retail-data generator (S7) — the Spark-first
replacement for the reference's row-loop Faker generator
(scripts/generate_data.py:81-263).

The reference builds 250k rows in a single-threaded Python loop; here
every table is a ``spark.range(n)`` plus deterministic column
expressions (seeded rand), so generation parallelizes across the
cluster and scales to billions of rows with zero driver-side loops.
Weighted categorical sampling uses an inverse-CDF ``when``-ladder over
``rand(seed)`` — the same distributions as the reference:

- membership Bronze/Silver/Gold/Platinum 0.5/0.3/0.15/0.05
  (generate_data.py:116-118)
- quantity 1..5 weighted 0.6/0.2/0.1/0.07/0.03 (generate_data.py:243-244)
- discount {0,5,10,15,20,25,30} weighted .65/.1/.08/.07/.05/.03/.02
  (generate_data.py:245-247)
- per-category price ranges (generate_data.py:63-76)
- unit_price = price*(1-disc/100), total = unit*qty, round 2
  (generate_data.py:249-250)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CATEGORIES = [
    ("Electronics", 5000.0, 50000.0),
    ("Home & Kitchen", 500.0, 20000.0),
    ("Fashion", 200.0, 10000.0),
    ("Sports", 300.0, 15000.0),
    ("Toys", 100.0, 5000.0),
    ("Books", 100.0, 2000.0),
    ("Health", 150.0, 8000.0),
    ("Automotive", 500.0, 30000.0),
]
MEMBERSHIP = [("Bronze", 0.5), ("Silver", 0.3), ("Gold", 0.15), ("Platinum", 0.05)]
QUANTITY = [(1, 0.6), (2, 0.2), (3, 0.1), (4, 0.07), (5, 0.03)]
DISCOUNT = [
    (0.0, 0.65), (5.0, 0.1), (10.0, 0.08), (15.0, 0.07),
    (20.0, 0.05), (25.0, 0.03), (30.0, 0.02),
]


def weighted_choice(r: Column, table: list[tuple]) -> Column:
    """Inverse-CDF when-ladder: maps uniform r in [0,1) to the weighted
    categorical distribution. Pure expression — vectorized, codegen'd.

    IMPORTANT: ``r`` must be a *materialized column* (withColumn'd), not
    a bare ``F.rand()`` expression — rand is non-deterministic, so each
    ``when`` branch would re-evaluate it independently and skew the
    distribution (P(branch2) would become P(r2<c2 | r1>=c1))."""
    expr = None
    acc = 0.0
    for value, weight in table[:-1]:
        acc += weight
        expr = (
            F.when(r < acc, F.lit(value))
            if expr is None
            else expr.when(r < acc, F.lit(value))
        )
    return expr.otherwise(F.lit(table[-1][0]))


def gen_customers(spark: SparkSession, n: int = 50_000, seed: int = 42) -> DataFrame:
    base = (
        spark.range(1, n + 1)
        .withColumnRenamed("id", "customer_id")
        .withColumn("r_gender", F.rand(seed))
        .withColumn("r_age", F.rand(seed + 1))
        .withColumn("r_member", F.rand(seed + 2))
    )
    return base.select(
        "customer_id",
        F.concat(F.lit("First"), F.col("customer_id")).alias("first_name"),
        F.concat(F.lit("Last"), F.col("customer_id")).alias("last_name"),
        weighted_choice(
            F.col("r_gender"),
            [("Male", 0.48), ("Female", 0.48), ("Non-binary", 0.03), ("Other", 0.01)],
        ).alias("gender"),
        (F.floor(F.col("r_age") * 68) + 18).cast("int").alias("age"),
        F.concat(F.lit("City"), (F.col("customer_id") % 500)).alias("city"),
        F.concat(F.lit("State"), (F.col("customer_id") % 28)).alias("state"),
        weighted_choice(F.col("r_member"), MEMBERSHIP).alias("membership_level"),
    )


def gen_products(spark: SparkSession, n: int = 50_000, seed: int = 42) -> DataFrame:
    base = (
        spark.range(1, n + 1)
        .withColumnRenamed("id", "product_id")
        .withColumn("r_price", F.rand(seed + 3))
        .withColumn("r_cost", F.rand(seed + 4))
    )
    cat_idx = (F.col("product_id") % len(CATEGORIES)).cast("int")
    category = weighted_choice(
        (cat_idx.cast("double") + F.lit(0.5)) / len(CATEGORIES),
        [(c, 1.0 / len(CATEGORIES)) for c, _, _ in CATEGORIES],
    )
    lo = weighted_choice(
        (cat_idx.cast("double") + F.lit(0.5)) / len(CATEGORIES),
        [(lo, 1.0 / len(CATEGORIES)) for _, lo, _ in CATEGORIES],
    )
    hi = weighted_choice(
        (cat_idx.cast("double") + F.lit(0.5)) / len(CATEGORIES),
        [(hi, 1.0 / len(CATEGORIES)) for _, _, hi in CATEGORIES],
    )
    price = F.round(lo + F.col("r_price") * (hi - lo), 2)
    cost = F.round(price * (F.lit(0.4) + F.col("r_cost") * 0.5), 2)
    return base.select(
        "product_id",
        F.concat(F.lit("Product "), F.col("product_id")).alias("product_name"),
        category.alias("category"),
        F.concat(category, F.lit(" Sub"), (F.col("product_id") % 4)).alias("sub_category"),
        F.concat(F.lit("Brand"), (F.col("product_id") % 8)).alias("brand"),
        price.alias("price"),
        cost.alias("cost"),
        F.concat(F.lit("Color"), (F.col("product_id") % 9)).alias("color"),
        F.element_at(
            F.array(*[F.lit(s) for s in ["XS", "S", "M", "L", "XL", "One Size", "N/A"]]),
            ((F.col("product_id") % 7) + 1).cast("int"),
        ).alias("size"),
    )


def gen_stores(spark: SparkSession, n: int = 5_000, seed: int = 42) -> DataFrame:
    base = (
        spark.range(1, n + 1)
        .withColumnRenamed("id", "store_id")
        .withColumn("r_region", F.rand(seed + 5))
        .withColumn("r_type", F.rand(seed + 6))
    )
    return base.select(
        "store_id",
        F.concat(F.lit("Store "), F.col("store_id")).alias("store_name"),
        F.concat(F.lit("City"), (F.col("store_id") % 500)).alias("city"),
        F.concat(F.lit("State"), (F.col("store_id") % 28)).alias("state"),
        weighted_choice(
            F.col("r_region"),
            [("North", 0.2), ("South", 0.2), ("East", 0.2), ("West", 0.2), ("Central", 0.2)],
        ).alias("region"),
        weighted_choice(
            F.col("r_type"),
            [("Flagship", 0.2), ("Outlet", 0.3), ("Mall", 0.25), ("Online", 0.15), ("Pop-up", 0.1)],
        ).alias("store_type"),
    )


def gen_sales(
    spark: SparkSession,
    products: DataFrame,
    n: int = 250_000,
    n_customers: int = 50_000,
    n_products: int = 50_000,
    n_stores: int = 5_000,
    seed: int = 42,
) -> DataFrame:
    """Fact generator: FK sampling via floor(rand()*N)+1 (dense ids make
    the dim lookup a pure expression — no join needed to sample, one
    broadcast join to fetch the price, mirroring generate_data.py:232's
    price_map dict)."""
    base = (
        spark.range(1, n + 1)
        .withColumnRenamed("id", "sales_id")
        .withColumn("r_qty", F.rand(seed + 7))
        .withColumn("r_disc", F.rand(seed + 8))
        .withColumn("r_cust", F.rand(seed + 9))
        .withColumn("r_prod", F.rand(seed + 10))
        .withColumn("r_store", F.rand(seed + 11))
        .withColumn("r_date", F.rand(seed + 12))
    )
    qty = weighted_choice(F.col("r_qty"), QUANTITY).cast("int")
    disc = weighted_choice(F.col("r_disc"), DISCOUNT)
    sales = base.select(
        "sales_id",
        (F.floor(F.col("r_cust") * n_customers) + 1).cast("bigint").alias("customer_id"),
        (F.floor(F.col("r_prod") * n_products) + 1).cast("bigint").alias("product_id"),
        (F.floor(F.col("r_store") * n_stores) + 1).cast("bigint").alias("store_id"),
        qty.alias("quantity"),
        F.date_format(
            F.date_add(F.to_date(F.lit("2023-09-01")), (F.col("r_date") * 730).cast("int")),
            "d-M-yyyy",
        ).alias("sales_date"),
        disc.alias("discount_pct"),
    )
    priced = sales.join(
        F.broadcast(products.select("product_id", "price")), "product_id", "left"
    )
    unit_price = F.round(F.col("price") * (1 - F.col("discount_pct") / 100), 2)
    return priced.select(
        "sales_id",
        "customer_id",
        "product_id",
        "store_id",
        "quantity",
        "sales_date",
        "discount_pct",
        unit_price.alias("unit_price"),
        F.round(unit_price * F.col("quantity"), 2).alias("total_amount"),
    )
