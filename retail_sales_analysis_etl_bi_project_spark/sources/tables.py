"""Parquet star-schema loaders (driver testdata layout, TESTDATA.md).

Replaces the reference's CSV-to-pandas extract step (etl/etl.py:50-58)
with lazy, column-pruned, predicate-pushdown parquet scans. Tables are
the TPC-H-ish mapping of the reference star schema (SURVEY.md §7.0):

    fact_sales     -> lineitem (+ orders for the date/customer axes)
    dim_product    -> part
    dim_customer   -> customer
    dim_store      -> supplier + nation + region
    dim_date       -> derived from o_orderdate (operators.dims.build_dim_date)
    extensions     -> events, documents, embeddings
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one parquet table. Explicit per-table path (no glob)
    so partition discovery cost is zero and pruning is trivial.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    rejects by default; we read it as raw nanos (legacy conf) and
    truncate to a proper microsecond timestamp — the same value DuckDB
    produces when it reads the file."""
    if name == "events":
        from pyspark.sql import functions as F

        from ..session import ensure_nanos_as_long

        ensure_nanos_as_long(spark)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Register each table as a temp view so spark.sql() queries resolve,
    mirroring how the reference's BI queries ran against named Oracle
    tables (SURVEY.md §3.2)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
