"""Reference-shaped CSV sources/sinks (S1/S2, etl/etl.py:50-58,127-137).

The reference reads raw CSVs with inferred dtypes and coerces after; we
read everything as string with an explicit StructType (deterministic —
no inference), and the silver cleaning layer does the coercing with
try_cast (functions/cleaning.py), reproducing pandas errors='coerce'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# Raw schemas: all strings at the bronze edge (coercion is a cleaning
# rule, not a scan property). Column lists from FIXTURES.md §1 /
# reference data/*.csv headers.
RAW_COLUMNS = {
    "customers": [
        "customer_id", "first_name", "last_name", "gender", "age",
        "city", "state", "membership_level",
    ],
    "products": [
        "product_id", "product_name", "category", "sub_category", "brand",
        "price", "cost", "color", "size",
    ],
    "stores": ["store_id", "store_name", "city", "state", "region", "store_type"],
    "sales": [
        "sales_id", "customer_id", "product_id", "store_id", "quantity",
        "sales_date", "discount_pct", "unit_price", "total_amount",
    ],
}


def raw_schema(table: str) -> StructType:
    schema = StructType()
    for c in RAW_COLUMNS[table]:
        schema = schema.add(c, "string")
    return schema


def read_raw_csv(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Bronze CSV scan: header row, explicit all-string schema, quoted
    fields (store names contain commas — FIXTURES.md §1.3)."""
    return (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .schema(raw_schema(table))
        .csv(path)
    )


def write_staging(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Silver sink (reference wrote stg_*.csv — etl/etl.py:127-137).
    Parquet by default (columnar, splittable, stats for data skipping);
    CSV kept for byte-level reference parity; JSON lines for systems
    that exchange newline-delimited JSON (each partition writes its own
    .json part file — splittable line-oriented text, same scale story
    as CSV)."""
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        writer.parquet(path)
