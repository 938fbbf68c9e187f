"""Skew-handling operators for hot keys at 100 TB.

AQE's skew-join handling covers joins; for *aggregations* over a hot
key (one customer with 10^9 events, one dup-cluster with 10^6 docs),
the classic fix is two-phase salted aggregation: spray each key across
``salts`` sub-keys, partially aggregate, then combine. The result is
identical to the plain groupBy (the aggregate must be decomposable —
sum/count/min/max), but no single task ever sees a whole hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value: Column,
    salts: int = 16,
    sum_alias: str = "total",
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase SUM/COUNT: groupBy(keys + random salt) -> partial
    sums -> groupBy(keys) -> final. Hot keys split across ``salts``
    tasks in phase one; phase two moves only |keys| x salts rows.

    The salt is rand-based (non-deterministic) but the RESULT is
    deterministic because decimal/long sums are associative — this is
    exactly why money math uses decimals (functions/money.py)."""
    salt = (F.rand() * salts).cast("int").alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.sum(value).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_psum").alias(sum_alias),
        F.sum("_pcnt").alias(count_alias),
    )
