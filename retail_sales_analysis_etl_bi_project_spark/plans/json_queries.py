"""JSON/Map-typed queries over events.props (SURVEY.md §1.2: the props
JSON string exercises from_json -> MapType), plus deterministic
moment-based statistics (variance from exact decimal sums — a
distributed stddev that equals the single-threaded oracle bit-for-bit,
which float-accumulator stddev_samp cannot guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, LongType

from ..sources.tables import load_table
from .registry import query


@query(
    "events_json_and_moments",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           CAST(COUNT(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                           THEN 1 END) AS BIGINT) AS k_present,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean,
           ROUND((CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
                 AS DOUBLE)
            - CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
              * CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
           / (COUNT(*) - 1), 6) AS variance
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_json_and_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction + deterministic statistics in ONE
    single-pass groupBy over events:

    - from_json -> MapType: props parsed once into map<string,bigint>,
      key looked up with element_at (NULL when absent — same as JSON
      path extraction), summed and presence-counted per type.
    - sample variance via exact decimal moments: sum and sum-of-squares
      aggregate exactly, then one fixed sequence of double ops. A plain
      stddev_samp over doubles is partition-order-dependent; this
      formulation is deterministic at any parallelism (the same reason
      money sums use decimals). The final variance is rounded to 6dp:
      the s2 - s1^2/n subtraction cancels ~6 digits, surfacing a 1-ulp
      engine difference (FMA contraction) that rounding absorbs.
    """
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn(
        "props_map", F.from_json("props", MapType(StringType(), LongType()))
    )
    k = F.element_at("props_map", F.lit("k"))
    v = F.col("value").cast("decimal(18,6)")
    n = F.count(F.lit(1))
    s1 = F.sum(v).cast("double")
    s2 = F.sum(v * v).cast("double")
    return (
        parsed.groupBy("event_type")
        .agg(
            F.sum(k).alias("k_sum"),
            F.count(k).alias("k_present"),
            n.alias("n"),
            (s1 / n).alias("mean"),
            F.round((s2 - s1 * s1 / n) / (n - F.lit(1)), 6).alias("variance"),
        )
        .orderBy("event_type")
    )
