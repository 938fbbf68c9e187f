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
    WITH fp AS (
      SELECT event_type, props,
             CAST(ROUND(value * 1000000.0) AS DECIMAL(12,0)) AS vi
      FROM events
    )
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           CAST(COUNT(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                           THEN 1 END) AS BIGINT) AS k_present,
           CAST(SUM(COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0))
                AS BIGINT) AS k_filled_sum,
           CAST(SUM(COALESCE(TRY_CAST(json_extract_string(props, '$.missing') AS DOUBLE),
                             0.0)) AS DOUBLE) AS missing_filled_sum,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(vi) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean,
           ROUND((CAST(SUM(vi * vi) AS DOUBLE) / 1000000000000.0
            - (CAST(SUM(vi) AS DOUBLE) / 1000000.0)
              * (CAST(SUM(vi) AS DOUBLE) / 1000000.0) / COUNT(*))
           / (COUNT(*) - 1), 6) AS variance
    FROM fp
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
    - P7 lossy numeric cast + P9 null-fill (the round-2
      etl_coerce_numeric slot, merged here — same events scan): the JSON
      path is try_cast to number (absent/invalid -> NULL) and
      coalesce-filled before summing. k_filled_sum exercises the filled
      bigint path; missing_filled_sum coerces a key that never exists,
      so the fill value is what survives (exact 0.0 sum — order-safe).
    - sample variance via exact fixed-point moments: value is quantized
      to micro-units in double arithmetic (round(v*1e6) — identical
      in both engines, see functions.money.fixed_point_sum),
      then sum and sum-of-squares aggregate exactly in decimal and one
      fixed sequence of double ops finishes. A plain stddev_samp over
      doubles is partition-order-dependent; this formulation is
      deterministic at any parallelism AND avoids the cross-engine
      double->decimal cast rounding. The final variance is rounded to
      6dp: the s2 - s1^2/n subtraction cancels ~6 digits, surfacing a
      1-ulp engine difference (FMA contraction) that rounding absorbs.
    """
    # fact at cluster width before the per-row JSON parsing (r16, guide
    # §2.2/§2.5 — see plans/bi.py q02): from_json + two
    # get_json_object calls per row ran serially at input-file
    # granularity. Aggregates are exact (bigint / fixed-point decimal;
    # missing_filled_sum adds exact 0.0s), so partitioning-independent.
    from ..sources.tables import load_fact_wide

    events = load_fact_wide(spark, sf_dir, "events", "event_id")
    parsed = events.withColumn(
        "props_map", F.from_json("props", MapType(StringType(), LongType()))
    )
    k = F.element_at("props_map", F.lit("k"))
    # decimal(12,0) micro-units: covers value < 1e6 while keeping the
    # vi*vi product precision (25) inside both engines' 38-digit cap
    vi = F.round(F.col("value") * F.lit(1000000.0)).cast("decimal(12,0)")
    n = F.count(F.lit(1))
    s1 = F.sum(vi).cast("double")
    s2 = F.sum(vi * vi).cast("double")
    mean = s1 / F.lit(1000000.0) / n
    s1s = s1 / F.lit(1000000.0)
    return (
        parsed.groupBy("event_type")
        .agg(
            F.sum(k).alias("k_sum"),
            F.count(k).alias("k_present"),
            F.sum(
                F.coalesce(
                    F.get_json_object("props", "$.k").try_cast("bigint"), F.lit(0)
                )
            ).alias("k_filled_sum"),
            F.sum(
                F.coalesce(
                    F.get_json_object("props", "$.missing").try_cast("double"),
                    F.lit(0.0),
                )
            ).alias("missing_filled_sum"),
            n.alias("n"),
            mean.alias("mean"),
            F.round(
                (s2 / F.lit(1e12) - s1s * s1s / n) / (n - F.lit(1)), 6
            ).alias("variance"),
        )
        .orderBy("event_type")
    )
