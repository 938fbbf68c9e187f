"""Remaining driver-checked queries: salted aggregation (skew path,
result identical to plain groupBy — full oracle), batch sliding
windows, and the multimodal feature-extraction pipeline (mapInPandas —
rows-only; kernels are deterministic stubs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import documents_as_media, extract_features
from ..operators.skew import salted_sum_count
from ..sources.tables import load_table
from .registry import query


@query(
    "skew_salted_revenue_by_segment",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def skew_salted_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a low-cardinality (maximally
    hot) key: 5 segments x 150k orders. The salt splits each segment
    across 16 partial aggregates; the final combine still produces the
    exact plain-groupBy answer (decimal sums are associative), which is
    precisely what the oracle checks."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(F.col("c_mktsegment").alias("segment"), "o_totalprice")
    out = salted_sum_count(
        joined,
        ["segment"],
        F.col("o_totalprice").cast("decimal(12,2)"),
        salts=16,
        sum_alias="total_dec",
        count_alias="n",
    )
    return out.select(
        "segment", F.col("total_dec").cast("double").alias("total"), "n"
    ).orderBy("segment")


@query(
    "events_sliding_3h_daily",
    oracle="""
    WITH offsets AS (SELECT * FROM (VALUES (0), (1), (2)) AS t(off)),
    slid AS (
      SELECT date_trunc('hour', e.ts) - INTERVAL (o.off) HOUR AS window_start,
             e.event_type, e.value
      FROM events e CROSS JOIN offsets o
    )
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM slid
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_sliding_3h_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the sliding window (3-hour windows sliding hourly):
    each event lands in 3 windows via an explode of hour offsets — the
    same window-assignment rule Structured Streaming's F.window uses
    internally, expressed relationally so DuckDB can oracle it."""
    events = load_table(spark, sf_dir, "events")
    slid = events.select(
        F.explode(
            F.array(*[
                (F.date_trunc("hour", "ts") - F.make_interval(hours=F.lit(off)))
                for off in range(3)
            ])
        ).alias("window_start"),
        "event_type",
        "value",
    )
    return (
        slid.groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .orderBy("window_start", "event_type")
    )


@query("multimodal_feature_extract")  # pandas-kernel stub -> rows-only
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline end-to-end: documents-as-media binary
    payloads -> mapInPandas decode/feature kernels (deterministic
    stubs — no codec libs in this container) -> typed feature rows.
    Rows-only check: the Arrow/mapInPandas plumbing is what's under
    test; kernel math is unit-tested (tests/test_multimodal.py)."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media).select(
        "media_id", "kind", "n_bytes", "sha256", "width", "height", "n_frames"
    )
