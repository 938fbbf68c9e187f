"""Driver-checkable event-stream queries (batch form). The same
semantics run as Structured Streaming in streaming/events.py; these
batch twins are the oracle-checkable versions (SURVEY.md §2.8 notes the
reference is batch-only — streaming is a north-star extension).

Sums of the double ``value`` column go through exact decimal(18,6) so a
distributed Spark sum and the single-threaded DuckDB oracle agree
bit-for-bit (same strategy as functions.money).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.money import fixed_point_sum, fixed_point_sum_sql
from ..sources.tables import load_table
from .registry import query

SESSION_GAP_SEC = 1800


@query(
    "events_hourly_agg",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {fixed_point_sum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch twin of the streaming
    windowed agg): count + deterministic fixed-point sum per hour x
    type (value is a full-precision double — see
    functions.money.fixed_point_sum for why a double->decimal cast is
    not cross-engine-safe there)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fixed_point_sum("value").alias("total_value"),
        )
        .orderBy("hour", "event_type")
    )


@query(
    "events_sessionization",
    oracle=f"""
    WITH deltas AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_SEC}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM deltas
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap: lag -> boundary
    flag -> running sum = session id -> per-session rollup. Batch twin of
    the stateful streaming sessionizer (streaming/events.py). Per-user
    windows shuffle once on user_id; state never exceeds a user's rows."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > SESSION_GAP_SEC
            ),
            1,
        ).otherwise(0)
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = events.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(run).cast("bigint")
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "events_dedup_first_per_key",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM (
      SELECT user_id, event_type, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def events_dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming dedup (streaming/events.py
    dedup_stream): keep the FIRST row per (user_id, event_type) key in
    event-time order — exactly what dropDuplicatesWithinWatermark keeps
    when arrival order matches event time (the equivalence the streaming
    tests assert). row_number()=1 plans as a WindowGroupLimit: per-key
    top-1 without materializing full ranks — one shuffle on the key,
    O(1) state per key."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
        .orderBy("user_id", "event_type")
    )


# NOTE: a former `events_top_users` top-K query was retired in round 3:
# its TakeOrderedAndProject shape is already hash-verified by
# q01_top5_products_by_revenue and window_top3_parts_per_brand, and the
# driver's correctness harness checks only the first 50 registered
# queries — the slot went to dedup_cluster_components (transitive dup
# clustering), which had no equivalent evidence.
