"""Structured Streaming tests: each streaming plan runs to completion on
the finite events file source and must agree with its batch twin (which
is oracle-checked against DuckDB by the driver)."""

import pytest
from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.plans.events_queries import (
    events_hourly_agg,
    events_sessionization,
)
from retail_sales_analysis_etl_bi_project_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    session_windows,
    sliding_type_counts,
    tumbling_hourly_agg,
)


def test_streaming_hourly_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = run_to_memory(
        spark, tumbling_hourly_agg(stream), "t_hourly"
    )
    batch = events_hourly_agg(spark, sf_dir)
    g = {(r.hour, r.event_type): (r.n_events, r.total_value) for r in got.collect()}
    b = {(r.hour, r.event_type): (r.n_events, r.total_value) for r in batch.collect()}
    assert g == b


def test_streaming_sliding_counts(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = run_to_memory(spark, sliding_type_counts(stream), "t_sliding").collect()
    assert got, "sliding windows empty"
    # every tumbling hour count must appear as sum across its 2 slides
    overlap = [r for r in got if (r.window_end - r.window_start).seconds == 3600]
    assert overlap


def test_streaming_session_windows_match_batch_sessions(spark, sf_dir):
    """Native session_window sessions = batch lag/cumsum sessions: same
    gap, same per-user session count and boundaries."""
    stream = read_events_stream(spark, sf_dir)
    got = run_to_memory(spark, session_windows(stream), "t_sessions")
    batch = events_sessionization(spark, sf_dir)
    g = {
        (r.user_id, r.session_start, r.n_events) for r in got.collect()
    }
    b = {
        (r.user_id, r.session_start, r.n_events) for r in batch.collect()
    }
    assert g == b


def test_streaming_dedup_within_watermark(spark, sf_dir):
    """Doubling the stream (union with itself) then dedup_stream must
    restore the original distinct count — duplicate keys arriving
    within the watermark are dropped, with bounded per-key state."""
    from retail_sales_analysis_etl_bi_project_spark.sources.tables import load_table
    from retail_sales_analysis_etl_bi_project_spark.streaming.events import dedup_stream

    doubled = read_events_stream(spark, sf_dir).unionByName(
        read_events_stream(spark, sf_dir)
    )
    got = run_to_memory(
        spark, dedup_stream(doubled), "t_dedup", output_mode="append"
    )
    assert got.count() == load_table(spark, sf_dir, "events").count()
