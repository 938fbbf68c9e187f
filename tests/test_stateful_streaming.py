"""applyInPandasWithState tests: cumulative per-user state across
micro-batches, exactly-once threshold flagging."""

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.sources.tables import load_table
from retail_sales_analysis_etl_bi_project_spark.streaming.events import (
    _await_or_raise,
    read_events_stream,
)
from retail_sales_analysis_etl_bi_project_spark.streaming.stateful import (
    user_profile_stream,
)


def test_stateful_user_profile_matches_batch(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, sf_dir)
    out = user_profile_stream(stream, threshold=500.0)
    q = (
        out.writeStream.format("memory")
        .queryName("t_profiles")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, 120)
    got = spark.table("t_profiles").toPandas()
    # last emission per user carries the final cumulative state
    final = got.groupby("user_id").last()

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    )
    for r in batch:
        f = final.loc[r.user_id]
        assert int(f["n_events"]) == r.n_events
        assert abs(float(f["total_value"]) - r.total_value) < 1e-6
        assert abs(float(f["max_value"]) - r.max_value) < 1e-9

    # exactly-once flag: across all emissions, each user crosses <= once
    crossings = got[got["crossed_threshold"]].groupby("user_id").size()
    assert (crossings <= 1).all()
    # and users whose final total clears the threshold did cross
    should = {r.user_id for r in batch if r.total_value >= 500.0}
    assert should == set(crossings.index)
