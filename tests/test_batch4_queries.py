"""Round-13 batch-4 queries: hand-computed calibration bins, an
engineered Zipf ladder, and a two-island burst timeline."""

import datetime as dt


def test_calibration_extreme_bins(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        text_langid_calibration,
    )

    # doc of pure stopwords -> ratio 1.0 -> clamps into top bin (9);
    # doc with zero stopwords -> ratio 0.0 -> bin 0
    rows = [
        (1, "the the the the", "en", "s", 15),
        (2, "zzz qqq www vvv", "xx", "s", 15),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r.bin: r for r in
           text_langid_calibration(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 9}
    assert out[0].n_docs == 1 and out[0].n_en == 0 and out[0].en_rate == 0.0
    assert out[0].bin_mid == 0.5 * 0.04
    assert out[0].ece_contrib == abs(0.0 - 0.5 * 0.04) * 1
    assert out[9].n_docs == 1 and out[9].n_en == 1 and out[9].en_rate == 1.0
    assert out[9].bin_mid == 9.5 * 0.04
    assert out[9].ece_contrib == abs(1.0 - 9.5 * 0.04) * 1


def test_zipf_profile_engineered_ladder(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.analysis_queries import (
        text_zipf_profile,
    )

    # freqs a=8, b=4, c=2, d=1 -> ranks 1..4; sampled ranks 1, 2, 4
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {r.rank: r for r in text_zipf_profile(spark, str(tmp_path)).collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1].term == "a" and rows[1].freq == 8
    assert rows[1].ratio_to_double_rank == 2.0  # 8/4
    assert rows[2].ratio_to_double_rank == 4.0  # 4/1
    assert rows[4].term == "d" and rows[4].ratio_to_double_rank is None


def test_burst_intervals_two_islands(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.robust_queries import (
        events_burst_intervals,
    )

    # type 'a': 24 warm-up hours at 1 event/h, then hours 24-25 at
    # 5 events/h (one 2-hour island: 2*5*24 > 3*24), then quiet hours,
    # then a lone spike at hour 30 (second island). The quiet hours
    # after the first burst keep the trailing mean low enough.
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(24):
        rows.append((eid, base + dt.timedelta(hours=h), 1, "a", 1.0, None))
        eid += 1
    for h in (24, 25):
        for _ in range(5):
            rows.append(
                (eid, base + dt.timedelta(hours=h), 1, "a", 1.0, None)
            )
            eid += 1
    for h in (26, 27, 28, 29):
        rows.append((eid, base + dt.timedelta(hours=h), 1, "a", 1.0, None))
        eid += 1
    for _ in range(9):
        rows.append((eid, base + dt.timedelta(hours=30), 1, "a", 1.0, None))
        eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(f"{tmp_path}/events.parquet")
    out = events_burst_intervals(spark, str(tmp_path)).collect()
    assert len(out) == 2
    first, second = out
    assert first.end_hour - first.start_hour == 1  # 2 consecutive hours
    assert (first.n_hours, first.peak_hourly, first.total_events) == (2, 5, 10)
    assert (second.n_hours, second.peak_hourly, second.total_events) == (1, 9, 9)
    assert second.start_hour - first.end_hour == 5  # separated islands
