"""Round-13 robust/seasonal statistics (plans/robust_queries.py):
hand-computed Theil–Sen medians (perfect line; outlier immunity the
OLS fit lacks), exact weekday seasonal indices on an engineered
two-level week, and a hand-checked median/MAD/outlier triple."""

import datetime as dt


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    ).write.parquet(f"{tmp_path}/orders.parquet")
    return str(tmp_path)


def test_theilsen_perfect_line(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.robust_queries import (
        bi_revenue_trend_theilsen,
    )

    sf = _write_orders(
        spark,
        tmp_path,
        [
            (i + 1, 1, float((i + 1) * 10), dt.datetime(2024, 1, 1 + i))
            for i in range(3)
        ],
    )
    row = bi_revenue_trend_theilsen(spark, sf).collect()[0]
    assert row.n_days == 3
    assert row.n_pairs == 3
    # all three pairwise slopes are 10/day; the selected median pair is
    # the rank-2 one under the (slope, dy4, dx) order: (100000, 1)
    assert (row.med_dy4, row.med_dx_days) == (100000, 1)
    assert row.slope_per_day == 10.0


def test_theilsen_ignores_one_outlier_day(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.robust_queries import (
        bi_revenue_trend_theilsen,
    )
    from retail_sales_analysis_etl_bi_project_spark.plans.trend_queries import (
        bi_revenue_trend_ols,
    )

    # perfect 10/day line with one 1000-revenue spike on day 4: the
    # median of the 10 pairwise slopes is still exactly 10/day, while
    # the OLS slope is dragged far off — the robustness contract.
    vals = [10.0, 20.0, 30.0, 1000.0, 50.0]
    sf = _write_orders(
        spark,
        tmp_path,
        [
            (i + 1, 1, v, dt.datetime(2024, 1, 1 + i))
            for i, v in enumerate(vals)
        ],
    )
    row = bi_revenue_trend_theilsen(spark, sf).collect()[0]
    assert row.n_pairs == 10
    assert row.slope_per_day == 10.0
    ols = bi_revenue_trend_ols(spark, sf).collect()[0]
    assert abs(ols.slope_per_day - 10.0) > 50  # tilted by the spike


def test_weekday_seasonality_two_level_week(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.robust_queries import (
        bi_revenue_weekday_seasonality,
    )

    # 14 consecutive days starting Monday 2024-01-01; Mondays sell 20,
    # every other day sells 10. mean = 160/14, so index(Mon) =
    # 20*14/160 = 1.75 exactly and every other index = 0.875 exactly.
    rows = []
    for i in range(14):
        day = dt.datetime(2024, 1, 1 + i)
        price = 20.0 if day.weekday() == 0 else 10.0
        rows.append((i + 1, 1, price, day))
    sf = _write_orders(spark, tmp_path, rows)
    out = {
        r.iso_dow: r
        for r in bi_revenue_weekday_seasonality(spark, sf).collect()
    }
    assert len(out) == 7 and all(out[d].n_days == 2 for d in out)
    assert out[1].seasonal_index == 1.75 and out[1].revenue == 40.0
    for d in range(2, 8):
        assert out[d].seasonal_index == 0.875


def test_mad_by_type_hand_checked(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.robust_queries import (
        events_value_mad_by_type,
    )

    # type 'a': values 1..4 plus a 100 spike -> median 3 (rank-3 of 5),
    # devs {2,1,0,1,97} -> MAD 1 (rank-3 of sorted {0,1,1,2,97}),
    # outliers: dev > 4.4478*1 -> only the spike. NULL values drop.
    rows = [
        (i + 1, dt.datetime(2024, 1, 1), 1, "a", v, None)
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0])
    ] + [(9, dt.datetime(2024, 1, 1), 1, "a", None, None)]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(f"{tmp_path}/events.parquet")
    row = events_value_mad_by_type(spark, str(tmp_path)).collect()[0]
    assert row.event_type == "a"
    assert row.n_values == 5
    assert row.median_value == 3.0
    assert row.mad_value == 1.0
    assert row.n_outliers == 1
