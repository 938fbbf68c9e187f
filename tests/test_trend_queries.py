"""Round-12g star statistics (plans/trend_queries.py): hand-computed
OLS fits (perfect line, flat line), Gini extremes (equality zero,
two-customer maximum), and engineered-basket triples with exact lift."""

import datetime as dt


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    ).write.parquet(f"{tmp_path}/orders.parquet")
    return str(tmp_path)


def test_ols_perfect_line(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.trend_queries import (
        bi_revenue_trend_ols,
    )

    # daily revenue 10, 20, 30 on consecutive days: slope 10/day,
    # intercept 10, r2 exactly 1
    sf = _write_orders(
        spark,
        tmp_path,
        [
            (i + 1, 1, float((i + 1) * 10), dt.datetime(2024, 1, 1 + i))
            for i in range(3)
        ],
    )
    row = bi_revenue_trend_ols(spark, sf).collect()[0]
    assert row.n_days == 3
    assert row.slope_per_day == 10.0
    assert row.intercept == 10.0
    assert row.r2 == 1.0


def test_ols_flat_line_zero_slope(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.trend_queries import (
        bi_revenue_trend_ols,
    )

    sf = _write_orders(
        spark,
        tmp_path,
        [(i + 1, 1, 7.5, dt.datetime(2024, 1, 1 + i)) for i in range(4)],
    )
    row = bi_revenue_trend_ols(spark, sf).collect()[0]
    assert row.slope_per_day == 0.0 and row.intercept == 7.5


def test_gini_equality_and_two_customer_max(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.trend_queries import (
        bi_revenue_gini_customers,
    )

    # equal revenues -> G = 0
    sf = _write_orders(
        spark,
        tmp_path,
        [
            (1, 1, 5.0, dt.datetime(2024, 1, 1)),
            (2, 2, 5.0, dt.datetime(2024, 1, 2)),
        ],
    )
    row = bi_revenue_gini_customers(spark, sf).collect()[0]
    assert row.n_customers == 2 and row.gini == 0.0
    assert row.total_revenue == 10.0


def test_gini_concentrated_two_customers(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.trend_queries import (
        bi_revenue_gini_customers,
    )

    # all revenue on one of two customers: G = (n-1)/n = 0.5
    sf = _write_orders(
        spark,
        tmp_path,
        [
            (1, 1, 0.0, dt.datetime(2024, 1, 1)),
            (2, 2, 10.0, dt.datetime(2024, 1, 2)),
        ],
    )
    row = bi_revenue_gini_customers(spark, sf).collect()[0]
    assert row.gini == 0.5


def test_basket_triples_support_and_lift(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.shared_cache import (
        release,
    )
    from retail_sales_analysis_etl_bi_project_spark.plans.trend_queries import (
        bi_basket_triples,
    )

    release("basket_li")  # scope the managed persist to this fixture
    # orders: {1,2,3} and {1,2,3,4} -> only triple (1,2,3) reaches
    # support 2; lift = 2 * 2^2 / (2*2*2) = 1.0. Write a minimal
    # lineitem with the two columns the query reads.
    rows = [(100, p) for p in (1, 2, 3)] + [(200, p) for p in (1, 2, 3, 4)]
    spark.createDataFrame(rows, ["l_orderkey", "l_partkey"]).write.parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    out = bi_basket_triples(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.part_a, r.part_b, r.part_c, r.n_abc) == (1, 2, 3, 2)
    assert r.lift3 == 1.0


def test_reorder_hazard_hand_life_table(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.trend_queries import (
        bi_reorder_hazard,
    )

    # customer 1 orders on days 0, 7, 28 -> event gaps 7d (week 1) and
    # 21d (week 3); customer 2 orders once on day 21 -> censored at the
    # horizon (day 28), gap 7d (week 1). Customer 1's last order is
    # censored with gap 0 (week 0).
    # intervals: week0 censored(c1), week1 event + week1 censored(c2),
    # week3 event.
    # risk sets (reverse cumsum): w0=4, w1=3, w2=1, w3=1.
    # hazards: w0 0/4, w1 1/3, w2 0/1, w3 1/1.
    rows = [
        (1, 1, 1.0, dt.datetime(2024, 1, 1)),
        (2, 1, 1.0, dt.datetime(2024, 1, 8)),
        (3, 1, 1.0, dt.datetime(2024, 1, 29)),
        (4, 2, 1.0, dt.datetime(2024, 1, 22)),
    ]
    sf = _write_orders(spark, tmp_path, rows)
    got = {r.week: r for r in bi_reorder_hazard(spark, sf).collect()}
    assert got[0].n_at_risk == 4 and got[0].n_events == 0
    assert got[0].n_censored == 1 and got[0].hazard == 0.0
    assert (got[1].n_at_risk, got[1].n_events, got[1].n_censored) == (3, 1, 1)
    assert got[1].hazard == 1.0 / 3.0
    assert (got[2].n_at_risk, got[2].n_events) == (1, 0)
    assert (got[3].n_at_risk, got[3].n_events, got[3].hazard) == (1, 1, 1.0)
    assert got[4].n_at_risk == 0 and got[4].hazard is None


# ------------------------------------------------------------------ r12i


def test_mannkendall_monotone_series_tau_one(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.trend_queries import (
        bi_revenue_trend_mannkendall,
    )

    # strictly increasing daily revenue: every pair agrees -> S =
    # C(5,2) = 10, tau = 1
    rows = [
        (i, 1, float((i + 1) * 10), dt.datetime(2024, 1, 1) + dt.timedelta(days=i))
        for i in range(5)
    ]
    sf = _write_orders(spark, tmp_path, rows)
    row = bi_revenue_trend_mannkendall(spark, sf).collect()[0]
    assert (row.n_days, row.s_stat, row.kendall_tau) == (5, 10, 1.0)


def test_mannkendall_ties_contribute_zero(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.trend_queries import (
        bi_revenue_trend_mannkendall,
    )

    # values 10, 10, 20: pairs (1,2) tie -> 0, (1,3) and (2,3) up -> 2
    rows = [
        (1, 1, 10.0, dt.datetime(2024, 1, 1)),
        (2, 1, 10.0, dt.datetime(2024, 1, 2)),
        (3, 1, 20.0, dt.datetime(2024, 1, 3)),
    ]
    sf = _write_orders(spark, tmp_path, rows)
    row = bi_revenue_trend_mannkendall(spark, sf).collect()[0]
    assert (row.s_stat, row.kendall_tau) == (2, 2.0 / 3.0)


def test_autocorr_alternating_series_lag_signs(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.trend_queries import (
        bi_revenue_autocorr,
    )

    # perfectly alternating 10, 20, 10, 20, ... over 56 days: the
    # biased ACF estimator (full-series mean/variance, n-k cross
    # terms) gives EXACTLY ±(n-k)/n — negative at odd lags, positive
    # at even lags
    rows = [
        (i, 1, 10.0 if i % 2 == 0 else 20.0,
         dt.datetime(2024, 1, 1) + dt.timedelta(days=i))
        for i in range(56)
    ]
    sf = _write_orders(spark, tmp_path, rows)
    got = {r.lag: r.acf for r in bi_revenue_autocorr(spark, sf).collect()}
    assert set(got) == {1, 7, 14, 28}
    assert got[1] == -55.0 / 56.0
    assert got[7] == -49.0 / 56.0
    assert got[14] == 42.0 / 56.0
    assert got[28] == 28.0 / 56.0


def test_runs_test_alternating_and_blocked(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.trend_queries import (
        bi_revenue_runs_test,
    )

    # 3 low then 3 high (no exact-median day: n=6 even -> lower median
    # is a low day, which drops): remaining 5 days, runs = 2 blocks
    rows = [
        (i, 1, 10.0 if i < 3 else 20.0,
         dt.datetime(2024, 1, 1) + dt.timedelta(days=i))
        for i in range(6)
    ]
    sf = _write_orders(spark, tmp_path, rows)
    row = bi_revenue_runs_test(spark, sf).collect()[0]
    # lower median = 10 -> the three 10-days equal it and drop
    assert (row.n_above, row.n_below) == (3, 0)
    assert row.n_runs == 1
