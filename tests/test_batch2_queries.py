"""Round-13 batch-2 queries: BPE fertility (kernel-consistency pin),
hand-computed changepoint split, and exact inter-arrival CV² values."""

import datetime as dt


def test_fertility_consistent_with_encode_counts(spark, sf_dir):
    """fertility_by_lang must be EXACTLY the per-lang rollup of the
    hash-proven per-doc encode counts — pins the shared-kernel
    contract (one training run, one segmentation, two consumers)."""
    from retail_sales_analysis_etl_bi_project_spark.plans.analysis_queries import (
        text_bpe_encode_counts,
        text_bpe_fertility_by_lang,
    )
    from retail_sales_analysis_etl_bi_project_spark.plans import shared_cache
    from retail_sales_analysis_etl_bi_project_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    try:
        per_doc = text_bpe_encode_counts(spark, sf_dir)
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        expect = {
            (r.lang): (r.n_docs, r.n_words, r.n_tokens)
            for r in per_doc.join(docs, "doc_id")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_words").alias("n_words"),
                F.sum("n_tokens").alias("n_tokens"),
            )
            .collect()
        }
        got = {
            r.lang: (r.n_docs, r.n_words, r.n_tokens, r.fertility)
            for r in text_bpe_fertility_by_lang(spark, sf_dir).collect()
        }
    finally:
        shared_cache.release()
    assert set(got) == set(expect)
    for lang, (nd, nw, nt, fert) in got.items():
        assert (nd, nw, nt) == expect[lang]
        assert fert == nt / nw
        assert fert >= 1.0  # a word is always >= 1 BPE token


def test_changepoint_level_shift(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.robust_queries import (
        bi_revenue_changepoint,
    )

    # 4 days at 10 then 4 days at 20: the best split is after day 4
    rows = [
        (i + 1, 1, 10.0 if i < 4 else 20.0, dt.datetime(2024, 1, 1 + i))
        for i in range(8)
    ]
    spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    ).write.parquet(f"{tmp_path}/orders.parquet")
    r = bi_revenue_changepoint(spark, str(tmp_path)).collect()[0]
    assert r.split_day == dt.date(2024, 1, 4)
    assert (r.n_left, r.n_right) == (4, 4)
    assert (r.mean_left, r.mean_right) == (10.0, 20.0)
    # same IEEE formula as both engines compute, in raw x10^4 units
    expected_gain = (
        400000.0**2 / 4.0 + 800000.0**2 / 4.0 - 1200000.0**2 / 8.0
    )
    assert r.gain == expected_gain


def test_interarrival_cv_exact(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.robust_queries import (
        events_interarrival_cv,
    )

    base = dt.datetime(2024, 1, 1)
    rows = (
        # type 'a': metronomic 10s gaps -> CV^2 = 0
        [(i, base + dt.timedelta(seconds=10 * i), 1, "a", 1.0, None)
         for i in range(4)]
        # type 'b': gaps 10s and 40s -> CV^2 = 0.36 exactly
        + [(10, base, 1, "b", 1.0, None),
           (11, base + dt.timedelta(seconds=10), 1, "b", 1.0, None),
           (12, base + dt.timedelta(seconds=50), 1, "b", 1.0, None)]
        # type 'c': single event -> no gaps -> absent from output
        + [(20, base, 1, "c", 1.0, None)]
    )
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(f"{tmp_path}/events.parquet")
    out = {r.event_type: r for r in
           events_interarrival_cv(spark, str(tmp_path)).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"].n_gaps == 3 and out["a"].cv2 == 0.0
    assert out["a"].mean_gap_s == 10.0
    # b: gaps 1e7, 4e7 us; n=2, sd=5e7, sdd=1.7e15
    # cv2 = (2*1.7e15 - 2.5e15) / 2.5e15 = 0.36
    assert out["b"].n_gaps == 2
    assert out["b"].cv2 == 0.36
    assert out["b"].mean_gap_s == 25.0


def test_markov_stationary_exact_integer_replay(spark, tmp_path):
    """Engineered 2-state chain (a->a, a->b, b->a): replicate the
    scaled-integer power iteration in plain Python and assert the
    engine's vector is bit-equal — pins the floor-division fixed
    point, not just approximate convergence to pi=(2/3, 1/3)."""
    from retail_sales_analysis_etl_bi_project_spark.plans.stat_queries import (
        _STAT_ROUNDS,
        _STAT_SCALE,
        events_markov_stationary,
    )

    base = dt.datetime(2024, 1, 1)
    seq = ["a", "a", "b", "a"]  # transitions: a->a, a->b, b->a
    rows = [
        (i, base + dt.timedelta(seconds=i), 1, t, 1.0, None)
        for i, t in enumerate(seq)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(f"{tmp_path}/events.parquet")

    c = {("a", "a"): 1, ("a", "b"): 1, ("b", "a"): 1}
    r = {"a": 2, "b": 1}
    pi = {"a": _STAT_SCALE // 2, "b": _STAT_SCALE // 2}
    for _ in range(_STAT_ROUNDS):
        new = {"a": 0, "b": 0}
        for (frm, to), n in c.items():
            new[to] += (pi[frm] * n) // r[frm]
        pi = new

    got = {
        row.event_type: row.stationary_scaled
        for row in events_markov_stationary(spark, str(tmp_path)).collect()
    }
    assert got == pi
    # sanity: converging toward (2/3, 1/3)
    assert abs(got["a"] / _STAT_SCALE - 2 / 3) < 0.01
