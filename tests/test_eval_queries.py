"""Round-12d eval/sampling queries (plans/eval_queries.py): hand-checked
confusion matrices on separable vocabularies (incl. the no-overlap
'none' class), Markov top-1 accuracy on engineered sequences (incl. the
unseen-state convention), and exact PPS multiplicities including the
telescoping sum(multiplicity)==n invariant and the two-phase == one
logical-window equality."""

import datetime as dt


def _write_docs(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        [(i, t, "en", s, len(t or "")) for i, t, s in rows],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    return sf


def test_classifier_separable_vocab_and_none_class(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        text_domain_prototype_classifier,
    )

    # alpha and beta vocabularies are disjoint -> perfect diagonal;
    # the blank doc shares no term with any prototype -> 'none'
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "apple banana", "alpha"),
            (2, "banana cherry apple", "alpha"),
            (3, "cherry apple", "alpha"),
            (4, "", "alpha"),
            (5, "xylo zeta", "beta"),
            (6, "zeta qoph xylo", "beta"),
            (7, "qoph zeta", "beta"),
        ],
    )
    got = {
        (r.true_source, r.pred_source): r.n_docs
        for r in text_domain_prototype_classifier(spark, sf).collect()
    }
    assert got == {
        ("alpha", "alpha"): 3,
        ("alpha", "none"): 1,
        ("beta", "beta"): 3,
    }


def test_classifier_jaccard_argmax_prefers_tighter_prototype(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        text_domain_prototype_classifier,
    )

    # doc 9's terms {a b} overlap both prototypes with o=2, but
    # narrow's prototype is {a b} (jac 2/2) while wide's is
    # {a b c d e} (jac 2/5) -> argmax picks narrow even though doc 9's
    # own source is wide (a real misclassification the matrix surfaces)
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b", "narrow"),
            (2, "a b", "narrow"),
            (9, "a b", "wide"),
            (3, "a b c d e", "wide"),
            (4, "a b c d e", "wide"),
        ],
    )
    got = {
        (r.true_source, r.pred_source): r.n_docs
        for r in text_domain_prototype_classifier(spark, sf).collect()
    }
    assert got[("wide", "narrow")] == 1
    assert got[("narrow", "narrow")] == 2
    assert got[("wide", "wide")] == 2


def _write_events(spark, tmp_path, rows):
    ev = spark.createDataFrame(
        [
            (eid, dt.datetime(2024, 1, 1, 12, 0, 0), uid, et, 1.0, "{}")
            for eid, uid, et in rows
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    sf = str(tmp_path)
    ev.write.parquet(f"{sf}/events.parquet")
    return sf


def test_markov_eval_alternating_sequence_perfect(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        events_markov_eval,
    )

    # One user, A/B alternating by event_id (same ts everywhere, so the
    # event_id tiebreak IS the order). Test transitions are those whose
    # NEXT id % 5 == 4: (B->A, next 4) and (A->B, next 9). Train counts
    # A->B:4, B->A:3 -> pred(A)=B, pred(B)=A -> both test rows correct.
    rows = [(i, 7, "A" if i % 2 == 0 else "B") for i in range(10)]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.cur_type: r for r in events_markov_eval(spark, sf).collect()}
    assert set(got) == {"A", "B"}
    assert (got["A"].n_test, got["A"].n_correct, got["A"].accuracy) == (1, 1, 1.0)
    assert (got["B"].n_test, got["B"].n_correct, got["B"].accuracy) == (1, 1, 1.0)


def test_markov_eval_unseen_state_scores_zero(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        events_markov_eval,
    )

    # C's only outgoing transition lands in the test split (next id 4),
    # so training never sees state C -> pred NULL -> scored incorrect.
    sf = _write_events(spark, tmp_path, [(3, 1, "C"), (4, 1, "D")])
    got = {r.cur_type: r for r in events_markov_eval(spark, sf).collect()}
    assert (got["C"].n_test, got["C"].n_correct, got["C"].accuracy) == (1, 0, 0.0)


def test_pps_operator_hand_computed_multiplicities(spark):
    from retail_sales_analysis_etl_bi_project_spark.operators.curation import (
        pps_systematic_sample,
    )

    # weights 2,4,0,2; total 8; n=4 -> stratum width 2. cum: 2,6,8.
    # doc 1 spans (0,2] -> 1 stratum; doc 2 spans (2,6] -> strata 2,3;
    # doc 4 spans (6,8] -> stratum 4. doc 3 (w=0) can never be drawn.
    docs = spark.createDataFrame(
        [(1, 2), (2, 4), (3, 0), (4, 2)], ["doc_id", "n_tokens"]
    )
    got = {
        r.doc_id: (r.cum_tokens, r.multiplicity)
        for r in pps_systematic_sample(docs, n=4).collect()
    }
    assert got == {1: (2, 1), 2: (6, 2), 4: (8, 1)}


def test_pps_two_phase_equals_one_window_and_telescopes(spark):
    from retail_sales_analysis_etl_bi_project_spark.operators.curation import (
        pps_systematic_sample,
    )

    docs = spark.createDataFrame(
        [(i, (i * 7) % 5 + 1) for i in range(20)], ["doc_id", "n_tokens"]
    )
    one = sorted(
        tuple(r)
        for r in pps_systematic_sample(docs, n=7, block_size=1 << 20).collect()
    )
    multi = sorted(
        tuple(r) for r in pps_systematic_sample(docs, n=7, block_size=3).collect()
    )
    assert one == multi  # prefix sums decompose associatively
    assert sum(r[-1] for r in one) == 7  # telescoping sum == n


def test_pps_query_multiplicity_sums_to_n(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        _PPS_N,
        corpus_pps_systematic_sample,
    )

    # 5 docs, one blank; a short corpus forces multi-stratum docs
    # (w > total/n), exercising multiplicity > 1 end to end
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b c", "s1"),
            (2, "d e", "s1"),
            (3, "", "s2"),
            (4, "f g h i", "s2"),
            (5, "j", "s3"),
        ],
    )
    rows = corpus_pps_systematic_sample(spark, sf).collect()
    assert 3 not in {r.doc_id for r in rows}
    assert sum(r.multiplicity for r in rows) == _PPS_N
    assert max(r.multiplicity for r in rows) > 1


# ------------------------------------------------------------------ r12e


def test_kappa_chance_level_and_perfect(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        text_langid_kappa,
    )

    # predicted_lang is 'en' iff stopword ratio >= 0.12: "the the the"
    # -> en, "zzz yyy" -> other. 2x2 with every cell = 1: po = 1/2 and
    # pe = (2*2 + 2*2)/16 = 1/2 -> kappa exactly 0 (chance-level).
    rows = [
        (1, "the the the", "en", "s", 11),  # truth en,    pred en
        (2, "zzz yyy", "en", "s", 7),       # truth en,    pred other
        (3, "the the the", "fr", "s", 11),  # truth other, pred en
        (4, "zzz yyy", "fr", "s", 7),       # truth other, pred other
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(f"{tmp_path}/documents.parquet")
    row = text_langid_kappa(spark, str(tmp_path)).collect()[0]
    assert (row.n_docs, row.n_agree, row.n_true_en, row.n_pred_en) == (4, 2, 2, 2)
    assert (row.kappa_num, row.kappa_den) == (0, 8)
    assert row.kappa == 0.0 and row.po == 0.5 and row.pe == 0.5


def test_kappa_perfect_agreement_is_one(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        text_langid_kappa,
    )

    spark.createDataFrame(
        [
            (1, "the the the", "en", "s", 11),
            (2, "zzz yyy", "fr", "s", 7),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(f"{tmp_path}/documents.parquet")
    row = text_langid_kappa(spark, str(tmp_path)).collect()[0]
    assert row.kappa == 1.0 and (row.kappa_num, row.kappa_den) == (2, 2)


def test_minhash_auc_matches_python_midrank_reference(spark, tmp_path):
    """Exact-equality pin of the distributed score-grain AUC reduction
    against an independent pure-Python midrank implementation (the
    PageRank-vs-Python precedent), on a graded-overlap corpus where
    both classes are populated."""
    from pyspark.sql import functions as F

    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_signatures,
        shingle_relation,
    )
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        dedup_minhash_auc,
    )

    # graded near-dup ladder: each pair (2k, 2k+1) shares a prefix of a
    # common word stream and diverges afterwards, so exact Jaccard
    # spans both sides of t=0.7 and signature agreement is imperfect
    base = [f"w{i}" for i in range(40)]
    rows = []
    for k in range(8):
        keep = 40 - 3 * k
        a = " ".join(base)
        b = " ".join(base[:keep] + [f"x{k}_{i}" for i in range(40 - keep)])
        rows.append((2 * k, a, "s"))
        rows.append((2 * k + 1, b, "s"))
    sf = _write_docs(spark, tmp_path, [(i, t, s) for i, t, s in rows])

    got = dedup_minhash_auc(spark, str(tmp_path)).collect()[0]

    # independent reference: rebuild (m, pos) via the operators, then
    # per-pair midrank AUC in plain Python
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sigs = minhash_signatures(docs)
    cand = minhash_candidate_pairs(docs, bands=32, signatures=sigs)
    sh = shingle_relation(docs)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    uni = F.size(F.array_distinct(F.concat("sh_a", "sh_b")))
    scored = (
        cand.join(sigs.select(F.col("doc_id_").alias("doc_a"), F.col("sig").alias("sig_a")), "doc_a")
        .join(sigs.select(F.col("doc_id_").alias("doc_b"), F.col("sig").alias("sig_b")), "doc_b")
        .join(sh.select(F.col("did").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("did").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .select(
            F.size(
                F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
            ).alias("m"),
            ((uni > 0) & (inter * 10 >= uni * 7)).alias("pos"),
        )
        .collect()
    )
    pos = sorted(r.m for r in scored if r.pos)
    neg = sorted(r.m for r in scored if not r.pos)
    assert pos and neg, "graded corpus must populate both classes"
    num2 = sum(
        2 * sum(1 for n in neg if n < p) + sum(1 for n in neg if n == p)
        for p in pos
    )
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
    assert got.auc_num2 == num2
    assert got.auc == num2 / (2.0 * len(pos) * len(neg))


def test_backtest_hand_computed_series(spark, tmp_path):
    import datetime as dt

    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        bi_revenue_backtest_mase,
    )

    # 9 consecutive days, revenue = 10,20,...,90: days 8 and 9 evaluate.
    # day8: |7*80 - (10+..+70)| = |560-280| = 280 ; e1 = |80-70| = 10
    # day9: |7*90 - (20+..+80)| = |630-350| = 280 ; e1 = 10
    rows = [
        (i, float((i + 1) * 10), dt.datetime(2024, 1, 1) + dt.timedelta(days=i))
        for i in range(9)
    ]
    spark.createDataFrame(
        rows, ["o_orderkey", "o_totalprice", "o_orderdate"]
    ).write.parquet(f"{tmp_path}/orders.parquet")
    row = bi_revenue_backtest_mase(spark, str(tmp_path)).collect()[0]
    assert row.n_days == 2
    assert row.total_err7 == 560.0 and row.total_err1 == 20.0
    assert row.mae_ma7 == 560.0 / 14.0 and row.mae_naive == 10.0
    assert row.mase == 560.0 / 140.0


def test_backtest_gap_days_fill_zero(spark, tmp_path):
    import datetime as dt

    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        bi_revenue_backtest_mase,
    )

    # 9-day calendar with days 2..8 missing: dense series is
    # 10,0,0,0,0,0,0,0,90 and days 8,9 evaluate (rn > 7):
    # day8: e7 = |7*0 - 10| = 10, e1 = |0-0| = 0
    # day9: e7 = |7*90 - 0| = 630, e1 = |90-0| = 90
    spark.createDataFrame(
        [
            (1, 10.0, dt.datetime(2024, 1, 1)),
            (2, 90.0, dt.datetime(2024, 1, 9)),
        ],
        ["o_orderkey", "o_totalprice", "o_orderdate"],
    ).write.parquet(f"{tmp_path}/orders.parquet")
    row = bi_revenue_backtest_mase(spark, str(tmp_path)).collect()[0]
    assert row.n_days == 2
    assert row.total_err7 == 640.0 and row.total_err1 == 90.0
    assert row.mase == 640.0 / (7.0 * 90.0)


# ------------------------------------------------------------------ r12f


def test_countmin_one_sided_and_exact_on_lone_term(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        text_countmin_heavyhitters,
    )

    # CMS guarantee: estimate >= exact always; with a single term in
    # the corpus there is nothing to collide with -> estimate == exact.
    sf = _write_docs(spark, tmp_path, [(1, "zz zz zz", "s"), (2, "zz", "s")])
    rows = text_countmin_heavyhitters(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0].term == "zz" and rows[0].exact_tf == 4
    assert rows[0].cms_est == 4 and rows[0].overcount == 0


def test_countmin_guarantee_on_mixed_corpus(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        text_countmin_heavyhitters,
    )

    sf = _write_docs(
        spark,
        tmp_path,
        [(i, " ".join(f"w{j}" for j in range(i + 1)), "s") for i in range(30)],
    )
    rows = text_countmin_heavyhitters(spark, sf).collect()
    assert rows, "top-k must be non-empty"
    assert all(r.cms_est >= r.exact_tf for r in rows)  # one-sided
    assert all(r.overcount == r.cms_est - r.exact_tf for r in rows)
    # w0 appears once per doc -> the heaviest hitter
    assert rows[0].term == "w0" and rows[0].exact_tf == 30


def test_threshold_sweep_hand_confusion(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        _LANGID_GRID,
        text_langid_threshold_sweep,
    )

    # ratios: stopwordy docs 1.0, stopword-free docs 0.0 -> identical
    # confusion at every grid point: tp=1 fp=1 fn=1 tn=1, f1=0.5
    spark.createDataFrame(
        [
            (1, "the the the", "en", "s", 11),
            (2, "zzz yyy", "en", "s", 7),
            (3, "the the the", "fr", "s", 11),
            (4, "zzz yyy", "fr", "s", 7),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = text_langid_threshold_sweep(spark, str(tmp_path)).collect()
    assert [r.threshold for r in rows] == sorted(_LANGID_GRID)
    for r in rows:
        assert (r.tp, r.fp, r.fn, r.tn) == (1, 1, 1, 1)
        assert r.precision_ == 0.5 and r.recall_ == 0.5 and r.f1 == 0.5


def test_sparse_cosine_hand_computed_pair(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        text_sparse_cosine_pairs,
    )

    # doc1 = (x:2, y:1), doc2 = (x:1, y:2): dot = 4, norms 5 and 5,
    # cosine = 4/5 = 0.8 >= 0.6; doc3 shares no term -> no pair rows
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, "x x y", "s"), (2, "x y y", "s"), (3, "q r s", "s")],
    )
    rows = text_sparse_cosine_pairs(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert (r.dot, r.norm2_a, r.norm2_b) == (4, 5, 5)
    assert r.cosine == 4.0 / 5.0


def test_sparse_cosine_identical_docs_score_one(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        text_sparse_cosine_pairs,
    )

    sf = _write_docs(
        spark, tmp_path, [(1, "a a b c", "s"), (2, "a a b c", "s")]
    )
    rows = text_sparse_cosine_pairs(spark, sf).collect()
    assert len(rows) == 1 and rows[0].cosine == 1.0


# ------------------------------------------------------------------ r12h


def test_wilson_ci_matches_python_reference(spark, tmp_path):
    import math

    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        _WILSON_Z,
        text_langid_wilson_ci,
    )

    # n=4, a=2 (the kappa chance-level corpus): p=0.5; the query's
    # pinned chain must equal the same chain evaluated in Python
    # (IEEE doubles, identical association)
    rows = [
        (1, "the the the", "en", "s", 11),
        (2, "zzz yyy", "en", "s", 7),
        (3, "the the the", "fr", "s", 11),
        (4, "zzz yyy", "fr", "s", 7),
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(f"{tmp_path}/documents.parquet")
    row = text_langid_wilson_ci(spark, str(tmp_path)).collect()[0]
    n, a, z = 4.0, 2.0, _WILSON_Z
    p = a / n
    center = p + (z * z) / (2.0 * n)
    rad = z * math.sqrt(p * (1.0 - p) / n + (z * z) / ((4.0 * n) * n))
    denom = 1.0 + (z * z) / n
    assert (row.n_docs, row.n_correct, row.acc) == (4, 2, 0.5)
    assert row.wilson_low == (center - rad) / denom
    assert row.wilson_high == (center + rad) / denom
    assert 0.0 <= row.wilson_low < row.acc < row.wilson_high <= 1.0


def test_conformal_coverage_constant_series_is_one(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        bi_forecast_interval_coverage,
    )

    # constant revenue -> every residual 0 -> halfwidth 0, coverage 1
    rows = [
        (i, 1, 10.0, dt.datetime(2024, 1, 1) + dt.timedelta(days=i))
        for i in range(20)
    ]
    spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    ).write.parquet(f"{tmp_path}/orders.parquet")
    row = bi_forecast_interval_coverage(spark, str(tmp_path)).collect()[0]
    assert row.interval_halfwidth == 0.0
    assert row.coverage == 1.0
    assert row.n_calibration + row.n_test == 13  # 20 days - 7 warmup


def test_conformal_outlier_in_test_breaks_coverage(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        bi_forecast_interval_coverage,
    )

    # constant 10 for 19 days, day 20 spikes to 100: calibration
    # residuals are all 0 -> q=0; test days 18,19 covered, day 20 not
    rows = [
        (i, 1, 10.0 if i < 19 else 100.0,
         dt.datetime(2024, 1, 1) + dt.timedelta(days=i))
        for i in range(20)
    ]
    spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    ).write.parquet(f"{tmp_path}/orders.parquet")
    row = bi_forecast_interval_coverage(spark, str(tmp_path)).collect()[0]
    assert (row.n_calibration, row.n_test) == (10, 3)
    assert row.n_covered == 2
    assert row.coverage == 2.0 / 3.0


def test_path_lift_detects_order2_memory(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        events_path_lift,
    )

    # sequence (A X B C X D) repeated: the successor of X depends on
    # what PRECEDED it (A->B, C->D), which order-1 cannot see:
    # lift(A,X,B) = n_AXB * n_X / (n_AX * n_XB) = k*2k/(k*k) = 2
    pattern = ["A", "X", "B", "C", "X", "D"]
    rows = [(i, 1, pattern[i % 6]) for i in range(6 * 8)]
    sf = _write_events(spark, tmp_path, rows)
    got = {(r.a, r.b, r.c): r.order2_lift
           for r in events_path_lift(spark, sf).collect()}
    assert got[("A", "X", "B")] == 2.0
    assert got[("C", "X", "D")] == 2.0
