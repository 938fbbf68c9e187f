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
