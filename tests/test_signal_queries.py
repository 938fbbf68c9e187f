"""Round-12c signal queries (plans/signal_queries.py): hand-checked KS
statistics on engineered value distributions, the open-wedge link
prediction semantics (closed wedges excluded, existing edges anti-
joined), and first-occurrence novelty including the empty-doc shingle
edge case."""

import datetime as dt


def _write_events(spark, tmp_path, typed_values):
    rows = []
    eid = 0
    for etype, vals in typed_values.items():
        for v in vals:
            rows.append(
                (eid, dt.datetime(2024, 1, 1, 12, 0, 0), eid % 5, etype, float(v), "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = str(tmp_path)
    ev.write.parquet(f"{sf}/events.parquet")
    return sf


def test_ks_two_types_hand_computed(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.signal_queries import (
        events_value_ks_drift,
    )

    # A: {1,2,3}, B: {3,4}.  F_A(2)=2/3, F_B(2)=0 -> D = 2/3 for both
    # sides (two types: rest(A) == B).  Exact numerator at v=2 is
    # |c_A*n_B - c_B*n_A| = |2*2 - 0*3| = 4; denominator 3*2 = 6.
    sf = _write_events(spark, tmp_path, {"A": [1, 2, 3], "B": [3, 4]})
    got = {r.event_type: r for r in events_value_ks_drift(spark, sf).collect()}
    assert set(got) == {"A", "B"}
    assert (got["A"].n_type, got["B"].n_type) == (3, 2)
    assert int(got["A"].ks_num) == 4 and int(got["B"].ks_num) == 4
    assert got["A"].ks_stat == 4.0 / 6.0
    assert got["B"].ks_stat == 4.0 / 6.0


def test_ks_identical_distributions_zero(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.signal_queries import (
        events_value_ks_drift,
    )

    # identical value multisets -> ECDFs coincide at every step -> D=0
    sf = _write_events(
        spark, tmp_path, {"A": [1, 2, 2, 5], "B": [1, 2, 2, 5]}
    )
    got = {r.event_type: r for r in events_value_ks_drift(spark, sf).collect()}
    assert int(got["A"].ks_num) == 0 and got["A"].ks_stat == 0.0
    assert int(got["B"].ks_num) == 0 and got["B"].ks_stat == 0.0


def test_linkpred_open_wedge_only(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.signal_queries import (
        bi_copurchase_linkpred,
    )
    from retail_sales_analysis_etl_bi_project_spark.plans.shared_cache import (
        release,
    )

    release("basket_li")  # scope the managed persist to this fixture
    # co-purchase edges (support 2 each): (1,2) and (2,3); (1,3) never
    # co-bought -> one open wedge through 2 -> predicted pair (1,3)
    # with cn=1, d(1)=1, d(3)=1 -> union = 1 -> jaccard 1.0.
    # parts 4,5 co-bought only ONCE -> below support, no edge, no wedge.
    rows = []
    lid = 0

    def add(ok, parts):
        nonlocal lid
        ship = dt.datetime(2024, 6, 1)
        for p in parts:
            lid += 1
            rows.append((ok, p, 1, lid, 1.0, 10.0, 0.0, 0.0, "N", "O", ship))

    add(10, [1, 2])
    add(11, [1, 2])
    add(12, [2, 3])
    add(13, [2, 3])
    add(14, [4, 5])
    li = spark.createDataFrame(
        rows,
        [
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    sf = str(tmp_path)
    li.write.parquet(f"{sf}/lineitem.parquet")
    try:
        got = bi_copurchase_linkpred(spark, sf).collect()
    finally:
        release("basket_li")
    assert [(r.part_a, r.part_b) for r in got] == [(1, 3)]
    r = got[0]
    assert (r.cn, r.union_deg, r.jaccard_cn) == (1, 1, 1.0)


def test_linkpred_existing_edge_excluded(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.signal_queries import (
        bi_copurchase_linkpred,
    )
    from retail_sales_analysis_etl_bi_project_spark.plans.shared_cache import (
        release,
    )

    release("basket_li")
    # triangle: (1,2), (2,3), AND (1,3) all support-2 edges -> the
    # 1-3 wedge is closed by a real edge -> prediction set empty
    rows = []
    lid = 0

    def add(ok, parts):
        nonlocal lid
        ship = dt.datetime(2024, 6, 1)
        for p in parts:
            lid += 1
            rows.append((ok, p, 1, lid, 1.0, 10.0, 0.0, 0.0, "N", "O", ship))

    for ok, pair in enumerate([(1, 2), (1, 2), (2, 3), (2, 3), (1, 3), (1, 3)]):
        add(20 + ok, list(pair))
    li = spark.createDataFrame(
        rows,
        [
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    sf = str(tmp_path)
    li.write.parquet(f"{sf}/lineitem.parquet")
    try:
        got = bi_copurchase_linkpred(spark, sf).collect()
    finally:
        release("basket_li")
    assert got == []


def test_novelty_first_occurrence_and_empty_docs(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.signal_queries import (
        corpus_ngram_novelty,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "en", "web", 7),      # {a b c, b c d} both first
            (2, "a b c x", "en", "web", 7),      # {a b c(dup), b c x(new)}
            (3, "", "en", "web", 0),             # empty -> one "" shingle, first
            (4, "", "en", "web", 0),             # second empty -> "" is a dup
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    got = {r.doc_id: r for r in corpus_ngram_novelty(spark, sf).collect()}
    assert (got[1].n_shingles, got[1].n_novel, got[1].novelty_frac) == (2, 2, 1.0)
    assert (got[2].n_shingles, got[2].n_novel, got[2].novelty_frac) == (2, 1, 0.5)
    assert (got[3].n_shingles, got[3].n_novel, got[3].novelty_frac) == (1, 1, 1.0)
    assert (got[4].n_shingles, got[4].n_novel, got[4].novelty_frac) == (1, 0, 0.0)
