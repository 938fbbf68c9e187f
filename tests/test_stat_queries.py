"""Round-8 stat queries: coreness fixpoint vs a pure-Python peel on
adversarial graphs, bigram-pairing edge cases, token-budget cutoff
boundary semantics, the exact integer z^2 outlier test vs float math,
and Markov transition-matrix invariants."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.graph import coreness


# ---------------------------------------------------------------- coreness


def _py_coreness(edges, k_max):
    """Reference peel: true coreness by iterating each k to fixpoint."""
    import collections

    out = {}
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    for n in adj:
        out[n] = 1
    cur = {n: set(v) for n, v in adj.items()}
    for k in range(2, k_max + 1):
        changed = True
        while changed:
            changed = False
            for n in list(cur):
                if len(cur[n]) < k:
                    for m in cur[n]:
                        cur[m].discard(n)
                    del cur[n]
                    changed = True
        for n in cur:
            out[n] = k
    return out


def _spark_coreness(spark, edges, k_max=3, rounds=8):
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    rows = coreness(df, k_max=k_max, rounds=rounds).collect()
    return {r.doc_id: r.coreness for r in rows}


def test_coreness_triangle_plus_tail(spark):
    # triangle 0-1-2 (coreness 2) with a pendant chain 2-3-4 (coreness 1)
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    got = _spark_coreness(spark, edges)
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1}


def test_coreness_clique4_reaches_cap(spark):
    # 4-clique: every node coreness 3 (= k_max cap)
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _spark_coreness(spark, edges)
    assert got == {i: 3 for i in range(4)}


def test_coreness_long_chain_needs_rounds(spark):
    # a 12-node path fully dissolves under k=2 only after ~6 peel
    # rounds (two endpoints per round): rounds=8 must reach the true
    # fixpoint (everything coreness 1)
    edges = [(i, i + 1) for i in range(11)]
    got = _spark_coreness(spark, edges, rounds=8)
    assert got == {i: 1 for i in range(12)}
    assert got == _py_coreness(edges, 3)


def test_coreness_matches_python_on_mixed_graph(spark):
    # two triangles bridged by a chain, plus a 4-clique with a pendant
    edges = (
        [(0, 1), (1, 2), (0, 2)]
        + [(10, 11), (11, 12), (10, 12)]
        + [(2, 5), (5, 6), (6, 10)]
        + [(a, b) for a in (20, 21, 22, 23) for b in (20, 21, 22, 23) if a < b]
        + [(23, 30)]
    )
    assert _spark_coreness(spark, edges) == _py_coreness(edges, 3)


# ------------------------------------------------------------- bigram PMI


def test_bigram_pairing_edge_cases(spark):
    # 0-token, 1-token, and null docs contribute no bigrams; the
    # 2-token doc contributes exactly one (the sequence(1,0) == [1,0]
    # descending-sequence gotcha would instead fabricate a reversed
    # pair from 1-token docs)
    from retail_sales_analysis_etl_bi_project_spark.operators.text import (
        tokens_expr,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a"), (3, "  "), (4, None)],
        ["doc_id", "text"],
    )
    t = docs.select(
        F.transform(tokens_expr("text"), lambda x: F.lower(x)).alias("t")
    )
    bg = (
        t.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t)-1),"
                    " i -> struct(t[i-1] AS w1, t[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .collect()
    )
    assert [(r.w1, r.w2) for r in bg] == [("a", "b")]


def test_bigram_pmi_lift_on_tiny_corpus(spark, tmp_path):
    # "x y" always adjacent vs independent unigrams: lift of (x,y)
    # must be (c_xy * T^2) / (B * c_x * c_y) exactly
    from retail_sales_analysis_etl_bi_project_spark.plans.stat_queries import (
        _PMI_MIN_PAIR,
        text_bigram_pmi,
    )

    docs = spark.createDataFrame(
        [(i, "x y filler%d" % (i % 3)) for i in range(6)],
        ["doc_id", "text"],
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    rows = {(r.w1, r.w2): r for r in text_bigram_pmi(spark, sf).collect()}
    assert _PMI_MIN_PAIR <= 6
    r = rows[("x", "y")]
    # T=18 tokens, B=12 bigrams, c_xy=6, c_x=c_y=6
    assert (r.n_pair, r.n_w1, r.n_w2) == (6, 6, 6)
    assert r.lift == ((6.0 * 18.0) * 18.0) / ((12.0 * 6.0) * 6.0)


# ------------------------------------------------------- token budget mix


def test_token_budget_cutoff_boundary(spark, tmp_path):
    # one source, weight 1 (src1 is odd-indexed), budget = T*1 div 2 =
    # half the corpus tokens: the running sum must include the doc that
    # lands EXACTLY on the budget and exclude the first overflow
    from retail_sales_analysis_etl_bi_project_spark.plans.stat_queries import (
        corpus_token_budget_mix,
    )

    # 8 docs x 5 tokens = 40 tokens, budget = 20 -> exactly 4 docs
    docs = spark.createDataFrame(
        [(i, "t t t t t", "src1") for i in range(8)],
        ["doc_id", "text", "source"],
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    rows = corpus_token_budget_mix(spark, sf).collect()
    assert len(rows) == 4
    assert [r.budget_tokens for r in rows] == [20] * 4
    assert [r.cum_tokens for r in rows] == [5, 10, 15, 20]


def test_token_budget_weights_split(spark, tmp_path):
    # src0 (even, wt 2) gets twice src1's (odd, wt 1) share of the
    # global half-token budget
    from retail_sales_analysis_etl_bi_project_spark.plans.stat_queries import (
        corpus_token_budget_mix,
    )

    rows = [(i, "t t t t t t", "src0") for i in range(10)] + [
        (100 + i, "t t t t t t", "src1") for i in range(10)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    got = corpus_token_budget_mix(spark, sf).collect()
    # T=120, sum_wt=3: budgets = 120*2 div 6 = 40 and 120*1 div 6 = 20
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r)
    assert {r.budget_tokens for r in by_src["src0"]} == {40}
    assert {r.budget_tokens for r in by_src["src1"]} == {20}
    assert sum(r.n_tokens for r in by_src["src0"]) == 36  # 6 docs of 6
    assert sum(r.n_tokens for r in by_src["src1"]) == 18  # 3 docs of 6


# ------------------------------------------------------------ anomaly z^2


def test_anomaly_integer_test_matches_float_zscore(spark, tmp_path):
    # counts engineered around the z=2 boundary: one clear spike, one
    # clear dip, the rest inside; the exact integer test must agree
    # with float z-score on every non-boundary day
    import datetime as dt

    from retail_sales_analysis_etl_bi_project_spark.plans.stat_queries import (
        events_anomaly_daily,
    )

    counts = [10, 10, 10, 10, 10, 10, 10, 10, 30, 2]
    rows = []
    eid = 0
    for day, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, 1 + day, 12, 0, 0),
                    eid % 7,
                    "click",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = str(tmp_path)
    ev.write.parquet(f"{sf}/events.parquet")
    got = {r.day.isoformat(): r for r in events_anomaly_daily(spark, sf).collect()}
    n = len(counts)
    mean = sum(counts) / n
    var = sum((x - mean) ** 2 for x in counts) / n
    for day, c in enumerate(counts):
        key = dt.date(2024, 1, 1 + day).isoformat()
        z = abs(c - mean) / math.sqrt(var)
        assert got[key].is_outlier == (1 if z > 2 else 0), (day, c, z)
        assert got[key].direction == (
            1 if c > mean else (-1 if c < mean else 0)
        )
    assert got[dt.date(2024, 1, 9).isoformat()].is_outlier == 1
    assert got[dt.date(2024, 1, 9).isoformat()].direction == 1


# -------------------------------------------------------- markov matrix


def test_markov_rows_and_probabilities(spark, sf_dir):
    from retail_sales_analysis_etl_bi_project_spark.plans.stat_queries import (
        events_markov_transitions,
    )

    rows = events_markov_transitions(spark, sf_dir).collect()
    assert rows, "transition matrix empty at sf0.001"
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for f, rs in by_from.items():
        assert sum(r.n_trans for r in rs) == rs[0].n_from
        assert sum(r.p_trans for r in rs) == pytest.approx(1.0, abs=1e-12)


def test_markov_ordering_uses_event_id_tiebreak(spark, tmp_path):
    # two events at the SAME timestamp: order must fall back to
    # event_id, so the transition is a->b->c, never a->c
    import datetime as dt

    from retail_sales_analysis_etl_bi_project_spark.plans.stat_queries import (
        events_markov_transitions,
    )

    t0 = dt.datetime(2024, 3, 1, 9, 0, 0)
    ev = spark.createDataFrame(
        [
            (1, t0, 7, "a", 1.0, "{}"),
            (2, t0, 7, "b", 1.0, "{}"),
            (3, t0 + dt.timedelta(minutes=1), 7, "c", 1.0, "{}"),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    sf = str(tmp_path)
    ev.write.parquet(f"{sf}/events.parquet")
    got = {
        (r.from_type, r.to_type): r.n_trans
        for r in events_markov_transitions(spark, sf).collect()
    }
    assert got == {("a", "b"): 1, ("b", "c"): 1}


# ------------------------------------------------------- r8b: index/profile


def test_inverted_index_cap_and_order(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.index_queries import (
        _POSTINGS_CAP,
        text_inverted_index,
    )

    # "hot" appears in 12 docs (> cap) with scrambled doc_ids; postings
    # must be the FIRST cap ids in sorted order, df/total_tf uncapped
    ids = [90, 3, 57, 12, 75, 41, 8, 66, 29, 84, 17, 50]
    rows = [(i, "hot hot cold%d" % n) for n, i in enumerate(ids)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    got = {r.term: r for r in text_inverted_index(spark, sf).collect()}
    hot = got["hot"]
    assert hot.df == 12 and hot.total_tf == 24
    expect = ",".join(str(x) for x in sorted(ids)[:_POSTINGS_CAP])
    assert hot.postings == expect
    assert got["cold0"].postings == str(ids[0])


def test_column_profile_nulls_and_distinct(spark, tmp_path):
    import datetime as dt

    from retail_sales_analysis_etl_bi_project_spark.plans.index_queries import (
        etl_column_profile,
    )

    d = dt.datetime(2024, 5, 1)
    rows = [
        (1, 10, "O", 100.0, d, "1-URGENT"),
        (2, 10, None, 100.0, d, "1-URGENT"),
        (3, 20, "F", 100.0, d, None),
    ]
    orders = spark.createDataFrame(
        rows,
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    sf = str(tmp_path)
    orders.write.parquet(f"{sf}/orders.parquet")
    got = {r.col_name: r for r in etl_column_profile(spark, sf).collect()}
    assert set(got) == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_orderdate",
    }
    st = got["o_orderstatus"]
    assert (st.n_rows, st.n_nulls, st.n_distinct) == (3, 1, 2)
    assert (st.min_val, st.max_val) == ("F", "O")
    assert got["o_custkey"].n_distinct == 2
    assert got["o_orderdate"].min_val == "2024-05-01"
    assert got["o_orderpriority"].n_nulls == 1



# ------------------------------------------------ r8d: triangles / trailing


def _py_triangles(edges):
    import collections
    import itertools

    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    cnt = collections.Counter()
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            cnt[x] += 1
            cnt[y] += 1
            cnt[z] += 1
    return dict(cnt)


def _spark_triangles(spark, edges):
    from retail_sales_analysis_etl_bi_project_spark.operators.graph import (
        triangle_counts,
    )

    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    return {
        r.doc_id: r.n_triangles for r in triangle_counts(df).collect()
    }


def test_triangles_k4_and_shared_edge(spark):
    # K4: each node in 3 triangles; two triangles sharing edge (0,1):
    # 0,1 -> 2 each, 2,3 -> 1 each
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _spark_triangles(spark, k4) == {i: 3 for i in range(4)}
    shared = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    assert _spark_triangles(spark, shared) == {0: 2, 1: 2, 2: 1, 3: 1}


def test_triangles_star_is_empty_and_hub_graph_matches_python(spark):
    # star: no triangles at all -> empty result
    star = [(0, i) for i in range(1, 8)]
    assert _spark_triangles(spark, star) == {}
    # skewed hub: node 0 connected to everyone, ring among leaves —
    # exercises the degree orientation (hub must not be a wedge center
    # for every leaf pair)
    hub = [(0, i) for i in range(1, 9)] + [(i, i + 1) for i in range(1, 8)]
    assert _spark_triangles(spark, hub) == _py_triangles(hub)


def test_trailing_7d_range_frame_skips_calendar_gaps(spark, tmp_path):
    import datetime as dt

    from retail_sales_analysis_etl_bi_project_spark.plans.stat_queries import (
        events_trailing_7d_value,
    )

    # days 1..3 then a jump to day 20: the trailing window at day 20
    # must contain ONLY day 20 (a ROWS frame would wrongly pull in the
    # stale days); days 1-3 accumulate normally
    rows = []
    eid = 0
    for day, n in [(1, 2), (2, 3), (3, 4), (20, 5)]:
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(2024, 1, day, 8, 0, 0), eid % 3, "click",
                 1.25, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = str(tmp_path)
    ev.write.parquet(f"{sf}/events.parquet")
    got = {
        r.day.day: r for r in events_trailing_7d_value(spark, sf).collect()
    }
    assert got[1].trailing_7d_events == 2
    assert got[2].trailing_7d_events == 5
    assert got[3].trailing_7d_events == 9
    assert got[20].trailing_7d_events == 5  # gap: only day 20 in range
    assert got[3].trailing_7d_value == 9 * 1.25
    assert got[20].trailing_7d_value == 5 * 1.25


def test_token_budget_digitfree_source_weight_matches_oracle(spark, tmp_path):
    # sources without digits must take the ELSE weight (1) on BOTH
    # engines — the oracle uses TRY_CAST so it falls through like
    # Spark's null-yielding cast instead of hard-erroring (r8 review)
    import duckdb

    from retail_sales_analysis_etl_bi_project_spark.plans import registry
    from retail_sales_analysis_etl_bi_project_spark.plans.stat_queries import (
        corpus_token_budget_mix,
    )

    docs = spark.createDataFrame(
        [(i, "t t t t", "web") for i in range(4)]
        + [(10 + i, "t t t t", "src2") for i in range(4)],
        ["doc_id", "text", "source"],
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    got = corpus_token_budget_mix(spark, sf).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r)
    # T=32, weights: web=1 (no digits), src2=2 -> budgets 5 and 10
    assert {r.budget_tokens for r in by_src["web"]} == {5}
    assert {r.budget_tokens for r in by_src["src2"]} == {10}

    con = duckdb.connect()
    # Spark wrote a parquet DIRECTORY; DuckDB needs the part-file glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    oracle_rows = con.execute(
        registry.ORACLES["corpus_token_budget_mix"]
    ).fetchall()
    assert sorted((r[0], r[4]) for r in oracle_rows) == sorted(
        (r.doc_id, r.budget_tokens) for r in got
    )


def test_cusum_prefix_form_matches_recursion(spark, tmp_path):
    # engineered step change: 10 quiet days then a sustained +8 shift;
    # the prefix-form CUSUM must equal the textbook recursion exactly
    # and alarm during the shifted regime
    import datetime as dt

    from retail_sales_analysis_etl_bi_project_spark.plans.stat_queries import (
        events_cusum_drift,
    )

    counts = [10] * 10 + [18] * 6
    rows = []
    eid = 0
    for day, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, dt.datetime(2024, 2, 1 + day, 10, 0, 0), eid % 5,
                 "click", 1.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = str(tmp_path)
    ev.write.parquet(f"{sf}/events.parquet")
    got = sorted(
        events_cusum_drift(spark, sf).collect(), key=lambda r: r.day
    )

    n = len(counts)
    S = sum(counts)
    SS = sum(c * c for c in counts)
    var_num = n * SS - S * S
    sp = sn = 0
    expect = []
    for c in counts:
        dev = n * c - S
        sp = max(0, sp + dev)
        sn = max(0, sn - dev)
        expect.append((sp, sn, int(sp * sp > 25 * var_num),
                       int(sn * sn > 25 * var_num)))
    assert [
        (int(r.cusum_pos), int(r.cusum_neg), r.drift_up, r.drift_down)
        for r in got
    ] == expect
    # the sustained shift must actually alarm upward at least once
    assert any(e[2] for e in expect)
