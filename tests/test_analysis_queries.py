"""Hand-computed fixtures for the corpus term-statistics queries
(plans/analysis_queries.py). The registered queries hash-verify the
same pipelines against DuckDB on the documents table; these pin the
arithmetic to known answers on tiny corpora."""

import pytest

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.plans.analysis_queries import (
    _PIVOT_YEARS,
    bi_revenue_cube_status_year,
    bi_revenue_pivot_priority_year,
    dedup_fuzzy_name_pairs,
    text_bpe_pair_merge,
    text_corpus_contrast,
    text_tfidf_topterms,
)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """4-doc corpus with known term statistics, written as a parquet
    documents table so the registered query builders run unchanged."""
    rows = [
        (1, "apple banana apple", "en", "s1", 18),
        (2, "banana cherry", "en", "s1", 13),
        (3, "apple durian durian durian", "fr", "s2", 26),
        (4, "", "fr", "s2", 0),  # blank doc: no tokens, still counted in N
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    d = str(tmp_path_factory.mktemp("analysis") / "docs")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_tfidf_known(spark, corpus):
    out = {
        (r.doc_id, r.rnk): r for r in text_tfidf_topterms(spark, corpus).collect()
    }
    # N=4. df: apple 2, banana 2, cherry 1, durian 1.
    # doc 1: apple tf=2 -> 2*5/3; banana tf=1 -> 1*5/3 — apple ranks 1st.
    r11 = out[(1, 1)]
    assert r11.term == "apple" and r11.tf == 2 and r11.df == 2
    assert r11.tfidf == pytest.approx(2 * 5 / 3)
    assert out[(1, 2)].term == "banana"
    # doc 2: cherry (tf1,df1: 5/2=2.5) beats banana (tf1,df2: 5/3)
    assert out[(2, 1)].term == "cherry"
    assert out[(2, 1)].tfidf == pytest.approx(2.5)
    # doc 3: durian tf=3 df=1 -> 3*5/2 = 7.5 top
    assert out[(3, 1)].term == "durian"
    assert out[(3, 1)].tfidf == pytest.approx(7.5)
    # blank doc emits no terms; every doc emits at most top-3
    assert not any(k[0] == 4 for k in out)
    assert max(k[1] for k in out) <= 3


def test_bpe_pairs_known(spark, corpus):
    got = {r.pair: (r.pair_count, r.n_words) for r in
           text_bpe_pair_merge(spark, corpus).collect()}
    # 'an': twice per 'banana' (2 occurrences -> 4) + once per 'durian'
    # (3 occurrences -> 3) = 7 across 2 distinct words; 'ri' once per
    # 'durian' (3) = 3; 'ap'/'pp'/'pl'/'le' once per 'apple' (3) = 3.
    assert got["an"] == (7, 2)
    assert got["ri"] == (3, 1)
    assert got["ap"] == (3, 1)
    # single-char words would emit nothing (guarded sequence)
    assert "" not in got and all(len(p) == 2 for p in got)


def test_bpe_short_word_guard(spark, tmp_path):
    """length<2 words must emit zero pairs (Spark sequence(1,0) would
    otherwise yield a descending [1,0])."""
    df = spark.createDataFrame(
        [(1, "a b a x", "en", "s", 7)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path / "short")
    df.write.parquet(f"{d}/documents.parquet")
    assert text_bpe_pair_merge(spark, d).count() == 0


def test_corpus_contrast_below_support_is_empty(spark, corpus):
    """No fixture term reaches the min-support of 10 occurrences, so
    the contrast result must be empty — the support gate works."""
    assert text_corpus_contrast(spark, corpus).collect() == []


def test_corpus_contrast_known(spark, tmp_path):
    """Closed-form check: en-only 'zebra' (10x) vs fr-only 'yak' (12x).
    tot_en=10, tot_rest=12; zebra ratio = (10.5*12.5)/(0.5*10.5) = 25.0,
    yak ratio = (0.5*12.5)/(12.5*10.5) = 1/21."""
    rows = [
        (1, " ".join(["zebra"] * 10), "en", "s1", 59),
        (2, " ".join(["yak"] * 12), "fr", "s2", 47),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    d = str(tmp_path / "contrast")
    df.write.parquet(f"{d}/documents.parquet")
    got = {r.term: r for r in text_corpus_contrast(spark, d).collect()}
    assert set(got) == {"zebra", "yak"}
    assert got["zebra"].n_en == 10 and got["zebra"].n_rest == 0
    assert got["zebra"].en_ratio == pytest.approx((10.5 * 12.5) / (0.5 * 10.5))
    assert got["yak"].en_ratio == pytest.approx((0.5 * 12.5) / (12.5 * 10.5))
    # en-distinctive term ranks first
    first = text_corpus_contrast(spark, d).collect()[0]
    assert first.term == "zebra"


def test_pivot_unpivot_roundtrip(spark, sf_dir):
    """The pivot cross-tab must melt back (unpivot/Expand, no shuffle)
    to exactly the long-form year/priority revenue aggregate, and its
    wide totals must equal the plain groupBy totals."""
    # span guard: the declared pivot values must cover the data's actual
    # year range — if the testdata generator ever drifts outside
    # 1995-2001, the pivot AND its oracle would drop those years
    # identically and the hash gate could not see it; this assertion can
    from retail_sales_analysis_etl_bi_project_spark.sources.tables import (
        load_table as _lt,
    )

    span = (
        _lt(spark, sf_dir, "orders")
        .agg(
            F.min(F.year("o_orderdate")).alias("lo"),
            F.max(F.year("o_orderdate")).alias("hi"),
        )
        .collect()[0]
    )
    assert span.lo >= min(_PIVOT_YEARS) and span.hi <= max(_PIVOT_YEARS)

    wide = bi_revenue_pivot_priority_year(spark, sf_dir)
    assert wide.columns == ["priority"] + [f"y{y}" for y in _PIVOT_YEARS]
    long = wide.unpivot(
        "priority",
        [f"y{y}" for y in _PIVOT_YEARS],
        "year_col",
        "revenue",
    ).filter(F.col("revenue").isNotNull())

    from retail_sales_analysis_etl_bi_project_spark.functions.money import (
        revenue_expr,
    )
    from retail_sales_analysis_etl_bi_project_spark.sources.tables import (
        load_table,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ref = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
    )
    got = {(r.priority, r.year_col): r.revenue for r in long.collect()}
    want = {(r.priority, f"y{r.o_year}"): r.revenue for r in ref.collect()}
    assert got == want  # exact decimal sums -> exact double equality
    # unpivot compiles to Expand (a narrow, shuffle-free op)
    long_plan = long._jdf.queryExecution().optimizedPlan().toString()
    assert "Expand" in long_plan


def test_fuzzy_name_pairs_known(spark, tmp_path):
    """Hand-computed SymSpell check with an exact-duplicate name: the
    two 'anna' customers form one within-name pair (C(2,2)=1, lev 0),
    each pairs with 'ana' (2*1=2, one deletion), bob/bobb (insertion)
    and bob/rob (substitution via shared key 'ob') are found; bobb/rob
    is lev 2 and shares no deletion key; carol pairs with nothing."""
    rows = [
        (1, "anna"), (2, "ana"), (3, "bob"), (4, "bobb"),
        (5, "rob"), (6, "carol"), (7, "anna"),
    ]
    df = spark.createDataFrame(rows, "c_custkey bigint, c_name string")
    d = str(tmp_path / "fuzzy")
    df.write.parquet(f"{d}/customer.parquet")
    out = dedup_fuzzy_name_pairs(spark, d).collect()[0]
    assert out.n_names == 7
    # 1 within-name (anna,anna) + 2 (anna,ana) + 1 (bob,bobb) + 1 (bob,rob)
    assert out.n_dup_pairs == 5
    assert out.n_candidate_pairs == 5  # no false candidates in this fixture


def test_spark_duckdb_levenshtein_agree(spark):
    """Both engines implement classic unit-cost Levenshtein."""
    import duckdb

    cases = [
        ("kitten", "sitting"), ("anna", "ana"), ("bob", "bobb"),
        ("", "abc"), ("same", "same"), ("ab", "ba"),
    ]
    got_spark = (
        spark.createDataFrame(cases, "a string, b string")
        .select(F.levenshtein("a", "b").alias("d"))
        .collect()
    )
    con = duckdb.connect()
    for (a, b), r in zip(cases, got_spark):
        assert con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0] == r.d


def test_cube_planes_consistent(spark, sf_dir):
    """The four CUBE planes must agree: the grand total (gid=3) equals
    the sum of the detail cells (gid=0) and of each one-dim margin, and
    gid distinguishes subtotal rows from genuine NULL keys."""
    rows = bi_revenue_cube_status_year(spark, sf_dir).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    grand = by_gid[3]
    assert len(grand) == 1 and grand[0].status is None and grand[0].year is None
    detail_sum = sum(r.revenue for r in by_gid[0])
    year_margin_sum = sum(r.revenue for r in by_gid[2])  # grouped by year
    status_margin_sum = sum(r.revenue for r in by_gid[1])  # grouped by status
    # decimal partials -> double only at the end; planes agree to fp noise
    assert detail_sum == pytest.approx(grand[0].revenue, rel=1e-12)
    assert year_margin_sum == pytest.approx(grand[0].revenue, rel=1e-12)
    assert status_margin_sum == pytest.approx(grand[0].revenue, rel=1e-12)


def test_tv_drift_hand_computed(spark, tmp_path):
    """Exact-fraction check of the integer TV-distance form on a
    2-source corpus: s1='a a b', s2='b c' -> corpus (a:2,b:2,c:1,N=5);
    TV(s1) = ½(|2/3−2/5|+|1/3−2/5|+|0−1/5|) = 4/15, TV(s2) = 8/20.
    The integer form must land on the same doubles: (Σ|n_st·N−n_t·Ns|
    + Ns·(N−Σ present n_t)) / (2·Ns·N)."""
    import __spark_entry__ as entrymod

    docs = spark.createDataFrame(
        [(1, "a a b", "en", "s1"), (2, "b c", "en", "s2")],
        "doc_id long, text string, lang string, source string",
    )
    out = str(tmp_path / "documents.parquet")
    docs.write.parquet(out)
    # the loader reads <sf_dir>/documents.parquet
    got = {
        r.source: (r.n_tokens, r.n_terms, r.tv_drift)
        for r in entrymod.queries()["corpus_source_tv_drift"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["s1"] == (3, 2, 8 / 30)
    assert got["s2"] == (2, 2, 8 / 20)
