"""Hand-computed fixtures for the corpus term-statistics queries
(plans/analysis_queries.py). The registered queries hash-verify the
same pipelines against DuckDB on the documents table; these pin the
arithmetic to known answers on tiny corpora."""

import pytest

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.plans.analysis_queries import (
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


def test_bpe_short_word_guard(spark):
    """length<2 words must emit zero pairs (Spark sequence(1,0) would
    otherwise yield a descending [1,0])."""
    df = spark.createDataFrame(
        [(1, "a b a x", "en", "s", 7)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
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
