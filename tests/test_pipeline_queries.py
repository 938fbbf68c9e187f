"""Round-6 pipeline operators: duplicated-span stats, stratified
sampling, label centroid audit, retention cohorts, RFM segmentation.
Semantic invariants on constructed micro-corpora (the cross-engine
hash equivalence is covered by tools/compare_oracle.py at sf0.01)."""

import math

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.curation import (
    stratified_sample,
)
from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
    duplicated_span_stats,
)
from retail_sales_analysis_etl_bi_project_spark.operators.similarity import (
    label_centroid_stats,
)
import retail_sales_analysis_etl_bi_project_spark.plans.pipeline_queries  # noqa: F401
from retail_sales_analysis_etl_bi_project_spark.plans.registry import QUERIES


def test_duplicated_span_stats_micro(spark):
    boiler = "one two three four five six seven eight"  # exactly 8 tokens
    docs = spark.createDataFrame(
        [
            (1, boiler + " unique1a unique1b"),
            (2, boiler + " unique2a unique2b"),
            (3, "nine ten eleven twelve"),  # short doc: single full-join span
            (4, None),  # NULL text -> empty tokens -> 1 span of ''
            (5, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in duplicated_span_stats(docs, n=8).collect()}
    # 10 tokens -> 3 positional spans; only the first (the shared 8-gram
    # boilerplate) occurs in both docs 1 and 2
    assert rows[1].n_spans == 3 and rows[1].dup_spans == 1
    assert rows[2].n_spans == 3 and rows[2].dup_spans == 1
    assert rows[1].dup_frac == round(1 / 3, 6)
    # short doc: its single span is unique
    assert rows[3].n_spans == 1 and rows[3].dup_spans == 0
    # NULL and blank text both collapse to the same empty-join span,
    # which therefore counts as duplicated across docs 4 and 5
    assert rows[4].n_spans == 1 and rows[4].dup_spans == 1
    assert rows[5].dup_frac == 1.0


def test_duplicated_span_identical_docs(spark):
    text = " ".join(f"tok{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, text), (2, text)], ["doc_id", "text"]
    )
    rows = duplicated_span_stats(docs, n=8).collect()
    assert all(r.dup_frac == 1.0 and r.n_spans == 13 for r in rows)


def test_stratified_sample_exact_fraction(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    strata_sizes = {
        (r.lang, r.source): r.n
        for r in docs.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    sample = stratified_sample(docs, frac=0.25).collect()
    got = {}
    for r in sample:
        got[(r.lang, r.source)] = got.get((r.lang, r.source), 0) + 1
        assert r.rn <= math.ceil(0.25 * r.n_stratum)
    for k, n in strata_sizes.items():
        assert got.get(k, 0) == math.ceil(0.25 * n), k
    # determinism: same ids on a rerun
    again = {r.doc_id for r in stratified_sample(docs, frac=0.25).collect()}
    assert again == {r.doc_id for r in sample}


def test_label_centroid_stats_micro(spark):
    # two labels: label 0 = opposite unit vectors (centroid 0, mean norm 1);
    # label 1 = identical unit vectors (centroid norm == mean norm == 1)
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (0, [-1.0, 0.0]),
            (1, [0.6, 0.8]),
            (1, [0.6, 0.8]),
        ],
        ["label", "embedding"],
    )
    rows = {r.label: r for r in label_centroid_stats(emb).collect()}
    assert rows[0].n_vecs == 2
    assert rows[0].centroid_norm == 0.0 and rows[0].mean_norm == 1.0
    assert rows[1].centroid_norm == 1.0 and rows[1].mean_norm == 1.0


def test_retention_cohorts_invariants(spark, sf_dir):
    out = QUERIES["events_retention_cohorts"](spark, sf_dir)
    rows = out.collect()
    assert rows, "retention triangle must be non-empty"
    assert all(r.day_offset >= 0 for r in rows)
    # day 0 of each cohort counts the whole cohort, so it must be the
    # max across the cohort's offsets
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_date, {})[r.day_offset] = r.n_users
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = events.select("user_id").distinct().count()
    assert sum(c[0] for c in by_cohort.values()) == n_users
    for offsets in by_cohort.values():
        assert offsets[0] == max(offsets.values())


def test_rfm_segmentation_invariants(spark, sf_dir):
    out = QUERIES["bi_rfm_segmentation"](spark, sf_dir)
    rows = out.collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4
        assert r.segment_revenue > 0
    # quartiles are balanced: each r_score stratum holds ~n/4 customers
    per_r = {}
    for r in rows:
        per_r[r.r_score] = per_r.get(r.r_score, 0) + r.n_customers
    assert max(per_r.values()) - min(per_r.values()) <= 1


def test_pack_sharded_equals_one_window(spark, sf_dir):
    from retail_sales_analysis_etl_bi_project_spark.operators.curation import (
        pack_sequences,
        pack_sequences_sharded,
    )
    from retail_sales_analysis_etl_bi_project_spark.operators.text import (
        token_count_expr,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", token_count_expr("text").alias("n_tokens"))
    )
    cols = ["source", "seq_id", "doc_id", "n_tokens", "tok_lo", "tok_hi"]
    base = sorted(map(tuple, pack_sequences(docs, budget=512).select(cols).collect()))
    # block_size=16 -> many blocks per source; output must be row-identical
    shard = sorted(
        map(
            tuple,
            pack_sequences_sharded(docs, budget=512, block_size=16)
            .select(cols)
            .collect(),
        )
    )
    assert base == shard
    # micro edge case: a doc spanning a block boundary AND the budget
    tiny = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 900), ("a", 17, 600), ("b", 3, 50)],
        ["source", "doc_id", "n_tokens"],
    )
    b = sorted(map(tuple, pack_sequences(tiny, budget=512).select(cols).collect()))
    s = sorted(
        map(
            tuple,
            pack_sequences_sharded(tiny, budget=512, block_size=16)
            .select(cols)
            .collect(),
        )
    )
    assert b == s


def test_funnel_conversion_invariants(spark, sf_dir):
    rows = QUERIES["events_funnel_conversion"](spark, sf_dir).collect()
    assert rows
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = events.select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        # funnel stages are monotone non-increasing
        assert r.n_users >= r.n_viewed >= r.n_clicked >= r.n_purchased >= 0
        assert r.purchase_rate == round(r.n_purchased / r.n_users, 6)


def test_span_stats_null_text_matches_oracle(spark, tmp_path):
    """Latent-case pin: NULL/blank text docs must survive BOTH engines
    identically (Spark's concat_ws folds a NULL token array to '';
    the oracle coalesces to [] for the same single-'' span)."""
    import duckdb

    from retail_sales_analysis_etl_bi_project_spark.plans.pipeline_queries import (
        _SQL_TOKS_NULLSAFE,
    )
    from retail_sales_analysis_etl_bi_project_spark.plans.registry import ORACLES

    pdf = spark.createDataFrame(
        [(1, "a b c d e f g h extra"), (2, "a b c d e f g h extra"),
         (3, None), (4, ""), (5, "short doc")],
        ["doc_id", "text"],
    ).toPandas()
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)
    docs = spark.read.parquet(path)
    got = sorted(
        (r.doc_id, r.n_spans, r.dup_spans) for r in duplicated_span_stats(docs).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    sql = ORACLES["dedup_substring_spans"]
    want = sorted((r[0], r[1], r[2]) for r in con.execute(sql).fetchall())
    assert got == want
    assert len(got) == 5  # the NULL-text doc is NOT dropped


def test_degenerate_docs_cross_engine(spark, tmp_path):
    """NULL-text / blank / sub-n-token docs through every shingle-family
    oracle: Spark's concat_ws folds empty token arrays to '' while
    DuckDB's array_to_string([]) is NULL, so every oracle wraps it in
    coalesce — this pins the whole family on a corpus made ONLY of the
    degenerate cases the real testdata lacks."""
    import duckdb

    import retail_sales_analysis_etl_bi_project_spark.plans.corpus_queries  # noqa: F401
    import retail_sales_analysis_etl_bi_project_spark.plans.dedup_queries  # noqa: F401
    import retail_sales_analysis_etl_bi_project_spark.plans.text_queries  # noqa: F401
    from retail_sales_analysis_etl_bi_project_spark.plans.registry import ORACLES, QUERIES

    pdf = spark.createDataFrame(
        [
            (0, "", "en", "s0", 0),
            (1, None, "en", "s0", 0),
            (2, "one", "en", "s1", 3),
            (3, "a b", "de", "s1", 3),
            (4, "shared passage of words here repeated verbatim", "en", "s2", 46),
            (5, "shared passage of words here repeated verbatim", "en", "s2", 46),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).toPandas()
    sf = tmp_path / "sf_degenerate"
    sf.mkdir()
    pdf.to_parquet(str(sf / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    for name in (
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "text_winnow_fingerprints",
        "dedup_substring_spans",
        "text_profile",
        "text_repetition_signals",
    ):
        sdf = QUERIES[name](spark, str(sf))
        scols = sorted(sdf.columns)
        srows = sorted(
            tuple(str(r[c]) for c in scols) for r in (row.asDict() for row in sdf.collect())
        )
        res = con.execute(ORACLES[name])
        dcols = sorted(d[0] for d in res.description)
        idx = [
            [d[0] for d in res.description].index(c) for c in dcols
        ]
        drows = sorted(tuple(str(r[i]) for i in idx) for r in res.fetchall())
        assert scols == dcols, name
        assert srows == drows, f"{name}: spark={srows[:4]} duckdb={drows[:4]}"
