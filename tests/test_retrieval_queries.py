"""Round-13 retrieval-fusion / curation queries
(plans/retrieval_queries.py): engineered corpora with hand-computable
RRF scores, a planted cross-split 8-gram, a planted per-source
template shingle, and a target-vocabulary importance ordering."""

from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _write_embs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")


def test_rrf_fusion_hand_computed(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.retrieval_queries import (
        text_hybrid_rrf_fusion,
    )

    # doc 1 dominates BOTH legs: it alone contains the BM25 query
    # terms, and its embedding equals the probe (vec 0). doc 2 appears
    # only in the cosine leg, doc 3 only (weakly) nowhere.
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "window merge scan window merge scan", "en", "s", 30),
            (2, "nothing relevant here at all", "en", "s", 28),
            (3, "other filler text entirely", "en", "s", 26),
        ],
    )
    _write_embs(
        spark,
        tmp_path,
        [
            (0, [1.0, 0.0], 0),   # probe
            (1, [2.0, 0.0], 0),   # cosine 1.0 to probe
            (2, [1.0, 1.0], 0),   # cosine ~0.707
            (3, [0.0, 1.0], 0),   # cosine 0.0
        ],
    )
    rows = text_hybrid_rrf_fusion(spark, sf).collect()
    byid = {r.doc_id: r for r in rows}
    # doc 1: rank 1 in both legs -> 2/61
    assert byid[1].bm25_rank == 1 and byid[1].cosine_rank == 1
    assert byid[1].rrf_score == 1.0 / 61.0 + 1.0 / 61.0
    # doc 2: cosine leg only (rank 2), no bm25 leg
    assert byid[2].bm25_rank is None and byid[2].cosine_rank == 2
    assert byid[2].rrf_score == 1.0 / 62.0
    assert rows[0].doc_id == 1  # fused order leads with the dual hit


def test_decontaminate_audit_planted_8gram(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        hash60_expr,
    )
    from retail_sales_analysis_etl_bi_project_spark.plans.retrieval_queries import (
        corpus_decontaminate_audit,
    )

    # find one train-bucket id (<800) and one eval-bucket id (>=800)
    # under the production split hash, then plant a shared 8-gram
    buckets = {
        r.id: r.b
        for r in spark.range(200)
        .select("id", (hash60_expr(F.col("id").cast("string")) % 1000).alias("b"))
        .collect()
    }
    trid = next(i for i, b in buckets.items() if b < 800)
    evid = next(i for i, b in buckets.items() if b >= 800)
    shared = "a b c d e f g h"  # exactly one 8-gram
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (trid, shared + " trainword", "en", "s", 20),  # 2 distinct 8-grams
            (evid, shared, "en", "s", 15),
        ],
    )
    rows = corpus_decontaminate_audit(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.doc_id == trid
    assert r.n_grams == 2 and r.n_contaminated == 1
    assert r.contaminated_frac == 0.5


def test_boilerplate_template_flagged_per_source(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.retrieval_queries import (
        text_boilerplate_by_source,
    )

    # source 's': 10 docs all opening with the same 3-gram template;
    # threshold max(3, 10 div 5) = 3, template df = 10 -> flagged.
    # source 't': 2 docs with disjoint text -> zero boilerplate.
    rows = [
        (i, f"x y z u{i} v{i} w{i}", "en", "s", 20) for i in range(10)
    ] + [
        (100, "p q r s t", "en", "t", 10),
        (101, "f g h i j", "en", "t", 10),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in text_boilerplate_by_source(spark, sf).collect()}
    assert out["s"].n_docs == 10
    assert out["s"].top_shingle == "x y z" and out["s"].top_df == 10
    assert out["s"].n_boiler_shingles == 1
    assert out["t"].n_boiler_shingles == 0 and out["t"].top_shingle is None


def test_dsir_targets_rank_above_offdomain(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.retrieval_queries import (
        corpus_dsir_importance_sample,
    )

    # en docs share an en vocabulary, the 'xx' doc uses disjoint terms:
    # its buckets carry (almost) no target mass, so its weight must
    # rank strictly below every en doc's.
    rows = [
        (i, "alpha beta gamma delta epsilon", "en", "s", 30)
        for i in range(3)
    ] + [(9, "zulu yankee xray whiskey victor", "xx", "s", 30)]
    sf = _write_docs(spark, tmp_path, rows)
    out = corpus_dsir_importance_sample(spark, sf).collect()
    assert len(out) == 4
    ranks = {r.doc_id: r.rank for r in out}
    weights = {r.doc_id: r.weight_ppm for r in out}
    assert ranks[9] == 4  # off-domain doc ranks last
    assert all(weights[i] > weights[9] for i in range(3))
    # weights are <= 1e6 by construction (target mass <= corpus mass)
    assert all(r.weight_ppm <= 1_000_000 for r in out)
