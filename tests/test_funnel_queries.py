"""Round-13 session-4 queries: curation-funnel accounting invariants
(stage sums telescope to raw; attribution agrees with the pipeline's
survivors) and a hand-computed embedding-norm audit."""

from pyspark.sql import functions as F


def test_funnel_telescopes_and_matches_pipeline(spark, sf_dir):
    """Conservation + consistency: the funnel's stage counts must sum
    to the raw count, and its '5_kept' row must equal the row count of
    corpus_filter_pipeline's survivor output — the two queries share
    predicates by construction and may never drift."""
    from retail_sales_analysis_etl_bi_project_spark.plans.corpus_queries import (
        corpus_filter_pipeline,
    )
    from retail_sales_analysis_etl_bi_project_spark.plans.retrieval_queries import (
        corpus_curation_funnel,
    )

    rows = {r.stage: r for r in corpus_curation_funnel(spark, sf_dir).collect()}
    raw = rows["0_raw"].n_docs
    dropped_plus_kept = sum(
        r.n_docs for s, r in rows.items() if s != "0_raw"
    )
    assert dropped_plus_kept == raw
    assert rows["0_raw"].frac_of_raw == 1.0
    kept = rows["5_kept"].n_docs
    assert kept == corpus_filter_pipeline(spark, sf_dir).count()
    for r in rows.values():
        assert r.frac_of_raw == r.n_docs / raw


def test_embed_norm_stats_hand_computed(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.robust_queries import (
        embed_norm_stats_by_label,
    )

    # label 0: norms 3, 5, 13 (classic integer right triangles) ->
    # median is the rank-2 selection = 5.0; label 1: single vector.
    rows = [
        (0, [3.0, 0.0], 0),
        (1, [3.0, 4.0], 0),      # norm 5
        (2, [5.0, 12.0], 0),     # norm 13
        (3, [8.0, 6.0], 1),      # norm 10
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    out = {r.label: r for r in
           embed_norm_stats_by_label(spark, str(tmp_path)).collect()}
    assert out[0].n_vecs == 3
    assert (out[0].min_norm, out[0].median_norm, out[0].max_norm) == (
        3.0, 5.0, 13.0)
    assert out[1].n_vecs == 1
    assert (out[1].min_norm, out[1].median_norm, out[1].max_norm) == (
        10.0, 10.0, 10.0)
