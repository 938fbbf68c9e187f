"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (reference docx:q1 — top-5
products by revenue) at sf0.001. ``queries()``/``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 with DuckDB oracle twins
(driver hash-compares at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    # Importing the plan/operator modules populates the registry.
    from retail_sales_analysis_etl_bi_project_spark.plans import registry
    import retail_sales_analysis_etl_bi_project_spark.plans.bi  # noqa: F401

    for mod in (
        "retail_sales_analysis_etl_bi_project_spark.plans.dedup_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.similarity_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.join_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.text_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.etl_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.sql_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.extra_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.agg_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.misc_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.corpus_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.json_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.window_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.events_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.extension_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.pipeline_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.lifecycle_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.analysis_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.stat_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.index_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.basket_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.signal_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.eval_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.trend_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.robust_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.retrieval_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.assoc_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.vocab_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.quality_queries",
        "retail_sales_analysis_etl_bi_project_spark.plans.linalg_queries",
    ):
        try:
            __import__(mod)
        except ImportError as e:
            # graceful skip for incremental rounds, but VISIBLE: a real
            # import breakage must not silently shrink the registry
            # (bench/correctness would read the loss as improvement)
            import sys

            print(
                f"WARNING __spark_entry__: {mod} failed to import: {e}",
                file=sys.stderr,
            )
    return registry


# Correctness-window rotation: the driver hash-checks only the FIRST 50
# registered queries, so new queries rotate INTO the window and
# long-stable queries — each with an in-window mechanism sibling and
# >=2 green driver rounds — rotate past it. Rotated-out queries stay
# fully registered and are verified every round by the local gate
# replica (tools/compare_oracle.py runs the WHOLE registry). The
# per-round rationale for every spill below lives in COVERAGE.md
# §"Correctness window rotation" (rounds 5-9); tags here are the
# one-line reminders.
_PAST_WINDOW = (
    # r5-r6 spills: spark.sql/agg/window/join/staging variants of
    # in-window siblings, plus ANN/LSH paths recomputed inside the
    # in-window recall audits (sim_ann_recall / dedup_family_recall)
    "sql_q01_top5_products",          # spark.sql twin of q01
    "agg_rollup_year_month",          # superset of q02's year/month agg
    "dedup_ngram_jaccard",            # all-pairs baseline of minhash path
    "events_sliding_3h_daily",        # sliding twin of tumbling hourly agg
    "window_customer_running_total",  # window-frame sibling of ranked cuts
    "join_semi_active_customers",     # semi twin of expectations anti-join
    "etl_upsert_dim_date",            # converges to dim_date build rows
    "etl_csv_roundtrip",              # staging twin of in-window ORC roundtrip
    "sim_ivf_multiprobe_topk",        # recomputed inside sim_ann_recall
    "sim_ivf_kmedians_topk",          # recomputed inside sim_ann_recall
    "dedup_embedding_cosine",         # recomputed inside dedup_family_recall
    "sim_lsh_ann_topk",               # recomputed inside sim_ann_recall
    "events_dedup_first_per_key",     # row_number-first, as stratified cuts
    "window_top3_parts_per_brand",    # rank-over-partition family
    "agg_order_value_percentiles",    # percentile path, sketch twin in-window
    "sim_bruteforce_topk",            # truth set inside sim_ann_recall
    "sim_ivf_ann_topk",               # recomputed inside sim_ann_recall
    "sim_ivfpq_adc_topk",             # recomputed inside sim_ann_recall
    "dedup_embedding_lsh",            # recomputed inside dedup_family_recall
    "dedup_minhash_lsh",              # candidates inside dedup_family_recall
    "dedup_hash_groups",              # exact stage inside corpus_filter_pipeline
    "etl_dim_date_build",             # rows converge w/ upsert; golden pytest
    "etl_quality_audit",              # superseded by etl_expectations_report
    "events_hourly_agg",              # tumbling twin + streaming==batch tests
    "corpus_sample_and_pack",         # pack rows == corpus_pack_sharded
    # r6f-r7 spills: groupBy-sum / staging / signal / window-chain
    # shapes, each mechanism-covered by a named in-window sibling
    "skew_salted_revenue_by_segment", # rows == plain groupBy-sum (q03/q04)
    "tpch_q5_local_supplier_volume",  # broadcast-dim multi-join, as q03
    "join_asof_last_purchase",        # as-of inside join_scd2_pit_attribution
    "tpch_q1_pricing_summary",        # multi-agg decimal sums, q02/kpi family
    "etl_json_roundtrip",             # staging twin of in-window ORC roundtrip
    "text_profile",                   # signals inside corpus_filter_pipeline
    "corpus_split_assignment",        # hash-bucket cut, stratified family
    "events_sessionization",          # user_id shuffle + window chain
    "etl_scd2_priority_history",      # SCD2 build inside pit-attribution
    "etl_surrogate_keys_customer",    # row_number surrogate keys family
    "dedup_corpus_after_removal",     # anti-join endpoint over shared pairs
    "join_range_value_bands",         # grid-cell family of interval overlap
    "text_winnow_fingerprints",       # positional hashing, as substring spans
    # r8 spills: tf/JSON/graph-readout/cohort/ranked-cut/gapfill shapes
    "text_top_tokens",                # tf stage + top-k, as tfidf/term stats
    "events_json_and_moments",        # JSON path, as events_variant_stats
    "dedup_graph_stats",              # readout of dedup_cluster_components
    "events_retention_cohorts",       # user_id shuffle + cohort windows
    "corpus_stratified_sample",       # hash-ranked cut, as token_budget_mix
    "bi_daily_revenue_gapfill",       # day collapse + sequence explode
    # r9 spills (rotating IN: the 11 r8 past-window queries +
    # dedup_containment_recall; every spill below has >=2 green driver
    # rounds + replica green at HEAD; full rationale in COVERAGE.md)
    "sim_ann_recall_tuning",          # knob ladder over in-window sim_ann_recall
    "bi_rfm_segmentation",            # rank/ntile windows, as bi_pareto (in)
    "text_tfidf_topterms",            # shared-tf ranks, as term_stats/inverted index
    "text_bpe_pair_merge",            # adjacent-pair counts, as text_bigram_pmi
    "text_corpus_contrast",           # rational tf contrast, as term_stats_shared
    "dedup_fuzzy_name_pairs",         # bucket-pairs + verify, as containment (in)
    "text_repetition_signals",        # signal exprs, as quality_classifier +
                                      # substring spans' dup fractions (both in)
    "corpus_chunk_documents",         # sequence explode, as upsample_epochs (in)
    "events_funnel_conversion",       # user_id shuffle + windows, as markov
    "agg_numeric_histograms",         # bucket->groupBy-count, as q04 CASE agg
    "bi_revenue_pivot_priority_year", # pivot agg, as cube_status_year (in)
    "embed_label_centroids",          # embedding array-agg audit, as quantize_int8
    # r9b — dedup_minhash_recall_tuning (banding ladder) rotates IN
    # within the round (replica-green at sf0.01 AND sf0.001); spill:
    "etl_snapshot_cdc_diff",          # full-outer set-diff, as in-window
                                      # dedup_containment_recall's full-outer
                                      # audit; CDC swap pinned by streaming
                                      # tests; green r6b-r8
    # r11 spills: the two r10 prefix-filter joins rotate IN as
    # first-class queries (r10 VERDICT item 2); each spill below has
    # >=2 green driver rounds (r9+r10) and its mechanism stays
    # in-window via the new queries themselves (ledger: COVERAGE.md)
    "dedup_containment_pairs",        # blocked containment; exact sibling
                                      # dedup_containment_prefix_join (in) +
                                      # recall audit dedup_containment_recall
                                      # (in) re-runs the blocked path
    "dedup_cluster_canonical",        # rank-readout of in-window
                                      # dedup_cluster_components; window-rank
                                      # mechanism as bi_pareto (in)
    # r12 spills (the four r11b queries rotate IN via _PROMOTED; each
    # spill below has >=2 green driver rounds and an in-window
    # mechanism sibling; ledger in COVERAGE.md §rotation r12)
    "events_anomaly_daily",           # per-day z² flags; rolling day-stats
                                      # mechanism as events_trailing_7d_value (in)
    "events_cusum_drift",             # running-sum drift; cumulative window
                                      # frame as events_trailing_7d_value (in)
    "dedup_minhash_recall_tuning",    # banding ladder; the minhash-LSH path
                                      # re-runs inside dedup_family_recall (in)
    "graph_triangle_counts",          # degree-oriented iterative graph family,
                                      # as graph_kcore_coreness (in)
    # r13 spills (r12 VERDICT items 3+7): the ten r12b/c queries rotate
    # IN via _PROMOTED (their first-ever driver hash rounds); the two
    # permanently-no_oracle sketch queries and eight 6-12×-green
    # naturals rotate out to make room. Ledger: COVERAGE.md §rotation r13.
    "agg_sketch_profile",             # KLL sketch — no SQL twin, rows-only at
                                      # driver forever; banded local check +
                                      # merge-pinned pytests are its real gate
    "agg_incremental_distinct_hll",   # HLL distinct — same no_oracle class
    "multimodal_feature_extract",     # 12 green rounds (r1-r12); mapInPandas
                                      # Arrow path stays in-window via
                                      # multimodal_frame_sample (promoted)
    "corpus_filter_pipeline",         # 12 green rounds; filter exprs in-window
                                      # via langid sweep/kappa family
    "events_variant_stats",           # 7 green rounds; JSON variant path, as
                                      # events_value_ks_drift (promoted, same tbl)
    "etl_orc_roundtrip",              # 7 green rounds; staging roundtrip family
                                      # (csv/json twins long past-window)
    "dedup_substring_spans",          # 7 green rounds; positional hashing, as
                                      # corpus_ngram_novelty (promoted, shingles)
    "corpus_pack_sharded",            # 7 green rounds; packing mechanism
                                      # in-window via corpus_curation_funnel
                                      # (r15: pack_bpe_budget spilled)
    "sim_ann_recall",                 # 7 green rounds; ANN recall audit — its
                                      # IVF/LSH/PQ paths re-audited in-window by
                                      # sim_matryoshka_recall (promoted)
    "dedup_family_recall",            # 7 green rounds; minhash/cosine recall
                                      # audit; LSH path in-window via
                                      # dedup_minhash_auc + semantic_recall
    # r13 session-2 spills: displaced by promoting the seven new r13
    # queries in their birth round; each name below has >=5 green
    # driver rounds and an in-window mechanism relative (ledger in
    # COVERAGE.md §rotation r13)
    "dedup_cluster_components",       # 10 green rounds; CC readout family,
                                      # graph mechanisms in-window via pagerank
    "dedup_simhash",                  # 11 green rounds; bit-sig near-dup, as
                                      # in-window minhash AUC family
    "dedup_incremental_minhash",      # 5 green rounds; new×old banding, the
                                      # minhash path in-window via dedup_minhash_auc
    "join_bloom_prefilter_revenue",   # 6 green rounds; runtime-filter join,
                                      # broadcast-dim spine in-window via q01-q04
    "join_interval_overlap_busy_windows",  # 6 green rounds; grid-cell overlap
                                      # join; interval mechanics pytest-pinned
    "agg_incremental_kpi_merge",      # 6 green rounds; algebraic partial-merge,
                                      # as in-window k_core_kpis + streaming tests
    "etl_silver_filters",             # 10 green rounds; filter spine in-window
                                      # via etl_fact_assembly (same silver stage)
    # r13 session-3 spills: displaced by promoting the three batch-2
    # queries (fertility / changepoint / interarrival CV) in their
    # birth round; ledger in COVERAGE.md §rotation r13
    "etl_fact_assembly",              # 12 green rounds; the 4× broadcast dim
                                      # join spine stays in-window via q01-q04
    "dedup_containment_recall",       # 4 green rounds; audits the blocked path
                                      # whose exact sibling prefix_join stays in
    "dedup_allpairs_jaccard_join",    # 2 green rounds; exact prefix-filter
                                      # self-join; containment prefix twin (in)
    # r13 session-4 spills: displaced by promoting the curation funnel
    # and the embedding-norm audit in their birth round
    "q03_revenue_by_supplier_nation", # 12 green rounds; fact⋈store broadcast
                                      # join + agg spine stays via q01/q02 (in)
    "q04_custbal_segment_revenue",    # 12 green rounds; CASE bucketing + share
                                      # agg stays via k4_category_revenue (in)
    "k_core_kpis",                    # 12 green rounds; total/avg/distinct KPI
                                      # aggs stay via k4 + q01/q02 (in)
    # r13 session-6 spills: displaced by promoting the calibration /
    # zipf / burst trio in their birth round
    "q02_monthly_revenue_trend",      # 12 green rounds; date-part groupBy-sum
                                      # spine stays via q01 (in) + replica
    "k4_category_revenue_share",      # 12 green rounds; CASE + share-of-total
                                      # agg; mechanism also in calibration's
                                      # rate/contribution arithmetic (in)
    "dedup_containment_prefix_join",  # 2 green driver rounds (r11, r12) +
                                      # replica green at 3 SFs every round;
                                      # prefix-filter family also audited by
                                      # the sampled-truth replica gate
    # r12 end-of-session spills: displaced by promoting the nineteen
    # r12d..i queries into the window (every new query gets driver
    # rows in its birth round). Each name below has >=2 green driver
    # rounds (most in-window since r6-r9) and an in-window mechanism
    # relative; ledger in COVERAGE.md §rotation r12.
    # r14 session-1 spills: displaced by promoting the four new
    # association/hypothesis-test queries (assoc_queries.py) in their
    # birth round. Each name below is an r12d..i promotee with 2 green
    # driver rounds (r12+r13) and an in-window mechanism relative;
    # ledger in COVERAGE.md §rotation r14. (text_langid_threshold_sweep
    # stays in-window: its r12 row was the DIVIDE_BY_ZERO red, so r13
    # is its only green round.)
    "text_domain_prototype_classifier",  # nearest-prototype confusion; cosine
                                      # assignment in-window via
                                      # dedup_semantic_clusters/_recall
    "events_markov_eval",             # next-event top-1 accuracy; Markov fit
                                      # in-window via events_markov_stationary
    "corpus_pps_systematic_sample",   # Madow PPS draw; weighted sampling
                                      # in-window via corpus_dsir_importance_sample
    "text_langid_kappa",              # chance-corrected agreement; langid rate
                                      # arithmetic in-window via calibration +
                                      # wilson_ci + threshold_sweep
    # r14 session-2 spills: displaced by promoting the lead-lag /
    # assortativity / Benford trio in their birth round; same 2-green
    # r12d..i eligibility, ledger in COVERAGE.md §rotation r14.
    "dedup_minhash_auc",              # sig-estimate AUC; the minhash path is
                                      # in-window via graph_degree_assortativity
                                      # (same shared verified pairs) and
                                      # dedup_semantic_recall (r15: pagerank spilled)
    "bi_revenue_backtest_mase",       # walk-forward backtest; day-grain rolling
                                      # eval in-window via
                                      # bi_forecast_interval_coverage
    "text_countmin_heavyhitters",     # deterministic CMS replay; term-count
                                      # family in-window via text_zipf_profile +
                                      # text_hybrid_rrf_fusion (r15: bm25 spilled)
    # r14 session-3 spills: displaced by promoting the vocabulary /
    # curation quartet (vocab_queries.py) in their birth round; same
    # 2-green r12d..i eligibility, ledger in COVERAGE.md §rotation r14.
    "text_sparse_cosine_pairs",       # df-capped sparse cosine; postings /
                                      # sparse-vector family in-window via
                                      # text_hybrid_rrf_fusion (r15: bm25 spilled)
    "bi_basket_triples",              # A-priori 3-itemsets; co-occurrence
                                      # mining in-window via
                                      # graph_clustering_coefficient (promoted;
                                      # r15: copurchase_linkpred spilled)
    "bi_revenue_runs_test",           # Wald-Wolfowitz runs; sign-sequence
                                      # family in-window via
                                      # bi_revenue_trend_mannkendall + leadlag
    "bi_revenue_autocorr",            # seasonal-lag ACF; the lag-7 structure it
                                      # detects is quantified in-window by
                                      # bi_revenue_weekday_seasonality
    # r14 session-4 spills: displaced by promoting the LSH-skew /
    # IVF-balance / resize trio in their birth round; same 2-green
    # r12d..i eligibility, ledger in COVERAGE.md §rotation r14.
    "bi_revenue_trend_ols",           # OLS slope; the trend triple stays
                                      # in-window via theilsen + mannkendall
    "text_langid_wilson_ci",          # binomial interval; langid rate family
                                      # in-window via calibration + sweep
    "events_path_lift",               # order-2 Markov adequacy; sequence family
                                      # in-window via events_markov_stationary +
                                      # events_type_leadlag_concordance
    # r14 session-5 spills: displaced by promoting the quartiles /
    # ANOVA / key-skew trio in their birth round; same 2-green
    # r12d..i eligibility, ledger in COVERAGE.md §rotation r14.
    "bi_revenue_gini_customers",      # Lorenz concentration; exact share/skew
                                      # family in-window via join_fact_key_skew
    "bi_reorder_hazard",              # life-table hazard; customer lifecycle
                                      # family in-window via
                                      # bi_active_customer_churn_jaccard
    "bi_revenue_trend_mannkendall",   # rank trend sign; trend family in-window
                                      # via bi_revenue_trend_theilsen (same
                                      # day-pair relation, two-phase median)
    # r15 session-1 spills: displaced by promoting the two r14 late
    # registrations (scheduled in COVERAGE.md session 6) and the two
    # newly-registered two-phase-rank rungs (r14 VERDICT item 1).
    # Eligibility: >=2 green driver rounds each, in-window mechanism
    # relative named; ledger in COVERAGE.md §rotation r15.
    "dedup_semantic_clusters",        # 3 green rounds (r12-r14); the IVF
                                      # cluster-blocked cosine path re-runs
                                      # inside dedup_semantic_recall (in)
    "text_bpe_train_rounds",          # 3 green rounds; the trainer re-runs
                                      # inside text_bpe_fertility_by_lang (in;
                                      # r15: encode_counts spilled too)
    "multimodal_frame_sample",        # 2 green rounds; Arrow mapInPandas
                                      # path in-window via multimodal_resize_dims
    "corpus_source_tv_drift",         # 2 green rounds; exact-integer
                                      # distribution drift in-window via
                                      # events_value_ks_drift (same mechanism)
    # r15 session-2 spills: displaced by promoting the seven
    # quality/association queries (quality_queries.py) in their birth
    # round. Each name below is a 3-green r12 promotee (r12+r13+r14)
    # with an in-window mechanism relative; ledger in COVERAGE.md
    # §rotation r15. (text_langid_threshold_sweep: 2 green rounds,
    # r13+r14 — its r12 row was the DIVIDE_BY_ZERO red.)
    "text_bpe_encode_counts",         # 3 green rounds; the trained-merge
                                      # encode loop re-runs in-window inside
                                      # text_bpe_fertility_by_lang
    "text_langid_threshold_sweep",    # 2 green rounds; langid P/R rate
                                      # arithmetic in-window via
                                      # text_langid_calibration
    "text_bm25_search",               # 3 green rounds; BM25 scoring re-runs
                                      # in-window inside text_hybrid_rrf_fusion
                                      # (rational-idf postings machinery)
    "graph_pagerank_dupgraph",        # 3 green rounds; the shared banded-LSH
                                      # edge persist + node-partitioned joins
                                      # in-window via graph_degree_assortativity
    "corpus_split_leakage_audit",     # 3 green rounds; near-dup-pairs-crossing-
                                      # split mechanism in-window via
                                      # corpus_decontaminate_audit
    "bi_copurchase_linkpred",         # 3 green rounds; common-neighbor pair
                                      # machinery in-window via
                                      # graph_clustering_coefficient (promoted,
                                      # same wedge/triangle relations)
    "corpus_pack_bpe_budget",         # 3 green rounds; trained-BPE encode
                                      # in-window via text_bpe_fertility_by_lang;
                                      # budget-packing curation via
                                      # corpus_curation_funnel
    # r15 late registration (r11b/r14-session-6 precedent): gate-replica
    # verified at sf0.001+sf0.01+sf0.1 AND under ANSI-on in its birth
    # round, listed here so the window stays 50/50; it rotates INTO the
    # window next round.
    "embed_pca_power_iteration",      # exact quantized covariance moments +
                                      # 3-round power iteration; Rayleigh
                                      # share readout (plans/linalg_queries)
    "text_pii_scrub",                 # regex scrub; text exprs as text_profile-family (in via sparse/countmin)
    "embed_quantize_int8",            # SQ8 audit; embedding exprs as sim_ann_recall (in)
    "layout_zorder_events",           # layout audit; green r7-r11
    "text_quality_classifier",        # sigmoid scoring; langid family in-window
    "join_scd2_pit_attribution",      # PIT join; as-of machinery green r6d+
    "etl_expectations_report",        # rule audit; etl_silver_filters (in)
    "bi_revenue_cube_status_year",    # cube agg; q01-q04 spine (in)
    "pipeline_term_stats_shared",     # term_tf persist contract; consumers in
    "text_bigram_pmi",                # PMI; same exact-ratio family as new stats
    "graph_kcore_coreness",           # iterative graph; components (in)
    "corpus_token_budget_mix",        # budget mix; PPS sampler (in) same family
    "events_markov_transitions",      # transition fit; markov_eval (in) consumes
    "events_trailing_7d_value",       # rolling window; backtest/conformal (in)
    "corpus_upsample_epochs",         # epoch mix; curation family green r8+
    "text_inverted_index",            # postings; BM25/sparse-cosine mechanics in
    "etl_column_profile",             # profiling; expectations family green r6+
    "bi_market_basket_pairs",         # pair mining; triples + linkpred (in)
    "bi_pareto_brand_products",       # window rank; gini lorenz-rank (in)
    "bi_revenue_hhi_by_type",         # concentration; gini (in) same family
)

# r12: queries promoted INTO the driver window regardless of natural
# registration position (the BPE pair registers in analysis_queries at
# natural position ~95, so merely not being in _PAST_WINDOW could not
# place them inside the first 50). All four were registered r11b
# past-window with gate-replica green at sf0.001+sf0.01+sf0.1; the
# rotation policy's own standard (every new query gets in-window
# driver rounds) brings them in now (r11 VERDICT item 1).
_PROMOTED = (
    # (r15: dedup_semantic_clusters and text_bpe_train_rounds spilled
    # to _PAST_WINDOW after 3 green rounds — see session-1 spills)
    "dedup_semantic_recall",          # its recall audit vs all-pairs baseline
    # r12 session-4 additions (r12d..i), promoted INTO the window at
    # end of round so the r12 driver artifact hash-checks every one in
    # its birth round (review finding, r12i: leaving the newest, least
    # externally proven queries past-window inverted the window's
    # purpose). The long-stable naturals they displace all have >=2
    # green driver rounds — ledger in COVERAGE.md §rotation r12.
    "bi_forecast_interval_coverage",  # split-conformal coverage audit
    # r13 promotions (r12 VERDICT item 3): the ten r12b/c queries,
    # registered past-window in r12 with gate-replica green at
    # sf0.001+sf0.01+sf0.1, get their first driver hash rounds now.
    "sim_matryoshka_recall",          # MRL dim-budget ladder + 2-stage rerank
    # (r15: multimodal_frame_sample and corpus_source_tv_drift spilled
    # to _PAST_WINDOW after 2 green rounds — see session-1 spills)
    "events_value_ks_drift",          # exact-integer two-sample KS per type
    "corpus_ngram_novelty",           # first-occurrence shingle novelty per doc
    # r13 new queries, promoted in their BIRTH round (the r12d..i
    # standard): robust/seasonal statistics + retrieval fusion and
    # curation. Each displaced natural has >=2 green driver rounds
    # and an in-window relative — ledger in COVERAGE.md §rotation r13.
    "bi_revenue_trend_theilsen",      # median pairwise slope (robust trend)
    "bi_revenue_weekday_seasonality", # exact ISO-weekday seasonal indices
    "events_value_mad_by_type",       # median/MAD robust-z outlier counts
    "text_hybrid_rrf_fusion",         # BM25 + cosine reciprocal-rank fusion
    "corpus_decontaminate_audit",     # exact 8-gram cross-split contamination
    "text_boilerplate_by_source",     # within-source template-shingle df audit
    "corpus_dsir_importance_sample",  # hashed-bucket importance selection
    "text_bpe_fertility_by_lang",     # trained-tokenizer fertility audit
    "bi_revenue_changepoint",         # binary-segmentation level shift
    "events_interarrival_cv",         # per-type burstiness (CV² of gaps)
    "corpus_curation_funnel",         # per-stage retention accounting
    "embed_norm_stats_by_label",      # embedding L2-norm health audit
    "events_markov_stationary",       # scaled-int power-iteration steady state
    "text_langid_calibration",        # reliability bins + ECE contributions
    "text_zipf_profile",              # power-of-two rank-frequency ratios
    "events_burst_intervals",         # gaps-and-islands burst timeline
    # r14 new queries, promoted in their BIRTH round (the r12d..i
    # standard): association / hypothesis-test statistics
    # (plans/assoc_queries.py). Ledger: COVERAGE.md §rotation r14.
    "bi_spearman_rev_qty_daily",      # midrank Spearman rho, rev vs orders
    "bi_weekend_mannwhitney",         # tie-corrected Mann-Whitney U + z
    "bi_active_customer_churn_jaccard",  # month-over-month set churn
    "events_type_weekday_chisq",      # per-cell chi-square contributions
    "events_type_leadlag_concordance",  # cross-series lead-lag sign coupling
    "graph_degree_assortativity",     # endpoint-degree Pearson r of dup graph
    "bi_benford_first_digit",         # first-digit law audit of order totals
    "text_oov_rate_by_split",         # top-V train-vocab coverage of splits
    "text_heaps_law_curve",           # vocabulary growth at corpus eighths
    "corpus_neyman_allocation",       # N_h*S_h optimal stratified budget
    "text_hapax_ratio_by_source",     # f1 spectrum / Good-Turing unseen mass
    "dedup_lsh_bucket_skew",          # band-bucket occupancy / candidate cost
    "sim_ivf_cell_balance",           # inverted-list balance / probe variance
    "multimodal_resize_dims",         # resize arm through Arrow, oracle-checked
    "corpus_doclen_quartiles",        # two-phase selected Q1/Q2/Q3 doc lengths
    "bi_weekday_anova",               # one-way F test across ISO weekdays
    "join_fact_key_skew",             # exact heavy-key shuffle-planning audit
    # r15 promotions (r14 VERDICT item 1a/1b): the two r14 late
    # registrations take their scheduled driver rows (COVERAGE.md
    # session 6), and the two two-phase-rank scale rungs — newly
    # registered with DuckDB twins — get their birth-round window rows.
    "text_vocab_coverage_curve",      # token coverage at vocab budgets —
                                      # the tokenizer-budget sizing curve
    "bi_interpurchase_gap_quartiles", # pooled selected Q1/Q2/Q3 of customer
                                      # reorder gaps via two-phase rank
    "events_value_mad_twophase",      # per-type median/MAD via the grouped
                                      # two-phase histogram rank (scale rung)
    "embed_norm_median_twophase",     # per-label median norm via the grouped
                                      # two-phase histogram rank (scale rung)
    # r15 session-2 promotions: the seven quality/association queries
    # (plans/quality_queries.py) take their birth-round driver rows;
    # hash-green at sf0.001+sf0.01+sf0.1 and under ANSI-on before
    # promotion.
    "bi_order_value_winsorized",      # winsorized mean; P05/P95 cuts SELECTED
                                      # by the two-phase histogram rank
    "bi_kendall_tau_daily",           # Kendall tau-b over the day-pair relation
    "bi_demand_curve_by_brand",       # grouped exact-moment OLS demand slope
    "text_simpson_diversity_by_source",  # Simpson concentration / effective
                                      # vocabulary per source
    "text_bigram_fluency_score",      # add-one bigram LM scoring of val docs
                                      # against a train-split LM (rational)
    "graph_clustering_coefficient",   # global transitivity of the dup graph
    "corpus_dedup_reduction_by_source",  # per-source doc/token reduction from
                                      # near-dup removal
)


def _rotated(d: dict, strict: bool = False) -> dict:
    # strict (the queries() path): a _PAST_WINDOW name absent from the
    # registry is rotation-list drift (typo / renamed query) — fail
    # loudly instead of silently leaving the intended spill in-window
    # (review finding, r10); the same invariant is pinned in
    # tests/test_registry_contract.py. The oracle path stays lenient:
    # ORACLES legitimately lacks the rows-only sketch queries, so a
    # rotated-out oracle-less name must not crash oracle_sql()
    # (review finding, r10b).
    if strict:
        missing = [k for k in _PAST_WINDOW if k not in d]
        if missing:  # not assert: must survive python -O (r10 ADVICE)
            raise RuntimeError(f"_PAST_WINDOW names not in registry: {missing}")
        missing = [k for k in _PROMOTED if k not in d]
        if missing:
            raise RuntimeError(f"_PROMOTED names not in registry: {missing}")
        overlap = [k for k in _PROMOTED if k in _PAST_WINDOW]
        if overlap:
            raise RuntimeError(f"_PROMOTED names also in _PAST_WINDOW: {overlap}")
    front = {k: d[k] for k in _PROMOTED if k in d}
    head = {
        k: v
        for k, v in d.items()
        if k not in _PAST_WINDOW and k not in front
    }
    tail = {k: d[k] for k in _PAST_WINDOW if k in d}
    return front | head | tail


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = _registry()
    return reg.QUERIES["q01_top5_products_by_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotated(dict(_registry().QUERIES), strict=True)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; keys missing here get the weaker rows-only check."""
    return _rotated(dict(_registry().ORACLES))
