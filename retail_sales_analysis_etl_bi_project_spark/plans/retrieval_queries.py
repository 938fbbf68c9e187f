"""Round-13 retrieval-fusion and corpus-curation queries.

Four LLM-data-pipeline operators the r12 surface still lacked, each a
distinct mechanism with an exact DuckDB twin:

- text_hybrid_rrf_fusion      : reciprocal-rank fusion of the BM25
                                lexical ranking and the embedding-cosine
                                ranking — the standard hybrid-retrieval
                                combiner (rank-based, so the two score
                                scales never need calibration)
- corpus_decontaminate_audit  : per-document EXACT 8-gram contamination
                                audit of train docs against the val/test
                                split — the eval-hygiene report next to
                                the near-dup leakage audit (leakage =
                                MinHash near-dups crossing splits; this
                                is verbatim-span membership, the
                                decontamination published LLM pipelines
                                run against benchmark suites)
- text_boilerplate_by_source  : within-source shingle document-frequency
                                thresholding — the boilerplate detector
                                (nav bars, license headers) that a
                                GLOBAL df cap cannot see because
                                per-source templates are globally rare
- corpus_dsir_importance_sample: hashed-n-gram-bucket importance
                                weighting toward a target domain and a
                                deterministic top-weight draw — the
                                domain-targeted data-selection step
                                (the DSIR idea: weight source docs by
                                how target-like their feature-bucket
                                mass is), log-free so every weight is
                                an exact integer ratio

Numeric discipline (REQUIREMENTS.md): counts/df/tf/bucket masses are
exact BIGINTs; RRF contributions are single IEEE divisions of exact
integers added in FIXED order; the DSIR weight is an exact integer
(num·10⁶ div den) so ranking never touches a float.

Reference scope: the reference's pipeline has no retrieval or curation
stage (/root/reference/etl/etl.py); this module is extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import hash60_expr, shingles_from_tokens
from ..operators.similarity import brute_force_topk
from ..operators.text import tokens_expr
from ..sources.tables import load_table
from .dedup_queries import _hex60
from .extension_queries import (
    _LEAK_TRAIN_CUT,
    _LEAK_VAL_CUT,
    _split_col,
    _sql_split_cte,
)
from .index_queries import _bm25_oracle, text_bm25_search
from .registry import query
from .text_queries import _SQL_TOKS

# RRF smoothing constant (Cormack et al.'s k=60, the near-universal
# default) — ONE literal injected into both engines.
_RRF_K = 60
_RRF_TOP = 20
_RRF_QUERY_VEC = 0  # the probe embedding: vec_id 0

# Decontamination n-gram width. 8 is the published contamination
# heuristic (also operators/dedup.contaminated_ids' default); the
# audit runs at the leakage audit's 80/10/10 split grain, where the
# planted near-dup families actually cross splits at every SF (the
# production 98/1/1 eval slice is too thin to overlap at test scale —
# measured 0 shared 8-grams at sf0.001/sf0.01).
_DECON_N = 8

# Boilerplate: a shingle present in >= max(3, n_docs/5) of a source's
# documents is template text for that source.
_BOILER_MIN_DF = 3
_BOILER_FRAC_DIV = 5

# DSIR: hashed feature buckets and the selection size.
_DSIR_BUCKETS = 64
_DSIR_TOP = 50
_DSIR_TARGET_LANG = "en"


def _rrf_oracle() -> str:
    k = _RRF_K
    return f"""
    WITH bm AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rb
      FROM ({_bm25_oracle()})
    ),
    qv AS (
      SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE vec_id = {_RRF_QUERY_VEC}
    ),
    cosleg AS (
      SELECT neighbor_id AS doc_id, rc FROM (
        SELECT c.vec_id AS neighbor_id,
               row_number() OVER (
                 ORDER BY list_cosine_similarity(
                            CAST(c.embedding AS DOUBLE[]), qv.v) DESC,
                          c.vec_id) AS rc
        FROM embeddings c CROSS JOIN qv
        WHERE c.vec_id != {_RRF_QUERY_VEC}
      ) WHERE rc <= {_RRF_TOP}
    ),
    fused AS (
      SELECT COALESCE(bm.doc_id, cosleg.doc_id) AS doc_id,
             CAST(bm.rb AS BIGINT) AS bm25_rank,
             CAST(cosleg.rc AS BIGINT) AS cosine_rank,
             COALESCE(CAST(1.0 AS DOUBLE)
                      / (CAST({k}.0 AS DOUBLE) + bm.rb),
                      CAST(0.0 AS DOUBLE))
             + COALESCE(CAST(1.0 AS DOUBLE)
                        / (CAST({k}.0 AS DOUBLE) + cosleg.rc),
                        CAST(0.0 AS DOUBLE)) AS rrf_score
      FROM bm FULL OUTER JOIN cosleg ON bm.doc_id = cosleg.doc_id
    )
    SELECT doc_id, bm25_rank, cosine_rank, rrf_score
    FROM fused
    ORDER BY rrf_score DESC, doc_id
    LIMIT {_RRF_TOP}
    """


@query("text_hybrid_rrf_fusion", oracle=_rrf_oracle())
def text_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID RETRIEVAL by reciprocal-rank fusion: fuse the BM25
    top-20 for the fixed lexical query (text_bm25_search) with the
    cosine top-20 around the probe embedding (vec_id 0, the testdata's
    doc_id↔vec_id row alignment) via
    RRF(d) = Σ_legs 1/(60 + rank_leg(d)) — the standard combiner
    precisely BECAUSE it is rank-based: BM25 scores and cosines live
    on incomparable scales, and any score-normalization fusion would
    need corpus statistics that drift; ranks don't. Docs missing from
    a leg contribute 0 from it (the top-k-union convention). At sf0.1
    the embedding table covers a PREFIX of the docs — the fusion's
    missing-leg path is exercised by construction, not just by edge
    case.

    Exactness: both ranks are deterministic row_numbers (score/cosine
    desc, id tiebreak); each RRF term is ONE IEEE division of exact
    integers and the two terms add in fixed order — hash-exact.

    Scale shape (100 TB): the BM25 leg is postings-sized (inverted-
    index lookup, see text_bm25_search); the cosine leg is one
    broadcast-probe corpus scan with a top-k window (the brute-force
    baseline here; swap the IVF probe join for production); the fuse
    itself is a full-outer join of two k-row lists — trivially tiny."""
    bm = text_bm25_search(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("bigint")
        .alias("rb"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    cos = brute_force_topk(
        emb, emb.filter(F.col("vec_id") == _RRF_QUERY_VEC), k=_RRF_TOP
    ).select(
        F.col("neighbor_id").alias("cdoc"),
        F.col("rank").cast("bigint").alias("rc"),
    )
    kd = F.lit(float(_RRF_K))
    fused = bm.join(cos, bm["doc_id"] == cos["cdoc"], "full_outer").select(
        F.coalesce(F.col("doc_id"), F.col("cdoc")).alias("doc_id"),
        F.col("rb").alias("bm25_rank"),
        F.col("rc").alias("cosine_rank"),
        (
            F.coalesce(F.lit(1.0) / (kd + F.col("rb")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (kd + F.col("rc")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), "doc_id").limit(_RRF_TOP)


def _funnel_oracle() -> str:
    from .corpus_queries import (
        _BENCH_MOD,
        _SQL_NTOK,
        _SQL_QUALITY,
        _SQL_SH8,
    )

    return f"""
    WITH scored AS (
      SELECT doc_id,
             {_SQL_QUALITY} AS quality,
             CAST({_SQL_NTOK} AS BIGINT) AS n_tokens,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      FROM documents
      WHERE doc_id % {_BENCH_MOD} != 0
    ), sh8 AS ({_SQL_SH8}),
    bng AS (
      SELECT DISTINCT md5(g) AS gh
      FROM (SELECT unnest(sh) AS g FROM sh8 WHERE doc_id % {_BENCH_MOD} = 0)
    ), contaminated AS (
      SELECT DISTINCT s.doc_id
      FROM (SELECT doc_id, md5(unnest(sh)) AS gh FROM sh8
            WHERE doc_id % {_BENCH_MOD} != 0) s
      JOIN bng USING (gh)
    ), kept AS (
      SELECT * FROM scored
      WHERE quality >= 0.5 AND n_tokens >= 30
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ), reps AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM kept) WHERE rn = 1
    ), attributed AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id % {_BENCH_MOD} = 0 THEN '1_benchmark_split'
                  WHEN s.quality < 0.5 OR s.n_tokens < 30 THEN '2_quality'
                  WHEN c.doc_id IS NOT NULL THEN '3_contamination'
                  WHEN r.doc_id IS NULL THEN '4_near_dup'
                  ELSE '5_kept' END AS stage
      FROM documents d
      LEFT JOIN scored s ON d.doc_id = s.doc_id
      LEFT JOIN contaminated c ON d.doc_id = c.doc_id
      LEFT JOIN reps r ON d.doc_id = r.doc_id
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_raw FROM documents)
    SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS DOUBLE) / CAST(tot.n_raw AS DOUBLE)
             AS frac_of_raw
    FROM attributed CROSS JOIN tot
    GROUP BY stage, tot.n_raw
    UNION ALL
    SELECT '0_raw', n_raw, CAST(1.0 AS DOUBLE) FROM tot
    ORDER BY stage
    """


@query("corpus_curation_funnel", oracle=_funnel_oracle())
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURATION FUNNEL REPORT: attribute every raw document to the
    FIRST stage of the corpus_filter_pipeline that drops it
    (benchmark split → quality/token filter → 8-gram contamination →
    fingerprint near-dup) or to the kept set — the per-stage retention
    table every pipeline run logs (the "where did my corpus go"
    answer; the pipeline query emits the survivors, this emits the
    accounting, and Σ stages == raw by construction).

    Exactness: stage attribution is a deterministic CASE over the
    pipeline's own hash-verified predicates (same quality/token
    expressions, same md5 8-gram contamination set, same fingerprint
    rank); counts are exact BIGINTs; frac_of_raw is ONE double
    division by the same total on both engines.

    Scale shape (100 TB): identical to corpus_filter_pipeline (one
    scored corpus pass + the broadcast benchmark-gram join + the
    fingerprint window) plus three doc_id-keyed LEFT joins of
    corpus-or-smaller sets and a 6-group aggregate — attribution adds
    joins, never a new corpus scan. Scoring and the contamination set
    come from the managed persists shared with corpus_filter_pipeline
    (this plan referenced the scored pass twice — fingerprint window +
    attribution join — so left lazy the regex scoring executed ~2× per
    action)."""
    from .corpus_queries import (
        _BENCH_MOD,
        shared_contaminated_ids,
        shared_scored_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    dirty = shared_contaminated_ids(spark, sf_dir).withColumn(
        "is_dirty", F.lit(True)
    )
    scored = shared_scored_corpus(spark, sf_dir).select(
        "doc_id", "quality", "n_tokens", "fp"
    )
    kept = scored.filter(
        (F.col("quality") >= 0.5) & (F.col("n_tokens") >= 30)
    ).join(dirty.select("doc_id"), "doc_id", "left_anti")
    reps = (
        kept.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("fp").orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id")
        .withColumn("is_rep", F.lit(True))
    )
    attributed = (
        docs.select("doc_id")
        .join(scored.select("doc_id", "quality", "n_tokens"), "doc_id", "left")
        .join(dirty.select("doc_id", "is_dirty"), "doc_id", "left")
        .join(reps, "doc_id", "left")
        .select(
            F.when(is_bench, "1_benchmark_split")
            .when(
                (F.col("quality") < 0.5) | (F.col("n_tokens") < 30),
                "2_quality",
            )
            .when(F.col("is_dirty"), "3_contamination")
            .when(F.col("is_rep").isNull(), "4_near_dup")
            .otherwise("5_kept")
            .alias("stage")
        )
    )
    tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_raw"))
    stages = (
        attributed.groupBy("stage")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "stage",
            "n_docs",
            (
                F.col("n_docs").cast("double")
                / F.col("n_raw").cast("double")
            ).alias("frac_of_raw"),
        )
    )
    raw_row = tot.select(
        F.lit("0_raw").alias("stage"),
        F.col("n_raw").alias("n_docs"),
        F.lit(1.0).alias("frac_of_raw"),
    )
    return stages.unionByName(raw_row).orderBy("stage")


def _decon_grams_sql(n: int) -> str:
    """(doc_id, g) distinct word n-gram relation — the DuckDB twin of
    shingles_from_tokens(tokens_expr(text), n) at width ``n`` (the
    3-gram _sql_shingles generalized; short docs collapse to their
    full token join, same as the Spark expression)."""
    return f"""
    SELECT doc_id, unnest(list_distinct(
             list_transform(
               generate_series(1, greatest(len(toks) - {n - 1}, 1)),
               i -> coalesce(array_to_string(toks[i:i+{n - 1}], ' '), ''))))
             AS g
    FROM (SELECT doc_id,
                 CASE WHEN text IS NULL OR length(trim(text)) = 0
                      THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+')
                      END AS toks
          FROM documents)
    """


@query(
    "corpus_decontaminate_audit",
    oracle=f"""
    WITH s AS ({_sql_split_cte(_LEAK_TRAIN_CUT, _LEAK_VAL_CUT)}),
    grams AS ({_decon_grams_sql(_DECON_N)}),
    ev AS (
      SELECT DISTINCT g FROM grams JOIN s USING (doc_id)
      WHERE s.split != 'train'),
    tr AS (
      SELECT grams.doc_id, grams.g FROM grams JOIN s USING (doc_id)
      WHERE s.split = 'train'),
    tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
      FROM tr GROUP BY 1),
    hit AS (
      SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
      FROM tr JOIN ev USING (g) GROUP BY 1)
    SELECT hit.doc_id, tot.n_grams, hit.n_contaminated,
           CAST(hit.n_contaminated AS DOUBLE)
             / CAST(tot.n_grams AS DOUBLE) AS contaminated_frac
    FROM hit JOIN tot USING (doc_id)
    ORDER BY doc_id
    """,
)
def corpus_decontaminate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SPAN DECONTAMINATION AUDIT: for every train-split document
    sharing at least one verbatim 8-gram with the val/test side of the
    80/10/10 hash split, report how much of it is contaminated — the
    per-doc report behind the "drop or scrub?" decision (GPT-3-style
    n-gram decontamination). Complements, not duplicates, the two
    in-repo relatives: corpus_split_leakage_audit counts NEAR-DUP pairs
    crossing splits (MinHash grain), and corpus_filter_pipeline DROPS
    contaminated docs against a mod-97 benchmark slice (filter, not
    report); this is the verbatim-membership audit at the production
    split function (same hash60 split as the leakage audit, so the two
    reports compose row-for-row).

    Exactness: gram sets are the per-doc DISTINCT 8-gram shingles
    (shingles_from_tokens at n=8 — the contaminated_ids operator's
    width); n_grams / n_contaminated are exact BIGINTs;
    contaminated_frac is ONE double division.

    Scale shape (100 TB): one tokenize → 8-gram explode with the split
    decided scan-fused per row (zero extra pass); the eval gram set is
    NOT broadcast (an eval split is corpus-proportional, unlike a
    benchmark suite — the contaminated_ids operator broadcasts, this
    deliberately shuffles) — the contamination check is one gram-keyed
    equi-join between the explode and the distinct eval grams, both
    already partitioned by the join key. Readout is doc grain."""
    from ..sources.tables import load_fact_wide

    # cluster width before the tokenize + shingle explode (r16, guide
    # §2.2/§2.5): the gram pipeline below is referenced three times
    # (eval grams, train totals, the contamination join) and each
    # evaluation ran serially at input-file granularity (skipped on
    # well-split inputs — load_fact_wide). Downstream aggregates are
    # exact BIGINT counts — result-identical.
    docs = load_fact_wide(spark, sf_dir, "documents", "doc_id").select(
        "doc_id",
        tokens_expr(F.col("text")).alias("_toks"),
        _split_col(_LEAK_TRAIN_CUT, _LEAK_VAL_CUT).alias("split"),
    )
    grams = docs.select(
        "doc_id",
        "split",
        F.explode(shingles_from_tokens(F.col("_toks"), _DECON_N)).alias("g"),
    )
    ev = (
        grams.filter(F.col("split") != "train").select("g").distinct()
    )
    tr = grams.filter(F.col("split") == "train").select("doc_id", "g")
    tot = tr.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    hit = (
        tr.join(ev, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contaminated"))
    )
    return (
        hit.join(tot, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            (
                F.col("n_contaminated").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("contaminated_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_boilerplate_by_source",
    oracle=f"""
    WITH grams AS ({_decon_grams_sql(3)}),
    src AS (SELECT doc_id, source FROM documents),
    n AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM src GROUP BY 1),
    df AS (
      SELECT src.source, grams.g, CAST(count(*) AS BIGINT) AS df
      FROM grams JOIN src USING (doc_id) GROUP BY 1, 2),
    boiler AS (
      SELECT df.source, df.g, df.df FROM df JOIN n USING (source)
      WHERE df.df >= greatest({_BOILER_MIN_DF},
                              n.n_docs // {_BOILER_FRAC_DIV})),
    top AS (
      SELECT source, g AS top_shingle, df AS top_df FROM (
        SELECT source, g, df,
               row_number() OVER (PARTITION BY source
                                  ORDER BY df DESC, g) AS r
        FROM boiler) WHERE r = 1),
    agg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_boiler_shingles
      FROM boiler GROUP BY 1)
    SELECT n.source, n.n_docs,
           COALESCE(agg.n_boiler_shingles, CAST(0 AS BIGINT))
             AS n_boiler_shingles,
           top.top_shingle, top.top_df
    FROM n
    LEFT JOIN agg USING (source)
    LEFT JOIN top USING (source)
    ORDER BY n.source
    """,
)
def text_boilerplate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE BOILERPLATE DETECTION: a 3-gram shingle present in at
    least max(3, n_docs/5) of a source's documents is template text for
    that source (nav bars, footers, license headers — the single
    biggest quality defect of crawled corpora). The GLOBAL df cap in
    text_sparse_cosine_pairs cannot see these: a template shared by
    every doc of one small source is globally rare. Emits the
    per-source audit (boilerplate shingle count + the worst offender);
    the scrub is the obvious anti-join of the flagged (source, shingle)
    set against the explode.

    Exactness: within-source document frequencies and the threshold
    max(3, n_docs div 5) are exact BIGINT arithmetic; the top offender
    is a deterministic (df desc, shingle) rank-1; no division at all.

    Scale shape (100 TB): one tokenize → shingle explode; df is a
    (source, shingle)-grain map-side-combined groupBy; the threshold
    join is against the broadcast source-count table (source
    cardinality ~10³); the readout is source grain. The explode is the
    same single corpus pass every shingle query shares."""
    from ..sources.tables import load_fact_wide

    # cluster width BEFORE the tokenize + shingle explode (r16, guide
    # §2.2/§2.5): a one-file corpus scans as one task, so the
    # compute-heavy shingling ran serially ahead of the first shuffle
    # (skipped automatically on well-split inputs — load_fact_wide).
    # Result-identical: every aggregate downstream is an exact BIGINT
    # count (no float summation order anywhere).
    docs = load_fact_wide(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", "source", tokens_expr(F.col("text")).alias("_toks")
    )
    grams = docs.select(
        "source",
        F.explode(shingles_from_tokens(F.col("_toks"), 3)).alias("g"),
    )
    n = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    df = grams.groupBy("source", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    boiler = df.join(F.broadcast(n), "source").filter(
        F.col("df")
        >= F.greatest(
            F.lit(_BOILER_MIN_DF),
            F.expr(f"n_docs div {_BOILER_FRAC_DIV}"),
        )
    )
    top = (
        boiler.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.desc("df"), "g")
            ),
        )
        .filter(F.col("r") == 1)
        .select(
            "source",
            F.col("g").alias("top_shingle"),
            F.col("df").alias("top_df"),
        )
    )
    agg = boiler.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_boiler_shingles")
    )
    return (
        n.join(agg, "source", "left")
        .join(top, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_boiler_shingles"), F.lit(0).cast("bigint"))
            .alias("n_boiler_shingles"),
            "top_shingle",
            "top_df",
        )
        .orderBy("source")
    )


@query(
    "corpus_dsir_importance_sample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, lower(unnest({_SQL_TOKS})) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS tf,
             {_hex60('term')} % {_DSIR_BUCKETS} AS b
      FROM toks GROUP BY 1, 2, 3),
    buckets AS (
      SELECT b,
             CAST(1 + COALESCE(SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}'
                                         THEN tf END), 0) AS BIGINT) AS ct,
             CAST(1 + SUM(tf) AS BIGINT) AS cs
      FROM tf GROUP BY 1),
    w AS (
      SELECT tf.doc_id,
             CAST(SUM(CAST(tf.tf AS HUGEINT) * buckets.ct) AS HUGEINT)
               AS num,
             CAST(SUM(CAST(tf.tf AS HUGEINT) * buckets.cs) AS HUGEINT)
               AS den
      FROM tf JOIN buckets USING (b) GROUP BY 1),
    scored AS (
      SELECT w.doc_id, d.lang,
             CAST((num * 1000000) // den AS BIGINT) AS weight_ppm
      FROM w JOIN documents d USING (doc_id))
    SELECT doc_id, lang, weight_ppm,
           CAST(row_number() OVER (ORDER BY weight_ppm DESC, doc_id)
                AS BIGINT) AS rank
    FROM scored
    ORDER BY weight_ppm DESC, doc_id
    LIMIT {_DSIR_TOP}
    """,
)
def corpus_dsir_importance_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DOMAIN-TARGETED DATA SELECTION (the DSIR idea, made exact):
    hash every term into one of 64 feature buckets, measure each
    bucket's token mass in the TARGET domain (lang='en') vs the whole
    corpus (add-1 smoothed), weight every document by how target-like
    its bucket mass is, and keep the top 50 by weight — the
    importance-selection step that tilts a general crawl toward a
    target domain before training. The weight here is the RATIONAL
    ratio (Σ_b tf_b·ct_b)/(Σ_b tf_b·cs_b) — the doc's expected
    target-bucket mass over its expected corpus-bucket mass — instead
    of DSIR's log-likelihood ratio Σ tf_b·ln(ct_b/cs_b): monotone in
    the same signal but log-free, so every weight is the exact integer
    (num·10⁶ div den) and the ranking is float-free end to end (the
    PPS sampler's zero-float discipline; a float log-sum would be
    partition-order-dependent).

    Exactness: bucket ids are hash60(term) % 64 (the dedup/split hash
    primitive, same value in DuckDB); ct/cs/num/den are exact integer
    sums (order-free); weight_ppm is ONE integer division; the cut is
    a deterministic (weight desc, doc_id) top-50. Docs with zero
    tokens have no tf rows and are unrankable by construction.

    Scale shape (100 TB): one tokenize → tf groupBy (the corpus pass);
    the bucket table is 64 rows, broadcast back; per-doc num/den is a
    doc-grain aggregate; the top-50 is TakeOrderedAndProject. The
    integer products ride DECIMAL(38,0) — at 10¹³-token target mass ×
    10³-token docs the int64 headroom is gone, the decimal form never
    is."""
    from .analysis_queries import _shared_tf

    docs = load_table(spark, sf_dir, "documents")
    # the managed term_tf persist (one tokenize per application/corpus,
    # shared with the tfidf/BM25/contrast family) — without it the tf
    # subtree is consumed twice here (bucket masses + per-doc weights)
    # and Spark recomputes the tokenize per consumer
    tf = _shared_tf(spark, sf_dir).withColumn(
        "b", hash60_expr(F.col("term")) % _DSIR_BUCKETS
    )
    buckets = tf.groupBy("b").agg(
        (
            F.lit(1)
            + F.coalesce(
                F.sum(
                    F.when(
                        F.col("lang") == _DSIR_TARGET_LANG, F.col("tf")
                    )
                ),
                F.lit(0),
            )
        )
        .cast("bigint")
        .alias("ct"),
        (F.lit(1) + F.sum("tf")).cast("bigint").alias("cs"),
    )
    dec = "decimal(38,0)"
    w = (
        tf.join(F.broadcast(buckets), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf").cast(dec) * F.col("ct").cast(dec)).alias("num"),
            F.sum(F.col("tf").cast(dec) * F.col("cs").cast(dec)).alias("den"),
        )
    )
    scored = w.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "lang",
        F.expr("CAST((num * 1000000) div den AS BIGINT)").alias("weight_ppm"),
    )
    return (
        scored.select(
            "doc_id",
            "lang",
            "weight_ppm",
            F.row_number()
            .over(Window.orderBy(F.desc("weight_ppm"), "doc_id"))
            .cast("bigint")
            .alias("rank"),
        )
        .orderBy(F.desc("weight_ppm"), "doc_id")
        .limit(_DSIR_TOP)
    )
