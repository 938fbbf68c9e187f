"""The composed LLM-training-corpus pipeline (north-star capstone):
language-ID -> quality filter -> fingerprint dedup in ONE pass over the
documents table — the shape a 100 TB pretraining-data job actually runs
(filters are per-row expressions fused into the scan; dedup is the one
hash shuffle; everything else is free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import contaminated_ids
from ..operators.text import (
    fingerprint_expr,
    predicted_lang_expr,
    quality_score_expr,
    token_count_expr,
)
from ..sources.tables import load_table
from .registry import query
from .text_queries import _SQL_NPUNCT, _SQL_NSTOP, _SQL_NTOK

_SQL_QUALITY = f"""
    least(CASE WHEN {_SQL_NTOK} > 0
               THEN CAST({_SQL_NSTOP} AS DOUBLE) / CAST({_SQL_NTOK} AS DOUBLE)
               ELSE 0.0 END * 2.0, 1.0) * 0.5
    + (CASE WHEN {_SQL_NTOK} > 0
            AND CAST(length(text) AS DOUBLE) / CAST({_SQL_NTOK} AS DOUBLE) >= 3.0
            AND CAST(length(text) AS DOUBLE) / CAST({_SQL_NTOK} AS DOUBLE) <= 12.0
            THEN 1.0 ELSE 0.0 END) * 0.3
    + (1.0 - least(CASE WHEN length(text) > 0
                        THEN CAST({_SQL_NPUNCT} AS DOUBLE) / CAST(length(text) AS DOUBLE)
                        ELSE 0.0 END * 10.0, 1.0)) * 0.2
"""


# word 8-gram shingles, DuckDB twin of operators.dedup.shingles_expr(n=8)
_SQL_SH8 = """
    SELECT doc_id,
           list_distinct(
             list_transform(
               generate_series(1, greatest(len(toks) - 7, 1)),
               i -> array_to_string(toks[i:i+7], ' ')))
             AS sh
    FROM (SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
          FROM documents)
"""

# deterministic held-out "benchmark" split: doc_id % 97 == 0 stands in
# for the eval suites a real pipeline guards against.
_BENCH_MOD = 97


@query(
    "corpus_filter_pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN (CASE WHEN {_SQL_NTOK} > 0
                        THEN CAST({_SQL_NSTOP} AS DOUBLE) / CAST({_SQL_NTOK} AS DOUBLE)
                        ELSE 0.0 END) >= 0.12 THEN 'en' ELSE 'other' END AS predicted_lang,
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
    ), deduped AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM kept
    )
    SELECT doc_id, source, predicted_lang, quality, n_tokens, n_chars
    FROM deduped WHERE rn = 1
    ORDER BY doc_id
    """,
)
def corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data curation in one plan: score every document
    (language, quality, token count — fused per-row expressions), drop
    the held-out benchmark split (doc_id % 97 == 0) and every doc that
    shares an 8-gram with it (benchmark contamination,
    operators/dedup.py contaminated_ids — broadcast hash join against
    the benchmark's n-gram hashes), keep quality >= 0.5 and >= 30
    tokens, then fingerprint-dedup keeping the lowest doc_id per
    cluster. One scan feeds both the scoring and the contamination
    explode; the only corpus-sized shuffle is the dedup window — at
    100 TB this stays scan-bound, which is the point."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench = docs.filter(is_bench)
    corpus = docs.filter(~is_bench)
    dirty = contaminated_ids(corpus, bench, n=8)

    scored = corpus.select(
        "doc_id",
        "source",
        "n_chars",
        predicted_lang_expr("text").alias("predicted_lang"),
        quality_score_expr("text").alias("quality"),
        token_count_expr("text").alias("n_tokens"),
        fingerprint_expr("text").alias("fp"),
    )
    kept = (
        scored.filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 30))
        .join(dirty, "doc_id", "left_anti")
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "predicted_lang", "quality", "n_tokens", "n_chars")
        .orderBy("doc_id")
    )
