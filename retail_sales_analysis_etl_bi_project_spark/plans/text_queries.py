"""Driver-checkable text-analysis queries (north-star extension):
language-ID, quality scoring, token counting, fingerprinting over the
documents table, each with an exact DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import (
    BPE_TOKEN_REGEX,
    EN_STOPWORDS,
    bpe_token_count_expr,
    fingerprint_expr,
    predicted_lang_expr,
    punct_count_expr,
    quality_score_expr,
    stopword_count_expr,
    token_count_expr,
)
from ..sources.tables import load_table
from .registry import query

# DuckDB twins of the operators.text expressions (RE2 regexes chosen to
# behave identically to Spark's Java regexes on this grammar).
_SQL_NTOK = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)
_SQL_NSTOP = rf"len(regexp_extract_all(lower(text), '\b({EN_STOPWORDS})\b'))"
_SQL_NPUNCT = "len(regexp_extract_all(text, '[.,!?;:]'))"


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST({_SQL_NTOK} AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST({_SQL_NSTOP} AS BIGINT) AS n_stopwords,
           CAST({_SQL_NPUNCT} AS BIGINT) AS n_punct
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) + stopword/punctuation
    counts — all JVM-side regex, no UDFs."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_expr("text").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        stopword_count_expr("text").alias("n_stopwords"),
        punct_count_expr("text").alias("n_punct"),
    )


@query(
    "text_quality_scores",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST({_SQL_NTOK} AS DOUBLE) AS n_tok,
             CAST({_SQL_NSTOP} AS DOUBLE) AS n_stop,
             CAST({_SQL_NPUNCT} AS DOUBLE) AS n_punct,
             CAST(length(text) AS DOUBLE) AS n_chars
      FROM documents
    )
    SELECT doc_id,
           least(CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END * 2.0, 1.0) * 0.5
           + (CASE WHEN n_tok > 0 AND n_chars / n_tok >= 3.0 AND n_chars / n_tok <= 12.0
                   THEN 1.0 ELSE 0.0 END) * 0.3
           + (1.0 - least(CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END * 10.0,
                          1.0)) * 0.2
             AS quality_score
    FROM m
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length / punctuation / stopword ratios)
    — the LLM-data-pipeline 'filter low-quality docs' primitive."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score_expr("text").alias("quality_score"))


@query(
    "text_langid",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN (CASE WHEN {_SQL_NTOK} > 0
                      THEN CAST({_SQL_NSTOP} AS DOUBLE) / CAST({_SQL_NTOK} AS DOUBLE)
                      ELSE 0.0 END) >= 0.12
                THEN 'en' ELSE 'other' END AS predicted_lang
    FROM documents
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-ratio); emitted next to the ground
    -truth lang column for accuracy eyeballing."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", predicted_lang_expr("text").alias("predicted_lang")
    )


@query(
    "text_bpe_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_TOKEN_REGEX.replace("'", "''")}')) AS BIGINT)
             AS n_bpe_tokens,
           CAST({_SQL_NTOK} AS BIGINT) AS n_ws_tokens
    FROM documents
    """,
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenizer token counts (GPT-2-shape regex) next to
    the whitespace count — the token-budgeting metric of LLM-data
    pipelines. Same regex evaluates identically in Java regex and RE2
    (ASCII classes + non-capturing groups only)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        bpe_token_count_expr("text").alias("n_bpe_tokens"),
        token_count_expr("text").alias("n_ws_tokens"),
    )


@query(
    "text_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fingerprint
    FROM documents
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over case/punctuation/whitespace-
    normalized text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_expr("text").alias("fingerprint"))
