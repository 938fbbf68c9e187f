"""Driver-checkable text-analysis queries (north-star extension):
language-ID, quality scoring, token counting (whitespace + BPE-regex),
and fingerprinting over the documents table, with an exact DuckDB twin.

All five per-document operators project through ONE query
(``text_profile``): each is an independent JVM-side expression over the
same text column, so a single scan computes them all — exactly how a
production curation pass would run them (one pass, many signals), and
one registry slot instead of five in the driver's correctness window.
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

_SQL_QUALITY = f"""
    least(CASE WHEN CAST({_SQL_NTOK} AS DOUBLE) > 0
               THEN CAST({_SQL_NSTOP} AS DOUBLE) / CAST({_SQL_NTOK} AS DOUBLE)
               ELSE 0.0 END * 2.0, 1.0) * 0.5
    + (CASE WHEN CAST({_SQL_NTOK} AS DOUBLE) > 0
             AND CAST(length(text) AS DOUBLE) / CAST({_SQL_NTOK} AS DOUBLE) >= 3.0
             AND CAST(length(text) AS DOUBLE) / CAST({_SQL_NTOK} AS DOUBLE) <= 12.0
            THEN 1.0 ELSE 0.0 END) * 0.3
    + (1.0 - least(CASE WHEN length(text) > 0
                        THEN CAST({_SQL_NPUNCT} AS DOUBLE) / CAST(length(text) AS DOUBLE)
                        ELSE 0.0 END * 10.0, 1.0)) * 0.2
"""


@query(
    "text_profile",
    oracle=f"""
    SELECT doc_id, lang,
           CAST({_SQL_NTOK} AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST({_SQL_NSTOP} AS BIGINT) AS n_stopwords,
           CAST({_SQL_NPUNCT} AS BIGINT) AS n_punct,
           CAST(len(regexp_extract_all(text, '{BPE_TOKEN_REGEX.replace("'", "''")}')) AS BIGINT)
             AS n_bpe_tokens,
           {_SQL_QUALITY} AS quality_score,
           CASE WHEN (CASE WHEN {_SQL_NTOK} > 0
                      THEN CAST({_SQL_NSTOP} AS DOUBLE) / CAST({_SQL_NTOK} AS DOUBLE)
                      ELSE 0.0 END) >= 0.12
                THEN 'en' ELSE 'other' END AS predicted_lang,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fingerprint
    FROM documents
    """,
)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text-analysis profile — every text operator in one
    scan, all JVM-side regex/hash expressions, no UDFs:

    - token counting: whitespace tokenizer + BPE-style pre-tokenizer
      (GPT-2-shape regex; identical in Java regex and RE2 — ASCII
      classes + non-capturing groups only), the token-budgeting metric
      of LLM-data pipelines
    - stopword / punctuation counts
    - heuristic quality score (length / punctuation / stopword ratios)
      — the 'filter low-quality docs' primitive
    - language-ID heuristic (stopword-ratio) next to the ground-truth
      lang column for accuracy eyeballing
    - document fingerprint: md5 over case/punct/whitespace-normalized
      text (the near-exact-dedup key)
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        token_count_expr("text").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        stopword_count_expr("text").alias("n_stopwords"),
        punct_count_expr("text").alias("n_punct"),
        bpe_token_count_expr("text").alias("n_bpe_tokens"),
        quality_score_expr("text").alias("quality_score"),
        predicted_lang_expr("text").alias("predicted_lang"),
        fingerprint_expr("text").alias("fingerprint"),
    )


# Tokens CTE shared with the repetition oracle: the exact twin of
# operators.text.tokens_expr (trim + \s+ split, blank -> empty list).
_SQL_TOKS = (
    "CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)


@query(
    "text_repetition_signals",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ),
    base AS (
      SELECT doc_id, t,
             CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(t)) AS BIGINT) AS distinct_tokens
      FROM toks
    ),
    grams AS (
      SELECT doc_id, n_tokens, distinct_tokens, 2 AS gram_n,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS gram
      FROM base
      UNION ALL
      SELECT doc_id, n_tokens, distinct_tokens, 3 AS gram_n,
             unnest(list_transform(range(1, len(t)-1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
      FROM base
    ),
    counts AS (
      SELECT doc_id, n_tokens, distinct_tokens, gram_n, gram,
             COUNT(*) AS c
      FROM grams GROUP BY ALL
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(MAX(CASE WHEN gram_n = 2 THEN c END) AS BIGINT) AS top_2gram,
             CAST(SUM(CASE WHEN gram_n = 2 THEN c END) AS BIGINT) AS n_2grams,
             CAST(MAX(CASE WHEN gram_n = 3 THEN c END) AS BIGINT) AS top_3gram,
             CAST(SUM(CASE WHEN gram_n = 3 THEN c END) AS BIGINT) AS n_3grams
      FROM counts GROUP BY 1
    )
    -- LEFT JOIN from base: docs with <2 tokens have no gram rows but
    -- must still appear, with NULL gram fractions (engine contract)
    SELECT b.doc_id, b.n_tokens, b.distinct_tokens,
           CASE WHEN b.n_tokens > 0
                THEN 1.0 - CAST(b.distinct_tokens AS DOUBLE)
                           / CAST(b.n_tokens AS DOUBLE) END
             AS repeat_token_frac,
           CAST(top_2gram AS DOUBLE) / CAST(n_2grams AS DOUBLE) AS top_2gram_frac,
           CAST(top_3gram AS DOUBLE) / CAST(n_3grams AS DOUBLE) AS top_3gram_frac
    FROM base b LEFT JOIN per_doc p USING (doc_id)
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (operators/text.py
    repetition_signals): per-document token repetition fraction and
    top-{2,3}-gram concentration — the standard boilerplate/template
    detectors in LLM data curation (Rae et al. 2021, appendix A1.1).
    Token stats are pure expressions (array_distinct — no shuffle); the
    top-n-gram concentration is one explode + two doc-keyed
    aggregations, with both gram widths riding a single explode
    pipeline so the text is tokenized once. Fully hash-verified against
    the DuckDB list_transform/unnest replay."""
    from ..operators.text import repetition_signals

    return repetition_signals(load_table(spark, sf_dir, "documents"))
