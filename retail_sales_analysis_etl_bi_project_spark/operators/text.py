"""Text analysis over the documents table (north-star extension,
BASELINE.json: language-ID, quality scoring, token counting, document
fingerprinting for LLM-data pipelines).

Everything is built-in pyspark.sql.functions — regex, md5, array ops —
so the hot path stays JVM-side and whole-stage-codegen'd; no Python UDFs.
Each expression has an exact DuckDB SQL twin (plans/text_queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English stopword set for the language-ID heuristic. Word-boundary
# alternation keeps the regex identical in Spark (Java regex) and DuckDB (RE2).
EN_STOPWORDS = (
    "the|and|of|to|a|in|is|it|that|for|on|with|as|was|at|by|an|be|this|are"
)


def tokens_expr(text: Column | str) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array (both
    engines' split would otherwise return [''])."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count_expr(text: Column | str) -> Column:
    return F.size(tokens_expr(text)).cast("bigint")


# BPE-style pre-tokenizer regex (GPT-2 family shape): contractions,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace.
# Restricted to ASCII classes + non-capturing groups so Java regex
# (Spark) and RE2 (DuckDB) match identically.
BPE_TOKEN_REGEX = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count_expr(text: Column | str) -> Column:
    """BPE-ish token count: number of pre-tokenizer matches — the cheap
    JVM-side proxy for 'how many tokens will the tokenizer emit', the
    budgeting metric of every LLM-data pipeline. (A real byte-pair
    merge table would multiply each match by its merge count; the match
    segmentation is the expensive, regex-able part.)"""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_TOKEN_REGEX)).cast("bigint")


def stopword_count_expr(text: Column | str) -> Column:
    """Count of English stopword occurrences (word-bounded)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(c), F.lit(rf"\b({EN_STOPWORDS})\b")).cast("bigint")


def punct_count_expr(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"[.,!?;:]")).cast("bigint")


def quality_score_expr(text: Column | str) -> Column:
    """Heuristic quality score in [0,1]: rewards stopword presence and a
    sane mean word length, penalizes heavy punctuation. Deterministic
    double arithmetic (per-row, no aggregation order issues)."""
    n_tok = token_count_expr(text).cast("double")
    n_stop = stopword_count_expr(text).cast("double")
    n_punct = punct_count_expr(text).cast("double")
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c).cast("double")
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    mean_wlen = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    wlen_ok = F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), 1.0).otherwise(0.0)
    score = (
        F.least(stop_ratio * 2.0, F.lit(1.0)) * 0.5
        + wlen_ok * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2
    )
    return score


def predicted_lang_expr(text: Column | str, threshold: float = 0.12) -> Column:
    """N-gram-free language-ID heuristic: English if the stopword-to-token
    ratio clears the threshold. (A production system would use character
    n-gram profiles; the driver documents carry a ``lang`` column to
    compare against.)"""
    n_tok = token_count_expr(text).cast("double")
    n_stop = stopword_count_expr(text).cast("double")
    ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    return F.when(ratio >= threshold, "en").otherwise("other")


def normalized_text_expr(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, non-alphanumerics
    collapsed to single spaces, trimmed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def fingerprint_expr(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (md5 hex is identical across Spark, DuckDB, and Python hashlib.)"""
    return F.md5(normalized_text_expr(text))
