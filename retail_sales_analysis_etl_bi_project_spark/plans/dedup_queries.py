"""Driver-checkable deduplication queries (north-star extension): exact,
fingerprint, n-gram Jaccard, MinHash-LSH, SimHash, embedding-cosine.

MinHash/SimHash rely on xxhash64, which DuckDB doesn't provide — those
two are registered without oracles (rows-only check); their *verified*
outputs are cross-checked against the exact-Jaccard oracle in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import (
    embedding_near_dup_pairs,
    exact_dup_groups,
    fingerprint_dup_groups,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from ..sources.tables import load_table
from .registry import query

_SQL_SHINGLES = """
    SELECT doc_id,
           list_distinct(
             list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' ')))
             AS sh
    FROM (SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
          FROM documents)
"""


@query(
    "dedup_exact_groups",
    oracle="""
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS representative_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text) — the O(n) scalable
    primitive (one shuffle of 32-byte keys)."""
    return exact_dup_groups(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_fingerprint_groups",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
           MIN(doc_id) AS representative_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM documents
    GROUP BY 1
    """,
)
def dedup_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact dedup after normalization (case/punct/whitespace)."""
    return fingerprint_dup_groups(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
                THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)
                ELSE 0.0 END AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
               THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)
               ELSE 0.0 END >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.5) — the
    quadratic exactness baseline that MinHash-LSH approximates."""
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5, n=3
    )


@query("dedup_minhash_lsh")  # xxhash64 has no DuckDB twin -> rows-only
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH banding (16x4) candidates, verified with exact
    3-gram Jaccard >= 0.5. The scale path: candidate generation is a
    shuffle on band hashes, not a cross join. Recall vs the exact
    baseline is asserted in tests/test_dedup.py."""
    return minhash_dedup_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=0.5,
        num_hashes=64,
        bands=16,
    )


@query("dedup_simhash")  # xxhash64 has no DuckDB twin -> rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) near-dup pairs, Hamming <= 3, candidates via
    16-bit chunk buckets (pigeonhole: hamming<=3 with 4 chunks forces at
    least one identical chunk)."""
    return simhash_near_dup_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=3, bits=64, chunks=4
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.4
    ORDER BY vec_a, vec_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (>= 0.4 on this corpus). Exact
    all-pairs baseline; the LSH-bucketed variant is
    sim_lsh_ann_topk."""
    return embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4
    )
