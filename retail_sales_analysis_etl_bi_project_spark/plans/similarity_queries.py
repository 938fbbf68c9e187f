"""Driver-checkable similarity-search queries (north-star extension):
brute-force cosine top-k (exact baseline, full DuckDB oracle) and the
LSH-bucketed approximate variant (rows-only; recall asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import brute_force_topk, ivf_topk, lsh_topk
from ..sources.tables import load_table
from .registry import query

_N_QUERIES = 5
_K = 10


@query(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[])) AS cosine
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id) AS INTEGER)
                  AS rank
      FROM scored
    ) WHERE rank <= {_K}
    ORDER BY query_id, rank
    """,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: top-10 cosine neighbors for query vectors
    vec_id < 5. Queries broadcast; one corpus scan; per-query top-k via
    window rank (shuffles only |corpus x queries| score rows, not
    vectors)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(
        emb, emb.filter(F.col("vec_id") < _N_QUERIES), k=_K
    )


@query("sim_ivf_ann_topk")  # approximate by construction -> rows-only
def sim_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (nprobe=1, 16 sampled centroids): each query scores only
    its centroid's inverted list — the other classic scale path next to
    LSH. Recall vs brute force asserted in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < _N_QUERIES), k=_K, n_centroids=16
    )


@query("sim_lsh_ann_topk")  # approximate by construction -> rows-only
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: 8 sign bits -> ~256 buckets; each query
    scores only its bucket (the 100 TB path: equi-join on signature
    instead of cross product). Recall vs brute force asserted in
    tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(
        emb, emb.filter(F.col("vec_id") < _N_QUERIES), dim=64, k=_K, n_planes=8
    )
