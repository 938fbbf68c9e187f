"""Shared partitioning disciplines.

One home for the repartition-before-compute pattern that round 5 found
itself copy-pasting into five modules (similarity scoring, minhash /
simhash signatures, winnowing, repetition signals, the corpus filter
pipeline, heavy-hitters) — a single definition so the next refinement
(different sizing policy, skew salting, adaptive width) lands once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_cluster_width(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition ``df`` on ``key`` to the cluster's default
    parallelism before a compute-heavy per-row phase (shingling, n-gram
    construction, cosine/ADC scoring, winnowing).

    Why: corpora often arrive as one or a few files, and a file scan is
    that many TASKS — the expensive expressions would evaluate serially
    at input-file granularity regardless of cluster size. An explicit
    numPartitions repartition (AQE never coalesces explicit ones) costs
    one shuffle of the input rows and buys full-width evaluation.

    Tradeoffs, recorded here because this is the single definition:
    - On an input already WIDER than defaultParallelism this REDUCES
      parallelism and pays the shuffle for nothing; callers on the
      100 TB path where inputs arrive well-split can skip the call (the
      shuffle is also how the phase's output gets key-clustered, which
      several callers rely on for their downstream groupBy).
    - The width heuristic is defaultParallelism (total cores), the
      right default for CPU-bound expression phases; IO-bound phases
      would size by input bytes instead.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(key))
