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


def zorder_key_expr(x, y, bits: int = 8):
    """Morton (Z-order) key: interleave the low ``bits`` bits of two
    bucketed dimensions — bit i of x lands at 2i, bit i of y at 2i+1.
    Sorting/range-partitioning by this key co-locates rows that are
    close in BOTH dimensions, which is what makes multi-column
    min/max file skipping work (the Delta/Iceberg OPTIMIZE ZORDER
    discipline): a file then covers a small square in (x, y) space
    instead of a thin stripe in one column, so predicates on EITHER
    column prune files. Callers bucket raw columns into [0, 2^bits)
    first (pmod of a hash, a day index, a range rank).

    The expression is a constant-folded sum of 2*bits shift/mask terms —
    pure integer ops, identical in Spark and any SQL oracle, fused into
    the scan (no shuffle; the layout write that USES the key pays one
    repartitionByRange(zval)).
    """
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("long")


def zorder_layout_audit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    cells_per_file: int = 64,
) -> DataFrame:
    """Audit the file-layout quality a Z-order write would produce:
    assign each row to file_id = zval div cells_per_file (contiguous
    Z-cell ranges = range-partition boundaries) and report each file's
    row count and (x, y) bounding box. Narrow per-file x AND y spans —
    ~sqrt(cells_per_file) wide each, vs one dimension spanning the full
    domain under single-column sort — are the pruning win, now a
    measurable number instead of prose. One partial-aggregated
    groupBy(file_id); the zval itself never shuffles raw rows.
    """
    z = zorder_key_expr(x_col, y_col, bits)
    return (
        df.select(
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
            F.floor(z / F.lit(cells_per_file)).cast("long").alias("file_id"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("x").cast("bigint").alias("x_lo"),
            F.max("x").cast("bigint").alias("x_hi"),
            F.min("y").cast("bigint").alias("y_lo"),
            F.max("y").cast("bigint").alias("y_hi"),
        )
        .orderBy("file_id")
    )
