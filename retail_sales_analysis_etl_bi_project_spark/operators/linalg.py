"""Distributed exact linear algebra over embedding columns: quantized
covariance moments and fixed-round power iteration.

The covariance matrix of an embedding corpus is the workhorse of
embedding diagnostics (anisotropy, effective rank, whitening, PCA) —
none of which the reference touches (its analytics stop at groupBy
sums, /root/reference/etl/etl.py:220-306); this is north-star
extension surface for the training-data pipeline.

Numeric discipline (REQUIREMENTS.md): every aggregate here is an
EXACT integer sum —

- elements quantize to ×10⁴ fixed point via ``floor(x·10⁴ + 0.5)``
  (FLOOR is floor on both engines, so negative values round
  identically — the repo-wide alternative to round(), whose .5 tie
  rule differs per engine);
- the scaled covariance numerator ``M[i,j] = N·Σ q_i q_j − Σq_i·Σq_j``
  (= N²·10⁸·cov of the quantized data) is a DECIMAL(38,0) sum of
  BIGINT products — order-free, partitioning-independent;
- power-iteration matvecs are DECIMAL(38,0) exact; the per-round
  normalization pre-scales w by truncate-toward-zero division
  (``w − w % 10⁴) / 10⁴`` — identical % semantics on both engines)
  so the squared norm stays inside DECIMAL(38,0) EXACTLY, then takes
  ONE IEEE sqrt of the (deterministically cast) double and
  re-quantizes the next vector to ×10⁴ fixed point. No multi-term
  float sum exists anywhere, so no fold-order question arises.

Scale shape (100 TB): the moment pass is ONE corpus scan — posexplode
to (vec, dim, q), a dim-pair self-join within each vector (d² rows per
vector, map-side combined by (i, j) into exactly d² = 4096 partial
sums), one shuffle of partials. The 64×64 moment matrix is a KB-scale
FITTED ARTIFACT (the codebook discipline); every power-iteration round
operates on (matrix 4096 rows) ⋈ (vector 64 rows) — corpus-free, so
iterating more rounds costs joins of KB relations, never rescans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

D38 = "decimal(38,0)"


def quantize_expr(col):
    """×10⁴ fixed-point BIGINT with floor(x+0.5) rounding — identical
    on Spark and DuckDB for every sign (see module docstring)."""
    return F.floor(col.cast("double") * 10000.0 + F.lit(0.5)).cast("bigint")


def quantized_elements(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, dim_idx, q): one row per vector element, quantized.
    dim_idx is 0-based."""
    return emb.select(
        "vec_id", F.posexplode(vec_col).alias("dim_idx", "_x")
    ).select("vec_id", "dim_idx", quantize_expr(F.col("_x")).alias("q"))


def covariance_moments(elems: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Exact scaled covariance numerator from quantized elements.

    Returns (m, s): ``m`` = (i, j, m_ij DECIMAL(38,0)) with
    m_ij = N·Σ q_i q_j − Σq_i·Σq_j over all vectors — N²·10⁸ times the
    covariance of the quantized data — and ``s`` = (dim_idx,
    s_q DECIMAL(38,0), n BIGINT) the per-dimension sums. The pair
    product relation is d² rows PER VECTOR, aggregated map-side to d²
    total partials before the single shuffle."""
    a = elems.select(
        F.col("vec_id"),
        F.col("dim_idx").alias("i"),
        F.col("q").alias("qi"),
    )
    b = elems.select(
        F.col("vec_id"),
        F.col("dim_idx").alias("j"),
        F.col("q").alias("qj"),
    )
    pair_sums = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("qi") * F.col("qj")).cast(D38)).alias("p_ij"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    s = elems.groupBy("dim_idx").agg(
        F.sum(F.col("q").cast(D38)).alias("s_q"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    si = F.broadcast(s.select(F.col("dim_idx").alias("i"), F.col("s_q").alias("s_i")))
    sj = F.broadcast(s.select(F.col("dim_idx").alias("j"), F.col("s_q").alias("s_j")))
    m = (
        pair_sums.join(si, "i")
        .join(sj, "j")
        .select(
            "i",
            "j",
            (
                F.col("n").cast(D38) * F.col("p_ij")
                - F.col("s_i") * F.col("s_j")
            )
            .cast(D38)
            .alias("m_ij"),
        )
    )
    return m, s


def _norm_scaled_sq(w: DataFrame) -> DataFrame:
    """EXACT squared norm of the pre-scaled matvec result: each w_i is
    truncate-toward-zero divided by 10⁴ ((w − w%10⁴)/10⁴ — identical
    on both engines), squared, and summed in DECIMAL(38,0). 1-row
    (norm2s)."""
    wt = w.select(
        (
            (F.col("w_i") - F.col("w_i") % F.lit(10000).cast(D38))
            / F.lit(10000).cast(D38)
        )
        .cast(D38)
        .alias("wt")
    )
    return wt.agg(F.sum((F.col("wt") * F.col("wt")).cast(D38)).alias("norm2s"))


def power_iteration(m: DataFrame, dims: int, iters: int = 3) -> DataFrame:
    """``iters`` rounds of v ← quantize(M·v / ‖M·v‖) starting from the
    all-ones ×10⁴ fixed-point vector. Returns (dim_idx, v_q BIGINT) —
    the final quantized direction (the caller computes its Rayleigh
    quotient against M in exact integers). Every join is a KB
    relation; the corpus is never touched."""
    mi = m.select(
        F.col("i"), F.col("j"), F.col("m_ij")
    )
    # v0: all-ones direction at ×10⁴ scale, derived from the matrix's
    # own dimension ids (no spark.range: keeps the plan source-free)
    v = (
        mi.select(F.col("i").alias("dim_idx"))
        .distinct()
        .select("dim_idx", F.lit(10000).cast("bigint").alias("v_q"))
    )
    w = None
    for _ in range(iters):
        w = (
            mi.join(
                F.broadcast(v.select(F.col("dim_idx").alias("j"), "v_q")), "j"
            )
            .groupBy("i")
            .agg(
                F.sum((F.col("m_ij") * F.col("v_q").cast(D38)).cast(D38)).alias(
                    "w_i"
                )
            )
        )
        norm = _norm_scaled_sq(w).select(
            (F.sqrt(F.col("norm2s").cast("double")) * F.lit(10000.0)).alias(
                "norm_w"
            )
        )
        v = (
            w.crossJoin(F.broadcast(norm))
            .select(
                F.col("i").alias("dim_idx"),
                F.floor(
                    F.col("w_i").cast("double")
                    / F.col("norm_w")
                    * 10000.0
                    + F.lit(0.5)
                )
                .cast("bigint")
                .alias("v_q"),
            )
        )
    return v
