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

from pyspark.sql import DataFrame
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


def power_iteration(m: DataFrame, dims: int, iters: int = 3) -> DataFrame:
    """``iters`` rounds of v ← quantize(M·v / ‖M·v‖) starting from the
    all-ones ×10⁴ fixed-point vector. Returns (dim_idx, v_q BIGINT) —
    the final quantized direction (the caller computes its Rayleigh
    quotient against M in exact integers).

    Execution shape: the matvec is DISTRIBUTED over the (persisted)
    moment relation; the d-row result vector is COLLECTED each round
    (KBs — the codebook fitted-artifact discipline; the early-exit CC
    loop is the per-round-scalar-action precedent) and the norm /
    re-quantization run driver-side in EXACT Python integers, shipped
    back as a broadcast literal relation. Lazily nesting the rounds
    instead doubles the w-subtree per round (norm(w) re-references w),
    and a live explain measured 370 redundant scans / 33 s of pure
    plan overhead at sf0.001 — the collect is what keeps the plan
    flat. Arithmetic parity with the SQL twin: truncate-toward-zero
    pre-scaling uses abs-based integer division (Python % has floor
    semantics, SQL % truncates — the one place the engines disagree),
    float() of an exact int is the same correctly-rounded double as
    CAST(HUGEINT AS DOUBLE), and floor(x·10⁴+0.5) is floor on all
    three."""
    import math

    spark = m.sparkSession
    mi = m.select(F.col("i"), F.col("j"), F.col("m_ij"))
    v: dict[int, int] = {d: 10000 for d in range(dims)}
    for _ in range(iters):
        vdf = spark.createDataFrame(
            [(j, q) for j, q in sorted(v.items())], "j: bigint, v_b: bigint"
        ).select("j", F.col("v_b").cast(D38).alias("v_q"))
        w_rows = (
            mi.join(F.broadcast(vdf), "j")
            .groupBy("i")
            .agg(
                F.sum((F.col("m_ij") * F.col("v_q")).cast(D38)).alias("w_i")
            )
            .collect()
        )
        w = {int(r["i"]): int(r["w_i"]) for r in w_rows}
        # truncate-toward-zero: (w - w % 10⁴) // 10⁴ in SQL semantics
        wt = {
            i: (abs(x) // 10000) * (1 if x >= 0 else -1) for i, x in w.items()
        }
        norm = math.sqrt(float(sum(t * t for t in wt.values()))) * 10000.0
        v = {
            i: int(math.floor(float(x) / norm * 10000.0 + 0.5))
            for i, x in w.items()
        }
    return spark.createDataFrame(
        [(i, q) for i, q in sorted(v.items())], "dim_idx: bigint, v_q: bigint"
    )
