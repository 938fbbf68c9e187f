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


def dimension_sums(elems: DataFrame) -> DataFrame:
    """(dim_idx, s_q DECIMAL(38,0), n BIGINT): exact per-dimension sums
    and counts of the quantized elements — the 64-row half of the
    moment fit."""
    return elems.groupBy("dim_idx").agg(
        F.sum(F.col("q").cast(D38)).alias("s_q"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


def pair_product_sums(elems: DataFrame) -> DataFrame:
    """(i, j, p_ij DECIMAL(38,0), n BIGINT): exact pair-product sums —
    the d²-row corpus-sized half of the moment fit (d² rows per vector,
    map-side combined into d² total partials before the one shuffle)."""
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
    return (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("qi") * F.col("qj")).cast(D38)).alias("p_ij"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


def fit_moments(elems: DataFrame) -> tuple[dict, dict, dict]:
    """Collect the KB-scale moment fit driver-side (the codebook /
    fitted-artifact discipline): returns

      (ment, sums, counts) —
      ment[(i, j)]  = m_ij = n·p_ij − s_i·s_j   (exact Python int)
      sums[d]       = s_q per dimension          (exact Python int)
      counts[d]     = element count per dimension

    Exactness: p_ij / s_q arrive as DECIMAL(38,0) → Python Decimal →
    int (exact); n·p_ij − s_i·s_j in Python unbounded ints equals the
    DECIMAL(38,0) arithmetic bit-for-bit (magnitudes ~4e25 ≪ 1e38, no
    rounding on either side). Two corpus-scan jobs (pair products +
    dimension sums) collect d² + d rows — KBs at any corpus size."""
    p_rows = pair_product_sums(elems).collect()
    s_rows = dimension_sums(elems).collect()
    sums = {int(r["dim_idx"]): int(r["s_q"]) for r in s_rows}
    counts = {int(r["dim_idx"]): int(r["n"]) for r in s_rows}
    ment = {
        (int(r["i"]), int(r["j"])): int(r["n"]) * int(r["p_ij"])
        - sums[int(r["i"])] * sums[int(r["j"])]
        for r in p_rows
    }
    return ment, sums, counts


def power_iterate(ment: dict, dims: int, iters: int = 3) -> dict:
    """Pure exact-integer power iteration over a collected moment dict:
    ``iters`` rounds of v ← quantize(M·v / ‖M·v‖) from the all-ones
    ×10⁴ vector. Mirrors the distributed join/groupBy semantics exactly:
    w_i exists for every i with at least one (i, j) entry where j ∈ v;
    Python unbounded-int sums equal the DECIMAL(38,0) sums; the
    truncate-toward-zero pre-scaling, single IEEE sqrt, and
    floor(x·10⁴+0.5) re-quantization are unchanged from the distributed
    form (see power_iteration docstring for the cross-engine parity
    argument)."""
    import math

    v: dict[int, int] = {d: 10000 for d in range(dims)}
    for _ in range(iters):
        w: dict[int, int] = {}
        for (i, j), m_ij in ment.items():
            q = v.get(j)
            if q is not None:
                w[i] = w.get(i, 0) + m_ij * q
        wt = {
            i: (abs(x) // 10000) * (1 if x >= 0 else -1) for i, x in w.items()
        }
        norm = math.sqrt(float(sum(t * t for t in wt.values()))) * 10000.0
        if norm == 0.0:
            # zero-variance corpus: M·v = 0 every round. The distributed
            # form's double 0/0 gave NaN v_q; return the zero vector
            # instead of raising ZeroDivisionError (r15 ADVICE item 2 —
            # unreachable for the registered corpora, posture only).
            return {i: 0 for i in w}
        v = {
            i: int(math.floor(float(x) / norm * 10000.0 + 0.5))
            for i, x in w.items()
        }
    return v


def covariance_moments(elems: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Exact scaled covariance numerator from quantized elements.

    Returns (m, s): ``m`` = (i, j, m_ij DECIMAL(38,0)) with
    m_ij = N·Σ q_i q_j − Σq_i·Σq_j over all vectors — N²·10⁸ times the
    covariance of the quantized data — and ``s`` = (dim_idx,
    s_q DECIMAL(38,0), n BIGINT) the per-dimension sums. The pair
    product relation is d² rows PER VECTOR, aggregated map-side to d²
    total partials before the single shuffle."""
    pair_sums = pair_product_sums(elems)
    s = dimension_sums(elems)
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

    Execution shape: the d²-row moment relation is a KB fitted
    artifact at any corpus size, so it is COLLECTED once (the codebook
    discipline) and every matvec / norm / re-quantization runs
    driver-side in EXACT Python integers via power_iterate() — one
    collect job total, versus one distributed matvec job PER ROUND in
    the r15-build form (measured 2.3 s of per-invocation build time for
    3 rounds of pure job overhead over a 4096-row cached relation).
    Lazily nesting the rounds instead doubles the w-subtree per round,
    370 redundant scans at sf0.001 — collected KB arithmetic is what
    keeps the plan flat. Arithmetic parity with the SQL twin:
    Python unbounded-int sums equal DECIMAL(38,0) sums bit-for-bit;
    truncate-toward-zero pre-scaling uses abs-based integer division
    (Python % has floor semantics, SQL % truncates — the one place the
    engines disagree); float() of an exact int is the same
    correctly-rounded double as CAST(HUGEINT AS DOUBLE); and
    floor(x·10⁴+0.5) is floor on all three."""
    spark = m.sparkSession
    rows = m.select("i", "j", "m_ij").collect()
    ment = {(int(r["i"]), int(r["j"])): int(r["m_ij"]) for r in rows}
    v = power_iterate(ment, dims, iters)
    return spark.createDataFrame(
        [(i, q) for i, q in sorted(v.items())], "dim_idx: bigint, v_q: bigint"
    )
