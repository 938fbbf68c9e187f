"""Numpy cross-checks for the linear-algebra family: the exact
quantized covariance moments and the power-iteration direction must
agree with a dense numpy replay of the same quantized data — an
INDEPENDENT implementation, not the DuckDB twin (which shares the
pipeline shape)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from retail_sales_analysis_etl_bi_project_spark.operators.linalg import (
    covariance_moments,
    power_iteration,
    quantized_elements,
)
from retail_sales_analysis_etl_bi_project_spark.plans.linalg_queries import (
    embed_pca_power_iteration,
)
from retail_sales_analysis_etl_bi_project_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def quantized(spark):
    emb = load_table(spark, SF_DIR, "embeddings").orderBy("vec_id")
    rows = emb.select("vec_id", "embedding").collect()
    q = np.array(
        [[math.floor(float(x) * 10000.0 + 0.5) for x in r.embedding] for r in rows],
        dtype=np.float64,
    )
    return q


def test_moments_match_numpy(spark, quantized):
    q = quantized
    n, d = q.shape
    m_np = n * (q.T @ q) - np.outer(q.sum(axis=0), q.sum(axis=0))
    m, _ = covariance_moments(quantized_elements(load_table(spark, SF_DIR, "embeddings")))
    got = {(r["i"], r["j"]): int(r["m_ij"]) for r in m.collect()}
    assert len(got) == d * d
    # spot-check the full diagonal and a stripe of off-diagonals
    for i in range(d):
        assert got[(i, i)] == int(round(m_np[i, i])), (i, i)
        j = (i * 7 + 3) % d
        assert got[(i, j)] == int(round(m_np[i, j])), (i, j)


def _replay_iteration(m_np: np.ndarray, iters: int) -> list[np.ndarray]:
    """Float64 replay of the quantized iteration (products exceed 2^53
    so this is APPROXIMATE vs the engine's exact integers — used for
    direction/Rayleigh tracking, never for exact equality)."""
    d = m_np.shape[0]
    v = np.full(d, 10000.0)
    out = [v]
    for _ in range(iters):
        w = m_np @ v
        wt = np.trunc(w / 10000.0)
        norm = math.sqrt(float(wt @ wt)) * 10000.0
        v = np.floor(w / norm * 10000.0 + 0.5)
        out.append(v)
    return out


def test_power_iteration_rayleigh_ascent(spark, quantized):
    """The test embeddings are near-isotropic (top two eigenvalues
    within ~7%), so 3 rounds cannot CONVERGE to the dominant
    eigenvector — and power iteration never promises that on a
    degenerate spectrum. What it does guarantee, on every spectrum of
    a symmetric PSD matrix, is RAYLEIGH ASCENT: R(v_{k+1}) ≥ R(v_k).
    That is the pinned invariant, plus direction agreement with an
    independent numpy replay of the same chain."""
    q = quantized
    n, d = q.shape
    m_np = n * (q.T @ q) - np.outer(q.sum(axis=0), q.sum(axis=0))
    vs = _replay_iteration(m_np, iters=3)

    def rayleigh(v):
        return float(v @ m_np @ v) / float(v @ v)

    rq = [rayleigh(v) for v in vs]
    # strict ascent from the all-ones start; per-step nondecreasing up
    # to the quantization quantum (re-quantizing to ×1e4 can shave a
    # whisker off a step on a near-degenerate spectrum)
    assert rq[-1] > rq[0] * 1.01, rq
    for a, b in zip(rq, rq[1:]):
        assert b >= a * (1 - 1e-6), rq

    m, _ = covariance_moments(
        quantized_elements(load_table(spark, SF_DIR, "embeddings"))
    )
    got = np.array(
        [
            r["v_q"]
            for r in power_iteration(m, dims=d, iters=3)
            .orderBy("dim_idx")
            .collect()
        ],
        dtype=np.float64,
    )
    ref = vs[-1]
    cos = abs(float(got @ ref) / (np.linalg.norm(got) * np.linalg.norm(ref)))
    # exact-integer engine vs float64 replay: identical chain up to
    # >2^53 rounding, so directions agree to ~1
    assert cos > 0.999, cos


def test_query_readout_consistent(spark, quantized):
    q = quantized
    n, d = q.shape
    m_np = n * (q.T @ q) - np.outer(q.sum(axis=0), q.sum(axis=0))
    evals = np.linalg.eigvalsh(m_np)
    out = embed_pca_power_iteration(spark, SF_DIR).collect()
    assert len(out) == d
    share = out[0]["explained_share"]
    lam = out[0]["lambda_scaled"]
    trace = float(np.trace(m_np))
    # Rayleigh quotient of ANY unit vector lies within the spectrum,
    # and the share must be a sane fraction of the trace
    assert evals.min() - 1e-6 <= lam <= evals.max() + 1e-6
    assert 0.0 < share < 1.0
    assert abs(share - lam / trace) < 1e-12
    assert all(r["n_vectors"] == n for r in out[:3])
    # per-dim scaled variances match numpy's diagonal exactly
    for r in out[:8]:
        assert float(r["var_ii_scaled"]) == float(m_np[r["dim_idx"], r["dim_idx"]])
