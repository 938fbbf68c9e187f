"""Property tests for the cross-engine numeric primitives.

The oracle hash-compare only proves Spark == DuckDB on the values the
testdata happens to contain; these tests drive the primitives with
ADVERSARIAL inputs (exact .5 scaled ties, shortest-repr edge cases,
subnormals of the scaled domain, random full-precision doubles) and
assert the two engines agree value-for-value — substantiating the
determinism claims in functions/money.py (fixed_point_sum) and
operators/dedup.py (hash60).
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.functions.money import (
    fixed_point_sum,
    fixed_point_sum_sql,
)
from retail_sales_analysis_etl_bi_project_spark.operators.dedup import hash60_expr


def _adversarial_doubles() -> list[float]:
    rng = random.Random(99)
    vals = [
        0.0,
        1e-7,            # below one micro-unit
        0.4999995,       # rounds at the 6th decimal boundary
        0.5000005,
        33.01,           # 2dp value whose *1e6 product sits just below int
        6.55,
        123.4567895,     # exact-looking tie at scale 6
        2.5e-6,          # x*1e6 == 2.5 exactly? (representable tie)
        3.5e-6,
        1.5,
        -0.4999995,      # negative ties: HALF_UP vs half-away must agree
        -33.01,
        -123.4567895,
        9999999.999999,
    ]
    vals += [rng.uniform(-1000, 1000) for _ in range(200)]
    vals += [rng.uniform(0, 1) * 10**rng.randint(-8, 6) for _ in range(200)]
    # doubles whose scaled value is an exact representable x.5 tie
    vals += [(k + 0.5) / 1e6 for k in range(0, 64, 7)]
    return vals


def test_fixed_point_sum_matches_duckdb_on_adversarial_doubles(spark):
    """Spark fixed_point_sum == DuckDB fixed_point_sum_sql per GROUP of
    one value (so every individual quantization must agree, not just a
    lucky cancellation in one big sum)."""
    vals = _adversarial_doubles()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    got = {
        r.id: r.s
        for r in df.groupBy("id").agg(fixed_point_sum("v").alias("s")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(id BIGINT, v DOUBLE)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, v) for i, v in enumerate(vals)])
    want = {
        i: s
        for i, s in con.execute(
            f"SELECT id, {fixed_point_sum_sql('v')} AS s FROM t GROUP BY id"
        ).fetchall()
    }
    assert set(got) == set(want)
    for i in got:
        assert got[i] == want[i] or (
            math.isnan(got[i]) and math.isnan(want[i])
        ), f"id={i} value={vals[i]!r}: spark {got[i]!r} != duckdb {want[i]!r}"


def test_spark_round_matches_duckdb_round_on_scaled_ties(spark):
    """The quantize step itself: Spark round(x*1e6) (BigDecimal HALF_UP
    on the shortest repr) must equal DuckDB ROUND(x*1e6) (half away from
    zero) for every double, including exact representable .5 ties in
    both signs."""
    vals = [v for v in _adversarial_doubles()]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    got = {
        r.id: r.q
        for r in df.select(
            "id", F.round(F.col("v") * F.lit(1e6)).alias("q")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, v) for i, v in enumerate(vals)])
    want = {
        i: q for i, q in con.execute("SELECT id, ROUND(v * 1000000.0) FROM t").fetchall()
    }
    for i in got:
        assert got[i] == want[i], (
            f"id={i} value={vals[i]!r}: spark {got[i]!r} != duckdb {want[i]!r}"
        )


def test_hash60_matches_duckdb_on_unicode_and_edges(spark):
    """hash60 (first 60 bits of md5 as bigint) must agree across engines
    for empty strings, whitespace, unicode, and random shingle-ish
    text — the primitive every MinHash/SimHash signature builds on."""
    rng = random.Random(5)
    alphabet = "abc XYZ 0123 \t\né中文\U0001f600'\"\\%_"
    texts = ["", " ", "a", "\n", "café au lait", "中文 token"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40)))
        for _ in range(150)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    got = {r.id: r.h for r in df.select("id", hash60_expr("t").alias("h")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)])
    # DuckDB twin from plans/dedup_queries.py (_hex60)
    hex60 = (
        "CAST(list_sum(list_transform(generate_series(1,15), "
        "i -> CAST(strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1 AS BIGINT)"
        " << (4*(15-i)))) AS BIGINT)"
    )
    want = {i: h for i, h in con.execute(f"SELECT id, {hex60} FROM t").fetchall()}
    assert got == want


def test_temperature_sample_thresholds_match_duckdb(spark):
    """The sampling keep-decision is the one curation expression with
    float math (frac*N*w*1e6/(sumw*c)); drive it with adversarial
    stratum skews and assert the kept id set is identical in DuckDB."""
    import pandas as pd

    from retail_sales_analysis_etl_bi_project_spark.operators.curation import (
        temperature_sample,
    )

    rng = random.Random(41)
    for trial in range(3):
        sizes = [rng.randint(1, 700) for _ in range(rng.randint(2, 7))]
        rows, nxt = [], 0
        for si, size in enumerate(sizes):
            for _ in range(size):
                rows.append(("s%d" % si, nxt))
                nxt += rng.randint(1, 9)  # sparse, irregular ids
        docs = spark.createDataFrame(rows, ["source", "doc_id"])
        frac = [0.3, 0.6, 0.97][trial]
        got = sorted(
            r.doc_id for r in temperature_sample(docs, frac=frac).collect()
        )
        con = duckdb.connect()
        con.register("docs_pd", pd.DataFrame(rows, columns=["source", "doc_id"]))
        h60 = (
            "CAST(list_sum(list_transform(generate_series(1,15), "
            "i -> CAST(strpos('0123456789abcdef', "
            "substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)"
            " << (4*(15-i)))) AS BIGINT)"
        )
        want = [
            r[0]
            for r in con.execute(
                f"""
            WITH cnt AS (SELECT source, COUNT(*) AS c FROM docs_pd GROUP BY source),
            wts AS (SELECT source, c,
                       CAST(FLOOR(sqrt(CAST(c AS DOUBLE) * CAST(1000000.0 AS DOUBLE)))
                            AS BIGINT) AS w FROM cnt),
            tot AS (SELECT SUM(c) AS n, SUM(w) AS sumw FROM wts),
            th AS (SELECT source,
                      CAST(LEAST(CAST(1000000.0 AS DOUBLE),
                                 FLOOR(CAST({frac} AS DOUBLE) * n * w
                                       * CAST(1000000.0 AS DOUBLE) / (sumw * c)))
                           AS BIGINT) AS keep_thresh
                   FROM wts, tot)
            SELECT doc_id FROM docs_pd d JOIN th USING (source)
            WHERE {h60} % 1000000 < keep_thresh
            ORDER BY doc_id
            """
            ).fetchall()
        ]
        assert got == want


def test_pq_adc_scores_match_duckdb_on_random_vectors(spark):
    """The PQ/ADC score (c.c - 2*(v_m . c)) must be bit-identical in
    Spark (aggregate fold over zip_with) and DuckDB (list_dot_product)
    on random full-precision doubles — argmin code assignment AND
    candidate ranking both hang off exact double equality, so a 1-ulp
    engine divergence would flip ties in the driver hash check."""
    import random

    from retail_sales_analysis_etl_bi_project_spark.operators.similarity import (
        _dbl,
        pq_subscores_expr,
    )

    rng = random.Random(7)
    dim, sub, ks = 16, 8, 4
    vecs = [[rng.uniform(-3, 3) for _ in range(dim)] for _ in range(40)]
    # two subspaces, ks centroids each, drawn from the same distribution
    cbs = [
        [[rng.uniform(-3, 3) for _ in range(sub)] for _ in range(ks)]
        for _ in range(dim // sub)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    got = {
        r.id: (list(r.s0), list(r.s1))
        for r in df.select(
            "id",
            pq_subscores_expr(_dbl("v"), 0, sub, cbs[0]).alias("s0"),
            pq_subscores_expr(_dbl("v"), 1, sub, cbs[1]).alias("s1"),
        ).collect()
    }
    con = duckdb.connect()
    for i, v in enumerate(vecs):
        for m in (0, 1):
            want = [
                con.execute(
                    "SELECT list_dot_product(?, ?) - 2.0*list_dot_product(?, ?)",
                    [c, c, v[m * sub : (m + 1) * sub], c],
                ).fetchone()[0]
                for c in cbs[m]
            ]
            assert got[i][m] == want, f"vec {i} subspace {m}: ADC scores diverge"


def test_fixed_point_partials_merge_to_one_pass_sum(spark):
    """fixed_point_partial/final (the incremental-merge form) must equal
    the one-pass fixed_point_sum bit-for-bit under ANY split of the
    rows — integer accumulators are associative, doubles are not. Split
    adversarial doubles into 3 arbitrary slices, aggregate each slice
    independently, merge."""
    from retail_sales_analysis_etl_bi_project_spark.functions.money import (
        fixed_point_final,
        fixed_point_partial,
    )

    rng = random.Random(99)
    vals = [round(rng.uniform(-1e4, 1e4), rng.randint(0, 6)) for _ in range(3000)]
    df = spark.createDataFrame(
        [(i % 7, i % 3, v) for i, v in enumerate(vals)], "g int, slice int, v double"
    )
    one_pass = {
        r.g: r.s
        for r in df.groupBy("g").agg(fixed_point_sum("v").alias("s")).collect()
    }
    merged = {
        r.g: r.s
        for r in (
            df.groupBy("g", "slice")
            .agg(fixed_point_partial("v").alias("_acc"))
            .groupBy("g")
            .agg(fixed_point_final("_acc").alias("s"))
            .collect()
        )
    }
    assert merged == one_pass  # exact ==, not approx: bit-identical


def test_epoch_seconds_floor_matches_duckdb_floored_epoch(spark):
    """Spark unix_timestamp() FLOORS sub-second timestamps; DuckDB
    CAST(epoch(ts) AS BIGINT) ROUNDS (banker's cast on a double). An
    oracle must use CAST(floor(epoch(ts)) AS BIGINT) — this pin exists
    because the interval-overlap oracle shipped with the rounding form
    and a session ending at xx:59:59.7 migrated into the wrong hour."""
    micros = [
        1_000_000_000_000_000 + off
        for off in (0, 1, 499_999, 500_000, 500_001, 999_999)
    ]
    df = spark.createDataFrame([(m,) for m in micros], "us long").select(
        F.timestamp_micros("us").alias("ts")
    )
    got = [r.s for r in df.select(F.unix_timestamp("ts").alias("s")).collect()]
    con = duckdb.connect()
    want = [
        con.sql(
            "SELECT CAST(floor(epoch(make_timestamp(" + str(m) + "))) AS BIGINT)"
        ).fetchone()[0]
        for m in micros
    ]
    assert got == want == [m // 1_000_000 for m in micros]
    # and the rounding form really does disagree — the trap is live
    rounded = [
        con.sql(
            "SELECT CAST(epoch(make_timestamp(" + str(m) + ")) AS BIGINT)"
        ).fetchone()[0]
        for m in micros
    ]
    assert rounded != got
