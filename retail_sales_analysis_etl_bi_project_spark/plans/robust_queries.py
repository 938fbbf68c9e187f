"""Round-13 robust / seasonal statistics over the star schema.

Three statistics that complete the r12 time-series family with the
ROBUST and SEASONAL members it still lacked, each a distinct mechanism
with an exact DuckDB twin:

- bi_revenue_trend_theilsen    : median-of-pairwise-slopes trend — the
                                 MAGNITUDE companion to Mann–Kendall
                                 (MK gives an outlier-proof trend
                                 DIRECTION; Theil–Sen gives the
                                 outlier-proof slope the OLS fit can't
                                 promise; agreement of all three is the
                                 standard trend-robustness story)
- bi_revenue_weekday_seasonality: exact ISO-weekday seasonal indices of
                                 the gapfilled daily series — the
                                 first-order decomposition behind the
                                 lag-7 ACF spike (ACF detects weekly
                                 structure; this QUANTIFIES it per day)
- events_value_mad_by_type     : per-type median / MAD / robust-z
                                 outlier counts — the distribution-free
                                 outlier monitor next to the z²-based
                                 events_anomaly_daily (a mean/σ monitor
                                 is itself corrupted by the outliers it
                                 hunts; median/MAD is 50%-breakdown)

Numeric discipline (REQUIREMENTS.md): medians are SELECTED elements
(lower median at rank (n+1) div 2 under a deterministic total order),
never interpolated, so every emitted median is a value both engines
hold bit-identically; products ride DECIMAL(38,0)/HUGEINT; each final
ratio is ONE IEEE double division of identically-rounded casts.

Reference scope: the reference's analytics stop at groupBy aggregates
(/root/reference/etl/etl.py:220-306); robust statistics are extension
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import fixed4_sql
from ..sources.tables import load_table
from .registry import query
from .trend_queries import _DEC, dense_daily_revenue, shared_daily_revenue

# Robust-z outlier cut: 3 standard deviations expressed in MAD units
# (3 × 1.4826 consistency constant), written as ONE literal — computed
# separately on each side, 3*1.4826 could round differently from the
# shared literal (the BM25-constant convention).
_MAD_K = 4.4478


@query(
    "bi_revenue_trend_theilsen",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM({fixed4_sql('o_totalprice')}) AS BIGINT) AS y4
      FROM orders GROUP BY 1),
    pairs AS (
      SELECT CAST(b.y4 - a.y4 AS BIGINT) AS dy4,
             CAST(date_diff('day', a.day, b.day) AS BIGINT) AS dx
      FROM daily a JOIN daily b ON a.day < b.day),
    ranked AS (
      SELECT dy4, dx,
             row_number() OVER (
               ORDER BY CAST(dy4 AS DOUBLE) / CAST(dx AS DOUBLE), dy4, dx
             ) AS r,
             count(*) OVER () AS m
      FROM pairs)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           CAST(m AS BIGINT) AS n_pairs,
           dy4 AS med_dy4,
           dx AS med_dx_days,
           CAST(dy4 AS DOUBLE) / CAST(dx AS DOUBLE)
             / CAST(10000.0 AS DOUBLE) AS slope_per_day
    FROM ranked WHERE r = (m + 1) // 2
    """,
)
def bi_revenue_trend_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL–SEN slope of daily revenue: the MEDIAN of all pairwise
    slopes (y_j − y_i)/(x_j − x_i) over observed days — the robust
    trend MAGNITUDE that completes the family (bi_revenue_trend_ols is
    efficient but a single outlier day tilts it; Mann–Kendall is
    outlier-proof but only signs the trend; Theil–Sen is the
    29%-breakdown slope estimator the two of them sandwich).

    Exactness: each pair's (dy4, dx) is an exact integer pair; the
    ordering key dy4/dx is ONE IEEE division both engines compute
    identically from the same integers, with an exact (dy4, dx)
    integer tie-break so equal doubles cannot reorder; the median is
    the SELECTED pair at rank (m+1) div 2 — the emitted med_dy4 /
    med_dx_days are exact BIGINTs (the hash anchor), and
    slope_per_day is the pinned double chain dy4/dx/10⁴.

    Scale shape (100 TB): the fact collapses to DAY grain first, so
    the pair join is C(n_days,2) — bounded by calendar span at ANY
    fact size (~2.9M pairs for 8 years, the Mann–Kendall shape); the
    median is selected by the TWO-PHASE distributed histogram rank
    (operators/ranks.py, r13 VERDICT item 1): a partitioned per-bucket
    histogram locates the median bucket, and only that ~m/1024 slice
    is sorted — no pair row ever passes through a global
    single-partition window. The selected pair is bit-identical to the
    old global row_number pick (monotone bucketing respects the total
    order; pinned in tests/test_ranks.py), so the DuckDB oracle — still
    the global-rank SQL — hash-matches unchanged. Emitting the
    selected pair keeps the statistic hashable where an averaged
    median would float-drift."""
    from ..operators.ranks import selected_lower_median, signed_log
    from .shared_cache import memo_persist

    daily = shared_daily_revenue(spark, sf_dir).select(
        "day", (F.col("rev") * 10000).cast("bigint").alias("y4")
    )

    def _build_pairs() -> DataFrame:
        a = daily.select(F.col("day").alias("da"), F.col("y4").alias("ya"))
        b = daily.select(F.col("day").alias("db"), F.col("y4").alias("yb"))
        return a.join(b, F.col("da") < F.col("db")).select(
            (F.col("yb") - F.col("ya")).cast("bigint").alias("dy4"),
            F.datediff("db", "da").cast("bigint").alias("dx"),
        )

    # managed persist (shared_cache discipline): the two-phase rank
    # reads the pair relation three times (bounds+count, histogram,
    # selected-bucket slice) — one materialization of the bounded
    # C(n_days,2) relation instead of three pair-join evaluations; at
    # 100 TB this persist is the inter-stage checkpoint slot
    pairs = memo_persist(
        "theilsen_pairs",
        (spark.sparkContext.applicationId, sf_dir),
        _build_pairs,
    )
    slope = F.col("dy4").cast("double") / F.col("dx").cast("double")
    n1 = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    # bucket on the signed log of the slope: dx=1 outlier slopes
    # stretch the raw range ~500x past the central mass (measured:
    # 81% of sf0.1 pairs in ONE uniform bucket; <1% per bucket after
    # the transform) — see operators/ranks.py:signed_log
    ranked = selected_lower_median(
        pairs, slope, ["dy4", "dx"], bucket_key=signed_log(slope)
    ).withColumnRenamed("__tp_m", "m")
    return ranked.crossJoin(F.broadcast(n1)).select(
        "n_days",
        F.col("m").alias("n_pairs"),
        F.col("dy4").alias("med_dy4"),
        F.col("dx").alias("med_dx_days"),
        (
            F.col("dy4").cast("double")
            / F.col("dx").cast("double")
            / F.lit(10000.0)
        ).alias("slope_per_day"),
    )


@query(
    "bi_revenue_weekday_seasonality",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders GROUP BY 1),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
    cal AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                               CAST(hi AS TIMESTAMP),
                                               INTERVAL 1 DAY)) AS DATE) AS day
            FROM b),
    dense AS (
      SELECT cal.day,
             CAST(coalesce({fixed4_sql('rev')},
                           CAST(0 AS HUGEINT)) AS HUGEINT) AS y4
      FROM cal LEFT JOIN daily USING (day)),
    wd AS (
      SELECT CAST(isodow(day) AS BIGINT) AS iso_dow,
             CAST(count(*) AS HUGEINT) AS n_wd,
             CAST(SUM(y4) AS HUGEINT) AS s_wd
      FROM dense GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n_wd) AS HUGEINT) AS n_all,
             CAST(SUM(s_wd) AS HUGEINT) AS s_all
      FROM wd)
    SELECT iso_dow,
           CAST(n_wd AS BIGINT) AS n_days,
           CAST(s_wd AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS revenue,
           CAST(s_wd * n_all AS DOUBLE)
             / CAST(n_wd * s_all AS DOUBLE) AS seasonal_index
    FROM wd CROSS JOIN tot
    ORDER BY iso_dow
    """,
)
def bi_revenue_weekday_seasonality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ISO-WEEKDAY seasonal indices of the gapfilled daily revenue:
    index_d = mean(revenue | weekday=d) / mean(revenue) — the
    first-order seasonal decomposition every weekly forecast divides
    out. The lag-7 spike in bi_revenue_autocorr says weekly structure
    EXISTS; this says Monday runs at index 1.2 and Sunday at 0.7 —
    the actionable shape. Computed over the DENSE calendar (missing
    days are exact-0 revenue days, the backtest/ACF convention), so a
    weekday's index is not inflated by it having fewer observed days.

    Exactness: per-weekday sums are exact ×10⁴ fixed-point HUGEINT /
    DECIMAL(38,0); the index is the integer-product rational
    (s_wd·n_all)/(n_wd·s_all) with ONE double division — no
    mean-of-means float chain.

    Scale shape (100 TB): fact → day grain (one map-side-combined
    groupBy, the shared_daily_revenue persist); calendar gapfill is a
    day-count sequence; the weekday rollup is a 7-group aggregate and
    the total a 1-row broadcast. Nothing here ever exceeds day-count
    cardinality."""
    dense = dense_daily_revenue(spark, sf_dir).select(
        (F.expr("weekday(day)") + 1).cast("bigint").alias("iso_dow"),
        (F.col("v") * 10000).cast(_DEC).alias("y4"),
    )
    wd = dense.groupBy("iso_dow").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n_wd"),
        F.sum("y4").cast(_DEC).alias("s_wd"),
    )
    tot = wd.agg(
        F.sum("n_wd").cast(_DEC).alias("n_all"),
        F.sum("s_wd").cast(_DEC).alias("s_all"),
    )
    return (
        wd.crossJoin(F.broadcast(tot))
        .select(
            "iso_dow",
            F.col("n_wd").cast("bigint").alias("n_days"),
            (F.col("s_wd").cast("double") / F.lit(10000.0)).alias("revenue"),
            (
                (F.col("s_wd") * F.col("n_all")).cast("double")
                / (F.col("n_wd") * F.col("s_all")).cast("double")
            ).alias("seasonal_index"),
        )
        .orderBy("iso_dow")
    )


@query(
    "embed_norm_stats_by_label",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings),
    n AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
      FROM v GROUP BY 1),
    med AS (
      SELECT label, nrm AS median_norm FROM (
        SELECT label, nrm,
               row_number() OVER (PARTITION BY label
                                  ORDER BY nrm, vec_id) AS r
        FROM v) s JOIN n USING (label)
      WHERE r = (n_vecs + 1) // 2)
    SELECT n.label, n.n_vecs,
           MIN(v.nrm) AS min_norm,
           med.median_norm,
           MAX(v.nrm) AS max_norm
    FROM v JOIN n USING (label) JOIN med USING (label)
    GROUP BY 1, 2, 4
    ORDER BY 1
    """,
)
def embed_norm_stats_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING NORM AUDIT per label: n / min / selected-median / max
    of the L2 norms — the embedding-table health check every
    vector-pipeline run logs (norm collapse toward 0 means a dead
    encoder head; a fat norm tail distorts dot-product retrieval and
    is why production indexes normalize or clip). Label grain matches
    the IVF/semantic-dedup consumers of the same table.

    Exactness: each norm is the deterministic sequential-fold
    sqrt(Σx²) both engines compute bit-identically (the proven
    dot_expr ↔ list_dot_product twin); min/max are order-free
    selections and the median is the SELECTED element at rank
    (n+1) div 2 under the (norm, vec_id) total order — no
    interpolation, no float summation anywhere.

    Scale shape (100 TB): one embeddings scan computes norms fused
    with the scan; the median rank is a window PARTITIONED BY label
    (parallel across labels; within-label is the documented
    single-partition rank concession — labels are ~10²-cardinality
    cluster ids here); the readout is label grain."""
    from ..operators.similarity import _dbl, norm_expr

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", norm_expr(_dbl("embedding")).alias("nrm")
    )
    n = v.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs")
    )
    w = Window.partitionBy("label").orderBy("nrm", "vec_id")
    med = (
        v.withColumn("r", F.row_number().over(w))
        .join(F.broadcast(n), "label")
        .filter(F.col("r") == F.expr("(n_vecs + 1) div 2"))
        .select("label", F.col("nrm").alias("median_norm"))
    )
    return (
        v.join(F.broadcast(n), "label")
        .join(F.broadcast(med), "label")
        .groupBy("label", "n_vecs", "median_norm")
        .agg(
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
        )
        .select(
            "label", "n_vecs", "min_norm", "median_norm", "max_norm"
        )
        .orderBy("label")
    )


@query(
    "bi_revenue_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders GROUP BY 1),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
    cal AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                               CAST(hi AS TIMESTAMP),
                                               INTERVAL 1 DAY)) AS DATE) AS day
            FROM b),
    dense AS (
      SELECT cal.day,
             row_number() OVER (ORDER BY cal.day) AS t,
             CAST(coalesce({fixed4_sql('rev')},
                           CAST(0 AS HUGEINT)) AS HUGEINT) AS y4
      FROM cal LEFT JOIN daily USING (day)),
    pre AS (
      SELECT day, t,
             CAST(SUM(y4) OVER (ORDER BY t) AS HUGEINT) AS s1,
             CAST(count(*) OVER () AS HUGEINT) AS n,
             CAST(SUM(y4) OVER () AS HUGEINT) AS s
      FROM dense),
    scored AS (
      SELECT day, t, s1, n, s,
             (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                / CAST(t AS DOUBLE))
             + (CAST(s - s1 AS DOUBLE) * CAST(s - s1 AS DOUBLE)
                  / CAST(n - t AS DOUBLE))
             - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE)) AS gain
      FROM pre WHERE t < n),
    best AS (
      SELECT *, row_number() OVER (ORDER BY gain DESC, t) AS r
      FROM scored)
    SELECT day AS split_day,
           CAST(t AS BIGINT) AS n_left,
           CAST(n - t AS BIGINT) AS n_right,
           CAST(s1 AS DOUBLE) / CAST(t AS DOUBLE)
             / CAST(10000.0 AS DOUBLE) AS mean_left,
           CAST(s - s1 AS DOUBLE) / CAST(n - t AS DOUBLE)
             / CAST(10000.0 AS DOUBLE) AS mean_right,
           gain
    FROM best WHERE r = 1
    """,
)
def bi_revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SINGLE-CHANGEPOINT detection (binary segmentation, first split)
    on the gapfilled daily revenue: the split t maximizing the
    between-segment sum-of-squares gain
    S₁²/t + (S−S₁)²/(N−t) − S²/N — the CUSUM-family statistic that
    answers "WHEN did the level shift" where events_cusum_drift only
    answers "has it shifted"; recursing on the halves is the classic
    binary-segmentation multi-changepoint algorithm, so this query is
    its unit step.

    Exactness: prefix sums S₁ and totals are exact ×10⁴ fixed-point
    integers; each candidate's gain is THREE IEEE divisions of exact
    integers added in fixed order (identical on both engines); the
    argmax is a deterministic (gain desc, t) rank-1 — equal gains
    cannot reorder across engines because the tie-break is the exact
    integer t. Means divide out once per output column.

    Scale shape (100 TB): the fact collapses to day grain first; the
    prefix sum and the argmax are day-count-sized windows (the
    documented single-partition day-grain concession, ~10³ rows at any
    fact size); no pair join at all — this is the LINEAR member of the
    trend family."""
    dense = dense_daily_revenue(spark, sf_dir).select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("t"),
        (F.col("v") * 10000).cast(_DEC).alias("y4"),
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pre = dense.select(
        "day",
        F.col("t").cast(_DEC).alias("t"),
        F.sum("y4").over(w_cum).cast(_DEC).alias("s1"),
        F.count(F.lit(1)).over(w_all).cast(_DEC).alias("n"),
        F.sum("y4").over(w_all).cast(_DEC).alias("s"),
    ).filter(F.col("t") < F.col("n"))
    gain = (
        (F.col("s1").cast("double") * F.col("s1").cast("double"))
        / F.col("t").cast("double")
        + (
            (F.col("s") - F.col("s1")).cast("double")
            * (F.col("s") - F.col("s1")).cast("double")
        )
        / (F.col("n") - F.col("t")).cast("double")
        - (F.col("s").cast("double") * F.col("s").cast("double"))
        / F.col("n").cast("double")
    )
    scored = pre.withColumn("gain", gain)
    best = scored.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("gain"), "t"))
    ).filter(F.col("r") == 1)
    return best.select(
        F.col("day").alias("split_day"),
        F.col("t").cast("bigint").alias("n_left"),
        (F.col("n") - F.col("t")).cast("bigint").alias("n_right"),
        (
            F.col("s1").cast("double")
            / F.col("t").cast("double")
            / F.lit(10000.0)
        ).alias("mean_left"),
        (
            (F.col("s") - F.col("s1")).cast("double")
            / (F.col("n") - F.col("t")).cast("double")
            / F.lit(10000.0)
        ).alias("mean_right"),
        "gain",
    )


@query(
    "events_interarrival_cv",
    oracle="""
    WITH e AS (
      SELECT event_type, event_id, epoch_us(ts) AS us
      FROM events),
    d AS (
      SELECT event_type,
             us - lag(us) OVER (PARTITION BY event_type
                                ORDER BY us, event_id) AS gap
      FROM e),
    g AS (SELECT event_type, gap FROM d WHERE gap IS NOT NULL),
    s AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(SUM(gap) AS HUGEINT) AS sd,
             CAST(SUM(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS sdd
      FROM g GROUP BY 1)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_gaps,
           CAST(sd AS BIGINT) AS sum_gap_us,
           CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)
             / CAST(1000000.0 AS DOUBLE) AS mean_gap_s,
           CAST(n * sdd - sd * sd AS DOUBLE)
             / CAST(sd * sd AS DOUBLE) AS cv2
    FROM s
    ORDER BY event_type
    """,
)
def events_interarrival_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-ARRIVAL VARIABILITY per event type: the squared
    coefficient of variation CV² = Var(gap)/mean(gap)² of the gaps
    between consecutive events of a type — the burstiness diagnostic
    (a Poisson process has CV² = 1; CV² ≫ 1 means bursty arrivals,
    CV² ≪ 1 means scheduled/metronomic ones), which tells a capacity
    planner whether a type's volume arrives smoothly or in spikes —
    the dimension the hourly/anomaly aggregates integrate away.

    Exactness: gaps are exact microsecond BIGINT differences under the
    deterministic (us, event_id) order; Σgap and Σgap² ride
    HUGEINT/DECIMAL(38,0) (gap² ~10¹⁶ × 10⁶ rows overflows int64);
    CV² is the single division (n·Σd² − (Σd)²)/(Σd)² of exact
    integers; mean_gap_s is one pinned double chain. Σd > 0 whenever
    n ≥ 1 (ties produce 0-gaps but a type's full span is positive),
    and types with a single event have no gaps and drop identically
    on both engines.

    Scale shape (100 TB): ONE lag window partitioned by event_type
    (parallel across types; within-type ordering is the documented
    single-partition-per-type concession, same as the sessionization
    family — salt by coarse time blocks past ~10⁸ events/type); the
    moment reduction is a per-type aggregate with map-side combine."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    g = e.select(
        "event_type",
        (F.col("us") - F.lag("us").over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    s = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("gap").cast(_DEC).alias("sd"),
        F.sum(F.col("gap").cast(_DEC) * F.col("gap").cast(_DEC)).alias("sdd"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_gaps"),
        F.col("sd").cast("bigint").alias("sum_gap_us"),
        (
            F.col("sd").cast("double")
            / F.col("n").cast("double")
            / F.lit(1000000.0)
        ).alias("mean_gap_s"),
        # try_divide: a type whose gaps are ALL zero (every event at one
        # timestamp) has sd=0 — DuckDB's 0/0 is NULL and the driver's
        # ANSI session would throw on a bare /; NULL is the honest
        # "variability undefined" answer on both engines
        F.try_divide(
            (F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")).cast(
                "double"
            ),
            (F.col("sd") * F.col("sd")).cast("double"),
        ).alias("cv2"),
    ).orderBy("event_type")


@query(
    "events_burst_intervals",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS hn,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    w AS (
      SELECT *,
             SUM(n) OVER (PARTITION BY event_type ORDER BY hn
                          RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS s24,
             COUNT(n) OVER (PARTITION BY event_type ORDER BY hn
                            RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS c24
      FROM d),
    flagged AS (
      SELECT event_type, hn, n FROM w
      WHERE c24 > 0 AND 2 * n * c24 > 3 * s24),
    starts AS (
      SELECT *,
             CASE WHEN lag(hn) OVER (PARTITION BY event_type ORDER BY hn)
                       = hn - 1 THEN 0 ELSE 1 END AS is_start
      FROM flagged),
    islands AS (
      SELECT *,
             SUM(is_start) OVER (PARTITION BY event_type ORDER BY hn)
               AS burst_id
      FROM starts)
    SELECT event_type,
           CAST(MIN(hn) AS BIGINT) AS start_hour,
           CAST(MAX(hn) AS BIGINT) AS end_hour,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(MAX(n) AS BIGINT) AS peak_hourly,
           CAST(SUM(n) AS BIGINT) AS total_events
    FROM islands
    GROUP BY event_type, burst_id
    ORDER BY event_type, start_hour
    """,
)
def events_burst_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURST DETECTION as gaps-and-islands: flag every hour whose event
    count exceeds 1.5× the type's trailing-24h mean (the exact-integer
    comparison 2·n·c24 > 3·s24 — no division, no float), then collapse
    CONSECUTIVE flagged hours into burst intervals with start/end/
    peak/total — the incident timeline a capacity runbook wants, where
    the anomaly family emits per-day flags and the CV² query emits one
    per-type burstiness number. The islands step (conditional start
    marker → running-sum island id) is the classic gaps-and-islands
    shape the repo's window family did not yet exercise.

    Exactness: hour numbers are exact epoch-hour BIGINTs (UTC session
    on both engines); the trailing frame is a RANGE frame over those
    integers (calendar gaps excluded from neither side — an hour with
    no events contributes no row and no trailing mass, identically);
    the flag and every output column are exact integer arithmetic.

    Scale shape (100 TB): events collapse to (type, hour) grain first
    (map-side combine); both windows are PARTITIONED BY event_type
    over hour-grain rows (time-bounded cardinality); the island
    aggregate is burst-grain. Nothing after the first groupBy touches
    corpus-sized data."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600")
        .cast("bigint")
        .alias("hn"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w24 = (
        Window.partitionBy("event_type")
        .orderBy("hn")
        .rangeBetween(-24, -1)
    )
    w = d.select(
        "event_type",
        "hn",
        "n",
        F.sum("n").over(w24).alias("s24"),
        F.count("n").over(w24).alias("c24"),
    )
    flagged = w.filter(
        (F.col("c24") > 0)
        & (F.lit(2) * F.col("n") * F.col("c24") > F.lit(3) * F.col("s24"))
    )
    seq = Window.partitionBy("event_type").orderBy("hn")
    starts = flagged.select(
        "event_type",
        "hn",
        "n",
        F.when(F.lag("hn").over(seq) == F.col("hn") - 1, 0)
        .otherwise(1)
        .alias("is_start"),
    )
    islands = starts.withColumn(
        "burst_id",
        F.sum("is_start").over(
            seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy("event_type", "burst_id")
        .agg(
            F.min("hn").cast("bigint").alias("start_hour"),
            F.max("hn").cast("bigint").alias("end_hour"),
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.max("n").cast("bigint").alias("peak_hourly"),
            F.sum("n").cast("bigint").alias("total_events"),
        )
        .drop("burst_id")
        .orderBy("event_type", "start_hour")
    )


# ONE oracle for both MAD forms: the window query and its two-phase
# rung emit IDENTICAL rows by construction (tests/test_ranks.py pins
# the selection law), so a shared SQL twin is the only way their
# oracles can never drift apart.
_MAD_ORACLE = f"""
    WITH v AS (
      SELECT event_type, event_id, value
      FROM events WHERE value IS NOT NULL),
    n AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_values
      FROM v GROUP BY 1),
    med AS (
      SELECT event_type, value AS med FROM (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS r
        FROM v) s JOIN n USING (event_type)
      WHERE r = (n_values + 1) // 2),
    d AS (
      SELECT v.event_type, v.event_id, abs(v.value - med.med) AS dev
      FROM v JOIN med USING (event_type)),
    madt AS (
      SELECT event_type, dev AS mad_value FROM (
        SELECT event_type, dev, event_id,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY dev, event_id) AS r
        FROM d) s JOIN n USING (event_type)
      WHERE r = (n_values + 1) // 2)
    SELECT n.event_type, n.n_values, med.med AS median_value,
           madt.mad_value,
           CAST(SUM(CASE WHEN d.dev > CAST({_MAD_K!r} AS DOUBLE)
                                      * madt.mad_value
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d
    JOIN med USING (event_type)
    JOIN madt USING (event_type)
    JOIN n USING (event_type)
    GROUP BY 1, 2, 3, 4
    ORDER BY 1
    """


def _mad_rows_per_group_bound() -> int:
    """Configurable dispatch bound for events_value_mad_by_type (r14
    VERDICT item 1c): groups larger than this run the two-phase
    distributed rank instead of the within-group row_number window.
    Default 10⁸ — the documented comfort bound of a single-partition
    per-group rank (SCALE.md); read per call so an operator (or a
    test) can flip the branch without re-importing the module."""
    import os

    return int(
        os.environ.get("SPARK_GRAFT_MAD_ROWS_PER_GROUP_BOUND", "100000000")
    )


@query("events_value_mad_by_type", oracle=_MAD_ORACLE)
def events_value_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type MEDIAN / MAD / robust-z outlier counts over the event
    ``value`` measure — the 50%-breakdown outlier monitor: a mean/σ
    rule (events_anomaly_daily's z²) is corrupted by the very outliers
    it hunts, while |v − median| > 3·1.4826·MAD keeps its cut wherever
    up to half the data is junk. The per-type grain matches the KS
    drift monitor — together they answer "did the shape move" (KS)
    and "which rows are wild" (this).

    Exactness: both the median and the MAD are SELECTED values (lower
    median at rank (n+1) div 2 under the deterministic (value,
    event_id) / (dev, event_id) total orders), not interpolations, so
    the emitted doubles are bit-identical raw data on both engines;
    dev = |v − med| is one IEEE subtraction; the outlier predicate
    compares against the shared literal 4.4478·MAD — same product both
    sides. Counts are exact BIGINTs.

    Scale shape (100 TB): two rank windows PARTITIONED BY event_type
    (parallel across types; within a type this is the documented
    single-partition rank — fine to ~10⁸ events per type, past that
    the two-phase distributed rank, DISPATCHED below); the deviation
    pass is one broadcast join of the 5-row median table; the readout
    is a per-type aggregate.

    Dispatch (r14 VERDICT item 1c): one tiny count aggregate measures
    the largest group; if it exceeds the configurable
    SPARK_GRAFT_MAD_ROWS_PER_GROUP_BOUND (default 10⁸), the query
    returns the two-phase rung's plan instead — same rows, same
    oracle (the shared _MAD_ORACLE), pinned rung == window by
    tests/test_ranks.py — so outgrowing a single partition is a config
    change, not a rewrite."""
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    max_group = (
        v.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    if max_group is not None and max_group > _mad_rows_per_group_bound():
        return events_value_mad_twophase(spark, sf_dir)
    n = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_values")
    )
    w_med = Window.partitionBy("event_type").orderBy("value", "event_id")
    med = (
        v.withColumn("r", F.row_number().over(w_med))
        .join(F.broadcast(n), "event_type")
        .filter(F.col("r") == F.expr("(n_values + 1) div 2"))
        .select("event_type", F.col("value").alias("med"))
    )
    d = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    w_mad = Window.partitionBy("event_type").orderBy("dev", "event_id")
    madt = (
        d.withColumn("r", F.row_number().over(w_mad))
        .join(F.broadcast(n), "event_type")
        .filter(F.col("r") == F.expr("(n_values + 1) div 2"))
        .select("event_type", F.col("dev").alias("mad_value"))
    )
    return (
        d.join(F.broadcast(med), "event_type")
        .join(F.broadcast(madt), "event_type")
        .join(F.broadcast(n), "event_type")
        .groupBy("event_type", "n_values", "med", "mad_value")
        .agg(
            F.sum(
                F.when(
                    F.col("dev") > F.lit(_MAD_K) * F.col("mad_value"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            "n_values",
            F.col("med").alias("median_value"),
            "mad_value",
            "n_outliers",
        )
        .orderBy("event_type")
    )


@query("events_value_mad_twophase", oracle=_MAD_ORACLE)
def events_value_mad_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALE RUNG (r13 VERDICT item 5) for events_value_mad_by_type:
    identical output — same columns, same selected medians, same
    outlier counts — with BOTH medians (value median and MAD) selected
    by the two-phase distributed histogram rank
    (operators/ranks.py:grouped_selected_lower_median) instead of the
    per-group row_number window. The production query keeps the
    rank-window form under the dispatch bound (parallel across the ~5
    types; within-type single-partition is fine to ~10⁸ rows/type and
    cheaper at bench scale — one pass per median vs the rung's three
    partitioned passes) and swaps to THIS plan past it;
    tests/test_ranks.py pins rung == exact on the test corpus, and the
    rung is REGISTERED with the shared _MAD_ORACLE (r14 VERDICT item
    1b) so its scale path earns its own DuckDB hash rows every
    round."""
    from ..operators.ranks import grouped_selected_lower_median
    from .shared_cache import memo_persist

    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    # the per-type median relation is ≤ n_types rows but costs the
    # rung's three partitioned passes to compute — and it is referenced
    # by every one of madt's three passes PLUS the deviation join and
    # the final readout, so left lazy the whole med subtree re-executed
    # ~9× per action (the linkpred subtree-reuse finding, r15 opt).
    # memo_persist gives it the managed KB-relation scope.
    med = memo_persist(
        "mad_twophase_med",
        (spark.sparkContext.applicationId, sf_dir),
        lambda: grouped_selected_lower_median(
            v, ["event_type"], F.col("value"), ["event_id"]
        ).select(
            "event_type",
            F.col("value").alias("med"),
            F.col("__tp_n").alias("n_values"),
        ),
    )
    d = v.join(F.broadcast(med.select("event_type", "med")), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    # same discipline for the MAD relation (r16): madt is ≤ n_types
    # rows but its rung costs three partitioned passes over the
    # fact-sized deviation relation `d` — and the readout below scans
    # `d` a fourth time, so left lazy every action paid 4 evaluations
    # of (events scan + broadcast join + abs). Persisting the KB madt
    # output leaves exactly ONE `d` evaluation per action.
    madt = memo_persist(
        "mad_twophase_madt",
        (spark.sparkContext.applicationId, sf_dir),
        lambda: grouped_selected_lower_median(
            d, ["event_type"], F.col("dev"), ["event_id"]
        ).select("event_type", F.col("dev").alias("mad_value")),
    )
    return (
        d.join(F.broadcast(med), "event_type")
        .join(F.broadcast(madt), "event_type")
        .groupBy("event_type", "n_values", "med", "mad_value")
        .agg(
            F.sum(
                F.when(
                    F.col("dev") > F.lit(_MAD_K) * F.col("mad_value"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            "n_values",
            F.col("med").alias("median_value"),
            "mad_value",
            "n_outliers",
        )
        .orderBy("event_type")
    )


@query(
    "embed_norm_median_twophase",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings),
    n AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
      FROM v GROUP BY 1)
    SELECT label, nrm AS median_norm FROM (
      SELECT label, nrm,
             row_number() OVER (PARTITION BY label
                                ORDER BY nrm, vec_id) AS r
      FROM v) s JOIN n USING (label)
    WHERE r = (n_vecs + 1) // 2
    ORDER BY label
    """,
)
def embed_norm_median_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALE RUNG for embed_norm_stats_by_label's per-label median
    norm: (label, median_norm) selected by the two-phase distributed
    histogram rank instead of the per-label row_number window —
    bit-identical selection (tests/test_ranks.py), partitioned passes
    only. Registered with its own DuckDB twin (r14 VERDICT item 1b):
    the oracle is the straight per-label row_number SQL, so every gate
    run proves two-phase == window selection on the real corpus."""
    from ..operators.ranks import grouped_selected_lower_median
    from ..operators.similarity import _dbl, norm_expr

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", norm_expr(_dbl("embedding")).alias("nrm")
    )
    return grouped_selected_lower_median(
        v, ["label"], F.col("nrm"), ["vec_id"]
    ).select("label", F.col("nrm").alias("median_norm")).orderBy("label")
