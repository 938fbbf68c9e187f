"""Round-14 association / hypothesis-test statistics over the star
schema — four mechanisms the r13 trend/robust family still lacked,
each with an exact DuckDB twin:

- bi_spearman_rev_qty_daily   : midrank Spearman correlation between
                                the daily revenue and daily order-count
                                series — DO busier days actually bring
                                proportionally more money? The rank
                                form is the outlier-proof companion to
                                a Pearson fit, and the first CROSS-
                                SERIES statistic in the registry (the
                                trend family is all univariate).
- bi_weekend_mannwhitney      : tie-corrected Mann–Whitney U test of
                                weekend vs weekday daily revenue — the
                                distribution-free "is weekend revenue
                                genuinely different" test behind the
                                weekday seasonal indices (the index
                                QUANTIFIES the gap; this SIGNIFICANCE-
                                tests it without normality).
- bi_active_customer_churn_jaccard : month-over-month Jaccard of the
                                active-customer SET — the set-churn
                                monitor (revenue can be flat while the
                                customer base silently rotates).
- events_type_weekday_chisq   : per-cell chi-square contributions of
                                the event_type × ISO-weekday
                                contingency table — WHICH type/day
                                cells drive any type-mix weekday
                                dependence.

Numeric discipline (REQUIREMENTS.md): ranks are integer MIDRANKS
SCALED BY 2 (midrank = (first+last)/2 can be a .5; ×2 keeps every
rank an exact integer), moments ride DECIMAL(38,0)/HUGEINT, each
emitted double is a pinned chain of casts/divisions/IEEE sqrt of
identically-exact integers — sqrt is correctly rounded under
IEEE-754 on both engines (the embed-norm precedent).

Reference scope: the reference's analytics stop at groupBy sums
(/root/reference/etl/etl.py:220-306); association statistics are
extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import fixed4_sql
from ..sources.tables import load_table
from .registry import query
from .trend_queries import _DEC

# DuckDB fragment: observed daily series (day, y4 revenue, c orders)
_SQL_DAILY_XY = f"""
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM({fixed4_sql('o_totalprice')}) AS HUGEINT) AS y4,
           CAST(count(*) AS HUGEINT) AS c
    FROM orders GROUP BY 1
"""


def _daily_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed (day, y4, c): exact ×10⁴ fixed-point daily revenue and
    the order count — ONE fact scan, map-side combined, day grain."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,4)")) * 10000)
            .cast(_DEC)
            .alias("y4"),
            F.count(F.lit(1)).cast(_DEC).alias("c"),
        )
    )


def _midrank2(order_col: str) -> Column:
    """Spark columns for the ×2 integer midrank of ``order_col``:
    2·rank + ties − 1, where rank is the SQL-standard min-rank and
    ties the value's multiplicity — positions rank..rank+ties−1
    average to rank+(ties−1)/2, so the doubled midrank is exactly
    2·rank+ties−1, an integer for any tie pattern."""
    w_rank = Window.orderBy(order_col)
    w_ties = Window.partitionBy(order_col)
    return (
        2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_ties) - 1
    ).cast(_DEC)


@query(
    "bi_spearman_rev_qty_daily",
    oracle=f"""
    WITH daily AS ({_SQL_DAILY_XY}),
    ranked AS (
      SELECT CAST(2 * rank() OVER (ORDER BY y4)
                  + count(*) OVER (PARTITION BY y4) - 1 AS HUGEINT) AS rx,
             CAST(2 * rank() OVER (ORDER BY c)
                  + count(*) OVER (PARTITION BY c) - 1 AS HUGEINT) AS ry
      FROM daily),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(SUM(rx) AS HUGEINT) AS sx,
             CAST(SUM(ry) AS HUGEINT) AS sy,
             CAST(SUM(rx * ry) AS HUGEINT) AS sxy,
             CAST(SUM(rx * rx) AS HUGEINT) AS sxx,
             CAST(SUM(ry * ry) AS HUGEINT) AS syy
      FROM ranked)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(n * sxy - sx * sy AS BIGINT) AS s_num,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS spearman_rho
    FROM m
    """,
)
def bi_spearman_rev_qty_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN rank correlation between the daily-revenue and
    daily-order-count series — the registry's first cross-series
    statistic: rank both series (×2 integer midranks so ties stay
    exact), then Pearson on the ranks. High rho means busy days and
    big-money days are the SAME days; a low rho with a strong
    univariate trend means order count and basket size move on
    different calendars — the decomposition a capacity planner needs.

    Exactness: ×2 midranks are exact integers for any tie pattern
    (2·rank+ties−1); all five moments ride DECIMAL(38,0)/HUGEINT;
    s_num = n·Σrxry − Σrx·Σry is the exact-integer hash anchor; rho
    is the pinned chain num/(sqrt(d1)·sqrt(d2)) of exactly-rounded
    double casts (IEEE sqrt is correctly rounded on both engines).

    Scale shape (100 TB): the fact collapses to DAY grain in one
    map-side-combined pass; the rank windows run over day-count rows
    (the documented bounded day-grain concession — and past decade
    scale, operators/ranks.py's two-phase histogram is the same swap
    family); the moment reduction is one row."""
    daily = _daily_xy(spark, sf_dir)
    ranked = daily.select(
        _midrank2("y4").alias("rx"), _midrank2("c").alias("ry")
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("rx").cast(_DEC).alias("sx"),
        F.sum("ry").cast(_DEC).alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast(_DEC).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast(_DEC).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast(_DEC).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("n").cast("bigint").alias("n_days"),
        num.cast("bigint").alias("s_num"),
        (
            num.cast("double")
            / (F.sqrt(d1.cast("double")) * F.sqrt(d2.cast("double")))
        ).alias("spearman_rho"),
    )


@query(
    "bi_weekend_mannwhitney",
    oracle=f"""
    WITH daily AS ({_SQL_DAILY_XY}),
    g AS (
      SELECT y4,
             CASE WHEN isodow(day) >= 6 THEN 1 ELSE 0 END AS is_we
      FROM daily),
    ranked AS (
      SELECT is_we,
             CAST(2 * rank() OVER (ORDER BY y4)
                  + count(*) OVER (PARTITION BY y4) - 1 AS HUGEINT) AS r2
      FROM g),
    ties AS (
      SELECT CAST(coalesce(SUM(t * t * t - t), 0) AS HUGEINT) AS tie_t
      FROM (SELECT CAST(count(*) AS HUGEINT) AS t FROM g GROUP BY y4)),
    m AS (
      SELECT CAST(SUM(is_we) AS HUGEINT) AS n1,
             CAST(SUM(1 - is_we) AS HUGEINT) AS n2,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(SUM(CASE WHEN is_we = 1 THEN r2 ELSE 0 END)
                  AS HUGEINT) AS r1_2
      FROM ranked)
    SELECT CAST(n1 AS BIGINT) AS n_weekend,
           CAST(n2 AS BIGINT) AS n_weekday,
           CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS u2_weekend,
           CAST(tie_t AS BIGINT) AS tie_term,
           CAST(r1_2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
             / (CAST(2 AS DOUBLE)
                * sqrt(CAST(n1 * n2 * ((n + 1) * n * (n - 1) - tie_t)
                            AS DOUBLE)
                       / CAST(12 * n * (n - 1) AS DOUBLE))) AS z_score
    FROM m CROSS JOIN ties
    """,
)
def bi_weekend_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected MANN–WHITNEY U test: weekend daily revenues vs
    weekday daily revenues — the distribution-free two-sample location
    test (no normality assumed, outlier days only move ranks by one)
    that significance-tests the gap bi_revenue_weekday_seasonality
    quantifies. U is computed from the rank-sum identity
    U₁ = R₁ − n₁(n₁+1)/2; the normal approximation's variance carries
    the exact tie correction n₁n₂((n+1)n(n−1) − Σ(t³−t))/(12n(n−1)).

    Exactness: ×2 midranks keep U₂ = 2U₁ an exact integer (the hash
    anchor, with the exact Σ(t³−t) tie term beside it); the z-score is
    one pinned chain — exact-integer numerator, one division, one IEEE
    sqrt, one ×2 — identical on both engines.

    Scale shape (100 TB): day grain after one fact pass; one bounded
    rank window; 1-row readout."""
    daily = _daily_xy(spark, sf_dir).select(
        "y4",
        F.when(F.expr("weekday(day)") >= 5, 1).otherwise(0).alias("is_we"),
    )
    r2 = _midrank2("y4").alias("r2")
    ranked = daily.select("is_we", r2)
    ties = (
        daily.groupBy("y4")
        .agg(F.count(F.lit(1)).cast(_DEC).alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")),
                F.lit(0).cast(_DEC),
            )
            .cast(_DEC)
            .alias("tie_t")
        )
    )
    m = ranked.agg(
        F.sum("is_we").cast(_DEC).alias("n1"),
        F.sum(1 - F.col("is_we")).cast(_DEC).alias("n2"),
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.when(F.col("is_we") == 1, F.col("r2")).otherwise(0))
        .cast(_DEC)
        .alias("r1_2"),
    )
    u2 = F.col("r1_2") - F.col("n1") * (F.col("n1") + 1)
    var_num = F.col("n1") * F.col("n2") * (
        (F.col("n") + 1) * F.col("n") * (F.col("n") - 1) - F.col("tie_t")
    )
    var_den = F.lit(12).cast(_DEC) * F.col("n") * (F.col("n") - 1)
    return m.crossJoin(F.broadcast(ties)).select(
        F.col("n1").cast("bigint").alias("n_weekend"),
        F.col("n2").cast("bigint").alias("n_weekday"),
        u2.cast("bigint").alias("u2_weekend"),
        F.col("tie_t").cast("bigint").alias("tie_term"),
        (
            (u2 - F.col("n1") * F.col("n2")).cast("double")
            / (
                F.lit(2.0)
                * F.sqrt(var_num.cast("double") / var_den.cast("double"))
            )
        ).alias("z_score"),
    )


@query(
    "bi_active_customer_churn_jaccard",
    oracle="""
    WITH am AS (
      SELECT DISTINCT
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                  AS BIGINT) AS mnum,
             o_custkey
      FROM orders),
    n AS (SELECT mnum, CAST(count(*) AS BIGINT) AS n_active
          FROM am GROUP BY 1),
    inter AS (
      SELECT a.mnum AS mprev, CAST(count(*) AS BIGINT) AS n_retained
      FROM am a JOIN am b
        ON a.o_custkey = b.o_custkey AND b.mnum = a.mnum + 1
      GROUP BY 1)
    SELECT CAST((np.mnum // 12) * 100 + (np.mnum % 12) + 1
                AS BIGINT) AS ym_prev,
           CAST((nn.mnum // 12) * 100 + (nn.mnum % 12) + 1
                AS BIGINT) AS ym_next,
           np.n_active AS n_prev,
           nn.n_active AS n_next,
           coalesce(i.n_retained, 0) AS n_retained,
           CAST(coalesce(i.n_retained, 0) AS DOUBLE)
             / CAST(np.n_active + nn.n_active - coalesce(i.n_retained, 0)
                    AS DOUBLE) AS jaccard,
           CAST(coalesce(i.n_retained, 0) AS DOUBLE)
             / CAST(np.n_active AS DOUBLE) AS retention
    FROM n np
    JOIN n nn ON nn.mnum = np.mnum + 1
    LEFT JOIN inter i ON i.mprev = np.mnum
    ORDER BY ym_next
    """,
)
def bi_active_customer_churn_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MONTH-OVER-MONTH SET CHURN: the Jaccard similarity (and plain
    retention rate) of consecutive months' active-customer SETS — the
    base-rotation monitor the revenue aggregates can't see (total
    revenue can be flat while half the customer base is new every
    month). The retention-cohort query answers "how long does a
    cohort live"; this answers "how much of THIS month's base is last
    month's" — one row per consecutive month pair.

    Exactness: set sizes and intersections are exact BIGINT counts of
    distinct (month, customer) pairs; Jaccard and retention are one
    double division each (|A∩B| / (|A|+|B|−|A∩B|), |A∩B|/|A|).

    Scale shape (100 TB): the fact collapses to distinct
    (month, custkey) — one shuffle on the composite key with map-side
    combine; the consecutive-month intersection is an equi-join keyed
    on (custkey, month+1), both sides partitioned by custkey; the
    readout is month-count rows. No month is compared to more than
    its immediate successor, so the join fan-out is linear in the
    active-pair count, never quadratic in months."""
    am = (
        load_table(spark, sf_dir, "orders")
        .select(
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
            )
            .cast("bigint")
            .alias("mnum"),
            "o_custkey",
        )
        .distinct()
    )
    n = am.groupBy("mnum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active")
    )
    a = am.select(F.col("mnum").alias("mprev"), "o_custkey")
    b = am.select((F.col("mnum") - 1).alias("mprev"), "o_custkey")
    inter = (
        a.join(b, ["mprev", "o_custkey"])
        .groupBy("mprev")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_retained"))
    )

    def _ym(c):
        return (
            F.floor(c / F.lit(12)).cast("bigint") * 100 + (c % 12) + 1
        ).cast("bigint")

    np_ = n.select(
        F.col("mnum").alias("mprev"), F.col("n_active").alias("n_prev")
    )
    nn = n.select(
        (F.col("mnum") - 1).alias("mprev"),
        F.col("n_active").alias("n_next"),
    )
    ret = F.coalesce(F.col("n_retained"), F.lit(0))
    return (
        np_.join(nn, "mprev")
        .join(inter, "mprev", "left")
        .select(
            _ym(F.col("mprev")).alias("ym_prev"),
            _ym(F.col("mprev") + 1).alias("ym_next"),
            "n_prev",
            "n_next",
            ret.cast("bigint").alias("n_retained"),
            (
                ret.cast("double")
                / (F.col("n_prev") + F.col("n_next") - ret).cast("double")
            ).alias("jaccard"),
            (ret.cast("double") / F.col("n_prev").cast("double")).alias(
                "retention"
            ),
        )
        .orderBy("ym_next")
    )


@query(
    "events_type_weekday_chisq",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS iso_dow,
             CAST(count(*) AS HUGEINT) AS o
      FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, CAST(SUM(o) AS HUGEINT) AS rt
          FROM cells GROUP BY 1),
    c AS (SELECT iso_dow, CAST(SUM(o) AS HUGEINT) AS ct
          FROM cells GROUP BY 1),
    t AS (SELECT CAST(SUM(o) AS HUGEINT) AS n FROM cells)
    SELECT cells.event_type, cells.iso_dow,
           CAST(o AS BIGINT) AS n_obs,
           CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
           CAST((o * n - rt * ct) * (o * n - rt * ct) AS DOUBLE)
             / CAST(n * rt * ct AS DOUBLE) AS chi2_cell
    FROM cells JOIN r USING (event_type) JOIN c USING (iso_dow)
    CROSS JOIN t
    ORDER BY event_type, iso_dow
    """,
)
def events_type_weekday_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-CELL chi-square contributions of the event_type ×
    ISO-weekday contingency table — the independence diagnostic for
    the event mix: under independence every cell's (O·N − R·C)²/(N·R·C)
    is small; the big cells NAME which type runs hot on which weekday
    (the actionable readout a single summed χ² hides). Per-cell
    emission also keeps every number a pinned chain of exact integers
    — no cross-cell double summation whose order could differ between
    engines.

    Exactness: O, R, C, N are exact counts; the numerator
    (O·N − R·C)² and denominator N·R·C ride DECIMAL(38,0)/HUGEINT
    (O·N ~ 10⁶·10⁶ at sf0.1 already passes int64 at the 100 TB design
    point); expected and chi2_cell are one double division each.

    Scale shape (100 TB): ONE fact pass collapses to the ~35-cell
    contingency table (map-side combined); margins are re-aggregations
    of the tiny cell relation; the readout joins are cell-count-sized
    broadcasts."""
    cells = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.expr("weekday(cast(ts as date))") + 1)
            .cast("bigint")
            .alias("iso_dow"),
        )
        .agg(F.count(F.lit(1)).cast(_DEC).alias("o"))
    )
    r = cells.groupBy("event_type").agg(F.sum("o").cast(_DEC).alias("rt"))
    c = cells.groupBy("iso_dow").agg(F.sum("o").cast(_DEC).alias("ct"))
    t = cells.agg(F.sum("o").cast(_DEC).alias("n"))
    num = (F.col("o") * F.col("n") - F.col("rt") * F.col("ct"))
    return (
        cells.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "iso_dow")
        .crossJoin(F.broadcast(t))
        .select(
            "event_type",
            "iso_dow",
            F.col("o").cast("bigint").alias("n_obs"),
            (
                (F.col("rt") * F.col("ct")).cast("double")
                / F.col("n").cast("double")
            ).alias("expected"),
            (
                (num * num).cast("double")
                / (F.col("n") * F.col("rt") * F.col("ct")).cast("double")
            ).alias("chi2_cell"),
        )
        .orderBy("event_type", "iso_dow")
    )
