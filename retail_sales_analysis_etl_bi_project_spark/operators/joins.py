"""Join shapes Spark's API lacks as primitives, built as compositions
of DataFrame ops (the brief's prescribed order: composition first,
Pandas UDF only if semantics demand it — these don't).

- asof_join   : most-recent-match time join (point-in-time lookup) via
                union + running last() window — ONE shuffle on the key,
                state per key = one running value. The classic
                backtest / feature-lookup primitive.
- range_join  : interval membership join via grid bucketing — turns a
                BETWEEN theta-join (BroadcastNestedLoop at best,
                cartesian at worst) into an equi-join on grid cell +
                residual filter. The standard trick for joining events
                to non-uniform value/time bands at scale.

No reference analog (the reference is equi-join only); these extend
SURVEY §2.3 for the LLM-pipeline/event surface."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_col: str,
    out_col: str,
    tiebreak: str,
) -> DataFrame:
    """For every left row, attach the latest ``value_col`` from ``right``
    with ``right.ts <= left.ts`` for the same ``on`` key (NULL if no
    prior right row) — as-of/backward join semantics.

    Implementation: tag and union both inputs, sort within each key by
    (ts, side, tiebreak) — right rows BEFORE left rows at equal ts, so
    a same-instant right row is visible (the <= in the spec); among
    equal-ts right rows the highest ``tiebreak`` wins — then a running
    ``last(..., ignorenulls)`` window carries the latest right row onto
    every left row. The carried payload is a STRUCT wrapping the value:
    every right row yields a non-null struct even when its value is
    NULL, so the semantics are "value of the latest right row" (a NULL
    value from the latest row IS returned), not "latest non-null
    value" — matching the LATERAL top-1 oracle. One shuffle on the key;
    the window state is a single struct per key, so it scales to
    arbitrarily long histories. (Per-key output order is deterministic
    even though equal-ts left rows sort arbitrarily: they all see the
    same carried struct.)

    Right rows with NULL ts are dropped: ascending sort places NULLs
    FIRST, so an unfiltered NULL-ts right row would be carried as the
    'earliest' match — but the spec's ``right.ts <= left.ts`` predicate
    (and the LATERAL oracle) excludes rows with unknown time. Left rows
    with NULL ts need no special case: they sort before every right
    row and naturally get a NULL ``out_col``."""
    right = right.filter(F.col(ts).isNotNull())
    rv_type = dict(right.dtypes)[value_col]
    lcols = left.columns
    payload = [c for c in lcols if c not in (on, ts)]
    l2 = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(0).cast("bigint").alias("_tb"),
        F.lit(None).cast(f"struct<v:{rv_type}>").alias("_rv"),
        *[F.col(c) for c in payload],
    )
    r2 = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(tiebreak).cast("bigint").alias("_tb"),
        F.struct(F.col(value_col).alias("v")).alias("_rv"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c in payload],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        l2.unionByName(r2)
        .withColumn("_carried", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(*lcols, F.col("_carried.v").alias(out_col))
    )


def range_join(
    fact: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    grid: float,
    small: bool = True,
) -> DataFrame:
    """Join fact rows to the interval [lo, hi) containing ``value_col``.

    Scale path: every interval explodes into the grid cells it covers
    (ceil(width/grid) rows — intervals are dims, this is tiny); every
    fact row computes its single cell; the join is an EQUI-join on cell
    plus the exact residual predicate. A naive ``ON v >= lo AND v < hi``
    plans as BroadcastNestedLoopJoin — per-row scan of all intervals —
    and can't shuffle-partition at all when the dim outgrows broadcast;
    the grid form shuffles on cell like any equi-join (``small=False``
    drops the broadcast hint for interval tables beyond broadcast
    size). ``grid`` should be on the order of the median interval
    width. A boundary-aligned ``hi`` emits one extra cell; the residual
    filter removes those rows, so no epsilon arithmetic is needed."""
    cells = intervals.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / grid).cast("bigint"),
                F.floor(F.col(hi_col) / grid).cast("bigint"),
            )
        ).alias("_cell"),
    )
    if small:
        cells = F.broadcast(cells)
    tagged = fact.withColumn(
        "_cell", F.floor(F.col(value_col) / grid).cast("bigint")
    )
    return (
        tagged.join(cells, on="_cell", how="inner")
        .filter(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_cell")
    )


def range_join_log(
    fact: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    base: float = 10.0,
    small: bool = True,
) -> DataFrame:
    """range_join for NON-uniform interval widths: multi-resolution
    grids. A single global grid forces a trade-off — sized for the
    narrow intervals it explodes wide intervals into thousands of
    cells ([100, 100000) at grid 20 is ~5,000 rows), sized for the wide
    ones it buckets every fact row of a narrow band into one hot cell.

    Here each interval picks the grid matching its own width's order of
    magnitude: level = floor(log_base(hi - lo)), grid = base^level, so
    every interval covers at most base+1 cells regardless of width. The
    fact side computes one (level, cell) per DISTINCT level present
    (collected from the interval dim — a handful of ints, same
    driver-side-literal pattern as the IVF codebook), and the join is
    an equi-join on (level, cell) + exact residual filter. Fact rows
    explode by n_levels (small: one per width decade in the dim), which
    at 100 TB beats per-interval cell explosions by orders of
    magnitude. Zero-or-negative-width intervals are dropped (they match
    nothing under lo <= v < hi)."""
    lvl = F.floor(
        F.log(float(base), F.col(hi_col) - F.col(lo_col))
    ).cast("int")
    ivs = intervals.filter(F.col(hi_col) > F.col(lo_col)).withColumn("_lvl", lvl)
    grid = F.pow(F.lit(float(base)), F.col("_lvl"))
    cells = ivs.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / grid).cast("bigint"),
                F.floor(F.col(hi_col) / grid).cast("bigint"),
            )
        ).alias("_cell"),
    )
    if small:
        cells = F.broadcast(cells)
    levels = sorted(
        r._lvl for r in ivs.select("_lvl").distinct().collect()
    )
    tagged = fact.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).alias("_lvl"),
                        F.floor(F.col(value_col) / F.lit(float(base) ** L))
                        .cast("bigint")
                        .alias("_cell"),
                    )
                    for L in levels
                ]
            )
        ).alias("_lc"),
    ).select("*", F.col("_lc._lvl").alias("_lvl"), F.col("_lc._cell").alias("_cell"))
    return (
        tagged.join(cells, on=["_lvl", "_cell"], how="inner")
        .filter(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_lvl", "_cell", "_lc")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    grid: float,
    small: bool = False,
) -> DataFrame:
    """Interval × interval OVERLAP join, half-open [lo, hi) both sides:
    a pair matches iff ``l_lo < r_hi AND r_lo < l_hi`` — the
    sessions×outages / validity×campaign primitive that completes the
    temporal-join trio (asof_join: point×history, range_join:
    point×interval, this: interval×interval).

    Scale path: BOTH sides explode into the grid cells they cover
    (ceil(width/grid)+1 rows each), the join is an EQUI-join on cell +
    the exact overlap residual — shuffles on cell like any equi-join,
    where the naive theta form is a BroadcastNestedLoopJoin that can't
    shuffle-partition at all once neither side broadcasts. Each
    overlapping pair co-occupies every cell of the overlap region, so
    it is reported ONCE at the agreed reference cell
    ``max(first_cell(left), first_cell(right))`` instead of paying a
    DISTINCT over the matched rows. That cell is always covered by both
    sides: it is >= both first cells by construction, and overlap gives
    ``r_lo < l_hi`` so ``floor(r_lo/grid) <= floor(l_hi/grid)`` (the
    left side's last emitted cell; symmetric for the right) — the
    boundary-aligned extra cell each side emits is exactly what makes
    the bound inclusive, and false boundary matches die in the overlap
    residual.

    ``grid`` should be on the order of the median interval width (for
    mixed-width workloads, bucket by width decade as range_join_log
    does). Column names must be disjoint across the two inputs.
    Zero-or-negative-width intervals match nothing and are dropped.
    """
    g = F.lit(float(grid))

    def cells(df: DataFrame, lo: str, hi: str, c0: str) -> DataFrame:
        return (
            df.filter(F.col(hi) > F.col(lo))
            .withColumn(c0, F.floor(F.col(lo) / g).cast("bigint"))
            .withColumn(
                "_cell",
                F.explode(
                    F.sequence(
                        F.col(c0), F.floor(F.col(hi) / g).cast("bigint")
                    )
                ),
            )
        )

    lc = cells(left, l_lo, l_hi, "_c0l")
    rc = cells(right, r_lo, r_hi, "_c0r")
    if small:
        rc = F.broadcast(rc)
    return (
        lc.join(rc, on="_cell", how="inner")
        .filter((F.col(l_lo) < F.col(r_hi)) & (F.col(r_lo) < F.col(l_hi)))
        .filter(F.col("_cell") == F.greatest("_c0l", "_c0r"))
        .drop("_cell", "_c0l", "_c0r")
    )
