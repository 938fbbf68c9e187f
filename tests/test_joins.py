"""Composed-join operator tests: as-of join edge semantics (equal
timestamps, tiebreaks, no-prior-match) and range-join boundary/grid
behavior on hand-built fixtures."""

import datetime

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.joins import (
    asof_join,
    range_join,
)


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 10, minute)


def test_asof_takes_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(30)), (3, 100, _ts(5))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(11, 100, _ts(8), 1.0), (12, 100, _ts(20), 2.0)],
        "rid long, k long, ts timestamp, v double",
    )
    out = {
        r.id: r.last_v
        for r in asof_join(left, right, "k", "ts", "v", "last_v", "rid").collect()
    }
    assert out == {1: 1.0, 2: 2.0, 3: None}  # 3 precedes any right row


def test_asof_equal_ts_right_visible_and_tiebreak(spark):
    """A right row AT the left timestamp counts (<= semantics); among
    equal-ts right rows the highest tiebreak id wins."""
    left = spark.createDataFrame([(1, 7, _ts(10))], "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(21, 7, _ts(10), 5.0), (22, 7, _ts(10), 9.0)],
        "rid long, k long, ts timestamp, v double",
    )
    out = asof_join(left, right, "k", "ts", "v", "last_v", "rid").collect()
    assert out[0].last_v == 9.0


def test_asof_latest_row_wins_even_with_null_value(spark):
    """Contract is 'value of the LATEST right row' — a NULL value on the
    latest row must be returned, not skipped in favor of an older
    non-null value (matches the LATERAL top-1 oracle semantics)."""
    left = spark.createDataFrame([(1, 5, _ts(30))], "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(41, 5, _ts(10), 7.0), (42, 5, _ts(20), None)],
        "rid long, k long, ts timestamp, v double",
    )
    out = asof_join(left, right, "k", "ts", "v", "last_v", "rid").collect()
    assert out[0].last_v is None


def test_asof_keys_are_independent(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 2, _ts(10))], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(31, 1, _ts(5), 1.5)], "rid long, k long, ts timestamp, v double"
    )
    out = {
        r.id: r.last_v
        for r in asof_join(left, right, "k", "ts", "v", "last_v", "rid").collect()
    }
    assert out == {1: 1.5, 2: None}


def test_range_join_boundaries_and_gaps(spark):
    fact = spark.createDataFrame(
        [(1, 0.5), (2, 1.0), (3, 4.99), (4, 5.0), (5, 99.9)],
        "id long, v double",
    )
    bands = spark.createDataFrame(
        [("a", 0.0, 1.0), ("b", 1.0, 5.0)], "band string, lo double, hi double"
    )
    out = {r.id: r.band for r in range_join(fact, bands, "v", "lo", "hi", 2.0).collect()}
    # hi is exclusive, lo inclusive; values outside every band drop out
    assert out == {1: "a", 2: "b", 3: "b"}


def test_range_join_matches_naive_between(spark):
    import random

    rng = random.Random(3)
    fact = spark.createDataFrame(
        [(i, rng.uniform(0, 50)) for i in range(500)], "id long, v double"
    )
    bands = spark.createDataFrame(
        [("x", 0.0, 7.5), ("y", 7.5, 8.0), ("z", 8.0, 41.0)],
        "band string, lo double, hi double",
    )
    grid = {
        (r.id, r.band)
        for r in range_join(fact, bands, "v", "lo", "hi", 5.0).collect()
    }
    naive = {
        (r.id, r.band)
        for r in fact.join(
            bands, (fact.v >= bands.lo) & (fact.v < bands.hi)
        ).collect()
    }
    assert grid == naive


def test_asof_null_ts_right_rows_excluded(spark):
    """A right row with NULL ts must never be carried as a match (the
    spec's right.ts <= left.ts excludes unknown times); ascending sort
    would otherwise place it FIRST and leak it as the 'earliest' row."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, t, 100)], "k long, ts timestamp, lid long"
    )
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("ts", TimestampType()),
            StructField("eid", LongType()),
            StructField("val", DoubleType()),
        ]
    )
    right = spark.createDataFrame([(1, None, 5, 999.0)], schema)
    out = asof_join(
        left, right, on="k", ts="ts", value_col="val",
        out_col="v", tiebreak="eid",
    ).collect()
    assert len(out) == 1 and out[0].v is None


def test_range_join_log_matches_naive_between_nonuniform(spark):
    """Multi-resolution grid join must equal the naive BETWEEN join on
    wildly non-uniform bands, and each interval must explode into at
    most base+1 cells (the point of per-decade grids)."""
    import random

    from retail_sales_analysis_etl_bi_project_spark.operators.joins import (
        range_join_log,
    )

    rng = random.Random(7)
    fact = spark.createDataFrame(
        [(i, rng.uniform(0, 2000)) for i in range(400)] + [(9999, 99999.5)],
        "id long, v double",
    )
    bands = spark.createDataFrame(
        [("tiny", 0.0, 0.5), ("mid", 0.5, 30.0), ("huge", 30.0, 100000.0)],
        "band string, lo double, hi double",
    )
    got = {
        (r.id, r.band)
        for r in range_join_log(fact, bands, "v", "lo", "hi", base=10.0).collect()
    }
    naive = {
        (r.id, r.band)
        for r in fact.join(
            bands, (fact.v >= bands.lo) & (fact.v < bands.hi)
        ).collect()
    }
    assert got == naive and (9999, "huge") in got


def test_interval_overlap_matches_naive_and_reports_once(spark):
    """interval_overlap_join == the naive theta overlap join as a
    MULTISET: every overlapping pair present, no pair duplicated even
    when it co-occupies many grid cells (long intervals, small grid)."""
    import random

    from retail_sales_analysis_etl_bi_project_spark.operators.joins import (
        interval_overlap_join,
    )

    rng = random.Random(11)
    left = spark.createDataFrame(
        [
            (i, lo, lo + rng.randint(1, 500))
            for i, lo in ((i, rng.randint(0, 1000)) for i in range(200))
        ],
        "lid long, a_lo long, a_hi long",
    )
    right = spark.createDataFrame(
        [
            (j, lo, lo + rng.randint(1, 500))
            for j, lo in ((j, rng.randint(0, 1000)) for j in range(150))
        ],
        "rid long, b_lo long, b_hi long",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "a_lo", "a_hi", "b_lo", "b_hi", grid=50.0
        ).collect()
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in left.join(
            right, (left.a_lo < right.b_hi) & (right.b_lo < left.a_hi)
        ).collect()
    )
    assert got == naive  # sorted lists: equality catches dups AND misses


def test_interval_overlap_half_open_and_degenerate(spark):
    from retail_sales_analysis_etl_bi_project_spark.operators.joins import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 0, 10), (2, 10, 20), (3, 30, 30), (4, 50, 40)],
        "lid long, a_lo long, a_hi long",
    )
    right = spark.createDataFrame(
        [(1, 10, 15), (2, 19, 25)], "rid long, b_lo long, b_hi long"
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "a_lo", "a_hi", "b_lo", "b_hi", grid=10.0
        ).collect()
    )
    # [0,10) touches [10,15) only at the open boundary: NOT a match.
    # [10,20) overlaps both. Zero-width (3) and negative (4) match nothing.
    assert got == [(2, 1), (2, 2)]
