"""Dimensional-build operator tests: dim_date conventions (golden tests
SURVEY.md §7.3 requires), surrogate keys, idempotent upsert, fact
assembly left-join semantics, audits."""

import datetime

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.dims import (
    assemble_fact,
    build_dim_date,
    fk_violations,
    null_audit,
    upsert_new_rows,
    with_surrogate_key,
)


def test_dim_date_weekday_is_iso_monday_1(spark):
    """2024-01-01 is a Monday -> weekday 1; 2024-01-07 Sunday -> 7.
    date_key is int YYYYMMDD (etl/etl.py:112,118)."""
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 10, 30),),
         (datetime.datetime(2024, 1, 7, 23, 59),),
         (datetime.datetime(2024, 1, 1, 5, 0),)],  # same day, different time
        "ts timestamp",
    )
    rows = {r.date_key: r for r in build_dim_date(df, "ts").collect()}
    assert set(rows) == {20240101, 20240107}  # normalized + dedup'd
    assert rows[20240101].weekday == 1 and rows[20240107].weekday == 7
    assert rows[20240101].quarter == 1
    assert rows[20240101].calendar_date == datetime.date(2024, 1, 1)


def test_surrogate_keys_dense_from_1(spark):
    df = spark.createDataFrame([(30,), (10,), (20,)], "nk int")
    rows = with_surrogate_key(df, "nk", "sk").orderBy("sk").collect()
    assert [(r.sk, r.nk) for r in rows] == [(1, 10), (2, 20), (3, 30)]


def test_upsert_insert_only_new_and_idempotent(spark):
    existing = spark.createDataFrame([(1,), (2,)], "k int")
    staging = spark.createDataFrame([(2,), (3,)], "k int")
    once = upsert_new_rows(existing, staging, "k")
    assert sorted(r.k for r in once.collect()) == [1, 2, 3]
    twice = upsert_new_rows(once, staging, "k")
    assert sorted(r.k for r in twice.collect()) == [1, 2, 3]  # idempotent


def test_assemble_fact_left_join_null_on_miss(spark):
    fact = spark.createDataFrame([(1, 100), (2, 999)], "id int, cust_id int")
    dim = spark.createDataFrame([(100, 7)], "cust_id int, cust_key int")
    out = assemble_fact(fact, [(dim, "cust_id", "cust_key")]).orderBy("id").collect()
    assert out[0].cust_key == 7
    assert out[1].cust_key is None  # missing key -> NULL (pandas .map parity)


def test_fk_violations_counts(spark):
    fact = spark.createDataFrame([(1,), (2,), (99,)], "k int")
    dim = spark.createDataFrame([(1,), (2,)], "k int")
    row = fk_violations(fact, [(dim, "k", "k", "bad_k", True)]).collect()[0]
    assert row.bad_k == 1


def test_fk_violations_survives_dup_dim_keys_and_empty_fact(spark):
    """A dim with a duplicated key (the corruption an audit must
    survive) must not inflate counts via join multiplication; an empty
    fact must report 0, not NULL."""
    fact = spark.createDataFrame([(1, 10), (2, 10), (99, 10)], "a int, b int")
    dim_a = spark.createDataFrame([(1,), (1,), (2,)], "a int")  # dup key 1
    dim_b = spark.createDataFrame([(10,), (10,)], "b int")  # all dups
    row = fk_violations(
        fact,
        [(dim_a, "a", "a", "bad_a", True), (dim_b, "b", "b", "bad_b", True)],
    ).collect()[0]
    assert row.bad_a == 1 and row.bad_b == 0
    empty = spark.createDataFrame([], "a int")
    row = fk_violations(
        empty, [(dim_a.select("a"), "a", "a", "bad_a", True)]
    ).collect()[0]
    assert row.bad_a == 0


def test_fk_violations_single_pass_multi_dim(spark):
    """One lazy plan, multiple dims, mixed broadcast/shuffle joins."""
    fact = spark.createDataFrame([(1, 10), (2, 20), (3, 99)], "a int, b int")
    dim_a = spark.createDataFrame([(1,), (2,), (3,)], "a int")
    dim_b = spark.createDataFrame([(10,), (20,)], "b int")
    df = fk_violations(
        fact,
        [(dim_a, "a", "a", "bad_a", True), (dim_b, "b", "b", "bad_b", False)],
    )
    row = df.collect()[0]
    assert row.bad_a == 0 and row.bad_b == 1
    # lazy contract: the builder returns one unexecuted aggregate row
    assert df.schema.fieldNames() == ["bad_a", "bad_b"]


def test_scd2_history_versions(spark):
    """Change-point detection: runs collapse to one version; reverting
    to an earlier value opens a NEW version; NULL first version is
    emitted; valid_to chains to the next valid_from (NULL = current)."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dims import scd2_history

    d = datetime.date
    rows = [
        (1, None, d(2024, 1, 1), 1),   # first version, NULL attr
        (1, "A", d(2024, 1, 2), 2),
        (1, "A", d(2024, 1, 3), 3),    # same run — no new version
        (1, "B", d(2024, 1, 4), 4),
        (1, "A", d(2024, 1, 5), 5),    # revert -> new version
        (2, "X", d(2024, 1, 1), 6),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts date, id long")
    out = sorted(
        scd2_history(df, "k", "ts", ["attr"], "id").collect(),
        key=lambda r: (r.k, r.valid_from),
    )
    got = [(r.k, r.attr, r.valid_from, r.valid_to) for r in out]
    assert got == [
        (1, None, d(2024, 1, 1), d(2024, 1, 2)),
        (1, "A", d(2024, 1, 2), d(2024, 1, 4)),
        (1, "B", d(2024, 1, 4), d(2024, 1, 5)),
        (1, "A", d(2024, 1, 5), None),
        (2, "X", d(2024, 1, 1), None),
    ]


def test_null_audit(spark):
    df = spark.createDataFrame(
        [(1, None), (None, "x"), (3, "y")], "a int, b string"
    )
    row = null_audit(df).collect()[0]
    assert row.a == 1 and row.b == 1
