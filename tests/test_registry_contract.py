"""Driver-contract consistency: the correctness window composition in
__spark_entry__ is position-sensitive (the driver hash-checks the first
50 registered queries), so a typo in _PAST_WINDOW or a forgotten
rotation must fail CI, not silently shift which queries get durable
evidence."""

import pytest

import __spark_entry__ as entrymod


def test_window_composition():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qs)

    # every rotated-out name actually exists (a typo would silently
    # leave the intended query inside the window and push another out)
    missing = [n for n in entrymod._PAST_WINDOW if n not in qs]
    assert not missing, f"_PAST_WINDOW names not in registry: {missing}"

    # promoted names exist, are disjoint from the spill list, and all
    # land inside the driver's 50-query window (r12: the BPE pair's
    # natural registration position is past 50, so promotion is the
    # only thing putting them in — a drift here silently loses their
    # driver evidence)
    missing = [n for n in entrymod._PROMOTED if n not in qs]
    assert not missing, f"_PROMOTED names not in registry: {missing}"
    assert not set(entrymod._PROMOTED) & set(entrymod._PAST_WINDOW)
    assert set(entrymod._PROMOTED) <= set(names[:50]), (
        "promoted queries fell outside the driver window"
    )

    # the window holds exactly 50 queries; growth without rotation
    # (or over-rotation) fails here first
    in_window = [n for n in names if n not in entrymod._PAST_WINDOW]
    assert len(in_window) == 50, (
        f"{len(in_window)} in-window queries (driver checks 50): "
        "rotate _PAST_WINDOW"
    )
    # rotation ordering: the dict must serve promoted names first,
    # then the remaining in-window names in registration order
    expected = [n for n in entrymod._PROMOTED] + [
        n for n in in_window if n not in entrymod._PROMOTED
    ]
    assert names[:50] == expected

    # oracle discipline: every query has a DuckDB twin except the
    # documented sketch-family exceptions (DataSketches has no DuckDB
    # twin; both are tolerance/merge-pinned in tests/test_agg_approx.py)
    no_oracle = sorted(set(qs) - set(oracles))
    assert no_oracle == [
        "agg_incremental_distinct_hll",
        "agg_sketch_profile",
    ], no_oracle

    # key alignment: no oracle for a non-existent query
    assert not set(oracles) - set(qs)


# Leaf types the driver's Spark/DuckDB hash compare is known-safe on:
# the full green registry uses exactly these (r9 sweep). DECIMAL is
# deliberately absent — the only two hash-red driver rows in r8/r9
# were the registry's only decimal-output queries (the driver's hash
# normalization renders Decimal cells differently between its Arrow
# and duckdb fetch paths). Wide-decimal arithmetic is fine INTERNALLY;
# final projections must cast to one of these.
_SAFE_LEAF_TYPES = {
    "bigint",
    "boolean",
    "date",
    "double",
    "float",
    "int",
    "string",
    "timestamp",
}


def _leaf_types(dt, out):
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        for f in dt.fields:
            _leaf_types(f.dataType, out)
    elif isinstance(dt, T.ArrayType):
        _leaf_types(dt.elementType, out)
    elif isinstance(dt, T.MapType):
        _leaf_types(dt.keyType, out)
        _leaf_types(dt.valueType, out)
    else:
        out.add(dt.simpleString())


def test_no_decimal_or_exotic_output_columns(spark, sf_dir):
    """Every registered query's OUTPUT schema stays inside the leaf
    types the driver compare has proven safe on, recursing through
    array/map/struct containers down to leaves. Only the schema is
    inspected, but BUILDING some queries runs real work (the CC/graph
    family's eager pointer-jumping rounds, fitted Bloom/codebook
    collects, managed persists) — so this sweeps a sizable part of the
    pipeline at sf0.001 and releases the shared caches afterwards so
    later tests start clean (review finding, r10b)."""
    from retail_sales_analysis_etl_bi_project_spark.plans import shared_cache

    bad = {}
    try:
        for name, fn in entrymod.queries().items():
            leaves = set()
            _leaf_types(fn(spark, sf_dir).schema, leaves)
            offending = leaves - _SAFE_LEAF_TYPES
            if offending:
                bad[name] = sorted(offending)
    finally:
        shared_cache.release()
    assert not bad, f"unsafe output leaf types: {bad}"


def test_decimal_output_actually_fails_the_contract(spark, sf_dir):
    """Self-check: a deliberately decimal-projecting frame trips the
    same leaf-type walk the contract uses."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.lit(1).cast("decimal(38,0)").alias("x"))
    leaves = set()
    _leaf_types(df.schema, leaves)
    assert leaves - _SAFE_LEAF_TYPES == {"decimal(38,0)"}


def test_rotating_out_an_oracle_less_query_keeps_oracle_sql_working(monkeypatch):
    """ORACLES legitimately lacks the rows-only sketch queries; since
    r13 both of them ARE rotated past the window (r12 VERDICT item 7:
    they can never be driver-hash-green, so they should not hold
    hash-checkable slots), so assert the lenient/strict split on the
    real configuration: oracle_sql() stays callable with them rotated
    out, while queries() still asserts rotation-list drift strictly
    (review finding, r10b)."""
    assert "agg_sketch_profile" in entrymod._PAST_WINDOW
    assert "agg_incremental_distinct_hll" in entrymod._PAST_WINDOW
    oracles = entrymod.oracle_sql()  # must not raise
    assert "agg_sketch_profile" not in oracles
    qs = entrymod.queries()  # name exists in the registry: strict OK
    names = list(qs)
    # rotated past the 50-query driver window, into the tail region
    assert names.index("agg_sketch_profile") >= 50
    assert names.index("agg_incremental_distinct_hll") >= 50

    monkeypatch.setattr(
        entrymod,
        "_PAST_WINDOW",
        tuple(entrymod._PAST_WINDOW) + ("no_such_query",),
    )
    entrymod.oracle_sql()  # lenient: still fine
    # RuntimeError, not assert: the guard must survive python -O
    # (r10 ADVICE)
    with pytest.raises(RuntimeError, match="no_such_query"):
        entrymod.queries()  # strict: drift fails loudly
