"""Driver-contract consistency: the correctness window composition in
__spark_entry__ is position-sensitive (the driver hash-checks the first
50 registered queries), so a typo in _PAST_WINDOW or a forgotten
rotation must fail CI, not silently shift which queries get durable
evidence."""

import __spark_entry__ as entrymod


def test_window_composition():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qs)

    # every rotated-out name actually exists (a typo would silently
    # leave the intended query inside the window and push another out)
    missing = [n for n in entrymod._PAST_WINDOW if n not in qs]
    assert not missing, f"_PAST_WINDOW names not in registry: {missing}"

    # the window holds exactly 50 queries; growth without rotation
    # (or over-rotation) fails here first
    in_window = [n for n in names if n not in entrymod._PAST_WINDOW]
    assert len(in_window) == 50, (
        f"{len(in_window)} in-window queries (driver checks 50): "
        "rotate _PAST_WINDOW"
    )
    # rotation ordering: the dict must serve in-window names first
    assert names[:50] == in_window

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
