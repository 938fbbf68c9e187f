"""Query registry: the driver contract (__spark_entry__.py) is generated
from these dicts. Each registered query is a (spark, sf_dir) -> DataFrame
builder; most also carry a DuckDB oracle SQL string that must produce
identical column names, types, and values (the driver hash-compares).

Queries whose semantics aren't SQL-expressible (LSH bucketing, minhash
band joins, streaming state) register with oracle=None and get the
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, Builder] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder, with an
    optional DuckDB oracle SQL twin."""

    def wrap(fn: Builder) -> Builder:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap
