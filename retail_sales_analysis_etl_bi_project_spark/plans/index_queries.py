"""Round-8b queries (registered after stat_queries, PAST the driver
window per the r6f/r7e precedent — gate-replica verified this round,
rotate IN next round):

- text_inverted_index : the posting-list build — term -> document
                        frequency, total term frequency, and a capped
                        ORDERED posting list (the search-index /
                        shared-passage-lookup primitive; first
                        registered query exercising ordered
                        list-aggregation into a serialized column)
- etl_column_profile  : per-column DQ profile of the orders table via
                        UNPIVOT/stack — row count, null count, exact
                        distinct count, lexicographic min/max of the
                        canonical string form (the schema-agnostic
                        profiling report that complements
                        etl_expectations_report's rule-based checks)

Reference scope: the reference's validation stops at count/null spot
checks (/root/reference/etl/etl.py:200-218); the profile generalizes
them to every column through one melt, and the inverted index belongs
to the LLM-pipeline extension surface (winnowing/ExactSubstr lookups
land in exactly this shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import lower_terms
from ..sources.tables import load_table
from .registry import query
from .text_queries import _SQL_TOKS

_POSTINGS_CAP = 8


@query(
    "text_inverted_index",
    oracle=f"""
    WITH tf AS (
      SELECT lower(t) AS term, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS t FROM documents)
      GROUP BY 1, 2
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           array_to_string(list_sort(list(doc_id))[1:{_POSTINGS_CAP}], ',')
             AS postings
    FROM tf GROUP BY term ORDER BY term
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the corpus: one row per term with document
    frequency, total term frequency, and the first {cap} postings in
    doc_id order serialized as a comma string — the lookup structure
    behind search, contamination probes, and shared-passage
    resolution (text_winnow_fingerprints' output is consumed through
    exactly this shape).

    The posting list is CAPPED (head of the doc_id-sorted list):
    uncapped lists for stopword-frequency terms would be corpus-sized
    rows — the classic skew trap of index builds. df/total_tf still
    count everything; only the materialized list is bounded, as in
    real index segments (full postings shard across segment files).

    Scale shape: tf = explode -> groupBy(term, doc_id) with map-side
    partial aggregation (one row per distinct pairing crosses the
    shuffle); the per-term rollup reuses the term-keyed partitioning
    for collect_list (bounded by the cap after sort-slice, exact
    BIGINT sums for df/total_tf). Ordered-list determinism comes from
    array_sort AFTER collection — collect_list order is
    partition-nondeterministic, sorting makes the serialized column
    hash-stable across engines and runs."""
    tf = (
        lower_terms(load_table(spark, sf_dir, "documents"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(
                        F.array_sort(F.collect_list("doc_id")),
                        1,
                        _POSTINGS_CAP,
                    ),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings"),
        )
        .orderBy("term")
    )


if text_inverted_index.__doc__:  # absent under PYTHONOPTIMIZE=2
    text_inverted_index.__doc__ = text_inverted_index.__doc__.replace(
        "{cap}", str(_POSTINGS_CAP)
    )

# (column, DuckDB canonical form, Spark canonical form) — the two
# engine expressions live side by side so a new column can never pick
# up mismatched canonicalizations (review finding: the Spark side was
# originally re-derived from a name-pattern ladder)
_PROFILE_COLS = (
    ("o_orderkey", "CAST(o_orderkey AS VARCHAR)",
     "cast(o_orderkey as string)"),
    ("o_custkey", "CAST(o_custkey AS VARCHAR)",
     "cast(o_custkey as string)"),
    ("o_orderstatus", "o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority", "o_orderpriority"),
    ("o_orderdate", "CAST(CAST(o_orderdate AS DATE) AS VARCHAR)",
     "cast(cast(o_orderdate as date) as string)"),
)


def _profile_oracle() -> str:
    melt = " UNION ALL ".join(
        f"SELECT '{name}' AS col_name, {duck} AS val FROM orders"
        for name, duck, _ in _PROFILE_COLS
    )
    return f"""
    WITH melted AS ({melt})
    SELECT col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(val) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
           min(val) AS min_val,
           max(val) AS max_val
    FROM melted GROUP BY col_name ORDER BY col_name
    """


@query("etl_column_profile", oracle=_profile_oracle())
def etl_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-agnostic column profile of the orders table — row count,
    null count, EXACT distinct count, and min/max of each column's
    canonical string form — the first-look DQ report an ETL runs
    before writing expectations rules (the reference eyeballs this via
    pandas info()/head(), /root/reference/etl/etl.py:200-218;
    etl_expectations_report covers the rule-based follow-up).

    Canonicalization: bigints and dates cast to strings (exact,
    format-stable in both engines: digits, and DATE's YYYY-MM-DD —
    doubles are deliberately EXCLUDED from the profiled set because
    Spark and DuckDB disagree on float-to-string rendering, the same
    reason money pipelines are decimal end-to-end). min/max are
    therefore LEXICOGRAPHIC bounds of the canonical form — documented
    as such; numeric extrema live in the typed KPI queries.

    Scale shape: the melt is Spark's `stack` (one pass over the scan,
    no join of per-column branches — the table is read ONCE for all
    columns), then one groupBy(col_name) whose cardinality is the
    column count. count(DISTINCT val) expands to the standard
    two-phase distinct aggregate, partial per partition — at 100 TB
    swap in approx_count_distinct per the agg_sketch_profile
    precedent; the exact form is what the oracle can replay."""
    stack_args = []
    for name, _, spark_expr in _PROFILE_COLS:
        stack_args.append(f"'{name}'")
        stack_args.append(spark_expr)
    melted = load_table(spark, sf_dir, "orders").select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, "
            + ", ".join(stack_args)
            + ") as (col_name, val)"
        )
    )
    return (
        melted.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("val").isNull().cast("bigint")).alias("n_nulls"),
            F.countDistinct("val").alias("n_distinct"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("col_name")
    )
