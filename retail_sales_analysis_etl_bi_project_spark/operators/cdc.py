"""Snapshot-diff CDC: derive row-level inserts/updates/deletes between
two versions of a table — the change-data-capture primitive behind
incremental ETL when the upstream can only hand you full snapshots (the
reference's MERGE upsert, operators/dims.py:64, is the APPLY side of
this; snapshot_diff is the DERIVE side that produces the change feed).

Cross-engine determinism: rows are compared by md5 over a
sentinel-encoded concatenation (unit-separator joints, NULLs encoded as
an ASCII record-separator sentinel) — identical in Spark and DuckDB, no
float formatting in the compare path when callers pass already-string-
stable columns (numerics are CAST to string identically in both engines
for int/decimal types; avoid raw doubles in compare_cols or cast them
to decimal first).

Scale shape (100 TB): ONE full-outer shuffle join co-partitioned on the
key — both sides hash-partition on key_cols, AQE splits skewed keys.
The compare runs on fixed-width md5 digests computed at the scan, so
wide rows don't ride the shuffle twice, and unchanged rows (the vast
majority of any real snapshot pair) are filtered immediately after the
join, before anything downstream materializes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ASCII unit separator between fields, record separator for NULL: text
# columns can contain '|' but not control bytes in any sane snapshot.
_SEP = "\x1f"
_NULL = "\x1e"


def row_digest_expr(cols: list[str]) -> Column:
    """md5 over sentinel-encoded column values; NULL-safe and
    unambiguous under concatenation (DuckDB twin:
    md5(concat_ws(chr(31), coalesce(CAST(c AS VARCHAR), chr(30)), ...)))."""
    return F.md5(
        F.concat_ws(
            _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Classify every key present in either snapshot as
    'insert' (new only), 'delete' (old only), or 'update' (both, digest
    differs); unchanged keys are dropped. Returns key_cols +
    change_type + the old/new digests (callers join back to either
    snapshot for payloads — keeps the diff's shuffle rows fixed-width).
    """
    o = old.select(*key_cols, row_digest_expr(compare_cols).alias("_old_digest"))
    n = new.select(*key_cols, row_digest_expr(compare_cols).alias("_new_digest"))
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_old_digest").isNull(), F.lit("insert"))
        .when(F.col("_new_digest").isNull(), F.lit("delete"))
        .when(F.col("_old_digest") != F.col("_new_digest"), F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *key_cols,
            "change_type",
            F.col("_old_digest").alias("old_digest"),
            F.col("_new_digest").alias("new_digest"),
        )
    )
