"""Validation-report sink (S8, scripts/generate_data.py:286-308): row
counts, null-cell counts, and FK-violation counts per table, written as
a small text report. The aggregates run distributed; only the final
few numbers are collected."""

from __future__ import annotations

from pyspark.sql import DataFrame

from .dims import fk_violations, null_audit


def validation_report(
    tables: dict[str, DataFrame],
    fact_name: str | None = None,
    fk_map: list[tuple[str, str]] | None = None,
) -> str:
    """Build the report text (reference data/validation_report.txt
    format: 'rows in <t>: N', 'null cells in <t>: N', 'sales rows with
    bad foreign keys: N')."""
    lines: list[str] = []
    for name, df in tables.items():
        lines.append(f"rows in {name}: {df.count()}")
    for name, df in tables.items():
        nulls = null_audit(df).collect()[0]
        lines.append(f"null cells in {name}: {sum(nulls.asDict().values())}")
    if fact_name and fk_map:
        fact = tables[fact_name]
        dims = [
            (tables[dim_name], key, key, f"bad_{key}", True)
            for dim_name, key in fk_map
        ]
        audit = fk_violations(fact, dims).collect()[0]
        total_bad = sum(audit.asDict().values())
        lines.append(f"{fact_name} rows with bad foreign keys: {total_bad}")
    return "\n".join(lines) + "\n"


def write_validation_report(path: str, report: str) -> None:
    with open(path, "w") as fh:
        fh.write(report)


def numeric_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
) -> DataFrame:
    """Equi-width histogram of a numeric column — the data-profiling
    primitive behind every validation dashboard's distribution panel
    (the reference's report stops at counts; this adds shape). Bucket
    b covers [lo + b*w, lo + (b+1)*w), w = (hi - lo)/n_buckets;
    out-of-range values clamp into the edge buckets (so the histogram
    is also an outlier detector: fat edge buckets mean the configured
    range is stale). NULLs are excluded, reported by the null audit.

    Emits (bucket, bucket_lo, bucket_hi, n, frac). Cross-engine: the
    bucket index floor((x - lo)/w) is IEEE double arithmetic, and the
    count-based frac divides two exact integers — no float sums. Scale
    shape: one partial-aggregated groupBy over an int key fused into
    the scan; a 100 TB column profiles in a single pass with n_buckets
    rows of shuffle.
    """
    from pyspark.sql import functions as F

    w = (float(hi) - float(lo)) / n_buckets
    x = F.col(col).cast("double")
    bucket = F.least(
        F.greatest(F.floor((x - F.lit(float(lo))) / F.lit(w)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("long")
    from pyspark.sql import Window

    counts = (
        df.filter(x.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # share-of-total over the n_buckets-row aggregate: the empty-frame
    # window (k4_category_revenue_share discipline) — one pass, no
    # second scan of the aggregate.
    total = F.sum("n").over(Window.partitionBy())
    return counts.select(
        "bucket",
        (F.lit(float(lo)) + F.col("bucket") * F.lit(w)).alias("bucket_lo"),
        (F.lit(float(lo)) + (F.col("bucket") + 1) * F.lit(w)).alias("bucket_hi"),
        "n",
        F.round(F.col("n").cast("double") / total, 9).alias("frac"),
    ).orderBy("bucket")
