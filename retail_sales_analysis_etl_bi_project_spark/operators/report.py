"""Validation-report sink (S8, scripts/generate_data.py:286-308): row
counts, null-cell counts, and FK-violation counts per table, written as
a small text report. The aggregates run distributed; only the final
few numbers are collected."""

from __future__ import annotations

from pyspark.sql import DataFrame

from .dims import fk_violations


def validation_report(
    tables: dict[str, DataFrame],
    fact_name: str | None = None,
    fk_map: list[tuple[str, str]] | None = None,
) -> str:
    """Build the report text (reference data/validation_report.txt
    format: 'rows in <t>: N', 'null cells in <t>: N', 'sales rows with
    bad foreign keys: N')."""
    from pyspark.sql import functions as F

    # one fused aggregate per table: row count + per-column null counts
    # in a single scan (separate count()/null_audit jobs doubled every
    # table's scan — r6 review finding)
    stats: dict[str, tuple[int, int]] = {}
    for name, df in tables.items():
        row = df.agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.sum(F.col(c).isNull().cast("int")).alias(f"_null_{c}")
                for c in df.columns
            ],
        ).collect()[0]
        d = row.asDict()
        stats[name] = (d.pop("_n"), sum(v or 0 for v in d.values()))
    lines: list[str] = []
    for name in tables:
        lines.append(f"rows in {name}: {stats[name][0]}")
    for name in tables:
        lines.append(f"null cells in {name}: {stats[name][1]}")
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


def expectations_report(
    tables: "dict[str, DataFrame]",
    rules: "list[dict]",
) -> DataFrame:
    """Declarative data-quality expectations (the dbt-test / Great-
    Expectations genre, distilled to the four rule kinds that cover the
    reference's audit surface and most real suites): evaluate every
    rule distributed and return one row per rule —
    (rule, n_checked, n_violations) — for the validation report.

    Rule shapes (dicts, so suites can live in config):
      {"kind": "not_null", "table": t, "column": c}
      {"kind": "unique",   "table": t, "column": c}
      {"kind": "range",    "table": t, "column": c, "lo": x, "hi": y}
        (inclusive bounds; NULLs don't violate — not_null is its own rule)
      {"kind": "ref",      "table": t, "column": c,
                           "ref_table": rt, "ref_column": rc}

    Scale shape: each rule is ONE aggregate over its table — not_null
    and range are filter-counts fused into the scan; unique is
    count - count(distinct); ref is a left-anti broadcast/shuffle join
    count (AQE picks). The per-rule results are single rows unioned
    lazily, so the whole suite is one job with R tiny branches; rules
    over the same table share the scan via Spark's exchange/scan reuse
    where plans align, and a 100 TB suite runs each branch partially
    aggregated — nothing driver-side but the R-row report.
    """
    from pyspark.sql import functions as F

    if not rules:  # config-driven suites can legitimately filter to []
        spark = next(iter(tables.values())).sparkSession
        return spark.createDataFrame(
            [], "rule string, n_checked bigint, n_violations bigint"
        )
    parts = []
    for r in rules:
        t, c = r["table"], r.get("column")
        df = tables[t]
        label = f"{r['kind']}:{t}.{c}"
        if r["kind"] == "not_null":
            agg = df.agg(
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                    "n_violations"
                ),
            )
        elif r["kind"] == "unique":
            agg = df.agg(
                F.count(F.lit(1)).alias("n_checked"),
                (F.count(c) - F.count_distinct(F.col(c))).alias("n_violations"),
            )
        elif r["kind"] == "range":
            lo, hi = r["lo"], r["hi"]
            agg = df.agg(
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(
                    F.when(
                        F.col(c).isNotNull()
                        & ((F.col(c) < lo) | (F.col(c) > hi)),
                        1,
                    ).otherwise(0)
                ).alias("n_violations"),
            )
        elif r["kind"] == "ref":
            ref = tables[r["ref_table"]].select(
                F.col(r["ref_column"]).alias(c)
            )
            label = (
                f"ref:{t}.{c}->{r['ref_table']}.{r['ref_column']}"
            )
            # SQL FK semantics: a NULL FK is not a referential
            # violation (and would double-report with not_null —
            # the range rule's isNotNull convention, r6 review finding)
            agg = (
                df.select(c)
                .filter(F.col(c).isNotNull())
                .join(ref, c, "left_anti")
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .crossJoin(df.agg(F.count(F.lit(1)).alias("n_checked")))
            )
        else:  # pragma: no cover
            raise ValueError(f"unknown rule kind {r['kind']!r}")
        parts.append(
            agg.select(
                F.lit(label).alias("rule"),
                F.col("n_checked").cast("bigint").alias("n_checked"),
                F.col("n_violations").cast("bigint").alias("n_violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("rule")
