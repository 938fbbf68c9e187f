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
