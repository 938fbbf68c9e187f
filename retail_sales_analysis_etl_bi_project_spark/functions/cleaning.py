"""Silver-layer cleaning expressions (reference etl/etl.py:63-104).

Every reference cleaning rule is a whole-column vectorized expression —
zero Python UDFs, everything stays inside whole-stage codegen:

- P3  range predicate        keep 18 <= age <= 100        (etl.py:67)
- P4  theta predicate        keep cost < price            (etl.py:74)
- P5  positivity             keep quantity > 0            (etl.py:94)
- P6  null-drop              dropna(subset=[date])        (etl.py:89)
- P7  lossy numeric cast     to_numeric(errors='coerce')  (etl.py:66,72-73,93,96-98)
- P8  lossy date parse       to_datetime(dayfirst=True)   (etl.py:87-88)
- P9  null-fill              discount.fillna(0)           (etl.py:96)
- P10 trim                   str.strip()                  (etl.py:64-65,83-84)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def trim_cols(df: DataFrame, *cols: str) -> DataFrame:
    """P10: whitespace-strip string columns in place."""
    for c in cols:
        df = df.withColumn(c, F.trim(F.col(c)))
    return df


def coerce_numeric(df: DataFrame, cols: dict[str, str]) -> DataFrame:
    """P7: pandas ``to_numeric(errors='coerce')`` — invalid values become
    NULL, not errors. ``try_cast`` gives exactly that semantics even under
    ANSI mode; map of column -> target type."""
    for c, t in cols.items():
        df = df.withColumn(c, F.col(c).try_cast(t))
    return df


def coerce_date_dayfirst(df: DataFrame, col: str, fmt: str = "d-M-yyyy") -> DataFrame:
    """P8: ``pd.to_datetime(dayfirst=True, errors='coerce')`` for the
    reference's %d-%m-%Y sales_date strings (generate_data.py:258);
    unparseable -> NULL."""
    return df.withColumn(col, F.try_to_timestamp(F.col(col), F.lit(fmt)))


def fill_nulls(df: DataFrame, defaults: dict) -> DataFrame:
    """P9: fillna with per-column defaults."""
    return df.na.fill(defaults)


def between_filter(col: str, lo, hi) -> Column:
    """P3: conjunctive range predicate, e.g. age in [18, 100]."""
    return (F.col(col) >= lo) & (F.col(col) <= hi)
