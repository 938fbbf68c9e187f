"""Date-part expression library (reference: etl/etl.py:109-120).

Two conventions the reference bakes in (SURVEY.md §1.4) that are easy to
get silently wrong on Spark:

- ``date_key`` is the integer YYYYMMDD (etl/etl.py:112).
- ``weekday`` is ISO: 1=Monday .. 7=Sunday (etl/etl.py:118), while
  Spark's ``dayofweek`` is 1=Sunday. We use ``weekday()+1`` (0=Mon -> 1=Mon).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_key(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd").cast("int")


def weekday_iso(col: Column | str) -> Column:
    """1=Monday .. 7=Sunday, matching etl/etl.py:118 (pandas dt.weekday+1)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.weekday(c) + F.lit(1)).cast("int")


def date_parts(col: Column | str) -> dict[str, Column]:
    """day/month/year/quarter/weekday columns as built by build_dim_date
    (etl/etl.py:113-118)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "day": F.dayofmonth(c),
        "month": F.month(c),
        "year": F.year(c),
        "quarter": F.quarter(c),
        "weekday": weekday_iso(c),
    }
