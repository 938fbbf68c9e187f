"""Derived business columns (reference README.md:95-98, docx q4).

- P11 revenue/profit arithmetic
- P12 discounted pricing with round(.., 2)
- P15 CASE bucketing (age groups in the reference; account-balance
  segments on the TPC-H-shaped driver data)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def age_bucket(col: Column | str) -> Column:
    """Reference q4 age buckets: 18-25 / 26-35 / 36-45 / 46-60 / 60+."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when((c >= 18) & (c <= 25), "18-25")
        .when((c >= 26) & (c <= 35), "26-35")
        .when((c >= 36) & (c <= 45), "36-45")
        .when((c >= 46) & (c <= 60), "46-60")
        .otherwise("60+")
    )


def acctbal_segment(col: Column | str = "c_acctbal") -> Column:
    """The same CASE-bucketing operator applied to the driver's customer
    table (c_acctbal plays the role of age; SURVEY.md §7.0)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c < 0, "negative")
        .when(c < 2500, "low")
        .when(c < 5000, "mid")
        .when(c < 7500, "high")
        .otherwise("top")
    )
