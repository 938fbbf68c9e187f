from .money import dec, revenue_expr, sum_money
from .dates import date_key, weekday_iso, date_parts
from .cleaning import (
    trim_cols,
    coerce_numeric,
    coerce_date_dayfirst,
    fill_nulls,
    between_filter,
)
from .derived import acctbal_segment, age_bucket

__all__ = [
    "dec",
    "revenue_expr",
    "sum_money",
    "date_key",
    "weekday_iso",
    "date_parts",
    "trim_cols",
    "coerce_numeric",
    "coerce_date_dayfirst",
    "fill_nulls",
    "between_filter",
    "acctbal_segment",
    "age_bucket",
]
