"""Time-series continuity operators over date-grain aggregates: dense
calendar gap-fill and trailing moving averages — the dashboard-facing
step after a groupBy(day) (a daily-revenue line chart with missing days
silently connects across gaps; BI layers need the dense series with the
gaps made explicit).

Scale shape: callers aggregate to date grain FIRST (fixed-width,
partial-aggregated — the 100 TB input collapses to a few thousand
rows), so the calendar explode, the fill join, and the ordered window
all run over day-count-sized data. The single-partition orderBy window
is bounded by the calendar, never by the fact table; a multi-decade
deployment partitions the window by year if it ever matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calendar_gapfill(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "revenue",
    ma_days: int = 7,
) -> DataFrame:
    """Densify a date-grain series to every calendar day between its
    min and max: missing days appear with value 0 and is_gap = true,
    and a trailing ``ma_days``-day moving average is computed over the
    DENSE series (so gaps pull the average down — the honest reading
    of 'no sales that day'). ``value_col`` should be an exact-decimal
    aggregate; the fill value 0 and the frame sum stay decimal, cast
    to double only at the division.

    The calendar derives from a one-row min/max aggregate exploded
    through sequence() — no driver collect, no cross join against
    anything wide. The fill join is day-grain vs day-grain.
    """
    bounds = daily.agg(
        F.min(date_col).alias("_lo"), F.max(date_col).alias("_hi")
    )
    calendar = bounds.select(
        F.explode(
            F.sequence("_lo", "_hi", F.expr("INTERVAL 1 DAY"))
        ).alias(date_col)
    )
    dense = calendar.join(daily, date_col, "left").select(
        date_col,
        F.coalesce(F.col(value_col), F.lit(0).cast("decimal(18,4)")).alias("_v"),
        F.col(value_col).isNull().alias("is_gap"),
    )
    w = Window.orderBy(date_col).rowsBetween(-(ma_days - 1), 0)
    return dense.select(
        date_col,
        F.col("_v").cast("double").alias(value_col),
        "is_gap",
        (F.sum("_v").over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            f"ma{ma_days}"
        ),
    ).orderBy(date_col)
