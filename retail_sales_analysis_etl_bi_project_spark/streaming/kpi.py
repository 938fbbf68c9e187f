"""Streaming incremental KPI maintenance — the streaming form of
plans/agg_queries.agg_incremental_kpi_merge: a foreachBatch sink that
folds each micro-batch's ALGEBRAIC partials (count + fixed-point
revenue accumulator, functions/money.py) into a stored partials table,
so the KPI is maintained at delta cost instead of recomputed over the
full history every trigger.

Unlike the latest-per-key upsert (streaming/events.py), an additive
merge is NOT naturally idempotent: a crash-replayed micro-batch would
double-count. foreachBatch's contract is at-least-once per batch_id
with batch_ids strictly increasing, so exactly-once is recovered the
standard way — the last applied batch_id is committed ATOMICALLY with
the data (an underscore-prefixed sidecar inside the table dir, written
to the tmp copy before the swap; parquet readers ignore ``_``-files)
and a batch whose id is <= the stored id is a no-op. One target is
therefore bound to one checkpoint lineage: a fresh checkpoint restarts
batch ids at 0 and must come with a fresh target.

State story at 100 TB: the streaming engine holds NO state — partials
live in the target table at |year×month| rows, each micro-batch costs
one map-side-combined aggregate of the delta plus a merge over the
(tiny) partials table, and exactness is the fixed_point_partial/final
algebra: the maintained table equals the full recompute bit-for-bit
(pinned in tests/test_streaming_kpi.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import fixed_point_partial
from .events import _await_or_raise
from .swap import (
    already_applied,
    atomic_swap_write,
    batch_sidecar_writer,
    reap_stale_tmp_dirs,
    restore_prev,
)


def kpi_partials(
    df: DataFrame, ts_col: str = "o_orderdate", amount_col: str = "o_totalprice"
) -> DataFrame:
    """Per-(year, month) mergeable partials: exact count + exact
    fixed-point accumulator (decimal(38,0) — merge headroom far beyond
    the per-batch decimal(28,0))."""
    return df.groupBy(
        F.year(ts_col).alias("year"), F.month(ts_col).alias("month")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        fixed_point_partial(amount_col).cast("decimal(38,0)").alias("_acc"),
    )


def apply_kpi_batch(
    batch_df: DataFrame,
    batch_id: int,
    target: str,
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> None:
    """Fold one micro-batch into the partials table. Replay-safe: a
    batch_id at or below the committed sidecar id is skipped."""
    spark = batch_df.sparkSession
    reap_stale_tmp_dirs(target)
    restore_prev(target)
    if already_applied(target, batch_id):
        return  # crash-replayed batch: already folded in
    new = kpi_partials(batch_df, ts_col, amount_col)
    if os.path.exists(target):
        existing = spark.read.parquet(target)
        merged = (
            existing.unionByName(new)
            .groupBy("year", "month")
            .agg(
                F.sum("_n").alias("_n"),
                F.sum("_acc").cast("decimal(38,0)").alias("_acc"),
            )
        )
    else:
        merged = new
    atomic_swap_write(merged, target, finish_tmp=batch_sidecar_writer(batch_id))


def maintain_kpi_stream(
    stream_df: DataFrame,
    target: str,
    checkpoint: str,
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    timeout_sec: int = 120,
) -> None:
    """Drain ``stream_df`` (availableNow) folding every micro-batch
    into the partials table at ``target``."""
    q = (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: apply_kpi_batch(df, bid, target, ts_col, amount_col)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_sec)


def read_kpi(spark: SparkSession, target: str) -> DataFrame:
    """Finalize the stored partials: one division per group, exactly as
    fixed_point_final (the partials are already collapsed per key)."""
    t = spark.read.parquet(target)
    return t.select(
        "year",
        "month",
        F.col("_n").alias("n_orders"),
        (F.col("_acc").cast("double") / F.lit(1e6)).alias("revenue"),
    ).orderBy("year", "month")
