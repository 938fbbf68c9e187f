"""Streaming ingest-novelty scoring against a persistent shingle store
— the streaming form of plans/signal_queries.corpus_ngram_novelty,
completing the incremental family (KPI merge, HLL distinct, CMS,
dedup, novelty).

Each micro-batch of documents is scored against every shingle ingested
BEFORE it (the store is never re-shingled) plus the batch's own
earlier docs (within-batch first-occurrence by min doc_id — the batch
query's tie-break), then the batch's NEW shingles are appended to the
store. With batches arriving in doc_id order (ingest order — the
definition the batch query itself uses: "doc_id order = ingest
order"), the union of all per-batch outputs equals the one-shot
corpus_ngram_novelty bit-for-bit, which
tests/test_streaming_novelty.py pins exact. Out-of-order arrival would
need min-rewrite retractions — the documented swap is carrying
(g, min_doc_id) in the store and re-emitting demoted docs, which no
consumer of a novelty signal has needed.

Exactly-once under dirty inputs and crashes (the dedup.py protocol):
- re-delivered doc_ids are dropped by an anti-join against the store's
  ingested-ids relation, and within-batch id duplicates collapse
  first, so a document can never find its own shingles in the store
  and re-score as 0-novel;
- the store relations (ids/ + grams/) and the output are PARTITIONED
  BY BATCH and each batch id overwrites only its own partitions;
  shingling is deterministic, so a crash-replayed batch rewrites
  identical content — idempotent with no sidecar;
- the store commits ids before grams and the reader treats it as
  present only when BOTH relations exist, so a half-written store
  reads as empty and the replaying batch rebuilds it.

State story at 100 TB: the streaming engine holds NO state. The store
grows with the DISTINCT shingle count (sublinear in tokens on real
corpora); each batch costs one shingle explode plus a gram-keyed
anti-join against the store — the same linear shape as the batch
query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import shingles_from_tokens
from ..operators.text import tokens_expr
from .dedup import _read_part
from .events import _await_or_raise


def novelty_stream_against_store(
    stream_docs: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint: str,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    timeout_sec: int = 180,
) -> None:
    """Drain ``stream_docs`` (documents schema), scoring each batch's
    per-doc novelty against the shingle store at ``store_dir``
    (ids/ + grams/) and appending (doc_id, n_shingles, n_novel,
    novelty_frac) rows under ``out_dir``."""
    ids_dir = os.path.join(store_dir, "ids")
    grams_dir = os.path.join(store_dir, "grams")

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        old_i = _read_part(spark, ids_dir)
        old_g = _read_part(spark, grams_dir)
        if old_i is None or old_g is None:
            # the two relations commit separately; a half-written store
            # reads as empty and the replaying batch rewrites both
            old_i = old_g = None
        else:
            # replay: this batch's own partitions must not read as "old"
            old_i = old_i.filter(old_i.batch != batch_id).drop("batch")
            old_g = old_g.filter(old_g.batch != batch_id).drop("batch")
        batch = batch_df.dropDuplicates([id_col])
        if old_i is not None:
            batch = batch.join(
                old_i.select(F.col("did").alias(id_col)), id_col, "left_anti"
            )
        if batch.isEmpty():
            return
        tall = (
            batch.select(
                F.col(id_col), tokens_expr(F.col(text_col)).alias("_toks")
            )
            .select(
                id_col,
                F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("g"),
            )
            .persist()  # three consumers below; batch-sized
        )
        try:
            first = tall.groupBy("g").agg(F.min(id_col).alias("first_doc"))
            # store commits: ids first, grams second (reader requires both)
            batch.select(F.col(id_col).alias("did")).write.mode(
                "overwrite"
            ).parquet(os.path.join(ids_dir, f"batch={batch_id}"))
            new_grams = (
                first.select("g")
                if old_g is None
                else first.select("g").join(old_g, "g", "left_anti")
            )
            new_grams.write.mode("overwrite").parquet(
                os.path.join(grams_dir, f"batch={batch_id}")
            )
            scored = tall.join(first, "g")
            if old_g is not None:
                scored = scored.join(
                    old_g.withColumn("_seen", F.lit(True)), "g", "left"
                )
            else:
                scored = scored.withColumn(
                    "_seen", F.lit(None).cast("boolean")
                )
            novel = F.when(
                (F.col("first_doc") == F.col(id_col))
                & F.col("_seen").isNull(),
                1,
            ).otherwise(0)
            per_doc = (
                scored.groupBy(id_col)
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
                    F.sum(novel).cast("bigint").alias("n_novel"),
                )
                .select(
                    id_col,
                    "n_shingles",
                    "n_novel",
                    (
                        F.col("n_novel").cast("double")
                        / F.col("n_shingles").cast("double")
                    ).alias("novelty_frac"),
                )
            )
            # output commits LAST, after the store is durable
            per_doc.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={batch_id}")
            )
        finally:
            tall.unpersist()

    q = (
        stream_docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_sec)


def read_novelty(spark: SparkSession, out_dir: str) -> DataFrame:
    """Accumulated per-doc novelty rows across every ingested batch."""
    return spark.read.parquet(out_dir).drop("batch")
