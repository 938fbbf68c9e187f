"""Streaming corpus dedup against a persistent signature store — the
streaming form of operators/dedup.py incremental_minhash_dedup_pairs,
completing the incremental trio (KPI merge, HLL distinct, dedup).

Each micro-batch of documents is deduped against everything ingested
BEFORE it (new×old via the store's band rows + shingles) and against
itself (new×new), then its own relations are appended to the store.
Every near-dup pair is therefore emitted exactly once — when its
NEWEST member arrives — so the union of all per-batch pair outputs
equals the one-shot full-corpus dedup (minhash_dedup_pairs), which is
what tests/test_streaming_dedup.py pins.

Replay safety without a swap protocol: the store and the pair output
are PARTITIONED BY BATCH (`.../batch=<id>/`), and each batch id
overwrites only its own partition directory. Signatures are
deterministic, so a crash-replayed batch rewrites identical content —
idempotent by construction, no sidecar needed.

State story at 100 TB: the streaming engine holds NO state. The store
grows linearly (3 fixed-width values per band row + shingle arrays);
each batch's cost is its own signature computation plus a bucket join
against the store — the old corpus is never re-hashed, and old-only
buckets never expand into pairs (operators/dedup.py
_incremental_candidates).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import (
    incremental_pairs_vs_store,
    signature_store_relations,
)
from .events import _await_or_raise


def _read_part(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)


def dedup_stream_against_store(
    stream_docs: DataFrame,
    store_dir: str,
    pairs_dir: str,
    checkpoint: str,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    timeout_sec: int = 180,
) -> None:
    """Drain ``stream_docs`` (documents schema), folding each batch into
    the signature store at ``store_dir`` (bands/ + shingles/) and
    appending its near-dup pairs under ``pairs_dir``."""
    bands_dir = os.path.join(store_dir, "bands")
    sh_dir = os.path.join(store_dir, "shingles")

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        old_b = _read_part(spark, bands_dir)
        old_s = _read_part(spark, sh_dir)
        if old_b is not None:
            # replay: this batch's own partition may already be in the
            # store — it must not see itself as "old"
            old_b = old_b.filter(old_b.batch != batch_id).drop("batch")
            old_s = old_s.filter(old_s.batch != batch_id).drop("batch")
        pairs = incremental_pairs_vs_store(
            batch_df,
            old_b,
            old_s,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            n=n,
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch={batch_id}")
        )
        nb, ns = signature_store_relations(
            batch_df, num_hashes=num_hashes, bands=bands, n=n
        )
        nb.write.mode("overwrite").parquet(
            os.path.join(bands_dir, f"batch={batch_id}")
        )
        ns.write.mode("overwrite").parquet(
            os.path.join(sh_dir, f"batch={batch_id}")
        )

    q = (
        stream_docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_sec)


def read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """Accumulated near-dup pairs across every ingested batch."""
    return spark.read.parquet(pairs_dir).drop("batch")
