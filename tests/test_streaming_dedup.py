"""Streaming dedup against the signature store (streaming/dedup.py):
the union of per-batch pair outputs must equal the one-shot full-corpus
dedup — every pair emitted exactly once, when its newest member
arrives — and a restart with the drained source re-emits nothing."""

import os
import shutil

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
    minhash_dedup_pairs,
)
from retail_sales_analysis_etl_bi_project_spark.sources.tables import load_table
from retail_sales_analysis_etl_bi_project_spark.streaming.harness import (
    chunked_file_source,
)
from retail_sales_analysis_etl_bi_project_spark.streaming.dedup import (
    dedup_stream_against_store,
    read_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _doc_chunks(spark, tmp_path, n_files=3):
    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_src")
    chunked_file_source(docs, "doc_id", src, n_files)
    return src, docs


def test_accumulated_stream_pairs_equal_full_corpus_dedup(spark, tmp_path):
    src, docs = _doc_chunks(spark, tmp_path)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store, pairs_dir, ckpt = (
        str(tmp_path / "store"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
    )
    dedup_stream_against_store(stream, store, pairs_dir, ckpt)

    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in read_pairs(spark, pairs_dir).collect()
    )
    want = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_dedup_pairs(docs).collect()
    )
    assert got == want  # exact ==, jaccard values included
    assert got  # non-vacuous: the corpus has near-dups at this sf
    # the store accumulated every batch's relations
    n_batches = len(os.listdir(os.path.join(store, "bands")))
    assert n_batches == 3

    # restart with the drained source + same checkpoint: nothing new
    stream2 = spark.readStream.schema(docs.schema).parquet(src)
    dedup_stream_against_store(stream2, store, pairs_dir, ckpt)
    again = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in read_pairs(spark, pairs_dir).collect()
    )
    assert again == want


def test_redelivered_docs_do_not_self_pair_or_reemit(spark, tmp_path):
    """A doc_id re-delivered by the source (duplicate file / upstream
    replay — normal input for a dedup system) must neither pair with
    its own stored copy nor re-emit its history: accumulated pairs
    still equal the one-shot dedup over the DISTINCT corpus."""
    docs = load_table(spark, SF_DIR, "documents")
    half = docs.filter(F.pmod(F.col("doc_id"), 2) == 0)
    src = str(tmp_path / "src")
    os.makedirs(src)

    def drop_file(df, name):
        stage = f"{src}/_stage"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        shutil.move(f"{stage}/{part}", f"{src}/{name}.parquet")
        shutil.rmtree(stage)

    drop_file(half, "a")
    store, pairs_dir, ckpt = (
        str(tmp_path / "store"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
    )

    def drain():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        dedup_stream_against_store(stream, store, pairs_dir, ckpt)

    drain()
    # re-deliver the SAME docs plus the other half
    drop_file(half, "a_again")
    drop_file(docs.filter(F.pmod(F.col("doc_id"), 2) == 1), "b")
    drain()

    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in read_pairs(spark, pairs_dir).collect()
    )
    want = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_dedup_pairs(docs).collect()
    )
    assert got == want
    assert all(a != b for a, b, _ in got)  # no self-pairs
