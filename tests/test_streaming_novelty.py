"""Streaming novelty against the shingle store (streaming/novelty.py):
with in-id-order batches, the union of per-batch outputs must equal
the one-shot corpus_ngram_novelty bit-for-bit; a restart with the
drained source re-emits nothing; re-delivered docs are dropped."""

import os

from retail_sales_analysis_etl_bi_project_spark.plans.signal_queries import (
    corpus_ngram_novelty,
)
from retail_sales_analysis_etl_bi_project_spark.sources.tables import load_table
from retail_sales_analysis_etl_bi_project_spark.streaming.harness import (
    range_chunked_file_source,
)
from retail_sales_analysis_etl_bi_project_spark.streaming.novelty import (
    novelty_stream_against_store,
    read_novelty,
)

SF_DIR = "/root/testdata/sf0.001"


def _source(spark, tmp_path, n_files=3):
    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_src")
    range_chunked_file_source(docs, "doc_id", src, n_files)
    return src, docs


def _run(spark, docs, src, tmp_path):
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store, out, ckpt = (
        str(tmp_path / "store"),
        str(tmp_path / "novelty"),
        str(tmp_path / "ckpt"),
    )
    novelty_stream_against_store(stream, store, out, ckpt)
    return store, out, ckpt


def test_streamed_union_equals_batch_novelty(spark, tmp_path):
    src, docs = _source(spark, tmp_path)
    store, out, _ = _run(spark, docs, src, tmp_path)

    got = sorted(
        (r.doc_id, r.n_shingles, r.n_novel, r.novelty_frac)
        for r in read_novelty(spark, out).collect()
    )
    want = sorted(
        (r.doc_id, r.n_shingles, r.n_novel, r.novelty_frac)
        for r in corpus_ngram_novelty(spark, SF_DIR).collect()
    )
    assert got == want  # exact ==, fractions included
    assert got  # non-vacuous
    # some doc is non-novel only because of a PRIOR batch's shingles —
    # i.e. the store actually carried state across batches
    n_batches = len(os.listdir(os.path.join(store, "grams")))
    assert n_batches == 3


def test_restart_with_drained_source_is_noop(spark, tmp_path):
    src, docs = _source(spark, tmp_path)
    store, out, ckpt = _run(spark, docs, src, tmp_path)
    before = sorted(map(tuple, read_novelty(spark, out).collect()))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    novelty_stream_against_store(stream, store, out, ckpt)
    after = sorted(map(tuple, read_novelty(spark, out).collect()))
    assert after == before


def test_redelivered_batch_is_dropped(spark, tmp_path):
    """A second run over a FRESH checkpoint replays every file; the
    store's ingested-ids anti-join must drop all of them (no doc can
    re-score against its own stored shingles)."""
    src, docs = _source(spark, tmp_path)
    store, out, _ = _run(spark, docs, src, tmp_path)
    before = sorted(map(tuple, read_novelty(spark, out).collect()))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    novelty_stream_against_store(
        stream, store, out, str(tmp_path / "ckpt2")
    )
    after = sorted(map(tuple, read_novelty(spark, out).collect()))
    assert after == before
