"""Streaming Count-Min maintenance (streaming/sketch.py): the
maintained cell grid must equal the batch sketch over the full corpus
BIT-FOR-BIT after draining the stream (the mergeable-summary property
— no tolerance anywhere), survive a restart as a no-op, refuse to
double-count a replayed batch id, and serve probe estimates that match
the batch audit query's."""

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.text import (
    countmin_cells,
    term_counts,
)
from retail_sales_analysis_etl_bi_project_spark.sources.tables import load_table
from retail_sales_analysis_etl_bi_project_spark.streaming.harness import (
    chunked_file_source,
)
from retail_sales_analysis_etl_bi_project_spark.streaming.sketch import (
    apply_sketch_batch,
    cms_estimate,
    maintain_sketch_stream,
    read_sketch_cells,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs_stream_source(spark, tmp_path, n_files=3):
    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_src")
    chunked_file_source(docs, "doc_id", src, n_files)
    return src, docs


def _cells(df):
    return sorted(map(tuple, df.collect()))


def test_maintained_sketch_equals_batch_sketch_and_restart_noop(
    spark, tmp_path
):
    src, docs = _docs_stream_source(spark, tmp_path)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    target, ckpt = str(tmp_path / "cms"), str(tmp_path / "ckpt")
    maintain_sketch_stream(stream, target, ckpt)

    got = _cells(read_sketch_cells(spark, target))
    expected = _cells(countmin_cells(term_counts(docs)))
    assert got == expected  # bit-identical: cells are additive integers

    # restart on the drained source: no new batches, grid unchanged
    stream2 = spark.readStream.schema(docs.schema).parquet(src)
    maintain_sketch_stream(stream2, target, ckpt)
    assert _cells(read_sketch_cells(spark, target)) == got


def test_replayed_batch_id_is_not_double_counted(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    target = str(tmp_path / "cms")
    apply_sketch_batch(docs, 0, target)
    once = _cells(read_sketch_cells(spark, target))
    apply_sketch_batch(docs, 0, target)  # crash-replay -> no-op
    assert _cells(read_sketch_cells(spark, target)) == once
    apply_sketch_batch(docs, 1, target)  # genuinely new batch folds in
    total = read_sketch_cells(spark, target).agg(F.sum("n")).collect()[0][0]
    once_total = sum(r[2] for r in once)
    assert total == 2 * once_total


def test_probe_estimates_match_batch_audit(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.eval_queries import (
        text_countmin_heavyhitters,
    )

    docs = load_table(spark, SF_DIR, "documents")
    target = str(tmp_path / "cms")
    apply_sketch_batch(docs, 0, target)
    batch_rows = text_countmin_heavyhitters(spark, SF_DIR).collect()
    terms = spark.createDataFrame(
        [(r.term,) for r in batch_rows], ["term"]
    )
    got = {
        r.term: r.cms_est
        for r in cms_estimate(spark, target, terms).collect()
    }
    assert got == {r.term: r.cms_est for r in batch_rows}


def test_probe_for_unseen_term_estimates_zero_or_collision(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    target = str(tmp_path / "cms")
    apply_sketch_batch(docs, 0, target)
    terms = spark.createDataFrame(
        [("zqxjkvbnmthisneverappears",)], ["term"]
    )
    [row] = cms_estimate(spark, target, terms).collect()
    # CMS one-sided bound: estimate >= true count (= 0); usually 0,
    # any positive value is a hash collision, never negative
    assert row.cms_est >= 0
