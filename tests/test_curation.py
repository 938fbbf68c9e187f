"""Curation operators (operators/curation.py): packing invariants and
temperature-sampling proportions."""

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.curation import (
    pack_sequences,
    temperature_sample,
)


def test_pack_sequences_invariants(spark):
    docs = spark.createDataFrame(
        [
            ("a", 1, 100),
            ("a", 2, 300),
            ("a", 3, 250),  # crosses the 512 boundary: spans seq 0 and 1
            ("a", 4, 1200),  # longer than budget: spans 3 sequences
            ("b", 5, 40),
            ("b", 6, 0),  # dropped
        ],
        ["source", "doc_id", "n_tokens"],
    )
    rows = pack_sequences(docs, budget=512).collect()
    assert all(r.doc_id != 6 for r in rows)
    # per-doc span lengths sum to the doc's token count
    per_doc = {}
    for r in rows:
        assert 0 <= r.tok_lo < r.tok_hi <= 512
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + (r.tok_hi - r.tok_lo)
    assert per_doc == {1: 100, 2: 300, 3: 250, 4: 1200, 5: 40}
    # doc 3: starts at 400, so 112 tokens in seq 0 and 138 in seq 1
    d3 = sorted(
        [(r.seq_id, r.tok_lo, r.tok_hi) for r in rows if r.doc_id == 3]
    )
    assert d3 == [(0, 400, 512), (1, 0, 138)]
    # doc 4 spans three sequences (starts at 650, ends at 1850)
    assert len([r for r in rows if r.doc_id == 4]) == 3
    # every sequence's spans tile without overlap
    by_seq = {}
    for r in rows:
        by_seq.setdefault((r.source, r.seq_id), []).append((r.tok_lo, r.tok_hi))
    for spans in by_seq.values():
        spans.sort()
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 == lo2


def test_temperature_sample_upweights_rare_sources(spark):
    rows = [("common", i) for i in range(1800)] + [
        ("rare", 10_000 + i) for i in range(200)
    ]
    docs = spark.createDataFrame(rows, ["source", "doc_id"])
    kept = temperature_sample(docs, frac=0.5).groupBy("source").count().collect()
    got = {r.source: r["count"] for r in kept}
    rate_common = got.get("common", 0) / 1800
    rate_rare = got.get("rare", 0) / 200
    # sqrt weighting: rare keep-rate should be ~3x common (sqrt(9)),
    # and the overall kept fraction near frac
    assert rate_rare > rate_common * 1.5
    total = sum(got.values()) / 2000
    assert 0.35 < total < 0.65


def test_temperature_sample_deterministic(spark):
    rows = [("s%d" % (i % 3), i) for i in range(300)]
    docs = spark.createDataFrame(rows, ["source", "doc_id"])
    a = sorted(r.doc_id for r in temperature_sample(docs, frac=0.4).collect())
    b = sorted(r.doc_id for r in temperature_sample(docs, frac=0.4).collect())
    assert a == b and len(a) > 0
