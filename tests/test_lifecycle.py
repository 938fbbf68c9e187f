"""Round-6 lifecycle operators: chunking coverage/overlap invariants,
PII scrub behavior, snapshot-diff classification, int8 quantization
error bounds, Z-order locality, histogram clamping."""

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.cdc import snapshot_diff
from retail_sales_analysis_etl_bi_project_spark.operators.curation import (
    chunk_documents,
)
from retail_sales_analysis_etl_bi_project_spark.operators.partitioning import (
    zorder_key_expr,
    zorder_layout_audit,
)
from retail_sales_analysis_etl_bi_project_spark.operators.report import (
    numeric_histogram,
)
from retail_sales_analysis_etl_bi_project_spark.operators.similarity import (
    quantize_int8_stats,
)
from retail_sales_analysis_etl_bi_project_spark.operators.text import pii_scrub


def test_chunk_documents_covers_every_token_with_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(200))),  # 200 toks -> 4 chunks
            (2, "one two three"),  # short: single chunk
            (3, ""),  # blank: dropped
            (4, None),  # NULL: dropped
        ],
        ["doc_id", "text"],
    )
    rows = chunk_documents(docs, chunk_size=64, stride=48).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    d1 = sorted([r for r in rows if r.doc_id == 1], key=lambda r: r.chunk_id)
    # lo = i*48, hi = min(lo+64, 200); final chunk clipped
    assert [(r.tok_lo, r.tok_hi) for r in d1] == [
        (0, 64),
        (48, 112),
        (96, 160),
        (144, 200),
    ]
    # consecutive chunks overlap by chunk_size - stride = 16 tokens
    for a, b in zip(d1, d1[1:]):
        assert a.tok_hi - b.tok_lo == 16
    # full coverage: union of [lo, hi) is [0, 200)
    assert d1[0].tok_lo == 0 and d1[-1].tok_hi == 200
    (d2,) = [r for r in rows if r.doc_id == 2]
    assert (d2.tok_lo, d2.tok_hi, d2.n_chunk_tokens) == (0, 3, 3)
    assert all(len(r.chunk_hash) == 32 for r in rows)


def test_pii_scrub_counts_and_redacts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.b@x.org or c@d.co.uk from 10.0.0.1 call +4915112345678"),
            (2, "no pii here 1.2 3.4"),
            (3, None),
            # the email consumes '+12345678' — counts must describe the
            # SEQUENTIAL redaction (1 email, 0 phones), not raw matches
            (4, "reach a+12345678@x.com"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert (rows[1].n_emails, rows[1].n_ipv4, rows[1].n_phones) == (2, 1, 1)
    assert (rows[4].n_emails, rows[4].n_phones) == (1, 0)
    # redaction shortens: both addresses + ip + phone collapse to tags
    assert rows[1].n_chars_after < rows[1].n_chars_before
    assert (rows[2].n_emails, rows[2].n_ipv4, rows[2].n_phones) == (0, 0, 0)
    assert rows[2].n_chars_after == rows[2].n_chars_before
    assert rows[3].n_emails is None and rows[3].redacted_hash is None


def test_snapshot_diff_classifies_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 31), (4, "", 40), (5, "e", 50)],
        ["k", "s", "v"],
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    # 2 unchanged (absent); NULL vs '' must NOT collide (sentinel coding)
    assert got == {1: "delete", 3: "update", 4: "update", 5: "insert"}


def test_quantize_int8_error_bounded_by_half_scale(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, -0.5, 0.25, 127.0]),
            (0, [0.1, 0.2, -0.3, 0.4]),
            (1, [0.0, 0.0, 0.0, 0.0]),  # zero vector: zero error, scale 0
        ],
        ["label", "embedding"],
    )
    rows = {r.label: r for r in quantize_int8_stats(emb).collect()}
    # reconstruction error of round-to-nearest is <= scale/2 per element;
    # the largest per-vector scale in label 0 is 127/127 = 1.0
    assert rows[0].max_abs_err <= 0.5 + 1e-12
    assert rows[0].mse > 0
    assert rows[1].avg_scale == 0.0 and rows[1].mse == 0.0
    assert rows[1].max_abs_err == 0.0


def test_zorder_locality_beats_single_column_stripes(spark):
    # full 16x16 grid, 4 bits per dim -> 256 cells, 16 cells per file
    grid = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    audit = zorder_layout_audit(grid, "x", "y", bits=4, cells_per_file=16).collect()
    assert len(audit) == 16 and all(r.n_rows == 16 for r in audit)
    for r in audit:
        # each 16-cell Z-file is a 4x4 square: both spans are 3, never a
        # 16-wide stripe (what single-column sort would produce)
        assert r.x_hi - r.x_lo == 3
        assert r.y_hi - r.y_lo == 3
    # key expression: bit i of x -> 2i, of y -> 2i+1
    z = spark.range(1).select(
        zorder_key_expr(F.lit(3), F.lit(1), bits=4).alias("z")
    ).collect()[0].z
    assert z == 0b0111  # x=0b11 -> bits 0,2; y=0b1 -> bit 1


def test_numeric_histogram_clamps_outliers_into_edge_buckets(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (4.9,), (5.0,), (9.9,), (25.0,), (None,)], ["v"]
    )
    rows = {r.bucket: r for r in numeric_histogram(df, "v", 0.0, 10.0, 2).collect()}
    # buckets: [0,5) and [5,10); -5 clamps low, 25 clamps high, NULL excluded
    assert rows[0].n == 3 and rows[1].n == 3
    assert rows[0].bucket_lo == 0.0 and rows[1].bucket_hi == 10.0
    assert abs(rows[0].frac - 0.5) < 1e-9


def test_quality_classifier_separates_prose_from_junk(spark):
    from retail_sales_analysis_etl_bi_project_spark.operators.text import (
        quality_classifier,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was a good day for this"),
            (2, "!!!???;;;:::...,,,!!!???;;;:::...,,,"),
            (3, "0123456789 0123456789 0123456789"),
            (4, None),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in quality_classifier(docs).collect()}
    assert rows[1].kept and rows[1].quality_score > 0.5
    assert not rows[2].kept  # punctuation wall
    assert not rows[3].kept  # digit-heavy
    # NULL text: all ratios collapse to 0 -> defined (low) score, not NULL
    assert rows[4].quality_score is not None and not rows[4].kept
    assert all(0.0 < r.quality_score < 1.0 for r in rows.values())


def test_calendar_gapfill_densifies_and_averages(spark):
    from datetime import date

    from retail_sales_analysis_etl_bi_project_spark.operators.timeseries import (
        calendar_gapfill,
    )

    daily = spark.createDataFrame(
        [
            (date(2024, 1, 1), 10.0),
            (date(2024, 1, 3), 30.0),  # Jan 2 missing
            (date(2024, 1, 5), 50.0),  # Jan 4 missing
        ],
        ["day", "revenue"],
    ).select("day", F.col("revenue").cast("decimal(18,4)").alias("revenue"))
    rows = sorted(
        calendar_gapfill(daily, "day", "revenue", ma_days=2).collect(),
        key=lambda r: r.day,
    )
    assert [r.day.day for r in rows] == [1, 2, 3, 4, 5]
    assert [r.is_gap for r in rows] == [False, True, False, True, False]
    assert [r.revenue for r in rows] == [10.0, 0.0, 30.0, 0.0, 50.0]
    # trailing 2-day MA over the DENSE series (gaps pull it down)
    assert [r.ma2 for r in rows] == [10.0, 5.0, 15.0, 15.0, 25.0]


def test_scd2_pit_join_picks_covering_version(spark):
    from datetime import date

    from retail_sales_analysis_etl_bi_project_spark.operators.dims import (
        scd2_point_in_time_join,
    )

    hist = spark.createDataFrame(
        [
            (1, "LOW", date(2024, 1, 1), date(2024, 2, 1)),
            (1, "HIGH", date(2024, 2, 1), None),  # open current version
            (2, "MED", date(2024, 3, 1), None),
        ],
        ["k", "regime", "valid_from", "valid_to"],
    )
    facts = spark.createDataFrame(
        [
            (1, date(2024, 1, 15), "a"),  # inside LOW
            (1, date(2024, 2, 1), "b"),   # boundary: belongs to HIGH
            (1, date(2024, 6, 1), "c"),   # open version
            (2, date(2024, 2, 1), "d"),   # before first version: drops
        ],
        ["k", "ts", "tag"],
    )
    got = {
        r.tag: r.regime
        for r in scd2_point_in_time_join(facts, hist, "k", "ts").collect()
    }
    assert got == {"a": "LOW", "b": "HIGH", "c": "HIGH"}


def test_expectations_report_counts_violations(spark):
    from retail_sales_analysis_etl_bi_project_spark.operators.report import (
        expectations_report,
    )

    t = spark.createDataFrame(
        [(1, 5.0), (2, None), (2, 200.0), (None, 3.0)], ["k", "v"]
    )
    ref = spark.createDataFrame([(1,), (2,)], ["rk"])
    rules = [
        {"kind": "not_null", "table": "t", "column": "k"},
        {"kind": "unique", "table": "t", "column": "k"},
        {"kind": "range", "table": "t", "column": "v", "lo": 0, "hi": 100},
        {"kind": "ref", "table": "t", "column": "k",
         "ref_table": "ref", "ref_column": "rk"},
    ]
    rows = {
        r.rule: r
        for r in expectations_report({"t": t, "ref": ref}, rules).collect()
    }
    assert rows["not_null:t.k"].n_violations == 1
    assert rows["unique:t.k"].n_violations == 1  # k=2 twice (NULL ignored)
    assert rows["range:t.v"].n_violations == 1   # 200 out of range; NULL not
    # SQL FK semantics: NULL FK is NOT a ref violation (not_null owns
    # it); all non-null keys here resolve, so zero violations
    assert rows["ref:t.k->ref.rk"].n_violations == 0
    assert all(r.n_checked == 4 for r in rows.values())
    # empty config-driven suite: empty report, not IndexError
    from retail_sales_analysis_etl_bi_project_spark.operators.report import (
        expectations_report as er,
    )

    assert er({"t": t}, []).count() == 0
