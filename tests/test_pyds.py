"""Custom Python DataSource connector (sources/pyds.py, Spark 4
``pyspark.sql.datasource`` API): deterministic batch read, filter
pushdown partition pruning, and exactly-once streaming offsets."""

import tempfile

import pytest

from retail_sales_analysis_etl_bi_project_spark.sources import pyds


@pytest.fixture(scope="module")
def registered(spark):
    if not pyds.register(spark):
        pytest.skip("Python DataSource API needs Spark 4.x")
    return spark


def test_batch_read_is_deterministic_and_partitioned(registered):
    spark = registered
    df = (
        spark.read.format("retail_synth")
        .option("rows", 40)
        .option("parts", 4)
        .load()
    )
    rows = sorted([tuple(r) for r in df.collect()])
    assert rows == [pyds.synth_row(i) for i in range(1, 41)]
    # partition planning: the id range splits into 4 independent reads
    assert df.rdd.getNumPartitions() == 4


def test_filter_pushdown_prunes_partitions(registered):
    spark = registered
    df = (
        spark.read.format("retail_synth")
        .option("rows", 1000)
        .option("parts", 8)
        .load()
    )
    got = df.filter("sale_id > 990").collect()
    assert sorted(r.sale_id for r in got) == list(range(991, 1001))
    # the planner itself absorbs the range: direct contract check
    from pyspark.sql.datasource import GreaterThan, LessThanOrEqual

    r = pyds.RetailSynthReader({"rows": "1000", "parts": "8"})
    residual = list(
        r.pushFilters([
            GreaterThan(("sale_id",), 990),
            LessThanOrEqual(("quantity",), 3),  # not ours -> handed back
        ])
    )
    assert [type(f).__name__ for f in residual] == ["LessThanOrEqual"]
    parts = r.partitions()
    assert parts[0].start == 991 and parts[-1].end == 1001
    assert sum(p.end - p.start for p in parts) == 10  # 99% pruned


def test_stream_resumes_from_checkpoint_exactly_once(registered):
    spark = registered
    ckpt = tempfile.mkdtemp(prefix="pyds_ckpt_")
    out = tempfile.mkdtemp(prefix="pyds_out_")

    def run_once(upstream_rows):
        # parquet sink: the memory sink refuses checkpoint RECOVERY, and
        # recovery is exactly what this test exercises
        q = (
            spark.readStream.format("retail_synth")
            .option("rows", upstream_rows)
            .option("batch_rows", 40)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        return len(rows), sorted(r.sale_id for r in rows)

    n1, ids1 = run_once(100)
    assert (n1, ids1[0], ids1[-1]) == (100, 1, 100)
    # restart with the upstream grown to 250: the reader resumes from
    # the CHECKPOINTED offset — only ids 101..250 are read, no replays,
    # no gaps (rows 1..100 appear exactly once in the sink)
    n2, ids2 = run_once(250)
    assert n2 == 250 and ids2 == list(range(1, 251))


def test_manifest_writer_two_phase_commit(registered):
    spark = registered
    out = tempfile.mkdtemp(prefix="pyds_sink_")
    df = (
        spark.read.format("retail_synth")
        .option("rows", 30)
        .option("parts", 3)
        .load()
    )
    df.write.format("retail_synth").mode("append").option("path", out).save()

    import json
    import os

    with open(os.path.join(out, "_manifest.json")) as fh:
        manifest = json.load(fh)
    assert manifest["n_rows"] == 30
    on_disk = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    # the manifest lists EXACTLY the committed part files
    assert set(manifest["files"]) == on_disk and len(on_disk) >= 1

    back = pyds.read_manifest_json(spark, out)
    got = sorted(
        (r.sale_id, r.customer_id, r.category, r.quantity, r.unit_price)
        for r in back.collect()
    )
    assert got == [pyds.synth_row(i) for i in range(1, 31)]

    # an orphaned part file (lost task attempt / torn earlier job) is
    # invisible to the manifest reader and reaped by the next commit
    orphan = os.path.join(out, "part-deadbeef.jsonl")
    with open(orphan, "w") as fh:
        fh.write('{"sale_id": 999999}\n')
    assert pyds.read_manifest_json(spark, out).count() == 30
    df.write.format("retail_synth").mode("append").option("path", out).save()
    assert not os.path.exists(orphan)
    # ...and append MERGED rather than clobbered: both jobs' 30 rows are
    # in the manifest (append used to silently behave as overwrite)
    assert pyds.read_manifest_json(spark, out).count() == 60


def test_manifest_writer_overwrite_replaces_append_accumulates(registered):
    """mode semantics: overwrite publishes exactly this job's files;
    append merges into the existing manifest (files union, per-file row
    counts summed) so previously committed data survives."""
    import os

    spark = registered
    out = tempfile.mkdtemp(prefix="pyds_sink_modes_")
    df = (
        spark.read.format("retail_synth")
        .option("rows", 20)
        .option("parts", 2)
        .load()
    )
    df.write.format("retail_synth").mode("overwrite").option("path", out).save()
    assert pyds.read_manifest_json(spark, out).count() == 20
    first_files = {f for f in os.listdir(out) if f.endswith(".jsonl")}

    df.write.format("retail_synth").mode("append").option("path", out).save()
    back = pyds.read_manifest_json(spark, out)
    assert back.count() == 40  # every sale_id now appears twice
    assert back.filter("sale_id = 7").count() == 2
    # the first job's part files are still on disk AND in the manifest
    assert first_files <= {f for f in os.listdir(out) if f.endswith(".jsonl")}

    # overwrite after append: back to exactly one job's data, the
    # accumulated earlier files reaped
    df.write.format("retail_synth").mode("overwrite").option("path", out).save()
    assert pyds.read_manifest_json(spark, out).count() == 20
    assert not first_files & {f for f in os.listdir(out) if f.endswith(".jsonl")}


def test_push_filters_eager_and_nonint_comparand_handed_back(registered):
    """pushFilters is a plain method (bounds land even if the result is
    never iterated), and any non-integer comparand — 'abc', NULL, a
    truncating float — is returned to Spark instead of crashing the
    scan or absorbing a wrong bound."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    r = pyds.RetailSynthReader({"rows": "1000", "parts": "8"})
    residual = r.pushFilters(
        [
            EqualTo(("sale_id",), "abc"),  # ValueError path
            EqualTo(("sale_id",), None),  # TypeError path
            EqualTo(("sale_id",), 3.5),  # would truncate to 3 — refuse
            EqualTo(("sale_id",), True),  # bool-is-int trap — refuse
            GreaterThan(("sale_id",), 990),  # the one we CAN absorb
        ]
    )
    # eager contract: a list, not a generator, and bounds already set
    assert isinstance(residual, list) and len(residual) == 4
    assert r.lo == 991 and r.hi == 1000
    parts = r.partitions()
    assert sum(p.end - p.start for p in parts) == 10


def test_append_onto_legacy_manifest_preserves_committed_total(registered):
    """A manifest written before per-file row counts existed has only
    files + n_rows; an append must carry that committed total forward
    (as legacy_rows) instead of silently counting the old files as 0."""
    import json
    import os

    spark = registered
    out = tempfile.mkdtemp(prefix="pyds_sink_legacy_")
    df = (
        spark.read.format("retail_synth")
        .option("rows", 20)
        .option("parts", 2)
        .load()
    )
    df.write.format("retail_synth").mode("overwrite").option("path", out).save()
    man = os.path.join(out, "_manifest.json")
    with open(man) as fh:
        doc = json.load(fh)
    # rewrite as a pre-file_rows manifest
    with open(man, "w") as fh:
        json.dump({"files": doc["files"], "n_rows": doc["n_rows"]}, fh)

    df.write.format("retail_synth").mode("append").option("path", out).save()
    with open(man) as fh:
        merged = json.load(fh)
    assert merged["n_rows"] == 40  # 20 legacy + 20 appended
    assert merged["legacy_rows"] == 20
    assert pyds.read_manifest_json(spark, out).count() == 40

    # and a FURTHER append keeps carrying the remainder
    df.write.format("retail_synth").mode("append").option("path", out).save()
    with open(man) as fh:
        again = json.load(fh)
    assert again["n_rows"] == 60 and again["legacy_rows"] == 20
