"""Expression-level Bloom filter (operators/bloom.py): the no-false-
negative contract, real pruning, FPR sanity, and exact-join equivalence
of the prefiltered join."""

import pytest
from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.bloom import (
    bloom_prefilter_join,
    build_bloom,
    might_contain,
)
from retail_sales_analysis_etl_bi_project_spark.sources.tables import load_table


def test_no_false_negatives_and_real_pruning(spark, sf_dir):
    """Every fact row whose key IS in the build set must pass the
    prefilter (zero false negatives — the correctness half), and a
    selective build set must reject most non-members (the point of the
    pattern — otherwise it's a no-op that still costs k hashes/row)."""
    orders = load_table(spark, sf_dir, "orders")
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    words = build_bloom(dim, "c_custkey")
    kept = orders.filter(might_contain("o_custkey", words))

    member_keys = {r.c_custkey for r in dim.collect()}
    true_hits = orders.filter(F.col("o_custkey").isin(member_keys))
    assert kept.count() >= true_hits.count()
    # subset check: every true member survives the prefilter
    missed = true_hits.join(kept.select("o_orderkey"), "o_orderkey", "left_anti")
    assert missed.count() == 0
    # one of five segments + ~1% FPR: the prefilter must drop most rows
    assert kept.count() < 0.5 * orders.count()


def test_prefiltered_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    got = (
        bloom_prefilter_join(orders, dim, "o_custkey", "c_custkey")
        .select("o_orderkey")
        .collect()
    )
    want = (
        orders.join(dim, orders.o_custkey == dim.c_custkey)
        .select("o_orderkey")
        .collect()
    )
    assert sorted(r.o_orderkey for r in got) == sorted(r.o_orderkey for r in want)


def test_fpr_on_disjoint_probe_set(spark):
    """Keys 0..999 inserted; probes 10_000..19_999 are all non-members,
    so every hit is a false positive. With m=61440, k=3, n=1000:
    theoretical FPR ~0.01% — assert a loose 1% bound so the test pins
    'the bitmap actually discriminates' without flaking on hash luck."""
    build = spark.range(0, 1000)
    words = build_bloom(build, "id")
    probes = spark.range(10_000, 20_000)
    fp = probes.filter(might_contain("id", words)).count()
    assert fp / 10_000 < 0.01


def test_m_bits_must_pack_whole_words(spark):
    with pytest.raises(ValueError):
        build_bloom(spark.range(10), "id", m_bits=100)


def test_mixed_integral_key_widths_still_exact(spark):
    """xxhash64 hashes value AND type, so an int build probed by a
    bigint fact would silently drop matches without normalization;
    bloom_prefilter_join hashes all integral keys as bigint, and
    bloom_probe normalizes from the probe DataFrame's own dtype."""
    from pyspark.sql import functions as SF

    dim = spark.createDataFrame([(i,) for i in range(0, 500, 3)], "dk int")
    fact = spark.range(0, 500).withColumnRenamed("id", "fk")  # bigint
    got = sorted(
        r.fk
        for r in bloom_prefilter_join(fact, dim, "fk", "dk").select("fk").collect()
    )
    assert got == list(range(0, 500, 3))

    # bloom_probe: an INT-typed probe df against the int-built (bigint-
    # normalized) bitmap must keep every member — the raw might_contain
    # path would drop them all
    from retail_sales_analysis_etl_bi_project_spark.operators.bloom import (
        bloom_probe,
    )

    words = build_bloom(dim, "dk")
    int_probe = fact.select(SF.col("fk").cast("int").alias("pk"))
    kept = {r.pk for r in bloom_probe(int_probe, "pk", words).collect()}
    assert set(range(0, 500, 3)) <= kept


def test_non_integral_key_type_mismatch_refused(spark):
    dim = spark.createDataFrame([("1",)], "dk string")
    fact = spark.range(5).withColumnRenamed("id", "fk")
    with pytest.raises(ValueError, match="type mismatch"):
        bloom_prefilter_join(fact, dim, "fk", "dk")
