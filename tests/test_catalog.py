"""Catalog/DDL executor tests (S6) and validation report (S8)."""

import pytest
from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.catalog import (
    bulk_load,
    initialise_schema,
    replace_table,
    save_bucketed,
)
from retail_sales_analysis_etl_bi_project_spark.operators.report import (
    validation_report,
)


@pytest.fixture(scope="module")
def dw(spark):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored); drop the database afterwards
    yield "retail_dw_test"
    spark.sql("DROP DATABASE IF EXISTS retail_dw_test CASCADE")


def test_initialise_schema_idempotent(spark, dw):
    assert initialise_schema(spark, dw) is True
    assert initialise_schema(spark, dw) is False  # second run: skip
    tables = {t.name for t in spark.catalog.listTables(dw)}
    assert {"dim_customer", "dim_product", "dim_store", "dim_date", "fact_sales"} <= tables


def test_bulk_load_appends(spark, dw):
    initialise_schema(spark, dw)
    df = spark.createDataFrame(
        [(1, 101, "A", "B", "F", 30, "c", "s", "Gold")],
        "customer_key long, customer_id long, first_name string, last_name string,"
        "gender string, age long, city string, state string, membership_level string",
    )
    n = bulk_load(df, "dim_customer", dw)
    assert n == 1
    assert spark.table(f"{dw}.dim_customer").count() >= 1


def test_replace_table(spark, dw):
    df1 = spark.createDataFrame([(1,)], "x long")
    df2 = spark.createDataFrame([(2,), (3,)], "x long")
    replace_table(df1, "stg_tmp", dw)
    replace_table(df2, "stg_tmp", dw)
    assert sorted(r.x for r in spark.table(f"{dw}.stg_tmp").collect()) == [2, 3]


def test_bucketed_join_is_shuffle_free(spark, dw):
    # Two tables bucketed on the join key with the same bucket count:
    # the join must plan as SortMergeJoin with NO Exchange on either
    # side (the bucket layout IS the join partitioning). Broadcast and
    # AQE are disabled for the assertion so the plan can't be rewritten
    # into a shape where the absence of a shuffle is trivial.
    left = (
        spark.range(0, 1000)
        .withColumn("k", F.col("id") % 100)
        .withColumn("a", F.col("id") * 2)
    )
    right = (
        spark.range(0, 500)
        .withColumn("k", F.col("id") % 100)
        .withColumn("b", F.col("id") + 7)
    )
    save_bucketed(left, "b_left", "k", n_buckets=8, database=dw)
    save_bucketed(right, "b_right", "k", n_buckets=8, database=dw)
    old = {
        c: spark.conf.get(c)
        for c in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j = spark.table(f"{dw}.b_left").join(spark.table(f"{dw}.b_right"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # 100 keys, 10 left rows x 5 right rows each
        assert j.count() == 100 * 10 * 5
    finally:
        for c, v in old.items():
            spark.conf.set(c, v)


def test_validation_report_format(spark):
    t = {
        "customers": spark.createDataFrame([(1, "a"), (2, None)], "id long, n string"),
        "sales": spark.createDataFrame([(1, 1), (2, 99)], "sid long, id long"),
    }
    rep = validation_report(t, fact_name="sales", fk_map=[("customers", "id")])
    assert "rows in customers: 2" in rep
    assert "null cells in customers: 1" in rep
    assert "sales rows with bad foreign keys: 1" in rep


def test_jdbc_sink_configures_writer_and_reaches_jdbc_layer(spark):
    """No external DB (or driver jar) exists in this container, so the
    honest check is: jdbc_sink must plumb its options through to Spark's
    JDBC source and fail there with a driver-resolution error — not an
    API/typo error in our builder chain."""
    import pytest as _pytest

    from retail_sales_analysis_etl_bi_project_spark.operators.catalog import (
        jdbc_sink,
    )

    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    with _pytest.raises(Exception) as exc:
        jdbc_sink(
            df,
            "jdbc:postgresql://nowhere:5432/nodb",
            "t",
            num_partitions=2,
            user="u",
            password="p",
        )
    msg = str(exc.value)
    assert "JDBC" in msg or "driver" in msg.lower() or "No suitable" in msg


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.operators.catalog import (
        compact_parquet,
    )

    path = str(tmp_path / "tiny_files")
    # simulate micro-batch ingest: 24 single-row commits -> 24+ files
    df = spark.range(240).withColumnRenamed("id", "k")
    df.repartition(24).write.parquet(path)
    import os

    before = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(before) >= 20

    stats = compact_parquet(spark, path, target_mb=128)
    assert stats["files_before"] == len(before)
    assert stats["files_after"] == 1  # well under one target file

    back = spark.read.parquet(path)
    assert back.count() == 240
    assert sorted(r.k for r in back.collect()) == list(range(240))


def test_parquet_schema_evolution_roundtrip(spark, tmp_path):
    """Schema-evolution contract for append-style staging dirs: an
    appended batch may ADD columns; mergeSchema reads reconcile the
    union, old rows NULL-fill the new column (the reference's ALTER
    TABLE ADD COLUMN analogue, without DDL)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    v1 = spark.range(3).select(F.col("id").alias("k"), F.lit("a").alias("s"))
    v1.write.parquet(path)
    v2 = spark.range(3, 5).select(
        F.col("id").alias("k"), F.lit("b").alias("s"), F.lit(1.5).alias("extra")
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"k", "s", "extra"}
    rows = {r.k: r for r in merged.collect()}
    assert rows[0].extra is None and rows[4].extra == 1.5


def test_compact_parquet_recovers_interrupted_swap_and_refuses_partitions(
    spark, tmp_path
):
    import os
    import shutil

    from retail_sales_analysis_etl_bi_project_spark.operators.catalog import (
        compact_parquet,
    )

    path = str(tmp_path / "t")
    spark.range(100).withColumnRenamed("id", "k").repartition(8).write.parquet(path)
    # simulate a crash between the two swap moves: committed data sits
    # at the FIXED _prev name, nothing at path
    shutil.move(path, path + "_prev")
    stats = compact_parquet(spark, path, target_mb=128)
    assert stats["files_after"] == 1 and not os.path.exists(path + "_prev")
    assert spark.read.parquet(path).count() == 100

    # partitioned layout: refuse rather than flatten to one file
    part = str(tmp_path / "parted")
    spark.range(10).selectExpr("id as k", "id % 2 as p").write.partitionBy(
        "p"
    ).parquet(part)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="partition subdirectories"):
        compact_parquet(spark, part)


def test_compact_parquet_reaps_stale_tmp_dirs(spark, tmp_path):
    """A crash after writing the uuid `<path>_compact_<hex>` tmp dir but
    before the swap used to strand it forever (a full table copy leaked
    per crash); compaction now reaps stale tmp siblings on entry."""
    import os

    from retail_sales_analysis_etl_bi_project_spark.operators.catalog import (
        compact_parquet,
    )

    path = str(tmp_path / "t2")
    spark.range(50).withColumnRenamed("id", "k").repartition(6).write.parquet(path)
    # plant two AGED tmp dirs from "earlier crashed compactions" and one
    # FRESH dir standing in for a concurrent compaction's in-flight
    # write — the reap is TTL-gated so only the aged ones may go
    old = 0
    for hexpart in ("deadbeef", "cafef00d"):
        stale = f"{path}_compact_{hexpart}"
        os.makedirs(stale)
        with open(os.path.join(stale, "part-0.parquet"), "w") as fh:
            fh.write("junk")
        # age dir AND contents: the gate walks the whole tree so an
        # in-flight write's hot _temporary subtree protects it
        os.utime(os.path.join(stale, "part-0.parquet"), (old, old))
        os.utime(stale, (old, old))  # epoch-aged: far past any TTL
    fresh = f"{path}_compact_feedf00d"
    os.makedirs(fresh)
    # a LONG-RUNNING concurrent write: top-level dir looks old (Spark
    # only touches it at commit) but task activity inside is fresh —
    # must survive the reap
    live = f"{path}_compact_11ee22dd"
    os.makedirs(os.path.join(live, "_temporary"))
    with open(os.path.join(live, "_temporary", "task-0"), "w") as fh:
        fh.write("inflight")
    os.utime(live, (old, old))
    # an unrelated sibling must survive the reap
    other = str(tmp_path / "t2_other")
    os.makedirs(other)

    stats = compact_parquet(spark, path, target_mb=128)
    assert stats["files_after"] == 1
    assert spark.read.parquet(path).count() == 50
    leftovers = {e for e in os.listdir(tmp_path) if "_compact_" in e}
    assert leftovers == {os.path.basename(fresh), os.path.basename(live)}
    assert os.path.exists(other)
