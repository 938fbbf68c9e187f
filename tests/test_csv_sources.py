"""Bronze CSV source tests (S1/S2): explicit schema, quoted fields,
staging roundtrip."""

from retail_sales_analysis_etl_bi_project_spark.sources.csv import (
    RAW_COLUMNS,
    read_raw_csv,
    write_staging,
)


def test_read_raw_csv_quoted_commas(spark, tmp_path):
    p = tmp_path / "stores.csv"
    p.write_text(
        'store_id,store_name,city,state,region,store_type\n'
        '1,"Ramakrishnan, Majumdar and Aurora Market",Siliguri,Goa,West,Outlet\n'
        "2,Plain Store,Pune,MH,West,Mall\n"
    )
    df = read_raw_csv(spark, str(p), "stores")
    rows = df.orderBy("store_id").collect()
    assert rows[0].store_name == "Ramakrishnan, Majumdar and Aurora Market"
    assert df.columns == RAW_COLUMNS["stores"]
    # all-string bronze schema: coercion is a cleaning step, not scan magic
    assert all(t == "string" for _, t in df.dtypes)


def test_staging_roundtrip_parquet_and_csv(spark, tmp_path):
    df = spark.createDataFrame([("1", "x"), ("2", "y")], "id string, v string")
    write_staging(df, str(tmp_path / "pq"))
    assert spark.read.parquet(str(tmp_path / "pq")).count() == 2
    write_staging(df, str(tmp_path / "csv"), fmt="csv")
    back = spark.read.option("header", True).csv(str(tmp_path / "csv"))
    assert sorted(r.id for r in back.collect()) == ["1", "2"]


def test_csv_roundtrip_staging_gc(tmp_path):
    """Stale csv_stage_orders_* dirs are reaped; fresh ones survive (a
    concurrent session's lazy read must never lose its dir)."""
    import os
    import time

    from retail_sales_analysis_etl_bi_project_spark.plans import etl_queries as eq

    warehouse = os.path.join(os.path.dirname(eq.__file__), "..", "..", "spark-warehouse")
    os.makedirs(warehouse, exist_ok=True)
    old = os.path.join(warehouse, "csv_stage_orders_test_deadbeef")
    new = os.path.join(warehouse, "csv_stage_orders_test_cafebabe")
    os.makedirs(old, exist_ok=True)
    os.makedirs(new, exist_ok=True)
    stale = time.time() - eq._STAGE_TTL_SEC - 60
    os.utime(old, (stale, stale))
    try:
        eq._gc_stale_staging_dirs()
        assert not os.path.exists(old), "stale staging dir not reaped"
        assert os.path.exists(new), "fresh staging dir must survive"
    finally:
        for d in (old, new):
            if os.path.exists(d):
                os.rmdir(d)
