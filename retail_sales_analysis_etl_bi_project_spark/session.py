"""SparkSession factory.

The reference (etl/etl.py:31-45) builds a SQLAlchemy engine to an external
Oracle; our engine's "connection" is a SparkSession. Config choices map
reference semantics onto Spark:

- ANSI mode OFF: pandas ``errors="coerce"`` (etl/etl.py:66,72-73,87-88)
  means invalid casts become NULL, never errors. Non-ANSI Spark casts
  (plus try_* functions) reproduce that exactly.
- AQE ON: runtime coalescing of shuffle partitions, join-strategy
  switching and skew-join handling — required at 100 TB, harmless at
  test scale.
- Broadcast threshold: all reference dims (<=50k rows) are far below
  10 MB, so every dim join becomes a broadcast hash join, which is the
  physical plan the reference hand-rolled with dict lookups
  (etl/etl.py:266-282).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "retail-sales-analysis-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    On a real cluster, ``master`` comes from the environment; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # ANSI default OFF (pandas errors="coerce" semantics, module
        # docstring above) — but overridable so the local gate can
        # replicate the DRIVER's ANSI-ON session posture, which is how
        # the r12 text_langid_threshold_sweep DIVIDE_BY_ZERO shipped
        # past an ANSI-off-only gate. All engine plans must be
        # ANSI-clean (try_divide / guarded casts), so both postures
        # produce identical results; REPLICA_ANSI proves it per round.
        .config(
            "spark.sql.ansi.enabled",
            os.environ.get("SPARK_GRAFT_ANSI", "false"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Python DataSource filter pushdown (sources/pyds.py): a reader
        # that implements pushFilters() ERRORS when this is off (4.1's
        # fail-loud contract), and the conf is read at plan time, so the
        # engine session enables it up front. Ignored by Spark 3.x.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ensure_nanos_as_long(spark)
    return spark


def ensure_nanos_as_long(spark: SparkSession) -> None:
    """Spark 3.x-only shim: parquet TIMESTAMP(NANOS) columns (events.ts
    in the driver testdata) can only be read on 3.x via the
    ``nanosAsLong`` legacy conf, which surfaces them as raw nanos longs;
    the loader (sources/tables.py) then truncates to microsecond
    timestamps — the value DuckDB produces for the same file.

    Spark 4.x REMOVED this conf (setting it is a silent no-op) and reads
    TIMESTAMP(NANOS) natively, truncated to identical microsecond
    values, so this helper is skipped there entirely. The loader does
    NOT assume this conf worked: it branches on the scanned dtype.

    This is the ONLY place the conf is mutated, so the policy stays
    greppable in one location."""
    if int(spark.version.split(".")[0]) >= 4:
        return
    key = "spark.sql.legacy.parquet.nanosAsLong"
    if spark.conf.get(key, "false") != "true":
        spark.conf.set(key, "true")
