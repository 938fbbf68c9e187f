"""Dimensional build (gold layer) — the reference's warehouse-load logic
(etl/etl.py:109-122, 143-306) rebuilt as lazy DataFrame plans.

- build_dim_date     : distinct calendar days + date parts (etl.py:109-122)
- with_surrogate_key : replaces Oracle sequences (sql/ddl_oracle.sql:18-22)
                       with a deterministic row_number over the natural key
- upsert_new_rows    : replaces Oracle MERGE insert-if-absent
                       (etl.py:179-224) with anti-join + unionByName
- assemble_fact      : the 4 broadcast key-lookup joins (etl.py:266-282),
                       keeping BOTH natural and surrogate keys (SURVEY §1.4)
- fk_violations      : referential-integrity audit (generate_data.py:299-304)
- null_audit         : per-column null-cell counts (generate_data.py:294-296)

Scale notes: surrogate-key assignment via a single global row_number is a
one-partition sort — fine for dims (<=50k rows in the reference; dims are
always small relative to the fact). For fact-sized tables we deliberately
do NOT assign global contiguous ids (see docstring of with_surrogate_key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.dates import date_key, date_parts


def build_dim_date(df: DataFrame, ts_col: str) -> DataFrame:
    """One row per distinct calendar day of ``ts_col``, with
    date_key=YYYYMMDD int, day/month/year/quarter and ISO weekday
    (1=Monday), exactly as etl/etl.py:109-120. Distinct-then-derive: the
    shuffle dedups day-granularity keys (at most ~tens of thousands of
    rows regardless of fact size), then parts are computed on the tiny
    result."""
    days = df.select(F.to_date(F.col(ts_col)).alias("calendar_date")).distinct()
    parts = date_parts("calendar_date")
    return days.select(
        date_key("calendar_date").alias("date_key"),
        "calendar_date",
        parts["day"].alias("day"),
        parts["month"].alias("month"),
        parts["year"].alias("year"),
        parts["quarter"].alias("quarter"),
        parts["weekday"].alias("weekday"),
    )


def with_surrogate_key(df: DataFrame, natural_key: str, key_name: str) -> DataFrame:
    """Deterministic surrogate key: dense 1..N in natural-key order,
    mirroring Oracle ``START WITH 1 INCREMENT BY 1`` sequences
    (sql/ddl_oracle.sql:18-22) without shared mutable state.

    Implementation is a row_number over a global ordering — a single
    partition window, acceptable because dimensions are small by
    definition. For billion-row entities use a hash key or
    per-partition-offset assignment instead (non-contiguous but
    shuffle-free); contiguity is a reference-parity requirement only for
    the dims."""
    w = Window.orderBy(natural_key)
    return df.select(F.row_number().over(w).cast("bigint").alias(key_name), "*")


def upsert_new_rows(existing: DataFrame, staging: DataFrame, key: str) -> DataFrame:
    """Insert-only-new idempotent merge (reference MERGE INTO dim_date,
    etl/etl.py:211-218): rows of ``staging`` whose ``key`` is absent from
    ``existing`` are appended. Anti-join is the shuffle-minimal relational
    form. SINGLE-WRITER assumption: the read-compute-overwrite cycle is
    not transactional — a concurrent writer between the anti-join's read
    and the caller's write can be lost. For concurrent pipelines use
    ``upsert_new_rows_delta`` (true ACID MERGE) when the delta-spark
    package is installed."""
    new_rows = staging.join(existing.select(key), on=key, how="left_anti")
    return existing.unionByName(new_rows)


def upsert_new_rows_delta(staging: DataFrame, target_table: str, key: str) -> None:
    """ACID backend for upsert_new_rows: MERGE WHEN NOT MATCHED THEN
    INSERT against a Delta table — the literal equivalent of the
    reference's ``MERGE INTO dim_date`` (etl/etl.py:211-218), safe under
    concurrent writers (optimistic transaction log). Import-gated: the
    delta-spark package is not in this container, so this raises a clear
    error here and activates wherever the package (and a
    Delta-configured SparkSession) is present."""
    try:
        from delta.tables import DeltaTable
    except ImportError as e:  # pragma: no cover - package absent here
        raise ImportError(
            "upsert_new_rows_delta requires the delta-spark package "
            "(pip install delta-spark) and a Delta-enabled SparkSession; "
            "use upsert_new_rows (anti-join form, single-writer) otherwise"
        ) from e
    target = DeltaTable.forName(staging.sparkSession, target_table)
    (
        target.alias("t")
        .merge(staging.alias("s"), f"t.{key} = s.{key}")
        .whenNotMatchedInsertAll()
        .execute()
    )


def assemble_fact(
    fact: DataFrame,
    dims: list[tuple[DataFrame, str, str]],
) -> DataFrame:
    """Reference fact assembly (etl/etl.py:266-295): for each
    (dim, natural_key, surrogate_key) attach the surrogate via a
    broadcast left join — left-outer semantics so unmatched natural keys
    yield NULL surrogate keys, exactly like pandas ``Series.map`` on a
    dict. Natural keys are retained (SURVEY §1.4: the docx queries join
    on natural keys while the DDL uses surrogates — we serve both)."""
    out = fact
    for dim, natural_key, surrogate_key in dims:
        lookup = dim.select(natural_key, surrogate_key)
        out = out.join(F.broadcast(lookup), on=natural_key, how="left")
    return out


def fk_violations(
    fact: DataFrame,
    dims: list[tuple[DataFrame, str, str, str, bool]],
) -> DataFrame:
    """Referential-integrity audit (generate_data.py:299-304): count of
    fact rows whose FK has no match in each dim (expect all zeros).

    ``dims`` entries are (dim, dim_key, fact_key, out_alias, small).
    ONE lazy plan, ONE scan of the fact: each dim contributes a left
    join on a 1-column key relation tagged with a match flag; the counts
    are conditional sums over the joined row in a single aggregate.
    Small dims are broadcast; large ones (``small=False``) go through a
    regular shuffled join — never broadcast a fact-sized side. Returns
    an UNEXECUTED one-row DataFrame (the lazy builder contract)."""
    out = fact.select(*[fact_key for _, _, fact_key, _, _ in dims])
    flags = []
    for i, (dim, dim_key, fact_key, out_alias, small) in enumerate(dims):
        flag = f"_fk_match_{i}"
        # distinct: a dim with a duplicated key (exactly the corruption
        # an integrity audit must survive) would otherwise multiply the
        # fact rows through the join and inflate every later count
        lookup = (
            dim.select(F.col(dim_key).alias(fact_key))
            .distinct()
            .withColumn(flag, F.lit(1))
        )
        if small:
            lookup = F.broadcast(lookup)
        out = out.join(lookup, on=fact_key, how="left")
        flags.append((flag, out_alias))
    return out.agg(
        *[
            # coalesce: SUM over an empty fact is NULL, the audit
            # contract is a 0 count
            F.coalesce(
                F.sum(F.col(flag).isNull().cast("bigint")), F.lit(0)
            ).alias(out_alias)
            for flag, out_alias in flags
        ]
    )


def scd2_history(
    df: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    tiebreak: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an event/snapshot
    stream: one output row per (key, attribute-run) with
    ``valid_from``/``valid_to`` (NULL valid_to = current version). The
    reference's MERGE is type-1 (insert-only-new, etl/etl.py:211-218);
    this is the type-2 extension every real warehouse eventually needs.

    Change points are rows where any attr IS DISTINCT FROM its
    predecessor (eqNullSafe — NULL-to-value transitions count) in
    (ts, tiebreak) order per key; ``valid_to`` is the next change's
    ``valid_from`` via lead(). Two windows over the same key
    partitioning — one shuffle, state per key is a single previous
    row. Fully SQL-expressible (LAG/LEAD + IS DISTINCT FROM), so
    DuckDB oracles it exactly."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    # explicit first-row marker: relying on lag(attr) IS NULL would miss
    # a first version whose attr is itself NULL (eqNullSafe(NULL,NULL))
    changed = F.lag(F.lit(1)).over(w).isNull()
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    points = df.withColumn("_chg", changed).filter(F.col("_chg"))
    return points.select(
        key,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
    )


def null_audit(df: DataFrame) -> DataFrame:
    """Per-column null-cell counts in ONE pass (generate_data.py:294-296
    did isnull().sum()); single aggregate row, no shuffle beyond the
    final combine."""
    aggs = [
        F.sum(F.col(c).isNull().cast("bigint")).alias(c) for c in df.columns
    ]
    return df.agg(*aggs)


def scd2_point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    ts: str,
) -> DataFrame:
    """Point-in-time (PIT) lookup against a type-2 history: attach to
    each fact row the dimension version in effect at the fact's
    timestamp — inner join on the key plus the interval containment
    valid_from <= ts < valid_to (NULL valid_to = open current
    version). The temporal sibling of the as-of join (joins.py): as-of
    picks the latest EVENT before ts; PIT picks the VERSION covering
    ts, which is the correct semantics against historized dimensions
    (versions tile time, so exactly one matches any in-range ts; facts
    before the key's first version drop, same as a missed inner join).

    Scale shape: a plain equi-join on the key — both sides
    hash-partition once, AQE splits skewed keys — with the interval
    predicate evaluated as a post-join filter on the (usually few)
    versions per key. No range-bucketing machinery is warranted here:
    unlike the general interval join (range_join), version counts per
    key are small by construction (regime CHANGES, not events), so the
    per-key fanout before filtering is bounded.
    """
    h = history.withColumnRenamed("valid_from", "_vf").withColumnRenamed(
        "valid_to", "_vt"
    )
    joined = facts.join(h, key).filter(
        (F.col(ts) >= F.col("_vf"))
        & (F.col("_vt").isNull() | (F.col(ts) < F.col("_vt")))
    )
    return joined.withColumnRenamed("_vf", "valid_from").withColumnRenamed(
        "_vt", "valid_to"
    )
