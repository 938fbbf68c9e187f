"""Measurement-only scaled fixture builder (r16, VERDICT item 6).

Replicates an existing SF directory K times with per-copy KEY SHIFTS so
fact joins stay copy-local (o_orderkey/l_orderkey shift together;
doc/event/vec ids shift; dims are copied once, so fact:dim fanout grows
K-fold — the realistic direction). Output goes under /tmp by default:
this is a TIMING fixture for core-count scaling evidence, never an
oracle input, and nothing in the engine reads it unless pointed at it
explicitly.

Document text gets a per-copy suffix token so replicated corpora don't
consist of byte-identical documents (which would make any pair-style
query quadratic in K instead of linear and poison the measurement).

Usage: python tools/make_scaled_fixture.py <src_sf_dir> <out_dir> [K]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from retail_sales_analysis_etl_bi_project_spark.session import get_spark  # noqa: E402

# (table, [key columns to shift per copy]) — keys that must stay
# join-consistent shift by the same per-table stride in every table
# that carries them.
SHIFTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    src, out = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    spark = get_spark("make-scaled-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    strides: dict[str, int] = {}
    for name in COPY_ONCE:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(name, "copied once")

    # one shared stride per key namespace, from the owning table
    key_stride: dict[str, int] = {}
    for name, keys in SHIFTS.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        for key in keys:
            if key not in key_stride:
                mx = df.agg(F.max(key)).collect()[0][0] or 0
                key_stride[key] = int(mx) + 1
    # l_orderkey must use o_orderkey's stride (same namespace)
    key_stride["l_orderkey"] = key_stride["o_orderkey"]

    for name, keys in SHIFTS.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        parts = []
        for i in range(k):
            c = df
            for key in keys:
                c = c.withColumn(
                    key, (F.col(key) + F.lit(i * key_stride[key])).cast("long")
                )
            if name == "documents" and i > 0:
                # perturb replicated text so the corpus is not K
                # byte-identical copies (see module docstring)
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copytoken{i}"))
                )
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        # write with natural output partitioning (multiple files —
        # unlike the single-row-group driver testdata, a corpus this
        # size would arrive split)
        u.repartition(64).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(name, f"x{k} written")


if __name__ == "__main__":
    main()
