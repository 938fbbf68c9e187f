"""One-off streaming-ingestion throughput bench (r8 VERDICT item 5):
drain the monitoring family's foreachBatch maintainers over a chunked
sf0.1 source and record rows/sec into BENCH_FULL.json under a
"streaming" key — the measured number SCALE.md's ingestion sections
cite.

Two paths, both availableNow with maxFilesPerTrigger=1 so every chunk
is its own micro-batch (the per-batch store-merge overhead is billed
N_CHUNKS times — the honest shape of continuous ingestion, not one
giant batch):

- volume monitor (streaming/anomaly.py): events -> per-(type, day)
  count store; readout rows asserted EQUAL to the batch
  events_anomaly_daily result.
- incremental KPI (streaming/kpi.py): orders -> per-(year, month)
  fixed-point partials; readout sanity-checked against a direct
  aggregate of the source.

Not driver-facing — bench.py remains the per-round headline contract.

Usage: python tools/bench_streaming.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.plans.stat_queries import (
    events_anomaly_daily,
)
from retail_sales_analysis_etl_bi_project_spark.session import get_spark
from retail_sales_analysis_etl_bi_project_spark.sources.tables import load_table
from retail_sales_analysis_etl_bi_project_spark.streaming.anomaly import (
    anomaly_readout,
    maintain_volume_stream,
)
from retail_sales_analysis_etl_bi_project_spark.streaming.harness import (
    chunked_file_source,
)
from retail_sales_analysis_etl_bi_project_spark.streaming.kpi import (
    maintain_kpi_stream,
    read_kpi,
)

N_CHUNKS = 8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bench_streaming_")
    results: dict[str, dict] = {}

    # ---- volume monitor: events -> daily count store ----
    events = load_table(spark, sf_dir, "events")
    src = f"{work}/events_src"
    n_events = chunked_file_source(events, "event_id", src, N_CHUNKS)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.perf_counter()
    maintain_volume_stream(
        stream, f"{work}/volume", f"{work}/volume_ckpt", timeout_sec=600
    )
    wall = time.perf_counter() - t0
    # correctness guard (outside the timed window): the maintained
    # store's flags must EQUAL the one-shot batch query, or the
    # throughput number is measuring a wrong pipeline
    got = sorted(map(tuple, anomaly_readout(spark, f"{work}/volume").collect()))
    want = sorted(map(tuple, events_anomaly_daily(spark, sf_dir).collect()))
    assert got == want, "streamed anomaly flags != batch query"
    results["anomaly_volume_monitor"] = {
        "input_rows": n_events,
        "micro_batches": N_CHUNKS,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(n_events / wall),
        "readout_rows": len(got),
    }

    # ---- incremental KPI: orders -> fixed-point partials store ----
    orders = load_table(spark, sf_dir, "orders")
    src = f"{work}/orders_src"
    n_orders = chunked_file_source(orders, "o_orderkey", src, N_CHUNKS)
    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.perf_counter()
    maintain_kpi_stream(
        stream, f"{work}/kpi", f"{work}/kpi_ckpt", timeout_sec=600
    )
    wall = time.perf_counter() - t0
    kpi = read_kpi(spark, f"{work}/kpi")
    n_groups = kpi.count()
    # sanity: maintained order count equals the source's
    maintained_n = kpi.agg(F.sum("n_orders")).first()[0]
    assert maintained_n == n_orders, (maintained_n, n_orders)
    results["incremental_kpi_maintenance"] = {
        "input_rows": n_orders,
        "micro_batches": N_CHUNKS,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(n_orders / wall),
        "readout_rows": n_groups,
    }

    # ---- ingest novelty: documents -> shingle store (r13) ----
    from retail_sales_analysis_etl_bi_project_spark.plans.signal_queries import (
        corpus_ngram_novelty,
    )
    from retail_sales_analysis_etl_bi_project_spark.streaming.harness import (
        range_chunked_file_source,
    )
    from retail_sales_analysis_etl_bi_project_spark.streaming.novelty import (
        novelty_stream_against_store,
        read_novelty,
    )

    docs = load_table(spark, sf_dir, "documents")
    want = sorted(
        map(tuple, corpus_ngram_novelty(spark, sf_dir).collect())
    )
    # Two batch counts (r13 VERDICT item 6): the 268 docs/s r13 reading
    # bills the per-micro-batch cost (store read + anti-joins + 3
    # parquet commits + foreachBatch scheduling) N_CHUNKS times, so the
    # number conflates fixed per-batch overhead with per-doc scoring
    # cost. Draining the SAME corpus at 8 and at 2 micro-batches and
    # solving wall = fixed*B + per_doc*n separates them — committed
    # evidence instead of the r13 assertion.
    # Production batch sizing (r14 VERDICT item 5): the committed
    # decomposition proved per-doc cost is below noise and fixed cost
    # ≈2s/micro-batch, so throughput is set ENTIRELY by batch size.
    # The 1-chunk drain IS the production posture at this corpus size
    # — the whole 5k-doc corpus arrives as one micro-batch (at 100 TB,
    # maxFilesPerTrigger/maxBytesPerTrigger sized to ≥10⁴ docs); its
    # docs/s is the amortized number SCALE.md cites.
    nov_walls: dict[int, float] = {}
    for n_chunks in (N_CHUNKS, 2, 1):
        sub = f"{work}/nov{n_chunks}"
        src = f"{sub}/docs_src"
        # range chunks: novelty attribution depends on INGEST ORDER
        n_docs = range_chunked_file_source(docs, "doc_id", src, n_chunks)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.perf_counter()
        novelty_stream_against_store(
            stream,
            f"{sub}/nov_store",
            f"{sub}/nov_out",
            f"{sub}/nov_ckpt",
            timeout_sec=600,
        )
        wall = time.perf_counter() - t0
        got = sorted(
            map(tuple, read_novelty(spark, f"{sub}/nov_out").collect())
        )
        assert got == want, "streamed novelty != batch query"
        nov_walls[n_chunks] = wall
        key = (
            "ingest_novelty_scoring"
            if n_chunks == N_CHUNKS
            else f"ingest_novelty_scoring_{n_chunks}batch"
        )
        results[key] = {
            "input_rows": n_docs,
            "micro_batches": n_chunks,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(n_docs / wall),
            "readout_rows": len(got),
        }
        if n_chunks == 1:
            # the amortized production number (whole corpus as one
            # micro-batch); exact-equality readout asserted above like
            # every other drain
            results["ingest_novelty_scoring_prodbatch"] = results.pop(key)
    if N_CHUNKS <= 2:
        # degenerate: both drains at the same batch count — the linear
        # solve has no signal; skip rather than divide by zero
        return_decomp = None
    else:
        fixed = (nov_walls[N_CHUNKS] - nov_walls[2]) / (N_CHUNKS - 2)
        per_doc = (nov_walls[2] - 2 * fixed) / n_docs
        return_decomp = (fixed, per_doc)
    if return_decomp is None:
        fixed = per_doc = float("nan")
    results["ingest_novelty_decomposition"] = {
        "fixed_per_batch_sec": round(fixed, 3),
        "per_doc_ms": round(per_doc * 1000, 4),
        # a NEGATIVE fixed term means the larger-batch drain ran FASTER
        # than the small one — pure timing noise; both raw walls are
        # recorded above, so the reader can judge the residual
        "noise_flag": bool(fixed != fixed or fixed < 0),
        "note": (
            "wall = fixed*B + per_doc*n solved from the 8- and 2-batch "
            "drains of the same corpus; fixed is micro-batch machinery "
            "(store read-back, 3 parquet commits, scheduling), per_doc "
            "is the marginal shingle/anti-join/scoring cost. A per_doc "
            "estimate <= 0 means the marginal per-doc cost is below "
            "measurement noise: throughput is set ENTIRELY by batch "
            "size, so production ingestion amortizes by sizing "
            "micro-batches >= 10^4 docs (maxFilesPerTrigger), not by "
            "optimizing the scoring plan"
        ),
    }

    shutil.rmtree(work, ignore_errors=True)

    out_path = os.path.join(ROOT, "BENCH_FULL.json")
    doc = {}
    # tolerate a truncated/corrupt prior artifact (bench_full.py has
    # the same guard): the just-measured throughput must not be lost
    # to an unreadable file — start a fresh doc instead
    try:
        with open(out_path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {}
    doc["streaming"] = {
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "note": (
            "foreachBatch ingestion throughput, availableNow x "
            f"{N_CHUNKS} micro-batches (store merge billed per batch); "
            "tools/bench_streaming.py"
        ),
        **results,
    }
    # atomic, like every other writer of this shared artifact: a kill
    # mid-dump must not truncate the full-registry timings
    with open(out_path + ".tmp", "w") as f:
        json.dump(doc, f, indent=1)
    os.replace(out_path + ".tmp", out_path)
    print(json.dumps(doc["streaming"], indent=1))


if __name__ == "__main__":
    main()
