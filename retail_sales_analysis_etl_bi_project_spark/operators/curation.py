"""Corpus-curation operators a large-scale training-data pipeline needs
downstream of filtering/dedup: domain (temperature) sampling and
fixed-budget sequence packing. Not present in the reference (its ETL
stops at BI tables); part of the LLM-pipeline extension surface.

Cross-engine determinism (the driver hash-compares against DuckDB):
- sampling decisions use hash60(doc_id) — the shared md5-derived
  primitive — against an INTEGER per-stratum threshold, so there is no
  float boundary to flake on;
- the stratum weights use sqrt (IEEE correctly-rounded, bit-identical
  in both engines) floored to integers before summation, so the
  weight total is an exact, order-independent BIGINT sum — never a
  float sum whose value depends on reduction order;
- packing is pure integer window arithmetic.

Design for 100 TB:
- temperature_sample: one tiny groupBy(stratum) agg broadcast back —
  the corpus-sized pass is a scan-fused filter, no shuffle.
- pack_sequences: one window cumsum per shard (= domain/source). A
  window partition is a single task, so shards must be bounded
  (~executor-sized); real deployments sub-shard big domains with a
  salted shard key + a two-phase cumsum (per-shard totals broadcast as
  offsets) — same math, documented in SCALE.md. Packing within domain
  shards is also what real pretraining pipelines do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash60_expr

SCALE_M = 1_000_000


def temperature_sample(
    docs: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    frac: float = 0.6,
) -> DataFrame:
    """Deterministic alpha=0.5 temperature sampling: stratum s with
    count c_s gets weight w_s = floor(sqrt(c_s * 1e6)) (integer-exact
    sqrt(c_s) scaling), and each doc is kept iff
    hash60(doc_id) % 1e6 < t_s, with the integer threshold
    t_s = min(1e6, floor(frac*N * w_s * 1e6 / (sumw * c_s))).
    Rare domains are upsampled relative to their share (classic
    count^alpha mixing, alpha=1/2); expected kept fraction ~= frac.
    Returns the kept rows with their stratum threshold attached."""
    stats = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("c"))
    stats = stats.withColumn(
        "w", F.floor(F.sqrt(F.col("c") * F.lit(float(SCALE_M)))).cast("long")
    )
    tot = stats.agg(F.sum("c").alias("n"), F.sum("w").alias("sumw"))
    stats = (
        stats.crossJoin(F.broadcast(tot))
        .withColumn(
            "keep_thresh",
            F.least(
                F.lit(float(SCALE_M)),
                F.floor(
                    F.lit(frac)
                    * F.col("n")
                    * F.col("w")
                    * F.lit(float(SCALE_M))
                    # denominator in DOUBLE: a long*long product wraps
                    # silently in non-ANSI Spark (while DuckDB widens to
                    # int128) once sumw*c > 2^63 — reachable at 100 TB
                    # stratum counts (c~1e12, sumw~1e11 -> 1e23). Both
                    # engines IEEE-multiply identically in double.
                    / (F.col("sumw").cast("double") * F.col("c").cast("double"))
                ),
            ).cast("long"),
        )
        .select(strata_col, "keep_thresh")
    )
    return docs.join(F.broadcast(stats), strata_col).filter(
        hash60_expr(F.col(id_col).cast("string")) % SCALE_M < F.col("keep_thresh")
    )


def pack_sequences(
    docs: DataFrame,
    token_col: str = "n_tokens",
    budget: int = 2048,
    shard_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-budget sequence packing: concatenate each
    shard's token stream in doc_id order and chunk it into sequences of
    ``budget`` tokens. Emits one row per (doc, sequence) span —
    (shard, seq_id, doc_id, n_tokens, tok_lo, tok_hi): the half-open
    token range [tok_lo, tok_hi) the doc occupies inside seq_id. Docs
    longer than the budget span multiple sequences (real pipelines
    split exactly like this); zero-token docs are dropped."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = docs.filter(F.col(token_col) > 0).withColumn(
        "cum", F.sum(token_col).over(w).cast("long")
    )
    return _spans_from_cum(cum, token_col, budget, shard_col, id_col)


def _spans_from_cum(
    cum: DataFrame, token_col: str, budget: int, shard_col: str, id_col: str
) -> DataFrame:
    """Span math shared by the one-window packer and the sharded
    two-phase packer: given each doc's inclusive running token total
    ``cum`` within its shard's stream, emit the (doc, sequence) spans.
    Pure per-row arithmetic — no shuffle."""
    b = F.lit(budget)
    spans = (
        cum.withColumn("start", F.col("cum") - F.col(token_col))
        .withColumn("seq_lo", F.floor(F.col("start") / b).cast("long"))
        .withColumn("seq_hi", F.floor((F.col("cum") - 1) / b).cast("long"))
        .withColumn("seq_id", F.explode(F.sequence("seq_lo", "seq_hi")))
    )
    return spans.select(
        F.col(shard_col),
        F.col("seq_id"),
        F.col(id_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        (F.greatest("start", F.col("seq_id") * b) - F.col("seq_id") * b)
        .cast("long")
        .alias("tok_lo"),
        (F.least("cum", (F.col("seq_id") + 1) * b) - F.col("seq_id") * b)
        .cast("long")
        .alias("tok_hi"),
    )


def pack_sequences_sharded(
    docs: DataFrame,
    token_col: str = "n_tokens",
    budget: int = 2048,
    shard_col: str = "source",
    id_col: str = "doc_id",
    block_size: int = 1 << 20,
) -> DataFrame:
    """The 100 TB form of pack_sequences — IDENTICAL output, bounded
    window partitions. pack_sequences runs one window cumsum per shard,
    so a shard's whole token stream is a single task; fine for
    thousands of balanced sources, a straggler/OOM for a mega-domain
    (common-crawl-sized 'web' shards). This variant decomposes the
    cumsum into two phases, the classic distributed prefix-sum:

    1. docs are sub-sharded into CONTIGUOUS id blocks
       (floor(id / block_size) — order-preserving, so concatenation
       order is unchanged). Each (shard, block) window partition is at
       most block_size docs, sized to a task. Production ingest with
       arbitrary id distributions derives block boundaries from a
       sampled range partitioning instead (Spark's RangePartitioner
       discipline); the arithmetic below is identical.
    2. a local window cumsum per (shard, block), plus per-block token
       totals (groupBy — partial-aggregated, rows = shards x blocks,
       KBs at any scale). An exclusive prefix sum over the totals
       (window over the TINY totals table) gives each block's global
       stream offset, broadcast-joined back: global cum = block offset
       + local cum. Exactness: integer sums decompose associatively,
       so the result equals the one-window form row-for-row (pinned by
       tests/test_pipeline_queries.py and the shared DuckDB oracle of
       corpus_pack_sharded, which replays the ONE-WINDOW spec).

    Net plan: one bounded-partition window + one tiny agg/window +
    one broadcast join — no unbounded task anywhere.
    """
    blk = F.floor(F.col(id_col) / F.lit(block_size)).cast("long").alias("_blk")
    live = docs.filter(F.col(token_col) > 0).withColumn("_blk", blk)
    w_local = (
        Window.partitionBy(shard_col, "_blk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = live.withColumn("cum_local", F.sum(token_col).over(w_local).cast("long"))
    totals = live.groupBy(shard_col, "_blk").agg(
        F.sum(token_col).cast("long").alias("_blk_total")
    )
    w_prefix = (
        Window.partitionBy(shard_col)
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        shard_col,
        "_blk",
        F.coalesce(F.sum("_blk_total").over(w_prefix), F.lit(0))
        .cast("long")
        .alias("_offset"),
    )
    cum = (
        local.join(F.broadcast(offsets), [shard_col, "_blk"])
        .withColumn("cum", (F.col("_offset") + F.col("cum_local")).cast("long"))
        .drop("_blk", "cum_local", "_offset")
    )
    return _spans_from_cum(cum, token_col, budget, shard_col, id_col)


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunking — the context-window splitter
    every RAG-ingest / pretraining pipeline runs between cleaning and
    embedding: document d with n tokens becomes chunks
    [i*stride, min(i*stride + chunk_size, n)) for i in 0..n_chunks-1,
    n_chunks = 1 + ceil(max(n - chunk_size, 0) / stride) — every token
    is covered (stride <= chunk_size) and consecutive chunks share
    chunk_size - stride tokens of context. Emits (doc_id, chunk_id,
    tok_lo, tok_hi, n_chunk_tokens, chunk_hash) with chunk_hash =
    md5(space-joined chunk tokens) so downstream chunk-level dedup can
    run without re-materializing text. Zero-token docs drop (nothing
    to chunk); the half-open [tok_lo, tok_hi) mirrors pack_sequences.

    Scale shape (100 TB): pure per-row compute fused into the scan — no
    shuffle, no window. The token array materializes ONCE through a
    select boundary before the per-chunk slice/hash expressions (the
    positional-grams lesson: inlining the split into each chunk's
    expression re-tokenizes per chunk). Unlike pack_sequences this
    needs no cross-document token offsets, so there is no prefix-sum
    stage and no partition-boundary discipline at all — chunking is
    embarrassingly parallel.
    """
    from .text import tokens_expr  # local import to avoid module cycle

    cs, st = F.lit(chunk_size), F.lit(stride)
    sized = (
        docs.select(F.col(id_col), tokens_expr(F.col(text_col)).alias("_toks"))
        .select(id_col, "_toks", F.size("_toks").cast("long").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    # integer ceil-div via (x + st - 1) div st: both engines' integer
    # division (Spark `div`, DuckDB `//`), no float boundary.
    n_chunks = F.lit(1) + F.expr(
        f"(greatest(n_tokens - {chunk_size}, 0) + {stride - 1}) div {stride}"
    )
    chunks = sized.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
    )
    tok_lo = F.col("chunk_id").cast("long") * st
    tok_hi = F.least(tok_lo + cs, F.col("n_tokens"))
    return chunks.select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        tok_lo.cast("bigint").alias("tok_lo"),
        tok_hi.cast("bigint").alias("tok_hi"),
        (tok_hi - tok_lo).cast("bigint").alias("n_chunk_tokens"),
        F.md5(
            F.concat_ws(" ", F.slice(F.col("_toks"), (tok_lo + 1).cast("int"), (tok_hi - tok_lo).cast("int")))
        ).alias("chunk_hash"),
    )


def stratified_sample(
    docs: DataFrame,
    frac: float = 0.1,
    strata: tuple[str, ...] = ("lang", "source"),
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic exact-fraction stratified sample: every stratum
    keeps its ceil(frac * n) lowest documents by hash60(id) — the
    sampling step of a curation pipeline when the language/source mix
    must be PRESERVED (plain Bernoulli sampling drifts small strata;
    temperature_sample deliberately reshapes the mix instead).

    Cross-engine: ranking is by the shared md5-derived hash60 primitive
    with an id tie-break, and the keep threshold ceil(frac * n) is the
    same IEEE double product in Spark and DuckDB PROVIDED the oracle
    casts the fraction literal to DOUBLE — a bare SQL literal like 0.1
    parses as exact DECIMAL in DuckDB, whose product can ceil one off
    from the double product for some (frac, n). No RNG, no float
    comparisons between engine-specific streams.

    Scale shape (100 TB): one window over (strata) — each stratum is a
    single shuffle partition, which holds exactly while strata are
    language x source slices (thousands of strata, each far below a
    task); a pathological mega-stratum would sub-shard on a salt with
    per-shard quotas, same discipline as pack_sequences (SCALE.md).
    """
    w = Window.partitionBy(*strata).orderBy(
        hash60_expr(F.col(id_col).cast("string")), id_col
    )
    wc = Window.partitionBy(*strata)
    ranked = docs.select(
        id_col,
        *strata,
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_stratum"),
    )
    return (
        ranked.filter(
            F.col("rn")
            <= F.ceil(F.lit(float(frac)) * F.col("n_stratum")).cast("bigint")
        )
        .select(
            id_col,
            *strata,
            F.col("rn").cast("bigint").alias("rn"),
            F.col("n_stratum").cast("bigint").alias("n_stratum"),
        )
        .orderBy(*strata, "rn")
    )


def pps_systematic_sample(
    docs: DataFrame,
    n: int,
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    block_size: int = 1 << 20,
) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling (Madow's
    method): walk the corpus token stream in ``id_col`` order and pick
    the document under every (total/n)-th token — each doc's expected
    sample count is exactly n * w_d / total, the design every
    PPS-sampled eval/calibration subset wants, with ZERO randomness
    (the deterministic skip interval replaces the usual random start,
    the same determinism trade temperature_sample makes).

    Emits the selected docs with ``multiplicity`` = how many stream
    strata land inside the doc's token span (a doc longer than
    total/n tokens is drawn more than once — sampling WITH
    multiplicity, the with-replacement analogue); sum(multiplicity)
    is exactly n by telescoping. Zero/NULL-weight docs can never be
    selected (their cumulative span is empty).

    Exactness: the token stream positions are exact BIGINT prefix sums
    and the stratum index of position c is the integer division
    (c * n) div total — no float boundary anywhere in the operator.
    Range bound (the ks_num discipline): c * n must fit in int64, i.e.
    total_tokens < 2^63 / n (~3.7e15 tokens at n=50 — multiple PB of
    text); past that the two products go DECIMAL(38,0) with the same
    div, nothing else changes.

    Scale shape (100 TB): the global cumsum uses the SAME two-phase
    distributed prefix sum as pack_sequences_sharded — contiguous
    id blocks (bounded window partitions), per-block totals (tiny),
    an exclusive prefix over the totals broadcast back as offsets —
    so no single-task window exists at any corpus size; the 1-row
    grand total broadcasts into the per-row stratum arithmetic."""
    live = docs.filter(F.col(weight_col) > 0).withColumn(
        "_blk", F.expr(f"{id_col} div {int(block_size)}").cast("long")
    )
    w_local = (
        Window.partitionBy("_blk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = live.withColumn(
        "cum_local", F.sum(weight_col).over(w_local).cast("long")
    )
    totals = live.groupBy("_blk").agg(
        F.sum(weight_col).cast("long").alias("_blk_total")
    )
    w_prefix = Window.orderBy("_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_blk",
        F.coalesce(F.sum("_blk_total").over(w_prefix), F.lit(0))
        .cast("long")
        .alias("_offset"),
    )
    grand = totals.agg(F.sum("_blk_total").cast("long").alias("_total"))
    cum = (
        local.join(F.broadcast(offsets), "_blk")
        .withColumn("cum", (F.col("_offset") + F.col("cum_local")).cast("long"))
        .crossJoin(F.broadcast(grand))
    )
    hi = F.expr(f"cum * {int(n)} div _total")
    lo = F.expr(f"(cum - {weight_col}) * {int(n)} div _total")
    return (
        cum.withColumn("multiplicity", (hi - lo).cast("long"))
        .filter(F.col("multiplicity") >= 1)
        .drop("_blk", "cum_local", "_offset", "_total")
        .withColumnRenamed("cum", "cum_tokens")
    )
