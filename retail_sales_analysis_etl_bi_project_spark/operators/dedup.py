"""Deduplication over the documents table (north-star extension,
BASELINE.json): exact, fingerprint, n-gram Jaccard, MinHash+LSH, SimHash,
and embedding-cosine near-dup.

Design for 100 TB:
- exact/fingerprint dedup is a hash groupBy — one shuffle on a 32-char
  key, partial aggregation upstream; this is THE scalable primitive.
- all-pairs similarity is quadratic and only used as the small-scale
  exactness baseline; the scale path is candidate generation by
  bucketing (MinHash bands / SimHash chunks), which turns O(n^2) into a
  shuffle-on-bucket-key equi-join + per-bucket verification.
- everything is built-in expressions (xxhash64, md5, array HOFs) — no
  Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint_expr, normalized_text_expr, tokens_expr


# ---------------------------------------------------------------- exact

def exact_dup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups: hash-groupBy on md5(text). Returns one row
    per distinct text with the representative (min id) and multiplicity.
    The md5 digest (32 bytes) is grouped instead of the full text so the
    shuffle moves fixed-size keys, not documents."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def fingerprint_dup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-exact dedup: identical after normalization (case/punct/ws
    folding). Same shuffle shape as exact_dup_groups."""
    return (
        docs.groupBy(fingerprint_expr(F.col(text_col)).alias("fingerprint"))
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# ------------------------------------------------------- n-gram jaccard

def shingles_expr(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string>; documents shorter
    than n words get their full token join as a single shingle."""
    toks = tokens_expr(text)
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(grams)


def jaccard_expr(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays (set semantics)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_mod: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard >= threshold.

    All-pairs is the exactness baseline (quadratic — small corpora /
    verification only; at scale use minhash_candidate_pairs to generate
    candidates first). ``query_mod`` restricts the left side to
    ``id % query_mod == 0`` — the 'dedup a sample against the corpus'
    shape."""
    a = docs.select(
        F.col(id_col).alias("doc_a"), shingles_expr(F.col(text_col), n).alias("sh_a")
    )
    b = docs.select(
        F.col(id_col).alias("doc_b"), shingles_expr(F.col(text_col), n).alias("sh_b")
    )
    if query_mod:
        a = a.filter(F.col("doc_a") % query_mod == 0)
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            jaccard_expr(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------- minhash + lsh

def minhash_signature_expr(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature as a single expression: per hash function i, min
    over shingles of xxhash64(i, shingle).

    NOTE: expression form only — every one of the num_hashes array_min
    terms re-evaluates the ``shingles`` subtree, so on real data use
    minhash_signatures() (explode + grouped partial mins), which computes
    shingles once. Kept for tiny inputs and as the semantic spec.

    Closures are built via a factory — a `lambda s, i=i:` default arg
    changes the lambda's arity and PySpark binds the extra parameter to
    the array-index lambda variable instead of the captured value."""

    def seeded(i: int):
        return lambda s: F.xxhash64(F.lit(i), s)

    sigs = [
        F.array_min(F.transform(shingles, seeded(i))) for i in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signatures, scalable form: explode shingles to a tall
    (doc, shingle) relation — shingle construction happens ONCE — then
    num_hashes grouped MINs. Each min is a partial+final HashAggregate,
    so the shuffle carries one 64-long signature row per doc regardless
    of document size. Returns (doc_id_, sig array<bigint>).

    The input is repartitioned by id first: document corpora often
    arrive as few large files, and the explode + 64 hashes/row is the
    compute-heavy phase — it must run at full cluster parallelism, not
    at input-file granularity."""
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    tall = docs.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col).alias("doc_id_"),
        F.explode(shingles_expr(F.col(text_col), n)).alias("shingle"),
    )
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return (
        tall.groupBy("doc_id_")
        .agg(*mins)
        .select("doc_id_", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))
    )


def minhash_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` rows of
    ``num_hashes/bands`` values, hash each band, and emit pairs of docs
    sharing any band bucket. This is the scale path: candidates come from
    a groupBy on (band_idx, band_hash) — a single shuffle — instead of a
    cross join. Pairs with estimated similarity via signature agreement."""
    rows_per_band = num_hashes // bands
    # The signature relation is reused by the band explode and twice by
    # the estimate join. No .cache(): the builder contract returns lazy
    # plans (nobody could unpersist), and Spark's ReuseExchange / AQE
    # stage reuse shares the expensive groupBy exchange of
    # minhash_signatures across all three references — only the cheap
    # final merge re-runs. (An unmanaged cache here leaked storage
    # memory across the 28-query bench session in round 1.)
    with_sig = minhash_signatures(docs, num_hashes, n, text_col, id_col)

    band_cols = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.xxhash64(
                    *[F.element_at("sig", i * rows_per_band + j + 1) for j in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for i in range(bands)
        ]
    )
    # band rows carry only (id, band_idx, band_hash) — never the 64-long
    # signature — so the exploded shuffle moves 3 fixed-size values/row
    banded = with_sig.select("doc_id_", F.explode(band_cols).alias("band")).select(
        "doc_id_", "band.band_idx", "band.band_hash"
    )

    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id_") < F.col("b.doc_id_")),
        )
        .select(
            F.col("a.doc_id_").alias("doc_a"),
            F.col("b.doc_id_").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # signature-agreement estimate, joined onto the (small) candidate set
    sig_a = with_sig.select(F.col("doc_id_").alias("doc_a"), F.col("sig").alias("sig_a"))
    sig_b = with_sig.select(F.col("doc_id_").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
        ).cast("double")
        / F.lit(float(num_hashes))
    )
    return (
        cand.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full MinHash-LSH dedup: candidates from banding, then exact
    n-gram-Jaccard verification of ONLY the candidates (the classic
    two-phase scheme — verification cost is proportional to candidate
    count, not corpus^2)."""
    cand = minhash_candidate_pairs(docs, num_hashes, bands, n, text_col, id_col)
    # shingle arrays appear on both sides of the verification join; the
    # projection is a cheap scan-fused transform, so recomputing twice
    # beats an unmanaged .cache() that would leak in a lazy-builder
    # session (round-1 bench leak). The two join exchanges hash the same
    # underlying column, so ReuseExchange shares the shuffle.
    sh = docs.select(
        F.col(id_col).alias("did"), shingles_expr(F.col(text_col), n).alias("sh")
    )
    return (
        cand.join(sh.select(F.col("did").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("did").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .select("doc_a", "doc_b", jaccard_expr(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------- simhash

def simhash_expr(text: Column | str, bits: int = 64) -> Column:
    """SimHash: per bit position, sum +1/-1 over token hashes; bit is 1
    when the sum is positive. Returns a bigint (bit 63 = sign bit, used
    as a plain bit pattern). Tokens hashed with xxhash64 (JVM-side,
    deterministic)."""
    assert bits <= 64
    toks = tokens_expr(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def voter(b: int):
        # factory, not default-arg capture — see minhash_signature_expr
        return lambda s, h: s + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    acc = F.lit(0).cast("bigint")
    for b in range(bits):
        vote = F.aggregate(hashes, F.lit(0).cast("bigint"), voter(b))
        # shiftleft, not lit(2**b): 2**63 overflows a signed long
        acc = acc + F.when(
            vote > 0, F.shiftleft(F.lit(1).cast("bigint"), b)
        ).otherwise(0)
    return acc


def hamming_expr(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_signatures(
    docs: DataFrame,
    bits: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash, scalable form (same explode-then-aggregate shape as
    minhash_signatures): tokenize once into a tall relation, hash each
    token once, then ``bits`` grouped +1/-1 SUM votes — all partial-
    aggregated before the shuffle. Returns (doc_id_, sh bigint).
    Docs with no tokens produce no row (nothing to hash).
    Repartitioned by id for the same reason as minhash_signatures."""
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    tall = docs.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col).alias("doc_id_"),
        F.explode(tokens_expr(F.col(text_col))).alias("tok"),
    ).select("doc_id_", F.xxhash64("tok").alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tall.groupBy("doc_id_").agg(*votes)
    sim = F.lit(0).cast("bigint")
    for b in range(bits):
        sim = sim + F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("bigint"), b)
        ).otherwise(0)
    return agg.select("doc_id_", sim.alias("sh"))


def simhash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bits: int = 64,
    chunks: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup: candidates share at least one of ``chunks``
    bit-chunks (pigeonhole: any pair within max_hamming < chunks*1 per
    chunk must agree on some chunk when max_hamming < chunks), then exact
    Hamming verification. Bucketed join — same scale shape as MinHash."""
    chunk_bits = bits // chunks
    mask = (1 << chunk_bits) - 1
    sh = simhash_signatures(docs, bits, text_col, id_col).withColumnRenamed(
        "doc_id_", "did"
    )
    chunk_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_idx"),
                F.shiftright("sh", i * chunk_bits).bitwiseAND(F.lit(mask)).alias("chunk_val"),
            )
            for i in range(chunks)
        ]
    )
    chunked = sh.select("did", "sh", F.explode(chunk_arr).alias("c")).select(
        "did", "sh", "c.chunk_idx", "c.chunk_val"
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(
            F.col("a.did").alias("doc_a"),
            F.col("b.did").alias("doc_b"),
            hamming_expr(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


# ----------------------------------------------------- embedding near-dup

def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup: pairs above a cosine threshold. Exact
    all-pairs baseline (use LSH buckets from operators.similarity for the
    scale path). ``query_mod`` samples the left side as in
    ngram_jaccard_pairs."""
    from .similarity import cosine_expr

    a = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea"))
    b = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb"))
    if query_mod:
        a = a.filter(F.col("vec_a") % query_mod == 0)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", cosine_expr(F.col("ea"), F.col("eb")).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )
