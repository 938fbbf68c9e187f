"""Round-6f corpus-analysis queries (registered after lifecycle_queries).

The text family (operators/text.py) covers per-document signals —
token counts, quality, language ID, repetition, PII — and
extension_queries covers corpus heavy-hitters. This module adds the
three corpus-level *term statistics* stages an LLM-data pipeline runs
between cleaning and training:

- text_tfidf_topterms  : per-document top-3 distinctive terms by
                         TF-IDF (rational smoothed IDF — log-free so
                         the score is bit-identical across engines)
- text_bpe_pair_merge  : the first byte-pair-encoding merge round —
                         corpus-weighted adjacent character-pair
                         frequencies over the word-frequency table
- text_corpus_contrast : smoothed relative-frequency ratio of terms in
                         the English slice vs the rest (the keyword /
                         domain-drift contrast every corpus mix audit
                         needs)

plus the BI reshape pair (bi_revenue_pivot_priority_year — explicit-
values pivot cross-tab; bi_revenue_cube_status_year — CUBE with
grouping_id over a pre-collapsed aggregate) and the string-edit-
distance dedup member (dedup_fuzzy_name_pairs — SymSpell deletion-
neighborhood blocking + levenshtein verify).

Window note: text_tfidf_topterms and text_bpe_pair_merge rotate INTO
the driver's first-50 correctness window this round;
text_corpus_contrast, bi_revenue_pivot_priority_year,
bi_revenue_cube_status_year, and dedup_fuzzy_name_pairs register past
it (r5-extras precedent: gate-replica verified now, rotate in next
round). See __spark_entry__._PAST_WINDOW and COVERAGE.md.

Numeric discipline (see REQUIREMENTS.md): scores use only +,*,/ over
doubles — IEEE-correctly-rounded and therefore bit-identical in Spark
and DuckDB when written in the same association order; no ln/exp libm
calls whose last ulp differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import revenue_expr, sum_money
from ..operators.text import lower_terms
from ..sources.tables import load_table
from .registry import query
from .text_queries import _SQL_TOKS

_TFIDF_TOP = 3


@query(
    "text_tfidf_topterms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lower(unnest({_SQL_TOKS})) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             (CAST(tf.tf AS DOUBLE) * CAST(n.n_docs + 1 AS DOUBLE))
               / CAST(df.df + 1 AS DOUBLE) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      FROM scored
    )
    SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tf, df, tfidf
    FROM ranked WHERE rnk <= {_TFIDF_TOP}
    ORDER BY doc_id, rnk
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinctive terms per document by TF-IDF — the classic
    keyword-extraction / relevance-weighting stage (reference scope:
    document fingerprinting + quality scoring family).

    IDF is the smoothed RATIONAL form (N+1)/(df+1) rather than
    ln((N+1)/(df+1))+1: monotone-identical ranking, but the score stays
    inside IEEE +,*,/ so the hash-compared doubles are bit-identical in
    Spark and DuckDB (ln's last ulp is libm-dependent — the same reason
    the quality classifier uses an algebraic sigmoid).

    Scale shape (the standard distributed TF-IDF plan):
    - explode -> groupBy(doc_id, term): map-side partial aggregation,
      shuffle carries one row per distinct (doc, term);
    - df derives from the tf TABLE (groupBy term — vocabulary-sized,
      never re-reads the corpus);
    - tf⋈df is a shuffle equi-join on term (vocabulary can be billions
      of rows at web scale — NOT broadcast; AQE is free to downgrade);
    - the single-row corpus count IS broadcast;
    - per-doc top-3 is row_number over a doc_id-partitioned window —
      co-partitioned with tf's grouping key, so the plan reuses the
      existing hash partitioning (plan shows WindowGroupLimit + Sort
      with NO exchange between the join and the window).
    Ties break on term text so the cut is deterministic.

    Known tradeoff (same call as dedup_minhash_lsh's verification
    join): the df branch re-derives tf from its own corpus scan, so
    the corpus is tokenized twice rather than holding an unmanaged
    (doc,term)-sized cache; callers embedding this in a multi-consumer
    pipeline should persist tf in scope and unpersist after."""
    docs = load_table(spark, sf_dir, "documents")
    tall = lower_terms(docs)
    tf = tall.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf").cast("double") * (F.col("n_docs") + F.lit(1)).cast("double"))
            / (F.col("df") + F.lit(1)).cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _TFIDF_TOP)
        .select("doc_id", "rnk", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", "rnk")
    )


@query(
    "text_bpe_pair_merge",
    oracle=f"""
    WITH toks AS (
      SELECT lower(unnest({_SQL_TOKS})) AS word FROM documents
    ),
    wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS word_freq
           FROM toks GROUP BY 1),
    pairs AS (
      SELECT word, word_freq,
             unnest(list_transform(
               generate_series(1, CAST(length(word) AS INTEGER) - 1),
               i -> substr(word, i, 2))) AS pair
      FROM wf
    )
    SELECT pair,
           CAST(SUM(word_freq) AS BIGINT) AS pair_count,
           CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
    FROM pairs GROUP BY 1
    ORDER BY pair_count DESC, pair
    LIMIT 20
    """,
)
def text_bpe_pair_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First byte-pair-encoding merge round: the 20 most frequent
    adjacent character pairs across the corpus, weighted by word
    frequency — exactly the statistic a BPE tokenizer trainer computes
    to pick its next merge (Sennrich et al. 2016, public algorithm).

    Scale shape — the classic BPE trainer trick, distributed: pair
    expansion runs over the WORD-FREQUENCY table, not the corpus. The
    explode->groupBy(word) first stage collapses the corpus to its
    vocabulary with map-side combine (the same heavy-hitter shuffle
    shape as text_top_tokens), then per distinct word a
    transform(sequence) expression emits its length-1 adjacent pairs —
    all JVM-side codegen, zero Python. The final groupBy(pair) shuffle
    is bounded by |vocab| * avg_word_len, independent of corpus row
    count; the top-20 plans as TakeOrderedAndProject. Integer counts
    only — nothing float-hash-fragile.

    Words shorter than 2 chars emit no pairs: the Spark guard is
    explicit (when length>=2) because sequence(1, 0) would yield a
    DESCENDING [1,0] in Spark while generate_series(1, 0) is empty in
    DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        lower_terms(docs)
        .groupBy(F.col("term").alias("word"))
        .agg(F.count(F.lit(1)).alias("word_freq"))
    )
    pair_arr = F.when(
        F.length("word") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("word") - 1),
            lambda i: F.col("word").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select("word", "word_freq", F.explode(pair_arr).alias("pair"))
        .groupBy("pair")
        .agg(
            F.sum("word_freq").alias("pair_count"),
            F.count_distinct("word").alias("n_words"),
        )
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(20)
    )


@query(
    "text_corpus_contrast",
    oracle=f"""
    WITH toks AS (
      SELECT lang, lower(unnest({_SQL_TOKS})) AS term FROM documents
    ),
    counts AS (
      SELECT term,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en,
             CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
               AS n_rest
      FROM toks GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_en) AS BIGINT) AS tot_en,
             CAST(SUM(n_rest) AS BIGINT) AS tot_rest
      FROM counts
    )
    SELECT term, n_en, n_rest,
           ((CAST(n_en AS DOUBLE) + 0.5) * (CAST(tot_rest AS DOUBLE) + 0.5))
             / ((CAST(n_rest AS DOUBLE) + 0.5) * (CAST(tot_en AS DOUBLE) + 0.5))
             AS en_ratio
    FROM counts CROSS JOIN tot
    WHERE n_en + n_rest >= 10
    ORDER BY en_ratio DESC, term
    LIMIT 15
    """,
)
def text_corpus_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-slice contrast: the 15 terms most distinctive of the
    English slice vs the rest of the corpus, by add-half smoothed
    relative-frequency ratio — the keyword-contrast / domain-drift
    audit run when deciding a corpus mix (which terms does slice A
    over-represent?).

    The statistic is the smoothed rate ratio
    ((a+.5)/(A+.5)) / ((b+.5)/(B+.5)), algebraically rearranged to
    ((a+.5)*(B+.5)) / ((b+.5)*(A+.5)) so both engines evaluate the
    identical +,*,/ sequence (bit-identical doubles; a log-likelihood
    form would rank similarly but pull in libm ln). Min-support
    n_en+n_rest >= 10 keeps one-off typos out of the ratio tail.

    Scale shape: one explode -> groupBy(term) with conditional partial
    sums (single corpus-token shuffle, vocabulary-sized output); slice
    totals LOGICALLY re-aggregate the counts table into one broadcast
    row — but without a cache Spark recomputes that subtree, so the
    plan scans the corpus twice (same documented
    no-unmanaged-cache tradeoff as text_tfidf_topterms's df branch;
    a pipeline embedding this persists counts in scope instead);
    top-15 is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    tall = lower_terms(docs, "lang")
    counts = tall.groupBy("term").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("n_en"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1))
        .cast("bigint")
        .alias("n_rest"),
    )
    tot = counts.agg(
        F.sum("n_en").cast("bigint").alias("tot_en"),
        F.sum("n_rest").cast("bigint").alias("tot_rest"),
    )
    ratio = (
        (F.col("n_en").cast("double") + F.lit(0.5))
        * (F.col("tot_rest").cast("double") + F.lit(0.5))
    ) / (
        (F.col("n_rest").cast("double") + F.lit(0.5))
        * (F.col("tot_en").cast("double") + F.lit(0.5))
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter((F.col("n_en") + F.col("n_rest")) >= 10)
        .select("term", "n_en", "n_rest", ratio.alias("en_ratio"))
        .orderBy(F.desc("en_ratio"), F.asc("term"))
        .limit(15)
    )


_PIVOT_YEARS = list(range(1995, 2002))  # testdata o_orderdate span


@query(
    "bi_revenue_pivot_priority_year",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           {cols}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY 1
    """.format(
        cols=",\n           ".join(
            "CAST(SUM(CASE WHEN year(o.o_orderdate) = {y} THEN "
            "CAST(l_extendedprice AS DECIMAL(12,2)) * "
            "(CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) "
            "END) AS DOUBLE) AS y{y}".format(y=y)
            for y in _PIVOT_YEARS
        )
    ),
)
def bi_revenue_pivot_priority_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BI cross-tab: revenue by order priority (rows) x order year
    (columns) via DataFrame ``pivot`` — the report-matrix operator every
    BI surface ships (the reference's dashboard visuals are pivots of
    the gold fact by date/product axes).

    The pivot VALUES are declared explicitly (1995-2001, the testdata
    date span): with an explicit list Spark plans a single-pass
    conditional aggregation (PivotFirst / one HashAggregate over
    fact rows — exactly the CASE-WHEN matrix the oracle spells out)
    and the output schema is static; omitting the list would add an
    eager distinct-scan job to discover values, an anti-pattern at
    100 TB. Revenue stays exact-decimal until the final double cast
    (functions/money.py discipline); year-x-priority cells absent from
    the data yield NULL in both engines.

    The inverse reshape (unpivot/melt back to long form) is pinned
    lossless in tests/test_analysis_queries.py — Spark's unpivot
    compiles to an Expand, no shuffle."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").alias("o_year"),
        revenue_expr().alias("rev"),
    )
    pivoted = (
        joined.groupBy("priority")
        .pivot("o_year", _PIVOT_YEARS)
        .agg(F.sum("rev"))
    )
    return pivoted.select(
        "priority",
        *[F.col(str(y)).cast("double").alias(f"y{y}") for y in _PIVOT_YEARS],
    ).orderBy("priority")


@query(
    "dedup_fuzzy_name_pairs",
    oracle="""
    WITH names AS (
      SELECT lower(trim(c_name)) AS name,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer WHERE c_name IS NOT NULL GROUP BY 1
    ),
    keys AS (
      SELECT name, cnt,
             unnest(list_transform(
               generate_series(0, CAST(length(name) AS INTEGER)),
               i -> CASE WHEN i = 0 THEN name
                    ELSE substr(name, 1, i - 1)
                         || substr(name, i + 1, length(name) - i) END
             )) AS delkey
      FROM names
    ),
    cand AS (
      SELECT DISTINCT a.name AS na, a.cnt AS ca, b.name AS nb, b.cnt AS cb
      FROM keys a JOIN keys b ON a.delkey = b.delkey AND a.name < b.name
    ),
    cross_name AS (
      SELECT CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS cand_pairs,
             CAST(COALESCE(SUM(CASE WHEN levenshtein(na, nb) <= 1
                                THEN ca * cb ELSE 0 END), 0)
                  AS BIGINT) AS dup_pairs
      FROM cand
    ),
    within_name AS (
      SELECT CAST(COALESCE(SUM(cnt * (cnt - 1) // 2), 0) AS BIGINT) AS pairs,
             CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_rows
      FROM names
    )
    SELECT w.n_rows AS n_names,
           c.cand_pairs + w.pairs AS n_candidate_pairs,
           c.dup_pairs + w.pairs AS n_dup_pairs
    FROM cross_name c CROSS JOIN within_name w
    """,
)
def dedup_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity-duplicate audit: customer PAIRS whose names are
    within edit distance 1, found WITHOUT any all-pairs comparison —
    SymSpell-style deletion-neighborhood blocking (Garbe's public
    algorithm): every name emits itself plus its length-L
    one-char-deletion variants (L+1 keys); two names within Levenshtein
    distance 1 necessarily share at least one key, so candidates come
    from a plain equi-join on the deletion key and only candidates pay
    the exact levenshtein() verify. The string-edit-distance member of
    the dedup family (token n-grams, MinHash, SimHash, embeddings
    cover the other similarity axes).

    Scale shape — the standard SymSpell-at-scale form: the corpus
    FIRST collapses to DISTINCT names with multiplicities (one
    map-side-combined groupBy), the deletion-key self-join runs over
    distinct names only, and row-level pair counts are recovered
    arithmetically (ca*cb across a cross-name candidate, C(c,2) within
    an exact-duplicate name). Exact duplicates — the norm in real
    entity data — therefore NEVER enter the join: a name shared by D
    customers costs one row, not Theta(D^2) join output. Key buckets
    are bounded by the distinct-name neighborhood density, and the
    DISTINCT collapses multi-key candidate duplicates before the
    verify. Output is a single audit row over customer pairs (counts
    include same-name pairs, lev=0), so the hash check pins blocking
    recall, candidate dedup, multiplicity algebra, and the verify
    threshold. Spark and DuckDB both implement classic Levenshtein.

    Known tradeoff (the tfidf/minhash precedent): the distinct-name
    aggregate is re-derived by each of its three consumers (both join
    sides and the within-name totals) rather than held in an unmanaged
    cache — at sf0.1 that re-derivation costs ~2x the old row-level
    plan's wall time, the price of removing the Theta(D^2) duplicate-
    name blowup; an orchestrated pipeline persists `names` in scope."""
    customer = load_table(spark, sf_dir, "customer")
    names = (
        customer.filter(F.col("c_name").isNotNull())
        .select(F.lower(F.trim("c_name")).alias("name"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    delkeys = F.transform(
        F.sequence(F.lit(0), F.length("name")),
        lambda i: F.when(i == 0, F.col("name")).otherwise(
            F.concat(
                F.col("name").substr(F.lit(1), i - 1),
                F.col("name").substr(i + 1, F.length("name") - i),
            )
        ),
    )
    keys = names.select("name", "cnt", F.explode(delkeys).alias("delkey"))
    a = keys.alias("a")
    b = keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.delkey") == F.col("b.delkey"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("na"),
            F.col("a.cnt").alias("ca"),
            F.col("b.name").alias("nb"),
            F.col("b.cnt").alias("cb"),
        )
        .distinct()
    )
    # coalesce: SUM over ZERO rows is NULL in both engines, but "no
    # candidates" means 0 pairs (caught by the hypothesis
    # blocking-completeness property)
    cross_name = cand.agg(
        F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0))
        .cast("bigint")
        .alias("cand_pairs"),
        F.coalesce(
            F.sum(
                F.when(
                    F.levenshtein("na", "nb") <= 1, F.col("ca") * F.col("cb")
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("dup_pairs"),
    )
    # integer DIV keeps the pair count exact BIGINT end-to-end (a double
    # /2 would break sum exactness past 2^53 pairs — money.py discipline)
    within_name = names.agg(
        F.coalesce(
            F.sum(F.expr("(cnt * (cnt - 1)) div 2")).cast("bigint"),
            F.lit(0),
        ).alias("pairs"),
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_rows"),
    )
    return cross_name.crossJoin(F.broadcast(within_name)).select(
        F.col("n_rows").alias("n_names"),
        (F.col("cand_pairs") + F.col("pairs")).alias("n_candidate_pairs"),
        (F.col("dup_pairs") + F.col("pairs")).alias("n_dup_pairs"),
    )


@query(
    "bi_revenue_cube_status_year",
    oracle="""
    WITH yearly AS (
      SELECT o.o_orderstatus AS status,
             CAST(year(o.o_orderdate) AS INTEGER) AS year,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
               AS _rev
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    )
    SELECT status, year,
           CAST(GROUPING(status) * 2 + GROUPING(year) AS BIGINT) AS gid,
           CAST(SUM(_rev) AS DOUBLE) AS revenue
    FROM yearly
    GROUP BY CUBE(status, year)
    ORDER BY gid, status, year
    """,
)
def bi_revenue_cube_status_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(status, year) with grouping_id: every subtotal plane of the
    status x year matrix in one pass — detail cells, per-status and
    per-year margins, grand total — the dashboard subtotal companion of
    agg_rollup_year_month (gid disambiguates a NULL group key from a
    subtotal row, the standard CUBE-consumer discipline).

    Same two-phase shape as the rollup: a plain groupBy collapses the
    fact join to the ~|status|x|years| aggregate FIRST, so the CUBE's
    Expand (4 copies per input row — 2^k for k cube columns) runs over
    dozens of rows, not the 100 TB fact. Decimal sums are associative,
    so the sum-of-partials is exactly the one-pass value. Spark and
    DuckDB agree on grouping(): 1 when the column is aggregated away,
    0 when grouped."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    yearly = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.year("o_orderdate").cast("int").alias("year"),
        )
        .agg(F.sum(revenue_expr()).alias("_rev"))
    )
    return (
        yearly.cube("status", "year")
        .agg(
            (F.grouping("status") * 2 + F.grouping("year"))
            .cast("bigint")
            .alias("gid"),
            sum_money(F.col("_rev"), "revenue"),
        )
        .select("status", "year", "gid", "revenue")
        .orderBy("gid", "status", "year")
    )
