"""Round-12d model-evaluation and design-based-sampling queries
(registered PAST the driver window per the r6f/r11b/r12b/r12c
precedent: gate-replica verified at sf0.001+sf0.01+sf0.1 this round,
rotate into the driver window next round — see
__spark_entry__._PAST_WINDOW).

Three mechanisms the surface still lacked — the EVALUATION side of the
models the engine already trains, plus the sampling design every
eval/calibration subset is drawn with:

- text_domain_prototype_classifier : nearest-prototype (Rocchio-style)
        source classification with a full confusion matrix — each
        source's prototype is its top-K document-frequency terms, each
        doc is assigned to the prototype with the highest exact
        set-Jaccard to its distinct-term set. The engine's first
        CLASSIFIER EVAL artifact (the quality classifier scores docs;
        this one is judged against labels).
- events_markov_eval : top-1 next-event accuracy of the Markov
        transition model on a held-out split — the engine already
        fits transition counts (events_markov_transitions); this
        closes the train→predict→score loop with a deterministic
        80/20 event-id split and per-state accuracy.
- corpus_pps_systematic_sample : probability-proportional-to-size
        systematic (Madow) sampling by token weight — the design-based
        sampler behind every token-weighted eval subset, computed with
        ZERO floats (exact prefix sums, integer-division strata) via
        the two-phase distributed prefix sum.

Numeric discipline (REQUIREMENTS.md): every count is an exact BIGINT;
the only doubles are (a) ONE final accuracy division of identical
integer casts and (b) the classifier's ranking score — a single IEEE
division of exact integers whose ORDER (not value) feeds a
deterministically tie-broken row_number, and which never appears in
the output. The PPS sampler has no float anywhere.

Reference scope: the reference has no model-evaluation surface (its
analytics stop at groupBy aggregates, /root/reference/etl/etl.py:
220-306); this module is part of the LLM-data-pipeline extension
(classifier QA, sequence-model QA, eval-subset sampling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.curation import pps_systematic_sample
from ..operators.text import token_count_expr
from ..sources.tables import load_table
from .analysis_queries import _shared_tf
from .registry import query
from .text_queries import _SQL_TOKS

# Prototype size: top-K per-source terms by document frequency. Small
# enough that every prototype is a broadcast relation at any corpus
# size, large enough to separate the synthetic sources.
_PROTO_K = 25


@query(
    "text_domain_prototype_classifier",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lower(unnest({_SQL_TOKS})) AS term FROM documents
    ),
    tf AS (SELECT DISTINCT doc_id, term FROM toks),
    src AS (SELECT doc_id, source FROM documents),
    sdf AS (
      SELECT s.source, t.term, CAST(count(*) AS BIGINT) AS df
      FROM tf t JOIN src s USING (doc_id) GROUP BY 1, 2
    ),
    proto AS (
      SELECT source, term FROM (
        SELECT source, term,
               row_number() OVER (
                 PARTITION BY source ORDER BY df DESC, term) AS rn
        FROM sdf) WHERE rn <= {_PROTO_K}
    ),
    psize AS (
      SELECT source, CAST(count(*) AS BIGINT) AS k_s FROM proto GROUP BY 1
    ),
    nd AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms FROM tf GROUP BY 1
    ),
    ov AS (
      SELECT t.doc_id, p.source AS proto_source,
             CAST(count(*) AS BIGINT) AS o
      FROM tf t JOIN proto p USING (term) GROUP BY 1, 2
    ),
    scored AS (
      SELECT ov.doc_id, ov.proto_source,
             CAST(ov.o AS DOUBLE)
               / CAST(nd.n_terms + ps.k_s - ov.o AS DOUBLE) AS jac
      FROM ov
      JOIN nd USING (doc_id)
      JOIN psize ps ON ov.proto_source = ps.source
    ),
    pred AS (
      SELECT doc_id, proto_source FROM (
        SELECT doc_id, proto_source,
               row_number() OVER (
                 PARTITION BY doc_id ORDER BY jac DESC, proto_source) AS rn
        FROM scored) WHERE rn = 1
    )
    SELECT s.source AS true_source,
           COALESCE(p.proto_source, 'none') AS pred_source,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM src s LEFT JOIN pred p USING (doc_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def text_domain_prototype_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nearest-prototype DOMAIN CLASSIFIER with confusion-matrix eval:
    each source's prototype is its top-K terms by per-source document
    frequency (ties → term asc, so the prototype is a deterministic
    SET, not a sample); each doc is assigned to the source whose
    prototype maximizes the exact set-Jaccard
    |terms(d) ∩ proto_s| / |terms(d) ∪ proto_s| with source-name
    tie-break; the output is the (true_source, pred_source, n_docs)
    confusion matrix — the resubstitution-accuracy QA artifact of the
    classic Rocchio/nearest-centroid text classifier (documented: the
    doc's own terms contribute to its own source's df, as in any
    resubstitution eval; a held-out variant only changes the df input).

    Determinism: all set sizes are exact BIGINTs; the Jaccard is one
    IEEE division of identical integers on both engines — used ONLY to
    order a deterministically tie-broken row_number and absent from
    the output, so the hash compares nothing but strings and integers.
    Docs sharing no term with any prototype (e.g. blank text) predict
    the explicit 'none' class via the LEFT join.

    Scale shape (100 TB): terms come from the managed term_tf persist
    (one tokenize for the whole term-stats family); per-source df is
    one map-side-combined groupBy; the prototypes are |sources|·K rows
    — broadcast by construction — so the scoring join is a postings
    lookup (doc-term ⋈ broadcast prototype on term), never a
    doc × source grid; doc sizes and overlaps are map-side-combined
    groupBys at doc grain; the argmax window partitions by doc_id
    (bounded by |sources| rows per doc)."""
    tf = _shared_tf(spark, sf_dir).select("doc_id", "term")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sdf = (
        tf.join(src, "doc_id")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    w_proto = Window.partitionBy("source").orderBy(
        F.col("df").desc(), F.col("term")
    )
    proto = (
        sdf.withColumn("rn", F.row_number().over(w_proto))
        .filter(F.col("rn") <= _PROTO_K)
        .select("source", "term")
    )
    psize = proto.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_s")
    )
    nd = tf.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms")
    )
    ov = (
        tf.join(
            F.broadcast(proto.withColumnRenamed("source", "proto_source")),
            "term",
        )
        .groupBy("doc_id", "proto_source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    scored = (
        ov.join(nd, "doc_id")
        .join(
            F.broadcast(psize.withColumnRenamed("source", "proto_source")),
            "proto_source",
        )
        .withColumn(
            "jac",
            F.col("o").cast("double")
            / (F.col("n_terms") + F.col("k_s") - F.col("o")).cast("double"),
        )
    )
    w_pred = Window.partitionBy("doc_id").orderBy(
        F.col("jac").desc(), F.col("proto_source")
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(w_pred))
        .filter(F.col("rn") == 1)
        .select("doc_id", "proto_source")
    )
    return (
        src.join(pred, "doc_id", "left")
        .select(
            F.col("source").alias("true_source"),
            F.coalesce(F.col("proto_source"), F.lit("none")).alias(
                "pred_source"
            ),
        )
        .groupBy("true_source", "pred_source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_source", "pred_source")
    )


@query(
    "events_markov_eval",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur_type,
             lead(event_type) OVER w AS next_type,
             lead(event_id) OVER w AS next_eid
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tr AS (SELECT * FROM seq WHERE next_type IS NOT NULL),
    counts AS (
      SELECT cur_type, next_type, CAST(count(*) AS BIGINT) AS n
      FROM tr WHERE next_eid % 5 <> 4 GROUP BY 1, 2
    ),
    pred AS (
      SELECT cur_type, next_type AS pred_next FROM (
        SELECT cur_type, next_type,
               row_number() OVER (
                 PARTITION BY cur_type ORDER BY n DESC, next_type) AS rn
        FROM counts) WHERE rn = 1
    )
    SELECT t.cur_type,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN p.pred_next = t.next_type
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN p.pred_next = t.next_type
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS accuracy
    FROM (SELECT cur_type, next_type FROM tr WHERE next_eid % 5 = 4) t
    LEFT JOIN pred p USING (cur_type)
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_markov_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 NEXT-EVENT accuracy of the Markov transition model on a
    held-out split — the evaluation side of events_markov_transitions:
    per-user event sequences (ordered by ts with event_id tie-break)
    yield (cur_type → next_type) transitions; transitions whose NEXT
    event has event_id % 5 == 4 are the 20% test split, the rest
    train; the model predicts argmax_next train-count (ties →
    next_type asc); the output is per-state n_test / n_correct /
    accuracy. A test state unseen in training predicts nothing and
    scores 0 on those rows (the LEFT join's NULL never equals), the
    honest convention.

    Determinism: the split is a pure event-id modulus (no RNG), counts
    are exact BIGINTs, the argmax is a deterministically tie-broken
    row_number over integers, and accuracy is ONE double division of
    identical integer casts.

    Scale shape (100 TB): one user_id-partitioned window builds the
    sequences (user grain — bounded tasks); train counts are a
    map-side-combined groupBy at (state, state) grain — tiny; the
    prediction table is |states| rows, broadcast into the test join;
    the final agg is |states| rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("event_id").over(w).alias("next_eid"),
    ).filter(F.col("next_type").isNotNull())
    counts = (
        seq.filter(F.col("next_eid") % 5 != 4)
        .groupBy("cur_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w_pred = Window.partitionBy("cur_type").orderBy(
        F.col("n").desc(), F.col("next_type")
    )
    pred = (
        counts.withColumn("rn", F.row_number().over(w_pred))
        .filter(F.col("rn") == 1)
        .select("cur_type", F.col("next_type").alias("pred_next"))
    )
    test = seq.filter(F.col("next_eid") % 5 == 4).select(
        "cur_type", "next_type"
    )
    hit = F.when(F.col("pred_next") == F.col("next_type"), 1).otherwise(0)
    return (
        test.join(F.broadcast(pred), "cur_type", "left")
        .groupBy("cur_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(hit).cast("bigint").alias("n_correct"),
        )
        .withColumn(
            "accuracy",
            F.col("n_correct").cast("double") / F.col("n_test").cast("double"),
        )
        .orderBy("cur_type")
    )


# Sample size for the PPS systematic draw: the eval-subset scale knob.
_PPS_N = 50


@query(
    "corpus_pps_systematic_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             COALESCE(CAST(len({_SQL_TOKS}) AS BIGINT), 0) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT)
               AS cum_tokens
      FROM w WHERE n_tokens > 0
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM w)
    SELECT doc_id, source, n_tokens, cum_tokens,
           CAST((cum_tokens * {_PPS_N}) // total
                - ((cum_tokens - n_tokens) * {_PPS_N}) // total
                AS BIGINT) AS multiplicity
    FROM c CROSS JOIN tot
    WHERE (cum_tokens * {_PPS_N}) // total
          - ((cum_tokens - n_tokens) * {_PPS_N}) // total >= 1
    ORDER BY doc_id
    """,
)
def corpus_pps_systematic_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token-weighted PPS SYSTEMATIC sample of the corpus (Madow):
    pick the document under every (total/n)-th token of the doc_id-
    ordered token stream — inclusion expectation exactly n·w_d/total,
    the design every token-weighted eval/calibration subset wants —
    with ``multiplicity`` counting the strata inside each doc's span
    (Σ multiplicity == n by telescoping, pinned in
    tests/test_eval_queries.py). Distinct mechanism from
    corpus_stratified_sample (per-stratum hash quotas) and
    temperature_sample (mix reshaping): this is the DESIGN-BASED
    weighted draw, and it contains zero floats of any kind.

    Scale shape (100 TB): the operator
    (operators/curation.pps_systematic_sample) computes the global
    prefix sum with the pack_sequences_sharded two-phase discipline —
    bounded per-block windows, a tiny block-totals table, offsets
    broadcast back — and the oracle replays the equivalent ONE-WINDOW
    spec (integer sums decompose associatively, the
    corpus_pack_sharded exactness argument). Stratum indices are
    integer divisions (c·n) div total of exact BIGINTs; range bound
    and the DECIMAL(38,0) swap documented on the operator."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.coalesce(token_count_expr("text"), F.lit(0).cast("bigint")).alias(
            "n_tokens"
        ),
    )
    samp = pps_systematic_sample(docs, n=_PPS_N)
    return samp.select(
        "doc_id", "source", "n_tokens", "cum_tokens", "multiplicity"
    ).orderBy("doc_id")
