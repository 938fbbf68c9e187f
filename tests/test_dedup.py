"""Dedup operator tests, including the MinHash-LSH vs exact-Jaccard
recall assertion that stands in for the missing SQL oracle."""

import pytest
from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
    exact_dup_groups,
    fingerprint_dup_groups,
    jaccard_expr,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    shingles_expr,
    simhash_near_dup_pairs,
)
from retail_sales_analysis_etl_bi_project_spark.sources.tables import load_table


def test_exact_dup_groups_counts(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    rows = exact_dup_groups(docs).collect()
    by_rep = {r.representative_id: r.n_dups for r in rows}
    assert by_rep == {1: 2, 3: 1}


def test_fingerprint_dedup_normalizes(spark):
    docs = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello   world"), (3, "HELLO WORLD?")],
        "doc_id long, text string",
    )
    rows = fingerprint_dup_groups(docs).collect()
    assert len(rows) == 1 and rows[0].n_dups == 3


def test_shingles_and_jaccard(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")], "doc_id long, text string"
    )
    sh = docs.select(
        "doc_id", shingles_expr(F.col("text"), 3).alias("sh")
    ).collect()
    assert sorted(sh[0].sh) == ["a b c", "b c d"]
    pairs = ngram_jaccard_pairs(docs, threshold=0.99).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(1, 2)]
    assert pairs[0].jaccard == 1.0


def test_short_doc_shingle_is_whole_text(spark):
    docs = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    sh = docs.select(shingles_expr(F.col("text"), 3).alias("sh")).collect()[0].sh
    assert sh == ["ab cd"]


def test_minhash_recall_vs_exact(spark, sf_dir):
    """The rows-only LSH query is validated here: every exact-Jaccard
    pair >= 0.7 must be found by MinHash-LSH (high-sim pairs are caught
    by 16x4 banding with probability ~1), and everything LSH reports
    passes the same exact verification filter."""
    docs = load_table(spark, sf_dir, "documents")
    exact_hi = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.7).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_dedup_pairs(docs, threshold=0.5).collect()
    }
    assert exact_hi, "fixture should contain planted near-dups"
    missed = exact_hi - set(lsh)
    assert not missed, f"LSH missed high-similarity pairs: {missed}"
    assert all(j >= 0.5 for j in lsh.values())  # verification filter holds


def test_winnow_shared_passage_shares_fingerprint(spark):
    """Documents sharing a long passage must share >=1 winnowed
    fingerprint regardless of position; unrelated docs share none."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        winnow_fingerprints,
    )

    passage = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, f"intro words first {passage}"),
            (2, f"{passage} completely different tail content here"),
            (3, "nothing in common with anything else at all truly"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=3, window=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2], "shared passage produced no shared fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_embedding_lsh_recall_vs_all_pairs(spark, sf_dir):
    """Banded LSH must catch most high-cosine pairs (p_bit^4 per band is
    ~0.5 at cosine 0.9; 1-(1-p)^4 ~ 0.95) and report the exact same
    cosines as the all-pairs baseline for pairs it finds."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        embedding_lsh_near_dup_pairs,
        embedding_near_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_near_dup_pairs(emb, threshold=0.7).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_lsh_near_dup_pairs(emb, threshold=0.7).collect()
    }
    assert set(lsh) <= set(exact)  # never invents pairs
    for pair, c in lsh.items():
        assert abs(exact[pair] - c) < 1e-12
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.5, f"banded-LSH recall too low: {recall}"


def test_simhash_finds_planted_near_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    sim = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    # simhash is an approximation: it must at least see most J>=0.9 clones
    if exact:
        found = len(exact & sim) / len(exact)
        assert found >= 0.5, f"simhash recall too low: {found}"


def test_bucket_pairs_matches_combinations(spark):
    """The posexplode pair generator must emit exactly the sorted
    combinations a naive nested loop would, across multiple buckets."""
    from itertools import combinations

    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        _bucket_pairs,
    )

    rows = [("b1", i) for i in (3, 1, 2)] + [("b2", i) for i in (10, 11)] + [
        ("b3", 7)  # singleton: no pairs
    ]
    df = spark.createDataFrame(rows, "bucket string, did long")
    got = sorted(
        (r.did_a, r.did_b)
        for r in _bucket_pairs(df, ["bucket"], ["did"]).collect()
    )
    want = sorted(combinations([1, 2, 3], 2)) + sorted(combinations([10, 11], 2))
    assert got == sorted(want)


def test_bucket_pairs_cap_drops_hot_bucket_in_bounded_time(spark):
    """A degenerate 10k-member bucket (50M pairs uncapped) must be
    droppable via max_bucket, with the drop auditable. The capped plan
    never expands the hot bucket's pairs, so this completes in seconds."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        _bucket_pairs,
        oversize_buckets,
    )

    hot = [("hot", i) for i in range(10_000)] + [("ok", 1), ("ok", 2)]
    df = spark.createDataFrame(hot, "bucket string, did long")
    capped = _bucket_pairs(df, ["bucket"], ["did"], max_bucket=100).collect()
    assert [(r.did_a, r.did_b) for r in capped] == [(1, 2)]
    dropped = oversize_buckets(df, ["bucket"], ["did"], max_bucket=100).collect()
    assert [(r.bucket, r.n_members) for r in dropped] == [("hot", 10_000)]


def test_contaminated_ids_planted_overlap(spark):
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        contaminated_ids,
    )

    passage = "the quick brown fox jumps over the lazy dog tonight"  # 10 words
    bench = spark.createDataFrame([(0, passage)], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            (1, "intro words then " + passage + " and a tail"),  # contains the 8-grams
            (2, "a completely different document about spark shuffles"),
            (3, "the quick brown fox"),  # shares only a 4-gram, not an 8-gram
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id for r in contaminated_ids(corpus, bench, n=8).collect()}
    assert got == {1}


def test_winnow_window_form_equals_array_spec(spark):
    """The exploded/window winnowing plan must emit EXACTLY the spec
    form's fingerprint sets, including the degenerate docs: empty text,
    fewer tokens than k, fewer grams than the window."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_fingerprints_arrays,
    )

    docs = spark.createDataFrame(
        [
            (0, ""),
            (1, "one"),
            (2, "two words"),
            (3, "a b c"),            # exactly k tokens -> 1 gram
            (4, "a b c d e"),        # 3 grams < window=4 -> 1 min
            (5, "w x y z w x y z w x y z"),  # repeats -> dup minima
            (6, "the quick brown fox jumps over the lazy dog again and again"),
            (7, None),               # NULL text: spec emits hash('')
        ],
        "doc_id long, text string",
    )
    fast = {(r.doc_id, r.fingerprint) for r in winnow_fingerprints(docs).collect()}
    spec = {(r.doc_id, r.fingerprint) for r in winnow_fingerprints_arrays(docs).collect()}
    assert fast == spec
    assert {d for d, _ in fast} == {0, 1, 2, 3, 4, 5, 6, 7}  # no doc dropped


def test_winnow_window_form_equals_array_spec_on_corpus(spark, sf_dir):
    """Same equivalence on the real documents table."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_fingerprints_arrays,
    )
    from retail_sales_analysis_etl_bi_project_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    fast = {(r.doc_id, r.fingerprint) for r in winnow_fingerprints(docs).collect()}
    spec = {(r.doc_id, r.fingerprint) for r in winnow_fingerprints_arrays(docs).collect()}
    assert fast == spec


def test_incremental_minhash_equals_batch_filtered_full_dedup(spark, sf_dir):
    """Incremental pairs (new×new + new×old, old×old never generated)
    must equal the FULL minhash dedup's verified pairs filtered to
    those involving a batch member — incremental maintenance changes
    the plan, never the answer."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        incremental_minhash_dedup_pairs,
        minhash_dedup_pairs,
    )
    from retail_sales_analysis_etl_bi_project_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    inc = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in incremental_minhash_dedup_pairs(
            docs, is_new=lambda c: c % 5 == 0
        ).collect()
    )
    full = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_dedup_pairs(docs)
        .filter((F.col("doc_a") % 5 == 0) | (F.col("doc_b") % 5 == 0))
        .collect()
    )
    assert inc == full
    # and the incremental output truly contains no old×old pair
    assert all(a % 5 == 0 or b % 5 == 0 for a, b, _ in inc)
    assert inc  # non-vacuous: the batch has near-dups at this sf


# ------------------------------------------------- containment (r8g)


def test_containment_finds_subset_doc_jaccard_misses(spark):
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        containment_dedup_pairs,
        minhash_dedup_pairs,
    )

    # doc 1: long document; doc 2: a verbatim excerpt (tokens 10..19) —
    # every excerpt shingle is contained, so containment == 1.0 while
    # jaccard ~ 8/58 and the symmetric minhash path must NOT pair them
    big_words = " ".join(f"w{i}uncommon" for i in range(60))
    small_words = " ".join(f"w{i}uncommon" for i in range(10, 20))
    docs = spark.createDataFrame(
        [(1, big_words), (2, small_words), (3, "totally different text here now")],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_a, r.doc_b): r
        for r in containment_dedup_pairs(docs, threshold=0.6).collect()
    }
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r.containment == 1.0 and r.n_shared == r.n_b == 8
    mh = {
        (r.doc_a, r.doc_b)
        for r in minhash_dedup_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) not in mh  # jaccard path misses the subset pair


def test_containment_common_shingles_never_block(spark):
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        containment_dedup_pairs,
    )

    # a shingle shared by MORE than df_max docs is a stopword shingle:
    # 12 docs all share "a b c" (df=12 > 10) and nothing else — no
    # candidate may be generated from it
    docs = spark.createDataFrame(
        [(i, f"a b c tail{i}x tail{i}y tail{i}z") for i in range(12)],
        ["doc_id", "text"],
    )
    assert containment_dedup_pairs(docs, threshold=0.3).collect() == []


def test_containment_all_pairs_measures_blocker_misses(spark):
    # the recall-audit scenario (r9): a contained doc whose EVERY
    # shingle is a stopword shingle (df > df_max) is invisible to the
    # rare-shingle blocker, but the exact all-pairs baseline finds it —
    # dedup_containment_recall exists to measure exactly this gap
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        containment_all_pairs,
        containment_dedup_pairs,
    )

    rows = [(i, f"a b c tail{i}x tail{i}y tail{i}z") for i in range(12)]
    rows.append((99, "a b c"))  # one shingle, df("a b c") = 13 > df_max
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    blocked = {
        (r.doc_a, r.doc_b)
        for r in containment_dedup_pairs(docs, threshold=1.0).collect()
    }
    exact = {
        (r.doc_a, r.doc_b)
        for r in containment_all_pairs(docs, threshold=1.0).collect()
    }
    assert blocked == set()  # stopword shingles never block
    # doc 99 is fully contained in each of the 12 others
    assert exact == {(i, 99) for i in range(12)}


def test_containment_recall_zero_counts_on_pair_free_corpus(spark, tmp_path):
    """Empty pair universe: every count must be 0 (not NULL) — Spark's
    SUM over an empty relation is NULL where the oracle's COUNT(CASE)
    is 0, the exact cross-engine trap the count(when) form exists for
    (review finding, r9)."""
    from retail_sales_analysis_etl_bi_project_spark.plans.dedup_queries import (
        dedup_containment_recall,
    )

    # all-distinct docs, no shared shingles at all -> no pairs anywhere
    docs = spark.createDataFrame(
        [(i, f"u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(6)],
        ["doc_id", "text"],
    )
    sf = str(tmp_path / "sf_empty")
    docs.write.parquet(f"{sf}/documents.parquet")
    r = dedup_containment_recall(spark, sf).collect()[0]
    assert (r.n_method_pairs, r.n_truth_pairs, r.hits, r.missed) == (0, 0, 0, 0)


def test_minhash_banding_ladder_is_monotone(spark, sf_dir):
    """The banding S-curve 1-(1-s^r)^b: recall must be non-decreasing
    in the band count at fixed num_hashes, the production bands=16
    config must sit at the ladder's top, and precision stays 1.0 by
    construction (hits == n_method_pairs for every config)."""
    from retail_sales_analysis_etl_bi_project_spark.plans.dedup_queries import (
        dedup_minhash_recall_tuning,
    )

    rows = {
        r.config: r
        for r in dedup_minhash_recall_tuning(spark, sf_dir).collect()
    }
    assert set(rows) == {"bands02_rows32", "bands04_rows16", "bands16_rows4"}
    r2, r4, r16 = (
        rows["bands02_rows32"],
        rows["bands04_rows16"],
        rows["bands16_rows4"],
    )
    assert r2.pair_recall <= r4.pair_recall <= r16.pair_recall
    assert r16.delta_vs_b16 == 0.0
    for r in rows.values():
        assert r.hits == r.n_method_pairs  # exact verify => precision 1.0


def test_cluster_canonical_keeps_longest_member(spark):
    from retail_sales_analysis_etl_bi_project_spark.plans.dedup_queries import (
        dedup_cluster_canonical,
        shared_cluster_assignments,
    )
    from retail_sales_analysis_etl_bi_project_spark.sources.tables import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    kept = {
        r.cluster_id: r for r in dedup_cluster_canonical(spark, sf).collect()
    }
    assert kept, "no clusters at sf0.001"
    members = {}
    chars = {
        r.doc_id: r.n_chars
        for r in load_table(spark, sf, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    for r in shared_cluster_assignments(spark, sf).collect():
        members.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, mem in members.items():
        best = sorted(mem, key=lambda d: (-chars[d], d))[0]
        k = kept[cid]
        assert k.kept_doc_id == best
        assert k.n_members == len(mem) and k.n_dropped == len(mem) - 1
        assert k.kept_n_chars == chars[best]


def test_minhash_injected_relations_match_fresh_build(spark, sf_dir):
    """minhash_dedup_pairs with caller-injected signatures/shingles
    (the banding-ladder sharing path, r10) returns exactly the pairs a
    fresh build does — the injection is a cost knob, never a semantic
    one."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        minhash_signatures,
        shingle_relation,
    )

    docs = load_table(spark, sf_dir, "documents").limit(300)
    fresh = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_dedup_pairs(docs, threshold=0.5, bands=4).collect()
    }
    injected = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_dedup_pairs(
            docs,
            threshold=0.5,
            bands=4,
            signatures=minhash_signatures(docs, 64),
            shingles=shingle_relation(docs, 3),
        ).collect()
    }
    assert fresh == injected


def test_truth_docs_sampling_is_deterministic_subset(spark, sf_dir):
    """_truth_docs with the sweep env var set keeps a deterministic
    md5-prefix subset; unset it is the identity. (The oracle twins use
    the same predicate — scoping is pinned in the entry-module import
    checks run by tools/compare_oracle sweeps.)"""
    import retail_sales_analysis_etl_bi_project_spark.plans.dedup_queries as dq

    full = {r.doc_id for r in dq._truth_docs(spark, sf_dir).select("doc_id").collect()}
    all_ids = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    assert full == all_ids  # K=0: identity

    old = dq._TRUTH_SAMPLE_K
    try:
        dq._TRUTH_SAMPLE_K = 3
        s1 = {r.doc_id for r in dq._truth_docs(spark, sf_dir).select("doc_id").collect()}
        s2 = {r.doc_id for r in dq._truth_docs(spark, sf_dir).select("doc_id").collect()}
    finally:
        dq._TRUTH_SAMPLE_K = old
    assert s1 == s2 and s1 < all_ids and len(s1) > 0
    # expected mass ~3/16 of the corpus; allow a wide tolerance
    assert 0.05 < len(s1) / len(all_ids) < 0.4


def test_chunked_file_source_refuses_reused_dir(spark, tmp_path):
    """A reused source dir would replay stale chunks alongside new
    ones — the harness must refuse instead (review finding, r10)."""
    from retail_sales_analysis_etl_bi_project_spark.streaming.harness import (
        chunked_file_source,
    )

    df = spark.range(10).select(F.col("id").alias("k"))
    src = str(tmp_path / "src")
    assert chunked_file_source(df, "k", src, n_chunks=2) == 10
    with pytest.raises(ValueError, match="already holds files"):
        chunked_file_source(df, "k", src, n_chunks=2)
    # ANY visible stray file is refused, not just chunk_* — readStream
    # would ingest it regardless of name (r10 ADVICE)
    src2 = str(tmp_path / "src2")
    import os

    os.makedirs(src2)
    with open(f"{src2}/stray.parquet", "w") as f:
        f.write("x")
    with pytest.raises(ValueError, match="stray.parquet"):
        chunked_file_source(df, "k", src2, n_chunks=2)
    # hidden/metadata names (dot and underscore prefixes) are ignored
    # by Spark's file source and must not trip the guard
    src3 = str(tmp_path / "src3")
    os.makedirs(src3)
    open(f"{src3}/_SUCCESS", "w").close()
    open(f"{src3}/.hidden", "w").close()
    assert chunked_file_source(df, "k", src3, n_chunks=2) == 10


def test_allpairs_prefix_join_equals_brute_force(spark, sf_dir):
    """The prefix-filtered AllPairs join (r10, the shared_jaccard_truth
    builder) must return EXACTLY the brute-force all-pairs result —
    pairs and jaccard values — including the degenerate conventions
    (empty/NULL text docs share the '' shingle and pair at J=1)."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        allpairs_jaccard_join,
    )

    docs = load_table(spark, sf_dir, "documents")
    for t in (0.5, 0.7):
        brute = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in ngram_jaccard_pairs(docs, threshold=t).collect()
        }
        fast = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in allpairs_jaccard_join(docs, threshold=t).collect()
        }
        assert brute == fast and brute

    edge = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "a b c d e f"), (4, "a b c d e g"), (5, None)],
        "doc_id long, text string",
    )
    brute = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(edge, threshold=0.5).collect()}
    fast = {(r.doc_a, r.doc_b) for r in allpairs_jaccard_join(edge, threshold=0.5).collect()}
    assert brute == fast == {(1, 2), (1, 5), (2, 5), (3, 4)}


def test_containment_prefix_join_equals_brute_force(spark, sf_dir):
    """containment_allpairs_prefix (r10, the containment-recall truth
    builder) must return EXACTLY the brute-force all-pairs containment
    — pairs, counts, and scores — including the degenerate empty/NULL
    docs and the pure-subset case the asymmetric measure exists for."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        containment_all_pairs,
        containment_allpairs_prefix,
    )

    def rows(df):
        return {
            (r.doc_a, r.doc_b, r.n_shared, r.n_a, r.n_b, r.containment)
            for r in df.collect()
        }

    docs = load_table(spark, sf_dir, "documents")
    for t in (0.6, 0.9):
        brute = rows(containment_all_pairs(docs, threshold=t))
        fast = rows(containment_allpairs_prefix(docs, threshold=t))
        assert brute == fast and brute

    edge = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "a b c d e f g h"), (4, "a b c d e"), (5, None)],
        "doc_id long, text string",
    )
    brute = rows(containment_all_pairs(edge, threshold=0.6))
    fast = rows(containment_allpairs_prefix(edge, threshold=0.6))
    assert brute == fast
    assert {(a, b) for a, b, *_ in brute} == {(1, 2), (1, 5), (2, 5), (3, 4)}

    with pytest.raises(ValueError, match="threshold > 0"):
        containment_allpairs_prefix(edge, threshold=0.0)


def test_signatures_from_shingle_relation_match_fresh_build(spark, sf_dir):
    """minhash_signatures(shingles=...) — the signature-store
    discipline (r11): deriving signatures from the persisted shingle
    table returns bit-identical signatures to the fresh tokenize path
    (min over the same distinct-shingle multiset)."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        minhash_signatures,
        shingle_relation,
    )

    docs = load_table(spark, sf_dir, "documents").limit(300)
    fresh = {
        (r.doc_id_, tuple(r.sig))
        for r in minhash_signatures(docs, 64).collect()
    }
    stored = {
        (r.doc_id_, tuple(r.sig))
        for r in minhash_signatures(
            docs, 64, shingles=shingle_relation(docs, 3)
        ).collect()
    }
    assert fresh == stored


def test_injected_signature_width_mismatch_fails_loudly(spark, sf_dir):
    """A signatures relation whose sig width disagrees with num_hashes
    must raise, not silently band NULL hashes into one giant bucket
    (r10 ADVICE)."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").limit(50)
    wrong = minhash_signatures(docs, 32)  # width 32, claimed 64
    # surfaces as SparkRuntimeException/Py4JJavaError depending on the
    # error-capture path; the message is the contract
    with pytest.raises(Exception, match="width mismatch"):
        minhash_candidate_pairs(
            docs, num_hashes=64, bands=16, signatures=wrong
        ).collect()


def test_semantic_dedup_flags_planted_dups(spark):
    """SemDeDup operator semantics on a constructed corpus: identical
    vectors in one cluster keep only the smallest id; a cross-cluster
    near-identical pair is NOT compared (the documented blocking miss);
    singletons keep."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        semantic_dedup_flags,
    )

    # 2 centroids = first 2 vectors by id: v0 ~ x-axis, v1 ~ y-axis.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # centroid 0
        (1, [0.0, 1.0, 0.0, 0.0]),   # centroid 1
        (2, [1.0, 0.01, 0.0, 0.0]),  # cluster 0, near-dup of 0 -> dropped
        (3, [1.0, 0.02, 0.0, 0.0]),  # cluster 0, near-dup of 0/2 -> dropped
        (4, [0.0, 1.0, 0.01, 0.0]),  # cluster 1, near-dup of 1 -> dropped
        (5, [0.6, 0.8, 0.0, 0.0]),   # between clusters; argmax -> cluster 1
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: (r.centroid_id, r.keep)
        for r in semantic_dedup_flags(
            emb, threshold=0.95, n_centroids=2
        ).collect()
    }
    assert len(got) == 6
    assert got[0] == (0, True)  # smallest id in its dup group keeps
    assert got[1] == (1, True)
    assert got[2][1] is False and got[2][0] == 0
    assert got[3][1] is False
    assert got[4] == (1, False)
    # vec 5: cos to both dup groups < 0.95 -> keeps despite cluster 1
    assert got[5][1] is True


def test_semantic_multi_assign_recovers_boundary_pair(spark):
    """n_assign=2 recovers the documented cross-cluster miss: a
    near-dup pair whose members argmax to DIFFERENT centroids is not
    compared under single assignment (both keep) but IS compared once
    each vector also joins its second-nearest cluster — the smaller id
    keeps, the larger drops. centroid_id stays the rank-1 assignment
    in both modes."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        semantic_dedup_flags,
    )

    # centroids = first 2 vectors: c0 ~ x-axis, c1 ~ y-axis. Vectors 2
    # and 3 are near-identical but sit on opposite sides of the
    # diagonal, so their argmax centroids differ; both have the other
    # centroid as clear second-nearest.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [1.0, 0.99, 0.0, 0.0]),  # argmax c0 (cos to c0 > c1)
        (3, [0.99, 1.0, 0.0, 0.0]),  # argmax c1
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )

    def flags(n_assign):
        return {
            r.vec_id: (r.centroid_id, r.keep)
            for r in semantic_dedup_flags(
                emb, threshold=0.99, n_centroids=2, n_assign=n_assign
            ).collect()
        }

    single = flags(1)
    assert single[2] == (0, True) and single[3] == (1, True)  # the miss
    multi = flags(2)
    assert multi[2] == (0, True)  # smaller id keeps
    assert multi[3] == (1, False)  # recovered: dropped via shared cluster
    # untouched vectors keep in both modes
    assert single[0][1] and single[1][1] and multi[0][1] and multi[1][1]
