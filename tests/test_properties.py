"""Property-based invariants (hypothesis) for the operators whose
correctness is an algebraic law rather than a fixture: chunk tiling,
snapshot-diff classification, and the one-window ≡ two-phase packing
identity. Few examples per property (each example is a Spark job), no
deadline — shrinking still finds minimal counterexamples on failure."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.cdc import snapshot_diff
from retail_sales_analysis_etl_bi_project_spark.operators.curation import (
    chunk_documents,
    pack_sequences,
    pack_sequences_sharded,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    n_tokens=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=12),
    chunk_size=st.integers(min_value=2, max_value=64),
    data=st.data(),
)
def test_chunking_tiles_every_token(spark, n_tokens, chunk_size, data):
    stride = data.draw(st.integers(min_value=1, max_value=chunk_size))
    docs = spark.createDataFrame(
        [(i, " ".join("t" for _ in range(n))) for i, n in enumerate(n_tokens)],
        ["doc_id", "text"],
    )
    rows = chunk_documents(
        docs, chunk_size=chunk_size, stride=stride
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(n_tokens):
        if n == 0:
            assert i not in by_doc  # nothing to chunk
            continue
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_id)
        # chunk i starts at i*stride; first covers 0, last ends at n
        assert chunks[0].tok_lo == 0 and chunks[-1].tok_hi == n
        for j, c in enumerate(chunks):
            assert c.tok_lo == j * stride
            assert c.tok_hi == min(c.tok_lo + chunk_size, n)
            assert c.tok_lo < c.tok_hi  # never an empty chunk
        # coverage without gaps: next chunk starts at or before prev end
        for a, b in zip(chunks, chunks[1:]):
            assert b.tok_lo <= a.tok_hi


@settings(**_SETTINGS)
@given(
    old=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.tuples(st.sampled_from(["a", "b", None]), st.integers(0, 5)),
        max_size=15,
    ),
    new=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.tuples(st.sampled_from(["a", "b", None]), st.integers(0, 5)),
        max_size=15,
    ),
)
def test_snapshot_diff_partitions_key_space(spark, old, new):
    schema = "k int, s string, v int"
    o = spark.createDataFrame([(k, s, v) for k, (s, v) in old.items()], schema)
    n = spark.createDataFrame([(k, s, v) for k, (s, v) in new.items()], schema)
    got = {
        r.k: r.change_type
        for r in snapshot_diff(o, n, ["k"], ["s", "v"]).collect()
    }
    expect = {}
    for k in set(old) | set(new):
        if k not in new:
            expect[k] = "delete"
        elif k not in old:
            expect[k] = "insert"
        elif old[k] != new[k]:
            expect[k] = "update"
        # equal rows: absent from the diff
    assert got == expect


@settings(**_SETTINGS)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=900), min_size=1, max_size=20),
    budget=st.integers(min_value=16, max_value=512),
    block_size=st.integers(min_value=1, max_value=8),
)
def test_sharded_packing_identical_to_one_window_form(
    spark, toks, budget, block_size
):
    docs = spark.createDataFrame(
        [("s%d" % (i % 2), i, t) for i, t in enumerate(toks)],
        ["source", "doc_id", "n_tokens"],
    )
    simple = sorted(
        tuple(r) for r in pack_sequences(docs, budget=budget).collect()
    )
    sharded = sorted(
        tuple(r)
        for r in pack_sequences_sharded(
            docs, budget=budget, block_size=block_size
        ).collect()
    )
    # the distributed prefix-sum decomposition is row-identical to the
    # one-window spec for ANY block size, including degenerate size 1
    assert sharded == simple


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein (classic unit-cost DP)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(**_SETTINGS)
@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5),
        min_size=2,
        max_size=8,
    )
)
def test_fuzzy_blocking_finds_every_lev1_pair(spark, tmp_path_factory, names):
    """SymSpell completeness law: the deletion-neighborhood join must
    report EXACTLY the brute-force count of customer-row pairs with
    Levenshtein distance <= 1 — blocking can add candidates but must
    never lose a true pair, the verify must discard every false
    candidate, and the distinct-name multiplicity algebra (ca*cb cross,
    C(c,2) within) must equal row-level counting. Tiny alphabet forces
    dense neighborhoods and NON-unique draws force duplicate names (the
    adversarial cases for over-, under-, and mis-multiplied counts)."""
    from retail_sales_analysis_etl_bi_project_spark.plans.analysis_queries import (
        dedup_fuzzy_name_pairs,
    )

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "c_custkey bigint, c_name string"
    )
    d = str(tmp_path_factory.mktemp("fuzzprop") / "t")
    df.write.parquet(f"{d}/customer.parquet")
    got = dedup_fuzzy_name_pairs(spark, d).collect()[0]
    want = sum(
        1
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if _lev(names[i], names[j]) <= 1
    )
    assert got.n_dup_pairs == want
    assert got.n_names == len(names)


@settings(**_SETTINGS)
@given(
    words=st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=6),
        min_size=1,
        max_size=20,
    )
)
def test_bpe_pair_counts_match_python_reference(spark, tmp_path_factory, words):
    """Corpus-weighted adjacent-pair counts equal the trivial Python
    count over the raw token stream (the word-frequency-table rewrite
    is an exact refactoring, not an approximation)."""
    from collections import Counter

    from retail_sales_analysis_etl_bi_project_spark.plans.analysis_queries import (
        text_bpe_pair_merge,
    )

    df = spark.createDataFrame(
        [(1, " ".join(words), "en", "s", len(" ".join(words)))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path_factory.mktemp("bpeprop") / "t")
    df.write.parquet(f"{d}/documents.parquet")
    got = {r.pair: r.pair_count for r in text_bpe_pair_merge(spark, d).collect()}
    ref = Counter()
    for w in words:
        for i in range(len(w) - 1):
            ref[w[i : i + 2]] += 1
    # compare on the intersection ranking-safe way: every reported pair
    # must carry the exact reference count, and the top-20 cut must not
    # under-report (got is the 20 highest reference counts)
    for p, c in got.items():
        assert ref[p] == c
    if ref:
        kept_min = min(got.values())
        dropped = [c for p, c in ref.items() if p not in got]
        assert all(c <= kept_min for c in dropped)


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("aa bb cc dd ee ff".split()), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_tfidf_matches_python_reference(spark, tmp_path_factory, docs):
    """TF-IDF law: per-doc top-3 terms, scores, and tie-breaks equal a
    Python reference computing the SAME IEEE double sequence
    (tf * (N+1)) / (df+1) — exact float equality, not approx, because
    +,*,/ are correctly rounded in both runtimes. Small vocabulary
    forces score ties so the term-asc tie-break is actually exercised."""
    from retail_sales_analysis_etl_bi_project_spark.plans.analysis_queries import (
        text_tfidf_topterms,
    )

    df = spark.createDataFrame(
        [(i, " ".join(words), "en", "s", 0) for i, words in enumerate(docs)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path_factory.mktemp("tfprop") / "t")
    df.write.parquet(f"{d}/documents.parquet")
    got = [
        (r.doc_id, r.rnk, r.term, r.tf, r.df, r.tfidf)
        for r in text_tfidf_topterms(spark, d).collect()
    ]
    n = len(docs)
    dfreq = {}
    tfs = []
    for i, words in enumerate(docs):
        tf = {}
        for w in words:
            tf[w] = tf.get(w, 0) + 1
        tfs.append(tf)
        for w in tf:
            dfreq[w] = dfreq.get(w, 0) + 1
    want = []
    for i, tf in enumerate(tfs):
        scored = sorted(
            (
                (-(float(c) * float(n + 1)) / float(dfreq[w] + 1), w, c)
                for w, c in tf.items()
            ),
        )[:3]
        for rnk, (neg, w, c) in enumerate(scored, 1):
            want.append((i, rnk, w, c, dfreq[w], -neg))
    assert sorted(got) == sorted(want)


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "fr"]),
            st.lists(st.sampled_from("xx yy zz".split()), min_size=0, max_size=30),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_corpus_contrast_matches_python_reference(spark, tmp_path_factory, docs):
    """Contrast law: the smoothed rate ratio, min-support gate, and
    (ratio desc, term) ordering equal a Python reference running the
    identical IEEE sequence ((a+.5)*(B+.5))/((b+.5)*(A+.5))."""
    from retail_sales_analysis_etl_bi_project_spark.plans.analysis_queries import (
        text_corpus_contrast,
    )

    df = spark.createDataFrame(
        [
            (i, " ".join(words), lang, "s", 0)
            for i, (lang, words) in enumerate(docs)
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path_factory.mktemp("ctprop") / "t")
    df.write.parquet(f"{d}/documents.parquet")
    got = [
        (r.term, r.n_en, r.n_rest, r.en_ratio)
        for r in text_corpus_contrast(spark, d).collect()
    ]
    counts = {}
    for lang, words in docs:
        for w in words:
            a, b = counts.get(w, (0, 0))
            counts[w] = (a + (lang == "en"), b + (lang != "en"))
    tot_en = sum(a for a, _ in counts.values())
    tot_rest = sum(b for _, b in counts.values())
    want = []
    for w, (a, b) in counts.items():
        if a + b < 10:
            continue
        ratio = ((float(a) + 0.5) * (float(tot_rest) + 0.5)) / (
            (float(b) + 0.5) * (float(tot_en) + 0.5)
        )
        want.append((w, a, b, ratio))
    want.sort(key=lambda t: (-t[3], t[0]))
    assert got == want[:15]


@settings(**_SETTINGS)
@given(
    left=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=120),
            st.integers(min_value=-5, max_value=90),
        ),
        min_size=0,
        max_size=25,
    ),
    right=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=120),
            st.integers(min_value=-5, max_value=90),
        ),
        min_size=0,
        max_size=25,
    ),
    grid=st.sampled_from([1.0, 3.0, 7.0, 50.0, 1000.0]),
)
def test_interval_overlap_equals_naive_multiset(spark, left, right, grid):
    """interval_overlap_join == the naive theta overlap join as a
    MULTISET for arbitrary (including degenerate, negative-width,
    negative-coordinate, duplicate) intervals at any grid resolution:
    no pair missed, no pair duplicated across co-occupied cells."""
    from retail_sales_analysis_etl_bi_project_spark.operators.joins import (
        interval_overlap_join,
    )

    ldf = spark.createDataFrame(
        [(i, lo, lo + w) for i, (lo, w) in enumerate(left)] or [(0, 1, 0)],
        "lid long, a_lo long, a_hi long",
    )
    rdf = spark.createDataFrame(
        [(j, lo, lo + w) for j, (lo, w) in enumerate(right)] or [(0, 1, 0)],
        "rid long, b_lo long, b_hi long",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            ldf, rdf, "a_lo", "a_hi", "b_lo", "b_hi", grid=grid
        ).collect()
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in ldf.join(
            rdf, (ldf.a_lo < rdf.b_hi) & (rdf.b_lo < ldf.a_hi)
        ).collect()
    )
    # drop naive matches involving degenerate intervals the operator
    # specifies as matching nothing (hi <= lo)
    lw = {i: hi > lo for i, (lo, w) in enumerate(left) for hi in [lo + w]}
    rw = {j: hi > lo for j, (lo, w) in enumerate(right) for hi in [lo + w]}
    naive = [(a, b) for a, b in naive if lw.get(a) and rw.get(b)]
    assert got == naive


# ------------------------------------------------------ r8: pure arithmetic


@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1,
                max_size=200))
@settings(max_examples=200, deadline=None)
def test_cusum_prefix_identity_equals_recursion(devs):
    """The window-expressible prefix form of CUSUM (stat_queries:
    S+_t = P_t - min(0, min P_j); S-_t = max(0, max P_j) - P_t) must
    equal Page's recursion max(0, S_{t-1} +/- dev_t) on EVERY integer
    deviation sequence — the identity the registered query's whole
    plan shape rests on."""
    sp = sn = 0
    P = mn = mx = 0
    for d in devs:
        sp = max(0, sp + d)
        sn = max(0, sn - d)
        P += d
        mn = min(mn, P)
        mx = max(mx, P)
        assert sp == P - min(0, mn)
        assert sn == max(0, mx) - P


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=50),
                  st.integers(min_value=1, max_value=3)),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_epoch_budget_arithmetic_invariants(sources):
    """Integer budget/epoch arithmetic of the mix queries: epochs =
    ceil(budget/size) never under-replicates (epochs*size >= budget
    when size > 0), zero-size sources get zero epochs (the guarded
    division), and per-source budgets never exceed the global target
    by more than rounding."""
    T = sum(tok for tok, _ in sources)
    sum_wt = sum(wt for _, wt in sources)
    total_budget = 0
    for tok, wt in sources:
        budget = (T * 2 * wt) // sum_wt
        epochs = 0 if tok == 0 else (budget + tok - 1) // tok
        if tok > 0:
            assert epochs * tok >= budget
            assert (epochs - 1) * tok < budget or epochs == 0
        else:
            assert epochs == 0
        total_budget += budget
    # floor rounding only ever loses tokens vs the exact 2*T target
    assert total_budget <= 2 * T


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=0,
            max_size=10,
        ).map(" ".join),
        min_size=2,
        max_size=10,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.6, 0.9, 1.0]),
)
def test_prefix_joins_equal_brute_force_on_random_corpora(
    spark, texts, threshold
):
    """Exactness law for BOTH r10 prefix-filter joins: on arbitrary
    corpora — a 4-letter alphabet forces hot shingles, duplicate docs,
    ties in the global (df, shingle) order, and empty docs — the
    prefix-filtered result must equal the brute-force all-pairs result
    for Jaccard AND containment at every threshold. Hypothesis shrinks
    any violation to a minimal corpus."""
    from retail_sales_analysis_etl_bi_project_spark.operators.dedup import (
        allpairs_jaccard_join,
        containment_all_pairs,
        containment_allpairs_prefix,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    jb = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=threshold).collect()
    }
    jf = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in allpairs_jaccard_join(docs, threshold=threshold).collect()
    }
    assert jb == jf
    cb = {
        (r.doc_a, r.doc_b, r.n_shared, r.containment)
        for r in containment_all_pairs(docs, threshold=threshold).collect()
    }
    cf = {
        (r.doc_a, r.doc_b, r.n_shared, r.containment)
        for r in containment_allpairs_prefix(docs, threshold=threshold).collect()
    }
    assert cb == cf


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-10**12, max_value=10**12),
        ),
        min_size=1,
        max_size=120,
    ),
    n_buckets=st.sampled_from([2, 3, 16, 1024]),
    use_log=st.booleans(),
)
def test_two_phase_rank_equals_global_sort(spark, vals, n_buckets, use_log):
    """selected_ranks == the global row_number pick for EVERY target
    rank, on adversarial inputs: heavy ties, outlier-stretched ranges,
    tiny bucket counts, and both bucket-key transforms. The algebraic
    law the two-phase histogram selection must satisfy exactly."""
    from retail_sales_analysis_etl_bi_project_spark.operators.ranks import (
        selected_ranks,
        signed_log,
    )

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    m = len(vals)
    ranks = {
        "lo": "greatest(1, (__tp_m + 1) div 4)",
        "med": "(__tp_m + 1) div 2",
        "hi": "__tp_m",  # the maximum — bucket location's edge case
    }
    got = {
        r["__tp_rank"]: (r.id, r.v)
        for r in selected_ranks(
            df,
            F.col("v"),
            ["id"],
            ranks,
            n_buckets=n_buckets,
            bucket_key=signed_log(F.col("v")) if use_log else None,
        ).collect()
    }
    ordered = sorted(((v, i) for i, v in enumerate(map(float, vals))))
    want = {
        "lo": max(1, (m + 1) // 4),
        "med": (m + 1) // 2,
        "hi": m,
    }
    for label, target in want.items():
        v, i = ordered[target - 1]
        assert got[label] == (i, v), (label, target, vals)
