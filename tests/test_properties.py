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
