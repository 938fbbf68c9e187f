"""Physical-plan contract guards: the scale properties SCALE.md claims
(broadcast dim joins, parquet pushdown, pre-aggregation before Expand,
no cartesian products) asserted against the ACTUAL plans, so a future
refactor that silently degrades a plan fails CI instead of only
showing up as a bench regression.

Deliberately coarse assertions (operator presence/absence, not plan
shape equality) — they must survive Spark version bumps and AQE
re-planning, and only fail when a load-bearing property is lost."""

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


def plan_of(spark, qs, name, sf_dir):
    buf = io.StringIO()
    with redirect_stdout(buf):
        qs[name](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_q01_broadcasts_dims_and_takes_ordered(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "q01_top5_products_by_revenue", sf_dir)
    # top-5 must be TakeOrderedAndProject (never global sort + limit)
    assert "TakeOrderedAndProject" in plan
    # the part dim joins as a broadcast, not a shuffle
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_silver_filters_push_down_to_parquet(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "etl_silver_filters", sf_dir)
    assert "PushedFilters: [" in plan
    # at least one real predicate reached the scan (not just the
    # implicit IsNotNull)
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln and "GreaterThan" in ln
    ]
    assert pushed, f"no range predicate pushed: {plan[:2000]}"


def test_rollup_expands_over_preaggregate_not_join_output(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "agg_rollup_year_month", sf_dir)
    assert "Expand" in plan
    # the Expand's input side must already be aggregated: a partial
    # HashAggregate appears BELOW the Expand in the formatted tree
    # (tree prints top-down, so the pre-aggregate has a HIGHER node id
    # but appears after Expand textually; assert ordering on first
    # occurrence indexes of the operators in the tree section)
    tree = plan.split("\n\n")[0]
    expand_at = tree.index("Expand")
    assert "HashAggregate" in tree[expand_at:], "no aggregate below Expand"


def test_fact_assembly_has_no_shuffle_joins(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "etl_fact_assembly", sf_dir)
    # all four dim lookups broadcast; the fact side never shuffles
    # for a join
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_chunking_is_shuffle_free_before_presentation_sort(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "corpus_chunk_documents", sf_dir)
    # one Exchange (the output orderBy's range partitioning) and no
    # aggregate/join anywhere — chunking itself must stay scan-fused
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") <= 1
    assert "HashAggregate" not in tree and "Join" not in tree


def test_histograms_aggregate_before_window(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "agg_numeric_histograms", sf_dir)
    # the empty-frame share window must run over the n_buckets-row
    # aggregate, never over the raw table: Window appears above (before,
    # textually) the aggregates in the top-down tree
    tree = plan.split("\n\n")[0]
    assert tree.index("Window") < tree.index("HashAggregate")


def test_bloom_prefilter_sits_below_the_join_exchange(spark, qs, sf_dir):
    """join_bloom_prefilter_revenue: the Bloom membership test (k
    xxhash64 probes) must run BEFORE the sort-merge join's shuffle —
    pruning after the Exchange would move every fact row and defeat
    the pattern — and the join must actually be sort-merge (a
    broadcast would make the Bloom pointless)."""
    plan = plan_of(spark, qs, "join_bloom_prefilter_revenue", sf_dir)
    assert "SortMergeJoin" in plan
    assert "xxhash64" in plan
    assert "CartesianProduct" not in plan
    # tree shape: an Exchange directly feeding from a Filter (the
    # Bloom predicate) which feeds from the parquet scan
    tree = plan.split("\n\n")[0]
    import re

    assert re.search(
        r"Exchange \(\d+\)\n\s*:?\s*\+- Filter \(\d+\)\n\s*:?\s*\+- Scan parquet",
        tree,
    ), tree


def test_incremental_merge_pushes_split_and_combines_map_side(spark, qs, sf_dir):
    """agg_incremental_kpi_merge: the history/delta date split must
    reach the parquet scans (partition pruning at scale — each branch
    reads only its slice) and both partial aggregates must map-side
    combine before their shuffles."""
    plan = plan_of(spark, qs, "agg_incremental_kpi_merge", sf_dir)
    assert "Union" in plan
    assert "partial_sum" in plan and "partial_count" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("LessThan(o_orderdate" in ln for ln in pushed), pushed
    assert any("GreaterThanOrEqual(o_orderdate" in ln for ln in pushed), pushed


def test_interval_overlap_plans_as_equi_join_not_nested_loop(spark, qs, sf_dir):
    """join_interval_overlap_busy_windows: the whole point of the
    grid-cell composition is that the overlap join shuffles on cell
    like any equi-join — a BroadcastNestedLoopJoin or cartesian in the
    plan means the theta form leaked back in."""
    plan = plan_of(spark, qs, "join_interval_overlap_busy_windows", sf_dir)
    assert "CartesianProduct" not in plan
    # exactly ONE nested-loop join is expected: the single-row mean
    # broadcast onto hourly (the documented 1×N totals pattern) — the
    # INTERVAL join itself must not be a second one. Count physical
    # nodes via their "(N) Operator" detail headers (the operator name
    # also appears in the tree rendering).
    import re

    bnlj_nodes = re.findall(
        r"^\(\d+\) BroadcastNestedLoopJoin", plan, flags=re.MULTILINE
    )
    assert len(bnlj_nodes) <= 1, bnlj_nodes
    # and the interval join really keys on the grid cell
    keyed = [
        ln
        for ln in plan.splitlines()
        if ("Left keys" in ln or "Right keys" in ln) and "_cell" in ln
    ]
    assert keyed, plan[:1500]


def test_bigram_support_filter_sits_below_unigram_joins(spark, qs, sf_dir):
    """text_bigram_pmi: the n_pair >= 5 support filter must prune the
    singleton bigram tail BEFORE the two unigram shuffle joins — a
    filter above the joins would shuffle the whole bigram table twice
    for nothing. In the top-down tree the joins therefore appear
    before the filter, and the filter feeds from the bigram
    aggregate."""
    plan = plan_of(spark, qs, "text_bigram_pmi", sf_dir)
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in plan
    join_at = min(
        i
        for i in (
            tree.find("SortMergeJoin"),
            tree.find("ShuffledHashJoin"),
            tree.find("BroadcastHashJoin"),
        )
        if i >= 0
    )
    filt = tree.find("Filter")
    assert filt > join_at, "support filter evaluated above the joins"
    # details section: the filter is on the aggregated pair count
    assert "n_pair" in plan


def test_anomaly_moments_join_is_broadcast_over_day_grain(spark, qs, sf_dir):
    """events_anomaly_daily: per-type moments (type-cardinality rows)
    must broadcast against the day-grain table — and nothing after the
    first aggregate may rescan raw events (exactly two parquet scans:
    one per side of the self-derived join)."""
    plan = plan_of(spark, qs, "events_anomaly_daily", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_markov_lag_and_collapse_share_one_user_shuffle(spark, qs, sf_dir):
    """events_markov_transitions: raw events shuffle ONCE (on user_id,
    for the lag window); everything downstream runs over the collapsed
    type-pair table."""
    plan = plan_of(spark, qs, "events_markov_transitions", sf_dir)
    tree = plan.split("\n\n")[0]
    assert plan.count("hashpartitioning(user_id") == 1
    assert "Scan parquet" in tree and tree.count("Scan parquet") == 1


def test_trailing_window_uses_range_frame(spark, qs, sf_dir):
    """events_trailing_7d_value: the rolling frame must be RANGE over
    the day ordinal (calendar-gap correctness), not ROWS."""
    plan = plan_of(spark, qs, "events_trailing_7d_value", sf_dir)
    assert "RangeFrame, -6" in plan, "trailing frame is not a RANGE frame"
    assert "RowFrame" not in plan


def test_basket_distinct_scan_is_shared_via_persist(spark, qs, sf_dir):
    """bi_market_basket_pairs: the DISTINCT (order, part) table feeds
    four consumers through the managed persist — the plan must read it
    as InMemoryTableScan (one fact scan per run), with the support
    filter below the item-support joins."""
    plan = plan_of(spark, qs, "bi_market_basket_pairs", sf_dir)
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan


def test_pareto_windows_share_one_brand_exchange(spark, qs, sf_dir):
    """bi_pareto_brand_products: rank, running sum, and brand total all
    share one brand-partitioned ordered spec — Catalyst must fold them
    into ONE Window node over one exchange+sort (a bare partitionBy
    total-window planned a second brand exchange and a second Window
    before the unbounded-frame rewrite)."""
    plan = plan_of(spark, qs, "bi_pareto_brand_products", sf_dir)
    tree = plan.split("\n\n")[0]
    assert tree.count("Window (") == 1, tree
    # exactly one exchange keyed on brand ALONE (the window's); the
    # (brand, part_key) aggregate exchange is a different key set
    import re

    brand_only = re.findall(r"hashpartitioning\(brand#\d+, \d+\)", plan)
    assert len(brand_only) == 1, plan


def test_hhi_broadcasts_dim_and_stays_off_cartesian(spark, qs, sf_dir):
    """bi_revenue_hhi_by_type: the part dim joins as a broadcast (fact
    never shuffles for the join); shares/squares run over the
    brand-grain aggregate."""
    plan = plan_of(spark, qs, "bi_revenue_hhi_by_type", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_upsample_reads_shared_persist_no_cartesian(spark, qs, sf_dir):
    """corpus_upsample_epochs: the doc-level table comes from the
    managed persist shared with the budget query (one corpus scan for
    the pair), and the 1-row totals must ride broadcast joins, never a
    cartesian."""
    plan = plan_of(spark, qs, "corpus_upsample_epochs", sf_dir)
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan


def test_cusum_stacks_two_windows_on_one_sort(spark, qs, sf_dir):
    """events_cusum_drift: the prefix-form CUSUM is exactly two Window
    nodes (running deviation sum, then running min/max over it) over
    the SAME (type, day) partition+order — a plan with a third window
    or an exchange between them means the stacked-spec property was
    lost. The per-type moments join stays broadcast."""
    plan = plan_of(spark, qs, "events_cusum_drift", sf_dir)
    tree = plan.split("\n\n")[0]
    assert tree.count("Window (") == 2, tree
    win_span = tree[tree.index("Window (") :]
    first = tree.index("Window (")
    second = tree.index("Window (", first + 1)
    assert "Exchange" not in tree[first:second], tree
    assert "BroadcastHashJoin" in plan
    assert win_span is not None


def test_containment_blocking_is_aggregate_based(spark, qs, sf_dir):
    """dedup_containment_pairs: candidate pairs come from the one-pass
    bucket machinery (groupBy + generators) with the df-cap semi-join
    as the skew guard — never a cartesian, and no self-join shape for
    pair generation (the bucket form computes the shingle pipeline
    once)."""
    plan = plan_of(spark, qs, "dedup_containment_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan


def test_containment_recall_single_truth_pass(spark, qs, sf_dir):
    """dedup_containment_recall: all counts come from ONE full-outer
    join of the two pair sets, so the plan holds exactly one FullOuter
    node (a missing one means the one-pass form was lost — the r9
    review finding was the truth join evaluated per count) and, since
    the truth moved to asymmetric prefix filtering (r10), ZERO
    nested-loop/cartesian nodes — a reappearing one means the truth
    reverted to the brute-force cross product."""
    plan = plan_of(spark, qs, "dedup_containment_recall", sf_dir)
    tree = plan.split("\n\n")[0]
    assert tree.count("FullOuter") == 1, tree
    nested = tree.count("BroadcastNestedLoopJoin") + tree.count(
        "CartesianProduct"
    )
    assert nested == 0, tree


def test_jaccard_truth_is_prefix_filtered_not_quadratic(spark, qs, sf_dir):
    """dedup_ngram_jaccard (the shared Jaccard truth) builds with the
    prefix-filtered AllPairs join (r10): the plan must hold NO
    nested-loop/cartesian node — a reappearing one means someone
    reverted shared_jaccard_truth to the brute-force cross product —
    and must carry the prefix machinery (a Window for the per-doc
    df-rank cut)."""
    from retail_sales_analysis_etl_bi_project_spark.plans import shared_cache

    shared_cache.release()  # plan the BUILD, not a prior persist
    plan = plan_of(spark, qs, "dedup_ngram_jaccard", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "Window" in plan, plan[:2000]
