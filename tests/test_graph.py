"""Connected components (operators/graph.py): convergence on worst-case
path graphs within the documented iteration bound, agreement with a
pure-python union-find on random graphs, and cluster_size semantics."""

import random

from pyspark.sql import functions as F

from retail_sales_analysis_etl_bi_project_spark.operators.graph import (
    connected_components,
)


def _union_find_clusters(n_nodes, edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comp = {}
    for v in set(parent):
        comp.setdefault(find(v), []).append(v)
    out = {}
    for members in comp.values():
        lo = min(members)
        for v in members:
            out[v] = lo
    return out


def _cc_dict(spark, edges, max_iters=None):
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    kw = {} if max_iters is None else {"max_iters": max_iters}
    rows = connected_components(df, **kw).collect()
    return {r.doc_id: r.cluster_id for r in rows}, rows


def test_path_graph_converges_within_bound(spark):
    # 64-node path: diameter 63, the documented worst case for
    # max_iters=6 (pointer jumping doubles reach per round).
    edges = [(i, i + 1) for i in range(63)]
    got, rows = _cc_dict(spark, edges, max_iters=6)
    assert got == {i: 0 for i in range(64)}
    assert all(r.cluster_size == 64 for r in rows)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = list(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(40 + 10 * trial)
            }
        )
        got, rows = _cc_dict(spark, edges)
        want = _union_find_clusters(n, edges)
        assert got == want
        # cluster_size matches the component populations
        from collections import Counter

        pop = Counter(want.values())
        assert {(r.doc_id, r.cluster_size) for r in rows} == {
            (v, pop[c]) for v, c in want.items()
        }


def test_isolated_pairs_and_triangle(spark):
    edges = [(10, 11), (20, 21), (21, 22), (20, 22)]
    got, rows = _cc_dict(spark, edges)
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    sizes = {r.doc_id: r.cluster_size for r in rows}
    assert sizes == {10: 2, 11: 2, 20: 3, 21: 3, 22: 3}


def test_connected_components_lazy_form_matches_early_exit(spark):
    """early_exit=False (fully lazy, fixed rounds — the DEFAULT, so
    building a plan never runs jobs) must produce the same clusters as
    the certificate-driven early-exit form the registered dedup
    queries opt into."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    eager = sorted(
        map(tuple, connected_components(pairs, early_exit=True).collect())
    )
    lazy = sorted(map(tuple, connected_components(pairs).collect()))
    assert eager == lazy


def test_pagerank_fixed_point_matches_python_reference(spark):
    """Exact equality (not tolerance) against a pure-Python replay of
    the scaled-integer recurrence on a hand-built graph — integer
    fixed point means both sides compute the SAME numbers. Star graph
    0-1,0-2,0-3 plus the 4-5 edge: the hub must outrank leaves, the
    isolated pair sits at the two-regular fixpoint."""
    from retail_sales_analysis_etl_bi_project_spark.operators.graph import (
        pagerank_fixed_point,
    )

    edges = [(0, 1), (0, 2), (0, 3), (4, 5)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rounds, scale, damp = 3, 10**12, 85
    got = {
        r.doc_id: (r.degree, r.pr_scaled)
        for r in pagerank_fixed_point(
            pairs, rounds=rounds, scale=scale, damping_pct=damp
        ).collect()
    }

    # pure-Python replay
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    r = {v: scale // n for v in adj}
    tele = (scale * (100 - damp)) // (100 * n)
    for _ in range(rounds):
        contrib = {v: r[v] // len(adj[v]) for v in adj}
        r = {
            v: tele + (damp * sum(contrib[u] for u in adj[v])) // 100
            for v in adj
        }
    want = {v: (len(adj[v]), r[v]) for v in adj}
    assert got == want
    # the hub outranks its leaves; leaves are symmetric
    assert got[0][1] > got[1][1] == got[2][1] == got[3][1]
    assert got[4] == got[5]
