"""Distributed connected components over an edge list — the last stage
of every dedup pipeline: near-dup PAIRS (MinHash/SimHash/embedding
verify output) become transitive CLUSTER ids, so "keep one doc per
cluster" is a single groupBy away. The reference has no graph stage
(its dedup surface stops at pandas drop_duplicates,
/root/reference/etl/etl.py:104-112); this is part of the LLM-pipeline
extension surface.

Algorithm: min-label propagation with pointer jumping (the classic
"hash-to-min" family, Rastogi et al. 2013, public literature). Each
round
  1. propagates labels one hop across edges
     (edge ⋈ label join + min groupBy — one shuffle on id), then
  2. compresses label chains by composing the label map with itself
     (label := label(label) — one more hash join),
so label information travels super-linearly: a 1024-node path
converges in 10 rounds (= log2 n), branching trees need ~2*log2 n
(a 23-node random tree took 8 — see tests/test_graph.py). The default
max_iters=12 therefore covers any component a dedup corpus plausibly
produces (near-dup clusters are dense, diameter a few hops; the sf0.1
test graph converges in 2).

Design for 100 TB:
- every step is an equi-join / groupBy on a fixed-width long key —
  hash-partitioned shuffles, no broadcast of anything proportional to
  the graph, no driver-side state. This is the shape GraphFrames'
  connectedComponents uses; re-implemented here on plain DataFrames so
  the engine has no extra dependency.
- iterative plans MUST truncate lineage: each round references the
  previous label table ~3 times, and Catalyst does not dedupe logical
  subtrees, so a naive lazy loop re-plans (and re-executes) the
  upstream pipeline 3^k times. Every round's label table is therefore
  localCheckpoint-ed: each round materializes exactly once as RDD
  blocks and every downstream reference reuses them — total work is
  linear in EXECUTED rounds. Checkpoint blocks are freed by the
  ContextCleaner when the loop-local DataFrames go out of scope.
- EARLY EXIT, not a fixed round count: label updates only ever
  DECREASE a label (min-aggregation and pointer jumps both replace a
  label with something <=), so the sum of all labels is a strictly
  decreasing convergence certificate — when a round leaves the sum
  unchanged, no label moved and the components are final. One scalar
  aggregate per round buys termination at the graph's actual diameter
  (dedup graphs: 2-3 rounds) instead of paying the worst-case
  max_iters bound every time; at 100 TB that is the difference
  between ~6 shuffles and ~24. The per-round action means cluster
  queries execute eagerly at build time — same contract posture as
  etl_csv_roundtrip's staging write (the driver only requires the
  returned DataFrame to be collectable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 12,
    early_exit: bool = False,
) -> DataFrame:
    """Cluster the undirected graph given by ``pairs`` (one row per
    edge). Returns one row per node that appears in any edge:
    (doc_id, cluster_id, cluster_size), cluster_id = min node id in the
    component — deterministic, so cross-engine hash-comparable.
    ``max_iters`` bounds the iteration count; with pointer jumping
    ~2*log2(component size) rounds suffice (12 covers anything a real
    dedup graph produces), and the label-sum convergence certificate
    exits the loop at the actual diameter — typically 2-3 rounds on a
    dedup graph — instead of paying the bound every time.

    ``early_exit=True`` runs one scalar Spark ACTION per round at
    plan-BUILD time (the certificate is data-dependent — no lazy plan
    can decide its own round count). The DEFAULT is the fixed-round
    fully-lazy form (``early_exit=False``): building a plan never
    executes jobs, so plan-inspection tooling and build-all-plans-first
    harnesses are safe by default (r5 ADVICE). Callers opt IN where the
    round savings are measured — the registered dedup cluster queries
    pass ``early_exit=True`` (diameter 2-3 vs the 4-round bound)."""
    e = pairs.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    )
    # Checkpoints: the edge list (the whole upstream dedup pipeline!)
    # and each round's labels materialize once and are shared by every
    # later reference.
    edges = e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    # decimal(38,0) so the certificate can't overflow at any node-id
    # scale (sum of 1e12 longs is exact in 38 digits, not in 63 bits)
    _sum_labels = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("label").cast("decimal(38,0)"))
    ).first()[0]
    prev_sum = None
    for _ in range(max_iters):
        # 1-hop propagation: every node offers its label to its neighbors.
        prop = edges.join(
            labels.select(F.col("id").alias("d"), "label"), "d"
        ).select(F.col("s").alias("id"), "label")
        labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        # pointer jump: label := label(label). Label values are node ids,
        # and every node id is a key of the label map, so the join is
        # total; coalesce is belt-and-braces for the fixed-point rows.
        jmap = labels.select(F.col("id").alias("jk"), F.col("label").alias("jv"))
        labels = (
            labels.join(jmap, F.col("label") == F.col("jk"), "left")
            .select("id", F.coalesce("jv", "label").alias("label"))
            .localCheckpoint(eager=False)
        )
        # early exit: labels only ever decrease, so an unchanged sum
        # proves a fixed point (see module docstring). The action also
        # materializes this round's checkpoint, so nothing runs twice.
        if early_exit:
            cur_sum = _sum_labels(labels)
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    w = Window.partitionBy("cluster_id")
    return (
        labels.select(
            F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .orderBy("doc_id")
    )


def pagerank_fixed_point(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    rounds: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank over the undirected dup graph in SCALED-INTEGER fixed
    point — centrality for dup clusters (which document is the hub of
    a near-dup family), the companion readout to components/coreness/
    triangles. Returns one row per node appearing in any edge:
    (doc_id, degree, pr_scaled, pr), where pr_scaled is the rank after
    ``rounds`` synchronous iterations of

        R_{t+1}(v) = TELEPORT + (damping_pct * Σ_{u~v} (R_t(u) div
                     deg(u))) div 100

    over BIGINTs, with R_0 = scale div N and TELEPORT =
    (scale * (100 - damping_pct)) div (100 * N); pr is the single
    final division pr_scaled / scale.

    WHY integers: float PageRank sums per-neighbor double
    contributions, and a distributed SUM's addition ORDER is
    partition-dependent — the result would differ run to run and
    engine to engine (un-hashable). Integer contributions (floor
    division by degree) make every per-round sum exact and order-free,
    so the whole iteration is deterministic and the DuckDB oracle
    replays it bit-for-bit — the fixed-point-accumulator discipline of
    functions/money.py applied to an iterative algorithm. The cost is
    a bounded truncation: each node's outflow loses < deg(u) scale
    units per round (< 1e-9 of total mass at the default scale), a
    systematic rank DEFLATION, never an ordering flip between nodes
    whose true ranks differ by more than the truncation envelope.

    Scale shape: per round, one equi-join of edges to the rank table +
    one groupBy(d) exact integer sum + one left join back to the node
    table — all hash shuffles on long keys, no broadcast of anything
    graph-proportional, no driver state beyond the one N count
    (collected once, the CC/codebook eager-scalar precedent). Rounds
    chain linearly; edges/degrees localCheckpoint once so the upstream
    dedup pipeline materializes exactly once."""
    e = pairs.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    )
    edges = e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).localCheckpoint(eager=False)
    deg = (
        edges.groupBy("s")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .localCheckpoint(eager=False)
    )
    n_nodes = deg.count()
    if n_nodes == 0:
        return deg.select(
            F.col("s").alias("doc_id"),
            F.col("deg").alias("degree"),
            F.lit(0).cast("long").alias("pr_scaled"),
            F.lit(0.0).alias("pr"),
        )
    r0 = scale // n_nodes
    teleport = (scale * (100 - damping_pct)) // (100 * n_nodes)
    r = deg.select("s", F.lit(r0).cast("long").alias("r"), "deg")
    for _ in range(rounds):
        contrib = r.select(
            F.col("s").alias("cs"), F.expr("r div deg").alias("c")
        )
        inn = (
            edges.join(contrib, F.col("s") == F.col("cs"))
            .groupBy("d")
            .agg(F.sum("c").cast("long").alias("t"))
            .select(F.col("d").alias("s"), "t")
        )
        r = deg.join(inn, "s", "left").select(
            "s",
            F.expr(
                f"CAST({teleport} AS BIGINT) + "
                f"(({damping_pct} * coalesce(t, CAST(0 AS BIGINT))) div 100)"
            ).alias("r"),
            "deg",
        )
    return r.select(
        F.col("s").alias("doc_id"),
        F.col("deg").cast("bigint").alias("degree"),
        F.col("r").alias("pr_scaled"),
        (F.col("r").cast("double") / F.lit(scale).cast("double")).alias("pr"),
    ).orderBy("doc_id")


def _peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Fixed-round k-core peel of a SYMMETRIZED edge list (s, d): each
    round drops every node whose current degree is < k, plus all its
    edges, by two left-semi joins against the surviving node set. The
    round count is FIXED (no data-dependent action), so the operator is
    a pure lazy plan and — crucially for the oracle contract — both
    engines execute the identical round count whether or not the peel
    has converged (extra rounds past the fixed point are no-ops).

    Scale shape: degree is one groupBy on the node key, the two
    endpoint filters are left-semi hash joins on the same key — every
    round is shuffle-on-node-id with fixed-width rows, no broadcast of
    anything graph-sized. localCheckpoint truncates the lineage each
    round (same rationale as connected_components: Catalyst re-plans
    referenced subtrees, and round r references round r-1 three times).
    """
    e = edges
    for _ in range(rounds):
        keep = (
            e.groupBy("s")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("s")
        )
        e = (
            e.join(keep, "s", "left_semi")
            .join(keep.select(F.col("s").alias("d")), "d", "left_semi")
            # per-round checkpoint, deliberately: each lazy
            # localCheckpoint costs ~0.35 s of driver planning
            # (measured, Spark 4.1 — .rdd plans the subtree), but a
            # 2-round stride was MEASURED SLOWER (build 1.58 s →
            # 2.24 s): planning the 9x-grown between-checkpoint subtree
            # outweighs the saved calls, so per-round is the optimum
            # (r15 opt, attempted and reverted with numbers).
            .localCheckpoint(eager=False)
        )
    return e


def coreness(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    k_max: int = 3,
    rounds: int = 4,
) -> DataFrame:
    """k-core decomposition of the near-dup pair graph: one row per
    node with its coreness = max k such that the node survives the
    k-core peel (capped at ``k_max``). Dup-graph reading: coreness 1 =
    docs in simple pair/chain clusters, coreness >= 2 = docs inside
    densely interconnected duplicate families (every member near-dups
    >= 2 others) — the families worth auditing before bulk removal,
    since a single false-positive pair can't create them.

    Peels INCREMENTALLY (the (k+1)-core is a subgraph of the k-core,
    so level k+1 starts from level k's surviving edges — standard
    degeneracy-ordering property), which keeps total work proportional
    to the shrinking core, not k_max rescans of the full graph.

    ``rounds`` is a fixed per-level round count, not a convergence
    loop: identical plans on both engines regardless of graph shape
    (see _peel). rounds=4 fully dissolves any sub-critical chain of
    <= ~8 nodes per level; the registered query's pytest pins fixpoint
    equality against a pure-Python peel on adversarial graphs.
    """
    e = pairs.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    )
    edges = e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).localCheckpoint(eager=False)
    levels = edges.select("s").distinct().withColumn("k", F.lit(1))
    cur = edges
    for k in range(2, k_max + 1):
        cur = _peel(cur, k, rounds)
        levels = levels.unionByName(
            cur.select("s").distinct().withColumn("k", F.lit(k))
        )
    return (
        levels.groupBy(F.col("s").alias("doc_id"))
        .agg(F.max("k").cast("int").alias("coreness"))
        .orderBy("doc_id")
    )


def triangle_counts(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list (one row
    per edge, endpoints distinct) — the third graph primitive next to
    connected_components (membership) and coreness (density): a
    triangle is the smallest unfakeable clique, so triangle-heavy dup
    clusters are mutually-confirming duplicate families while
    triangle-free ones hang on single pair edges.

    Algorithm: DEGREE-ORIENTED wedge counting (the standard
    distributed formulation): each edge is directed from its lower
    (degree, id) endpoint to its higher one, wedges are pairs of
    out-neighbors of a common center, and a wedge counts iff its
    closing edge exists. Orientation makes every out-degree
    O(sqrt(m)) regardless of how skewed the raw degree distribution
    is — the popular-node wedge explosion (deg^2 pairs at a hub) can't
    happen, which is the difference between this plan surviving a
    web-scale dup graph and not. Each triangle {x<y<z by key} is
    produced exactly once (at its lowest-key vertex).

    Everything is equi-joins/groupBys on node keys: degrees (one
    groupBy), orientation (two degree joins), wedges (self-join on the
    center), closure (join against the oriented edge list). Output:
    (doc_id, n_triangles) for every node in >= 1 triangle."""
    e = pairs.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    keyed = (
        e.join(deg.select(F.col("id").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("d").alias("db")), "b")
    )
    a_first = F.struct("da", "a") < F.struct("db", "b")
    # the oriented edge list is referenced THREE times (both wedge
    # sides and the closure probe) and Catalyst does not dedupe logical
    # subtrees — checkpoint it so the degree join runs once, not 3x
    # (same lineage discipline as connected_components/coreness;
    # measured 5.5s -> ~2s at sf0.1)
    o = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=False)
    w1 = o.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    w2 = o.select("u", F.col("v").alias("z"), F.col("dv").alias("dz"))
    wedges = w1.join(w2, "u").where(
        F.struct("dy", "y") < F.struct("dz", "z")
    )
    closed = wedges.join(
        o.select(F.col("u").alias("y"), F.col("v").alias("z")), ["y", "z"],
        "left_semi",
    )
    # one explode, not a 3-way union of selects: a union would make
    # Catalyst execute the wedge join (the expensive step) once per
    # branch
    nodes = closed.select(
        F.explode(F.array("u", "y", "z")).alias("doc_id")
    )
    return (
        nodes.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
        .orderBy("doc_id")
    )
