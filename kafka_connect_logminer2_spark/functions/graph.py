"""Graph operators over DataFrame edge lists — degree/strength profiles
and PageRank power iteration. Corpus-curation relevance: link-graph
centrality is a standard web-crawl quality signal (rank domains/pages
before sampling training documents), and the TPC-H customer–supplier
bipartite graph (who buys through whom, via lineitem ⋈ orders) gives the
fixtures a real multi-edge weighted graph to run it on.

Scale design:
- Edges are the ONLY large state. They are built once, weighted
  (multi-edges pre-aggregated so the per-iteration join moves one row per
  (src, dst), not one per original lineitem), and persisted partitioned
  by ``src`` — every iteration's join then reuses the same hash
  partitioning for the edge side; only the (node, rank) table (2 narrow
  columns) reshuffles per iteration.
- Ranks never leave the cluster: contributions are an edges ⋈ ranks join
  + groupBy(dst) partial-aggregated sum. The only driver-side values per
  iteration are two scalars (dangling mass, optional L1 delta) — k×8
  bytes, never O(nodes).
- Lineage is cut with localCheckpoint every few iterations (iterative
  DataFrame plans otherwise grow exponentially in optimizer time — the
  classic Spark power-iteration trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def undirected(edges: DataFrame) -> DataFrame:
    """Symmetrize a weighted edge list (src, dst, weight): union the
    reversed edges and re-aggregate so parallel a→b / b→a pairs fold."""
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    return (
        edges.unionByName(rev)
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node degree profile of a DIRECTED weighted edge list: out/in
    degree (distinct neighbors) and out/in strength (summed weights).
    Two partial-aggregated exchanges (one per direction) + an outer merge
    on node; nothing wider than (node, 4 numbers) ever shuffles."""
    out = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree"),
        F.sum("weight").alias("out_strength"),
    )
    inn = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree"),
        F.sum("weight").alias("in_strength"),
    )
    return (
        out.join(inn, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("out_strength", F.lit(0)).alias("out_strength"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("in_strength", F.lit(0)).alias("in_strength"),
        )
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Weighted PageRank by power iteration on a directed edge list
    (src, dst, weight): rank' = (1−d)/n + d·(Σ_in rank·w/strength_out +
    dangling_mass/n). Returns (node, rank), Σ rank = 1.

    Contract notes: transition weights are row-normalized by out-STRENGTH
    (weighted random walk); dangling nodes (no out-edges) teleport
    uniformly — their mass is the per-iteration scalar collect. Fixed
    iteration count keeps the op deterministic (same plan every run);
    convergence-based stopping would read the L1 delta scalar instead.
    Ground truth: dense numpy power iteration on the same matrix
    (tests/test_graph.py), same role as k-means/PCA's NumPy-truth gates —
    iterative linear algebra has no SQL oracle."""
    edges = edges.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # edge side: normalize once, partition once, reuse every iteration
    out_s = edges.groupBy("src").agg(F.sum("weight").alias("_s"))
    trans = (
        edges.join(out_s, "src")
        .select("src", "dst", (F.col("weight") / F.col("_s")).alias("p"))
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    has_out = trans.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=False
    )
    for i in range(n_iter):
        # dangling mass rides the plan as a broadcast 1-row aggregate —
        # NO per-iteration driver collect, so the whole span between two
        # checkpoints is one lazy plan (k iterations ⇒ ~k/checkpoint_every
        # jobs, not 2k): the fixed dangling-node set's current rank sum.
        d_mass = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        contribs = (
            trans.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("_c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .join(F.broadcast(d_mass))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("_dm") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce("_c", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint()  # cut the iterative lineage
    return ranks


def triangle_listing(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle listing via DEGREE ORIENTATION (the MapReduce
    triangle algorithm of Suri & Vassilvitskii 2011): orient every
    undirected edge from its lower-(degree, id) endpoint to the higher,
    build wedges only from each vertex's OUT-neighbors, close them
    against the oriented edge set. Each triangle appears exactly once as
    (a → b → c) with a < b < c in the (degree, id) total order.

    Why orientation is THE scale lever: naive wedge-building does
    Σ deg(v)² work — a single celebrity vertex with degree 10⁷ alone
    generates 10¹⁴ wedges. Orientation bounds out-degree by the
    (degree, id) order, so wedge work is Σ outdeg(v)² = O(m^1.5) for ANY
    degree distribution — skew-proof by construction, no salting needed.
    Two self-equi-joins on 8-byte keys; no vertex neighborhood is ever
    collected.

    Input: undirected edges, one row per edge, ``src`` < ``dst``
    (deduped). Output: (a, b, c) triangle rows in orientation order.
    """
    # Barrier the (possibly expensive) edge-derivation lineage: e feeds the
    # degree aggregate AND the oriented relation, and `oriented` below feeds
    # THREE consumers (two wedge sides + the closer). Without the barriers
    # the full upstream plan is inlined once per reference — q152's compiled
    # plan held 60 copies of the lineitem scan (1,999 plan lines, 154
    # Exchanges) and the optimizer alone paid for the blow-up (guide §3.3:
    # very wide plans, materialize intermediates).
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=False
    )
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(fwd, F.col("du")).otherwise(F.col("dv")).alias("da"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).localCheckpoint(eager=False)  # three consumers below
    o1 = oriented.select("a", F.col("b").alias("b1"), F.col("db").alias("d1"))
    o2 = oriented.select("a", F.col("b").alias("b2"), F.col("db").alias("d2"))
    wedges = o1.join(o2, "a").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("b1") < F.col("b2")))
    )
    closer = oriented.select(F.col("a").alias("b1"), F.col("b").alias("b2"))
    return wedges.join(closer, ["b1", "b2"]).select(
        F.col("a"), F.col("b1").alias("b"), F.col("b2").alias("c")
    )
