"""Iterative graph centrality over document-similarity graphs
(PageRank with fixed unrolled iterations, integer-exact).

A web-scale curation pass uses link/similarity-graph centrality as a
quality and template signal: in a near-duplicate candidate graph, the
high-centrality nodes are the boilerplate templates every crawl variant
links to (the hubs a keep-best election should prefer to drop), and in a
reference/citation graph centrality is the classic page-quality prior
(Page et al. 1999, "The PageRank citation ranking"). This module fits
the repo's determinism contract: ranks are parts-per-million BIGINTs,
every multiply is DECIMAL(38,0)-widened before integral division (the
ANSI overflow rule — BIGINT multiply aborts past ~9.2e18), and a FIXED
iteration count makes the computation a finite expression a DuckDB
oracle replays bit-for-bit, not a convergence loop.

Reference analog: the reference ranks per-document field contributions
by confidence (``DocumentSchemaMapperService.cs``) — a local argmax;
this is the graph-global generalization where a node's score is defined
by its neighbors' scores.

Scale shape (10⁹–10¹² nodes): the degree-annotated edge table and the
node set are each lazily ``localCheckpoint``-ed ONCE; every iteration is
then join(ranks ⋈ edges on node) → groupBy(dst) inflow → left-join back
to nodes — three corpus-cardinality hash shuffles per iteration, the
canonical distributed PageRank shape, with per-iteration rank
checkpoints keeping plan depth O(1) in the iteration count (the
``connected_components`` lineage rule). No driver-side collect at any
point; nothing is broadcast (every side is corpus-cardinality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "triangle_counts", "DAMPING_PPM"]

#: the classic 0.85 damping factor in parts-per-million
DAMPING_PPM = 850_000


def pagerank(
    nodes: DataFrame,
    pairs: DataFrame,
    iters: int = 2,
    damping_ppm: int = DAMPING_PPM,
    id_col: str = "doc_id",
) -> DataFrame:
    """Integer-exact PageRank over an UNDIRECTED pair graph.

    ``nodes`` is the full node set (one row per ``id_col``; isolated
    nodes are legal and keep the base rank). ``pairs`` is an undirected
    edge list ``(id_a, id_b)`` — near-dup candidates, shared-fingerprint
    pairs, citation links — materialized here in both orientations.

    Update rule, all BIGINT ppm arithmetic::

        contrib_j = s_j DIV deg_j                 (integral division)
        s_i' = (1e6 - d) + (d · Σ_j contrib_j) DIV 1e6

    with the ``d · inflow`` product DECIMAL(38,0)-widened (inflow is
    bounded by Σ s = n·1e6, which alone overflows a BIGINT multiply past
    ~9.2e12 nodes). Initial rank 1e6 per node. Dangling/isolated nodes
    simply keep the ``(1e6 - d)`` base — the simplified variant without
    dangling-mass redistribution, documented so the oracle replays it
    exactly; total mass therefore shrinks slightly per iteration rather
    than being conserved.

    Returns ``(id, n_neighbors, rank_ppm)`` — one row per input node.
    """
    base = 1_000_000 - damping_ppm
    e = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(
            pairs.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst")
            )
        )
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # degree-annotated edges and the node set are static across
    # iterations — checkpoint once so iterations never re-derive the
    # pair generation (LSH banding upstream is the expensive part) or
    # re-scan the corpus for the node ids
    e = e.join(deg, "src").localCheckpoint(eager=False)
    n = nodes.select(F.col(id_col).alias("node")).localCheckpoint(
        eager=False
    )
    s = n.select("node", F.lit(1_000_000).cast("long").alias("s"))
    for _ in range(iters):
        inflow = (
            e.join(s, e["src"] == s["node"])
            .select(F.col("dst"), F.expr("s div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        s = (
            n.join(inflow, n["node"] == inflow["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"CAST(CAST(coalesce(inflow, 0L) AS DECIMAL(38,0))"
                        f" * {damping_ppm} div 1000000 AS BIGINT)"
                    )
                ).alias("s"),
            )
            .localCheckpoint(eager=False)
        )
    # recount the degree from the CHECKPOINTED edge table — joining the
    # pre-checkpoint `deg` here would drag the whole pair-generation
    # lineage back into the output plan
    degf = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    return (
        n.join(degf, n["node"] == degf["src"], "left")
        .join(s, "node")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("deg", F.lit(0).cast("long")).alias("n_neighbors"),
            F.col("s").alias("rank_ppm"),
        )
    )


def triangle_counts(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Exact per-node triangle counts and local clustering coefficient
    over an undirected pair graph — the cluster-cohesion audit for a
    near-dup candidate graph: true duplicate groups are cliques (every
    member pairs with every other, clustering ≈ 1), while LSH
    false-positive chains are triangle-free paths (clustering ≈ 0), so
    a low coefficient on a large component flags transitive-closure
    over-merging BEFORE a keep-best election collapses distinct
    documents. Algorithm: degree-ordered edge-iterator (Suri &
    Vassilvitskii, WWW'11 "Counting triangles and the curse of the last
    reducer" — the canonical MapReduce formulation, public).

    Shape at 10⁹ edges: edges are directed low→high in the total order
    ``(deg, node)``, which caps every node's out-degree at O(√m) —
    wedge enumeration at a 10⁷-degree crawl hub becomes ~10³·10³
    instead of 10⁷·10⁷ (the "last reducer" fix). Wedges self-join on
    the ordered source, close with one equi-join against the directed
    edge set, and every count partial-aggregates map-side. Nothing is
    broadcast (all sides are corpus-cardinality); duplicate input pairs
    and self-loops are scrubbed first.

    Returns ``(node, deg, n_tri, clust_ppm)`` — one row per node with
    degree ≥ 1; ``clust_ppm = 2·n_tri·10⁶ div (deg·(deg−1))`` in exact
    integer ppm (NULL where deg < 2 leaves it undefined → 0 denominator
    is emitted as NULL-free 0 via the deg≥2 guard).
    """
    und = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("lo"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    deg = (
        und.select(F.col("lo").alias("node"))
        .unionAll(und.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    # direct each edge from the (deg, node)-smaller endpoint to the
    # larger; the edge table is static across both joins — checkpoint
    # so the wedge self-join and the closing join share one lineage
    d = (
        und.join(deg.withColumnRenamed("node", "lo"), "lo")
        .withColumnRenamed("deg", "deg_lo")
        .join(
            deg.select(
                F.col("node").alias("hi"), F.col("deg").alias("deg_hi")
            ),
            "hi",
        )
        .select(
            F.when(
                (F.col("deg_lo") < F.col("deg_hi"))
                | (
                    (F.col("deg_lo") == F.col("deg_hi"))
                    & (F.col("lo") < F.col("hi"))
                ),
                F.struct(
                    F.col("lo").alias("src"),
                    F.col("hi").alias("dst"),
                    F.col("deg_hi").alias("ddeg"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("hi").alias("src"),
                    F.col("lo").alias("dst"),
                    F.col("deg_lo").alias("ddeg"),
                )
            )
            .alias("e")
        )
        .select("e.src", "e.dst", "e.ddeg")
        .localCheckpoint(eager=False)
    )
    # wedge (v, w) at u keeps v strictly below w in the SAME
    # (deg, node) total order that directed the edges, so the closing
    # edge — if the triangle exists — is stored exactly as (v → w)
    w1 = d.select(
        F.col("src"), F.col("dst").alias("v"), F.col("ddeg").alias("dv")
    )
    w2 = d.select(
        F.col("src"), F.col("dst").alias("w"), F.col("ddeg").alias("dw")
    )
    wedges = w1.join(w2, "src").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    tris = wedges.join(
        d.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
    ).select(
        F.col("src").alias("a"), F.col("v").alias("b"), F.col("w").alias("c")
    )
    per_node = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "deg",
        F.coalesce("n_tri", F.lit(0).cast("long")).alias("n_tri"),
        F.when(
            F.col("deg") >= 2,
            F.expr(
                "CAST(CAST(coalesce(n_tri, 0L) AS DECIMAL(38,0)) * 2000000"
                " div (deg * (deg - 1)) AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("clust_ppm"),
    )
