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

__all__ = ["pagerank", "DAMPING_PPM"]

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
