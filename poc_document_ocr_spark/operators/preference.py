"""Pairwise-preference strength fitting over transcript matches
(Bradley-Terry via minorization-maximization).

An RLHF / arena-style data pipeline reduces "which responder is
better?" to a stream of pairwise outcomes and fits a strength per
competitor — the Bradley-Terry model, fit by the MM update of Hunter
(arXiv:math/0412004, "MM algorithms for generalized Bradley-Terry
models", eq. 1.6)::

    s_i' = W_i / sum_j ( n_ij / (s_i + s_j) )

where ``W_i`` is item i's total wins and ``n_ij`` the number of matches
between i and j. Everything here is INTEGER-EXACT (strengths in ppm,
DECIMAL(38,0)-widened multiplies before integral division) so the DuckDB
oracle replays the arithmetic bit-for-bit — the same convention as
``mixture_weights`` — and a fixed iteration count keeps the computation
a finite, deterministic expression rather than a convergence loop.

Reference analog: the reference ranks field contributions by confidence
and keeps rank 1 (``DocumentSchemaMapperService.cs``); this module is
the corpus-level generalization — a *global* ranking fit from noisy
pairwise comparisons instead of a per-document argmax.

Scale shape (10¹² turns): ONE corpus-cardinality shuffle (the
``groupBy(winner, loser)`` match-count aggregation, map-side
combinable); every MM iteration then runs on the BOUNDED competitor
set (|variants|² pair rows — a model artifact, broadcast-class), so the
iteration cost is independent of corpus size and no corpus bytes move
after the first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = ["assistant_matches", "bt_strength"]

#: strengths are parts-per-million integers; init = 1.0 ≡ 1e6
_PPM = 1_000_000


def assistant_matches(
    t: DataFrame, variant_col: str = "variant"
) -> DataFrame:
    """Pairwise matches from a transcript stream: consecutive
    ``assistant`` turns within a conversation compete; the longer
    response wins (ties → the earlier turn). Same-variant pairs carry no
    ranking signal and are dropped.

    One lag-style window under the conversation partitioning (the same
    shuffle key as extraction — composing after it adds no Exchange),
    emitting ``(winner, loser)``. NULL text counts as the empty string
    (the cross-engine NULL rule shared with ``preference_pairs``).
    """
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    a = t.filter(F.col("role") == "assistant").select(
        "conv_id",
        "turn_idx",
        F.col(variant_col).alias("v1"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("l1"),
    )
    nxt = a.select(
        "v1",
        "l1",
        F.lead("v1").over(w).alias("v2"),
        F.lead("l1").over(w).alias("l2"),
    ).filter(F.col("v2").isNotNull() & (F.col("v1") != F.col("v2")))
    win_first = F.col("l1") >= F.col("l2")
    return nxt.select(
        F.when(win_first, F.col("v1")).otherwise(F.col("v2")).alias(
            "winner"
        ),
        F.when(win_first, F.col("v2")).otherwise(F.col("v1")).alias(
            "loser"
        ),
    )


def bt_strength(matches: DataFrame, iters: int = 2) -> DataFrame:
    """Bradley-Terry strengths from a ``(winner, loser)`` match stream:
    ``iters`` unrolled MM updates in exact ppm integer arithmetic,
    renormalized each step so ``Σ strengths = n_items · 1e6`` (BT is
    scale-invariant; the renormalization pins one deterministic
    representative).

    Integer contract: each update computes
    ``term_ij = n_ij · 1e6 DIV (s_i + s_j)`` and
    ``s_i' = W_i · 1e6 DIV max(Σ_j term_ij, 1)`` with the ×1e6
    numerators DECIMAL(38,0)-widened first — under ANSI mode a plain
    BIGINT multiply would abort beyond ~9.2e12 matches per pair
    (the mixture_weights overflow class); the widened form is exact to
    10³⁸. The ``max(·, 1)`` guard only engages when every term floors
    to zero (possible at toy scale where n_ij·1e6 < s_i + s_j).

    The directed match-count table (the output of the ONE corpus
    shuffle) is lazily ``localCheckpoint``-ed, as is each iteration's
    strength vector: without the first, every bounded re-derivation in
    the unrolled iterations drags the full corpus lineage along (the
    composed plan re-scanned the corpus 85× before the fix — the
    round-4 plan-audit catch); without the second, plan depth doubles
    per iteration (``s`` feeds both join sides). Both tables are
    |variants|-bounded, so the checkpointed blocks are model-artifact
    sized. Same lineage-truncation pattern as ``connected_components``.

    Returns one row per competitor:
    ``(variant, n_matches, n_wins, strength_ppm)``.
    """
    dm = matches.groupBy("winner", "loser").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).localCheckpoint(eager=False)
    # undirected pair counts, materialized in both (i, j) orientations so
    # the per-item denominator is one groupBy(i) over |variants|^2 rows
    pairs = (
        dm.select(F.col("winner").alias("i"), F.col("loser").alias("j"), "n")
        .unionAll(
            dm.select(
                F.col("loser").alias("i"), F.col("winner").alias("j"), "n"
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("n").cast("long").alias("n_ij"))
    )
    wins = dm.groupBy("winner").agg(F.sum("n").cast("long").alias("n_wins"))
    items = (
        pairs.groupBy("i")
        .agg(F.sum("n_ij").cast("long").alias("n_matches"))
        .join(wins, F.col("i") == F.col("winner"), "left")
        .select(
            F.col("i").alias("variant"),
            "n_matches",
            F.coalesce("n_wins", F.lit(0).cast("long")).alias("n_wins"),
        )
    )
    s = items.select(
        "variant", F.lit(_PPM).cast("long").alias("s")
    )
    for _ in range(iters):
        si = s.select(F.col("variant").alias("i"), F.col("s").alias("s_i"))
        sj = s.select(F.col("variant").alias("j"), F.col("s").alias("s_j"))
        denom = (
            pairs.join(si, "i")
            .join(sj, "j")
            .select(
                "i",
                F.expr(
                    "CAST(CAST(n_ij AS DECIMAL(38,0)) * 1000000"
                    " div (s_i + s_j) AS BIGINT)"
                ).alias("_term"),
            )
            .groupBy("i")
            .agg(F.sum("_term").cast("long").alias("_denom"))
        )
        raw = (
            items.join(denom, items["variant"] == denom["i"])
            .select(
                "variant",
                F.expr(
                    "CAST(CAST(n_wins AS DECIMAL(38,0)) * 1000000"
                    " div greatest(_denom, 1L) AS BIGINT)"
                ).alias("s_raw"),
            )
        )
        tot = raw.agg(
            F.sum("s_raw").cast("long").alias("_tot"),
            F.count(F.lit(1)).cast("long").alias("_k"),
        )
        s = raw.crossJoin(F.broadcast(tot)).select(
            "variant",
            F.expr(
                "CAST(CAST(s_raw AS DECIMAL(38,0)) * (_k * 1000000)"
                " div _tot AS BIGINT)"
            ).alias("s"),
        ).localCheckpoint(eager=False)
    return items.join(s, "variant").select(
        "variant",
        "n_matches",
        "n_wins",
        F.col("s").alias("strength_ppm"),
    )
