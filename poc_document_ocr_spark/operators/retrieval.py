"""BM25 inverted-index retrieval over the extracted corpus.

A training-data pipeline keeps a lexical retrieval path next to its
embedding ANN paths (``operators/similarity.py``): near-duplicate
*meaning* is caught by cosine, but benchmark decontamination, targeted
corpus carving ("every document matching this incident query"), and
RAG-style example mining all want exact-term relevance ranking at
corpus scale. This module is the Okapi BM25 (Robertson et al., TREC-3)
formulation re-expressed Spark-first.

Everything is INTEGER-EXACT so the DuckDB oracle replays the arithmetic
bit-for-bit (the repo-wide convention — no float crosses engines):

* the idf is computed in **half-log2-bits**: the exact rational
  ``r = (N + 1) / (df + 0.5) = (2N + 2) / (2df + 1)`` (the classic
  ``idf = ln((N - df + 0.5)/(df + 0.5) + 1)`` argument) is carried as
  the scaled integer ``R = (2N + 2) * 1024 div (2df + 1)``; one exact
  squaring ``R2 = R * R div 1024`` gives ``floor_log2(R2) - 10 ≈
  floor(2 * log2 r)``, read off as the bit length of an integer —
  ``length(bin(R2)) - 1`` in Spark, ``length(to_base(R2, 2)) - 1`` in
  DuckDB — so ``idf_ppm = (floor_log2(R2) - 10) * 500_000`` quantizes
  log2(r) to half-bit steps with zero floating point. ``R`` is capped
  at 2^30 (≈ log2 r = 20, far beyond any real-corpus idf) so the
  squaring stays inside BIGINT at any corpus size up to 10^12 docs.
* the tf saturation ``tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``
  runs in milli units (k1 = 1.2 → 1200, b = 0.75 → 750, avgdl in
  milli-tokens) with the one ×1e6 numerator DECIMAL(38,0)-widened
  (the ``mixture_weights`` overflow rule).

Scale shape (10¹² turns, 100 TB): the corpus side is tokenized ONCE,
map-only, and immediately semi-joined against the **broadcast query
vocabulary** — a bounded model-artifact-class side (tens of terms) —
so the only corpus-cardinality shuffle is the ``groupBy(term, doc)``
tf aggregation over *matching postings only* (map-side combinable).
``df`` per query term is a second, vocabulary-sized shuffle; the final
per-query ranking is a ``row_number`` window whose
``WindowGroupLimit`` prunes to k rows per query before the sort
completes. Nothing collects to the driver; the 1-row corpus stats
(N, total tokens) ride a broadcast cross join.

Reference analog: the reference ranks per-field contributions by
confidence and keeps rank 1 (``DocumentSchemaMapperService.cs:26-76``);
this is the corpus-level text-relevance generalization of that
rank-and-keep shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = ["bm25_topk", "retrieval_metrics", "ndcg_discount_table"]

#: log2 fixed-point scale (2^10) for the idf ratio
_S = 1024
#: cap on the scaled ratio R — keeps R*R inside BIGINT at any N
_R_CAP = 1 << 30


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1_m: int = 1200,
    b_m: int = 750,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query under integer-exact BM25.

    ``queries`` is ``(query_id, term)`` — one row per query term, a
    bounded (broadcast-class) set. Returns
    ``(query_id, doc_id, n_terms, score_ppm, rank)`` with ``rank`` 1..k
    per query (score desc, doc_id asc tie-break).

    ``k1_m``/``b_m`` are the Okapi constants in milli (1200/750 =
    the textbook 1.2/0.75).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.col(text_col), " "), lambda x: x != F.lit("")
        ).alias("_toks"),
    ).select(
        "doc_id", "_toks", F.size("_toks").cast("long").alias("dl")
    ).filter(F.col("dl") > 0)

    # 1-row corpus stats: N and avgdl (milli) — broadcast below.
    stats = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("sum(dl) * 1000 div count(1)").alias("avgdl_m"),
    )

    # Query vocabulary semi-join BEFORE any shuffle: only postings whose
    # term a query mentions ever leave the scan stage.
    qvocab = queries.select("term").distinct()
    hits = (
        toks.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .join(F.broadcast(qvocab), "term")
    )

    # The one corpus-cardinality shuffle: per-(term, doc) tf, map-side
    # combinable; dl rides along (functionally dependent on doc_id).
    tf = hits.groupBy("term", "doc_id", "dl").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )

    # Vocabulary-sized df → half-bit idf (see module docstring).
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        "df",
        F.expr(
            f"least((2 * n_docs + 2) * {_S} div (2 * df + 1),"
            f" {_R_CAP}L)"
        ).alias("_r"),
    ).select(
        "term",
        "df",
        (
            (
                F.length(F.bin(F.expr(f"_r * _r div {_S}"))) - F.lit(11)
            ).cast("long")
            * F.lit(500_000)
        ).alias("idf_ppm"),
    )

    scored = (
        tf.join(idf, "term")
        .join(queries, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.expr(
                f"""CAST(
                  CAST(idf_ppm AS DECIMAL(38,0)) *
                  (CAST(tf * (1000 + {k1_m}) AS DECIMAL(38,0)) * 1000000
                   div (tf * 1000 +
                        ({k1_m} * (1000 - {b_m} +
                          ({b_m} * (dl * 1000000 div avgdl_m)) div 1000))
                          div 1000))
                  div 1000000 AS BIGINT)"""
            ).alias("_contrib"),
        )
    )
    scores = scored.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("_contrib").cast("long").alias("score_ppm"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("score_ppm").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn(
            "rank", F.row_number().over(w).cast("int")
        )
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "n_terms", "score_ppm", "rank")
    )


def ndcg_discount_table(k: int) -> list[int]:
    """Integer micro-unit DCG discounts ``round(10⁶ / log2(r+1))`` for
    ranks 1..k — computed ONCE here in Python and embedded as literals
    in both the Spark plan and the DuckDB oracle, so the only log in
    the whole metric never crosses an engine boundary."""
    import math

    return [round(1_000_000 / math.log2(r + 1)) for r in range(1, k + 1)]


def retrieval_metrics(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 5,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval quality — precision@k, recall@k, MRR and
    nDCG@k — over any ranked result table (BM25, ANN, hybrid) and a
    binary relevance table ``qrels (query, doc)``; the eval harness a
    retrieval path needs before its output is trusted for
    decontamination or corpus carving.

    Exact integers throughout: the single transcendental (the DCG
    ``1/log2(r+1)`` discount) is a k-entry micro-unit literal table
    from :func:`ndcg_discount_table`, identical in both engines;
    ``idcg`` is the table's prefix sum at ``min(n_rel, k)``; everything
    else is counts and truncating ppm division. Queries in ``qrels``
    with no retrieved hit keep a row (zeros) — silently dropping them
    would inflate every mean downstream.

    Shape: the hits join is query+doc equi over the rank≤k slice (≤ k
    rows per query on each side), then one query-grain groupBy; the
    qrels side aggregates to n_rel per query. Everything after the two
    bounded joins is |queries| rows.

    Returns ``(query, n_rel, n_hits, prec_ppm, recall_ppm, rr_ppm,
    ndcg_ppm)``.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    d = ndcg_discount_table(k)
    prefix = []
    run = 0
    for v in d:
        run += v
        prefix.append(run)
    d_arr = F.array(*[F.lit(v).cast("long") for v in d])
    p_arr = F.array(*[F.lit(v).cast("long") for v in prefix])

    topk = ranked.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).alias("_r"),
    )
    rel = qrels.select(
        F.col(query_col).alias("_q"), F.col(doc_col).alias("_d")
    ).distinct()
    hits = (
        topk.join(rel, ["_q", "_d"])
        .groupBy("_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.min("_r").cast("long").alias("_first"),
            F.sum(F.element_at(d_arr, F.col("_r").cast("int")))
            .cast("long")
            .alias("_dcg"),
        )
    )
    nrel = rel.groupBy("_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    out = (
        nrel.join(hits, "_q", "left")
        .na.fill({"n_hits": 0, "_dcg": 0})
        .select(
            F.col("_q").alias(query_col),
            "n_rel",
            "n_hits",
            F.expr(f"CAST(n_hits * CAST(1000000 AS BIGINT) div {k}"
                   " AS BIGINT)").alias("prec_ppm"),
            F.expr(
                "CAST(n_hits * CAST(1000000 AS BIGINT)"
                " div greatest(n_rel, 1) AS BIGINT)"
            ).alias("recall_ppm"),
            F.coalesce(
                F.expr("CAST(CAST(1000000 AS BIGINT) div _first"
                       " AS BIGINT)"),
                F.lit(0).cast("long"),
            ).alias("rr_ppm"),
            F.col("_dcg"),
            F.element_at(
                p_arr, F.least(F.col("n_rel"), F.lit(k)).cast("int")
            ).alias("_idcg"),
        )
        .withColumn(
            "ndcg_ppm",
            F.expr(
                "CAST(_dcg * CAST(1000000 AS BIGINT) div _idcg AS BIGINT)"
            ),
        )
        .drop("_dcg", "_idcg")
    )
    return out
