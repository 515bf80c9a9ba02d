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

__all__ = ["bm25_topk"]

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
