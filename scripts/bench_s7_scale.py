"""Scale points for the round-4 SESSION-6/7 operators (conversation
near-dup, leak-proof cluster split, asymmetric containment, compression
ratio, conv-key skew report, BM25 retrieval, prefix forks, screen
agreement, pair length bias — none had a corpus-scale measurement yet).

Inputs, all deterministic (same harness family as bench_s4_scale.py):

* transcripts — the 1.88M-turn bench corpus (18.8M at scale=1);
* documents — the extracted texts with conv-hash lang labels (the
  bench_s4_scale construction);
* BM25 queries — 16 deterministic 3-term queries drawn from hash-chosen
  documents' leading tokens (bounded, broadcast-class, like production
  query sets).

One timed run per op after a small-slice warm-up; per-window hypervisor
steal share sampled (>2% = soft number). Run after bench.py populated
``.bench_cache``::

    python scripts/bench_s7_scale.py [op ...]            # 1.88M rows
    SPARK_GRAFT_BENCH_SCALE=1 python scripts/bench_s7_scale.py  # 18.8M
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from poc_document_ocr_spark.session import get_spark
from scripts._bench_common import steal_sample as _steal_sample

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def conv_docs(turns):
    """Conversation-granularity documents: ordered turn concat, one
    groupBy(conv_id) with per-conv bounded state."""
    return turns.groupBy("conv_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                lambda x: F.coalesce(x["text"], F.lit("")),
            ),
        ).alias("text")
    )


def bm25_queries(docs):
    """16 deterministic 3-term queries from hash-chosen documents."""
    qdocs = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(100_000)) == 7)
    raw = qdocs.select(
        F.concat(F.lit("q"), F.col("doc_id").cast("string")).alias(
            "query_id"
        ),
        F.split("text", " ").alias("_raw"),
        F.pmod(F.xxhash64("doc_id"), F.lit(16)).alias("_slot"),
    )
    # one query per hash slot → exactly ≤16 queries however big the corpus
    first = raw.groupBy("_slot").agg(
        F.min(F.struct("query_id", "_raw")).alias("_q")
    )
    return (
        first.select(
            F.col("_q.query_id").alias("query_id"),
            F.explode(
                F.array(
                    F.try_element_at("_q._raw", F.lit(2)),
                    F.try_element_at("_q._raw", F.lit(3)),
                    F.try_element_at("_q._raw", F.lit(4)),
                )
            ).alias("term"),
        )
        .filter(F.col("term").isNotNull() & (F.col("term") != ""))
        .distinct()
    )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "0.1")
    only = set(sys.argv[1:])
    spark = get_spark(
        "bench_s7_scale", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)
        },
    )
    from poc_document_ocr_spark.entrypoints import prefix_fork_families
    from poc_document_ocr_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
        snapshot_diff,
        word_shingles,
    )
    from poc_document_ocr_spark.operators.examples import pair_length_bias
    from poc_document_ocr_spark.operators.graph import triangle_counts
    from poc_document_ocr_spark.operators.retrieval import bm25_topk
    from poc_document_ocr_spark.operators.sampling import (
        hash_split,
        mix_drift_report,
        skew_report,
        source_frequency_cap,
    )
    from pyspark.sql import Window as PW

    from poc_document_ocr_spark.operators.textstats import (
        compression_ratio,
        lang_id,
        lm_quality_bands,
        number_support,
        pmi_collocations,
        quality_score,
        screen_agreement,
        source_boilerplate_share,
        winnow_containment_pairs,
        winnow_fingerprints,
    )

    def _langid_confusion_job(d):
        pred = lang_id(d, keep=("lang",))
        cells = pred.groupBy("lang", "pred_lang").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs")
        )
        return cells.select(
            "lang", "pred_lang", "n_docs",
            F.sum("n_docs").over(PW.partitionBy("lang"))
            .cast("long").alias("n_true"),
            F.sum("n_docs").over(PW.partitionBy("pred_lang"))
            .cast("long").alias("n_pred"),
        )

    extracted = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", f"extracted_{scale}.parquet")
    )
    turns = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", f"transcripts_{scale}_v2.parquet")
    )
    docs = extracted.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
        F.col("extracted_text").alias("text"),
        F.concat(
            F.lit("lang"), F.pmod(F.xxhash64("conv_id"), F.lit(5))
        ).alias("lang"),
    )

    def consume(df):
        cols = [F.col(c) for c in df.columns]
        return df.select(F.xxhash64(*cols).alias("_h")).agg(
            F.expr("bit_xor(_h)")
        ).collect()

    def _boiler_share_job(d):
        srcd = d.select(
            "doc_id",
            F.concat(
                F.lit("src"), F.pmod(F.xxhash64("doc_id"), F.lit(20))
            ).alias("source"),
        )
        return source_boilerplate_share(
            winnow_fingerprints(d, k=8, w=4),
            srcd,
        )

    def _dup_triangles_job(d):
        # planted TRIPLES: base half + two identical twins per base doc
        # -> every base doc seeds a 3-clique (twin-twin edge certain,
        # base-twin edges probabilistic like the other LSH benches)
        base = d.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
        t1 = base.select(
            (F.col("doc_id") + F.lit(10**12)).alias("doc_id"),
            F.concat("text", F.lit(" extra trailing token")).alias("text"),
        )
        t2 = base.select(
            (F.col("doc_id") + F.lit(2 * 10**12)).alias("doc_id"),
            F.concat("text", F.lit(" extra trailing token")).alias("text"),
        )
        corpus = base.select("doc_id", "text").unionByName(t1).unionByName(t2)
        pairs = lsh_candidate_pairs(
            minhash_signatures(word_shingles(corpus))
        )
        return triangle_counts(pairs)

    def _source_cap_job(d):
        srcd = d.select(
            "doc_id",
            F.concat(
                F.lit("src"), F.pmod(F.xxhash64("doc_id"), F.lit(20))
            ).alias("source"),
        )
        return source_frequency_cap(srcd, cap=50_000)

    def _snapshot_diff_job(d):
        a = d.select(
            "doc_id",
            "text",
            F.concat(
                F.lit("src"), F.pmod(F.xxhash64("doc_id"), F.lit(20))
            ).alias("source"),
        )
        b = (
            a.filter(F.col("doc_id") % 7 != 1)
            .select(
                "doc_id",
                "source",
                F.when(
                    F.col("doc_id") % 5 == 3,
                    F.concat("text", F.lit(" changed")),
                ).otherwise(F.col("text")).alias("text"),
            )
            .unionByName(
                a.filter(F.col("doc_id") % 9 == 2).select(
                    (F.col("doc_id") + F.lit(10**12)).alias("doc_id"),
                    "source",
                    "text",
                )
            )
        )
        return snapshot_diff(a, b)

    def _number_support_job(t):
        return number_support(t)

    def _mix_drift_job(d):
        # 20 hash-derived sources, snapshot halves on a second hash —
        # the q_mix_drift shape at corpus cardinality
        srcd = d.select(
            "doc_id",
            F.concat(
                F.lit("src"), F.pmod(F.xxhash64("doc_id"), F.lit(20))
            ).alias("source"),
        )
        in_a = (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            < "8"
        )
        return mix_drift_report(srcd, in_a)

    def _conv_neardup_job(t):
        cd = conv_docs(t)
        sel = F.substring(F.md5("conv_id"), 1, 1).isin("0", "1", "2")
        twin = cd.filter(sel).select(
            F.concat("conv_id", F.lit("~b")).alias("conv_id"),
            F.concat("text", F.lit(" extra trailing token")).alias("text"),
        )
        corpus = cd.unionByName(twin)
        return lsh_candidate_pairs(
            minhash_signatures(word_shingles(corpus, id_col="conv_id"),
                               id_col="conv_id"),
            id_col="conv_id",
        )

    def _cluster_split_job(d):
        base = d.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
        near = base.select(
            (F.col("doc_id") + F.lit(10**12)).alias("doc_id"),
            F.concat("text", F.lit(" extra trailing token")).alias("text"),
        )
        corpus = base.select("doc_id", "text").unionByName(near)
        pairs = lsh_candidate_pairs(
            minhash_signatures(word_shingles(corpus))
        )
        comp = connected_components(pairs)
        comps = (
            corpus.select("doc_id")
            .join(comp, corpus["doc_id"] == comp["node"], "left")
            .select(
                "doc_id",
                F.coalesce("component", "doc_id").alias("component"),
            )
        )
        return hash_split(
            comps, {"train": 0.8, "val": 0.1, "test": 0.1},
            id_col="component",
        ).select("doc_id", "component", "split")

    jobs = {
        "conv_neardup": lambda: consume(_conv_neardup_job(turns)),
        "cluster_split": lambda: consume(_cluster_split_job(docs)),
        "containment": lambda: consume(
            winnow_containment_pairs(
                winnow_fingerprints(docs, k=8, w=4),
                min_df=2, max_df=10, min_shared=5,
            )
        ),
        "compress_ratio": lambda: consume(compression_ratio(docs)),
        "skew_report": lambda: consume(
            skew_report(turns, "conv_id", topn=10)
        ),
        "bm25_topk": lambda: consume(
            bm25_topk(docs, bm25_queries(docs).localCheckpoint(), k=5)
        ),
        "prefix_forks": lambda: consume(
            prefix_fork_families(turns, max_depth=6)
        ),
        "screen_agreement": lambda: consume(
            screen_agreement(
                quality_score(docs).select(
                    "doc_id", F.col("keep").alias("keep_a")
                ).join(
                    lm_quality_bands(docs).select(
                        "doc_id",
                        (F.col("band") != "tail").alias("keep_b"),
                    ),
                    "doc_id",
                )
            )
        ),
        "length_bias": lambda: consume(pair_length_bias(turns)),
        "pmi_pairs": lambda: consume(
            pmi_collocations(docs, min_count=5)
        ),
        "langid_confusion": lambda: consume(_langid_confusion_job(docs)),
        "mix_drift": lambda: consume(_mix_drift_job(docs)),
        "boiler_share": lambda: consume(_boiler_share_job(docs)),
        "dup_triangles": lambda: consume(_dup_triangles_job(docs)),
        "source_cap": lambda: consume(_source_cap_job(docs)),
        "snapshot_diff": lambda: consume(_snapshot_diff_job(docs)),
        "number_support": lambda: consume(_number_support_job(turns)),
    }

    unknown = only - set(jobs)
    if unknown:
        raise SystemExit(f"unknown op name(s): {sorted(unknown)}; "
                         f"choose from {sorted(jobs)}")
    selected = {n: f for n, f in jobs.items() if not only or n in only}

    small_t = turns.limit(5000).localCheckpoint()
    small_d = docs.limit(5000).localCheckpoint()
    warmups = {
        "conv_neardup": lambda: consume(_conv_neardup_job(small_t)),
        "cluster_split": lambda: consume(_cluster_split_job(small_d)),
        "containment": lambda: consume(
            winnow_containment_pairs(
                winnow_fingerprints(small_d, k=8, w=4),
                min_df=2, max_df=10, min_shared=5,
            )
        ),
        "compress_ratio": lambda: consume(compression_ratio(small_d)),
        "skew_report": lambda: consume(
            skew_report(small_t, "conv_id", topn=10)
        ),
        "bm25_topk": lambda: consume(
            bm25_topk(small_d, bm25_queries(small_d).localCheckpoint(),
                      k=5)
        ),
        "prefix_forks": lambda: consume(
            prefix_fork_families(small_t, max_depth=6)
        ),
        "screen_agreement": lambda: consume(
            screen_agreement(
                quality_score(small_d).select(
                    "doc_id", F.col("keep").alias("keep_a")
                ).join(
                    lm_quality_bands(small_d).select(
                        "doc_id",
                        (F.col("band") != "tail").alias("keep_b"),
                    ),
                    "doc_id",
                )
            )
        ),
        "length_bias": lambda: consume(pair_length_bias(small_t)),
        "pmi_pairs": lambda: consume(
            pmi_collocations(small_d, min_count=5)
        ),
        "langid_confusion": lambda: consume(
            _langid_confusion_job(small_d)
        ),
        "mix_drift": lambda: consume(_mix_drift_job(small_d)),
        "boiler_share": lambda: consume(_boiler_share_job(small_d)),
        "dup_triangles": lambda: consume(_dup_triangles_job(small_d)),
        "source_cap": lambda: consume(_source_cap_job(small_d)),
        "snapshot_diff": lambda: consume(_snapshot_diff_job(small_d)),
        "number_support": lambda: consume(_number_support_job(small_t)),
    }
    for name in selected:
        warmups[name]()

    timings, steal = {}, {}
    for name, fn in selected.items():
        spark.catalog.clearCache()
        s0, j0 = _steal_sample()
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 2)
        s1, j1 = _steal_sample()
        steal[name] = round((s1 - s0) / max(j1 - j0, 1), 4)

    print(json.dumps({"scale": scale, "timings": timings, "steal": steal}))


if __name__ == "__main__":
    main()
