"""Scale points for the round-4 SESSION-9/10 operators (cross-source
syndication matrix, dedup survivorship bias, temporal holdout straddle
audit, code-switching profile, encoding screen, novelty curve, MinHash
calibration — none had a corpus-scale measurement yet).

Inputs, all deterministic (same harness family as bench_s7_scale.py):

* documents — the extracted texts of the 1.88M-turn bench corpus with 20
  hash-derived crawl sources;
* mirror corpus — base docs plus trailing-token near-dup copies of ~40%
  of them under three ``mirror-*`` sources at ``doc_id + 10^12`` (the
  planted syndication the matrix/survivorship/straddle audits measure);
* turns — the raw transcripts with a per-turn hash lang label (forces
  real switching for the code-switch profile).

One timed run per op after a small-slice warm-up; per-window hypervisor
steal share sampled (>2% = soft number). Run after bench.py populated
``.bench_cache``::

    python scripts/bench_s9_scale.py [op ...]            # 1.88M rows
    SPARK_GRAFT_BENCH_SCALE=1 python scripts/bench_s9_scale.py  # 18.8M
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

#: temporal-split day width over the hash day domain (bounded |days|)
_DAY_MOD = 512


def mirror_corpus(docs):
    """Base docs + trailing-token near-dup copies of ~40% under three
    'mirror-*' sources — the planted syndication shape of q_cross_source_dup
    at corpus cardinality."""
    base = docs.select("doc_id", "text", "source")
    copies = base.filter(
        F.pmod(F.xxhash64("doc_id"), F.lit(5)) < 2
    ).select(
        (F.col("doc_id") + F.lit(10**12)).alias("doc_id"),
        F.concat("text", F.lit(" extra trailing token")).alias("text"),
        F.concat(
            F.lit("mirror-"),
            F.pmod(F.xxhash64("doc_id"), F.lit(3)).cast("string"),
        ).alias("source"),
    )
    return base.unionByName(copies)


def _pairs(corpus):
    from poc_document_ocr_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    return lsh_candidate_pairs(minhash_signatures(word_shingles(corpus)))


def cross_source_job(corpus):
    from poc_document_ocr_spark.operators.dedup import source_pair_matrix

    return source_pair_matrix(_pairs(corpus), corpus)


def survivorship_job(corpus):
    from poc_document_ocr_spark.operators.dedup import (
        canonical_docs,
        connected_components,
        dedup_survivorship,
    )

    comp = connected_components(_pairs(corpus))
    scored = corpus.select(
        "doc_id", F.length("text").cast("long").alias("score")
    )
    return dedup_survivorship(corpus, canonical_docs(scored, comp))


def temporal_split_job(corpus):
    from poc_document_ocr_spark.operators.sampling import group_quantiles

    days = corpus.select(
        "doc_id",
        F.pmod(F.xxhash64("doc_id", F.lit("day")), F.lit(_DAY_MOD))
        .cast("long")
        .alias("day"),
    )
    cut = group_quantiles(
        days.select(F.lit("all").alias("g"), F.col("day").alias("v")),
        group_col="g",
        value_col="v",
        qs=(0.8,),
    ).select(F.col("value").alias("cutoff_day"))
    flags = days.crossJoin(F.broadcast(cut)).select(
        "doc_id", (F.col("day") <= F.col("cutoff_day")).alias("is_train")
    )
    fa = flags.select(
        F.col("doc_id").alias("id_a"), F.col("is_train").alias("_ta")
    )
    fb = flags.select(
        F.col("doc_id").alias("id_b"), F.col("is_train").alias("_tb")
    )
    return (
        _pairs(corpus)
        .join(fa.hint("merge"), "id_a")
        .join(fb.hint("merge"), "id_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum((F.col("_ta") != F.col("_tb")).cast("long"))
            .cast("long")
            .alias("n_straddle"),
        )
    )


def lang_switch_job(turns):
    """The q_lang_switch shape over the real transcripts with a per-turn
    hash lang label (5 langs → plenty of adjacent switches)."""
    from pyspark.sql import Window as W

    lt = turns.select(
        "conv_id",
        "turn_idx",
        F.concat(
            F.lit("lang"),
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(5)),
        ).alias("lang"),
    )
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    sw = lt.select("conv_id", "lang", F.lag("lang").over(w).alias("_prev"))
    pc = sw.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(
            F.when(
                F.col("_prev").isNotNull()
                & (F.col("lang") != F.col("_prev")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_switches"),
    )
    cl = lt.groupBy("conv_id", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    md = cl.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.min(
            F.struct((-F.col("cnt")).alias("neg"), F.col("lang"))
        ).alias("_best"),
    )
    return (
        pc.join(md, "conv_id")
        .withColumn("_top_cnt", -F.col("_best.neg"))
        .select(
            "conv_id",
            "n_turns",
            "n_langs",
            "n_switches",
            F.col("_best.lang").alias("top_lang"),
            F.expr(
                "CAST(CAST(_top_cnt AS DECIMAL(38,0)) * 1000000"
                " div n_turns AS BIGINT)"
            ).alias("top_share_ppm"),
        )
    )


def encoding_job(docs):
    from poc_document_ocr_spark.operators.textstats import encoding_screen

    return encoding_screen(docs)


def novelty_job(docs):
    """Planted re-crawl timeline at corpus cardinality: 8 fresh days plus
    4 re-fetch-only days (copies of a third of the corpus)."""
    from poc_document_ocr_spark.operators.dedup import novelty_curve

    base = docs.select(
        "doc_id", "text",
        F.pmod(F.xxhash64("doc_id", F.lit("nd")), F.lit(8)).alias("day"),
    )
    refetch = base.filter(
        F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 0
    ).select(
        (F.col("doc_id") + F.lit(10**12)).alias("doc_id"),
        "text",
        (F.lit(8) + F.pmod(F.xxhash64("doc_id", F.lit("rd")), F.lit(4)))
        .alias("day"),
    )
    return novelty_curve(base.unionByName(refetch))


def calibration_job(corpus):
    from poc_document_ocr_spark.operators.dedup import (
        lsh_calibration,
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    sh = word_shingles(corpus)
    sigs = minhash_signatures(sh)
    # both consumers (banding + match counting) re-read the signatures —
    # materialize once, same convention as lsh_candidate_pairs' bands
    sigs = sigs.localCheckpoint(eager=True)
    pairs = lsh_candidate_pairs(sigs)
    return lsh_calibration(sh, sigs, pairs)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "0.1")
    only = set(sys.argv[1:])
    spark = get_spark(
        "bench_s9_scale", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)
        },
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
            F.lit("src"), F.pmod(F.xxhash64("doc_id"), F.lit(20))
        ).alias("source"),
    )
    corpus = mirror_corpus(docs)

    def consume(df):
        cols = [F.col(c) for c in df.columns]
        return df.select(F.xxhash64(*cols).alias("_h")).agg(
            F.expr("bit_xor(_h)")
        ).collect()

    jobs = {
        "cross_source_dup": lambda: consume(cross_source_job(corpus)),
        "dedup_survivorship": lambda: consume(survivorship_job(corpus)),
        "temporal_split": lambda: consume(temporal_split_job(corpus)),
        "lang_switch": lambda: consume(lang_switch_job(turns)),
        "encoding_screen": lambda: consume(encoding_job(docs)),
        "novelty_curve": lambda: consume(novelty_job(docs)),
        "lsh_calibration": lambda: consume(calibration_job(corpus)),
    }
    unknown = only - set(jobs)
    if unknown:
        raise SystemExit(f"unknown op name(s): {sorted(unknown)}; "
                         f"choose from {sorted(jobs)}")
    selected = {n: f for n, f in jobs.items() if not only or n in only}

    small_d = docs.limit(5000).localCheckpoint()
    small_c = mirror_corpus(small_d).localCheckpoint()
    small_t = turns.limit(5000).localCheckpoint()
    warmups = {
        "cross_source_dup": lambda: consume(cross_source_job(small_c)),
        "dedup_survivorship": lambda: consume(survivorship_job(small_c)),
        "temporal_split": lambda: consume(temporal_split_job(small_c)),
        "lang_switch": lambda: consume(lang_switch_job(small_t)),
        "encoding_screen": lambda: consume(encoding_job(small_d)),
        "novelty_curve": lambda: consume(novelty_job(small_d)),
        "lsh_calibration": lambda: consume(calibration_job(small_c)),
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
