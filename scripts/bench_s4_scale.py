"""Scale points for the round-4 SESSION-4 operators (Bradley-Terry,
refusal rate, n-gram novelty, epoch schedule, embedding decontamination
screen — none had a corpus-scale measurement yet).

Inputs, all deterministic (same harness family as bench_s2_scale.py):

* transcripts — the 1.88M-turn bench corpus (18.8M at scale=1); variants
  for the BT matches are a 64-way conv+turn hash so the bounded MM
  iteration runs on a realistically-sized competitor set (64² pair rows);
* documents — the extracted texts with conv-hash lang/ref-slice labels;
* vectors — the sf0.1 embeddings replicated K× with the planted-family
  perturbation of bench_r4_scale.py (corpus side), probes = a 1-in-400
  hash slice of the bases (the benchmark side). The screen runs under
  10 sign-LSH planes (1024 buckets) so per-bucket fan-out stays bounded
  as the corpus grows — the operator's documented scale contract.

One timed run per op after a small-slice warm-up; per-window hypervisor
steal share sampled (>2% = soft number). Run after bench.py populated
``.bench_cache``::

    python scripts/bench_s4_scale.py                 # 1.88M rows
    SPARK_GRAFT_BENCH_SCALE=1 python scripts/bench_s4_scale.py  # 18.8M
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

#: 10 planes → 1024 buckets (the oracle demo uses 4; the scale contract
#: is that callers grow the bit count with the corpus)
PLANES = [
    [((7 * i + 3 * j) % 11) - 5 for j in range(64)] for i in range(10)
]


def planted_vectors(spark, sf_dir: str, copies: int):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    reps = spark.range(copies).select(F.col("id").alias("rep"))
    return emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * n).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + ((F.col("rep") * 37 + i) % 11).cast("float") * F.lit(1e-4),
        ).alias("embedding"),
    )


def _template_mine_job(docs, connected_components, template_segments,
                       lsh_candidate_pairs, minhash_signatures,
                       word_shingles):
    base = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    near = base.select(
        (F.col("doc_id") + F.lit(10**12)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra trailing token")).alias(
            "text"
        ),
    )
    corpus = base.select("doc_id", "text").unionByName(near)
    pairs = lsh_candidate_pairs(minhash_signatures(word_shingles(corpus)))
    comp = connected_components(pairs)
    comps = (
        corpus.select("doc_id")
        .join(comp, corpus["doc_id"] == comp["node"], "left")
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("component")
        )
    )
    return template_segments(corpus, comps, n=8, tau_ppm=600_000)


def _extract_diff_job(turns, extract_turns, extraction_diff):
    unit = F.xxhash64("conv_id", "turn_idx").alias("doc_id")
    old = turns.select(
        unit,
        F.col("role").alias("fmt"),
        F.col("text").alias("extracted_text"),
        F.lit(1).cast("long").alias("n_spans"),
        F.lit(0).cast("long").alias("s0_start"),
        F.length("text").cast("long").alias("s0_end"),
    )
    ex = extract_turns(turns.select(unit, "text"))
    new = ex.select(
        "doc_id",
        "extracted_text",
        F.size("spans").cast("long").alias("n_spans"),
        F.get("spans", 0)["start"].cast("long").alias("s0_start"),
        F.get("spans", 0)["end"].cast("long").alias("s0_end"),
    )
    return extraction_diff(old, new, group_col="fmt")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "0.1")
    only = set(sys.argv[1:])
    spark = get_spark(
        "bench_s4_scale", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    from poc_document_ocr_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_novelty,
        word_shingles,
    )
    from poc_document_ocr_spark.operators.dedup import (
        connected_components,
        template_segments,
    )
    from poc_document_ocr_spark.operators.extraction import (
        extract_turns,
        extraction_diff,
    )
    from poc_document_ocr_spark.operators.graph import pagerank
    from poc_document_ocr_spark.operators.preference import (
        assistant_matches,
        bt_strength,
    )
    from poc_document_ocr_spark.operators.sampling import epoch_schedule
    from poc_document_ocr_spark.operators.similarity import cross_set_screen
    from poc_document_ocr_spark.operators.textstats import refusal_stats

    extracted = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", f"extracted_{scale}.parquet")
    )
    turns = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", f"transcripts_{scale}_v2.parquet")
    )
    # 64-way responder variants: bounded competitor set, corpus-sized
    # match stream
    vturns = turns.withColumn(
        "variant",
        F.concat(
            F.lit("m"), F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(64))
        ),
    )
    docs = extracted.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
        F.col("extracted_text").alias("text"),
        F.concat(
            F.lit("lang"), F.pmod(F.xxhash64("conv_id"), F.lit(5))
        ).alias("lang"),
    )
    # vectors: corpus = planted replicas (2k bases × copies → 400k at
    # the default scale, 4M at scale=1 — the kmeans scale points),
    # probes = 1-in-400 base slice
    copies = 2000 if scale == "1" else 200
    vecs = planted_vectors(spark, sf_dir, copies)
    probes = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.pmod(F.xxhash64("vec_id"), F.lit(400)) == 7
    )

    def consume(df):
        """Force EVERY output column (count-only probes let Catalyst
        prune computed columns out of the measured plan; bit_xor, not
        sum — summing 64-bit hashes overflows BIGINT under ANSI)."""
        cols = [F.col(c) for c in df.columns]
        return df.select(F.xxhash64(*cols).alias("_h")).agg(
            F.expr("bit_xor(_h)")
        ).collect()

    jobs = {
        "bt_strength": lambda: consume(
            bt_strength(assistant_matches(vturns), iters=2)
        ),
        "refusal_rate": lambda: consume(
            refusal_stats(
                vturns.filter(F.col("role") == "assistant"),
                group_col="conv_id",
            )
        ),
        "ngram_novelty": lambda: consume(
            ngram_novelty(
                docs, F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0, n=3
            )
        ),
        "epoch_schedule": lambda: consume(epoch_schedule(docs)),
        "semantic_decontam": lambda: consume(
            cross_set_screen(vecs, probes, PLANES, tau=0.9)
        ),
        # full composition: shingles → minhash → LSH pairs → 2 PR
        # iterations over the corpus-sized candidate graph
        "dup_pagerank": lambda: consume(
            pagerank(
                docs,
                lsh_candidate_pairs(
                    minhash_signatures(word_shingles(docs))
                ),
                iters=2,
            )
        ),
        # planted near-dup corpus (~940k 2-doc clusters): LSH pairs →
        # components → shared-segment template mining end-to-end
        "template_mine": lambda: consume(
            _template_mine_job(
                docs, connected_components, template_segments,
                lsh_candidate_pairs, minhash_signatures, word_shingles,
            )
        ),
        # dispatcher release vs passthrough v0 over every turn payload:
        # one extraction pass + one full-outer join + per-role rollup
        "extract_diff": lambda: consume(
            _extract_diff_job(turns, extract_turns, extraction_diff)
        ),
    }

    unknown = only - set(jobs)
    if unknown:
        raise SystemExit(f"unknown op name(s): {sorted(unknown)}; "
                         f"choose from {sorted(jobs)}")
    selected = {n: f for n, f in jobs.items() if not only or n in only}

    small_t = vturns.limit(5000).localCheckpoint()
    small_d = docs.limit(5000).localCheckpoint()
    warmups = {
        "bt_strength": lambda: consume(
            bt_strength(assistant_matches(small_t), iters=2)
        ),
        "refusal_rate": lambda: consume(
            refusal_stats(
                small_t.filter(F.col("role") == "assistant"),
                group_col="conv_id",
            )
        ),
        "ngram_novelty": lambda: consume(
            ngram_novelty(
                small_d, F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0, n=3
            )
        ),
        "epoch_schedule": lambda: consume(epoch_schedule(small_d)),
        "semantic_decontam": lambda: consume(
            cross_set_screen(
                planted_vectors(spark, "/root/testdata/sf0.01", 1),
                probes,
                PLANES,
                tau=0.9,
            )
        ),
        "dup_pagerank": lambda: consume(
            pagerank(
                small_d,
                lsh_candidate_pairs(
                    minhash_signatures(word_shingles(small_d))
                ),
                iters=2,
            )
        ),
        "template_mine": lambda: consume(
            _template_mine_job(
                small_d, connected_components, template_segments,
                lsh_candidate_pairs, minhash_signatures, word_shingles,
            )
        ),
        "extract_diff": lambda: consume(
            _extract_diff_job(small_t, extract_turns, extraction_diff)
        ),
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
