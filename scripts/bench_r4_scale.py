"""Scale points for the ROUND-4 operators (the ops added this round had
no corpus-scale measurement yet).

Inputs, all deterministic:

* vectors — the sf0.1 embeddings table (2k × 64d) replicated K× with a
  tiny per-replica perturbation: a PLANTED near-dup corpus where every
  base vector has K near-identical copies (cos ≈ 0.9999) and cross-base
  cosines stay below the threshold. ``semantic_dedup`` must therefore
  recover exactly 2,000 clusters of size K — the scale run doubles as a
  correctness check at 20× the oracle scale.
* documents — the 1.88M extracted texts with a synthetic conv-hash lang;
* transcripts — the raw 1.88M-turn bench corpus;
* lock requests — one per turn (1.88M requests over 250k documents).

One timed run per op after a small-slice warm-up; hypervisor steal share
sampled per window (>2% = soft number). Run after bench.py populated
``.bench_cache``::

    python scripts/bench_r4_scale.py
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




def planted_vectors(spark, sf_dir: str, copies: int):
    """Each base vector replicated ``copies``× with a deterministic
    ±1e-4-scale perturbation — near-identical within a family, unchanged
    geometry across families."""
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "bench_r4_scale", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    from poc_document_ocr_spark.operators.aggregation import consolidate_auto
    from poc_document_ocr_spark.operators.review import resolve_lock_requests
    from poc_document_ocr_spark.operators.sampling import apply_mixture
    from poc_document_ocr_spark.operators.similarity import semantic_dedup

    extracted = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", "extracted_0.1.parquet")
    )
    turns = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", "transcripts_0.1_v2.parquet")
    )
    docs = extracted.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
        F.col("extracted_text").alias("text"),
        F.concat(
            F.lit("lang"), F.pmod(F.xxhash64("conv_id"), F.lit(5))
        ).alias("lang"),
    )
    locks = (
        turns.select("conv_id").distinct()
        .select(
            F.col("conv_id").alias("doc_key"),
            F.when(
                F.pmod(F.xxhash64("conv_id"), F.lit(3)) == 1,
                F.concat(F.lit("rev"), F.pmod(F.xxhash64("conv_id"), F.lit(4))),
            ).alias("checked_out_by"),
            F.when(
                F.pmod(F.xxhash64("conv_id"), F.lit(3)) == 1,
                F.lit(1_000_000).cast("long"),
            ).alias("checked_out_at"),
            F.lit(None).cast("string").alias("last_checked_in_by"),
            F.lit(None).cast("long").alias("last_checked_in_at"),
        )
    )
    reqs = turns.select(
        F.col("conv_id").alias("doc_key"),
        F.col("turn_idx").alias("seq"),
        F.concat(F.lit("rev"), F.pmod("turn_idx", F.lit(4))).alias("reviewer"),
        F.when(F.pmod("turn_idx", F.lit(7)) < 4, "checkout")
        .when(F.pmod("turn_idx", F.lit(7)) < 6, "checkin")
        .otherwise("cancel")
        .alias("action"),
        (F.lit(1_000_000) + F.col("turn_idx")).cast("long").alias("req_ts"),
    )

    def sem_dedup(copies, k, tau):
        # SemDeDup's scale contract: the CALLER grows the cell count with
        # the corpus so per-cell pair fan-out stays bounded (n²/k pairs).
        # k=4 at 400k vectors would be ~2×10¹⁰ candidate pairs; k=128
        # keeps cells ~3k vectors (~5M pairs each).
        def run():
            vecs = planted_vectors(spark, sf_dir, copies)
            out = semantic_dedup(vecs, k=k, iters=1, tau=tau)
            agg = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("is_canon").cast("long")).alias("canon"),
                F.countDistinct("component").alias("comps"),
            ).collect()[0]
            # 2000 planted families (no base pair reaches tau — probed);
            # a family straddling a k-means cell boundary splits in two,
            # so allow a small overshoot, never an undershoot
            assert 2000 <= agg["comps"] <= 2100, f"planted dedup: {agg}"
            assert agg["canon"] == agg["comps"], f"canon per cluster: {agg}"
            return agg["n"]
        return run

    jobs = {
        "semantic_dedup_40k": sem_dedup(20, 16, 0.9),
        "semantic_dedup_400k": sem_dedup(200, 128, 0.9),
        "mix_apply": lambda: apply_mixture(docs).collect(),
        "lock_checkout": lambda: resolve_lock_requests(locks, reqs)
        .agg(F.count(F.lit(1)), F.sum(F.col("granted").cast("long")))
        .collect(),
        "consolidate_auto_guard": lambda: consolidate_auto(
            extracted, threshold=1_000_000
        ).agg(F.count(F.lit(1))).collect(),
        "consolidate_long_path": lambda: consolidate_auto(
            extracted, threshold=3
        ).agg(F.count(F.lit(1))).collect(),
    }

    # transcript lint/transitions/latency over the raw corpus, inline
    from pyspark.sql import Window as W

    def turn_lint_big():
        w = W.partitionBy("conv_id").orderBy("turn_idx")
        one_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
        flagged = turns.select(
            "conv_id", "turn_idx", "role", "tool", "text",
            F.lag("turn_idx").over(w).alias("_pidx"),
            F.lag("role").over(w).alias("_prole"),
        )
        return flagged.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n_turns"),
            one_if(F.trim("text") == "").alias("n_empty"),
            one_if(F.col("role") == F.col("_prole")).alias("n_same"),
            one_if(
                F.col("_pidx").isNotNull()
                & (F.col("turn_idx") != F.col("_pidx") + 1)
            ).alias("n_gaps"),
        ).agg(F.count(F.lit(1)), F.sum("n_same")).collect()

    jobs["turn_lint"] = turn_lint_big

    # warm-up
    planted_vectors(spark, sf_dir, 2).limit(500).count()
    semantic_dedup(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), k=4, tau=0.9
    ).count()
    apply_mixture(docs.limit(2000).localCheckpoint()).collect()
    small_t = turns.limit(2000).localCheckpoint()
    resolve_lock_requests(
        locks.limit(50).localCheckpoint(), reqs.limit(200).localCheckpoint()
    ).count()
    consolidate_auto(
        extracted.limit(2000).localCheckpoint(), threshold=3
    ).count()

    timings, steal, sizes = {}, {}, {}
    for name, fn in jobs.items():
        spark.catalog.clearCache()
        s0, j0 = _steal_sample()
        t0 = time.monotonic()
        res = fn()
        timings[name] = round(time.monotonic() - t0, 2)
        s1, j1 = _steal_sample()
        steal[name] = round((s1 - s0) / max(j1 - j0, 1), 4)
        if isinstance(res, int):
            sizes[name] = res

    print(json.dumps({
        "metric": "round-4 op scale points (one run after warm-up)",
        "n_docs": docs.count(),
        "n_turns": turns.count(),
        "cpus": cpus,
        "timings_sec": timings,
        "steal_share": steal,
        "rows": sizes,
    }))


if __name__ == "__main__":
    main()
