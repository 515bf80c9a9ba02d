"""Scale points for the round-4 SESSION-2 operators (sft/extractiveness/
best_of_n over 1.88M turns; bpe/dsir/diversity/heaps/fertility/
k-anonymity/curriculum over 1.88M docs).

Same harness as bench_r4_scale.py: deterministic inputs derived from the
sf0.1 bench corpus, one timed run per op after warm-up, per-window
hypervisor-steal share sampled (>2% = soft number). Run after bench.py
populated ``.bench_cache``::

    python scripts/bench_s2_scale.py
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




def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # corpus scale: "0.1" = 1.88M rows (default), "1" = 18.8M rows
    scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "0.1")
    only = set(sys.argv[1:])  # optional op-name filter
    spark = get_spark(
        "bench_s2_scale", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    from poc_document_ocr_spark.operators.dedup import dedup_weights
    from poc_document_ocr_spark.operators.examples import (
        best_of_n,
        context_window_fit,
        extractiveness,
        preference_pairs,
        sft_pack_examples,
    )
    from poc_document_ocr_spark.operators.textstats import normalize_text
    from poc_document_ocr_spark.operators.sampling import (
        curriculum_order,
        k_anonymity,
    )
    from poc_document_ocr_spark.operators.textstats import (
        bpe_merge_candidates,
        dsir_affinity,
        heaps_law,
        ngram_diversity,
        tokenizer_fertility,
    )

    extracted = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", f"extracted_{scale}.parquet")
    )
    turns = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", f"transcripts_{scale}_v2.parquet")
    )
    # 1.88M-doc corpus with deterministic source/lang/n_chars metadata
    # non-negative 62-bit ids (heaps_law's corpus-position contract;
    # also exercises the divide-first bucket width far above 32 bits)
    docs = extracted.select(
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(2**62))
        .alias("doc_id"),
        F.col("extracted_text").alias("text"),
        F.concat(
            F.lit("lang"), F.pmod(F.xxhash64("conv_id"), F.lit(5))
        ).alias("lang"),
        F.concat(
            F.lit("src"), F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(20))
        ).alias("source"),
        F.length("extracted_text").cast("long").alias("n_chars"),
    )

    def consume(df):
        """Force EVERY output column: a count-only probe lets Catalyst
        prune computed columns (collect_list contexts, array intersects,
        regex normalization, max-struct aggregates) right out of the
        measured plan — the timing then flatters the op. xxhash64 over
        all columns defeats pruning at negligible cost (bit_xor, not
        sum — summing 64-bit hashes overflows BIGINT under ANSI)."""
        cols = [F.col(c) for c in df.columns]
        return df.select(F.xxhash64(*cols).alias("_h")).agg(
            F.expr("bit_xor(_h)")
        ).collect()

    jobs = {
        "sft_examples": lambda: consume(sft_pack_examples(turns)),
        "extractiveness": lambda: consume(extractiveness(turns)),
        "best_of_n": lambda: consume(best_of_n(turns)),
        "bpe_merges": lambda: bpe_merge_candidates(docs).collect(),
        "dsir_weights": lambda: consume(
            dsir_affinity(docs, F.col("source") == "src0")
        ),
        "ngram_diversity": lambda: ngram_diversity(docs).collect(),
        "heaps_law": lambda: heaps_law(docs).collect(),
        "tokenizer_fertility": lambda: tokenizer_fertility(docs).collect(),
        "k_anonymity": lambda: k_anonymity(docs).collect(),
        "curriculum": lambda: consume(curriculum_order(docs)),
        "pref_pairs": lambda: consume(preference_pairs(turns)),
        "context_fit": lambda: consume(context_window_fit(turns)),
        "normalize": lambda: consume(normalize_text(docs)),
        "dedup_weights": lambda: consume(dedup_weights(docs)),
    }

    unknown = only - set(jobs)
    if unknown:
        raise SystemExit(f"unknown op name(s): {sorted(unknown)}; "
                         f"choose from {sorted(jobs)}")
    selected = {n: f for n, f in jobs.items() if not only or n in only}

    # warm-up on small slices — selected ops only
    small_t = turns.limit(5000).localCheckpoint()
    small_d = docs.limit(5000).localCheckpoint()
    warmups = {
        "sft_examples": lambda: consume(sft_pack_examples(small_t)),
        "extractiveness": lambda: consume(extractiveness(small_t)),
        "best_of_n": lambda: consume(best_of_n(small_t)),
        "bpe_merges": lambda: bpe_merge_candidates(small_d).count(),
        "dsir_weights": lambda: consume(dsir_affinity(
            small_d, F.col("source") == "src0")),
        "ngram_diversity": lambda: ngram_diversity(small_d).count(),
        "heaps_law": lambda: heaps_law(small_d).count(),
        "tokenizer_fertility": lambda: tokenizer_fertility(small_d).count(),
        "k_anonymity": lambda: k_anonymity(small_d).count(),
        "curriculum": lambda: consume(curriculum_order(small_d)),
        "pref_pairs": lambda: consume(preference_pairs(small_t)),
        "context_fit": lambda: consume(context_window_fit(small_t)),
        "normalize": lambda: consume(normalize_text(small_d)),
        "dedup_weights": lambda: consume(dedup_weights(small_d)),
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
