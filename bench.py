"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Workloads:

* ``extract``      — the north-rule headline: per-turn main-content
  extraction (HTML boilerplate strip / PDF-layout parse / plain dispatch)
  over a deterministic synthetic transcript corpus (~40% HTML, ~30%
  layout, ~30% plain, long-tail skew conversation included), sized to the
  scale factor. Metric of record: extracted turns/sec.
* ``consolidate``  — full pipeline fold over the same corpus: field
  contributions → forward-fill runs → per-field merge folds.
* ``dedup_minhash`` / ``ann_topk`` / ``token_stats`` — training-data ops
  at the sf dir.

Methodology: one small warm-up pass compiles the plan shapes (whole-stage
codegen + Python worker start are one-time costs that amortize at scale);
timed runs then measure steady-state execution. The synthetic corpus is
generated once per sf and cached as parquet under ``.bench_cache/``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from poc_document_ocr_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from poc_document_ocr_spark.operators.extraction import (
    extract_turns,
    extract_turns_compact,
    salted_repartition,
)
from poc_document_ocr_spark.operators.similarity import cosine_topk
from poc_document_ocr_spark.operators.textstats import token_stats
from poc_document_ocr_spark.plans.pipeline import consolidate_stage
from poc_document_ocr_spark.schema import TRANSCRIPT_SCHEMA
from poc_document_ocr_spark.session import get_spark

_REPO = os.path.dirname(os.path.abspath(__file__))

#: synthetic corpus size (conversations) per scale factor; ~8 turns/conv.
#: sf0.1 → ~2M turns: big enough that extraction compute (not session/task
#: fixed costs) dominates the scaling measurement.
_SF_CONVS = {"0.001": 2_500, "0.01": 25_000, "0.1": 250_000, "1": 2_500_000}


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def _steal_sample() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat — hypervisor steal
    accounting. This host has measured noisy-neighbor windows (steal
    spiking to >20% of all CPUs for minutes; see BENCH.md): a timed run
    inside such a window measures the neighbor, not the engine."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:
        return 0, 1


#: steal share of a window above which the run is discarded as contended
_STEAL_MAX = float(os.environ.get("SPARK_GRAFT_STEAL_MAX", "0.02"))


def synth_transcripts(spark, sf: str):
    """Deterministic synthetic transcript corpus, cached as parquet.

    Generated DISTRIBUTED: ``generate_conv`` is seeded per (seed, conv_no),
    so executors produce identical bytes for a given conv — the corpus is
    reproducible at any parallelism (and this generation path is itself the
    pattern a 10^12-turn synthetic load would use).
    """
    import pandas as pd

    from poc_document_ocr_spark.sources.datagen import generate_conv

    n_convs = _SF_CONVS.get(sf, 25_000)
    path = os.path.join(_REPO, ".bench_cache", f"transcripts_{sf}_v2.parquet")
    # gate cache reuse on the _SUCCESS marker: a run killed mid-write leaves
    # a partial directory that would silently corrupt all throughput numbers
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        cols = [f.name for f in TRANSCRIPT_SCHEMA.fields]

        def gen(batches):
            for pdf in batches:
                rows = []
                for conv_no in pdf["id"]:
                    rows.extend(generate_conv(int(conv_no), seed=42))
                yield pd.DataFrame(rows, columns=cols)

        (
            spark.range(n_convs)
            .repartition(256)
            .mapInPandas(gen, TRANSCRIPT_SCHEMA)
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # SPARK_GRAFT_SYNTH_SF sizes the synthetic transcript corpus
    # independently of the sf-dir tables (no sf1 testdata dir exists, so the
    # 10×-scale evidence run uses SPARK_GRAFT_SYNTH_SF=1 over the sf0.1 dir)
    sf = os.environ.get("SPARK_GRAFT_SYNTH_SF", _sf_of(sf_dir))
    spark = get_spark(
        "bench",
        cpus=cpus,
        shuffle_partitions=cpus,
        # the corpus cache is ~1-2 GB of snappy parquet: 16 MB splits give
        # the scan enough tasks to feed every core WITHOUT a pre-UDF
        # shuffle (production tables use the 128 MB default with
        # accordingly larger files — the knob scales with file size)
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)
        },
    )

    turns = synth_transcripts(spark, sf)
    n_turns = turns.count()

    # ---- warm-up: compile every timed plan shape on small slices ----------
    # (whole-stage-codegen compilation and Python-worker start are one-time
    # session costs; at 100 TB they are invisible, at bench scale they are
    # not — timed runs below measure steady-state execution)
    warm = turns.filter(F.crc32(F.col("conv_id")) % 337 == 0)
    extract_turns_compact(warm).agg(F.count(F.lit(1))).collect()
    if os.environ.get("SPARK_GRAFT_BENCH_VARIANTS"):
        extract_turns(warm).agg(F.count(F.lit(1))).collect()
        extract_turns(salted_repartition(warm)).agg(F.count(F.lit(1))).collect()
    consolidate_stage(extract_turns_compact(warm)).agg(
        F.count(F.lit(1))
    ).collect()
    docs_warm = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    lsh_candidate_pairs(minhash_signatures(word_shingles(docs_warm))).count()
    emb_warm = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(64)
    cosine_topk(emb_warm, emb_warm.filter(F.col("vec_id") < 2), k=5).count()
    token_stats(docs_warm).agg(F.count(F.lit(1))).collect()

    timings: dict[str, float] = {}
    contended: dict[str, int] = {}

    def timed(name: str, fn, max_tries: int = 5) -> None:
        # METHODOLOGY: median of 3 CLEAN timed runs after the warm-up pass
        # above. The first full-size execution of a plan can pay a one-time
        # JIT profile-recompile (and, after an idle gap, Python-worker
        # respawn) — local-mode session artifacts, not workload cost; the
        # median keeps one outlier from defining the number. Additionally,
        # hypervisor steal is sampled around every run: a window whose steal
        # share exceeds _STEAL_MAX is a noisy-neighbor window (this host
        # measures >20% steal spikes — BENCH.md) and the run is discarded
        # and re-tried, up to max_tries; if no clean window is found the
        # median of ALL runs is reported and the query is flagged in
        # `contended` so cross-round comparisons know the number is soft.
        clean: list[float] = []
        all_runs: list[float] = []
        for _ in range(max_tries):
            spark.catalog.clearCache()
            s0, j0 = _steal_sample()
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            s1, j1 = _steal_sample()
            steal_share = (s1 - s0) / max(j1 - j0, 1)
            all_runs.append(dt)
            if steal_share <= _STEAL_MAX:
                clean.append(dt)
            else:
                contended[name] = contended.get(name, 0) + 1
            if len(clean) >= 3:
                break
        sel = sorted(clean if clean else all_runs)
        timings[name] = round(sel[len(sel) // 2], 3)

    # headline: per-turn extraction over the full corpus, shuffle-free —
    # parallelism comes from input splits, the UDF runs under the scan's
    # partitioning; compact mapInPandas (keys+text in, flat batch out) is
    # the measured-fastest Python boundary (the 100 TB default path)
    timed(
        "extract",
        lambda: extract_turns_compact(turns)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("extracted_text")).alias("chars"),
        )
        .collect(),
    )
    # (the struct-udf and salted-shuffle variants are NOT in the per-round
    # suite — their A/B numbers are recorded in BENCH.md; re-time them with
    # SPARK_GRAFT_BENCH_VARIANTS=1 when revisiting the comparison)
    if os.environ.get("SPARK_GRAFT_BENCH_VARIANTS"):
        timed(
            "extract_struct",
            lambda: extract_turns(turns)
            .agg(F.sum(F.length("extracted_text")))
            .collect(),
        )
        timed(
            "extract_salted",
            lambda: extract_turns(salted_repartition(turns))
            .agg(F.sum(F.length("extracted_text")))
            .collect(),
        )
    # full fold pipeline (includes the embedded extraction stage)
    timed(
        "consolidate",
        lambda: consolidate_stage(extract_turns_compact(turns))
        .agg(F.count(F.lit(1)))
        .collect(),
    )
    # folds only, from a materialized extracted table (the production shape:
    # extraction results land in storage before aggregation) — isolates the
    # fold pipeline from the pandas-UDF extraction cost
    ex_path = os.path.join(_REPO, ".bench_cache", f"extracted_{sf}.parquet")
    if not os.path.exists(os.path.join(ex_path, "_SUCCESS")):
        extract_turns(turns).write.mode("overwrite").parquet(ex_path)
    extracted = spark.read.parquet(ex_path)
    timed(
        "consolidate_folds",
        lambda: consolidate_stage(extracted).agg(F.count(F.lit(1))).collect(),
    )

    # training-data ops over the sf-dir tables
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed(
        "dedup_minhash",
        lambda: lsh_candidate_pairs(
            minhash_signatures(word_shingles(docs))
        ).count(),
    )
    timed("token_stats", lambda: token_stats(docs).agg(F.count(F.lit(1))).collect())
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed(
        "ann_topk",
        lambda: cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=10).count(),
    )

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline suite wall time (extraction + folds + dedup + "
        "ann), steady-state after warm-up",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / timings["extract"], 1),
        "cpus": cpus,
    }
    if contended:
        # queries whose number includes noisy-neighbor windows (count of
        # discarded contended runs) — soft numbers, see BENCH.md
        out["contended_runs"] = contended
    print(json.dumps(out))


if __name__ == "__main__":
    main()
