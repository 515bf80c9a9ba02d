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
* ``semantic_dedup`` — the round-4 flagship at 400k planted vectors
  (k=128 cells, end-to-end SemDeDup with the planted-family correctness
  assertion), promoted into the per-round suite (VERDICT r4 task #5).
* ``curate_pipeline`` — the composed normalize→quality→dedup→mixture→
  pack plan over the extracted bench corpus (1.88M docs at sf0.1),
  promoted likewise.

Methodology (same-window by construction, VERDICT r4 task #4): one small
warm-up pass compiles every timed plan shape (whole-stage codegen +
Python worker start are one-time costs that amortize at scale); the
timed measurement then runs the WHOLE suite as interleaved passes —
every stage once per pass, per-stage medians taken across passes — so
any two stages' numbers come from the same host windows and ratios
between them (e.g. consolidate/extract) never mix measurement windows.
The per-pass consolidate/extract ratio is reported directly. Hypervisor
steal is sampled around every run; a pass member inside a contended
window is flagged and extra passes run until every stage has a clean
sample (bounded). The synthetic corpus is generated once per sf and
cached as parquet under ``.bench_cache/``.
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
    extract_turns_arrow,
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

    import poc_document_ocr_spark.entrypoints as ep
    from poc_document_ocr_spark.operators.similarity import semantic_dedup
    from scripts._bench_common import consume, docs_of

    turns = synth_transcripts(spark, sf)
    n_turns = turns.count()

    # extracted bench corpus, materialized once (the production shape:
    # extraction results land in storage before aggregation) — input to
    # consolidate_folds and curate_pipeline
    ex_path = os.path.join(_REPO, ".bench_cache", f"extracted_{sf}.parquet")
    if not os.path.exists(os.path.join(ex_path, "_SUCCESS")):
        extract_turns(turns).write.mode("overwrite").parquet(ex_path)
    extracted = spark.read.parquet(ex_path)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_emb = emb.count()
    bench_docs = docs_of(extracted)
    orig_docs_fn = ep._docs

    def planted_vectors(copies: int):
        # each base vector replicated copies× with a deterministic
        # perturbation (the bench_r4_scale construction): near-identical
        # within a family, geometry unchanged across families — 400k
        # vectors at sf0.1 (2000 base × 200)
        reps = spark.range(copies).select(F.col("id").alias("rep"))
        return emb.crossJoin(reps).select(
            (F.col("vec_id") + F.col("rep") * n_emb).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + ((F.col("rep") * 37 + i) % 11).cast("float") * F.lit(1e-4),
            ).alias("embedding"),
        )

    def run_semantic_dedup():
        # SemDeDup end-to-end at 400k vectors, k=128 (cells ~3k rows —
        # all under MATMUL_MAX_CELL, so the auto pair stage takes the
        # Gram fold; the planted-family assertion pins correctness at
        # bench scale every round)
        out = semantic_dedup(planted_vectors(200), k=128, iters=1, tau=0.9)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_canon").cast("long")).alias("canon"),
            F.countDistinct("component").alias("comps"),
        ).collect()[0]
        assert n_emb <= agg["comps"] <= n_emb + 100, f"planted dedup: {agg}"
        assert agg["canon"] == agg["comps"], f"canon per cluster: {agg}"

    def run_curate():
        # the EXACT q_curate_pipeline path with _docs served from the
        # extracted bench corpus (the bench_curate_clean convention)
        ep._docs = lambda _s, _d: bench_docs
        try:
            consume(ep.QUERIES["curate_pipeline"](spark, "unused"))
        finally:
            ep._docs = orig_docs_fn

    # SPARK_GRAFT_BENCH_STAGES subsets the suite (comma-separated names) —
    # the scaling harness uses it to keep the N-vs-4N pair on the core six
    # stages, semantics-identical to earlier rounds' pairs
    _only = os.environ.get("SPARK_GRAFT_BENCH_STAGES")
    _want = (
        {s.strip() for s in _only.split(",") if s.strip()} if _only else None
    )

    def _wanted(name: str) -> bool:
        return _want is None or name in _want

    # ---- warm-up: compile every timed plan shape on small slices ----------
    # (whole-stage-codegen compilation and Python-worker start are one-time
    # session costs; at 100 TB they are invisible, at bench scale they are
    # not — timed runs below measure steady-state execution)
    warm = turns.filter(F.crc32(F.col("conv_id")) % 337 == 0)
    extract_turns_arrow(warm).agg(F.count(F.lit(1))).collect()
    extract_turns_compact(warm).agg(F.count(F.lit(1))).collect()
    if os.environ.get("SPARK_GRAFT_BENCH_VARIANTS"):
        extract_turns(warm).agg(F.count(F.lit(1))).collect()
        extract_turns(salted_repartition(warm)).agg(F.count(F.lit(1))).collect()
    consolidate_stage(extract_turns_arrow(warm)).agg(
        F.count(F.lit(1))
    ).collect()
    consolidate_stage(extracted.limit(2000)).agg(F.count(F.lit(1))).collect()
    docs_warm = docs.limit(50)
    lsh_candidate_pairs(minhash_signatures(word_shingles(docs_warm))).count()
    emb_warm = emb.limit(64)
    cosine_topk(emb_warm, emb_warm.filter(F.col("vec_id") < 2), k=5).count()
    token_stats(docs_warm).agg(F.count(F.lit(1))).collect()
    if _wanted("semantic_dedup"):
        semantic_dedup(planted_vectors(2), k=8, iters=1, tau=0.9).count()
    if _wanted("curate_pipeline"):
        small_docs = bench_docs.limit(5000).localCheckpoint()
        ep._docs = lambda _s, _d: small_docs
        try:
            consume(ep.QUERIES["curate_pipeline"](spark, "unused"))
        finally:
            ep._docs = orig_docs_fn

    # ---- timed: interleaved same-window passes ----------------------------
    # METHODOLOGY: the whole suite runs as interleaved passes — every stage
    # once per pass, in a fixed order — so per-stage medians are taken from
    # the SAME host windows and cross-stage ratios never mix measurement
    # windows (the round-4 2.23×-vs-1.50× footnote cannot recur by
    # construction). Hypervisor steal is sampled around every run: a run
    # whose window's steal share exceeds _STEAL_MAX is flagged (this host
    # measures >20% steal spikes — BENCH.md); after the base passes, extra
    # passes run until every stage has ≥1 clean sample (bounded at
    # _MAX_PASSES), and a stage with no clean sample reports the median of
    # all its runs, flagged in `contended_runs` so cross-round comparisons
    # know the number is soft.
    stages: list[tuple[str, object]] = [
        # headline: per-turn extraction, shuffle-free — parallelism comes
        # from input splits, the UDF runs under the scan's partitioning;
        # mapInArrow is the measured-fastest Python boundary (flattened
        # span ListArray assembly; ~6-10% over compact mapInPandas after
        # the fast-scanner cut shrank the parse share — BENCH.md)
        (
            "extract",
            lambda: extract_turns_arrow(turns)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("extracted_text")).alias("chars"),
            )
            .collect(),
        ),
        # full pipeline fold (includes the embedded extraction stage)
        (
            "consolidate",
            lambda: consolidate_stage(extract_turns_arrow(turns))
            .agg(F.count(F.lit(1)))
            .collect(),
        ),
        # folds only, from the materialized extracted table — isolates the
        # fold pipeline from the pandas-UDF extraction cost
        (
            "consolidate_folds",
            lambda: consolidate_stage(extracted)
            .agg(F.count(F.lit(1)))
            .collect(),
        ),
        (
            "dedup_minhash",
            lambda: lsh_candidate_pairs(
                minhash_signatures(word_shingles(docs))
            ).count(),
        ),
        (
            "token_stats",
            lambda: token_stats(docs).agg(F.count(F.lit(1))).collect(),
        ),
        (
            "ann_topk",
            lambda: cosine_topk(
                emb, emb.filter(F.col("vec_id") < 8), k=10
            ).count(),
        ),
        ("semantic_dedup", run_semantic_dedup),
        ("curate_pipeline", run_curate),
    ]
    if os.environ.get("SPARK_GRAFT_BENCH_VARIANTS"):
        # the struct-udf and salted-shuffle extraction variants are NOT in
        # the per-round suite — their A/B numbers are recorded in BENCH.md
        stages[1:1] = [
            (
                "extract_struct",
                lambda: extract_turns(turns)
                .agg(F.sum(F.length("extracted_text")))
                .collect(),
            ),
            (
                "extract_salted",
                lambda: extract_turns(salted_repartition(turns))
                .agg(F.sum(F.length("extracted_text")))
                .collect(),
            ),
        ]

    stages = [(n, f) for n, f in stages if _wanted(n)]

    _BASE_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    _MAX_PASSES = _BASE_PASSES + 2
    runs: dict[str, list[tuple[float, bool]]] = {n: [] for n, _ in stages}
    contended: dict[str, int] = {}
    pass_ratios: list[float] = []
    for pass_no in range(_MAX_PASSES):
        pass_times: dict[str, float] = {}
        for name, fn in stages:
            spark.catalog.clearCache()
            s0, j0 = _steal_sample()
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            s1, j1 = _steal_sample()
            steal_share = (s1 - s0) / max(j1 - j0, 1)
            clean = steal_share <= _STEAL_MAX
            runs[name].append((dt, clean))
            if not clean:
                contended[name] = contended.get(name, 0) + 1
            pass_times[name] = dt
        # same-window ratio: both walls from THIS pass
        if "consolidate" in pass_times and "extract" in pass_times:
            pass_ratios.append(
                round(pass_times["consolidate"] / pass_times["extract"], 3)
            )
        if pass_no + 1 >= _BASE_PASSES and all(
            any(c for _, c in rs) for rs in runs.values()
        ):
            break

    timings: dict[str, float] = {}
    for name, _ in stages:
        sel = sorted(d for d, c in runs[name] if c) or sorted(
            d for d, _c in runs[name]
        )
        timings[name] = round(sel[len(sel) // 2], 3)

    total = round(sum(timings.values()), 3)
    suite_desc = (
        "extraction + folds + dedup + ann + semantic_dedup@400k + "
        "curate_pipeline"
        if _want is None
        else "stages: " + ",".join(n for n, _ in stages)
    )
    out = {
        "metric": f"headline suite wall time ({suite_desc}), interleaved "
        "same-window passes, steady-state after warm-up",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_turns": n_turns,
        "turns_per_sec": (
            round(n_turns / timings["extract"], 1)
            if "extract" in timings
            else None
        ),
        "cpus": cpus,
        # per-pass consolidate/extract ratios — each computed inside one
        # contiguous window, so the headline ratio needs no footnote
        "consolidate_over_extract_per_pass": pass_ratios,
    }
    if contended:
        # stages with runs inside noisy-neighbor windows (count of flagged
        # runs) — a stage listed here AND lacking any clean run is soft
        out["contended_runs"] = contended
    print(json.dumps(out))


if __name__ == "__main__":
    main()
