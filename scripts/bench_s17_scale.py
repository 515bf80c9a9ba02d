"""Scale points for the SESSION-16/17 operators (CMS heavy hitters,
span lint, script-mix screen, publish diff, conv windows, truncation
audit, HDR quantile registers, epoch shuffle, chat-template spans,
packing-budget sweep).

Inputs come from the shared ``.bench_cache`` corpus (1.88M extracted
turns at scale 0.1, 18.8M at scale 1), reshaped per op:

* cms_heavy — the token stream of the corpus (≈56M tokens at 0.1) with
  a 1-in-8 doc sample's vocabulary as the candidate probe;
* span_lint — the extraction output table itself (fmt/rule/spans);
* script_mix — the corpus with a planted 1-in-13 Cyrillic-e spoof;
* publish_diff — two 1024-bucket manifests over corpus vs a planted
  next-version (1-in-23 edits, 1-in-97 drops, 1-in-83 re-ingests);
* conv_windows — 256-token windows / 128 stride over the transcripts;
* trunc_policy — 2048-token budget truncation audit over transcripts;
* hdr_quantiles — p50/p90/p99 char-length registers per 5 hash langs;
* epoch_shuffle — 3 epochs × 16 shards over corpus ids.

One timed run per op after a small-slice warm-up; per-window hypervisor
steal share sampled (>2% = soft number). Run after bench.py populated
``.bench_cache``::

    python scripts/bench_s17_scale.py [op ...]              # 1.88M rows
    SPARK_GRAFT_BENCH_SCALE=1 python scripts/bench_s17_scale.py  # 18.8M
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from poc_document_ocr_spark.session import get_spark
from scripts._bench_common import consume, docs_of, run_timed

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cms_job(docs):
    from poc_document_ocr_spark.operators.sketches import cms_heavy_audit

    stream = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    cands = docs.filter(F.col("doc_id") % 8 == 0).select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    return cms_heavy_audit(stream, cands, d=4, w=512, k=20)


def span_lint_job(extracted):
    from poc_document_ocr_spark.operators.extraction import span_lint

    return span_lint(extracted, text_col="text")


def script_mix_job(docs):
    from poc_document_ocr_spark.operators.textstats import script_mix

    spoofed = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0,
            F.replace(F.col("text"), F.lit("e"), F.lit("е")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return script_mix(spoofed)


def publish_diff_job(docs):
    from poc_document_ocr_spark.operators.manifest import (
        bucket_manifest,
        manifest_diff,
    )

    new = docs.filter(F.col("doc_id") % 97 != 3).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 23 == 0,
            F.concat(F.col("text"), F.lit(" [edited]")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 83 == 5).select(
            (F.col("doc_id") + F.lit(100_000_000)).alias("doc_id"), "text"
        )
    )
    return manifest_diff(
        bucket_manifest(docs, n_buckets=1024),
        bucket_manifest(new, n_buckets=1024),
    )


def conv_windows_job(transcripts):
    from poc_document_ocr_spark.operators.examples import conv_windows

    return conv_windows(transcripts, window_tokens=256, stride_tokens=128)


def trunc_policy_job(transcripts):
    from poc_document_ocr_spark.operators.examples import truncation_audit

    return truncation_audit(transcripts, budget_tokens=2048)


def hdr_job(docs):
    from poc_document_ocr_spark.operators.sketches import hdr_quantiles

    return hdr_quantiles(
        docs.select("lang", F.length("text").alias("n_chars")),
        "n_chars",
        probs_pct=(50, 90, 99),
    )


def epoch_shuffle_job(docs):
    from poc_document_ocr_spark.operators.sampling import (
        epoch_shuffle_audit,
    )

    return epoch_shuffle_audit(
        docs.select("doc_id"), n_epochs=3, seed=0
    )


def chat_render_job(transcripts):
    # the shipped rollup, so the measured plan IS the validated plan
    from poc_document_ocr_spark.operators.examples import (
        chat_render_report,
        chat_spans,
    )

    return chat_render_report(chat_spans(transcripts))


def maxlen_sweep_job(docs):
    from poc_document_ocr_spark.operators.sampling import (
        maxlen_sweep,
        shard_assign,
    )

    wt = docs.select(
        F.col("doc_id"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return maxlen_sweep(
        shard_assign(wt, n_shards=32, seed=0),
        budgets=(512, 1024, 2048, 4096),
    )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "0.1")
    only = set(sys.argv[1:])
    spark = get_spark(
        "bench_s17_scale", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)
        },
    )

    extracted = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", f"extracted_{scale}.parquet")
    )
    transcripts = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", f"transcripts_{scale}_v2.parquet")
    )
    docs = docs_of(extracted)

    jobs = {
        "cms_heavy": lambda: consume(cms_job(docs)),
        "span_lint": lambda: consume(span_lint_job(extracted)),
        "script_mix": lambda: consume(script_mix_job(docs)),
        "publish_diff": lambda: consume(publish_diff_job(docs)),
        "conv_windows": lambda: consume(conv_windows_job(transcripts)),
        "trunc_policy": lambda: consume(trunc_policy_job(transcripts)),
        "hdr_quantiles": lambda: consume(hdr_job(docs)),
        "epoch_shuffle": lambda: consume(epoch_shuffle_job(docs)),
        "chat_render": lambda: consume(chat_render_job(transcripts)),
        "maxlen_sweep": lambda: consume(maxlen_sweep_job(docs)),
    }
    unknown = only - set(jobs)
    if unknown:
        raise SystemExit(f"unknown op name(s): {sorted(unknown)}; "
                         f"choose from {sorted(jobs)}")
    selected = {n: f for n, f in jobs.items() if not only or n in only}

    small_e = extracted.limit(5000).localCheckpoint()
    small_t = transcripts.limit(5000).localCheckpoint()
    small_d = docs_of(small_e).localCheckpoint()
    warm = {
        "cms_heavy": lambda: consume(cms_job(small_d)),
        "span_lint": lambda: consume(span_lint_job(small_e)),
        "script_mix": lambda: consume(script_mix_job(small_d)),
        "publish_diff": lambda: consume(publish_diff_job(small_d)),
        "conv_windows": lambda: consume(conv_windows_job(small_t)),
        "trunc_policy": lambda: consume(trunc_policy_job(small_t)),
        "hdr_quantiles": lambda: consume(hdr_job(small_d)),
        "epoch_shuffle": lambda: consume(epoch_shuffle_job(small_d)),
        "chat_render": lambda: consume(chat_render_job(small_t)),
        "maxlen_sweep": lambda: consume(maxlen_sweep_job(small_d)),
    }
    timings, steal = run_timed(spark, selected, warm)

    print(json.dumps({"scale": scale, "timings": timings, "steal": steal}))


if __name__ == "__main__":
    main()
