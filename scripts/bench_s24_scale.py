"""Scale points for the SESSION-24 operators (timestamp lint,
AI-artifact census, Flesch readability, chars→tokens OLS fit).

Inputs come from the shared ``.bench_cache`` corpus (1.88M extracted
turns at scale 0.1, 18.8M at scale 1), reshaped per op:

* timestamp_lint — the transcripts with a synthetic epoch carrying
  planted clock damage (1-in-13 turns jump 25h backward, 1-in-17 repeat
  the previous second exactly) so both violation classes are exercised
  at volume;
* ai_artifacts — the corpus with canned assistant phrases injected on
  1-in-7 / 1-in-11 / 1-in-13 doc conditions (the census still scans
  EVERY doc — injection density changes the hit rows, not the work);
* readability — the corpus as-is (map-only score);
* length_token_fit — the corpus grouped by the 5-way hash lang with
  x = char length (the sufficient-stats groupBy shape).

One timed run per op after a small-slice warm-up; per-window hypervisor
steal share sampled (>2% = soft number). Run after bench.py populated
``.bench_cache``::

    python scripts/bench_s24_scale.py [op ...]              # 1.88M rows
    SPARK_GRAFT_BENCH_SCALE=1 python scripts/bench_s24_scale.py  # 18.8M
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


def ts_lint_job(transcripts):
    from poc_document_ocr_spark.operators.examples import timestamp_lint

    t = transcripts.withColumn(
        "epoch",
        F.xxhash64("conv_id") % 1000000
        + F.col("turn_idx").cast("long") * 60
        - F.when(F.col("turn_idx") % 13 == 7, F.lit(90000))
        .when(F.col("turn_idx") % 17 == 5, F.lit(60))
        .otherwise(F.lit(0)),
    )
    return timestamp_lint(t)


def ai_artifacts_job(docs):
    from poc_document_ocr_spark.operators.textstats import (
        ai_artifact_census,
    )

    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 2,
                F.lit(" As an AI language model, I cannot assist with"
                      " that."),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 3,
                F.lit(" Certainly! Here is the answer."),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 5,
                F.lit(" As of my knowledge cutoff. Regenerate response"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return ai_artifact_census(injected)


def readability_job(docs):
    from poc_document_ocr_spark.operators.textstats import readability

    return readability(docs)


def fit_job(docs):
    from poc_document_ocr_spark.operators.textstats import (
        length_token_fit,
    )

    return length_token_fit(
        docs.withColumn("n_chars", F.length("text")), group_col="lang"
    )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "0.1")
    only = set(sys.argv[1:])
    spark = get_spark(
        "bench_s24_scale", cpus=cpus, shuffle_partitions=cpus,
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
        "timestamp_lint": lambda: consume(ts_lint_job(transcripts)),
        "ai_artifacts": lambda: consume(ai_artifacts_job(docs)),
        "readability": lambda: consume(readability_job(docs)),
        "length_token_fit": lambda: consume(fit_job(docs)),
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
        "timestamp_lint": lambda: consume(ts_lint_job(small_t)),
        "ai_artifacts": lambda: consume(ai_artifacts_job(small_d)),
        "readability": lambda: consume(readability_job(small_d)),
        "length_token_fit": lambda: consume(fit_job(small_d)),
    }
    timings, steal = run_timed(spark, selected, warm)

    print(json.dumps({"scale": scale, "timings": timings, "steal": steal}))


if __name__ == "__main__":
    main()
