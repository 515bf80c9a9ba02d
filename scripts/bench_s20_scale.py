"""Scale points for the SESSION-20 operators (data-budget planner,
cross-turn PII spread, tool-call lint, moment-register merge,
edit verify, turn merge, system-prompt census).

Inputs come from the shared ``.bench_cache`` corpus (1.88M extracted
turns at scale 0.1, 18.8M at scale 1), reshaped per op: the PII corpus
seeds a deterministic phone line into ~1/8 of turns (mirroring the
oracle corpus construction) so the extract→group path has real hits;
the tool-call corpus synthesizes JSON argument payloads with the same
malformed/missing modular mix as the oracle-checked query.

One timed run per op after a small-slice warm-up; per-window hypervisor
steal share sampled (>2% = soft number). Run after bench.py populated
``.bench_cache``::

    python scripts/bench_s20_scale.py [op ...]              # 1.88M rows
    SPARK_GRAFT_BENCH_SCALE=1 python scripts/bench_s20_scale.py  # 18.8M
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


def edit_verify_job(docs):
    from poc_document_ocr_spark.operators.dedup import edit_distance_verify
    from pyspark.sql import functions as F

    # pair 1-in-10 docs with a mutated twin (id+1 never collides with
    # the xxhash64 ids) so the measurement isolates the verify stage --
    # the equi joins + per-pair DP -- not a candidate generator
    sel = docs.filter("pmod(doc_id, 10) = 0")
    twins = sel.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra trailing tokens here"))
        .alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(twins)
    pairs = sel.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 1).alias("id_b"),
    )
    return edit_distance_verify(corpus, pairs)


def turn_merge_job(transcripts):
    from poc_document_ocr_spark.operators.examples import (
        merge_same_role_turns,
    )

    return merge_same_role_turns(transcripts)


def sys_prompts_job(transcripts):
    from poc_document_ocr_spark.operators.examples import (
        system_prompt_profile,
    )
    from pyspark.sql import functions as F

    # canned-head + long-tail prompt mix (the oracle-query corpus shape)
    h = F.xxhash64("conv_id", "turn_idx")
    t = transcripts.withColumn(
        "text",
        F.when(
            F.pmod(h, F.lit(7)) == 0,
            F.concat(F.lit("rare prompt "), h.cast("string")),
        ).otherwise(
            F.concat(F.lit("canned prompt "), F.pmod(h, F.lit(3)))
        ),
    )
    return system_prompt_profile(t)


def stats_merge_job(docs):
    from poc_document_ocr_spark.operators.sketches import (
        merge_moments,
        moment_registers,
    )
    from pyspark.sql import functions as F

    wt = docs.select(
        "doc_id", "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return merge_moments(
        moment_registers(wt.filter("doc_id % 5 != 0")),
        moment_registers(wt.filter("doc_id % 5 = 0")),
    )


def data_budget_job(docs):
    from poc_document_ocr_spark.operators.sampling import data_budget

    # a 10^12-token budget exercises the DECIMAL(38,0) widening path
    return data_budget(docs, budget_tokens=10**12, repeat_cap_x1000=4000)


def pii_corpus(transcripts):
    """~1/8 of turns get a deterministic phone line appended (the
    oracle corpus shape), leaving 7/8 as regex-scan-only rows."""
    h = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(8))
    p = F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit("p")), F.lit(100))
    return transcripts.withColumn(
        "text",
        F.when(
            h == 5,
            F.concat(
                F.col("text"),
                F.lit("\nphoneNumber: 555-01"),
                F.lpad(p.cast("string"), 2, "0"),
            ),
        ).otherwise(F.col("text")),
    )


def pii_spread_job(transcripts):
    from poc_document_ocr_spark.operators.textstats import pii_spread

    return pii_spread(pii_corpus(transcripts))


def tool_call_lint_job(transcripts):
    from poc_document_ocr_spark.operators.examples import tool_call_lint

    h = F.xxhash64("conv_id", "turn_idx")
    q = F.pmod(h, F.lit(50)).cast("string")
    k = F.pmod(h, F.lit(10)).cast("string")
    base = F.concat(F.lit('{"query": "q'), q, F.lit('", "k": '), k)
    args = (
        F.when(F.pmod(h, F.lit(17)) == 3, base)  # unclosed object
        .when(
            F.pmod(h, F.lit(19)) == 5,
            F.concat(F.lit('{"query": "q'), q, F.lit('"}')),
        )
        .otherwise(F.concat(base, F.lit("}")))
    )
    calls = transcripts.select(
        F.concat(F.lit("tool"), F.pmod(h, F.lit(3))).alias("tool"),
        args.alias("args"),
    )
    return tool_call_lint(calls, required=("query", "k"))


def score_calibrate_job(docs):
    from poc_document_ocr_spark.operators.textstats import (
        calibrate_scores,
        calibration_report,
    )
    from pyspark.sql import functions as F

    # the oracle corpus shape: 4 integer sources with SHIFTED score
    # locations, so the global raw cutoff keeps uneven shares and the
    # calibrated cutoff equalizes them
    src = F.pmod(F.col("doc_id"), F.lit(4))
    c = docs.select(
        src.alias("src"),
        (F.length("text") % 97 + 25 * src).alias("score"),
    )
    m = calibrate_scores(c, group_col="src", score_col="score")
    return calibration_report(
        m, raw_cutoff=60, target_ppm=800_000, group_col="src"
    )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "0.1")
    only = set(sys.argv[1:])
    spark = get_spark(
        "bench_s20_scale", cpus=cpus, shuffle_partitions=cpus,
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
        "turn_merge": lambda: consume(turn_merge_job(transcripts)),
        "sys_prompts": lambda: consume(sys_prompts_job(transcripts)),
        "edit_verify": lambda: consume(edit_verify_job(docs)),
        "stats_merge": lambda: consume(stats_merge_job(docs)),
        "data_budget": lambda: consume(data_budget_job(docs)),
        "pii_spread": lambda: consume(pii_spread_job(transcripts)),
        "tool_call_lint": lambda: consume(tool_call_lint_job(transcripts)),
        "score_calibrate": lambda: consume(score_calibrate_job(docs)),
    }
    unknown = only - set(jobs)
    if unknown:
        raise SystemExit(f"unknown op name(s): {sorted(unknown)}; "
                         f"choose from {sorted(jobs)}")
    selected = {n: f for n, f in jobs.items() if not only or n in only}

    small_t = transcripts.limit(5000).localCheckpoint()
    small_d = docs.limit(5000).localCheckpoint()
    warm = {
        "turn_merge": lambda: consume(turn_merge_job(small_t)),
        "sys_prompts": lambda: consume(sys_prompts_job(small_t)),
        "edit_verify": lambda: consume(edit_verify_job(small_d)),
        "stats_merge": lambda: consume(stats_merge_job(small_d)),
        "data_budget": lambda: consume(data_budget_job(small_d)),
        "pii_spread": lambda: consume(pii_spread_job(small_t)),
        "tool_call_lint": lambda: consume(tool_call_lint_job(small_t)),
        "score_calibrate": lambda: consume(score_calibrate_job(small_d)),
    }
    timings, steal = run_timed(spark, selected, warm)

    print(json.dumps({"scale": scale, "timings": timings, "steal": steal}))


if __name__ == "__main__":
    main()
