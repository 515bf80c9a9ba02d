"""Scale points for the round-3 session-3 ops (round-3 VERDICT task #9).

Times the five operators that had no 1.88M-row measurement — winnow
overlap, dup profile, field coverage, conv shape, session-size quantiles —
over corpus-scale inputs built from the bench cache:

* documents  = the 1,877,403 extracted texts of the sf0.1 bench corpus
  (375× the 5k-row oracle table);
* transcripts = the raw 1.88M-turn corpus (conv_shape's real input);
* events     = the sf0.1 events table replicated 20× with disjoint
  user-id ranges (2M events, 30k users) — per-user session structure is
  preserved exactly, only the user population scales.

Methodology matches BENCH.md's scale-point sections: ONE timed run per op
after a small-slice warm-up compiles the plan shapes, with the hypervisor
steal share of each window sampled and reported (numbers from windows
above the 2% gate are soft). Run AFTER bench.py has populated
``.bench_cache`` (it builds the corpus + extracted table)::

    python scripts/bench_ops_scale.py
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




def winnow_overlap(docs):
    """q_winnow_overlap's exact composition (shared operator)."""
    from poc_document_ocr_spark.operators.textstats import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    wf = winnow_fingerprints(docs, k=8, w=4)
    return winnow_overlap_pairs(wf, min_df=2, max_df=10, min_shared=5)


def dup_profile(docs):
    """Inline twin of q_dup_profile's cluster-size histogram."""
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    clusters = (
        docs.select(F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    total = clusters.agg(F.sum("k").alias("_tot"))
    return (
        clusters.groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .crossJoin(F.broadcast(total))
        .select(
            "k", "n_clusters",
            (F.col("k") * F.col("n_clusters")).alias("n_docs"),
            F.expr("(k - 1) * n_clusters * 1000000 div _tot").alias(
                "redundant_ppm"
            ),
        )
    )


def field_coverage(extracted):
    """Coverage rollup over the full consolidation fold (struct grain)."""
    from poc_document_ocr_spark.plans.pipeline import consolidate_stage
    from poc_document_ocr_spark.schema import FIELD_NAMES

    rec = consolidate_stage(extracted)
    filled = None
    for name in FIELD_NAMES:
        e = F.when(F.col(f"{name}.value").isNotNull(), 1).otherwise(0)
        filled = e if filled is None else filled + e
    return (
        rec.select(filled.cast("long").alias("n_filled"))
        .groupBy("n_filled")
        .agg(F.count(F.lit(1)).cast("long").alias("n_records"))
    )


def conv_shape(turns):
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
    return turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        one_if(F.col("role") == "user").alias("n_user"),
        one_if(F.col("role") == "assistant").alias("n_assistant"),
        one_if(F.col("tool").isNotNull()).alias("n_tool_calls"),
        F.countDistinct("role").cast("long").alias("n_roles"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
    )


def session_size_q(events):
    from poc_document_ocr_spark.operators.events import sessionize_events
    from poc_document_ocr_spark.operators.sampling import group_quantiles

    sessions = sessionize_events(events, gap_minutes=30).select(
        F.lit("all").alias("grp"), F.col("n_events")
    )
    return group_quantiles(
        sessions, group_col="grp", value_col="n_events", qs=(0.5, 0.9, 0.99)
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "bench_ops_scale", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    ex_path = os.path.join(REPO, ".bench_cache", "extracted_0.1.parquet")
    tr_path = os.path.join(REPO, ".bench_cache", "transcripts_0.1_v2.parquet")
    extracted = spark.read.parquet(ex_path)
    turns = spark.read.parquet(tr_path)
    docs = extracted.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
        F.col("extracted_text").alias("text"),
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    events = ev.crossJoin(
        spark.range(20).select(F.col("id").alias("_rep"))
    ).select(
        "event_id",
        "ts",
        (F.col("user_id") + F.col("_rep") * 1_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )

    # warm-up: compile every plan shape on small slices
    small_docs = docs.limit(2000).localCheckpoint()
    winnow_overlap(small_docs).count()
    dup_profile(small_docs).count()
    field_coverage(extracted.limit(2000).localCheckpoint()).count()
    conv_shape(turns.limit(2000).localCheckpoint()).count()
    session_size_q(events.limit(5000).localCheckpoint()).count()

    jobs = {
        "winnow_overlap": lambda: winnow_overlap(docs).count(),
        "dup_profile": lambda: dup_profile(docs).count(),
        "field_coverage": lambda: field_coverage(extracted).count(),
        "conv_shape": lambda: conv_shape(turns)
        .agg(F.count(F.lit(1)), F.sum("n_chars"))
        .collect(),
        "session_size_q": lambda: session_size_q(events).collect(),
    }
    timings, steal = {}, {}
    for name, fn in jobs.items():
        spark.catalog.clearCache()
        s0, j0 = _steal_sample()
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 2)
        s1, j1 = _steal_sample()
        steal[name] = round((s1 - s0) / max(j1 - j0, 1), 4)

    print(json.dumps({
        "metric": "session-3 op scale points (one run after warm-up)",
        "n_docs": docs.count(),
        "n_turns": turns.count(),
        "n_events": events.count(),
        "cpus": cpus,
        "timings_sec": timings,
        "steal_share": steal,
    }))


if __name__ == "__main__":
    main()
