"""Scale points for the SESSION-13 operators (HLL distinct sketch, Bloom
decontamination prefilter, near-dup cluster purity).

Inputs, all deterministic (same harness family as bench_s11_scale.py):

* documents — the extracted texts of the 1.88M-turn bench corpus with 20
  hash-derived crawl sources and 5 hash-derived language labels;
* benchmark — the 1/17 hash slice of the corpus (the q_bloom_prune shape);
* components — a synthetic corpus-cardinality cluster assignment
  (xxhash-derived cluster of mean size ~3) so cluster_purity's own cost
  (one AQE join + two groupBys) is measured in isolation from the LSH +
  connected-components stages that already have their own scale points.

Three timed variants for the HLL op: the production sketch-only path
(``with_exact=False`` — the thing that replaces count(DISTINCT) at
100 TB), the full audit path (exact count rides along), and the exact
count(DISTINCT) alone as the cost baseline the sketch saves.

One timed run per op after a small-slice warm-up; per-window hypervisor
steal share sampled (>2% = soft number). Run after bench.py populated
``.bench_cache``::

    python scripts/bench_s13_scale.py [op ...]              # 1.88M rows
    SPARK_GRAFT_BENCH_SCALE=1 python scripts/bench_s13_scale.py  # 18.8M
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


def _grams3(docs):
    """(lang, gram) word-3-gram stream — the q_hll_distinct input shape."""
    return docs.filter(F.size(F.split(F.col("text"), " ")) >= 3).select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 2),"
                " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
            )
        ).alias("gram"),
    )


def hll_sketch_job(docs):
    from poc_document_ocr_spark.operators.sketches import hll_distinct

    return hll_distinct(_grams3(docs), "lang", "gram", with_exact=False)


def hll_audit_job(docs):
    from poc_document_ocr_spark.operators.sketches import hll_distinct

    return hll_distinct(_grams3(docs), "lang", "gram", with_exact=True)


def exact_distinct_job(docs):
    """The cost baseline the sketch replaces: exact count(DISTINCT gram)
    per language — every distinct gram crosses the wire."""
    return _grams3(docs).groupBy("lang").agg(
        F.countDistinct("gram").cast("long").alias("exact_distinct")
    )


def bloom_job(docs, bench):
    from poc_document_ocr_spark.operators.sketches import (
        bloom_prefilter_audit,
    )

    return bloom_prefilter_audit(docs, bench, n=8)


def purity_job(docs):
    from poc_document_ocr_spark.operators.dedup import cluster_purity

    comp = docs.select(
        "doc_id",
        F.pmod(F.xxhash64("doc_id", F.lit("cl")), F.lit(600_000)).alias(
            "component"
        ),
    )
    return cluster_purity(comp, docs.select("doc_id", "source"))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "0.1")
    only = set(sys.argv[1:])
    spark = get_spark(
        "bench_s13_scale", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)
        },
    )

    extracted = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", f"extracted_{scale}.parquet")
    )
    docs = extracted.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
        F.col("extracted_text").alias("text"),
        F.concat(
            F.lit("src"), F.pmod(F.xxhash64("doc_id"), F.lit(20))
        ).alias("source"),
        F.concat(
            F.lit("lang"), F.pmod(F.xxhash64("doc_id", F.lit("l")),
                                  F.lit(5))
        ).alias("lang"),
    )
    bench = docs.filter(
        F.pmod(F.xxhash64("doc_id", F.lit("bm")), F.lit(17)) == 0
    ).select("doc_id", "text")

    def consume(df):
        cols = [F.col(c) for c in df.columns]
        return df.select(F.xxhash64(*cols).alias("_h")).agg(
            F.expr("bit_xor(_h)")
        ).collect()

    jobs = {
        "hll_sketch": lambda d=docs: consume(hll_sketch_job(d)),
        "hll_audit": lambda d=docs: consume(hll_audit_job(d)),
        "exact_distinct": lambda d=docs: consume(exact_distinct_job(d)),
        "bloom_prune": lambda d=docs, b=bench: consume(bloom_job(d, b)),
        "cluster_purity": lambda d=docs: consume(purity_job(d)),
    }
    unknown = only - set(jobs)
    if unknown:
        raise SystemExit(f"unknown op name(s): {sorted(unknown)}; "
                         f"choose from {sorted(jobs)}")
    selected = {n: f for n, f in jobs.items() if not only or n in only}

    small = docs.limit(5000).localCheckpoint()
    small_b = small.filter(
        F.pmod(F.xxhash64("doc_id", F.lit("bm")), F.lit(17)) == 0
    ).select("doc_id", "text")
    for name in selected:
        jobs_small = {
            "hll_sketch": lambda: consume(hll_sketch_job(small)),
            "hll_audit": lambda: consume(hll_audit_job(small)),
            "exact_distinct": lambda: consume(exact_distinct_job(small)),
            "bloom_prune": lambda: consume(bloom_job(small, small_b)),
            "cluster_purity": lambda: consume(purity_job(small)),
        }
        jobs_small[name]()

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
