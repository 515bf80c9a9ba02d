"""Scale points for the SESSION-25 operators (prefix-filtered exact
Jaccard join, per-dimension embedding audit, packing-order gain, Kish
effective sample size).

Inputs come from the shared ``.bench_cache`` corpus (1.88M extracted
turns at scale 0.1, 18.8M at scale 1), reshaped per op:

* prefix_join — 3-gram shingles of the corpus at t = 0.9 (the dedup
  operating point: short prefixes, near-identical pairs only; the
  seeded corpus's repeated construction templates make this a STRESS
  test for candidate fan-out, not a toy);
* emb_dims — the sf0.1 embeddings (2k × 64d) replicated K× with the
  planted perturbation (200× at scale 0.1 → 400k vectors = 25.6M
  exploded rows; 2000× at scale 1 → 4M vectors = 256M rows);
* pack_order_gain — (shard, id, n_tokens) projection, 32 shards,
  budget 2048 (two window sorts under one shard partitioning);
* ess_report — per-lang Kish ESS under a harmonic dedup down-weight.

One timed run per op after a small-slice warm-up; per-window hypervisor
steal share sampled (>2% = soft number). Run after bench.py populated
``.bench_cache``::

    python scripts/bench_s25_scale.py [op ...]              # 1.88M rows
    SPARK_GRAFT_BENCH_SCALE=1 python scripts/bench_s25_scale.py  # 18.8M
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


def prefix_join_job(docs):
    # operating rule (see prefix_similarity_join docstring): exact-dedup
    # to distinct-text representatives FIRST — the raw corpus's template
    # families make the TRUE pair set quadratic (the raw-corpus run
    # exhausted 36 GB of spill at 18.8M rows)
    from poc_document_ocr_spark.operators.dedup import (
        prefix_similarity_join,
        word_shingles,
    )

    reps = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    return prefix_similarity_join(word_shingles(reps), t_ppm=900_000)


def emb_dims_job(vecs):
    from poc_document_ocr_spark.operators.similarity import emb_dim_profile

    return emb_dim_profile(vecs)


def source_cent_job(vecs):
    from poc_document_ocr_spark.operators.similarity import source_centroids

    labeled = vecs.withColumn(
        "label", F.concat(F.lit("src"), F.pmod("vec_id", F.lit(20)))
    )
    return source_centroids(labeled)


def pack_gain_job(docs):
    from poc_document_ocr_spark.operators.sampling import (
        pack_order_gain,
        shard_assign,
    )

    wt = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return pack_order_gain(
        shard_assign(wt, n_shards=32, seed=0), budget=2048
    )


def ess_job(docs):
    from poc_document_ocr_spark.operators.sampling import ess_report

    w = docs.select(
        "lang", F.expr("1000000 div (1 + pmod(doc_id, 7))").alias("w_ppm")
    )
    return ess_report(w, group_col="lang")


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "0.1")
    only = set(sys.argv[1:])
    spark = get_spark(
        "bench_s25_scale", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)
        },
    )

    extracted = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", f"extracted_{scale}.parquet")
    )
    docs = docs_of(extracted)
    copies = 2000 if scale == "1" else 200
    vecs = planted_vectors(spark, "/root/testdata/sf0.1", copies)

    jobs = {
        "prefix_join": lambda: consume(prefix_join_job(docs)),
        "emb_dims": lambda: consume(emb_dims_job(vecs)),
        "source_centroids": lambda: consume(source_cent_job(vecs)),
        "pack_order_gain": lambda: consume(pack_gain_job(docs)),
        "ess_report": lambda: consume(ess_job(docs)),
    }
    unknown = only - set(jobs)
    if unknown:
        raise SystemExit(f"unknown op name(s): {sorted(unknown)}; "
                         f"choose from {sorted(jobs)}")
    selected = {n: f for n, f in jobs.items() if not only or n in only}

    small_d = docs_of(extracted.limit(5000).localCheckpoint()).localCheckpoint()
    small_v = planted_vectors(spark, "/root/testdata/sf0.1", 2)
    warm = {
        "prefix_join": lambda: consume(prefix_join_job(small_d)),
        "emb_dims": lambda: consume(emb_dims_job(small_v)),
        "source_centroids": lambda: consume(source_cent_job(small_v)),
        "pack_order_gain": lambda: consume(pack_gain_job(small_d)),
        "ess_report": lambda: consume(ess_job(small_d)),
    }
    timings, steal = run_timed(spark, selected, warm)

    print(json.dumps({"scale": scale, "timings": timings, "steal": steal}))


if __name__ == "__main__":
    main()
