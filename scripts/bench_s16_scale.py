"""Scale points for the SESSION-16 operator (margin-based bitext mining).

Inputs are deterministic planted vectors (the bench_s4_scale.py family):
the sf0.1 embeddings table replicated K× with a tiny per-replica
perturbation, split into two "monolingual corpora" by base-id parity
(replication preserves parity, so every copy of a base vector stays on
its side — the two sides genuinely never share a vector id).

Two timed shapes:

* ``bitext_exact_10k`` — the guarded exact mode at its contract bound
  (10k × 10k sides, broadcast cross join = 100M cosine evaluations):
  the worst case the guard permits, and the cost floor the bucketed
  path must beat.
* ``bitext_lsh`` — the corpus shape: 10-plane sign-LSH buckets on each
  side, cross-set bucket equi-join for candidates, then the full
  margin scorer (rank windows with WindowGroupLimit pruning,
  k-NN-average hubness calibration, mutual-best join) over ~40M+
  candidate pairs at 200k vectors/side.

One timed run per op after a small-slice warm-up; per-window hypervisor
steal share sampled (>2% = soft number)::

    python scripts/bench_s16_scale.py [op ...]          # 400k vectors
    SPARK_GRAFT_BENCH_SCALE=1 python scripts/bench_s16_scale.py  # 4M
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from poc_document_ocr_spark.operators.similarity import (
    bitext_mine,
    signlsh_buckets,
)
from poc_document_ocr_spark.session import get_spark
from scripts._bench_common import steal_sample as _steal_sample

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: 10 planes → 1024 buckets (same family as bench_s4_scale.py; the scale
#: contract is that callers grow the bit count with the corpus)
PLANES = [
    [((7 * i + 3 * j) % 11) - 5 for j in range(64)] for i in range(10)
]


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


def lsh_candidates(a, b):
    """Cross-set sign-LSH bucket pairs — the incremental-ingest shape:
    side a never pairs with itself, only bucket collisions pair up."""
    ab = signlsh_buckets(a, PLANES).select(
        F.col("vec_id").alias("a_id"), "bucket"
    )
    bb = signlsh_buckets(b, PLANES).select(
        F.col("vec_id").alias("b_id"), "bucket"
    )
    return ab.join(bb, "bucket").select("a_id", "b_id")


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "0.1")
    only = set(sys.argv[1:])
    spark = get_spark(
        "bench_s16_scale", cpus=cpus, shuffle_partitions=cpus
    )
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    copies = 2000 if scale == "1" else 200
    # the embeddings parquet is one file → without an explicit
    # repartition every pair stage downstream of the replicate
    # crossJoin runs near-serial (measured: the 400k run blew a 30 min
    # budget at ~1 core); spread the planted corpus once, up front
    vecs = planted_vectors(spark, sf_dir, copies).repartition(
        cpus * 4, "vec_id"
    )
    # replication preserves base-id parity (rep·n is even), so the two
    # sides partition the planted corpus by base vector
    a = vecs.filter(F.col("vec_id") % 2 == 0)
    b = vecs.filter(F.col("vec_id") % 2 == 1)
    a10k = a.filter(F.col("vec_id") < 20_000)
    b10k = b.filter(F.col("vec_id") < 20_000)

    def consume(df):
        cols = [F.col(c) for c in df.columns]
        return df.select(F.xxhash64(*cols).alias("_h")).agg(
            F.expr("bit_xor(_h)")
        ).collect()

    jobs = {
        "bitext_exact_10k": lambda: consume(
            bitext_mine(a10k, b10k, k=4, max_side=10_000)
        ),
        "bitext_lsh": lambda: consume(
            bitext_mine(a, b, k=4, candidates=lsh_candidates(a, b))
        ),
    }
    unknown = only - set(jobs)
    if unknown:
        raise SystemExit(f"unknown op name(s): {sorted(unknown)}; "
                         f"choose from {sorted(jobs)}")
    selected = {n: f for n, f in jobs.items() if not only or n in only}

    # warm-up on a small slice
    sa = a.filter(F.col("vec_id") < 2_000).localCheckpoint()
    sb = b.filter(F.col("vec_id") < 2_000).localCheckpoint()
    consume(bitext_mine(sa, sb, k=4, candidates=lsh_candidates(sa, sb)))

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
