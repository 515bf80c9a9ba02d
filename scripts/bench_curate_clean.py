"""One-off clean-window re-measurement of the composed curate_pipeline
query at bench-corpus scale (1.88M docs at scale 0.1, 18.8M at scale 1).

The session-11 translate() fix re-measured curate_pipeline at 53.4 s but
inside a 21.4% steal window (BENCH.md flags it soft). This harness runs
the EXACT q_curate_pipeline path — ``_docs`` is overridden to serve the
bench corpus, everything downstream is the production query — with the
shared steal sampling, so the number can be recorded firm::

    python scripts/bench_curate_clean.py            # 1.88M docs
    SPARK_GRAFT_BENCH_SCALE=1 python scripts/bench_curate_clean.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import poc_document_ocr_spark.entrypoints as ep
from poc_document_ocr_spark.session import get_spark
from scripts._bench_common import consume, docs_of, steal_sample

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "0.1")
    spark = get_spark(
        "bench_curate_clean", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)
        },
    )
    extracted = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", f"extracted_{scale}.parquet")
    )
    docs = docs_of(extracted)
    ep._docs = lambda _spark, _sf: docs  # the query path itself is unchanged

    # warm-up on a small slice so JVM/Arrow init is outside the window
    small = docs.limit(5000).localCheckpoint()
    ep._docs = lambda _spark, _sf: small
    consume(ep.QUERIES["curate_pipeline"](spark, "unused"))
    ep._docs = lambda _spark, _sf: docs

    s0, t0 = steal_sample()
    w0 = time.time()
    consume(ep.QUERIES["curate_pipeline"](spark, "unused"))
    wall = time.time() - w0
    s1, t1 = steal_sample()
    steal = (s1 - s0) / max(t1 - t0, 1)
    print(json.dumps({
        "scale": scale,
        "timings": {"curate_pipeline": round(wall, 2)},
        "steal": {"curate_pipeline": round(steal, 4)},
    }))


if __name__ == "__main__":
    main()
