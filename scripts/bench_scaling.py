"""Two-parallelism scaling evidence (north-rule criterion).

The rule requires ≥0.8 throughput scaling efficiency from N to 4N
executors with byte-identical output. No real cluster exists in this
sandbox, so we evidence it the sanctioned way: the same job at
``local[8]`` and ``local[32]`` on the same input, reporting throughput at
both plus efficiency, and asserting the sorted consolidated output hashes
are identical across parallelism.

Usage::

    python scripts/bench_scaling.py [sf_dir]   # writes BENCH.md section
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def output_hash(cpus: int, sf_dir: str) -> str:
    """Hash of the sorted consolidated output at a given parallelism."""
    code = f"""
import hashlib, sys
sys.path.insert(0, {REPO!r})
from poc_document_ocr_spark.session import get_spark
from poc_document_ocr_spark.operators.extraction import extract_turns, salted_repartition
from poc_document_ocr_spark.plans.pipeline import consolidate_stage
import bench
spark = get_spark("scalehash", cpus={cpus}, shuffle_partitions={cpus})
turns = bench.synth_transcripts(spark, bench._sf_of({sf_dir!r}))
rec = consolidate_stage(extract_turns(salted_repartition(turns))).drop("provenance", "turn_idxs")
rows = sorted(repr(tuple(r)) for r in rec.collect())
print("HASH:" + hashlib.md5("\\n".join(rows).encode()).hexdigest())
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        check=True,
    ).stdout
    return [l for l in out.splitlines() if l.startswith("HASH:")][-1][5:]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # N and 4N parallelism. Default 4→16: both within the box's physical
    # cores, so the ratio measures the job's scaling rather than
    # hyperthread siblings sharing execution units (a real cluster's
    # executors don't share cores). Override: bench_scaling.py <sf_dir> lo hi
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    r_lo = run_bench(lo, sf_dir)
    r_hi = run_bench(hi, sf_dir)
    tput_lo, tput_hi = r_lo["turns_per_sec"], r_hi["turns_per_sec"]
    eff = tput_hi / (tput_lo * (hi / lo))
    h_lo = output_hash(lo, sf_dir)
    h_hi = output_hash(hi, sf_dir)
    identical = h_lo == h_hi

    md = f"""# BENCH — measured numbers (this repo)

North-rule scaling criterion, evidenced at two parallelism levels on the
same synthetic transcript corpus (no real cluster in this sandbox):

| parallelism | extracted turns/sec | extract sec | consolidate sec | suite sec |
|---|---|---|---|---|
| local[{lo}]  | {tput_lo} | {r_lo['queries']['extract']} | {r_lo['queries']['consolidate']} | {r_lo['value']} |
| local[{hi}] | {tput_hi} | {r_hi['queries']['extract']} | {r_hi['queries']['consolidate']} | {r_hi['value']} |

* corpus: sf={r_lo['sf']}, {r_lo['n_turns']} turns (~40% HTML / ~30% layout / ~30% plain, long-tail skew conversation included)
* throughput scaling efficiency local[{lo}]→local[{hi}] (4×): **{eff:.2f}** (criterion ≥ 0.8{' — MET' if eff >= 0.8 else ' — NOT MET'})
* consolidated output byte-identical across parallelism: **{identical}** (md5 {h_lo[:12]}… vs {h_hi[:12]}…)
* full per-query timings: see BENCH JSON below

```json
{json.dumps(r_lo)}
{json.dumps(r_hi)}
```
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
