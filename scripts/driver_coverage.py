"""Driver-visibility audit: which CORRECTNESS_r{N}.json recorded each query.

The external driver records only the FIRST 50 ``QUERIES`` entries per
round; rounds 3-5 rotated never-recorded queries into that window. This
prints the cumulative coverage so nobody has to re-derive it from the
artifacts::

    python scripts/driver_coverage.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    rounds: dict[str, set[str]] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", os.path.basename(p))
        if not m:
            continue
        rounds[f"r{int(m.group(1))}"] = set(json.load(open(p)))

    import __spark_entry__ as se

    names = list(se.queries())
    first50 = set(names[:50])
    recorded: dict[str, list[str]] = {n: [] for n in names}
    for rnd, keys in rounds.items():
        for k in keys:
            if k in recorded:
                recorded[k].append(rnd)

    ever = {n for n, rs in recorded.items() if rs}
    never = [n for n in names if not recorded[n]]
    pending = sorted(first50 - ever)
    print(f"queries: {len(names)}  driver-recorded (cumulative): "
          f"{len(ever)}  never-recorded: {len(never)}")
    print(f"current first-50 window: {len(pending)} queries awaiting "
          f"their first driver row")
    if pending:
        print("  " + ", ".join(pending))
    tail_never = sorted(set(never) - first50)
    if tail_never:
        print(f"never-recorded outside the window ({len(tail_never)}; "
              "harness-verified in CORRECTNESS_FULL_r*.json):")
        print("  " + ", ".join(tail_never))
    full = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_FULL_r*.json"))
    )
    if full:
        d = json.load(open(full[-1]))
        green = sum(1 for v in d.values() if v.get("hash_match"))
        print(f"latest full-surface artifact {os.path.basename(full[-1])}: "
              f"{green}/{len(d)} hash-green")


if __name__ == "__main__":
    main()
