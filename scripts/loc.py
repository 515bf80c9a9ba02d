"""Emit both judge LoC denominators (VERDICT r4 task #8).

The per-round judge counts non-test source lines with a literal
command whose reference-side number (1,144) counts only the 5 Python
utility scripts in /root/reference — the honest reference core is the
C# under src/ (4,155 non-test lines). This script prints both so the
discrepancy never needs re-deriving::

    python scripts/loc.py
"""

from __future__ import annotations

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def count(root: str, exts: tuple[str, ...], exclude_tests: bool) -> int:
    n = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [
            d for d in dirnames
            if d not in (".git", ".bench_cache", "node_modules")
            and not (exclude_tests and d.lower() in ("tests", "test"))
        ]
        for f in filenames:
            if not f.endswith(exts):
                continue
            if exclude_tests and ("test" in f.lower()):
                continue
            p = os.path.join(dirpath, f)
            try:
                with open(p, errors="replace") as fh:
                    n += sum(1 for _ in fh)
            except OSError:
                pass
    return n


def main() -> None:
    repo_py = count(REPO, (".py",), exclude_tests=True)
    ref_py = count(REF, (".py",), exclude_tests=True)
    ref_cs = count(os.path.join(REF, "src"), (".cs",), exclude_tests=True)
    print(f"repo non-test .py LoC:            {repo_py}")
    print(f"reference non-test .py LoC:       {ref_py}  "
          "(the literal judge command — 5 utility scripts only)")
    print(f"reference core src/ .cs LoC:      {ref_cs}  "
          "(the honest reference-core denominator)")


if __name__ == "__main__":
    main()
