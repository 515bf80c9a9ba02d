"""Shared benchmark-harness plumbing for the scripts/ benches.

One definition of hypervisor-steal sampling (this host has measured
noisy-neighbor windows — steal spiking to >20% of all CPUs for minutes,
see BENCH.md — and a timed run inside such a window measures the
neighbor, not the engine), so a fix to the sampling applies everywhere.
"""

from __future__ import annotations


def steal_sample() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat.

    On an unreadable /proc/stat returns (0, 1): the window then reports
    steal share 0.0 — i.e. "no evidence of contention", which callers
    must read as *unknown*, not *proven clean* (the benches print the
    share; a bench that must HARD-gate should check readability once at
    startup).
    """
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:
        return 0, 1
