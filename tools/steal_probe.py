"""Reproducible co-tenant interference probe (BASELINE.md methodology).

Samples /proc/stat over a window and reports the host-wide CPU time
split — busy / idle / iowait / steal — as percentages.  Steal is time a
vCPU was runnable but the hypervisor ran someone else: it only ever
SLOWS a run, which is why bench.py's scaling mode medians several
fresh-process runs per CPU level and run_headline reports min-of-N.

Usage:  python tools/steal_probe.py [seconds]   (default 30; run it
concurrently with a bench to see the interference during that window).
"""

from __future__ import annotations

import sys
import time


def read_cpu() -> tuple[int, int, int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    user, nice, system, idle, iowait, irq, softirq, steal = (vals + [0] * 8)[:8]
    return user + nice + system + irq + softirq, idle, iowait, steal


def main() -> None:
    window = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    b = read_cpu()
    time.sleep(window)
    a = read_cpu()
    busy, idle, iowait, steal = (x - y for x, y in zip(a, b))
    total = busy + idle + iowait + steal
    print(f"window={window:.0f}s total_jiffies={total}")
    for name, v in (("busy", busy), ("idle", idle),
                    ("iowait", iowait), ("steal", steal)):
        print(f"{name:7s} {100 * v / total:6.2f}%")


if __name__ == "__main__":
    main()
