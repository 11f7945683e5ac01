"""Measure this box's parallel-scaling ceiling (BENCH/BASELINE.md).

Runs P identical fixed-work CPU-bound processes (pure-Python md5 loop,
no shared state, no IO) for P in 1/2/8/32 and reports the per-task
wall.  On ideal hardware the per-task wall is constant in P; on this
shared VM it grows (one memory bus, shared LLC, neighbor load), so ANY
job measured at N → 4N cores here is capped at

    ceiling(N → 4N) = t_N / t_4N            (≤ 1)

— the efficiency a PERFECTLY scaling engine would show.  The dump /
pipeline efficiencies in BASELINE.md are normalized by this ceiling to
estimate what a real 4× executor cluster (which does not pay this
divisor) would see.

Usage: python tools/box_ceiling.py [reps=3]  → BENCH/box_ceiling.json
"""

from __future__ import annotations

import hashlib
import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_TASK = r'''
import hashlib, time, sys
t0 = time.perf_counter()
h = b"x" * 4096
for _ in range(60_000):
    h = hashlib.md5(h).digest() + h[:4080]
print(time.perf_counter() - t0)
'''

# memory-bandwidth-bound task: streams a 192 MB array repeatedly — the
# regime of a scan→mint→sink dump (bytes in, bytes out, little cache
# reuse).  P of these saturate the one memory bus well before P of the
# cache-resident md5 task do, so this ceiling is the fair divisor for
# bandwidth-bound jobs.
_TASK_BW = r'''
import numpy as np, time
a = np.arange(24_000_000, dtype=np.int64)  # 192 MB, >> LLC
s = 0
t0 = time.perf_counter()
for _ in range(6):
    s += int(a.sum())
print(time.perf_counter() - t0)
'''


def run_level(p: int, task: str) -> float:
    """Mean per-task wall with p concurrent identical processes."""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", task], stdout=subprocess.PIPE, text=True
        )
        for _ in range(p)
    ]
    walls = [float(pr.communicate()[0].strip()) for pr in procs]
    return sum(walls) / len(walls)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    levels = [1, 2, 8, 32]
    out = {}
    for kind, task in (("cpu", _TASK), ("bandwidth", _TASK_BW)):
        t = {}
        for p in levels:
            t[p] = round(statistics.median([run_level(p, task) for _ in range(reps)]), 3)
            time.sleep(1)
        out[kind] = {
            "per_task_wall": t,
            "ceiling_2_to_8": round(t[2] / t[8], 3),
            "ceiling_8_to_32": round(t[8] / t[32], 3),
            "slowdown_vs_1": {p: round(t[p] / t[1], 3) for p in levels},
        }
    (REPO / "BENCH" / "box_ceiling.json").write_text(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
