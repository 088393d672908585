"""No-Ray host scaling probe: how does PURE CPU work scale on this box?

Runs k worker processes, each performing an identical fixed amount of
numpy/hashing compute (no shared data, no IPC, no Ray).  If the host had k
idle physical cores, per-process wall time would be flat in k; the
measured inflation is the ceiling ANY k-worker workload on this machine
inherits — context for the bench.py --scaling efficiency numbers
(BASELINE.md): the dedup pipeline cannot scale better than the box.

Usage: python tools/host_scaling_probe.py [counts…]  (default 1 2 4 8 16 32)
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def work(_: int) -> float:
    """Fixed compute: seeded splitmix + sort over ~32 MB, several rounds."""
    t0 = time.perf_counter()
    x = np.arange(4_000_000, dtype=np.uint64)
    for r in range(12):
        with np.errstate(over="ignore"):
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9 + r)
            x ^= x >> np.uint64(27)
        if r % 4 == 0:
            x = np.sort(x)
    float(x[0])  # keep it alive
    return time.perf_counter() - t0


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    results = {}
    base = None
    for k in counts:
        with mp.get_context("spawn").Pool(k) as pool:
            walls = pool.map(work, range(k))
        mean = sum(walls) / len(walls)
        if base is None:
            base = mean
        results[str(k)] = {
            "mean_task_sec": round(mean, 3),
            "slowdown_vs_1": round(mean / base, 3),
            "aggregate_throughput_x": round(k * base / mean, 2),
        }
        time.sleep(2)
    print(json.dumps({"probe": "host-cpu-scaling", "levels": results}))


if __name__ == "__main__":
    main()
