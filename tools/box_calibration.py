"""Hardware scaling calibration — NO Spark involved.

Measures how raw numpy throughput scales with process count on this
box, pinned one process per CPU, fully independent data (zero shared
state). This bounds what ANY engine can evidence for the N→4N scaling
criterion here: if the box itself doesn't scale 8→32, the engine can't
either.

Two workloads:
- memory-bound: searchsorted over a 160 MB key array (the closure
  probe's access pattern);
- cache-resident CPU-bound: repeated transcendental math on an
  L2-sized array.

Usage: python tools/box_calibration.py
"""

from __future__ import annotations

import os
import time

import numpy as np
from multiprocessing import Pool


def mem_work(args):
    cpu, n_probes = args
    try:
        os.sched_setaffinity(0, {cpu})
    except OSError:
        pass
    rng = np.random.default_rng(cpu)
    keys = np.sort(rng.integers(0, 2**50, 20_000_000))
    probes = rng.integers(0, 2**50, n_probes)
    t0 = time.perf_counter()
    for _ in range(3):
        pos = np.searchsorted(keys, probes)
        (keys[np.clip(pos, 0, len(keys) - 1)] == probes).sum()
    return time.perf_counter() - t0


def cpu_work(cpu):
    try:
        os.sched_setaffinity(0, {cpu})
    except OSError:
        pass
    rng = np.random.default_rng(cpu)
    a = rng.random(100_000)
    t0 = time.perf_counter()
    for _ in range(600):
        float(np.sin(a).sum())
    return time.perf_counter() - t0


def main() -> None:
    for label, pairs in (("2->8", (2, 8)), ("8->32", (8, 32))):
        res = {}
        for nproc in pairs:
            with Pool(nproc) as p:
                t0 = time.perf_counter()
                p.map(mem_work, [(i, 4_000_000) for i in range(nproc)])
                mem_wall = time.perf_counter() - t0
            with Pool(nproc) as p:
                t0 = time.perf_counter()
                p.map(cpu_work, list(range(nproc)))
                cpu_wall = time.perf_counter() - t0
            res[nproc] = (nproc / mem_wall, nproc / cpu_wall)
        lo, hi = pairs
        print(
            f"{label}: mem-bound eff={res[hi][0] / res[lo][0] / 4:.2f} "
            f"cpu-bound eff={res[hi][1] / res[lo][1] / 4:.2f}"
        )


if __name__ == "__main__":
    main()
