"""Module-parallel test runner: the full suite under the round budget.

pytest-xdist is not available in this environment, so this shards the
suite BY MODULE across N concurrent pytest subprocesses, each with its
own Spark session (the conftest fixture is session-scoped per process,
so modules never share JVM state — the same isolation xdist's --dist
loadfile would give). Longest-first scheduling keeps the stragglers off
the critical path.

Usage:  python tools/partest.py [workers]     (default 5)
Exit code 0 iff every module passed. Per-module tail lines are echoed
so a failure is attributable without re-running.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Measured ~per-module cost tiers (BENCH/RUNS.md r5 suite profile);
# longest first so the slowest module starts immediately.
HEAVY_FIRST = [
    "test_similarity_multimodal_streaming.py",
    "test_iterative.py",
    "test_dedup_textstats.py",
    "test_triangles.py",
    "test_webrank.py",
    "test_pipeline_ops.py",
]


def main() -> int:
    workers = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    mods = sorted(
        os.path.basename(p) for p in glob.glob(f"{REPO}/tests/test_*.py")
    )
    order = [m for m in HEAVY_FIRST if m in mods] + [
        m for m in mods if m not in HEAVY_FIRST
    ]
    queue = list(order)
    results: dict[str, tuple[int, float, str]] = {}
    lock = threading.Lock()

    def run_one() -> None:
        while True:
            with lock:
                if not queue:
                    return
                mod = queue.pop(0)
            t0 = time.perf_counter()
            p = subprocess.run(
                [sys.executable, "-m", "pytest", f"tests/{mod}", "-q",
                 "--no-header", "-p", "no:cacheprovider"],
                cwd=REPO,
                capture_output=True,
                text=True,
                env={**os.environ, "PYTHONDONTWRITEBYTECODE": "1"},
            )
            dt = time.perf_counter() - t0
            tail = (p.stdout or "").strip().splitlines()
            summary = tail[-1] if tail else (p.stderr or "")[-200:]
            with lock:
                results[mod] = (p.returncode, dt, summary)
                print(f"{'OK ' if p.returncode == 0 else 'FAIL'} "
                      f"{mod:<45s} {dt:7.1f}s  {summary}", flush=True)
                if p.returncode != 0:
                    print(p.stdout[-3000:], flush=True)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=run_one) for _ in range(workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total = time.perf_counter() - t0
    bad = [m for m, (rc, _, _) in results.items() if rc != 0]
    print(f"\n{len(results)} modules, {len(bad)} failed, "
          f"wall {total:.1f}s (workers={workers})")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
