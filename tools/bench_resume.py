"""Bench-scale resumability demonstration (VERDICT r3 item 7).

Runs PageRank with durable checkpointing in a CHILD process, SIGKILLs
the child mid-loop (after the manifest records at least one durable
snapshot), resumes the run in a FRESH session from the on-disk
manifest, and asserts the resumed final ranks match an uninterrupted
run to < 1e-12. Prints one RESULT JSON line with the timings.

Usage: python tools/bench_resume.py [sf_dir] [iters] [kill_iteration]
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
KILL_AT = int(sys.argv[3]) if len(sys.argv) > 3 else 3

_CHILD = r"""
import sys
sys.path.insert(0, "__REPO__")
from wedge_parallel_triangle_counting_spark.session import get_spark
from wedge_parallel_triangle_counting_spark.plans import testdata
from wedge_parallel_triangle_counting_spark.operators.pagerank import pagerank

spark = get_spark(app_name="resume-child", master="local[32]",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
e = testdata.derived_pagerank_edges(spark, sys.argv[1])
pagerank(e, num_iters=int(sys.argv[2]), checkpoint_dir=sys.argv[3],
         checkpoint_every=1).count()
print("CHILD-DONE", flush=True)
""".replace("__REPO__", REPO)


def wait_for_snapshot(manifest: str, min_iter: int, proc, timeout: float = 600.0):
    """Block until the manifest records iteration >= min_iter."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            raise RuntimeError("child finished before the kill — raise ITERS")
        try:
            with open(manifest) as f:
                it = json.load(f).get("iteration", -1)
            if it >= min_iter:
                return it
        except (FileNotFoundError, json.JSONDecodeError):
            pass
        time.sleep(0.5)
    raise TimeoutError("no snapshot appeared")


def main() -> None:
    ckpt = tempfile.mkdtemp(prefix="resume_demo_")
    manifest = os.path.join(ckpt, "pagerank.manifest.json")
    try:
        t0 = time.perf_counter()
        child = subprocess.Popen(
            [sys.executable, "-c", _CHILD, SF_DIR, str(ITERS), ckpt],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        killed_at = wait_for_snapshot(manifest, KILL_AT, child)
        child.send_signal(signal.SIGKILL)  # hard death mid-loop
        child.wait()
        kill_sec = round(time.perf_counter() - t0, 2)

        # fresh session: resume from the manifest and finish
        sys.path.insert(0, REPO)
        from pyspark.sql import functions as F

        from wedge_parallel_triangle_counting_spark.operators.pagerank import (
            pagerank,
        )
        from wedge_parallel_triangle_counting_spark.plans import testdata
        from wedge_parallel_triangle_counting_spark.session import get_spark

        spark = get_spark(
            app_name="resume-parent",
            master="local[32]",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        e = testdata.derived_pagerank_edges(spark, SF_DIR)
        t0 = time.perf_counter()
        resumed = pagerank(
            e, num_iters=ITERS, checkpoint_dir=ckpt, checkpoint_every=1, resume=True
        )
        resumed_rows = {r.v: r.pr for r in resumed.collect()}
        resume_sec = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        direct = pagerank(e, num_iters=ITERS)
        direct_rows = {r.v: r.pr for r in direct.collect()}
        direct_sec = round(time.perf_counter() - t0, 2)

        assert set(resumed_rows) == set(direct_rows)
        max_diff = max(
            abs(resumed_rows[v] - direct_rows[v]) for v in direct_rows
        )
        assert max_diff < 1e-12, max_diff
        print(
            "RESULT "
            + json.dumps(
                {
                    "sf_dir": SF_DIR,
                    "iters": ITERS,
                    "killed_after_iteration": killed_at,
                    "kill_phase_sec": kill_sec,
                    "resume_sec": resume_sec,
                    "uninterrupted_sec": direct_sec,
                    "n_vertices": len(direct_rows),
                    "max_abs_rank_diff": max_diff,
                }
            )
        )
        spark.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


if __name__ == "__main__":
    main()
