"""Root-cause experiment for the cores-dependent copy phase.

Observation to explain (BENCH/RUNS.md r4-f/r4-h/r6-a/r6-b/r5-k/r5-m):
the scaling harness's "copy" phase (closure-probe build: Arrow collect
of the oriented edges + numpy canonical-key build/sort + two ~150 MB
sparkContext.broadcast calls) reads consistently SLOWER at 8 pinned
CPUs than at 2 — r5-m measured 28.13 s at 4N running FIRST in a
pristine window vs 11.85 s at N running second, which rules out
tenant load and pins the effect on core count. The phase was assumed
"parallelism-independent driver-side work"; this probe times its
sub-phases separately at each level (interleaved, fresh JVM per run):

  collect  — df.toArrow() (a Spark job; should get FASTER with cores)
  keys     — build_edge_keys: numpy min/max/mul + 150 MB int64 sort
  hubs     — np.unique top-k + bitmap build
  bcast    — two sparkContext.broadcast() calls (driver pickling +
             block-manager chunking)

Usage: python tools/copy_phase_probe.py [rounds] [amplify]
Env: COPY_LEVELS=2,8 (default) — CPU levels to interleave.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
AMPLIFY = int(sys.argv[2]) if len(sys.argv) > 2 else 32
LEVELS = tuple(int(x) for x in os.environ.get("COPY_LEVELS", "2,8").split(","))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_WORKER = r"""
import json, os, sys, time
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; K = int(sys.argv[3])
os.sched_setaffinity(0, set(range(cpus)))
sys.path.insert(0, "__REPO__")
import numpy as np
from pyspark.sql import functions as F
from wedge_parallel_triangle_counting_spark.session import get_spark
from wedge_parallel_triangle_counting_spark.operators import graph as G
from wedge_parallel_triangle_counting_spark.operators import triangles as T
from wedge_parallel_triangle_counting_spark.functions import wedge as wk

spark = get_spark(app_name=f"copyprobe-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus * 2, 8),
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).agg(F.sum("id")).collect()

li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
base = li.select((F.col("l_orderkey") % 100003).alias("s0"),
                 (F.col("l_partkey") % 100003).alias("d0"))
amp = base.crossJoin(spark.range(K).withColumnRenamed("id", "copy")).select(
    (F.col("s0") + F.col("copy") * 200003).alias("src"),
    (F.col("d0") + F.col("copy") * 200003).alias("dst")).persist()
amp.count()
oriented, deg, n, max_id, stats = G.prepare_oriented_fast(amp)
flat = oriented.sortWithinPartitions("src", "dst").persist()
mo = flat.count()
key_base = max_id + 1

reps = []
for i in range(3):  # rep 0 = warm-up
    t0 = time.perf_counter()
    src, dst = T._collect_long_cols(flat, "src", "dst")
    t1 = time.perf_counter()
    edge_keys = wk.build_edge_keys(src, dst, key_base)
    t2 = time.perf_counter()
    hub_ids = T._numpy_top_hub_ids(src, dst, 8192)
    bitmap = wk.build_hub_bitmap(src, dst, hub_ids)
    t3 = time.perf_counter()
    hub_bc = spark.sparkContext.broadcast(bitmap)
    keys_bc = spark.sparkContext.broadcast(edge_keys)
    t4 = time.perf_counter()
    reps.append({"collect": round(t1 - t0, 2), "keys": round(t2 - t1, 2),
                 "hubs": round(t3 - t2, 2), "bcast": round(t4 - t3, 2),
                 "total": round(t4 - t0, 2)})
    keys_bc.destroy(); hub_bc.destroy()
    del src, dst, edge_keys, bitmap
print("RESULT " + json.dumps({"cpus": cpus, "m_oriented": mo, "reps": reps}))
spark.stop()
""".replace("__REPO__", REPO)


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="24g")
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, str(cpus), SF_DIR, str(AMPLIFY)],
        capture_output=True, text=True, check=True, cwd=REPO, env=env,
    ).stdout
    line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main() -> None:
    print(f"ambient loadavg {os.getloadavg()}")
    results = {c: [] for c in LEVELS}
    for r in range(ROUNDS):
        for cpus in LEVELS if r % 2 == 0 else LEVELS[::-1]:
            res = run(cpus)
            results[cpus].append(res)
            print(json.dumps(res))
    for cpus, runs in results.items():
        warm = [rep for res in runs for rep in res["reps"][1:]]
        for phase in ("collect", "keys", "hubs", "bcast", "total"):
            vals = sorted(r[phase] for r in warm)
            print(f"cpus={cpus} {phase}: best {vals[0]}s, median "
                  f"{vals[len(vals) // 2]}s")


if __name__ == "__main__":
    main()
