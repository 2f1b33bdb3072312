"""Root-cause experiment for the 4N exec plateau (BENCH/RUNS.md r6-b).

Observation to explain: at 32x amplify the harness's staged exec
phase reads ~11 s at N=2 CPUs and plateaus ~5.0 s tight at 4N=8 CPUs
(r3-a/r6-a/r6-b/r7-b windows), i.e. 2->8 efficiency ~0.55 — while
r2-c once recorded 2.69 s. The r6-b note flagged a possible
"cores-dependent driver/JVM effect in the probe-build + enumerate
lane". This experiment separates the two candidate explanations:

- DRAM-contention hypothesis: the closure probe's binary searches are
  random reads into a ~150 MB sorted key array; 32 concurrent workers
  saturate the box's memory bandwidth, INFLATING each partition's
  probe CPU-seconds. Signature: sum(probe_sec) across partitions grows
  with the CPU count while sum(enum_sec) stays ~flat.
- driver/JVM-overhead hypothesis: per-task or scheduler costs grow
  with partition count. Signature: per-phase CPU-seconds stay flat at
  both levels, but wall time stops tracking cpu_sec/cpus.

Method: alternating (interleaved A/B) fresh-JVM runs pinned to 8 and
32 CPUs on the identical 32x amplified graph; each run reports rep
wall times plus the UDF's own per-partition enum/probe CPU-second
sums (COUNT_SCHEMA carries them). No code change is decided from a
non-interleaved reading (BENCH/RUNS.md methodology rule).

Usage: python tools/plateau_probe.py [rounds] [amplify]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
AMPLIFY = int(sys.argv[2]) if len(sys.argv) > 2 else 32
# CPU levels to compare; default 8,32 probes the box's upper tier, the
# graded harness pair is PLATEAU_LEVELS=2,8 (bench_scaling.py N / 4N)
LEVELS = tuple(
    int(x) for x in os.environ.get("PLATEAU_LEVELS", "8,32").split(",")
)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_WORKER = r"""
import json, os, sys, time
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; K = int(sys.argv[3])
os.sched_setaffinity(0, set(range(cpus)))
sys.path.insert(0, "__REPO__")
from pyspark.sql import functions as F
from wedge_parallel_triangle_counting_spark.session import get_spark
from wedge_parallel_triangle_counting_spark.operators import graph as G
from wedge_parallel_triangle_counting_spark.operators import triangles as T

spark = get_spark(app_name=f"plateau-{cpus}", master=f"local[{cpus}]",
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
if os.environ.get("PLATEAU_WITH_E2E"):
    # replicate the scaling harness's in-JVM phase order: the staged
    # exec runs AFTER two full e2e semi-join pipelines have churned
    # the heap/shuffle state (bench_scaling.py runs e2e first)
    for _ in range(2):
        T.triangle_count(amp, strategy="wedge", closure="join").collect()
        spark.catalog.clearCache(); amp.persist(); amp.count()
oriented, deg, n, max_id, stats = G.prepare_oriented_fast(amp)
flat = oriented.sortWithinPartitions("src", "dst").persist()
mo = flat.count()
probe = T._build_probe(spark, flat, max_id + 1, 8192)

reps = []
for i in range(4):  # rep 0 = warm-up (worker fork + broadcast load)
    t0 = time.perf_counter()
    row = flat.mapInPandas(T._flat_count_udf(probe), schema=T.COUNT_SCHEMA).agg(
        F.coalesce(F.sum("tri"), F.lit(0)).alias("tri"),
        F.sum("enum_sec").alias("enum_cpu"),
        F.sum("probe_sec").alias("probe_cpu")).collect()[0]
    reps.append({"wall": round(time.perf_counter() - t0, 2),
                 "tri": row["tri"],
                 "enum_cpu": round(row["enum_cpu"], 2),
                 "probe_cpu": round(row["probe_cpu"], 2)})
print("RESULT " + json.dumps({"cpus": cpus, "m_oriented": mo, "reps": reps}))
spark.stop()
""".replace("__REPO__", REPO)


def run(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, str(cpus), SF_DIR, str(AMPLIFY)],
        capture_output=True, text=True, check=True, cwd=REPO,
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
        wall = min(r["wall"] for r in warm)
        enum_cpu = sorted(r["enum_cpu"] for r in warm)[len(warm) // 2]
        probe_cpu = sorted(r["probe_cpu"] for r in warm)[len(warm) // 2]
        print(f"cpus={cpus}: best wall {wall}s, median enum_cpu "
              f"{enum_cpu}s, median probe_cpu {probe_cpu}s")


if __name__ == "__main__":
    main()
