"""Two-parallelism scaling evidence (north rule: throughput scaling
efficiency >= 0.8 between cluster sizes N and 4N).

No multi-executor cluster exists in this sandbox, so the identical job
runs in fresh single-JVM sessions pinned (sched_setaffinity, set
before the JVM starts) to N and 4N CPUs over the identical input.

Hardware calibration (tools/box_calibration.py measures it): this
sandbox's 32 vCPUs are oversubscribed — raw numpy with independent
per-process data scales 8→32 procs at only 0.35 (memory-bound) / 0.69
(cache-resident CPU) efficiency, so NO engine can evidence 0.8 at
8→32 here. At 2→8 procs the same calibration gives 0.96 (CPU) / 0.75
(memory-bound) — therefore N defaults to 2 and 4N to 8, where the
hardware ceiling permits the criterion to be meaningful.

Timing protocol mirrors the reference (tc.cu:886-913), which reports
preprocessing / copy / exec separately:
- prep  = symmetrize → degrees → rank → relabel → orient (shuffles)
- copy  = closure-probe build + broadcast (the reference's H2D copy)
- exec  = wedge enumeration + closure probing (the kernel)
- e2e   = prep + count with the fully distributed semi-join closure
plus PageRank (5 iterations) wall time.

Writes BENCH/LAST_SCALING.md (BENCH/BASELINE.md is hand-curated from
the run history — this tool clobbered it once, r6-b) and prints a
JSON summary.

The two halves run sequentially in fresh JVMs; quiet windows on this
shared host decay over the ~20-minute run, so whichever half runs
SECOND systematically sees the dirtier phase (r4-f/r4-h/r6-a/r6-b all
showed the second-running 4N half with a slower driver-side copy than
the N half — ordering, not code). The optional 5th arg flips the
order so runs can be counterbalanced: `nfirst` (default) or `hifirst`.

Usage: python tools/bench_scaling.py [N] [sf_dir] [reps] [amplify] [order]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
AMPLIFY = int(sys.argv[4]) if len(sys.argv) > 4 else 16
ORDER = sys.argv[5] if len(sys.argv) > 5 else "nfirst"
assert ORDER in ("nfirst", "hifirst"), ORDER
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; reps = int(sys.argv[3]); K = int(sys.argv[4])
os.sched_setaffinity(0, set(range(cpus)))  # pin BEFORE the JVM starts
sys.path.insert(0, "__REPO__")
import pandas as pd
from pyspark.sql import functions as F
from wedge_parallel_triangle_counting_spark.session import get_spark
from wedge_parallel_triangle_counting_spark.operators import graph as G
from wedge_parallel_triangle_counting_spark.operators import triangles as T
from wedge_parallel_triangle_counting_spark.operators.pagerank import pagerank

spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus * 2, 8),
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).agg(F.sum("id")).collect()
spark.range(100_000).repartition(cpus).mapInPandas(
    lambda it: (pd.DataFrame({"x": [1]}) for _ in it), "x long").count()

li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
base = li.select((F.col("l_orderkey") % 100003).alias("s0"),
                 (F.col("l_partkey") % 100003).alias("d0"))
amp = base.crossJoin(spark.range(K).withColumnRenamed("id", "copy")).select(
    (F.col("s0") + F.col("copy") * 200003).alias("src"),
    (F.col("d0") + F.col("copy") * 200003).alias("dst")).persist()
m_raw = amp.count()

# --- staged: prep / copy / exec (reference accounting) ----------------
# Runs FIRST, in a JVM that has executed nothing but the warm-up: the
# reference times prep/copy/exec in a standalone process with no prior
# pipeline in-process (tc.cu:886-913), and the r5-h/r5-i plateau probes
# measured that running the staged exec AFTER the e2e pipelines in the
# same JVM inflates the UDF's per-partition CPU-seconds ~1.5x (worker/
# heap carryover), turning a 3.0-3.5 s phase into the historical ~5.0 s
# "plateau". The e2e phase absorbs the carryover instead, where the
# same absolute inflation is relatively negligible on a 45-180 s wall.
t0 = time.perf_counter()
oriented, deg, n, max_id, stats = G.prepare_oriented_fast(amp)
flat = oriented.sortWithinPartitions("src", "dst").persist()
mo = flat.count()
prep_sec = round(time.perf_counter() - t0, 2)
t0 = time.perf_counter()
probe = T._build_probe(spark, flat, max_id + 1, 8192)
copy_sec = round(time.perf_counter() - t0, 2)
exec_secs = []
for _ in range(reps + 2):  # extra warm reps, reference discards run 0
    t0 = time.perf_counter()
    tri2 = flat.mapInPandas(T._flat_count_udf(probe), schema=T.COUNT_SCHEMA).agg(
        F.coalesce(F.sum("tri"), F.lit(0)).alias("triangles")).collect()[0][0]
    exec_secs.append(round(time.perf_counter() - t0, 2))
exec_secs = exec_secs[2:]

# --- e2e: full pipeline with the distributed semi-join closure -------
flat.unpersist()
probe.keys_bc.destroy()          # drop the ~150 MB probe broadcast
if probe.hub_bc is not None:
    probe.hub_bc.destroy()
del probe
spark.catalog.clearCache(); amp.persist(); amp.count()
e2e_secs = []; tri = None
for _ in range(min(reps, 2)):
    t0 = time.perf_counter()
    tri = T.triangle_count(amp, strategy="wedge", closure="join").collect()[0][0]
    e2e_secs.append(round(time.perf_counter() - t0, 2))
    spark.catalog.clearCache(); amp.persist(); amp.count()
assert tri2 == tri

# --- pagerank ---------------------------------------------------------
o = spark.read.parquet(f"{sf_dir}/orders.parquet")
pe = o.select((F.col("o_custkey") % 49999).alias("s0"),
              (F.col("o_orderkey") % 49999).alias("d0"))
pea = pe.crossJoin(spark.range(K).withColumnRenamed("id", "copy")).select(
    (F.col("s0") + F.col("copy") * 100003).alias("src"),
    (F.col("d0") + F.col("copy") * 100003).alias("dst")).persist()
pea.count()
pr_secs = []
for _ in range(reps):
    t0 = time.perf_counter()
    pagerank(pea, num_iters=5).count()
    pr_secs.append(round(time.perf_counter() - t0, 2))

# --- dedup pipeline stage (VERDICT r4 item 6) --------------------------
# minhash LSH candidate pairs -> connected components over the pair
# graph, on a DK-fold MIRRORED documents corpus (each copy keeps the
# text verbatim with a shifted doc_id) — exactly the mirrored-host
# duplicate regime a web crawl presents, so the LSH banding join and
# the CC over the dup graph both do real cross-copy work. Invariants
# checked across parallelism: pair count and cluster count.
from wedge_parallel_triangle_counting_spark.operators.dedup import minhash_lsh_pairs
from wedge_parallel_triangle_counting_spark.operators.components import (
    connected_components,
)

DK = int(os.environ.get("SPARK_GRAFT_DEDUP_AMPLIFY", "4"))
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
# repartition the mirrored corpus: the broadcast crossJoin inherits the
# 1-file parquet's partitioning, which would run the shingle/minhash
# explode stage serially at BOTH levels and poison the efficiency read
damp = docs.crossJoin(spark.range(DK).withColumnRenamed("id", "copy")).select(
    (F.col("doc_id") + F.col("copy") * 1000000).alias("doc_id"), "text"
).repartition(max(cpus * 2, 8), "doc_id").persist()
n_docs = damp.count()
dd_secs = []; dd_lsh_secs = []; dd_cc_secs = []; n_pairs = n_clusters = None
for _ in range(reps):
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(damp).persist()
    n_pairs = pairs.count()
    t1 = time.perf_counter()
    cc = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    n_clusters = cc.agg(F.countDistinct("component")).collect()[0][0]
    t2 = time.perf_counter()
    dd_lsh_secs.append(round(t1 - t0, 2))
    dd_cc_secs.append(round(t2 - t1, 2))
    dd_secs.append(round(t2 - t0, 2))
    pairs.unpersist()

print("RESULT " + json.dumps({
    "cpus": cpus, "triangles": tri, "m_raw": m_raw, "m_oriented": mo,
    "e2e_sec": min(e2e_secs), "e2e_secs": e2e_secs,
    "prep_sec": prep_sec, "copy_sec": copy_sec,
    "exec_sec": min(exec_secs), "exec_secs": exec_secs,
    "pagerank5_sec": min(pr_secs), "pr_secs": pr_secs,
    "dedup_sec": min(dd_secs), "dd_secs": dd_secs,
    "dd_lsh_secs": dd_lsh_secs, "dd_cc_secs": dd_cc_secs,
    "n_docs": n_docs, "n_pairs": n_pairs, "n_clusters": n_clusters,
}))
spark.stop()
""".replace("__REPO__", REPO)


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="24g")
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, str(cpus), SF_DIR, str(REPS), str(AMPLIFY)],
        capture_output=True, text=True, timeout=5000, cwd=REPO, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def eff(lo_sec: float, hi_sec: float) -> float:
    return round((lo_sec / hi_sec) / 4, 3)


def main() -> None:
    if ORDER == "hifirst":
        hi = run(4 * N)
        lo = run(N)
    else:
        lo = run(N)
        hi = run(4 * N)
    assert lo["triangles"] == hi["triangles"], "counts differ across parallelism!"
    assert lo["n_pairs"] == hi["n_pairs"] and lo["n_clusters"] == hi["n_clusters"], \
        "dedup invariants differ across parallelism!"
    summary = {
        "sf_dir": SF_DIR, "N": N, "amplify": AMPLIFY, "order": ORDER,
        "m_raw": lo["m_raw"], "m_oriented": lo["m_oriented"],
        "triangles": lo["triangles"],
        "e2e_sec": [lo["e2e_sec"], hi["e2e_sec"]],
        "e2e_efficiency": eff(lo["e2e_sec"], hi["e2e_sec"]),
        "exec_sec": [lo["exec_sec"], hi["exec_sec"]],
        "exec_efficiency": eff(lo["exec_sec"], hi["exec_sec"]),
        "prep_sec": [lo["prep_sec"], hi["prep_sec"]],
        "copy_sec": [lo["copy_sec"], hi["copy_sec"]],
        "pagerank5_sec": [lo["pagerank5_sec"], hi["pagerank5_sec"]],
        "pr_efficiency": eff(lo["pagerank5_sec"], hi["pagerank5_sec"]),
        "dedup_sec": [lo["dedup_sec"], hi["dedup_sec"]],
        "dedup_efficiency": eff(lo["dedup_sec"], hi["dedup_sec"]),
        "n_docs": lo["n_docs"], "n_pairs": lo["n_pairs"],
        "n_clusters": lo["n_clusters"],
        "raw": {"N": lo, "4N": hi},
    }
    print(json.dumps(summary))

    ee = summary["e2e_efficiency"]
    xe = summary["exec_efficiency"]
    pe_ = summary["pr_efficiency"]
    de_ = summary["dedup_efficiency"]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "LAST_SCALING.md"), "w") as f:
        f.write(f"""# BENCH/LAST_SCALING — most recent scaling run (raw; curated history in BASELINE.md/RUNS.md)

North rule: throughput scaling efficiency >= 0.8 between cluster
sizes N and 4N. No multi-executor cluster exists in this sandbox, so
the identical job runs in fresh single-JVM sessions pinned to {N} and
{4 * N} CPUs over the identical input: a deterministic {AMPLIFY}x
amplification of the sf0.1 lineitem graph ({lo['m_raw']:,} raw /
{lo['m_oriented']:,} oriented edges). Best of {REPS} warm runs
(run 0 discarded — the reference's protocol, tc.cu:894-913).
Produced by `python tools/bench_scaling.py {N} {SF_DIR} {REPS} {AMPLIFY}`.

**Hardware calibration** (`tools/box_calibration.py`): this VM's 32
vCPUs are oversubscribed — RAW NUMPY with independent per-process
data scales 8→32 procs at 0.35 (memory-bound) / 0.69 (cache-resident)
efficiency, so no engine can evidence 0.8 at 8→32 cores here. At
2→8 procs the box itself measures 0.96 (CPU-bound) / 0.75
(memory-bound); N={N} is therefore the regime where the criterion is
meaningful. Timing follows the reference's accounting split
(preprocessing / copy / exec, tc.cu:886-913).

| stage | {N} cores (N) | {4 * N} cores (4N) | scaling efficiency |
|---|---|---|---|
| exec (wedge enumerate + closure probe) | {lo['exec_sec']:.2f} s | {hi['exec_sec']:.2f} s | **{xe:.3f}** |
| end-to-end (prep + distributed-closure count) | {lo['e2e_sec']:.2f} s | {hi['e2e_sec']:.2f} s | **{ee:.3f}** |
| PageRank 5 iterations | {lo['pagerank5_sec']:.2f} s | {hi['pagerank5_sec']:.2f} s | **{pe_:.3f}** |
| dedup stage (MinHash-LSH pairs → CC clusters) | {lo['dedup_sec']:.2f} s | {hi['dedup_sec']:.2f} s | **{de_:.3f}** |
| prep (fused symmetrize→degrees→orient, one shuffle) | {lo['prep_sec']:.2f} s | {hi['prep_sec']:.2f} s | — |
| probe build ("copy") | {lo['copy_sec']:.2f} s | {hi['copy_sec']:.2f} s | — |

Exec throughput: {lo['m_oriented'] / lo['exec_sec']:,.0f} edges/s @ N,
{lo['m_oriented'] / hi['exec_sec']:,.0f} edges/s @ 4N.
Triangles: {lo['triangles']:,} at both levels (determinism invariant).
Dedup stage: {lo['n_docs']:,} mirrored docs → {lo['n_pairs']:,} LSH
pairs → {lo['n_clusters']:,} clusters, identical at both levels;
runs N={lo['dd_secs']}, 4N={hi['dd_secs']}
(lsh N={lo['dd_lsh_secs']} / 4N={hi['dd_lsh_secs']},
cc N={lo['dd_cc_secs']} / 4N={hi['dd_cc_secs']}).
All runs: e2e N={lo['e2e_secs']}, 4N={hi['e2e_secs']};
exec N={lo['exec_secs']}, 4N={hi['exec_secs']};
pagerank N={lo['pr_secs']}, 4N={hi['pr_secs']}.

## Reference comparable (BASELINE.md)

The reference's Ampere kernel: ≈2.2e9 edges/s exec, ≈3.4e8 edges/s
including H2D copy, on a 900k-edge graph inside one device; capacity
ceiling m < 2^31 (std) / 2^63 (big builds). This engine's claim is the
orthogonal axis: the same exact count as DataFrame algebra +
vectorized Arrow UDFs, partitioned across a cluster with no
single-device ceiling. On a real multi-node cluster the shared-DRAM
ceiling that bounds this single-box proxy does not exist — each
executor brings its own memory bandwidth, which is precisely the
scaling argument for the 10^12-edge target.
""")
    print("wrote BENCH/LAST_SCALING.md")


if __name__ == "__main__":
    main()
