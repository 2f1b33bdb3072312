"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...}.

Methodology mirrors the reference's timing protocol (tc.cu:894-913):
a warm-up action runs first and is discarded; each query is then timed
end-to-end (plan construction + execution to a driver-side result).

The triangle bench uses a sparser sf-scaled graph than the correctness
queries (modulus 100003 instead of 601) so the workload is
shuffle/probe-bound rather than a dense toy; edges/sec is reported
against the oriented edge count, the same normalization the reference
README uses.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from wedge_parallel_triangle_counting_spark.operators.components import (  # noqa: E402
    connected_components,
)
from wedge_parallel_triangle_counting_spark.operators.labelprop import (  # noqa: E402
    label_propagation,
)
from wedge_parallel_triangle_counting_spark.operators.pagerank import pagerank  # noqa: E402
from wedge_parallel_triangle_counting_spark.operators.triangles import (  # noqa: E402
    triangle_count,
)
from wedge_parallel_triangle_counting_spark.plans.docpages import doc_pages  # noqa: E402
from wedge_parallel_triangle_counting_spark.plans.ingest import pages_to_edges  # noqa: E402
from wedge_parallel_triangle_counting_spark.session import get_spark  # noqa: E402

BENCH_MODULUS = 100003


def bench_edges(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        (F.col("l_orderkey") % BENCH_MODULUS).alias("src"),
        (F.col("l_partkey") % BENCH_MODULUS).alias("dst"),
    )


def pr_edges(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return o.select(
        (F.col("o_custkey") % 49999).alias("src"),
        (F.col("o_orderkey") % 49999).alias("dst"),
    )


def wait_for_quiet_window(
    max_wait_sec: float, load_bar: float = 1.5, poll_sec: float = 15.0
) -> float:
    """Bounded wait for a quiet host window before timing anything.

    The box is shared and phases between quiet and 2x-degraded windows
    (BENCH/RUNS.md r4: a loadavg-4 start recorded phantom regressions
    the same-day quiet preflights refuted). Waiting a bounded amount
    for 1-min loadavg < `load_bar` makes the recorded artifact measure
    the ENGINE, not the window. Returns seconds actually waited; gives
    up (and proceeds) after `max_wait_sec` so the harness can never
    hang the driver."""
    waited = 0.0
    while waited < max_wait_sec:
        one, five, _ = os.getloadavg()
        # Gate on BOTH averages: a 1-min reading can decay to ~0 inside
        # the 5-min tail of a prior 32-thread burst, and runs launched
        # in that tail still record 1.5-2x degraded per-query times
        # (BENCH/RUNS.md r5 preflights: 1-min 0.46 / 5-min 3.14 start
        # gave wedge 4.54s vs the 2.6-3.0s quiet plateau).
        if one < load_bar and five < 2.0 * load_bar:
            break
        time.sleep(poll_sec)
        waited += poll_sec
    return waited


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    quiet_wait = wait_for_quiet_window(
        float(os.environ.get("SPARK_GRAFT_QUIET_WAIT_SEC", "600"))
    )
    # Ambient host load, sampled BEFORE the Spark session exists: this
    # is the number that says whether the run landed in a quiet window.
    # (Sampling after warm-up would measure our own 32-thread warm-up
    # burst — r4's artifact did exactly that and read 4-6 on an
    # otherwise idle box.)
    ambient_loadavg = round(os.getloadavg()[0], 2)
    ambient_loadavg_5m = round(os.getloadavg()[1], 2)
    spark = get_spark(app_name="wetric-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (discarded, reference discards run 0): JVM, parquet scan,
    # and the Python UDF workers
    import pandas as pd

    spark.range(1_000_000).agg(F.sum("id")).collect()
    bench_edges(spark, sf_dir).count()
    spark.range(100_000).repartition(32).mapInPandas(
        lambda it: (pd.DataFrame({"x": [1]}) for _ in it), "x long"
    ).count()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}
    # host context: the box is shared and phases between quiet and
    # 2x-degraded windows (BENCH/RUNS.md) — record the load so a
    # reader can judge the window this run landed in
    extra["loadavg_start"] = ambient_loadavg
    extra["loadavg_start_5min"] = ambient_loadavg_5m
    extra["quiet_wait_sec"] = round(quiet_wait, 1)
    # post-warm-up load is dominated by our own JVM burst; recorded
    # separately so it can't be mistaken for ambient contention
    extra["loadavg_after_warmup"] = round(os.getloadavg()[0], 2)

    def timed(name, fn, repeats=3):
        # best-of-k INCLUDING the first run (the suite-level warm-up
        # above — range agg, edge scan, mapInPandas — is the discarded
        # "run 0" of the reference protocol, tc.cu:894-913): this
        # box's vCPUs are oversubscribed and host load injects
        # multi-second noise into single runs (±2x across windows,
        # BENCH/RUNS.md), so min-of-3 it is
        best = None
        out = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # drop persisted frames the query pipeline cached so
            # queries don't contend for executor memory
            spark.catalog.clearCache()
        timings[name] = round(best, 4)
        return out

    e = bench_edges(spark, sf_dir)
    phases: dict[str, float] = {}

    def run_wedge():
        phases.clear()  # phases reflect the last repeat
        return triangle_count(e, strategy="wedge", phase_metrics=phases).collect()[0][0]

    tri = timed("triangles_wedge", run_wedge)
    extra["triangles"] = tri
    # per-query phase split (reference accounting, tc.cu:886-913 and
    # tc_cycles' get/evaluate split, experiments/tc_cycles.cu:1089-1137):
    # prep = plan+gate, build = shuffle+probe copy, exec = count wall;
    # enumerate/probe are CPU seconds summed across tasks
    extra["wedge_phases"] = phases
    timed("triangles_edge", lambda: triangle_count(e, strategy="edge").collect()[0][0])
    arrow_phases: dict[str, float] = {}

    def run_arrow():
        arrow_phases.clear()
        return triangle_count(e, strategy="arrow", phase_metrics=arrow_phases).collect()[
            0
        ][0]

    timed("triangles_arrow", run_arrow)
    extra["arrow_phases"] = arrow_phases

    from wedge_parallel_triangle_counting_spark.operators.graph import (
        degrees,
        normalize_edges,
        orient_by_degree,
        symmetrize,
    )

    sym = symmetrize(normalize_edges(e))
    m_oriented = orient_by_degree(sym, degrees(sym)).count()
    extra["m_oriented"] = m_oriented
    extra["tri_edges_per_sec"] = round(m_oriented / timings["triangles_wedge"], 1)

    pe = pr_edges(spark, sf_dir)
    timed("pagerank_5it", lambda: pagerank(pe, num_iters=5).count())
    # default "auto" picks by canonical edge count (hashmin at this
    # scale — fewer shuffles/round; star's doubly-log rounds only pay
    # off on big high-diameter graphs); star kept as an explicit lane
    cc_metrics: dict = {}
    timed(
        "components",
        lambda: connected_components(pe, metrics=cc_metrics).count(),
    )
    extra["components_strategy"] = cc_metrics.get("strategy")
    timed(
        "components_star",
        lambda: connected_components(pe, strategy="star").count(),
    )
    timed("labelprop_3it", lambda: label_propagation(pe, num_iters=3).count())
    timed("ingest_edges", lambda: pages_to_edges(doc_pages(spark, sf_dir))[0].count())

    # round-4 operators, tracked OUTSIDE the headline total so the
    # cross-round total stays comparable (r1-r3 benched 8 queries)
    from wedge_parallel_triangle_counting_spark.operators.hits import hits

    t0 = time.perf_counter()
    hits(pe, num_iters=5).count()
    extra["hits_5it_sec"] = round(time.perf_counter() - t0, 4)
    spark.catalog.clearCache()

    from wedge_parallel_triangle_counting_spark.operators.eigencentrality import (
        eigenvector_centrality,
    )

    t0 = time.perf_counter()
    eigenvector_centrality(pe, num_iters=5).count()
    extra["eigen_5it_sec"] = round(time.perf_counter() - t0, 4)
    spark.catalog.clearCache()

    from wedge_parallel_triangle_counting_spark.operators.scc import (
        strongly_connected_components,
    )
    from wedge_parallel_triangle_counting_spark.plans import testdata

    t0 = time.perf_counter()
    strongly_connected_components(
        testdata.derived_directed_sparse_edges(spark, sf_dir)
    ).count()
    extra["scc_sec"] = round(time.perf_counter() - t0, 4)
    spark.catalog.clearCache()

    # round-5 operators, same out-of-headline convention
    from wedge_parallel_triangle_counting_spark.operators.anf import (
        neighborhood_function,
    )

    t0 = time.perf_counter()
    neighborhood_function(pe, k=32, max_hops=4).count()
    extra["anf_4hop_sec"] = round(time.perf_counter() - t0, 4)
    spark.catalog.clearCache()

    from wedge_parallel_triangle_counting_spark.operators.coreness import (
        core_numbers,
    )

    t0 = time.perf_counter()
    core_numbers(pe).count()
    extra["coreness_sec"] = round(time.perf_counter() - t0, 4)
    spark.catalog.clearCache()

    # round-6 operators, same out-of-headline convention
    from wedge_parallel_triangle_counting_spark.operators.community import (
        louvain_move_rounds,
    )

    t0 = time.perf_counter()
    louvain_move_rounds(pe, num_rounds=2).count()
    extra["louvain_2rounds_sec"] = round(time.perf_counter() - t0, 4)
    spark.catalog.clearCache()

    from wedge_parallel_triangle_counting_spark.operators.localcluster import (
        ppr_push,
        sweep_cut,
    )

    t0 = time.perf_counter()
    sweep_cut(pe, ppr_push(pe, num_rounds=6)).count()
    extra["ppr_sweep_sec"] = round(time.perf_counter() - t0, 4)
    spark.catalog.clearCache()

    # amortized throughput (out-of-headline): the sf0.1 graph is only
    # 600k oriented edges, so ~2 s of fixed per-job overhead (session,
    # plan, Python worker spin-up) dominates tri_edges_per_sec and
    # understates the engine's marginal rate. Re-measure on a
    # deterministic K-fold amplification (disjoint vertex-shifted
    # copies, the bench_scaling.py construction) where the fixed cost
    # amortizes; report both full-pipeline and exec-phase rates, the
    # reference's two accounting lines (tc.cu:886-913)
    from wedge_parallel_triangle_counting_spark.operators import graph as G
    from wedge_parallel_triangle_counting_spark.operators import triangles as T

    amp_k = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "8"))
    amp = (
        e.crossJoin(spark.range(amp_k).withColumnRenamed("id", "copy"))
        .select(
            (F.col("src") + F.col("copy") * 200003).alias("src"),
            (F.col("dst") + F.col("copy") * 200003).alias("dst"),
        )
        .persist()
    )
    amp_raw = amp.count()
    e2e_secs = []
    amp_tri = None
    for _ in range(2):
        t0 = time.perf_counter()
        amp_tri = (
            triangle_count(amp, strategy="wedge", closure="join").collect()[0][0]
        )
        e2e_secs.append(round(time.perf_counter() - t0, 2))
        spark.catalog.clearCache()
        amp.persist()
        amp.count()
    oriented, _deg, _n, max_id, _stats = G.prepare_oriented_fast(amp)
    flat = oriented.sortWithinPartitions("src", "dst").persist()
    amp_mo = flat.count()
    probe = T._build_probe(spark, flat, max_id + 1, 8192)
    exec_secs = []
    for _ in range(4):  # rep 0 discarded below (reference protocol)
        t0 = time.perf_counter()
        amp_tri2 = (
            flat.mapInPandas(T._flat_count_udf(probe), schema=T.COUNT_SCHEMA)
            .agg(F.coalesce(F.sum("tri"), F.lit(0)).alias("triangles"))
            .collect()[0][0]
        )
        exec_secs.append(round(time.perf_counter() - t0, 4))
    assert amp_tri2 == amp_tri, (amp_tri2, amp_tri)
    amp_e2e = min(e2e_secs)
    amp_exec = min(exec_secs[1:])
    extra["amplified"] = {
        "k": amp_k,
        "m_raw": amp_raw,
        "m_oriented": amp_mo,
        "triangles": amp_tri,
        "e2e_sec": amp_e2e,
        "e2e_edges_per_sec": round(amp_mo / amp_e2e, 1),
        "exec_sec": amp_exec,
        "exec_edges_per_sec": round(amp_mo / amp_exec, 1),
    }
    amp.unpersist()
    flat.unpersist()
    spark.catalog.clearCache()

    extra["loadavg_end"] = round(os.getloadavg()[0], 2)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": extra,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
