"""Round-6 optimization profiler (guide §1: measure first).

Runs each bench operator once at $SPARK_GRAFT_SF_DIR with a job group
per query, and reports wall seconds + Spark JOB COUNT per query (the
per-job scheduling overhead is a first-order cost for iterative
operators at sf0.1, and every job is a driver barrier at any scale).
Results print as one JSON line; bench.py itself stays frozen.

Usage: python tools/profile_r06.py [ops...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench import BENCH_MODULUS, bench_edges, pr_edges  # noqa: E402
from wedge_parallel_triangle_counting_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])
    spark = get_spark(app_name="profile-r06")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm-up mirroring bench.py
    import pandas as pd

    spark.range(1_000_000).agg(F.sum("id")).collect()
    bench_edges(spark, sf_dir).count()
    spark.range(100_000).repartition(32).mapInPandas(
        lambda it: (pd.DataFrame({"x": [1]}) for _ in it), "x long"
    ).count()

    e = bench_edges(spark, sf_dir)
    pe = pr_edges(spark, sf_dir)

    from wedge_parallel_triangle_counting_spark.operators.anf import (
        neighborhood_function,
    )
    from wedge_parallel_triangle_counting_spark.operators.community import (
        louvain_move_rounds,
    )
    from wedge_parallel_triangle_counting_spark.operators.components import (
        connected_components,
    )
    from wedge_parallel_triangle_counting_spark.operators.coreness import core_numbers
    from wedge_parallel_triangle_counting_spark.operators.eigencentrality import (
        eigenvector_centrality,
    )
    from wedge_parallel_triangle_counting_spark.operators.hits import hits
    from wedge_parallel_triangle_counting_spark.operators.labelprop import (
        label_propagation,
    )
    from wedge_parallel_triangle_counting_spark.operators.localcluster import (
        ppr_push,
        sweep_cut,
    )
    from wedge_parallel_triangle_counting_spark.operators.pagerank import pagerank
    from wedge_parallel_triangle_counting_spark.operators.scc import (
        strongly_connected_components,
    )
    from wedge_parallel_triangle_counting_spark.operators.triangles import (
        triangle_count,
    )
    from wedge_parallel_triangle_counting_spark.plans import testdata
    from wedge_parallel_triangle_counting_spark.plans.docpages import doc_pages
    from wedge_parallel_triangle_counting_spark.plans.ingest import pages_to_edges

    ops = {
        "triangles_wedge": lambda: triangle_count(e, strategy="wedge").collect(),
        "triangles_edge": lambda: triangle_count(e, strategy="edge").collect(),
        "triangles_arrow": lambda: triangle_count(e, strategy="arrow").collect(),
        "pagerank_5it": lambda: pagerank(pe, num_iters=5).count(),
        "components": lambda: connected_components(pe).count(),
        "components_star": lambda: connected_components(pe, strategy="star").count(),
        "labelprop_3it": lambda: label_propagation(pe, num_iters=3).count(),
        "ingest_edges": lambda: pages_to_edges(doc_pages(spark, sf_dir))[0].count(),
        "hits_5it": lambda: hits(pe, num_iters=5).count(),
        "eigen_5it": lambda: eigenvector_centrality(pe, num_iters=5).count(),
        "scc": lambda: strongly_connected_components(
            testdata.derived_directed_sparse_edges(spark, sf_dir)
        ).count(),
        "anf_4hop": lambda: neighborhood_function(pe, k=32, max_hops=4).count(),
        "coreness": lambda: core_numbers(pe).count(),
        "louvain_2rounds": lambda: louvain_move_rounds(pe, num_rounds=2).count(),
        "ppr_sweep": lambda: sweep_cut(pe, ppr_push(pe, num_rounds=6)).count(),
    }

    out: dict = {"sf_dir": sf_dir, "loadavg": round(os.getloadavg()[0], 2)}
    results: dict = {}
    for name, fn in ops.items():
        if only and name not in only:
            continue
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        jobs = sc.statusTracker().getJobIdsForGroup(name)
        spark.catalog.clearCache()
        results[name] = {"sec": round(dt, 3), "jobs": len(jobs)}
        print(f"{name:>18}: {dt:7.3f}s  {len(jobs):3d} jobs", file=sys.stderr)
    out["results"] = results
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
