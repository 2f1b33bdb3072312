"""Deterministic R-MAT graph generator (Chakrabarti, Zhan & Faloutsos
2004) — the standard synthetic power-law web-graph source
(Graph500 uses the same recursive-quadrant construction).

Every edge is a pure column expression of its index: at each of the
log2(n) recursion levels an md5-derived value picks the quadrant with
probabilities (a, b, c) = (0.57, 0.19, 0.19), d = 0.05 — the Graph500
parameters — by integer threshold on hash % 100. No RNG state, no
driver loop: `spark.range(m)` plus a fold over levels, so generation
is distributed, reproducible at any parallelism, O(m log n) work with
zero shuffles (the output is NOT materialized — it fuses into whatever
consumes it), and — because the hash is the engine's standard md5
idiom — replayable in the DuckDB oracle (plans/oracles.py::rmat_sql),
which certifies the generator itself.

Scale: 10^12 edges is spark.range(10^12) — partition count controls
task granularity; each task generates its slice independently. The
degree distribution is power-law-ish (hub head), which is exactly the
skew the engine's hub machinery is built for; tests assert determinism
and the hub skew, and the triangle pipeline runs over it unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Graph500 quadrant split, as cumulative integer percent thresholds
A_PCT, AB_PCT, ABC_PCT = 57, 76, 95


def synth_rmat(
    spark: SparkSession,
    scale: int = 14,
    edge_factor: int = 16,
    seed: int = 7,
) -> DataFrame:
    """[src: long, dst: long] — 2^scale vertices, edge_factor * 2^scale
    directed edge samples (duplicates/self-loops included, as R-MAT
    defines; feed through the engine's normalize/dedup prep like any
    dirty crawl)."""
    n_edges = edge_factor * (1 << scale)
    df = spark.range(n_edges).withColumnRenamed("id", "eid")
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        h = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"rmat:{seed}:{level}:"),
                            F.col("eid").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 100
        )
        bit_src = F.when(h < AB_PCT, F.lit(0)).otherwise(F.lit(1))
        bit_dst = F.when(
            (h < A_PCT) | ((h >= AB_PCT) & (h < ABC_PCT)), F.lit(0)
        ).otherwise(F.lit(1))
        src = src * 2 + bit_src
        dst = dst * 2 + bit_dst
    return df.select(src.alias("src"), dst.alias("dst"))
