"""Per-vertex triangle counts and local clustering coefficient.

Extends the reference's single global-count query (tc.cu) to the
per-vertex statistic a link-graph analyst actually reads off it:
t(v) = triangles through v, lcc(v) = t(v) / C(deg(v), 2).

Physical plan: one pass over the degree-oriented edges joined with
both endpoint adjacencies (the `edge` strategy layout,
experiments/tc_edge.cu); each oriented edge (a, b) contributes
|adj(a) ∩ adj(b)| to BOTH endpoints and 1 to every common neighbor c
(the triangle's third corner). All JVM expressions — the explode
emits exactly 3T corner rows for T triangles, then one hash
aggregation. No driver-side work beyond the prep stats action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import adjacency, prepare_oriented_fast


def local_triangle_counts(
    edges: DataFrame, caches: list | None = None
) -> DataFrame:
    """(v, tri_count, lcc) for every vertex of the cleaned symmetric
    graph; lcc rounded to 6 dp, 0.0 for degree < 2."""
    own: list = []
    oriented, deg, _n, _max_id, _stats = prepare_oriented_fast(edges, caches=own)
    if caches is not None:
        caches.extend(own)
    adj = adjacency(oriented)
    a_src = adj.select(F.col("v").alias("src"), F.col("adj").alias("adj_src"))
    a_dst = adj.select(F.col("v").alias("dst"), F.col("adj").alias("adj_dst"))
    per_edge = (
        oriented.join(a_src, "src")
        .join(a_dst, "dst")
        .select(
            "src",
            "dst",
            F.array_intersect("adj_src", "adj_dst").alias("common"),
        )
        .filter(F.size("common") > 0)
    )
    corners = (
        per_edge.select(F.col("src").alias("v"), F.size("common").alias("w"))
        .unionByName(
            per_edge.select(F.col("dst").alias("v"), F.size("common").alias("w"))
        )
        .unionByName(
            per_edge.select(F.explode("common").alias("v"), F.lit(1).alias("w"))
        )
    )
    tcnt = corners.groupBy("v").agg(F.sum("w").alias("t"))
    lcc = F.when(
        F.col("degree") >= 2,
        F.round(
            F.coalesce(F.col("t"), F.lit(0))
            * 2.0
            / (F.col("degree") * (F.col("degree") - 1)),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return deg.join(tcnt, "v", "left").select(
        "v",
        F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("tri_count"),
        lcc.alias("lcc"),
    )
