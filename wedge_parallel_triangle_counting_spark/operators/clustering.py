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


def _per_vertex_triangles(edges: DataFrame, caches: list | None = None) -> DataFrame:
    """(v, degree, t) for every vertex of the cleaned symmetric graph:
    degree in the symmetric graph, t = triangles through v (0 when
    none). Shared base of local_triangle_counts / clustering_by_degree."""
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
    return deg.join(tcnt, "v", "left").select(
        "v",
        F.col("degree").cast("long").alias("degree"),
        F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("t"),
    )


def local_triangle_counts(
    edges: DataFrame, caches: list | None = None
) -> DataFrame:
    """(v, tri_count, lcc) for every vertex of the cleaned symmetric
    graph; lcc rounded to 6 dp, 0.0 for degree < 2."""
    pv = _per_vertex_triangles(edges, caches=caches)
    lcc = F.when(
        F.col("degree") >= 2,
        F.round(F.col("t") * 2.0 / (F.col("degree") * (F.col("degree") - 1)), 6),
    ).otherwise(F.lit(0.0))
    return pv.select("v", F.col("t").alias("tri_count"), lcc.alias("lcc"))


def clustering_by_degree(
    edges: DataFrame, caches: list | None = None
) -> DataFrame:
    """The c(k) curve — average clustering per degree class:
    (degree, n_vertices, total_triangles, closed_ppm) with
    closed_ppm = closed wedges / wedges over the class, in exact
    integer ppm: sum(t)·2·10⁶ DIV (n_vertices·d·(d−1)); 0 for d < 2.

    The degree-dependence of clustering is the standard structure
    diagnostic of a link graph (hierarchical webs fall off as ~1/k;
    a flat curve means the fixture/crawl is degree-mixed). Every
    vertex of a class has the same wedge count, so the class ratio is
    exact integer arithmetic — hash-stable, unlike averaging per-vertex
    rounded lcc values. One per-degree aggregation over the shared
    per-vertex triangle relation; output cardinality = #distinct
    degrees (≤ max degree — tiny at any scale)."""
    pv = _per_vertex_triangles(edges, caches=caches)
    return (
        pv.groupBy("degree")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum("t").alias("total_triangles"),
        )
        .select(
            "degree",
            "n_vertices",
            F.col("total_triangles").cast("long").alias("total_triangles"),
            F.expr(
                "CASE WHEN degree >= 2 THEN"
                " total_triangles * 2 * 1000000 DIV (n_vertices * degree * (degree - 1))"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("closed_ppm"),
        )
    )
