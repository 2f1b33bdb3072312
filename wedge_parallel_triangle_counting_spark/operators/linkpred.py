"""Link prediction: common-neighbor scores for non-adjacent pairs.

The standard link-graph feature (pages that share many linking pages
but don't yet link): cn(x, y) = |N(x) ∩ N(y)| over the UNDIRECTED
graph, reported for the top-k non-adjacent pairs with a fully
deterministic tie-break (score desc, then ids) so the result is a
pure function of the graph.

Note the orientation trick does NOT apply here: a triangle has exactly
one all-outgoing vertex under degree orientation, but an OPEN wedge's
center may point inward — so enumeration must use the symmetric
adjacency. Cost is Σ deg² (the true size of the wedge relation);
the groupBy collapses it map-side, and at web scale the same hub
splitting as the triangle path bounds the per-task explosion (here the
quadratic hub cost is inherent to the metric itself — cap it upstream
with a degree ceiling when hubs' predictions aren't wanted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import normalize_edges, symmetrize


def common_neighbor_pairs(edges: DataFrame, k: int = 50) -> DataFrame:
    """Eager DataFrame [id_a, id_b, cn]: the k highest common-neighbor
    counts among NON-adjacent vertex pairs, ties broken by (id_a,
    id_b) ascending."""
    spark = edges.sparkSession
    npart = spark.sparkContext.defaultParallelism
    sym = symmetrize(normalize_edges(edges)).repartition(npart, "src").persist()
    s1 = sym.select(F.col("src").alias("z"), F.col("dst").alias("id_a"))
    s2 = sym.select(F.col("src").alias("z"), F.col("dst").alias("id_b"))
    wedge_pairs = (
        s1.join(s2, "z")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("cn"))
    )
    existing = sym.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")
    )
    top = (
        wedge_pairs.join(existing, ["id_a", "id_b"], "left_anti")
        .orderBy(F.desc("cn"), F.asc("id_a"), F.asc("id_b"))
        .limit(k)
    )
    rows = [(int(r.id_a), int(r.id_b), int(r.cn)) for r in top.collect()]
    sym.unpersist()
    return spark.createDataFrame(rows, "id_a long, id_b long, cn long")
