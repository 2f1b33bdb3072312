"""Deterministic synchronous Louvain-style local-move rounds.

The local-move phase of Louvain community detection (Blondel et al.
2008), made a pure function of the graph so the DuckDB oracle can
replay it bit-for-bit (the same determinism contract as labelprop):

- graph: clean symmetric simple graph (self loops dropped, dedup);
- community_0(v) = v (singletons);
- each round, every vertex v evaluates its neighbor communities c and
  the modularity gain of joining c, SYNCHRONOUSLY against the previous
  round's assignment:

      dQ(v -> c)  propto  2m * k_vc  -  k_v * sigma_adj(c)

  where k_vc = edges from v into c, sigma_adj(c) = total degree of c
  minus k_v when v is currently in c (the standard "remove v first"
  term). The surrogate is dQ * 2m^2 -- every factor an integer, so the
  argmax is exact and engine-independent. Tie-break: (score DESC,
  community ASC); if the best score is <= 0 the vertex falls back to
  its own singleton {v} (gain-zero reference), standard Louvain
  semantics for the isolate option.
- fixed number of rounds (synchronous updates can oscillate, like
  LPA; fixed-k is the reproducible contract). Classic Louvain then
  contracts the graph and repeats -- the contraction is a groupBy
  relabel (components-style); the move phase here is the part with
  actual algorithmic content.

Scores are computed in decimal(38,0) (== DuckDB HUGEINT): 2m * k_vc
tops out near (2m)^2, past int64 at the 10^12-edge target but exact
in 38-digit decimal (same widening as operators/quality.py).

Per-round cost: one edge-sized (v, c) aggregation + a community-sized
degree rollup + a v-partitioned argmax window; the assignment is
broadcast in the small-state regime (loop_layout) so no edge relation
is re-exchanged per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .checkpointing import loop_layout, loop_partitions
from .graph import build_sym_clustered

_DEC = "decimal(38,0)"


def louvain_move_rounds(edges: DataFrame, num_rounds: int = 2) -> DataFrame:
    """Returns DataFrame [v: long, community: long]."""
    spark = edges.sparkSession
    npart = loop_partitions(spark)
    key, bcast_state = loop_layout(edges)
    sym = build_sym_clustered(edges, npart, key=key).persist()
    deg = (
        sym.groupBy(F.col("src").alias("v"))
        .agg(F.count("*").cast("long").alias("kv"))
        .localCheckpoint(eager=True)
    )
    m2 = sym.count()  # = 2m, one driver scalar

    comm = deg.select("v", F.col("v").alias("community"))
    w = Window.partitionBy("v").orderBy(F.desc("score"), F.asc("c"))
    for _ in range(num_rounds):
        cs = (
            comm.join(deg, "v")
            .groupBy(F.col("community").alias("c"))
            .agg(F.sum("kv").alias("sigma"))
        )
        rhs = comm.select(F.col("v").alias("u"), F.col("community").alias("c"))
        kvc = (
            sym.join(F.broadcast(rhs) if bcast_state else rhs, sym.dst == F.col("u"))
            .groupBy(F.col("src").alias("v"), "c")
            .agg(F.count("*").cast("long").alias("kvc"))
        )
        cur = comm.select("v", F.col("community").alias("cv"))
        scored = (
            kvc.join(F.broadcast(deg) if bcast_state else deg, "v")
            .join(F.broadcast(cur) if bcast_state else cur, "v")
            .join(F.broadcast(cs) if bcast_state else cs, "c")
            .withColumn(
                "sig_adj",
                F.col("sigma")
                - F.when(F.col("c") == F.col("cv"), F.col("kv")).otherwise(F.lit(0)),
            )
            .withColumn(
                "score",
                F.lit(m2).cast(_DEC) * F.col("kvc").cast(_DEC)
                - F.col("kv").cast(_DEC) * F.col("sig_adj").cast(_DEC),
            )
        )
        comm = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "v",
                F.when(F.col("score") > 0, F.col("c"))
                .otherwise(F.col("v"))
                .alias("community"),
            )
            .localCheckpoint(eager=False)
        )
    comm = comm.select("v", F.col("community").cast("long").alias("community"))
    comm.count()
    sym.unpersist()
    return comm


def contract_communities(
    edges: DataFrame,
    assignment: DataFrame,
    v_col: str = "v",
    c_col: str = "community",
) -> DataFrame:
    """The Louvain coarsening step: collapse each community to a
    super-vertex and return the weighted supergraph
    [ca: long, cb: long, weight: long] over the clean undirected
    graph, ca <= cb canonical; intra-community edges survive as
    ca == cb loop rows (their weight is what the next Louvain level's
    modularity needs). Vertices absent from `assignment` keep
    themselves as their community (partial labelings contract too).

    One edge-sized map + one (ca, cb) aggregation — the supergraph is
    communities-sized, so every subsequent level is cheaper; this is
    why multilevel Louvain scales where flat algorithms do not.
    """
    clean = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    amap = assignment.select(
        F.col(v_col).alias("_v"), F.col(c_col).alias("_c")
    )
    ca = F.coalesce(F.col("ca0"), F.col("a"))
    cb = F.coalesce(F.col("cb0"), F.col("b"))
    return (
        clean.join(
            amap.select(F.col("_v").alias("a"), F.col("_c").alias("ca0")),
            "a",
            "left",
        )
        .join(
            amap.select(F.col("_v").alias("b"), F.col("_c").alias("cb0")),
            "b",
            "left",
        )
        .select(
            F.least(ca, cb).alias("ca"),
            F.greatest(ca, cb).alias("cb"),
        )
        .groupBy("ca", "cb")
        .agg(F.count("*").cast("long").alias("weight"))
        .select(
            F.col("ca").cast("long").alias("ca"),
            F.col("cb").cast("long").alias("cb"),
            "weight",
        )
    )
