"""Exact triangle counting — four physical strategies, one logical query.

The reference ships ~12 binaries that are alternative physical plans of
the same query (SURVEY.md §2.11); we expose the same axis as a
`strategy=` option, and the strategies cross-check each other
(differential testing, mirroring the reference's cross-variant
agreement):

- "wedge"  (default, the WeTriC strategy, tc.cu:173-293): degree-ordered
  orientation, high-degree-vertex splitting into bounded wedge chunks,
  wedge-balanced repartitioning, then vectorized enumerate+probe inside
  `mapInPandas` (numpy, no per-row Python).
- "vertex" (experiments/tc_vertex.cu): one adjacency row per unit of
  work, no splitting/rebalancing — simplest UDF path.
- "edge"   (experiments/tc_edge.cu, mixed wedge style): per oriented
  edge (a,b), |adj(a) ∩ adj(b)| via `array_intersect` — 100% JVM,
  whole-stage-codegen, zero Python.
- "join"   (the relational formulation): oriented 3-way self-join,
  pure Catalyst (sort-merge/broadcast per AQE) — also the DuckDB oracle
  formulation.

Closure-check physical choice (`closure=`), mirroring the reference's
J1-vs-J3 dichotomy generalized to a cluster:
- "broadcast": ship a sorted int64 edge-key array (8 B/edge) + a hub
  bitmap to every executor; probe with np.searchsorted. Right choice
  while the oriented edge set fits executor memory (~10^9 edges).
- "join": emit candidate (w,u) pairs and LEFT SEMI join them against
  the edge table — fully distributed, no memory ceiling; the shuffle
  is wedge-balanced by construction because pairs are emitted from
  bounded chunks.
- "auto": broadcast below `broadcast_max_edges`, else join.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import wedge as wk
from .graph import (
    adjacency,
    degrees,
    normalize_edges,
    orient_by_degree,
    prepare_oriented,
    symmetrize,
)

BROADCAST_MAX_EDGES = 30_000_000  # ~240 MB of int64 keys per executor


def _split_chunks(adj_df: DataFrame, split_budget: int) -> DataFrame:
    """High-degree-vertex splitting: explode each adjacency row into
    first-index chunks of width c = max(1, split_budget // deg) so every
    chunk enumerates ≤ ~split_budget pairs. Most vertices → 1 chunk;
    only the power-law head multiplies. (north rule: 'high-degree-vertex
    splitting'; reference handles the same skew with the wedge-id
    global partitioning, tc.cu:348-361.)"""
    c = F.greatest(F.lit(1), (F.lit(split_budget) / F.col("deg")).cast("long"))
    return (
        adj_df.filter(F.col("deg") >= 2)
        .withColumn("i_lo", F.explode(F.sequence(F.lit(0), F.col("deg") - 2, c)))
        .withColumn("i_hi", F.least(F.col("i_lo") + c, F.col("deg") - 1))
        .select("v", "adj", "deg", "i_lo", "i_hi")
    )


def _count_udf(edge_keys_bc, key_base: int, hub_bc, hub_lo: int, hub_k: int):
    def count_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = edge_keys_bc.value
        bitmap = hub_bc.value if hub_bc is not None else None
        for pdf in it:
            if len(pdf) == 0:
                continue
            adj_lists = pdf["adj"].values
            degs = pdf["deg"].values.astype(np.int64)
            flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in adj_lists])
            starts = np.cumsum(degs) - degs
            cnt = wk.count_triangles_block(
                flat,
                starts,
                degs,
                pdf["i_lo"].values.astype(np.int64),
                pdf["i_hi"].values.astype(np.int64),
                keys,
                key_base,
                bitmap,
                hub_lo,
                hub_k,
            )
            yield pd.DataFrame({"tri": [cnt]})

    return count_partition


def _emit_pairs_udf():
    def emit(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            degs = pdf["deg"].values.astype(np.int64)
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in pdf["adj"].values]
            )
            starts = np.cumsum(degs) - degs
            i_lo = pdf["i_lo"].values.astype(np.int64)
            i_hi = pdf["i_hi"].values.astype(np.int64)
            counts = wk.pair_count(degs, i_lo, i_hi)
            lo = 0
            nrows = len(degs)
            while lo < nrows:
                hi = lo + 1
                acc = int(counts[lo])
                while hi < nrows and acc + counts[hi] <= wk.DEFAULT_BLOCK_PAIRS:
                    acc += int(counts[hi])
                    hi += 1
                w, u = wk.enumerate_pairs(
                    flat, starts[lo:hi], degs[lo:hi], i_lo[lo:hi], i_hi[lo:hi]
                )
                yield pd.DataFrame({"src": w, "dst": u})
                lo = hi

    return emit


def _wedge_count(
    spark,
    oriented: DataFrame,
    n: int,
    closure: str,
    hub_k: int,
    split_budget: int,
    partitions: int | None,
    split: bool = True,
) -> DataFrame:
    adj = adjacency(oriented)
    if split:
        chunks = _split_chunks(adj, split_budget)
    else:
        chunks = adj.filter(F.col("deg") >= 2).select(
            "v",
            "adj",
            "deg",
            F.lit(0).alias("i_lo"),
            (F.col("deg") - 1).alias("i_hi"),
        )
    npart = partitions or spark.sparkContext.defaultParallelism
    # Chunks are ≤ split_budget pairs each, so a hash repartition gives
    # near-uniform wedge load without a global prefix sum — the
    # distributed stand-in for the reference's wedgeSum range split.
    chunks = chunks.repartition(npart, "v", "i_lo")

    m = oriented.count()
    if closure == "auto":
        closure = "broadcast" if m <= BROADCAST_MAX_EDGES else "join"

    if closure == "broadcast":
        if n * n > 2**62:
            raise ValueError("vertex domain too large for int64 edge keys")
        pdf = oriented.toPandas()
        src = pdf["src"].values.astype(np.int64)
        dst = pdf["dst"].values.astype(np.int64)
        edge_keys = wk.build_edge_keys(src, dst, n)
        hub_bc = None
        hub_lo = n
        hk = 0
        if hub_k and hub_k > 0:
            bitmap, hub_lo = wk.build_hub_bitmap(src, dst, n, hub_k)
            hk = n - hub_lo
            hub_bc = spark.sparkContext.broadcast(bitmap)
        keys_bc = spark.sparkContext.broadcast(edge_keys)
        per_part = chunks.mapInPandas(
            _count_udf(keys_bc, n, hub_bc, hub_lo, hk), schema="tri long"
        )
        return per_part.agg(F.coalesce(F.sum("tri"), F.lit(0)).alias("triangles"))

    # Distributed closure: emit candidate pairs, LEFT SEMI against edges.
    pairs = chunks.mapInPandas(_emit_pairs_udf(), schema="src long, dst long")
    closed = pairs.join(oriented, ["src", "dst"], "left_semi")
    return closed.agg(F.count("*").alias("triangles"))


def triangle_count(
    edges: DataFrame,
    strategy: str = "wedge",
    closure: str = "auto",
    rank_method: str = "scalable",
    hub_k: int = 8192,
    split_budget: int = 1 << 18,
    partitions: int | None = None,
) -> DataFrame:
    """Exact global triangle count of the undirected simple graph
    induced by a (possibly dirty) edge DataFrame [src, dst].

    Returns a 1-row DataFrame [triangles: long]."""
    spark = edges.sparkSession
    if strategy in ("wedge", "vertex"):
        oriented, _ranks, n = prepare_oriented(edges, rank_method=rank_method)
        oriented = oriented.persist()
        return _wedge_count(
            spark,
            oriented,
            n,
            closure=closure,
            hub_k=hub_k if strategy == "wedge" else 0,
            split_budget=split_budget,
            partitions=partitions,
            split=(strategy == "wedge"),
        )

    sym = symmetrize(normalize_edges(edges))
    deg = degrees(sym)
    oriented = orient_by_degree(sym, deg)

    if strategy == "edge":
        adj = adjacency(oriented)
        a_src = adj.select(F.col("v").alias("src"), F.col("adj").alias("adj_src"))
        a_dst = adj.select(F.col("v").alias("dst"), F.col("adj").alias("adj_dst"))
        per_edge = (
            oriented.join(a_src, "src")
            .join(a_dst, "dst")
            .select(F.size(F.array_intersect("adj_src", "adj_dst")).alias("c"))
        )
        return per_edge.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("triangles"))

    if strategy == "join":
        e1 = oriented.alias("e1")
        e2 = oriented.alias("e2")
        e3 = oriented.alias("e3")
        tri = (
            e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
            .join(
                e3,
                (F.col("e1.src") == F.col("e3.src"))
                & (F.col("e2.dst") == F.col("e3.dst")),
                "left_semi",
            )
        )
        return tri.agg(F.count("*").alias("triangles"))

    raise ValueError(f"unknown strategy {strategy!r}")


def wedge_stats(edges: DataFrame) -> DataFrame:
    """Graph summary: n, m (oriented), total wedges of the oriented
    graph, max degree — the reference's sample_degrees report
    (experiments/sample_degrees.cu:505-560)."""
    sym = symmetrize(normalize_edges(edges))
    deg = degrees(sym)
    oriented = orient_by_degree(sym, deg)
    odeg = degrees(oriented.select("src", "dst"))
    stats_sym = deg.agg(
        F.count("*").alias("n"), F.max("degree").alias("max_degree")
    )
    stats_or = odeg.agg(
        F.coalesce(F.sum("degree"), F.lit(0)).alias("m_oriented"),
        F.coalesce(
            F.sum(F.expr("degree * (degree - 1) / 2").cast("long")), F.lit(0)
        ).alias("total_wedges"),
    )
    return stats_sym.crossJoin(stats_or).select(
        "n", "m_oriented", "total_wedges", "max_degree"
    )
