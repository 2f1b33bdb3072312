"""Exact triangle counting — four physical strategies, one logical query.

The reference ships ~12 binaries that are alternative physical plans of
the same query (SURVEY.md §2.11); we expose the same axis as a
`strategy=` option, and the strategies cross-check each other
(differential testing, mirroring the reference's cross-variant
agreement):

- "wedge"  (default, the WeTriC strategy, tc.cu:173-293): degree-ordered
  orientation + relabel to rank space, then a two-lane physical plan:
  * non-hub lane: oriented edges hash-repartitioned by src and sorted
    within partitions — the partition IS the CSR (columnar src/dst, no
    array objects); one vectorized mapInPandas enumerates wedges and
    probes closure per partition;
  * hub lane (power-law head): vertices whose wedge count exceeds
    `split_budget` are exploded into bounded first-index chunks
    (high-degree-vertex splitting) and spread across partitions.
  Both lanes probe a broadcast sorted edge-key array + hub bitmap
  (reference J1/J3), or emit candidate pairs for a distributed
  LEFT SEMI join when the edge set exceeds executor memory.
- "vertex" (experiments/tc_vertex.cu): one adjacency-array row per unit
  of work (collect_list layout), no splitting/rebalancing.
- "edge"   (experiments/tc_edge.cu, mixed wedge style): per oriented
  edge (a,b), |adj(a) ∩ adj(b)| via `array_intersect` — 100% JVM.
- "join"   (the relational formulation): oriented 3-way self-join,
  pure Catalyst — also the DuckDB oracle formulation.
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
    chunk enumerates ≤ ~split_budget pairs. (north rule:
    'high-degree-vertex splitting'; the reference handles the same skew
    with wedge-id global partitioning, tc.cu:348-361.)"""
    c = F.greatest(F.lit(1), (F.lit(split_budget) / F.col("deg")).cast("long"))
    return (
        adj_df.filter(F.col("deg") >= 2)
        .withColumn("i_lo", F.explode(F.sequence(F.lit(0), F.col("deg") - 2, c)))
        .withColumn("i_hi", F.least(F.col("i_lo") + c, F.col("deg") - 1))
        .select("v", "adj", "deg", "i_lo", "i_hi")
    )


class _Probe:
    """Closure-probe context shipped to executors (broadcast handles)."""

    def __init__(self, keys_bc, key_base, hub_bc, hub_lo, hub_k):
        self.keys_bc = keys_bc
        self.key_base = key_base
        self.hub_bc = hub_bc
        self.hub_lo = hub_lo
        self.hub_k = hub_k

    def count(self, flat, starts, degs, i_lo, i_hi) -> int:
        return wk.count_triangles_block(
            flat,
            starts,
            degs,
            i_lo,
            i_hi,
            self.keys_bc.value,
            self.key_base,
            self.hub_bc.value if self.hub_bc is not None else None,
            self.hub_lo,
            self.hub_k,
        )


def _runs(src: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run-length encode a sorted src column → (starts, lengths)."""
    change = np.flatnonzero(src[1:] != src[:-1])
    starts = np.concatenate([[0], change + 1]).astype(np.int64)
    degs = np.diff(np.append(starts, len(src))).astype(np.int64)
    return starts, degs


def _flat_count_udf(probe: _Probe):
    """Count wedges closing over partitions of (src, dst) rows sorted by
    (src, dst) — the partition is consumed as columnar CSR directly.
    Arrow batches may split a vertex's adjacency; a carry buffer defers
    the trailing (possibly incomplete) vertex run to the next batch."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry_s = carry_d = None
        total = 0

        def process(src: np.ndarray, dst: np.ndarray) -> int:
            starts, degs = _runs(src)
            return probe.count(
                dst, starts, degs, np.zeros(len(degs), np.int64), degs - 1
            )

        for pdf in it:
            if len(pdf) == 0:
                continue
            src = pdf["src"].values.astype(np.int64, copy=False)
            dst = pdf["dst"].values.astype(np.int64, copy=False)
            if carry_s is not None:
                src = np.concatenate([carry_s, src])
                dst = np.concatenate([carry_d, dst])
            # defer the trailing run (vertex may continue in next batch)
            boundary = int(np.searchsorted(src, src[-1], side="left"))
            if boundary > 0:
                total += process(src[:boundary], dst[:boundary])
            carry_s, carry_d = src[boundary:], dst[boundary:]
        if carry_s is not None and len(carry_s):
            total += process(carry_s, carry_d)
        yield pd.DataFrame({"tri": [total]})

    return run


def _array_count_udf(probe: _Probe):
    """Count wedges for chunk rows (v, adj, deg, i_lo, i_hi) — the hub
    lane and the vertex strategy."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        total = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            degs = pdf["deg"].values.astype(np.int64)
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in pdf["adj"].values]
            )
            starts = np.cumsum(degs) - degs
            total += probe.count(
                flat,
                starts,
                degs,
                pdf["i_lo"].values.astype(np.int64),
                pdf["i_hi"].values.astype(np.int64),
            )
        yield pd.DataFrame({"tri": [total]})

    return run


def _emit_pairs_flat_udf():
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry_s = carry_d = None

        def emit(src, dst):
            starts, degs = _runs(src)
            w, u = wk.enumerate_pairs(
                dst, starts, degs, np.zeros(len(degs), np.int64), degs - 1
            )
            return pd.DataFrame({"src": w, "dst": u})

        for pdf in it:
            if len(pdf) == 0:
                continue
            src = pdf["src"].values.astype(np.int64, copy=False)
            dst = pdf["dst"].values.astype(np.int64, copy=False)
            if carry_s is not None:
                src = np.concatenate([carry_s, src])
                dst = np.concatenate([carry_d, dst])
            boundary = int(np.searchsorted(src, src[-1], side="left"))
            if boundary > 0:
                yield emit(src[:boundary], dst[:boundary])
            carry_s, carry_d = src[boundary:], dst[boundary:]
        if carry_s is not None and len(carry_s):
            yield emit(carry_s, carry_d)

    return run


def _emit_pairs_array_udf():
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            degs = pdf["deg"].values.astype(np.int64)
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in pdf["adj"].values]
            )
            starts = np.cumsum(degs) - degs
            w, u = wk.enumerate_pairs(
                flat,
                starts,
                degs,
                pdf["i_lo"].values.astype(np.int64),
                pdf["i_hi"].values.astype(np.int64),
            )
            yield pd.DataFrame({"src": w, "dst": u})

    return run


def _build_probe(spark, oriented: DataFrame, n: int, hub_k: int) -> _Probe:
    if n * n > 2**62:
        raise ValueError("vertex domain too large for int64 edge keys")
    pdf = oriented.select("src", "dst").toPandas()
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
    return _Probe(keys_bc, n, hub_bc, hub_lo, hk)


def _wedge_count(
    spark,
    oriented: DataFrame,
    n: int,
    closure: str,
    hub_k: int,
    split_budget: int,
    partitions: int | None,
) -> DataFrame:
    """Two-lane wedge-parallel count over rank-space oriented edges."""
    npart = partitions or spark.sparkContext.defaultParallelism

    # ONE stats job over the persisted oriented set: total m (drives
    # the broadcast-vs-join closure choice) + the hub id list (vertices
    # whose wedge count d(d-1)/2 exceeds split_budget).
    hub_min_deg = int((2 * split_budget) ** 0.5) + 2
    odeg = oriented.groupBy("src").agg(F.count("*").alias("deg"))
    stats = odeg.agg(
        F.coalesce(F.sum("deg"), F.lit(0)).alias("m"),
        F.collect_list(F.when(F.col("deg") >= hub_min_deg, F.col("src"))).alias(
            "hubs"
        ),
    ).collect()[0]
    m, hub_ids = stats["m"], list(stats["hubs"])

    flat_edges = oriented
    hub_chunks = None
    if hub_ids:
        if len(hub_ids) <= 10_000:
            is_hub = F.col("src").isin(hub_ids)
            flat_edges = oriented.filter(~is_hub)
            hub_edges = oriented.filter(is_hub)
        else:
            # adversarially many hubs: route via broadcast anti/semi
            # joins instead of a giant literal IN list
            hub_df = F.broadcast(
                spark.createDataFrame([(h,) for h in hub_ids], "src long")
            )
            flat_edges = oriented.join(hub_df, "src", "left_anti")
            hub_edges = oriented.join(hub_df, "src", "left_semi")
        hub_adj = adjacency(hub_edges)
        hub_chunks = _split_chunks(hub_adj, split_budget).repartition(
            npart, "v", "i_lo"
        )
    flat_parted = flat_edges.repartition(npart, "src").sortWithinPartitions(
        "src", "dst"
    )

    if closure == "auto":
        closure = "broadcast" if m <= BROADCAST_MAX_EDGES else "join"

    if closure == "broadcast":
        probe = _build_probe(spark, oriented, n, hub_k)
        counts = flat_parted.mapInPandas(_flat_count_udf(probe), schema="tri long")
        if hub_chunks is not None:
            counts = counts.unionByName(
                hub_chunks.mapInPandas(_array_count_udf(probe), schema="tri long")
            )
        return counts.agg(F.coalesce(F.sum("tri"), F.lit(0)).alias("triangles"))

    # Distributed closure: emit candidate pairs, LEFT SEMI against edges.
    pairs = flat_parted.mapInPandas(_emit_pairs_flat_udf(), schema="src long, dst long")
    if hub_chunks is not None:
        pairs = pairs.unionByName(
            hub_chunks.mapInPandas(_emit_pairs_array_udf(), schema="src long, dst long")
        )
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
    if strategy == "wedge":
        oriented, _ranks, n = prepare_oriented(edges, rank_method=rank_method)
        oriented = oriented.persist()
        return _wedge_count(
            spark,
            oriented,
            n,
            closure=closure,
            hub_k=hub_k,
            split_budget=split_budget,
            partitions=partitions,
        )

    if strategy == "vertex":
        oriented, _ranks, n = prepare_oriented(edges, rank_method=rank_method)
        oriented = oriented.persist()
        adj = adjacency(oriented)
        rows = adj.filter(F.col("deg") >= 2).select(
            "v",
            "adj",
            "deg",
            F.lit(0).alias("i_lo"),
            (F.col("deg") - 1).alias("i_hi"),
        )
        if closure == "auto":
            closure = (
                "broadcast" if oriented.count() <= BROADCAST_MAX_EDGES else "join"
            )
        if closure == "broadcast":
            probe = _build_probe(spark, oriented, n, 0)
            per_part = rows.mapInPandas(_array_count_udf(probe), schema="tri long")
            return per_part.agg(
                F.coalesce(F.sum("tri"), F.lit(0)).alias("triangles")
            )
        pairs = rows.mapInPandas(_emit_pairs_array_udf(), schema="src long, dst long")
        return pairs.join(oriented, ["src", "dst"], "left_semi").agg(
            F.count("*").alias("triangles")
        )

    # sym feeds degrees + two orientation joins — persist once
    sym = symmetrize(normalize_edges(edges)).persist()
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
