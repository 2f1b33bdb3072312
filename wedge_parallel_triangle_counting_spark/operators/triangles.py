"""Exact triangle counting — five physical strategies, one logical query.

The reference ships ~12 binaries that are alternative physical plans of
the same query (SURVEY.md §2.11); we expose the same axis as a
`strategy=` option, and the strategies cross-check each other
(differential testing, mirroring the reference's cross-variant
agreement):

- "wedge"  (default, the WeTriC strategy, tc.cu:173-293): in the
  broadcast-closure regime (≤30M edges) the COLLECT-FUSED path runs
  exactly two edge-sized jobs: the single symmetrize/dedup shuffle
  terminated by the probe's Arrow collect (degrees, stats, orientation,
  hub detection and the hub bitmap all derived from the collected
  arrays in numpy), then one count job in which the vectorized UDF
  applies the degree-order orientation and hub skip against a broadcast
  degree dictionary — no stats job, no degree joins. Beyond that
  regime (or under explicit partitioner/prep overrides) the general
  two-lane plan runs: fused single-shuffle preprocessing
  (degree-ordered orientation in ORIGINAL id space —
  graph.prepare_oriented_fast), then:
  * non-hub lane: oriented edges are already hash-clustered by src
    from the prep shuffle; a sortWithinPartitions makes the partition
    the CSR (columnar src/dst, no array objects) with NO further
    exchange; one vectorized mapInPandas enumerates wedges and probes
    closure per partition;
  * hub lane (power-law head): vertices whose wedge count exceeds
    `split_budget` are routed out by anti/semi JOIN (never a driver-side
    id collect), exploded into bounded first-index chunks
    (high-degree-vertex splitting) and spread across partitions.
  Both lanes probe a broadcast sorted canonical edge-key array + hub
  bitmap (reference J1/J3), or emit candidate pairs for a distributed
  LEFT SEMI join when the edge set exceeds executor memory.
  `partitioner="wedge_range"` replaces the hash clustering of the flat
  lane with a range partitioning on the global cumulative wedge count
  (the paper's equal-wedges-per-worker partition, tc.cu:348-361).
- "arrow"  (experiments/tc_arrow.cu:173-289,345-371): path-wedge
  enumeration — per oriented edge (v,w), walk adj(w) (the two-level
  wedge_vp/wedge_vi index becomes an edges⋈adjacency join) and probe
  closure {v,u}.
- "vertex" (experiments/tc_vertex.cu): one adjacency-array row per unit
  of work (collect_list layout), no splitting/rebalancing.
- "edge"   (experiments/tc_edge.cu, mixed wedge style): per oriented
  edge (a,b), |adj(a) ∩ adj(b)| via `array_intersect` — 100% JVM.
- "join"   (the relational formulation): oriented 3-way self-join,
  pure Catalyst — also the DuckDB oracle formulation.

All strategies return an eagerly computed 1-row DataFrame and
unpersist their intermediate caches, so repeated queries in one
session don't accumulate cached blocks.
"""

from __future__ import annotations

import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import wedge as wk
from .graph import (
    adjacency,
    prepare_oriented,
    prepare_oriented_fast,
)

BROADCAST_MAX_EDGES = 30_000_000  # ~240 MB of int64 keys per executor
HUB_ROUTE_BROADCAST_MAX = 1_000_000  # hub-id table broadcast cap for lane routing

# Catalyst-statistics gate for the collect-fused wedge path (r6,
# VERDICT item 3: the old gate ran a full count() job on the derived
# input before every fused count). optimizedPlan().stats().sizeInBytes
# is metadata-only (file sizes x projection ratio — no job):
# - est <= FUSED_STATS_SAFE_BYTES: enter fused WITHOUT the count job.
#   The bound is deliberately 1 byte/row (measured parquet int-pair
#   scans estimate 3.7-22 B/row), so only sub-byte-per-row adversarial
#   encodings can overshoot — and the fused path now re-checks the
#   ACTUAL collected row count and falls back to the distributed
#   pipeline if it exceeds BROADCAST_MAX_EDGES, so a wrong estimate
#   costs memory headroom, never correctness.
# - est >= FUSED_STATS_SKIP_BYTES (64 B/row at the cap): certainly too
#   big — skip fused without counting.
# - in between: the exact count() gate, as before.
FUSED_STATS_SAFE_BYTES = BROADCAST_MAX_EDGES  # 1 byte/row floor
FUSED_STATS_SKIP_BYTES = 64 * BROADCAST_MAX_EDGES


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's estimated size of the optimized plan in bytes —
    metadata-only, no job. None when the estimate is unavailable."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover — py4j/plan edge cases
        return None


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
    """Closure-probe context shipped to executors (broadcast handles).

    `hub_ids` is a sorted ≤hub_k-element id array (tiny — rides in the
    closure pickle); the bitmap over its positions is broadcast."""

    def __init__(self, keys_bc, key_base, hub_bc, hub_ids):
        self.keys_bc = keys_bc
        self.key_base = key_base
        self.hub_bc = hub_bc
        self.hub_ids = hub_ids

    def count(self, flat, starts, degs, i_lo, i_hi, timings=None) -> int:
        return wk.count_triangles_block(
            flat,
            starts,
            degs,
            i_lo,
            i_hi,
            self.keys_bc.value,
            self.key_base,
            self.hub_bc.value if self.hub_bc is not None else None,
            self.hub_ids,
            timings=timings,
        )

    def count_arrow(self, centers, flat, starts, degs, timings=None) -> int:
        return wk.count_arrow_block(
            centers,
            flat,
            starts,
            degs,
            self.keys_bc.value,
            self.key_base,
            self.hub_bc.value if self.hub_bc is not None else None,
            self.hub_ids,
            timings=timings,
        )


def _runs(src: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run-length encode a sorted src column → (starts, lengths)."""
    change = np.flatnonzero(src[1:] != src[:-1])
    starts = np.concatenate([[0], change + 1]).astype(np.int64)
    degs = np.diff(np.append(starts, len(src))).astype(np.int64)
    return starts, degs


# Every count UDF emits one row per partition with the triangle count
# plus the get/evaluate CPU-second split (reference accounting,
# experiments/tc_cycles.cu:1089-1137); the splits are summed across
# tasks, so they are CPU seconds and may exceed wall time.
COUNT_SCHEMA = "tri long, enum_sec double, probe_sec double"


def _timed_row(total: int, timings: dict) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "tri": [total],
            "enum_sec": [timings.get("enum_sec", 0.0)],
            "probe_sec": [timings.get("probe_sec", 0.0)],
        }
    )


def _flat_count_udf(probe: _Probe):
    """Count wedges closing over partitions of (src, dst) rows sorted by
    (src, dst) — the partition is consumed as columnar CSR directly.
    Arrow batches may split a vertex's adjacency; a carry buffer defers
    the trailing (possibly incomplete) vertex run to the next batch."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry_s = carry_d = None
        total = 0
        timings: dict = {}

        def process(src: np.ndarray, dst: np.ndarray) -> int:
            starts, degs = _runs(src)
            return probe.count(
                dst, starts, degs, np.zeros(len(degs), np.int64), degs - 1, timings
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
        yield _timed_row(total, timings)

    return run


def _flat_count_sym_udf(probe: _Probe, lookup_bc):
    """Flat-lane count straight over the SYMMETRIC edge table (fused
    path): the degree-order orientation filter and the hub-center skip
    run inside the UDF against a broadcast degree dictionary
    (`lookup_bc`: sorted ids / degree / is_hub arrays), so the count job
    needs no degree joins at all. A vertex's symmetric adjacency is
    contiguous in the hash(src)-clustered sorted partition; the filtered
    subset (its oriented adjacency) stays contiguous and sorted, so the
    CSR carry logic is identical to `_flat_count_udf` — the carry runs
    on RAW rows, the filter on each completed run."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry_s = carry_d = None
        total = 0
        timings: dict = {}
        look = lookup_bc.value
        ids, deg, is_hub = look["ids"], look["deg"], look["is_hub"]

        def process(src: np.ndarray, dst: np.ndarray) -> int:
            si = np.searchsorted(ids, src)
            di = np.searchsorted(ids, dst)
            ds, dd = deg[si], deg[di]
            keep = ((ds < dd) | ((ds == dd) & (src < dst))) & ~is_hub[si]
            src, dst = src[keep], dst[keep]
            if len(src) == 0:
                return 0
            starts, degs = _runs(src)
            return probe.count(
                dst, starts, degs, np.zeros(len(degs), np.int64), degs - 1, timings
            )

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
                total += process(src[:boundary], dst[:boundary])
            carry_s, carry_d = src[boundary:], dst[boundary:]
        if carry_s is not None and len(carry_s):
            total += process(carry_s, carry_d)
        yield _timed_row(total, timings)

    return run


def _array_count_udf(probe: _Probe):
    """Count wedges for chunk rows (v, adj, deg, i_lo, i_hi) — the hub
    lane and the vertex strategy."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        total = 0
        timings: dict = {}
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
                timings,
            )
        yield _timed_row(total, timings)

    return run


def _arrow_count_udf(probe: _Probe):
    """Count path-wedges for rows (src, adj) where adj = adj(dst) of an
    oriented edge (src, dst) — the arrow strategy's evaluate step
    (experiments/tc_arrow.cu:345-371)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        total = 0
        timings: dict = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            degs = np.array([len(a) for a in pdf["adj"].values], dtype=np.int64)
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in pdf["adj"].values]
            ) if degs.sum() else np.empty(0, np.int64)
            starts = np.cumsum(degs) - degs
            centers = pdf["src"].values.astype(np.int64, copy=False)
            total += probe.count_arrow(centers, flat, starts, degs, timings)
        yield _timed_row(total, timings)

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


def _emit_pairs_arrow_udf():
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            degs = np.array([len(a) for a in pdf["adj"].values], dtype=np.int64)
            if degs.sum() == 0:
                continue
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in pdf["adj"].values]
            )
            w = np.repeat(pdf["src"].values.astype(np.int64, copy=False), degs)
            yield pd.DataFrame({"src": w, "dst": flat})

    return run


def _collect_long_cols(df: DataFrame, a: str, b: str) -> tuple[np.ndarray, np.ndarray]:
    """Collect two long columns as numpy arrays via Arrow batches
    (no pandas object overhead — ADVICE round 1, _build_probe item)."""
    sel = df.select(a, b)
    try:
        tbl = sel.toArrow()
        return (
            tbl.column(a).to_numpy(zero_copy_only=False).astype(np.int64, copy=False),
            tbl.column(b).to_numpy(zero_copy_only=False).astype(np.int64, copy=False),
        )
    except Exception:  # pragma: no cover — Arrow path unavailable
        pdf = sel.toPandas()
        return (
            pdf[a].values.astype(np.int64),
            pdf[b].values.astype(np.int64),
        )


def _numpy_top_hub_ids(src: np.ndarray, dst: np.ndarray, hub_k: int) -> np.ndarray:
    """Top-hub_k vertex ids by (symmetric degree, id) computed from the
    collected oriented edge arrays — each undirected edge appears once,
    so occurrence count across src∪dst IS the symmetric degree.

    Dense-domain fast path: when the id range is comparable to the
    edge count (always true after rank-relabel, and for contiguous web
    graphs), two O(m) `np.bincount` passes (summed — no 2m concatenate
    copy) replace the sort-based `np.unique` over 2m elements —
    measured ~6x faster on the 32x amplified probe build (copy-phase
    probe r5-n follow-up: 0.6 s vs 4.1 s at 38.4M elements / 6.4M id
    domain). Sparse id domains (raw 64-bit hash ids) fall back to
    np.unique, since a bincount array sized by max_id would explode.
    Selection semantics are identical in both paths: top hub_k by
    (count, id)."""
    if len(src) and len(dst):
        max_id = max(int(src.max()), int(dst.max()))
        min_id = min(int(src.min()), int(dst.min()))
    else:  # degenerate input — the unique path handles it cheaply
        max_id, min_id = 0, -1
    # same absolute 1<<28 cap as build_hub_bitmap (ADVICE r5): without
    # it a sparse-but-in-range id domain could transiently allocate
    # ~64 B/edge of bincount buffers at the BROADCAST_MAX_EDGES scale
    if 0 <= min_id and max_id <= min(
        max(4 * (len(src) + len(dst)), 1 << 20), 1 << 28
    ):
        counts_all = np.bincount(src, minlength=max_id + 1)
        counts_all += np.bincount(dst, minlength=max_id + 1)
        present = np.nonzero(counts_all)[0]
        if len(present) > hub_k:
            counts = counts_all[present]
            # O(n) prefilter to the count threshold, then lexsort only
            # the candidate set (hub_k + count-ties) — same top hub_k
            # by (count, id) as the full lexsort in the sparse path
            kth = np.partition(counts, len(counts) - hub_k)[len(counts) - hub_k]
            cand = counts >= kth
            present, counts = present[cand], counts[cand]
            order = np.lexsort((present, counts))[-hub_k:]
            present = present[order]
        return np.sort(present.astype(src.dtype, copy=False))
    ids, counts = np.unique(np.concatenate([src, dst]), return_counts=True)
    if len(ids) > hub_k:
        order = np.lexsort((ids, counts))[-hub_k:]
        ids = ids[order]
    return np.sort(ids)


def _build_probe(
    spark: SparkSession,
    oriented: DataFrame,
    key_base: int,
    hub_k: int,
) -> _Probe:
    if key_base * key_base > 2**62:
        raise ValueError("vertex domain too large for int64 edge keys")
    src, dst = _collect_long_cols(oriented, "src", "dst")
    edge_keys = wk.build_edge_keys(src, dst, key_base)
    hub_bc = None
    hub_ids = None
    if hub_k and hub_k > 0 and len(src):
        # the probe arrays are already in driver memory (the broadcast
        # path caps them at BROADCAST_MAX_EDGES), so a numpy top-k is
        # strictly cheaper than a Spark degree re-aggregation job —
        # the copy phase stays free of extra cluster actions
        hub_ids = _numpy_top_hub_ids(src, dst, hub_k)
        bitmap = wk.build_hub_bitmap(src, dst, hub_ids)
        hub_bc = spark.sparkContext.broadcast(bitmap)
    keys_bc = spark.sparkContext.broadcast(edge_keys)
    return _Probe(keys_bc, key_base, hub_bc, hub_ids)


# Max flat adjacency elements the driver may materialize when building
# hub chunks from the already-collected edge arrays (~400 MB of int64).
# Chunk rows duplicate the adjacency per chunk, the same duplication the
# distributed _split_chunks explode pays in shuffle volume; beyond the
# cap the fully distributed hub lane takes over.
HUB_DRIVER_CHUNK_ELEMS = 50_000_000


def _orientation_arrays(a: np.ndarray, b: np.ndarray):
    """Degree/orientation prep from collected canonical (a<b) edges —
    the whole reference preprocess (degree count, degree-order
    orientation, tc.cu:660-751) as numpy over arrays already resident
    in driver memory, so the fused path needs NO extra Spark job for
    stats, hubs, or the probe."""
    ids, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
    ia = np.searchsorted(ids, a)
    ib = np.searchsorted(ids, b)
    da, db = cnt[ia], cnt[ib]
    a_first = (da < db) | ((da == db) & (a < b))
    src_o = np.where(a_first, a, b)
    dst_o = np.where(a_first, b, a)
    pos_o = np.where(a_first, ia, ib)
    outdeg = np.bincount(pos_o, minlength=len(ids))
    return ids, cnt, src_o, dst_o, pos_o, outdeg


def _hub_chunk_rows(
    src_o: np.ndarray,
    dst_o: np.ndarray,
    pos_o: np.ndarray,
    hub_flag: np.ndarray,
    split_budget: int,
):
    """Hub-lane chunk rows (v, adj, deg, i_lo, i_hi) built driver-side
    from the collected oriented arrays (no Spark jobs — the fused
    analogue of adjacency()+_split_chunks). Returns (pa.Table, None),
    (None, None) when there is no hub work, or (None, est_elems) when
    materializing the rows would exceed HUB_DRIVER_CHUNK_ELEMS.

    Fully vectorized (numpy repeat/cumsum) and shipped as an Arrow
    table: at the 50M-element cap the old per-hub Python loop built
    several GB of boxed ints and paid pickling on top (ADVICE r3) —
    the Arrow path materializes exactly the ~8 B/element it budgets
    for and enters Spark through zero-copy createDataFrame."""
    import pyarrow as pa

    hmask = hub_flag[pos_o]
    hs, hd = src_o[hmask], dst_o[hmask]
    if len(hs) == 0:
        return None, None
    order = np.lexsort((hd, hs))
    hs, hd = hs[order], hd[order]
    starts, degs = _runs(hs)
    keep = degs >= 2  # a 1-edge hub spawns no wedges
    starts, degs = starts[keep], degs[keep]
    if len(starts) == 0:
        return None, None
    widths = np.maximum(1, split_budget // degs)
    n_chunks = (degs - 2) // widths + 1  # len(range(0, deg-1, c))
    est = int((n_chunks * degs).sum())
    if est > HUB_DRIVER_CHUNK_ELEMS:
        return None, est
    # one row per chunk: map each chunk to its hub, then its (lo, hi)
    # window from the chunk's ordinal within the hub
    hub_of = np.repeat(np.arange(len(starts)), n_chunks)
    first = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    within = np.arange(len(hub_of), dtype=np.int64) - first
    lo = within * widths[hub_of]
    hi = np.minimum(lo + widths[hub_of], degs[hub_of] - 1)
    # adjacency values: every chunk row carries its hub's full sorted
    # adjacency — the same duplication the distributed _split_chunks
    # explode pays in shuffle volume
    d_of = degs[hub_of]
    val_first = np.repeat(np.cumsum(d_of) - d_of, d_of)
    val_pos = np.arange(int(d_of.sum()), dtype=np.int64) - val_first
    values = hd[np.repeat(starts[hub_of], d_of) + val_pos]
    offsets = np.concatenate(([0], np.cumsum(d_of)))
    adj = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int64())
    )
    table = pa.table(
        {
            "v": pa.array(hs[starts][hub_of], type=pa.int64()),
            "adj": adj,
            "deg": pa.array(d_of, type=pa.int64()),
            "i_lo": pa.array(lo, type=pa.int64()),
            "i_hi": pa.array(hi, type=pa.int64()),
        }
    )
    return table, None


def _wedge_fused(
    spark: SparkSession,
    edges: DataFrame,
    hub_k: int,
    split_budget: int,
    partitions: int | None,
    caches: list,
    mark,
    phase_metrics: dict | None,
    max_collect_edges: int | None = None,
    info: dict | None = None,
) -> DataFrame | None:
    """Collect-fused wedge count (broadcast-closure regime): TWO
    edge-sized jobs total instead of four.

    - job 1: the single symmetrize/dedup shuffle, terminated by an
      Arrow collect of the canonical (src<dst) half — the probe copy.
      Degrees, stats, orientation, hub detection and the hub bitmap are
      all derived from the collected arrays in numpy (zero extra jobs;
      the ids were already resident, same argument as the r2 numpy
      top-k).
    - job 2: the count — the flat lane reads the cached symmetric
      table (still hash(src)-clustered from the one shuffle), applies
      the degree-order orientation + hub skip INSIDE the vectorized UDF
      via a broadcast degree dictionary (no degree joins), and the hub
      lane (if any) runs over driver-built chunk rows.

    Returns None when the fused path cannot apply (vertex ids overflow
    int64 edge keys) — the caller falls back to the relabel pipeline.
    The broadcast degree dictionary is ~24 B/vertex; in the regime this
    path gates on (≤30M collected edges) that is ≤ ~1.5 GB worst case
    and typically far less, the same order as the edge-key broadcast
    itself."""
    from .graph import build_sym_clustered, orient_from_sym

    npart = partitions or spark.sparkContext.defaultParallelism
    sym = build_sym_clustered(edges, npart).persist()
    caches.append(sym)
    mark("prep_sec")

    a, b = _collect_long_cols(sym.filter(F.col("src") < F.col("dst")), "src", "dst")
    m = len(a)
    if max_collect_edges is not None and m > max_collect_edges:
        # optimistic entry (statistics-gated, no exact count): the
        # actual canonical edge count exceeds the broadcast-closure
        # budget — abort to the distributed pipeline
        if info is not None:
            info["abort"] = "rows"
        return None
    if m == 0:
        mark("build_sec")
        out = _finish(
            spark.createDataFrame([(0, 0.0, 0.0)], COUNT_SCHEMA),
            caches,
            spark,
            phase_metrics,
        )
        mark("exec_sec")
        return out
    key_base = int(max(a.max(), b.max())) + 1
    if key_base * key_base > 2**62:
        if info is not None:
            info["abort"] = "keys"
        return None  # caller unpersists and takes the relabel pipeline

    ids, cnt, src_o, dst_o, pos_o, outdeg = _orientation_arrays(a, b)
    stats = {
        "n": int(len(ids)),
        "max_id": key_base - 1,
        "m_oriented": m,
        "max_degree": int(cnt.max()),
    }
    hub_min_deg = int((2 * split_budget) ** 0.5) + 2
    hub_flag = outdeg >= hub_min_deg

    sc = spark.sparkContext
    edge_keys = wk.build_edge_keys(a, b, key_base)
    hub_ids = _numpy_top_hub_ids(a, b, hub_k) if hub_k and hub_k > 0 else None
    hub_bc = (
        sc.broadcast(wk.build_hub_bitmap(a, b, hub_ids))
        if hub_ids is not None and len(hub_ids)
        else None
    )
    probe = _Probe(sc.broadcast(edge_keys), key_base, hub_bc, hub_ids)

    hub_tbl = None
    est = None
    if bool(hub_flag.any()):
        hub_tbl, est = _hub_chunk_rows(src_o, dst_o, pos_o, hub_flag, split_budget)
        if hub_tbl is None and est is not None:
            # pathological hub mass: keep the fully distributed hub
            # machinery (join routing + explode splitting + wedge_range
            # balance), reusing the probe and stats already in hand
            oriented = orient_from_sym(sym, npart, stats["n"]).persist()
            caches.append(oriented)
            mark("build_sec")
            result = _wedge_count(
                spark,
                oriented,
                key_base,
                None,
                closure="broadcast",
                hub_k=hub_k,
                split_budget=split_budget,
                partitions=partitions,
                clustered_by_src=True,
                partitioner="auto",
                caches=caches,
                stats=stats,
                probe=probe,
            )
            out = _finish(result, caches, spark, phase_metrics)
            mark("exec_sec")
            return out

    lookup_bc = sc.broadcast({"ids": ids, "deg": cnt, "is_hub": hub_flag})
    mark("build_sec")

    flat = sym.sortWithinPartitions("src", "dst")
    counts = flat.mapInPandas(_flat_count_sym_udf(probe, lookup_bc), schema=COUNT_SCHEMA)
    if hub_tbl is not None:
        # Arrow table → DataFrame is zero-copy on the driver side
        # (no Python row boxing / pickling; ADVICE r3)
        hub_df = spark.createDataFrame(hub_tbl).repartition(npart, "v", "i_lo")
        counts = counts.unionByName(
            hub_df.mapInPandas(_array_count_udf(probe), schema=COUNT_SCHEMA)
        )
    out = _finish(_sum_counts(counts), caches, spark, phase_metrics)
    mark("exec_sec")
    return out


def _canonical(oriented: DataFrame) -> DataFrame:
    """Edge set canonicalized by id (src < dst) for semi-join closure —
    orientation order (degree) and id order differ in the fast-prep
    space."""
    return oriented.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )


def _wedge_range_flat(
    flat_edges: DataFrame, odeg: DataFrame, npart: int, caches: list
) -> DataFrame:
    """Range-partition the flat lane by the global cumulative WEDGE
    count (SURVEY §2.11 / tc.cu:348-361: equal wedges per worker).

    Each vertex gets pid = floor(cum_wedges * npart / total); edges
    join the (vertex → pid) map and repartitionByRange on pid, so the
    physical partitioning is RangePartitioning with near-equal wedge
    mass (vertex-atomic; residual imbalance ≤ split_budget per vertex
    because heavier vertices were routed to the hub lane)."""
    from .ids import attach_cumulative_weight

    w = odeg.select(
        "src",
        (F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("wedges"),
    )
    cw, total = attach_cumulative_weight(w, ["src"], "wedges", "cum", caches=caches)
    if total <= 0:
        return flat_edges.repartition(npart, "src").sortWithinPartitions("src", "dst")
    pid_map = cw.select(
        "src",
        F.floor(F.col("cum") * npart / total).cast("int").alias("pid"),
    )
    # no broadcast hint: the pid map has one row per flat vertex (too
    # big to force-broadcast at web scale); AQE picks broadcast at
    # runtime when the map side is actually small
    tagged = flat_edges.join(pid_map, "src")
    return (
        tagged.repartitionByRange(npart, "pid")
        .sortWithinPartitions("src", "dst")
        .select("src", "dst")
    )


def _wedge_count(
    spark: SparkSession,
    oriented: DataFrame,
    key_base: int,
    deg: DataFrame,
    closure: str,
    hub_k: int,
    split_budget: int,
    partitions: int | None,
    clustered_by_src: bool,
    partitioner: str,
    caches: list,
    stats: dict | None,
    probe: _Probe | None = None,
) -> DataFrame:
    """Two-lane wedge-parallel count over degree-oriented edges.
    `probe`, if given, is a pre-built closure probe (the fused path
    builds it from its own Arrow collect — no second collect here)."""
    npart = partitions or spark.sparkContext.defaultParallelism

    hub_min_deg = int((2 * split_budget) ** 0.5) + 2
    odeg = oriented.groupBy("src").agg(F.count("*").alias("deg"))
    if stats is not None:
        # the fast prep's single stats action already produced every
        # scalar: m drives the closure choice; max SYMMETRIC degree
        # bounds the max out-degree, so max_degree < hub_min_deg
        # proves the hub lane empty with NO extra job. When hubs are
        # possible the lane is built unconditionally (maybe empty) —
        # routing stays a join either way, never a driver id list.
        m = stats["m_oriented"]
        maybe_hubs = stats["max_degree"] >= hub_min_deg
        # gate the routing broadcast on the HUB count like the relabel
        # path (ADVICE r2): Σ outdeg = m bounds the number of vertices
        # with outdeg >= hub_min_deg by m / hub_min_deg, so a large
        # graph with few hubs still broadcasts — no extra job needed
        route_broadcast = (
            stats["n"] <= HUB_ROUTE_BROADCAST_MAX
            or m // hub_min_deg <= HUB_ROUTE_BROADCAST_MAX
        )
    else:
        # relabel path: one stats job over the persisted oriented set
        st = odeg.agg(
            F.coalesce(F.sum("deg"), F.lit(0)).alias("m"),
            F.coalesce(
                F.sum(F.when(F.col("deg") >= hub_min_deg, 1).otherwise(0)), F.lit(0)
            ).alias("n_hubs"),
        ).collect()[0]
        m = st["m"]
        maybe_hubs = st["n_hubs"] > 0
        route_broadcast = st["n_hubs"] <= HUB_ROUTE_BROADCAST_MAX

    flat_edges = oriented
    hub_chunks = None
    if maybe_hubs:
        hubs = odeg.filter(F.col("deg") >= hub_min_deg).select("src")
        if route_broadcast:
            hubs = F.broadcast(hubs)
        flat_edges = oriented.join(hubs, "src", "left_anti")
        hub_edges = oriented.join(hubs, "src", "left_semi")
        hub_adj = adjacency(hub_edges)
        hub_chunks = _split_chunks(hub_adj, split_budget).repartition(
            npart, "v", "i_lo"
        )

    if partitioner == "auto":
        # skew-aware choice: a graph whose max degree reaches the hub
        # threshold is in the power-law regime where hash-by-src also
        # misplaces MID-degree vertices — the wedge-balanced range
        # partition measured 1.8x faster there (COVERAGE.md §2.11);
        # otherwise keep the zero-exchange hash clustering from prep
        partitioner = "wedge_range" if maybe_hubs else "hash"

    if partitioner == "wedge_range":
        flat_odeg = (
            odeg.filter(F.col("deg") < hub_min_deg) if maybe_hubs else odeg
        )
        flat_parted = _wedge_range_flat(flat_edges, flat_odeg, npart, caches)
    elif clustered_by_src and partitions is None:
        # fast prep already hash-clustered the edges by src — the CSR
        # lane needs only an in-partition sort, NO exchange
        flat_parted = flat_edges.sortWithinPartitions("src", "dst")
    else:
        flat_parted = flat_edges.repartition(npart, "src").sortWithinPartitions(
            "src", "dst"
        )

    if closure == "auto":
        closure = "broadcast" if m <= BROADCAST_MAX_EDGES else "join"

    if closure == "broadcast":
        if probe is None:
            probe = _build_probe(spark, oriented, key_base, hub_k)
        counts = flat_parted.mapInPandas(_flat_count_udf(probe), schema=COUNT_SCHEMA)
        if hub_chunks is not None:
            counts = counts.unionByName(
                hub_chunks.mapInPandas(_array_count_udf(probe), schema=COUNT_SCHEMA)
            )
        return _sum_counts(counts)

    # Distributed closure: emit candidate pairs (canonical by id),
    # LEFT SEMI against the canonicalized edge set.
    pairs = flat_parted.mapInPandas(_emit_pairs_flat_udf(), schema="src long, dst long")
    if hub_chunks is not None:
        pairs = pairs.unionByName(
            hub_chunks.mapInPandas(_emit_pairs_array_udf(), schema="src long, dst long")
        )
    closed = pairs.join(_canonical(oriented), ["src", "dst"], "left_semi")
    return closed.agg(F.count("*").alias("triangles"))


def _prep(
    edges: DataFrame,
    prep: str,
    rank_method: str,
    npart: int | None,
    caches: list,
) -> tuple[DataFrame, DataFrame, int, bool, dict | None]:
    """Preprocess → (oriented, degree table (v, degree), key_base,
    clustered_by_src, stats|None). prep="fast" fuses everything onto
    one shuffle in original id space and returns its free stats;
    prep="relabel" is the rank-space pipeline (used when ids don't fit
    integer edge keys, or on request)."""
    if prep in ("auto", "fast"):
        oriented, deg, n, max_id, stats = prepare_oriented_fast(
            edges, npart, caches=caches
        )
        if prep == "fast" or (max_id + 1) ** 2 <= 2**62:
            return oriented, deg, max_id + 1, True, stats
        for c in caches:
            c.unpersist()
        caches.clear()
    oriented, ranks, n = prepare_oriented(edges, rank_method=rank_method, caches=caches)
    # rank space: degree rank IS the id order, so the degree table for
    # the hub bitmap is just (rank, rank) — top-k ranks = top-k degrees
    deg = ranks.select(F.col("rank").alias("v"), F.col("rank").alias("degree"))
    return oriented, deg, n, False, None


def _sum_counts(counts: DataFrame) -> DataFrame:
    """Global reduction of per-partition (tri, enum_sec, probe_sec)."""
    return counts.agg(
        F.coalesce(F.sum("tri"), F.lit(0)).alias("triangles"),
        F.coalesce(F.sum("enum_sec"), F.lit(0.0)).alias("enum_sec"),
        F.coalesce(F.sum("probe_sec"), F.lit(0.0)).alias("probe_sec"),
    )


def _finish(
    result: DataFrame,
    caches: list,
    spark: SparkSession,
    phase_metrics: dict | None = None,
) -> DataFrame:
    """Run the terminal action, release every persisted intermediate
    (ADVICE round 1: library callers otherwise accumulate cached blocks
    across queries), and return a stable 1-row frame. When the result
    row carries the enumerate/probe CPU split (broadcast-closure lanes),
    surface it in `phase_metrics` (tc_cycles' get/evaluate accounting)."""
    row = result.collect()[0]
    val = int(row[0])
    if phase_metrics is not None and "enum_sec" in row.__fields__:
        # 6 decimals: a sub-50µs probe on a tiny graph must not round
        # to 0.0 (ADVICE r3: the 4-decimal round made the phase-split
        # test flake on fast hardware)
        phase_metrics["enumerate_cpu_sec"] = round(float(row["enum_sec"]), 6)
        phase_metrics["probe_cpu_sec"] = round(float(row["probe_sec"]), 6)
    for c in caches:
        try:
            c.unpersist()
        except Exception:  # pragma: no cover
            pass
    return spark.createDataFrame([(val,)], "triangles long")


def triangle_count(
    edges: DataFrame,
    strategy: str = "wedge",
    closure: str = "auto",
    rank_method: str = "scalable",
    hub_k: int = 8192,
    split_budget: int = 1 << 18,
    partitions: int | None = None,
    partitioner: str = "auto",
    prep: str = "auto",
    phase_metrics: dict | None = None,
) -> DataFrame:
    """Exact global triangle count of the undirected simple graph
    induced by a (possibly dirty) edge DataFrame [src, dst].

    Returns an eagerly computed 1-row DataFrame [triangles: long];
    intermediates are unpersisted before returning. `phase_metrics`,
    if given, is filled with driver-side wall times for the prep /
    probe-build / exec phases (the reference's accounting split,
    tc.cu:886-913)."""
    spark = edges.sparkSession
    caches: list = []
    t0 = time.perf_counter()

    def mark(key: str) -> None:
        if phase_metrics is not None:
            nonlocal t0
            now = time.perf_counter()
            phase_metrics[key] = round(
                phase_metrics.get(key, 0.0) + (now - t0), 4
            )
            t0 = now

    if strategy == "wedge":
        # Collect-fused fast path (VERDICT r2 item 5): in the broadcast-
        # closure regime the probe collect IS the prep action — one
        # edge shuffle + one count job, no stats job, no degree joins.
        # The closure="auto" gate is three-regime (r6, VERDICT item 3):
        # a small Catalyst size estimate enters fused with NO gate job
        # (the collected row count is re-checked, so a bad estimate
        # aborts to the distributed pipeline instead of overflowing the
        # broadcast budget), a huge estimate skips fused with no job,
        # and only the gray zone pays the exact input count() the old
        # gate ran unconditionally. Explicit closure="broadcast" skips
        # the gate entirely.
        use_fused = (
            prep in ("auto", "fast")
            and partitioner in ("auto", "hash")
            and closure in ("auto", "broadcast")
        )
        max_collect = None
        if use_fused and closure == "auto":
            est = _plan_size_bytes(edges)
            if est is not None and est <= FUSED_STATS_SAFE_BYTES:
                max_collect = BROADCAST_MAX_EDGES
            elif est is not None and est >= FUSED_STATS_SKIP_BYTES:
                use_fused = False
            else:
                use_fused = edges.count() <= BROADCAST_MAX_EDGES
        if use_fused:
            fused_info: dict = {}
            out = _wedge_fused(
                spark,
                edges,
                hub_k=hub_k,
                split_budget=split_budget,
                partitions=partitions,
                caches=caches,
                mark=mark,
                phase_metrics=phase_metrics,
                max_collect_edges=max_collect,
                info=fused_info,
            )
            if out is not None:
                return out
            # release the fused attempt, then: vertex ids overflowing
            # int64 edge keys fall to the relabel pipeline; a row-count
            # overflow (optimistic statistics entry) keeps the fast
            # prep — its stats job re-derives m and closure="auto"
            # routes to the distributed semi-join lane
            for c in caches:
                c.unpersist()
            caches.clear()
            if fused_info.get("abort") != "rows":
                prep = "relabel" if prep == "auto" else prep

    if strategy in ("wedge", "arrow", "vertex"):
        oriented, deg, key_base, clustered, stats = _prep(
            edges, prep, rank_method, partitions, caches
        )
        oriented = oriented.persist()
        caches.append(oriented)
        mark("prep_sec")

        if strategy == "wedge":
            result = _wedge_count(
                spark,
                oriented,
                key_base,
                deg,
                closure=closure,
                hub_k=hub_k,
                split_budget=split_budget,
                partitions=partitions,
                clustered_by_src=clustered,
                partitioner=partitioner,
                caches=caches,
                stats=stats,
            )
            mark("build_sec")
            out = _finish(result, caches, spark, phase_metrics)
            mark("exec_sec")
            return out

        if strategy == "arrow":
            # path-wedge: edges (v,w) ⋈ adjacency(w) — the relational
            # analogue of tc_arrow's two-level prefix index; adjacency
            # grouping shuffles by v, the join shuffles edges by dst
            # (both unavoidable: the strategy's unit of work is the
            # (in-edge, out-adjacency) pair)
            adj = adjacency(oriented).select(
                F.col("v").alias("dst"), F.col("adj").alias("adj")
            )
            paths = oriented.join(adj, "dst").select("src", "adj")
            if closure == "auto":
                m = stats["m_oriented"] if stats is not None else oriented.count()
                closure = "broadcast" if m <= BROADCAST_MAX_EDGES else "join"
            if closure == "broadcast":
                probe = _build_probe(spark, oriented, key_base, hub_k)
                mark("build_sec")
                per_part = paths.mapInPandas(_arrow_count_udf(probe), schema=COUNT_SCHEMA)
                result = _sum_counts(per_part)
            else:
                mark("build_sec")
                pairs = paths.mapInPandas(
                    _emit_pairs_arrow_udf(), schema="src long, dst long"
                )
                canon = pairs.select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                )
                result = canon.join(
                    _canonical(oriented), ["src", "dst"], "left_semi"
                ).agg(F.count("*").alias("triangles"))
            out = _finish(result, caches, spark, phase_metrics)
            mark("exec_sec")
            return out

        # strategy == "vertex"
        adj = adjacency(oriented)
        rows = adj.filter(F.col("deg") >= 2).select(
            "v",
            "adj",
            "deg",
            F.lit(0).alias("i_lo"),
            (F.col("deg") - 1).alias("i_hi"),
        )
        if closure == "auto":
            m = stats["m_oriented"] if stats is not None else oriented.count()
            closure = "broadcast" if m <= BROADCAST_MAX_EDGES else "join"
        if closure == "broadcast":
            probe = _build_probe(spark, oriented, key_base, 0)
            mark("build_sec")
            per_part = rows.mapInPandas(_array_count_udf(probe), schema=COUNT_SCHEMA)
            result = _sum_counts(per_part)
        else:
            mark("build_sec")
            pairs = rows.mapInPandas(_emit_pairs_array_udf(), schema="src long, dst long")
            result = pairs.join(_canonical(oriented), ["src", "dst"], "left_semi").agg(
                F.count("*").alias("triangles")
            )
        out = _finish(result, caches, spark, phase_metrics)
        mark("exec_sec")
        return out

    if strategy in ("edge", "join"):
        oriented, _deg, _kb, _cl, _st = _prep(edges, prep, rank_method, partitions, caches)
        oriented = oriented.persist()
        caches.append(oriented)
        mark("prep_sec")

        if strategy == "edge":
            # persisted: BOTH endpoint joins consume the grouped
            # adjacency — unpersisted, each branch re-runs the
            # collect_list aggregation over the oriented cache (r6)
            adj = adjacency(oriented).persist()
            caches.append(adj)
            a_src = adj.select(F.col("v").alias("src"), F.col("adj").alias("adj_src"))
            a_dst = adj.select(F.col("v").alias("dst"), F.col("adj").alias("adj_dst"))
            per_edge = (
                oriented.join(a_src, "src")
                .join(a_dst, "dst")
                .select(F.size(F.array_intersect("adj_src", "adj_dst")).alias("c"))
            )
            result = per_edge.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("triangles"))
        else:
            e1 = oriented.alias("e1")
            e2 = oriented.alias("e2")
            e3 = oriented.alias("e3")
            tri = e1.join(e2, F.col("e1.dst") == F.col("e2.src")).join(
                e3,
                (F.col("e1.src") == F.col("e3.src"))
                & (F.col("e2.dst") == F.col("e3.dst")),
                "left_semi",
            )
            result = tri.agg(F.count("*").alias("triangles"))
        out = _finish(result, caches, spark, phase_metrics)
        mark("exec_sec")
        return out

    raise ValueError(f"unknown strategy {strategy!r}")


def wedge_stats(edges: DataFrame) -> DataFrame:
    """Graph summary: n, m (oriented), total wedges of the oriented
    graph, max degree — the reference's sample_degrees report
    (experiments/sample_degrees.cu:505-560)."""
    caches: list = []
    oriented, deg, _kb, _cl, _st = _prep(edges, "fast", "scalable", None, caches)
    odeg = oriented.groupBy(F.col("src")).agg(F.count("*").alias("degree"))
    stats_sym = deg.agg(F.count("*").alias("n"), F.max("degree").alias("max_degree"))
    stats_or = odeg.agg(
        F.coalesce(F.sum("degree"), F.lit(0)).alias("m_oriented"),
        F.coalesce(
            F.sum(F.expr("degree * (degree - 1) / 2").cast("long")), F.lit(0)
        ).alias("total_wedges"),
    )
    out = stats_sym.crossJoin(stats_or).select(
        "n", "m_oriented", "total_wedges", "max_degree"
    )
    rows = out.collect()
    for c in caches:
        c.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(rows, out.schema)
