"""Triangle-count correctness: golden graphs, cross-strategy agreement
(the reference's 12 binaries cross-check, SURVEY §5), relabel
invariance, and random-graph differential tests."""

from __future__ import annotations

import random

import pytest

from wedge_parallel_triangle_counting_spark.operators.triangles import (
    triangle_count,
    wedge_stats,
)

from .conftest import GOLDEN_TRIANGLES, edges_df

STRATEGIES = ["wedge", "arrow", "vertex", "edge", "join"]


@pytest.mark.parametrize("name", sorted(GOLDEN_TRIANGLES))
@pytest.mark.parametrize("strategy", STRATEGIES)
def test_golden(spark, name, strategy):
    pairs, expected = GOLDEN_TRIANGLES[name]
    got = triangle_count(edges_df(spark, pairs), strategy=strategy).collect()[0][0]
    assert got == expected, (name, strategy)


def _brute_triangles(pairs):
    adj = {}
    und = set()
    for a, b in pairs:
        if a != b:
            und.add((min(a, b), max(a, b)))
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sum(
        1
        for a, b in und
        for c in adj[a] & adj[b]
        if c > b
    )


def _random_graph(seed, n, m):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


@pytest.mark.parametrize("seed", [1, 7])
def test_random_graph_all_strategies_agree(spark, seed):
    pairs = _random_graph(seed, 60, 400)
    expected = _brute_triangles(pairs)
    df = edges_df(spark, pairs)
    for strategy in STRATEGIES:
        got = triangle_count(df, strategy=strategy).collect()[0][0]
        assert got == expected, strategy


def test_relabel_invariance(spark):
    # count invariant under vertex relabeling (SURVEY §5 property test)
    pairs = _random_graph(3, 40, 200)
    base = triangle_count(edges_df(spark, pairs)).collect()[0][0]
    shifted = [(a * 13 + 1000, b * 13 + 1000) for a, b in pairs]
    assert triangle_count(edges_df(spark, shifted)).collect()[0][0] == base


def test_wedge_small_split_budget(spark):
    # hub splitting correctness: force many chunks per vertex
    pairs = _random_graph(11, 30, 300)
    expected = _brute_triangles(pairs)
    got = triangle_count(
        edges_df(spark, pairs), strategy="wedge", split_budget=4, hub_k=8
    ).collect()[0][0]
    assert got == expected


def test_wedge_range_partitioner(spark):
    # wedge-balanced range partitioning (tc.cu:348-361 analogue) must
    # agree with the default hash clustering, including with hubs split
    pairs = _random_graph(17, 40, 500)
    expected = _brute_triangles(pairs)
    df = edges_df(spark, pairs)
    got = triangle_count(df, strategy="wedge", partitioner="wedge_range").collect()[0][0]
    assert got == expected
    got = triangle_count(
        df, strategy="wedge", partitioner="wedge_range", split_budget=8
    ).collect()[0][0]
    assert got == expected


def test_prep_paths_agree(spark):
    # fast (no-relabel) and relabel preprocessing are interchangeable
    pairs = _random_graph(19, 50, 400)
    df = edges_df(spark, pairs)
    fast = triangle_count(df, strategy="wedge", prep="fast").collect()[0][0]
    relab = triangle_count(df, strategy="wedge", prep="relabel").collect()[0][0]
    assert fast == relab == _brute_triangles(pairs)


def test_no_cached_blocks_leak(spark):
    # ADVICE round 1: triangle_count must release its persisted
    # intermediates after the terminal action (other tests' module
    # fixtures may hold persists, so assert on the DELTA)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    pairs = _random_graph(23, 30, 200)
    triangle_count(edges_df(spark, pairs)).collect()
    assert jsc.getPersistentRDDs().size() == before


def test_arrow_join_closure(spark):
    pairs = _random_graph(29, 50, 350)
    expected = _brute_triangles(pairs)
    got = triangle_count(
        edges_df(spark, pairs), strategy="arrow", closure="join"
    ).collect()[0][0]
    assert got == expected


def test_wedge_join_closure(spark):
    pairs = _random_graph(13, 50, 350)
    expected = _brute_triangles(pairs)
    got = triangle_count(
        edges_df(spark, pairs), strategy="wedge", closure="join"
    ).collect()[0][0]
    assert got == expected


def test_wedge_stats_k3(spark):
    row = wedge_stats(edges_df(spark, [(0, 1), (1, 2), (0, 2)])).collect()[0]
    assert row.n == 3
    assert row.m_oriented == 3
    # oriented K3: out-degrees 2,1,0 -> wedges 1
    assert row.total_wedges == 1
    assert row.max_degree == 2


def test_sampled_exact_when_k_covers_all_wedges(spark):
    # sampled == W => the estimator degenerates to the exact count
    from wedge_parallel_triangle_counting_spark.operators.approx import (
        triangle_count_sampled,
    )

    pairs = _random_graph(31, 25, 120)
    exact = _brute_triangles(pairs)
    row = triangle_count_sampled(edges_df(spark, pairs), k=100000).collect()[0]
    assert row.sampled == row.total_wedges
    assert row.closed == exact  # every wedge probed, one closure per triangle
    assert row.estimate == exact


def test_sampled_estimate_within_tolerance(spark):
    from wedge_parallel_triangle_counting_spark.operators.approx import (
        triangle_count_sampled,
    )

    pairs = _random_graph(37, 50, 900)  # dense: stable closure rate
    exact = _brute_triangles(pairs)
    row = triangle_count_sampled(edges_df(spark, pairs), k=256).collect()[0]
    assert row.sampled == 256
    # quantile sampling of a dense random graph: generous 50% band
    assert abs(row.estimate - exact) <= max(10, exact * 0.5)


def test_sampled_empty_graph(spark):
    from wedge_parallel_triangle_counting_spark.operators.approx import (
        triangle_count_sampled,
    )

    row = triangle_count_sampled(edges_df(spark, [(1, 2)])).collect()[0]
    assert (row.estimate, row.closed, row.sampled, row.total_wedges) == (0, 0, 0, 0)


def test_fused_matches_distributed_on_zipf_hubs(spark):
    # the collect-fused path (driver-derived stats/hubs/probe) must
    # agree with the fully distributed closure on a skewed graph where
    # the hub lane is active
    rng = random.Random(41)
    pairs = [(0, rng.randrange(1, 80)) for _ in range(400)]  # hub 0
    pairs += _random_graph(43, 80, 300)
    expected = _brute_triangles(pairs)
    df = edges_df(spark, pairs)
    fused = triangle_count(df, split_budget=16, hub_k=16).collect()[0][0]
    dist = triangle_count(df, closure="join", split_budget=16).collect()[0][0]
    assert fused == dist == expected


def test_fused_id_overflow_falls_back_to_relabel(spark):
    # vertex ids too large for int64 edge keys: the fused path must
    # decline and the relabel pipeline must still produce the count
    base = 3_000_000_000  # (max_id+1)^2 > 2^62
    pairs = [(base, base + 1), (base + 1, base + 2), (base, base + 2), (base + 2, base + 3)]
    got = triangle_count(edges_df(spark, pairs)).collect()[0][0]
    assert got == 1


def test_phase_metrics_enumerate_probe_split(spark):
    # VERDICT r2 item 8: the get/evaluate wedge split (tc_cycles'
    # accounting) must be surfaced for the wedge AND arrow strategies
    pairs = _random_graph(47, 50, 400)
    df = edges_df(spark, pairs)
    for strategy in ("wedge", "arrow", "vertex"):
        phases: dict = {}
        triangle_count(df, strategy=strategy, phase_metrics=phases)
        assert {"prep_sec", "build_sec", "exec_sec"} <= set(phases), (strategy, phases)
        assert "enumerate_cpu_sec" in phases and "probe_cpu_sec" in phases, (
            strategy,
            phases,
        )
        # >= 0, not > 0: on fast hardware a 50-vertex probe is sub-µs
        # and legitimately measures 0 (ADVICE r3 flake fix)
        assert phases["enumerate_cpu_sec"] >= 0 and phases["probe_cpu_sec"] >= 0


def test_hub_routing_never_collects_id_lists():
    # VERDICT r1 item 2: hub-lane routing must be a join, never a
    # driver-side id list — no collect_list / isin-literal routing in
    # the triangles module source
    import inspect

    import wedge_parallel_triangle_counting_spark.operators.triangles as T

    src = inspect.getsource(T)
    assert "F.collect_list" not in src  # docstring mentions are fine
    assert ".isin(" not in src


def test_wedge_stats_gate_row_overflow_falls_back(spark, monkeypatch):
    """r6 fused gate: an optimistic statistics-gated entry whose ACTUAL
    canonical edge count exceeds the broadcast budget must abort to the
    distributed lane (fast prep + semi-join closure) and still count
    exactly. BROADCAST_MAX_EDGES is shrunk below K4's 6 canonical edges
    so the tiny fixture takes the overflow path."""
    import wedge_parallel_triangle_counting_spark.operators.triangles as T

    from .conftest import K4

    monkeypatch.setattr(T, "BROADCAST_MAX_EDGES", 4)
    out = T.triangle_count(edges_df(spark, K4), strategy="wedge").collect()[0][0]
    assert out == 4


def test_hub_topk_and_bitmap_dense_sparse_agree():
    """ADVICE r5: pin the dense (bincount / byte-membership) and sparse
    (np.unique / clipped-searchsorted) paths of _numpy_top_hub_ids and
    build_hub_bitmap to identical outputs — including ids beyond 2^40
    (forcing the sparse branch) and top-k count ties."""
    import numpy as np

    import wedge_parallel_triangle_counting_spark.operators.triangles as T
    from wedge_parallel_triangle_counting_spark.functions import wedge as wk

    rng = np.random.default_rng(7)
    for trial in range(30):
        n = int(rng.integers(5, 40))
        m = int(rng.integers(5, 120))
        a = rng.integers(0, n, size=m).astype(np.int64)
        b = rng.integers(0, n, size=m).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        if len(a) == 0:
            continue
        for hub_k in (1, 3, 8):
            dense = T._numpy_top_hub_ids(a, b, hub_k)
            # sparse reference: same selection semantics, forced by
            # shifting ids beyond the dense-domain cap (> 2^40)
            shift = np.int64(1) << np.int64(41)
            sparse = T._numpy_top_hub_ids(a + shift, b + shift, hub_k) - shift
            assert np.array_equal(dense, sparse), (trial, hub_k)
            bm_dense = wk.build_hub_bitmap(a, b, dense)
            bm_sparse = wk.build_hub_bitmap(a + shift, b + shift, dense + shift)
            assert np.array_equal(bm_dense, bm_sparse), (trial, hub_k)
        # count-tie case: duplicate every edge so all counts tie in pairs
        aa, bb = np.concatenate([a, a]), np.concatenate([b, b])
        d2 = T._numpy_top_hub_ids(aa, bb, 4)
        s2 = T._numpy_top_hub_ids(aa + shift, bb + shift, 4) - shift
        assert np.array_equal(d2, s2)
    # out-of-range hub ids: the bitmap guard must drop them, not raise
    a = np.array([0, 1, 2], dtype=np.int64)
    b = np.array([1, 2, 0], dtype=np.int64)
    hubs = np.array([-5, 0, 1, 999999], dtype=np.int64)
    bm = wk.build_hub_bitmap(a, b, np.sort(hubs))
    assert bm.shape == (((4 * 4) + 63) // 64,)
