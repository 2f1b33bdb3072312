"""ANF / effective-diameter invariants (operators/anf.py).

Small-k saturation on golden graphs makes the KMV estimate EXACT
(below k distinct hashes the sketch IS the ball), so ball sizes are
asserted against hand counts; the estimator branch is exercised by
forcing k below the ball size and bounding the estimate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wedge_parallel_triangle_counting_spark.operators.anf import (
    effective_diameter,
    neighborhood_function,
)

from .conftest import BARBELL, C4, K4, TWO_COMP, edges_df


def _nf(spark, pairs, **kw):
    rows = neighborhood_function(edges_df(spark, pairs), **kw).collect()
    return {r["hop"]: r["nf_est"] for r in rows}


def test_anf_exact_below_saturation_c4(spark):
    # C4 balls: hop0 = 1 each, hop1 = 3 each, hop2 = whole cycle
    nf = _nf(spark, C4, k=32, max_hops=3)
    assert nf == {0: 4, 1: 12, 2: 16, 3: 16}


def test_anf_two_components_never_mix(spark):
    # two disjoint K3s: balls saturate at each component's size
    nf = _nf(spark, TWO_COMP, k=32, max_hops=3)
    assert nf == {0: 6, 1: 18, 2: 18, 3: 18}


def test_anf_monotone_and_bounded(spark):
    nf = _nf(spark, BARBELL, k=32, max_hops=4)
    n = 8
    vals = [nf[h] for h in sorted(nf)]
    assert vals == sorted(vals)
    assert nf[0] == n and all(v <= n * n for v in vals)


def test_anf_estimator_branch_bounded(spark):
    # k=2 < |ball|: the (k-1)*SPACE div kth estimate engages; it is
    # clamped to n and can never report fewer than k reachable
    nf = _nf(spark, K4, k=2, max_hops=2)
    assert nf[0] == 4
    assert 4 * 2 <= nf[1] <= 4 * 4 and 4 * 2 <= nf[2] <= 4 * 4


def test_effective_diameter_c4(spark):
    # nf: 4, 12, 16 -> hop1 = 75% < 90%, hop2 = 100% -> eff diameter 2
    row = effective_diameter(edges_df(spark, C4), k=32, max_hops=2, q=90).collect()[0]
    assert row["eff_diameter_hops"] == 2 and row["nf_final"] == 16


def test_anf_deterministic_across_partitionings(spark):
    e = edges_df(spark, BARBELL)
    a = sorted(map(tuple, neighborhood_function(e, k=4, max_hops=3).collect()))
    b = sorted(
        map(
            tuple,
            neighborhood_function(e.repartition(7), k=4, max_hops=3).collect(),
        )
    )
    assert a == b


def test_anf_empty_graph(spark):
    only_loops = edges_df(spark, [(1, 1), (2, 2)])
    assert neighborhood_function(only_loops, k=4, max_hops=2).count() == 0


def test_closeness_differential(spark):
    from collections import deque

    from tests.test_truss import _adj, _random_graph, _und

    from wedge_parallel_triangle_counting_spark.operators.centrality import (
        closeness_centrality,
    )

    pairs = _random_graph(23, 40, 120)
    adj = _adj(_und(pairs))
    rows = closeness_centrality(
        edges_df(spark, pairs), seed_pct=40, max_hops=5
    ).collect()
    got = {r.seed: (r.n_reached, r.closeness_micro) for r in rows}
    assert len(got) > 0
    for s in got:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] == 5:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        want_n = len(dist) - 1
        sum_hops = sum(d for d in dist.values() if d > 0)
        want_c = want_n * 1000000 // sum_hops if sum_hops else 0
        assert got[s] == (want_n, want_c)


def _bz_core_numbers(adj):
    """Textbook Batagelj-Zaversnik peel (exact core numbers)."""
    import collections

    cur = {v: len(ns) for v, ns in adj.items()}
    buckets = collections.defaultdict(set)
    for v, d in cur.items():
        buckets[d].add(v)
    core, removed, k = {}, set(), 0
    for _ in range(len(cur)):
        d = min(dd for dd, s in buckets.items() if s)
        v = min(buckets[d])
        buckets[d].discard(v)
        k = max(k, d)
        core[v] = k
        removed.add(v)
        for u in adj[v]:
            if u not in removed:
                buckets[cur[u]].discard(u)
                cur[u] -= 1
                buckets[cur[u]].add(u)
    return core


def test_coreness_differential(spark):
    from tests.test_truss import _adj, _random_graph, _und

    from wedge_parallel_triangle_counting_spark.operators.coreness import (
        core_numbers,
    )

    for seed in (3, 11):
        pairs = _random_graph(seed, 35, 160)
        adj = _adj(_und(pairs))
        want = _bz_core_numbers(adj)
        got = {r.v: r.core for r in core_numbers(edges_df(spark, pairs)).collect()}
        assert got == want


def test_coreness_golden(spark):
    from wedge_parallel_triangle_counting_spark.operators.coreness import (
        core_numbers,
    )

    # K4 with a pendant: K4 members coreness 3, pendant 1
    k4p = K4 + [(0, 99)]
    got = {r.v: r.core for r in core_numbers(edges_df(spark, k4p)).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 99: 1}


def test_coreness_consistent_with_kcore(spark):
    from tests.test_truss import _random_graph

    from wedge_parallel_triangle_counting_spark.operators.coreness import (
        core_numbers,
    )
    from wedge_parallel_triangle_counting_spark.operators.kcore import k_core

    pairs = _random_graph(29, 40, 200)
    e = edges_df(spark, pairs)
    core = {r.v: r.core for r in core_numbers(e).collect()}
    for k in (2, 3):
        in_kcore = {r.v for r in k_core(e, k=k).collect()}
        assert in_kcore == {v for v, c in core.items() if c >= k}


def test_stress_centrality_differential(spark):
    from collections import deque
    from itertools import combinations

    from tests.test_truss import _adj, _random_graph, _und

    from wedge_parallel_triangle_counting_spark.operators.centrality import (
        stress_centrality,
    )

    pairs = _random_graph(17, 25, 90)
    adj = _adj(_und(pairs))

    def bfs_sigma(s, max_h):
        dist, sigma = {s: 0}, {s: 1}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] == max_h:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        return dist, sigma

    max_h = 4
    tabs = {s: bfs_sigma(s, max_h) for s in adj}
    want_pairs, want_paths = {}, {}
    for s, t in combinations(sorted(adj), 2):
        ds, ss = tabs[s]
        dt, st_ = tabs[t]
        if t not in ds:
            continue
        for v in adj:
            if v in (s, t) or v not in ds or v not in dt:
                continue
            if ds[v] + dt[v] == ds[t]:
                want_pairs[v] = want_pairs.get(v, 0) + 1
                want_paths[v] = want_paths.get(v, 0) + ss[v] * st_[v]
    got = {
        r.v: (r.n_pairs, r.through_paths)
        for r in stress_centrality(
            edges_df(spark, pairs), seed_pct=100, max_hops=max_h
        ).collect()
    }
    want = {v: (want_pairs[v], want_paths[v]) for v in want_pairs}
    assert got == want


def test_matching_maximal_and_greedy_equal(spark):
    import hashlib

    from tests.test_truss import _random_graph

    from wedge_parallel_triangle_counting_spark.operators.matching import (
        maximal_matching,
    )

    pairs = _random_graph(5, 30, 140)
    canon = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    got = [(r.a, r.b) for r in maximal_matching(edges_df(spark, pairs)).collect()]
    gotset = set(got)
    # matching: no shared vertices
    used = [v for e in got for v in e]
    assert len(used) == len(set(used))
    # maximal: every edge touches a matched vertex
    assert all(a in used or b in used for a, b in canon)

    # equals sequential greedy in priority order
    def prio(a, b):
        h = int(hashlib.md5(f"{a}:{b}".encode()).hexdigest()[:15], 16)
        return f"{h:019d}{a:010d}{b:010d}"

    matched, taken = set(), set()
    for a, b in sorted(canon, key=lambda e: prio(*e)):
        if a not in taken and b not in taken:
            matched.add((a, b))
            taken.update((a, b))
    assert gotset == matched


def test_matching_empty_and_single_edge(spark):
    from wedge_parallel_triangle_counting_spark.operators.matching import (
        maximal_matching,
    )

    assert maximal_matching(edges_df(spark, [(1, 1)])).count() == 0
    got = maximal_matching(edges_df(spark, [(2, 1), (1, 2)])).collect()
    assert [(r.a, r.b, r.round) for r in got] == [(1, 2, 1)]


def test_double_sweep_path_and_star(spark):
    from wedge_parallel_triangle_counting_spark.operators.bfs import (
        double_sweep_diameter,
    )

    # path 0-1-2-3-4: sweep1 from 0 finds 4 (ecc 4); sweep2 from 4
    # finds 0 -> diameter_lb 4 (exact on trees)
    path = [(i, i + 1) for i in range(4)]
    r = double_sweep_diameter(edges_df(spark, path)).collect()[0]
    assert (r.sweep1_ecc, r.far_vertex, r.diameter_lb) == (4, 4, 4)

    # star: every eccentricity from a leaf is 2
    from .conftest import STAR10

    r = double_sweep_diameter(edges_df(spark, STAR10)).collect()[0]
    assert (r.sweep1_ecc, r.diameter_lb) == (1, 2)
    # sweep1 starts at vertex 0 = the center (min id), ecc 1; the far
    # vertex is the smallest leaf, and its eccentricity is 2
    assert r.far_vertex == 1


def test_rmat_deterministic_and_skewed(spark):
    from pyspark.sql import functions as F

    from wedge_parallel_triangle_counting_spark.sources.rmat import synth_rmat

    a = sorted(map(tuple, synth_rmat(spark, scale=7, edge_factor=8).collect()))
    b = sorted(
        map(
            tuple,
            synth_rmat(spark, scale=7, edge_factor=8)
            .repartition(13)
            .collect(),
        )
    )
    assert a == b and len(a) == 8 * 128
    assert all(0 <= s < 128 and 0 <= d < 128 for s, d in a)
    # power-law-ish head: the hottest vertex sees far more than the
    # mean degree (Graph500 parameters concentrate mass at low ids)
    df = synth_rmat(spark, scale=7, edge_factor=8)
    deg = (
        df.select(F.col("src").alias("v"))
        .unionAll(df.select(F.col("dst").alias("v")))
        .groupBy("v")
        .count()
    )
    mx = deg.agg(F.max("count")).collect()[0][0]
    mean = 2 * len(a) / 128
    assert mx > 4 * mean


def test_coreness_round_cap_is_exact_h_power(spark):
    """r6 double-step loop: core_numbers(max_rounds=k) must return
    EXACTLY H^k of the degree init on an unconverged graph (the
    unrolled oracle's contract), including odd k. A 20-path converges
    slowly (the 1s creep inward one level per application), so k=3 and
    k=4 are both mid-convergence."""
    from pyspark.sql import functions as F

    from wedge_parallel_triangle_counting_spark.operators.coreness import (
        _hindex_step,
        core_numbers,
    )
    from wedge_parallel_triangle_counting_spark.operators.graph import (
        build_sym_clustered,
    )

    pairs = [(i, i + 1) for i in range(20)]
    for k in (3, 4):
        got = {
            r.v: r.core
            for r in core_numbers(edges_df(spark, pairs), max_rounds=k).collect()
        }
        sym = build_sym_clustered(edges_df(spark, pairs), 4, key="dst")
        state = sym.groupBy(F.col("dst").alias("v")).agg(
            F.count(F.lit(1)).cast("int").alias("c")
        )
        for _ in range(k):
            state = _hindex_step(sym, state)
        want = {r.v: r.c for r in state.collect()}
        assert got == want, (k, got, want)
