"""Edge support, k-truss, triangle listing, assortativity — golden
graphs plus brute-force differential tests on random graphs."""

from __future__ import annotations

import itertools
import random

import numpy as np
import pytest

from wedge_parallel_triangle_counting_spark.operators.graph import (
    degree_assortativity,
)
from wedge_parallel_triangle_counting_spark.operators.truss import (
    edge_support,
    k_truss,
    triangle_list,
)

from .conftest import BARBELL, K4, STAR10, edges_df


def _und(pairs):
    return {(min(a, b), max(a, b)) for a, b in pairs if a != b}


def _adj(und):
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def _brute_support(und):
    adj = _adj(und)
    return {
        (a, b): len(adj.get(a, set()) & adj.get(b, set())) for a, b in und
    }


def _brute_ktruss(und, k):
    cur = set(und)
    while True:
        sup = _brute_support(cur)
        nxt = {e for e in cur if sup[e] >= k - 2}
        if nxt == cur:
            return cur, _brute_support(cur)
        cur = nxt


def _random_graph(seed, n, m):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def test_edge_support_k4(spark):
    rows = edge_support(edges_df(spark, K4)).collect()
    assert len(rows) == 6
    assert all(r.support == 2 for r in rows)


def test_edge_support_barbell_bridge_is_zero(spark):
    got = {(r.src, r.dst): r.support for r in edge_support(edges_df(spark, BARBELL)).collect()}
    assert got[(3, 4)] == 0
    assert got[(0, 1)] == 2


@pytest.mark.parametrize("seed", [3, 17])
def test_edge_support_differential(spark, seed):
    pairs = _random_graph(seed, 40, 220)
    und = _und(pairs)
    want = _brute_support(und)
    got = {
        (r.src, r.dst): r.support
        for r in edge_support(edges_df(spark, pairs)).collect()
    }
    assert got == want


def test_ktruss_barbell_drops_bridge(spark):
    # both K4 cliques are 4-trusses (every edge in 2 triangles);
    # the bridge edge is in none and is peeled
    rows = k_truss(edges_df(spark, BARBELL), k=4).collect()
    got = {(r.src, r.dst) for r in rows}
    assert got == _und(BARBELL) - {(3, 4)}
    assert all(r.support == 2 for r in rows)


def test_ktruss_k5_empties_k4(spark):
    # K4 has max support 2, so the 5-truss (support >= 3) is empty
    assert k_truss(edges_df(spark, K4), k=5).count() == 0


@pytest.mark.parametrize("seed,k", [(5, 3), (5, 4), (23, 4)])
def test_ktruss_differential(spark, seed, k):
    pairs = _random_graph(seed, 30, 160)
    want_edges, want_sup = _brute_ktruss(_und(pairs), k)
    rows = k_truss(edges_df(spark, pairs), k=k).collect()
    got = {(r.src, r.dst): r.support for r in rows}
    assert set(got) == want_edges
    assert got == {e: want_sup[e] for e in want_edges}


def test_triangle_list_k4(spark):
    rows = triangle_list(edges_df(spark, K4), limit=100).collect()
    assert [(r.a, r.b, r.c) for r in rows] == list(
        itertools.combinations(range(4), 3)
    )


def test_triangle_list_limit_is_lexicographic_prefix(spark):
    pairs = _random_graph(7, 25, 140)
    all_tri = sorted(
        (a, b, c)
        for r in [_adj(_und(pairs))]
        for a, b in _und(pairs)
        for c in sorted(r.get(a, set()) & r.get(b, set()))
        if c > b
    )
    rows = triangle_list(edges_df(spark, pairs), limit=10).collect()
    assert [(r.a, r.b, r.c) for r in rows] == all_tri[:10]


def test_assortativity_star_is_minus_one(spark):
    # star: every edge pairs the hub (degree 10) with a leaf
    # (degree 1) — perfect anticorrelation
    row = degree_assortativity(edges_df(spark, STAR10)).collect()[0]
    assert row.n_edge_ends == 20
    assert row.assortativity == -1.0


def test_assortativity_differential_numpy(spark):
    pairs = _random_graph(13, 50, 300)
    und = _und(pairs)
    adj = _adj(und)
    deg = {v: len(ns) for v, ns in adj.items()}
    xs, ys = [], []
    for a, b in und:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    want = float(np.corrcoef(xs, ys)[0, 1])
    row = degree_assortativity(edges_df(spark, pairs)).collect()[0]
    assert row.assortativity == pytest.approx(want, abs=2e-6)
    assert row.n_edge_ends == 2 * len(und)


def test_butterflies_c4_and_k4(spark):
    from wedge_parallel_triangle_counting_spark.operators.motifs import (
        butterfly_count,
    )

    from .conftest import C4

    r = butterfly_count(edges_df(spark, C4)).collect()[0]
    assert (r.wedge_pairs, r.coneighbor_pairs, r.four_cycles) == (4, 2, 1)
    # K4: every one of the 3 perfect matchings closes a 4-cycle
    r = butterfly_count(edges_df(spark, K4)).collect()[0]
    assert r.four_cycles == 3


def test_butterflies_star_has_none(spark):
    from wedge_parallel_triangle_counting_spark.operators.motifs import (
        butterfly_count,
    )

    r = butterfly_count(edges_df(spark, STAR10)).collect()[0]
    assert r.four_cycles == 0
    assert r.coneighbor_pairs == 45  # every leaf pair shares the hub


@pytest.mark.parametrize("seed", [9, 31])
def test_butterflies_differential(spark, seed):
    from wedge_parallel_triangle_counting_spark.operators.motifs import (
        butterfly_count,
    )

    pairs = _random_graph(seed, 30, 150)
    und = _und(pairs)
    adj = _adj(und)
    vs = sorted(adj)
    wp = cp = diag = 0
    for i, u in enumerate(vs):
        for v in vs[i + 1:]:
            w = len(adj[u] & adj[v])
            if w:
                wp += w
                cp += 1
                diag += w * (w - 1) // 2
    r = butterfly_count(edges_df(spark, pairs)).collect()[0]
    assert (r.wedge_pairs, r.coneighbor_pairs, r.four_cycles) == (
        wp,
        cp,
        diag // 2,
    )


def test_reciprocity_hand_graph(spark):
    from wedge_parallel_triangle_counting_spark.operators.motifs import reciprocity

    r = reciprocity(
        edges_df(spark, [(0, 1), (1, 0), (1, 2), (2, 3), (0, 1), (3, 3)])
    ).collect()[0]
    # clean edges: (0,1),(1,0),(1,2),(2,3) — the 0<->1 pair reciprocates
    assert (r.n_edges, r.n_reciprocal) == (4, 2)
    assert r.reciprocity_ppm == 500000


def test_random_walks_are_valid_and_deterministic(spark):
    from wedge_parallel_triangle_counting_spark.operators.walks import random_walks

    pairs = _random_graph(41, 25, 120)
    und = _und(pairs)
    adj = _adj(und)
    rows = random_walks(edges_df(spark, pairs), length=6).collect()
    walks = {}
    for r in rows:
        walks.setdefault(r.walk_id, {})[r.step] = r.v
    # one walk per vertex, full length (sym graph has no dead ends)
    assert set(walks) == set(adj)
    for wid, steps in walks.items():
        assert steps[0] == wid
        assert set(steps) == set(range(7))
        for t in range(1, 7):
            assert steps[t] in adj[steps[t - 1]]  # every hop is an edge
    again = random_walks(edges_df(spark, pairs), length=6).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_random_walks_star_alternate_through_hub(spark):
    from wedge_parallel_triangle_counting_spark.operators.walks import random_walks

    rows = random_walks(edges_df(spark, STAR10), length=5).collect()
    for r in rows:
        if r.walk_id == 0:
            assert (r.v == 0) == (r.step % 2 == 0)
        else:
            assert (r.v == 0) == (r.step % 2 == 1)


def test_harmonic_differential(spark):
    from collections import deque

    from wedge_parallel_triangle_counting_spark.operators.centrality import (
        harmonic_centrality,
    )

    pairs = _random_graph(19, 40, 120)
    und = _und(pairs)
    adj = _adj(und)
    rows = harmonic_centrality(
        edges_df(spark, pairs), seed_pct=40, max_hops=5
    ).collect()
    got = {r.seed: (r.n_reached, r.harmonic_micro) for r in rows}
    assert len(got) > 0
    for s in got:
        # brute-force BFS to depth 5
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
        want_h = sum(1000000 // d for v, d in dist.items() if d > 0)
        assert got[s] == (want_n, want_h)


def test_harmonic_two_components_stay_separate(spark):
    from .conftest import TWO_COMP

    from wedge_parallel_triangle_counting_spark.operators.centrality import (
        harmonic_centrality,
    )

    rows = harmonic_centrality(
        edges_df(spark, TWO_COMP), seed_pct=100, max_hops=6
    ).collect()
    assert len(rows) == 6  # every vertex sampled at 100%
    for r in rows:
        # each triangle component: 2 neighbors at distance 1
        assert (r.n_reached, r.harmonic_micro) == (2, 2000000)


def test_bipartite_projection_hand_check(spark):
    from wedge_parallel_triangle_counting_spark.operators.motifs import (
        bipartite_projection,
    )

    # orders {10: (a,b,c), 11: (a,b), 12: (a,b)} -> ab=3, ac=1, bc=1
    rows = spark.createDataFrame(
        [(10, "a"), (10, "b"), (10, "c"), (11, "a"), (11, "b"),
         (12, "a"), (12, "b"), (12, "a")],
        "left long, right string",
    )
    got = [
        (r.u, r.v, r.weight)
        for r in bipartite_projection(rows, k=10, min_weight=1).collect()
    ]
    assert got == [("a", "b", 3), ("a", "c", 1), ("b", "c", 1)]
    # min_weight prunes the tail
    got2 = bipartite_projection(rows, k=10, min_weight=2).collect()
    assert [(r.u, r.v, r.weight) for r in got2] == [("a", "b", 3)]


def test_sample_neighbors_invariants(spark):
    from wedge_parallel_triangle_counting_spark.operators.walks import (
        sample_neighbors,
    )

    pairs = _random_graph(53, 30, 200)
    und = _und(pairs)
    adj = _adj(und)
    rows = sample_neighbors(edges_df(spark, pairs), k=4).collect()
    by_v = {}
    for r in rows:
        by_v.setdefault(r.v, []).append(r)
    assert set(by_v) == set(adj)
    for v, rs in by_v.items():
        assert len(rs) == min(len(adj[v]), 4)  # at most k, all if deg<k
        assert all(r.deg == len(adj[v]) for r in rs)
        nbrs = {r.nbr for r in rs}
        assert len(nbrs) == len(rs)  # no repeats
        assert nbrs <= adj[v]  # subset of the true neighborhood
    again = sample_neighbors(edges_df(spark, pairs), k=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_tetrahedra_golden_and_differential(spark):
    import itertools as it

    from wedge_parallel_triangle_counting_spark.operators.motifs import (
        tetrahedron_count,
    )

    from .conftest import K5

    r = tetrahedron_count(edges_df(spark, K4)).collect()[0]
    assert (r.triangles, r.tetrahedra) == (4, 1)
    r = tetrahedron_count(edges_df(spark, K5)).collect()[0]
    assert (r.triangles, r.tetrahedra) == (10, 5)  # C(5,3), C(5,4)
    r = tetrahedron_count(edges_df(spark, BARBELL)).collect()[0]
    assert (r.triangles, r.tetrahedra) == (8, 2)

    pairs = _random_graph(61, 18, 110)
    und = _und(pairs)
    adj = _adj(und)
    want = sum(
        1
        for a, b, c, d in it.combinations(sorted(adj), 4)
        if {(a, b), (a, c), (a, d), (b, c), (b, d), (c, d)} <= und
    )
    r = tetrahedron_count(edges_df(spark, pairs)).collect()[0]
    assert r.tetrahedra == want


def test_hop_histogram_matches_harmonic_distances(spark):
    from collections import deque

    from wedge_parallel_triangle_counting_spark.operators.centrality import (
        hop_histogram,
    )

    pairs = _random_graph(67, 35, 110)
    und = _und(pairs)
    adj = _adj(und)
    # brute force: same md5 seed predicate as the operator
    import hashlib

    seeds = [
        v
        for v in adj
        if int(hashlib.md5(f"hc:{v}".encode()).hexdigest()[:8], 16) % 100 < 40
    ]
    want = {}
    for s in seeds:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] == 4:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        for v, d in dist.items():
            if d > 0:
                want[d] = want.get(d, 0) + 1
    got = {
        r.hops: r.n_pairs
        for r in hop_histogram(
            edges_df(spark, pairs), seed_pct=40, max_hops=4
        ).collect()
    }
    assert got == want


def test_sssp_differential_dijkstra(spark):
    import heapq

    from wedge_parallel_triangle_counting_spark.operators.sssp import weighted_sssp

    rng = random.Random(71)
    rows = [
        (rng.randrange(20), rng.randrange(20), rng.randrange(1, 9))
        for _ in range(90)
    ]
    df = spark.createDataFrame(rows, "src long, dst long, w long")
    # dedup parallel edges: keep cheapest, drop self loops (operator contract)
    best = {}
    for a, b, w in rows:
        if a != b:
            best[(a, b)] = min(best.get((a, b), 10**9), w)
    src0 = min(a for a, _ in best)
    dist = {src0: 0}
    pq = [(0, src0)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 10**9):
            continue
        for (a, b), w in best.items():
            if a == u and d + w < dist.get(b, 10**9):
                dist[b] = d + w
                heapq.heappush(pq, (dist[b], b))
    got = {r.v: r.dist for r in weighted_sssp(df, max_rounds=25).collect()}
    assert got == dist  # 25 rounds >= any shortest path's edge count


def test_sssp_round_cap_contract(spark):
    from wedge_parallel_triangle_counting_spark.operators.sssp import weighted_sssp

    # path 0-1-2-3 with unit weights and a heavy shortcut 0->3
    df = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10)],
        "src long, dst long, w long",
    )
    got = {r.v: r.dist for r in weighted_sssp(df, max_rounds=1).collect()}
    # one round: only direct edges relaxed
    assert got == {0: 0, 1: 1, 3: 10}
    got = {r.v: r.dist for r in weighted_sssp(df, max_rounds=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_neighbor_degree_curve_star(spark):
    from wedge_parallel_triangle_counting_spark.operators.graph import (
        neighbor_degree_curve,
    )

    rows = {r.degree: r for r in neighbor_degree_curve(edges_df(spark, STAR10)).collect()}
    # leaves (degree 1) see only the hub (degree 10); hub sees leaves
    assert rows[1].n_vertices == 10
    assert rows[1].avg_nbr_degree_micro == 10_000_000
    assert rows[10].n_vertices == 1
    assert rows[10].avg_nbr_degree_micro == 1_000_000


def test_harmonic_resume_matches_direct(spark, tmp_path):
    from wedge_parallel_triangle_counting_spark.operators.centrality import (
        harmonic_centrality,
    )

    pairs = _random_graph(83, 30, 90)
    df = edges_df(spark, pairs)
    ckpt = str(tmp_path / "hc")
    # early stop after 2 rounds (durable snapshots at rounds 0 and 1)
    harmonic_centrality(
        df, seed_pct=40, max_hops=2, checkpoint_dir=ckpt, checkpoint_every=1
    ).collect()
    resumed = {
        r.seed: (r.n_reached, r.harmonic_micro)
        for r in harmonic_centrality(
            df,
            seed_pct=40,
            max_hops=5,
            checkpoint_dir=ckpt,
            checkpoint_every=1,
            resume=True,
        ).collect()
    }
    direct = {
        r.seed: (r.n_reached, r.harmonic_micro)
        for r in harmonic_centrality(df, seed_pct=40, max_hops=5).collect()
    }
    assert resumed == direct


def test_sssp_resume_matches_direct(spark, tmp_path):
    from wedge_parallel_triangle_counting_spark.operators.sssp import weighted_sssp

    rng = random.Random(97)
    rows = [
        (rng.randrange(25), rng.randrange(25), rng.randrange(1, 9))
        for _ in range(100)
    ]
    df = spark.createDataFrame(rows, "src long, dst long, w long")
    ckpt = str(tmp_path / "sssp")
    weighted_sssp(df, max_rounds=2, checkpoint_dir=ckpt, checkpoint_every=1)
    resumed = {
        r.v: r.dist
        for r in weighted_sssp(
            df, max_rounds=8, checkpoint_dir=ckpt, checkpoint_every=1, resume=True
        ).collect()
    }
    direct = {r.v: r.dist for r in weighted_sssp(df, max_rounds=8).collect()}
    assert resumed == direct


def test_harmonic_resume_smaller_budget_is_clamped(spark, tmp_path):
    from wedge_parallel_triangle_counting_spark.operators.centrality import (
        harmonic_centrality,
    )

    pairs = _random_graph(29, 30, 90)
    df = edges_df(spark, pairs)
    ckpt = str(tmp_path / "hc_clamp")
    harmonic_centrality(
        df, seed_pct=40, max_hops=5, checkpoint_dir=ckpt, checkpoint_every=1
    ).collect()
    resumed = {
        r.seed: (r.n_reached, r.harmonic_micro)
        for r in harmonic_centrality(
            df,
            seed_pct=40,
            max_hops=2,
            checkpoint_dir=ckpt,
            checkpoint_every=1,
            resume=True,
        ).collect()
    }
    direct = {
        r.seed: (r.n_reached, r.harmonic_micro)
        for r in harmonic_centrality(df, seed_pct=40, max_hops=2).collect()
    }
    assert resumed == direct  # snapshot clamped to THIS call's budget


def test_sssp_resume_smaller_budget_refused(spark, tmp_path):
    from wedge_parallel_triangle_counting_spark.operators.sssp import weighted_sssp

    df = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1)], "src long, dst long, w long"
    )
    ckpt = str(tmp_path / "sssp_refuse")
    weighted_sssp(df, max_rounds=4, checkpoint_dir=ckpt, checkpoint_every=1)
    with pytest.raises(ValueError, match="max_rounds"):
        weighted_sssp(
            df, max_rounds=1, checkpoint_dir=ckpt, checkpoint_every=1, resume=True
        )


def test_node2vec_walks_valid_and_deterministic(spark):
    from wedge_parallel_triangle_counting_spark.operators.walks import (
        node2vec_walks,
    )

    pairs = _random_graph(47, 25, 120)
    adj = _adj(_und(pairs))
    rows = node2vec_walks(edges_df(spark, pairs), length=4).collect()
    walks = {}
    for r in rows:
        walks.setdefault(r.walk_id, {})[r.step] = r.v
    assert set(walks) == set(adj)
    for wid, steps in walks.items():
        assert steps[0] == wid
        assert set(steps) == set(range(5))
        for t in range(1, 5):
            assert steps[t] in adj[steps[t - 1]]
    again = node2vec_walks(edges_df(spark, pairs), length=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_node2vec_zero_return_weight_never_backtracks(spark):
    from .conftest import C4

    from wedge_parallel_triangle_counting_spark.operators.walks import (
        node2vec_walks,
    )

    # C4 with return weight 0: from any vertex the only nonzero-weight
    # candidate is the non-prev neighbor, so the walk orbits the cycle
    rows = node2vec_walks(
        edges_df(spark, C4), length=6, return_w=0, common_w=1, other_w=1
    ).collect()
    walks = {}
    for r in rows:
        walks.setdefault(r.walk_id, {})[r.step] = r.v
    for wid, steps in walks.items():
        for t in range(2, 7):
            assert steps[t] != steps[t - 2]  # no immediate backtrack
