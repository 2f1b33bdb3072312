"""Unit tests for the edge-table preprocessing operators (SURVEY §2.2,
O2, J4, A1) on hand-computed graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from wedge_parallel_triangle_counting_spark.operators import graph as G

from .conftest import DIRTY_K3, K3, STAR10, edges_df


def test_normalize_one_indexed(spark):
    df = edges_df(spark, [(1, 2), (2, 3)])
    out = G.normalize_edges(df, one_indexed=True).collect()
    assert sorted((r.src, r.dst) for r in out) == [(0, 1), (1, 2)]


def test_symmetrize_cleans_dirty_input(spark):
    sym = G.symmetrize(edges_df(spark, DIRTY_K3))
    rows = sorted((r.src, r.dst) for r in sym.collect())
    assert rows == [(0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1)]


def test_degrees_star(spark):
    sym = G.symmetrize(edges_df(spark, STAR10))
    deg = {r.v: r.degree for r in G.degrees(sym).collect()}
    assert deg[0] == 10
    assert all(deg[i] == 1 for i in range(1, 11))


def test_degree_rank_is_permutation_and_ordered(spark):
    sym = G.symmetrize(edges_df(spark, STAR10 + K3))
    deg = G.degrees(sym)
    for method in ("window", "scalable"):
        ranks = G.degree_rank(deg, method=method).collect()
        got = sorted(r.rank for r in ranks)
        assert got == list(range(len(ranks)))
        # ascending degree order: hub (vertex 0, degree 12) must get max rank
        by_v = {r.v: r.rank for r in ranks}
        assert by_v[0] == len(ranks) - 1


def test_scalable_rank_matches_window_rank(spark):
    sym = G.symmetrize(edges_df(spark, DIRTY_K3 + STAR10 + [(20, 21), (21, 22)]))
    deg = G.degrees(sym).persist()
    w = {r.v: r.rank for r in G.degree_rank(deg, "window").collect()}
    s = {r.v: r.rank for r in G.degree_rank(deg, "scalable").collect()}
    assert w == s


def test_orientation_halves_edges(spark):
    # reference invariant: numEdges halved after orientation (tc.cu:729)
    sym = G.symmetrize(edges_df(spark, K3 + STAR10))
    m_sym = sym.count()
    oriented, _, n = G.prepare_oriented(edges_df(spark, K3 + STAR10))
    assert oriented.count() == m_sym // 2
    assert n == G.degrees(sym).count()
    # oriented edges all point low rank -> high rank
    assert oriented.filter(F.col("src") >= F.col("dst")).count() == 0


def test_orient_by_degree_same_count(spark):
    df = edges_df(spark, K3 + STAR10)
    sym = G.symmetrize(df)
    o1 = G.orient_by_degree(sym, G.degrees(sym)).count()
    o2, _, _ = G.prepare_oriented(df)
    assert o1 == o2.count()


def test_adjacency_sorted(spark):
    oriented, _, _ = G.prepare_oriented(edges_df(spark, K3 + STAR10))
    for row in G.adjacency(oriented).collect():
        assert list(row.adj) == sorted(row.adj)
        assert row.deg == len(row.adj)


def test_bfs_hops_chain_and_disconnected(spark):
    from wedge_parallel_triangle_counting_spark.operators.bfs import shortest_hops

    # chain 0-1-2-3 plus a disconnected pair 10-11; default source = min id
    pairs = [(0, 1), (1, 2), (2, 3), (10, 11)]
    got = {r.v: r.hops for r in shortest_hops(edges_df(spark, pairs)).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_hops_respects_max_hops_and_stops_early(spark):
    from wedge_parallel_triangle_counting_spark.operators.bfs import shortest_hops

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    got = {r.v: r.hops for r in shortest_hops(edges_df(spark, pairs), max_hops=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}
    # early frontier exhaustion: triangle fully reached after 1 hop
    tri = {r.v: r.hops for r in shortest_hops(edges_df(spark, [(0, 1), (1, 2), (0, 2)]), max_hops=50).collect()}
    assert tri == {0: 0, 1: 1, 2: 1}


def test_bfs_hops_explicit_source(spark):
    from wedge_parallel_triangle_counting_spark.operators.bfs import shortest_hops

    pairs = [(0, 1), (1, 2), (2, 3), (10, 11)]
    got = {r.v: r.hops for r in shortest_hops(edges_df(spark, pairs), source=10).collect()}
    assert got == {10: 0, 11: 1}


def _mis_props(pairs, rows):
    """(independent?, maximal?) of a vertex set against an edge list."""
    sel = {r.v for r in rows}
    sym = {(a, b) for a, b in pairs if a != b} | {
        (b, a) for a, b in pairs if a != b
    }
    independent = not any((a, b) in sym for a in sel for b in sel)
    verts = {x for p in sym for x in p}
    maximal = all(
        v in sel or any((v, u) in sym and u in sel for u in verts)
        for v in verts
    )
    return independent, maximal


def test_mis_independent_and_maximal(spark):
    import random

    from wedge_parallel_triangle_counting_spark.operators.mis import (
        maximal_independent_set,
    )

    rng = random.Random(7)
    pairs = list({(rng.randrange(60), rng.randrange(60)) for _ in range(220)})
    rows = maximal_independent_set(edges_df(spark, pairs)).collect()
    independent, maximal = _mis_props(pairs, rows)
    assert independent and maximal
    # deterministic: a second run (different partitioning) is identical
    again = maximal_independent_set(edges_df(spark, pairs).repartition(7)).collect()
    assert sorted((r.v, r.round) for r in rows) == sorted(
        (r.v, r.round) for r in again
    )
    # K3: exactly one vertex selected, in round 1
    k3 = maximal_independent_set(edges_df(spark, [(0, 1), (1, 2), (0, 2)])).collect()
    assert len(k3) == 1 and k3[0].round == 1
    # empty graph (self loops only)
    assert maximal_independent_set(edges_df(spark, [(5, 5)])).count() == 0


def test_luby_coloring_proper_and_total(spark):
    import random

    from wedge_parallel_triangle_counting_spark.operators.mis import luby_coloring

    rng = random.Random(11)
    pairs = list({(rng.randrange(40), rng.randrange(40)) for _ in range(150)})
    rows = luby_coloring(edges_df(spark, pairs)).collect()
    color = {r.v: r.round for r in rows}
    sym = {(a, b) for a, b in pairs if a != b}
    verts = {x for p in sym for x in p} | {b for a, b in sym}
    # total: every incident vertex got exactly one color
    assert set(color) == verts and len(rows) == len(color)
    # proper: no edge joins two same-colored vertices
    assert all(color[a] != color[b] for a, b in sym)
    # round k's class must be nonempty for every k up to the max
    # (each round selects at least the min-priority active vertex)
    used = sorted(set(color.values()))
    assert used == list(range(1, used[-1] + 1))


def test_doulion_keep_all_equals_exact(spark):
    """p = 1 (keep_num == keep_den) keeps every edge, so the DOULION
    estimate must equal the exact triangle count; and the deterministic
    coin makes repeated runs identical."""
    import random

    from wedge_parallel_triangle_counting_spark.operators.approx import (
        triangle_count_doulion,
    )
    from wedge_parallel_triangle_counting_spark.operators.triangles import (
        triangle_count,
    )

    rng = random.Random(13)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    exact = triangle_count(df).collect()[0][0]
    full = triangle_count_doulion(df, keep_num=10, keep_den=10).collect()[0]
    assert full.sampled_triangles == exact == full.est_triangles
    a = triangle_count_doulion(df, keep_num=3, keep_den=10).collect()[0]
    b = triangle_count_doulion(df, keep_num=3, keep_den=10).collect()[0]
    assert tuple(a) == tuple(b)
    assert a.est_triangles == a.sampled_triangles * 1000 // 27


def test_hub_ego_stats_on_planted_shapes(spark):
    from wedge_parallel_triangle_counting_spark.operators.motifs import (
        hub_ego_stats,
    )

    edges = [(0, i) for i in range(1, 6)]          # star: hub 0, deg 5
    edges += [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    df = spark.createDataFrame(edges, "src long, dst long")  # K4 on 10..13
    rows = {r.hub: r for r in hub_ego_stats(df, top_h=2).collect()}
    star = rows[0]
    assert (star.ego_n, star.ego_edges, star.density_ppm) == (6, 5, 333333)
    # second hub is a K4 member (deg 3, min id 10): ego = whole clique
    k4 = rows[10]
    assert (k4.ego_n, k4.ego_edges, k4.density_ppm) == (4, 6, 1000000)
