"""Modularity and transitivity — hand-computable fixtures.

All expected values are derived on paper from the exact-integer
definitions in operators/quality.py (q_ppm = floor(Q*1e6) with
Q*4m^2 = 4m*sum(m_c) - sum(D_c^2); transitivity_ppm =
floor(3T*1e6 / W)).
"""

from __future__ import annotations

from wedge_parallel_triangle_counting_spark.operators.quality import (
    modularity,
    transitivity,
)

from .conftest import edges_df

# two triangles bridged by one edge: m=7, D_A=D_B=7, m_A=m_B=3
TWO_TRIANGLES = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]


def _asg(spark, pairs):
    return spark.createDataFrame(pairs, "v long, community string")


def test_modularity_two_communities(spark):
    asg = _asg(spark, [(v, "A" if v < 3 else "B") for v in range(6)])
    row = modularity(edges_df(spark, TWO_TRIANGLES), asg).collect()[0]
    # q_num = 4*7*6 - (49+49) = 70, q_den = 196 -> floor(70e6/196)
    assert (row.n_communities, row.m_edges, row.intra_edges, row.q_ppm) == (
        2,
        7,
        6,
        357142,
    )


def test_modularity_all_one_community_is_zero(spark):
    # a single community: Q = m/m - (2m/2m)^2 = 0 exactly
    asg = _asg(spark, [(v, "A") for v in range(6)])
    assert (
        modularity(edges_df(spark, TWO_TRIANGLES), asg).collect()[0].q_ppm == 0
    )


def test_modularity_negative_q_floor_semantics(spark):
    # adversarial partition of one triangle: each vertex alone.
    # m=3, every m_c=0, D_c=2 -> q_num = -12, q_den = 36,
    # Q = -1/3 -> floor(-333333.33) = -333334 (floor, NOT trunc)
    asg = _asg(spark, [(v, str(v)) for v in range(3)])
    row = modularity(edges_df(spark, [(0, 1), (1, 2), (2, 0)]), asg).collect()[0]
    assert row.q_ppm == -333334


def test_modularity_unassigned_vertices_become_singletons(spark):
    # only the first triangle labeled: singletons 3,4,5 have
    # D = 3,2,2 and m_c = 0 -> q_num = 4*7*3 - (49+9+4+4) = 18
    asg = _asg(spark, [(v, "A") for v in range(3)])
    row = modularity(edges_df(spark, TWO_TRIANGLES), asg).collect()[0]
    assert (row.n_communities, row.intra_edges, row.q_ppm) == (4, 3, 91836)


def test_modularity_empty_graph(spark):
    asg = _asg(spark, [(1, "A")])
    assert modularity(edges_df(spark, [(1, 1)]), asg).count() == 0


def test_transitivity_bridged_triangles(spark):
    # T=2; degrees 2,2,3,3,2,2 -> W = 4*1 + 2*3 = 10 -> 600000 ppm
    row = transitivity(edges_df(spark, TWO_TRIANGLES)).collect()[0]
    assert (row.triangles, row.wedges, row.transitivity_ppm) == (2, 10, 600000)


def test_transitivity_complete_graph_is_one(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    row = transitivity(edges_df(spark, k4)).collect()[0]
    assert (row.triangles, row.wedges, row.transitivity_ppm) == (4, 12, 1000000)


def test_transitivity_star_is_zero(spark):
    row = transitivity(edges_df(spark, [(0, i) for i in range(1, 5)])).collect()[0]
    assert (row.triangles, row.transitivity_ppm) == (0, 0)


def test_transitivity_empty_graph(spark):
    assert transitivity(edges_df(spark, [(1, 1)])).count() == 0
