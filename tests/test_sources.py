"""Edge-list / Matrix Market readers and sinks (SURVEY §2.1)."""

from __future__ import annotations

from wedge_parallel_triangle_counting_spark.operators.triangles import triangle_count
from wedge_parallel_triangle_counting_spark.sources.edge_list import (
    read_edge_list,
    read_matrix_market,
)
from wedge_parallel_triangle_counting_spark.sources.sinks import (
    degree_distribution_report,
)


def test_read_edge_list_one_indexed(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("# a header line\n1 2\n2 3\n1 3\n")
    edges = read_edge_list(spark, str(p), one_indexed=True)
    got = sorted((r.src, r.dst) for r in edges.collect())
    assert got == [(0, 1), (0, 2), (1, 2)]


def test_read_edge_list_zero_indexed(spark, tmp_path):
    p = tmp_path / "g0.txt"
    p.write_text("0 1\n1 2\n0 2\n")
    edges = read_edge_list(spark, str(p), one_indexed=False)
    assert triangle_count(edges).collect()[0][0] == 1


def test_read_matrix_market(spark, tmp_path):
    p = tmp_path / "g.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "% a comment\n"
        "3 3 3\n"  # size line: must be skipped
        "1 2\n2 3\n1 3\n"
    )
    edges = read_matrix_market(spark, str(p))
    got = sorted((r.src, r.dst) for r in edges.collect())
    assert got == [(0, 1), (0, 2), (1, 2)]
    assert triangle_count(edges).collect()[0][0] == 1


def test_degree_distribution_report(spark):
    from wedge_parallel_triangle_counting_spark.operators.graph import (
        degrees,
        symmetrize,
    )

    from .conftest import K4, edges_df

    rep = degree_distribution_report(degrees(symmetrize(edges_df(spark, K4))))
    assert rep["n"] == 4
    assert rep["max_degree"] == 3
    assert rep["total_wedges"] == 4 * 3  # 4 vertices, C(3,2)=3 wedges each
