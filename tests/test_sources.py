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


def test_read_matrix_market_multi_file(spark, tmp_path):
    # ADVICE r1 (medium): one size line PER FILE must be dropped — a
    # global-min approach would parse the 2nd file's size line as an
    # edge (5 6 → a bogus vertex pair)
    d = tmp_path / "mm"
    d.mkdir()
    (d / "a.mtx").write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n3 3 2\n1 2\n2 3\n"
    )
    (d / "b.mtx").write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n5 6 1\n1 3\n"
    )
    edges = read_matrix_market(spark, str(d))
    got = sorted((r.src, r.dst) for r in edges.collect())
    assert got == [(0, 1), (0, 2), (1, 2)]  # NOT (4, 5) from "5 6 1"


def test_write_degree_profile(spark, tmp_path):
    # S5 sink contract (reference print_degrees, tc.cu:795-814):
    # sampled (v, degree) rows land as csv; sample of a 4-vertex table
    # with num >= n is the full table
    from wedge_parallel_triangle_counting_spark.operators.graph import (
        degrees,
        symmetrize,
    )
    from wedge_parallel_triangle_counting_spark.sources.sinks import (
        write_degree_profile,
    )

    from .conftest import K4, edges_df

    deg = degrees(symmetrize(edges_df(spark, K4)))
    out = tmp_path / "profile"
    write_degree_profile(deg, str(out), num=100)
    rows = sorted(
        (int(r.value.split(",")[0]), int(r.value.split(",")[1]))
        for r in spark.read.text(str(out)).collect()
    )
    assert rows == [(0, 3), (1, 3), (2, 3), (3, 3)]


def test_write_degree_profile_oneify(spark, tmp_path):
    # S5 oneify option (reference print_degrees(..., oneify),
    # tc.cu:795-814): the profile is the ORIENTED out-degree — each
    # undirected edge counted once at its lower-ranked endpoint — and
    # zero-out-degree vertices still appear. On K4 with id-order
    # orientation the out-degrees are 3, 2, 1, 0.
    from wedge_parallel_triangle_counting_spark.operators.graph import (
        degrees,
        orient,
        symmetrize,
    )
    from wedge_parallel_triangle_counting_spark.sources.sinks import (
        write_degree_profile,
    )

    from .conftest import K4, edges_df

    sym = symmetrize(edges_df(spark, K4))
    deg = degrees(sym)
    oriented = orient(sym)  # K4 ids are already degree-tied → id order
    out = tmp_path / "profile_oneify"
    write_degree_profile(deg, str(out), num=100, oneify=True, oriented=oriented)
    rows = sorted(
        (int(r.value.split(",")[0]), int(r.value.split(",")[1]))
        for r in spark.read.text(str(out)).collect()
    )
    assert rows == [(0, 3), (1, 2), (2, 1), (3, 0)]
    # the oneify profile sums to m (each edge once), not 2m
    assert sum(d for _, d in rows) == len(K4)


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


def test_write_result_and_metrics(spark, tmp_path):
    # S4 sink contract: result rows land in the chosen format; the
    # metrics sink appends one JSON line per run
    import json

    from wedge_parallel_triangle_counting_spark.sources.sinks import (
        write_result,
        write_run_metrics,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = tmp_path / "res"
    write_result(df, str(out), fmt="parquet")
    back = spark.read.parquet(str(out))
    assert sorted((r.id, r.s) for r in back.collect()) == [(1, "a"), (2, "b")]

    mpath = tmp_path / "metrics.jsonl"
    write_run_metrics(str(mpath), graph="g", triangles=7)
    write_run_metrics(str(mpath), graph="g", triangles=8)
    lines = [json.loads(x) for x in mpath.read_text().splitlines()]
    assert [x["triangles"] for x in lines] == [7, 8]
    assert all("ts" in x for x in lines)


def test_write_training_shards(spark, tmp_path):
    from wedge_parallel_triangle_counting_spark.sources.sinks import (
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(3 + i % 4))) for i in range(20)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, shard_tokens=10)
    # every doc written exactly once, shard = doc_id-ordered token cumsum
    back = spark.read.parquet(out)
    rows = {r.doc_id: r for r in back.collect()}
    assert len(rows) == 20
    tok_counts = {i: 3 + i % 4 for i in range(20)}
    start, expect_shard = 0, {}
    for i in range(20):
        expect_shard[i] = start // 10
        start += tok_counts[i]
    assert {i: rows[i].shard for i in rows} == expect_shard
    assert manifest["total_tokens"] == sum(tok_counts.values())
    assert manifest["n_docs"] == 20
    assert manifest["n_shards"] == len(set(expect_shard.values()))
    assert sum(s["n_tokens"] for s in manifest["shards"]) == manifest["total_tokens"]
    # partitioning-independence: a repartitioned input writes the SAME layout
    out2 = str(tmp_path / "shards2")
    m2 = write_training_shards(docs.repartition(7), out2, shard_tokens=10)
    assert m2 == manifest
