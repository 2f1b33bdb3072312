"""Plan-quality assertions: the optimizations we rely on at 100 TB
must actually appear in the physical plan (column pruning, filter
pushdown, broadcast joins). Guard against regressions that silently
turn a pruned scan into a full-table read."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _read_schema(df) -> str:
    import re

    plan = _plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    return m.group(1)


def test_token_count_prunes_text_only(spark):
    from wedge_parallel_triangle_counting_spark.operators.textstats import token_count

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    schema = _read_schema(token_count(docs))
    # the scan must not materialize the unused wide columns
    assert "source" not in schema
    assert "n_chars" not in schema
    assert "text" in schema


def test_derived_edges_scan_prunes_lineitem(spark):
    from wedge_parallel_triangle_counting_spark.plans import testdata

    df = testdata.derived_edges(spark, SF)
    schema = _read_schema(df)
    assert "l_extendedprice" not in schema
    assert "l_shipdate" not in schema
    assert "l_orderkey" in schema


def test_query_filter_pushdown(spark):
    from wedge_parallel_triangle_counting_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(cosine_topk(emb, query_limit=10))
    assert "PushedFilters" in plan
    assert "LessThan(vec_id,10)" in plan.replace(" ", "").replace("`", "") or "LessThan" in plan


def test_fused_prep_single_edge_shuffle(spark):
    """prepare_oriented_fast: exactly ONE edge-sized exchange — dedup,
    degrees, orientation joins and the CSR sort all reuse the initial
    hash(src) partitioning (VERDICT r1 item 1)."""
    from wedge_parallel_triangle_counting_spark.operators.graph import (
        prepare_oriented_fast,
    )
    from wedge_parallel_triangle_counting_spark.plans import testdata

    edges = testdata.derived_edges(spark, SF)
    caches: list = []
    oriented, _deg, _n, _mx, _st = prepare_oriented_fast(edges, 8, caches=caches)
    plan = _plan(oriented.sortWithinPartitions("src", "dst"))
    import re

    # Shuffle exchanges (BroadcastExchange of the tiny degree table is
    # expected and fine). The cached AQE subtree prints both a Final
    # and an Initial rendering of the SAME exchange, and once per
    # reference — skip Initial sections and dedupe by plan_id.
    shuffles = set()
    in_initial = False
    for line in plan.splitlines():
        if "== Initial Plan ==" in line:
            in_initial = True
        elif "== Final Plan ==" in line:
            in_initial = False
        elif not in_initial:
            m = re.search(r"Exchange (hash|range)partitioning[^\[]*\[plan_id=(\d+)\]", line)
            if m:
                shuffles.add((m.group(1), m.group(2)))
    assert len(shuffles) <= 1, plan
    assert all(kind == "hash" for kind, _ in shuffles), plan
    # the in-partition sort must not be a global sort
    assert "Sort [src" in plan and ", false, 0" in plan
    for c in caches:
        c.unpersist()


def test_wedge_range_partitioner_is_range_partitioning(spark):
    """partitioner="wedge_range" must produce a RangePartitioning
    exchange on the wedge-cumsum pid (VERDICT r1 item 7)."""
    from wedge_parallel_triangle_counting_spark.operators.graph import (
        prepare_oriented_fast,
    )
    from wedge_parallel_triangle_counting_spark.operators.triangles import (
        _wedge_range_flat,
    )
    from wedge_parallel_triangle_counting_spark.plans import testdata

    edges = testdata.derived_edges(spark, SF)
    caches: list = []
    oriented, _deg, _n, _mx, _st = prepare_oriented_fast(edges, 8, caches=caches)
    odeg = oriented.groupBy("src").agg(F.count("*").alias("deg"))
    flat = _wedge_range_flat(oriented, odeg, 8, caches)
    plan = _plan(flat)
    assert "rangepartitioning(pid" in plan, plan
    for c in caches:
        c.unpersist()


def test_relabel_broadcasts_small_dictionary(spark):
    from wedge_parallel_triangle_counting_spark.operators import graph as G

    from .conftest import K4, edges_df

    sym = G.symmetrize(edges_df(spark, K4))
    deg = G.degrees(sym)
    ranks = G.degree_rank(deg, "window")
    plan = _plan(G.relabel(sym, ranks, n=4))
    assert "BroadcastHashJoin" in plan
