"""Directed SCC + bow-tie: python Tarjan-style oracle on random
digraphs, a handcrafted fixture exercising every bow-tie class, and
degenerate inputs."""

from __future__ import annotations

import random

import pytest

from wedge_parallel_triangle_counting_spark.operators.bowtie import (
    bowtie_decomposition,
)
from wedge_parallel_triangle_counting_spark.operators.scc import (
    strongly_connected_components,
)

from .conftest import edges_df

# core 3-cycle {10,11,12}; IN chain 0->1->10; OUT chain 12->20->21;
# tube 1->30->20; tendril-from-IN 1->40; tendril-to-OUT 50->20;
# disconnected 2-cycle {60,61}
ALL_CLASSES = [
    (10, 11), (11, 12), (12, 10),
    (0, 1), (1, 10),
    (12, 20), (20, 21),
    (1, 30), (30, 20),
    (1, 40),
    (50, 20),
    (60, 61), (61, 60),
]


def python_scc(pairs):
    """Iterative Tarjan over the cleaned directed edge set; returns
    {v: min id of its SCC} for the induced vertex set."""
    adj: dict[int, list[int]] = {}
    verts = set()
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, []).append(d)
        verts.update((s, d))
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    result: dict[int, int] = {}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    result[w] = m
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])

    for v in sorted(verts):
        if v not in index:
            strongconnect(v)
    return result


def _random_digraph(seed, n, m):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def test_scc_all_classes_fixture(spark):
    got = {
        r.v: r.scc
        for r in strongly_connected_components(
            edges_df(spark, ALL_CLASSES)
        ).collect()
    }
    assert got == python_scc(ALL_CLASSES)
    assert got[11] == 10 and got[61] == 60 and got[0] == 0


def test_bowtie_all_classes_fixture(spark):
    bt = {
        r.cls: r.n_vertices
        for r in bowtie_decomposition(edges_df(spark, ALL_CLASSES)).collect()
    }
    assert bt == {
        "core": 3,
        "in": 2,
        "out": 2,
        "tube": 1,
        "tendril": 2,
        "disconnected": 2,
    }


@pytest.mark.parametrize("seed,n,m", [(3, 30, 60), (9, 50, 75), (23, 40, 160)])
def test_scc_random_matches_tarjan(spark, seed, n, m):
    pairs = _random_digraph(seed, n, m)
    got = {
        r.v: r.scc
        for r in strongly_connected_components(edges_df(spark, pairs)).collect()
    }
    assert got == python_scc(pairs)


def test_scc_degenerate(spark):
    # self-loops only -> empty induced vertex set
    assert (
        strongly_connected_components(
            edges_df(spark, [(1, 1), (2, 2)])
        ).count()
        == 0
    )
    # pure DAG chain with INCREASING ids — the trim phase must peel it
    # without one coloring fixpoint per vertex
    chain = [(i, i + 1) for i in range(12)]
    got = {
        r.v: r.scc
        for r in strongly_connected_components(
            edges_df(spark, chain), max_outer=3
        ).collect()
    }
    assert got == {v: v for v in range(13)}


def test_bowtie_single_cycle(spark):
    # one cycle and nothing else: everything is core
    cyc = [(0, 1), (1, 2), (2, 0)]
    bt = {
        r.cls: r.n_vertices for r in bowtie_decomposition(edges_df(spark, cyc)).collect()
    }
    assert bt == {"core": 3}


def test_densest_subgraph_finds_planted_clique(spark):
    from wedge_parallel_triangle_counting_spark.operators.densest import (
        densest_subgraph,
    )

    # sparse 40-vertex ring (density 1) + K12 on {100..111} (density 5.5).
    # Round 0: n=52, m=106, peel keeps deg*52 > 424 i.e. deg >= 9 —
    # exactly the clique (deg 11); the ring (deg 2) is stripped, so the
    # best round must be round 1 = the planted clique itself.
    ring = [(i, (i + 1) % 40) for i in range(40)]
    k12 = [(100 + a, 100 + b) for a in range(12) for b in range(a + 1, 12)]
    row = densest_subgraph(edges_df(spark, ring + k12)).collect()[0]
    assert (row.n_vertices, row.n_edges) == (12, 66)
    assert row.best_round == 1
    assert row.density_ppm == 66 * 1_000_000 // 12


def test_densest_subgraph_empty_and_uniform(spark):
    from wedge_parallel_triangle_counting_spark.operators.densest import (
        densest_subgraph,
    )

    assert densest_subgraph(edges_df(spark, [(1, 1)])).count() == 0
    # a triangle: the whole graph is the densest subgraph, round 0
    row = densest_subgraph(edges_df(spark, [(0, 1), (1, 2), (2, 0)])).collect()[0]
    assert (row.best_round, row.n_vertices, row.n_edges) == (0, 3, 3)
