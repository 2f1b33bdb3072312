"""Sampled Brandes betweenness vs an independent brute-force."""

from __future__ import annotations

import collections
import random

from wedge_parallel_triangle_counting_spark.operators.betweenness import (
    betweenness_sampled,
)

from .conftest import edges_df


def brute_betweenness(pairs, sources, max_hops):
    """Textbook Brandes (BFS + dependency accumulation), restricted to
    `sources` and hop-truncated — written independently of the
    operator (dict/list loops, no level frames)."""
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    nodes = sorted(adj)
    bet = dict.fromkeys(nodes, 0.0)
    for s in sources:
        order = []
        preds = {v: [] for v in nodes}
        sigma = dict.fromkeys(nodes, 0)
        sigma[s] = 1
        dist = dict.fromkeys(nodes, -1)
        dist[s] = 0
        q = [s]
        while q:
            v = q.pop(0)
            if dist[v] >= max_hops:
                continue
            order.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        # include the last (truncation-depth) layer in the stack
        order = [v for v in nodes if dist[v] >= 0]
        order.sort(key=lambda v: dist[v])
        delta = dict.fromkeys(nodes, 0.0)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bet[w] += delta[w]
    return bet


def test_betweenness_path_golden(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    got = {
        r.v: r.betweenness
        for r in betweenness_sampled(
            edges_df(spark, pairs), num_sources=5, max_hops=8
        ).collect()
    }
    assert got == {0: 0.0, 1: 6.0, 2: 8.0, 3: 6.0, 4: 0.0}


def test_betweenness_matches_bruteforce(spark):
    rng = random.Random(11)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(70)]
    k, hops = 6, 4  # truncating hop cap, to exercise that path too
    nodes = sorted(
        {x for a, b in pairs if a != b for x in (a, b)}
    )
    want = brute_betweenness(pairs, nodes[:k], hops)
    got = {
        r.v: r.betweenness
        for r in betweenness_sampled(
            edges_df(spark, pairs), num_sources=k, max_hops=hops
        ).collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v


def test_betweenness_empty_and_selfloop(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert betweenness_sampled(empty, num_sources=4).count() == 0
    # all-self-loop graph cleans to empty
    loops = edges_df(spark, [(1, 1), (2, 2)])
    assert betweenness_sampled(loops, num_sources=4).count() == 0
