"""Redirect resolution, Katz centrality, spam mass, quadrilaterals."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import C4, K4, edges_df
from wedge_parallel_triangle_counting_spark.operators.katz import (
    katz_centrality_scaled,
)
from wedge_parallel_triangle_counting_spark.operators.motifs import (
    quadrilateral_count,
)
from wedge_parallel_triangle_counting_spark.operators.pagerank import (
    pagerank,
    spam_mass,
)
from wedge_parallel_triangle_counting_spark.operators.redirects import (
    resolve_redirects,
)


def test_resolve_redirects_chain_cycle_terminal(spark):
    # chain 1→2→3→4 (4 terminal), loop 10↔11, self-redirect 20→20
    # (dropped ⇒ 20 never enters the universe), duplicate source
    # 1→{2, 9} keeps min target 2 — and 9, appearing only in the
    # losing duplicate, leaves the universe with it
    red = edges_df(
        spark, [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 20), (1, 9)]
    )
    rows = {r.url: r for r in resolve_redirects(red, rounds=4).collect()}
    assert set(rows) == {1, 2, 3, 4, 10, 11}
    assert (rows[1].final_url, rows[1].hops, rows[1].resolved) == (4, 3, True)
    assert (rows[2].final_url, rows[2].hops) == (4, 2)
    assert (rows[3].final_url, rows[3].hops) == (4, 1)
    assert (rows[4].final_url, rows[4].hops) == (4, 0)  # terminal: itself
    for v in (10, 11):  # redirect loop: unresolved
        assert (rows[v].final_url, rows[v].hops, rows[v].resolved) == (
            None,
            None,
            False,
        )


def test_resolve_redirects_long_chain_doubling(spark):
    # a 12-hop chain resolves in 4 doubling rounds (2^4 = 16 ≥ 12)
    red = edges_df(spark, [(i, i + 1) for i in range(12)])
    rows = {r.url: r for r in resolve_redirects(red, rounds=4).collect()}
    assert all(r.resolved for r in rows.values())
    assert (rows[0].final_url, rows[0].hops) == (12, 12)
    # and does NOT resolve in 3 rounds (2^3 = 8 < 12) — doubling depth
    # is really the bound being exercised
    short = {r.url: r for r in resolve_redirects(red, rounds=3).collect()}
    assert short[0].resolved is False


def test_katz_scaled_path_graph(spark):
    # path a→b→c, beta_den=2, K=3:
    # walks ending at a: none.  katz_scaled(a) = 0
    # b: w1={a→b}=1 ⇒ 1·2² = 4
    # c: w1={b→c}=1, w2={a→b→c}=1 ⇒ 1·2² + 1·2¹ = 6
    e = edges_df(spark, [(0, 1), (1, 2)])
    got = {
        r.v: int(r.katz_scaled)
        for r in katz_centrality_scaled(e, num_iters=3, beta_den=2).collect()
    }
    assert got == {0: 0, 1: 4, 2: 6}


def test_katz_scaled_cycle_counts_all_walks(spark):
    # 2-cycle: every walk of every length exists for both vertices:
    # katz_scaled(v) = Σ_{k=1..K} bd^(K-k) · 1 ; K=4, bd=8 ⇒ 585
    e = edges_df(spark, [(0, 1), (1, 0)])
    got = {
        r.v: int(r.katz_scaled) for r in katz_centrality_scaled(e).collect()
    }
    assert got == {0: 8**3 + 8**2 + 8 + 1, 1: 585}


def test_quadrilaterals_c4_and_k4(spark):
    # C4 has exactly one 4-cycle; K4 has 3 (each pair of disjoint
    # perfect matchings); endpoint_pairs = pairs with ≥1 common nbr
    # C4: only the 2 diagonal pairs share (two) common neighbors
    row = quadrilateral_count(edges_df(spark, C4)).collect()[0]
    assert (row.endpoint_pairs, row.quads) == (2, 1)
    row = quadrilateral_count(edges_df(spark, K4)).collect()[0]
    assert (row.endpoint_pairs, row.quads) == (6, 3)


def test_spam_mass_trusted_vs_orphan(spark):
    # trusted hub 0 links into a small web; vertex 99 is a link-farm
    # island no trusted rank can reach — its spam mass must be 1.0;
    # the trusted seed itself must score ≤ 0 (ppr concentrates on it)
    e = edges_df(
        spark,
        [(0, 1), (1, 2), (2, 0), (99, 98), (98, 99)],
    )
    sm = {r.v: r for r in spam_mass(e, trusted=[0], num_iters=8).collect()}
    assert sm[99].spam_mass == 1.0 and sm[98].spam_mass == 1.0
    assert sm[0].spam_mass <= 0.0
    # pr column equals a plain pagerank run rounded to 6
    pr = {
        r.v: round(r.pr, 6) for r in pagerank(e, num_iters=8).collect()
    }
    assert {v: r.pr for v, r in sm.items()} == pr


def test_spam_mass_columns_nullsafe(spark):
    sm = spam_mass(edges_df(spark, [(0, 1)]), trusted=[0], num_iters=2)
    row = sm.filter(F.col("v") == 1).collect()[0]
    assert row.pr > 0 and row.trust > 0


def brute_salsa(pairs, num_iters):
    """Textbook SALSA chains (dict loops), independent of the
    operator's fused-forward-step formulation."""
    e = sorted({(a, b) for a, b in pairs if a != b})
    outd, ind = {}, {}
    for a, b in e:
        outd[a] = outd.get(a, 0) + 1
        ind[b] = ind.get(b, 0) + 1
    a_side, h_side = sorted(ind), sorted(outd)
    a = {v: 1.0 / len(a_side) for v in a_side}
    h = {v: 1.0 / len(h_side) for v in h_side}
    for _ in range(num_iters):
        x = {}
        for u, w in e:
            x[u] = x.get(u, 0.0) + a.get(w, 0.0) / ind[w]
        a_new, y = {}, {}
        for u, w in e:
            a_new[w] = a_new.get(w, 0.0) + x.get(u, 0.0) / outd[u]
            y[w] = y.get(w, 0.0) + h.get(u, 0.0) / outd[u]
        h_new = {}
        for u, w in e:
            h_new[u] = h_new.get(u, 0.0) + y.get(w, 0.0) / ind[w]
        a, h = a_new, h_new
    return a, h


def test_salsa_matches_bruteforce_and_conserves_mass(spark):
    import random

    from wedge_parallel_triangle_counting_spark.operators.salsa import salsa

    rng = random.Random(5)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(60)]
    want_a, want_h = brute_salsa(pairs, 4)
    rows = salsa(edges_df(spark, pairs), num_iters=4).collect()
    got_a = {r.v: r.authority for r in rows}
    got_h = {r.v: r.hub for r in rows}
    for v, val in want_a.items():
        assert abs(got_a[v] - val) < 1e-12, ("a", v)
    for v, val in want_h.items():
        assert abs(got_h[v] - val) < 1e-12, ("h", v)
    # stochastic chains: both scores are probability distributions
    assert abs(sum(got_a.values()) - 1.0) < 1e-9
    assert abs(sum(got_h.values()) - 1.0) < 1e-9


def test_salsa_degenerate(spark):
    from wedge_parallel_triangle_counting_spark.operators.salsa import salsa

    empty = spark.createDataFrame([], "src long, dst long")
    assert salsa(empty, num_iters=2).count() == 0
    # single edge: all mass sits on the only hub / only authority
    rows = {r.v: r for r in salsa(edges_df(spark, [(0, 1)]), num_iters=3).collect()}
    assert rows[0].hub == 1.0 and rows[1].authority == 1.0
    assert rows[0].authority == 0.0 and rows[1].hub == 0.0
