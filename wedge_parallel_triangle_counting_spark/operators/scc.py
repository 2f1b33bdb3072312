"""Strongly connected components of the DIRECTED link graph, plus the
Broder et al. bow-tie decomposition built on top of it.

The reference's component notion is undirected (its graphs are
symmetrized at parse time, tc.cu:611-618); a web-scale link graph is
directed, and the canonical Common-Crawl-style analyses — "which pages
are mutually reachable" (SCC) and the bow-tie map (CORE / IN / OUT /
TUBES / TENDRILS / DISCONNECTED, Broder et al., "Graph structure in
the web", WWW 2000) — need directed reachability. This module adds
both as first-class operators over the same edge table.

Algorithm: Orzan-style coloring SCC (the standard distributed /
Pregel formulation, also GraphX's shape):

  repeat until no active vertices:
    1. forward-min coloring: c(v) = min id over {v} ∪ ancestors(v)
       within the active subgraph — a hashmin fixpoint over the
       DIRECTED edges (one join + one agg per round, the exact loop
       shape of the undirected hashmin in components.py).
    2. every color root r (c(r) = r) is the minimum id of its SCC:
       if some v < r were in SCC(r), v would be an ancestor of r and
       c(r) ≤ v < r — contradiction. The SCC of r is exactly the
       vertices of color r that REACH r through same-color vertices
       (mutual reachability: r reaches the whole color class forward
       by construction; same-color intermediate vertices suffice
       because every vertex on a v→r path inside... is itself an
       ancestor-of-r with an ancestor chain from r's class min — its
       color is ≤ r via v's path and ≥ r since paths from the root
       class dominate; see Orzan 2004, §4.2).
    3. assign scc = color for the marked vertices, remove them from
       the active subgraph, repeat.

  Each outer round removes at least every source-SCC of the remaining
  condensation (any SCC whose minimum vertex has no smaller ancestor),
  so the outer round count is bounded by the longest chain of SCCs in
  the condensation — small for web graphs, whose condensations are
  shallow (the bow-tie is 3 levels deep plus tendril chains).

Scale shape: state per loop is one [v, label] table repartitioned to
the loop layout; the directed edge table is exchanged ONCE per
orientation (`fwd` clustered on dst for the coloring join, `rev` on
src for the backward mark join) and reused across all rounds and all
outer iterations, filtered by the shrinking active set with a
broadcast-friendly semi-join. No driver-side collection anywhere;
per-round frames are lineage-truncated with lazy localCheckpoints
whose materializing action is the round's convergence count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpointing import CheckpointedLoop, loop_partitions
from .graph import normalize_edges


def _clean_directed(edges: DataFrame, npart: int) -> DataFrame:
    """Distinct directed edges, self-loops dropped (a self-loop never
    changes mutual reachability), clustered on dst for the forward-min
    join."""
    return (
        normalize_edges(edges)
        .filter(F.col("src") != F.col("dst"))
        .repartition(npart, "dst")
        .dropDuplicates(["src", "dst"])
    )


def strongly_connected_components(
    edges: DataFrame,
    max_outer: int = 20,
    max_inner: int = 60,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Returns DataFrame [v: long, scc: long], scc = min vertex id of
    the strongly connected component (singleton SCCs get their own id;
    the vertex set is induced by the cleaned edge table, matching
    components.connected_components).

    `max_inner` bounds each reachability fixpoint (rounds needed =
    directed diameter of the surviving subgraph); `max_outer` bounds
    condensation-chain peeling. Both raise if exhausted before
    convergence — a truncated SCC answer is silently wrong, unlike a
    truncated BFS."""
    spark = edges.sparkSession
    npart = loop_partitions(spark)
    e = _clean_directed(edges, npart).persist()
    m = e.count()
    if m == 0:
        e.unpersist()
        return spark.createDataFrame([], "v long, scc long")

    fwd = e  # clustered on dst: coloring joins labels (on src) → agg by dst
    rev = (
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        .repartition(npart, "dst")
        .persist()
    )
    rev.count()

    loop = CheckpointedLoop(
        spark,
        "scc",
        checkpoint_dir,
        checkpoint_every,
        fingerprint={"edges": m} if checkpoint_dir else None,
    )

    active = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .repartition(npart, "v")
        .localCheckpoint(eager=True)
    )
    done: DataFrame | None = None
    step = 0  # global step counter for the checkpoint loop history

    for outer in range(max_outer):
        n_active = active.count()
        if n_active == 0:
            break

        # --- 0. trim: peel vertices with no in-edges or no out-edges
        # in the active subgraph — each is its own singleton SCC. The
        # DAG periphery (tendril chains, the orderkey-derived tree
        # fringe) disappears here in one cheap job per chain level
        # instead of one coloring+marking FIXPOINT per level, which is
        # what makes the outer round count small in practice (FW-BW-
        # Trim, McLendon et al.). Trim is an optimization only — a
        # partially-trimmed active set is still handled correctly by
        # the coloring peel below, so hitting max_inner here just
        # falls through.
        for _ in range(max_inner):
            ef = fwd.join(
                active.withColumnRenamed("v", "src"), "src", "left_semi"
            ).join(active.withColumnRenamed("v", "dst"), "dst", "left_semi")
            srcs = ef.select(F.col("src").alias("v")).distinct()
            dsts = ef.select(F.col("dst").alias("v")).distinct()
            nontrivial = srcs.join(dsts, "v", "left_semi")
            trivial = active.join(nontrivial, "v", "left_anti").localCheckpoint(
                eager=False
            )
            n_triv = trivial.count()
            if n_triv == 0:
                break
            assigned = trivial.select("v", F.col("v").alias("scc"))
            done = (
                assigned
                if done is None
                else done.unionByName(assigned).localCheckpoint(eager=False)
            )
            active = active.join(trivial, "v", "left_anti").localCheckpoint(
                eager=False
            )
        n_active = active.count()
        if n_active == 0:
            break

        # edges of the active subgraph: two semi-joins against the
        # (shrinking) active set; re-clustered once per outer round
        # and reused by every inner round
        ea = (
            fwd.join(active.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("v", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .repartition(npart, "dst")
            .persist()
        )
        ra = (
            rev.join(active.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("v", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .repartition(npart, "dst")
            .persist()
        )

        # --- 1. forward-min coloring fixpoint --------------------------
        color = active.select("v", F.col("v").alias("c"))
        for it in range(max_inner):
            # min over in-neighbors' colors, folded into own color
            upd = (
                ea.join(
                    color.select(F.col("v").alias("src"), F.col("c").alias("cs")),
                    "src",
                )
                .groupBy("dst")
                .agg(F.min("cs").alias("nbr_min"))
            )
            new_color = (
                color.join(upd.withColumnRenamed("dst", "v"), "v", "left")
                .select(
                    "v",
                    F.least(
                        F.col("c"), F.coalesce(F.col("nbr_min"), F.col("c"))
                    ).alias("c"),
                )
            )
            new_color = loop.step(new_color, step, eager=False)
            step += 1
            changed = (
                new_color.alias("a")
                .join(color.alias("b"), "v")
                .filter(F.col("a.c") != F.col("b.c"))
                .count()
            )
            loop.history[-1]["extra"].update(
                {"outer": outer, "phase": "color", "changed": changed}
            )
            color = new_color
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"scc coloring did not converge in {max_inner} rounds "
                f"(outer {outer}); raise max_inner"
            )

        # --- 2. backward mark: v reaches its color root through
        # same-color vertices ------------------------------------------
        # seed: roots (c(v) == v); grow along REVERSED edges restricted
        # to same-color endpoints
        marked = color.filter(F.col("v") == F.col("c")).select("v", "c")
        frontier = marked
        for it in range(max_inner):
            grown = (
                ra.join(
                    frontier.select(F.col("v").alias("src"), "c"), "src"
                )
                .select(F.col("dst").alias("v"), "c")
                .distinct()
                .join(
                    color.select("v", F.col("c").alias("cv")), "v"
                )
                .filter(F.col("c") == F.col("cv"))
                .select("v", "c")
            )
            new_frontier = grown.join(marked, "v", "left_anti")
            marked = loop.step(marked.unionByName(new_frontier), step, eager=False)
            step += 1
            frontier = new_frontier.localCheckpoint(eager=False)
            n_new = frontier.count()
            loop.history[-1]["extra"].update(
                {"outer": outer, "phase": "mark", "frontier": n_new}
            )
            if n_new == 0:
                break
        else:
            raise RuntimeError(
                f"scc backward mark did not converge in {max_inner} rounds "
                f"(outer {outer}); raise max_inner"
            )

        assigned = marked.select("v", F.col("c").alias("scc"))
        done = (
            assigned
            if done is None
            else done.unionByName(assigned).localCheckpoint(eager=False)
        )
        active = active.join(marked.select("v"), "v", "left_anti").localCheckpoint(
            eager=False
        )
        # one action materializes both lazy checkpoints for the round
        ea.unpersist()
        ra.unpersist()

    else:
        if active.count() > 0:
            raise RuntimeError(
                f"scc did not finish in {max_outer} outer rounds; "
                "raise max_outer"
            )

    out = done.repartition(npart, "v").localCheckpoint(eager=True)
    e.unpersist()
    rev.unpersist()
    return out
