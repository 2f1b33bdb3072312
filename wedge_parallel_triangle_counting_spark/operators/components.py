"""Connected components. Default strategy="star": the large-star/
small-star trick (Kiveris et al., "Connected Components in MapReduce
and Beyond"), which contracts paths doubly-logarithmically — the right
choice on web-scale graphs whose diameter is large.

strategy="hashmin" keeps the classic label propagation: label(v)
starts at v; each iteration takes the min of the vertex's own label
and its neighbors' labels over the symmetrized edge set; converges in
O(diameter) rounds. Both return component = min vertex id in the
component (the oracle's reachability definition).

Per-iteration cost: one join + one agg, same key (v) — static edge
side pre-partitioned and persisted. Lineage truncated per iteration;
durable checkpoint + manifest on cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpointing import CheckpointedLoop
from .graph import normalize_edges, symmetrize


def connected_components(
    edges: DataFrame,
    max_iters: int = 50,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    strategy: str = "star",
    partition_stats: bool = False,
) -> DataFrame:
    """Returns DataFrame [v: long, component: long] (component = min
    vertex id in the component). Isolated vertices don't exist here —
    the vertex set is induced by the edge table."""
    if strategy == "star":
        return _components_star(
            edges, max_iters, checkpoint_dir, checkpoint_every, resume
        )
    if strategy != "hashmin":
        raise ValueError(f"unknown strategy {strategy!r}")

    spark = edges.sparkSession
    npart = spark.sparkContext.defaultParallelism
    sym = symmetrize(normalize_edges(edges)).repartition(npart, "src").persist()
    verts = sym.select(F.col("src").alias("v")).distinct()

    # input fingerprint (edge count) guards resume() against a changed
    # graph; only computed when durable checkpointing is on
    fp = {"sym_edges": sym.count()} if checkpoint_dir else None
    loop = CheckpointedLoop(
        spark,
        "components",
        checkpoint_dir,
        checkpoint_every,
        collect_partition_stats=partition_stats,
        fingerprint=fp,
    )
    start = 0
    labels = None
    if resume:
        got = loop.resume()
        if got is not None:
            labels, start = got
    if labels is None:
        labels = verts.select("v", F.col("v").alias("component"))

    for it in range(start, max_iters):
        # min over self label and neighbor labels
        nbr_min = (
            sym.join(labels, sym.dst == labels.v)
            .select(F.col("src").alias("v"), F.col("component").alias("c"))
            .groupBy("v")
            .agg(F.min("c").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, "v", "left")
            .select(
                "v",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        # materialize first, then check convergence on the checkpointed
        # state (avoids running the iteration plan twice)
        new_labels = loop.step(new_labels, it)
        changed = (
            new_labels.alias("a")
            .join(labels.alias("b"), "v")
            .filter(F.col("a.component") != F.col("b.component"))
            .count()
        )
        loop.history[-1]["extra"]["changed"] = changed
        labels = new_labels
        if changed == 0:
            break
    if loop.history:  # state is localCheckpointed — sym no longer needed
        sym.unpersist()
    return labels.select("v", "component")


def _components_star(
    edges: DataFrame,
    max_iters: int,
    checkpoint_dir: str | None,
    checkpoint_every: int,
    resume: bool,
) -> DataFrame:
    """Alternating large-star / small-star contraction. State is the
    parent pointer table; converges when the edge relation is a star
    forest. Doubly-logarithmic rounds — preferred at 100 TB scale."""
    spark = edges.sparkSession
    npart = spark.sparkContext.defaultParallelism

    # undirected pair set, canonical (large, small) per row — built
    # DIRECTLY as a canonical dedup (one m-row shuffle; symmetrize+
    # filter would shuffle 2m) and persisted: round 1 reads it three
    # times (count, both union branches)
    clean = normalize_edges(edges).filter(F.col("src") != F.col("dst"))
    e = (
        clean.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .repartition(npart, "src")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    prev_cnt = e.count()
    fp = {"canonical_edges": prev_cnt} if checkpoint_dir else None
    loop = CheckpointedLoop(
        spark, "components_star", checkpoint_dir, checkpoint_every, fingerprint=fp
    )
    cur = e
    start = 0
    if resume:
        got = loop.resume()
        if got is not None:
            cur, start = got
            prev_cnt = cur.count()

    for it in range(start, max_iters):
        # large-star: for each u, connect all strictly-larger neighbors
        # to min(neighborhood ∪ {u})
        nbrs = cur.select("src", "dst").unionByName(
            cur.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = nbrs.groupBy("src").agg(F.min("dst").alias("mn"))
        # no intermediate distinct: downstream min-aggs are
        # duplicate-insensitive and new_cur ends in a distinct — the
        # duplicate factor is bounded by the round's edge count, and
        # dropping it saves a full shuffle per round
        large = (
            nbrs.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.least("mn", F.col("src")).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        # small-star: for each u, connect all smaller-or-equal neighbors
        # to the min
        nbrs2 = large.select("src", "dst").unionByName(
            large.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # self rows (u, u) need no dedup: min-agg and the final
        # distinct absorb duplicates, and dropping the distinct saves
        # one shuffle per round
        small_nbrs = nbrs2.filter(F.col("dst") < F.col("src")).unionByName(
            nbrs2.select(F.col("src"), F.col("src").alias("dst"))
        )
        mins2 = small_nbrs.groupBy("src").agg(F.min("dst").alias("mn"))
        small = (
            small_nbrs.join(mins2, "src")
            .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        new_cur = small.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        ).distinct()
        # materialize first; then test edge-set stability. Both sides
        # are distinct canonical sets, so equal counts + empty one-way
        # anti-join ⇒ equality — one cheap count on the checkpointed
        # frame per round, and the anti-join only on count ties
        # (replaces two shuffling exceptAll jobs per round).
        new_cur = loop.step(new_cur, it, eager=False)
        new_cnt = new_cur.count()  # materializes the lazy checkpoint
        converged = False
        if new_cnt == prev_cnt:
            converged = (
                new_cur.join(cur, ["src", "dst"], "left_anti").isEmpty()
            )
        loop.history[-1]["extra"]["edges"] = new_cnt
        cur = new_cur
        prev_cnt = new_cnt
        if converged:
            break

    # parent table: every vertex points to its component min (vertex
    # set from the persisted canonical edges — materialized via
    # localCheckpoint so `e` can be released before returning the
    # still-lazy result)
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    parents = cur.select(F.col("src").alias("v"), F.col("dst").alias("component"))
    return (
        verts.join(parents, "v", "left")
        .select("v", F.coalesce("component", F.col("v")).alias("component"))
    )
