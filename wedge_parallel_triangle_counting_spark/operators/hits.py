"""HITS (hubs and authorities, Kleinberg) over a directed edge table.

The natural companion to PageRank for a link graph: authority(v) sums
the hub scores of pages linking TO v; hub(u) sums the authority
scores of pages u links to; each half-step is L2-normalized. Not in
the reference (a triangle-counting engine) — part of the north-rule
link-analysis surface alongside PageRank/components/labelprop.

Deterministic semantics (mirrored by the unrolled SQL oracle,
plans/oracles.py::hits_sql):
- graph: distinct directed edges, self loops dropped;
- a_0 = h_0 = 1 for every vertex in src ∪ dst;
- iteration k: a'(v) = Σ_{u→v} h_{k-1}(u);  a_k = a'/‖a'‖₂
             then h'(u) = Σ_{u→v} a_k(v);   h_k = h'/‖h'‖₂
  (the classic sequential update — authorities first, hubs read the
  NEW authorities);
- fixed iteration count (the reproducible contract, like labelprop).

Scale shape: the edge table is clustered ONCE (hash(dst) — the
authority half-step's join key; the hub half-step joins on src and
pays the one exchange AQE can't avoid); each half-step is one join +
one aggregation, and the L2 norm rides as a 1-row crossJoin broadcast
exactly like PageRank's dangling-mass term — no driver actions inside
the loop beyond the per-iteration checkpoint count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpointing import CheckpointedLoop, loop_partitions
from .graph import normalize_edges


def hits(
    edges: DataFrame,
    num_iters: int = 5,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    dual_edge_copies: bool = True,
) -> DataFrame:
    """Returns DataFrame [v: long, hub: double, authority: double].

    `dual_edge_copies` (default) persists the clean edge table TWICE —
    hash(src)- and hash(dst)-clustered — so BOTH half-step joins are
    co-partitioned with the hash(v) state and no edge-sized exchange
    happens inside the loop (one extra exchange at setup buys
    2·num_iters of them; the per-iteration cost is then only the two
    contribution aggregations). Off = single dst-clustered copy, the
    hub half-step re-exchanges the edges by src every iteration —
    kept for A/B."""
    spark = edges.sparkSession
    npart = loop_partitions(spark)
    e = (
        normalize_edges(edges)
        .filter(F.col("src") != F.col("dst"))
        .repartition(npart, "dst")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    e_src = e.repartition(npart, "src").persist() if dual_edge_copies else e
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .repartition(npart, "v")
    )

    loop = CheckpointedLoop(
        spark,
        "hits",
        checkpoint_dir,
        checkpoint_every,
        fingerprint=({"edges": e.count()} if checkpoint_dir else None),
    )
    start = 0
    state = None
    if resume:
        got = loop.resume()
        if got is not None:
            state, start = got
    if state is None:
        state = verts.select(
            "v", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
        )

    for it in range(start, num_iters):
        # SPARSE state: vertices with zero hub/authority carry no
        # information through the loop (they contribute nothing to
        # either half-step's sum or to the L2 norms), so the
        # per-iteration relations hold only nonzero rows and the full
        # vertex set is joined back ONCE after the loop — two fewer
        # joins per iteration.
        #
        # The unnormalized half is PERSISTED before the norm branch
        # reads it — otherwise the raw aggregation lineage is computed
        # once for the norm and again for the normalized values (and
        # the hub half compounds it), measured ~2x the whole loop.
        a_un = (
            e_src.join(state.select(F.col("v").alias("src"), "hub"), "src")
            .filter(F.col("hub") != 0.0)
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum("hub").alias("a_raw"))
            .persist()
        )
        a_norm = a_un.agg(
            F.sqrt(F.coalesce(F.sum(F.col("a_raw") * F.col("a_raw")), F.lit(0.0))).alias("nrm")
        )
        a = a_un.crossJoin(F.broadcast(a_norm)).select(
            "v",
            F.when(F.col("nrm") > 0, F.col("a_raw") / F.col("nrm"))
            .otherwise(F.lit(0.0))
            .alias("authority"),
        )
        # hub half-step reads the NEW authorities
        h_un = (
            e.join(a.select(F.col("v").alias("dst"), "authority"), "dst")
            .groupBy(F.col("src").alias("v"))
            .agg(F.sum("authority").alias("h_raw"))
            .persist()
        )
        h_norm = h_un.agg(
            F.sqrt(F.coalesce(F.sum(F.col("h_raw") * F.col("h_raw")), F.lit(0.0))).alias("nrm")
        )
        h = h_un.crossJoin(F.broadcast(h_norm)).select(
            "v",
            F.when(F.col("nrm") > 0, F.col("h_raw") / F.col("nrm"))
            .otherwise(F.lit(0.0))
            .alias("hub"),
        )
        state = h.join(a, "v", "full").select(
            "v",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
        state = loop.step(state, it, eager=False)
        loop.history[-1]["extra"]["n"] = state.count()
        a_un.unpersist()
        h_un.unpersist()

    # densify once: the sparse loop state only carries nonzero rows
    out = verts.join(state, "v", "left").select(
        "v",
        F.coalesce("hub", F.lit(0.0)).alias("hub"),
        F.coalesce("authority", F.lit(0.0)).alias("authority"),
    ).localCheckpoint(eager=True)
    e.unpersist()
    if dual_edge_copies:
        e_src.unpersist()
    return out
