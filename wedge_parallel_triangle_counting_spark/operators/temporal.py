"""Temporal link-graph operators: snapshot-to-snapshot diff.

A recurring crawl produces a graph per crawl (warc_ts snapshot); the
deltas between consecutive snapshots drive freshness scoring, dead-
link pruning, and incremental recomputation (feed ONLY the added/
removed edges to the streaming triangle maintainer instead of
recounting the world).

edge_snapshot_diff is one full-outer equi-join on the edge key —
shuffle both inputs on (src, dst) once, no driver state. At 10^12
edges per snapshot the join is the unavoidable cost; everything
downstream (per-status rollups, per-host churn) aggregates a
#changed-edges-sized relation, which real crawls keep orders of
magnitude below the snapshot size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(src, dst, status) for the union of both snapshots' distinct
    edge sets: 'kept' (in both), 'added' (new only), 'removed' (old
    only). Self-loops are kept as data — a diff operator must not
    editorialize its input."""
    o = old.select("src", "dst").distinct().withColumn("in_old", F.lit(True))
    n = new.select("src", "dst").distinct().withColumn("in_new", F.lit(True))
    return (
        o.join(n, ["src", "dst"], "full_outer")
        .select(
            "src",
            "dst",
            F.when(F.col("in_old") & F.col("in_new"), F.lit("kept"))
            .when(F.col("in_new"), F.lit("added"))
            .otherwise(F.lit("removed"))
            .alias("status"),
        )
    )


def edge_churn_by_group(
    diff: DataFrame, group_col, group_name: str = "grp"
) -> DataFrame:
    """Rollup of a diff to (grp, n_added, n_removed, n_kept,
    churn_ppm): churn = (added + removed) / (added + removed + kept)
    of the group's edge universe, exact integer ppm. `group_col` is
    any column expression over (src, dst) — host of src, src DIV
    bucket, a join key."""
    return (
        diff.select(group_col.alias(group_name), "status")
        .groupBy(group_name)
        .agg(
            F.sum(F.when(F.col("status") == "added", 1).otherwise(0)).alias("n_added"),
            F.sum(F.when(F.col("status") == "removed", 1).otherwise(0)).alias(
                "n_removed"
            ),
            F.sum(F.when(F.col("status") == "kept", 1).otherwise(0)).alias("n_kept"),
        )
        .select(
            group_name,
            "n_added",
            "n_removed",
            "n_kept",
            F.expr(
                "(n_added + n_removed) * 1000000"
                " DIV greatest(n_added + n_removed + n_kept, 1)"
            ).alias("churn_ppm"),
        )
        .orderBy(group_name)
    )
