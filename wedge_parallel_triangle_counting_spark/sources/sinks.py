"""Result sinks (reference S4/S5/S6).

- result rows (graph, n, m, triangles, timings) → parquet/json
  (reference's printf table, tc.cu:891-913);
- degree-profile sample → csv (print_degrees, tc.cu:795-814);
- degree-distribution report (sample_degrees.cu:505-560).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_result(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    df.write.mode("overwrite").format(fmt).save(path)


def write_run_metrics(path: str, **metrics) -> None:
    """One JSON line per run — the engine's analogue of the reference's
    per-run printf row."""
    with open(path, "a") as f:
        f.write(json.dumps({"ts": time.time(), **metrics}) + "\n")


def write_degree_profile(
    degrees: DataFrame,
    path: str,
    num: int = 5000,
    seed: int = 42,
    oneify: bool = False,
    oriented: DataFrame | None = None,
) -> None:
    """Sampled (v, degree) pairs (reference print_degrees,
    tc.cu:795-814).

    With `oneify=True` (the reference's oneify flag) the profile is the
    OUT-degree of the degree-ORIENTED graph — each undirected edge
    counted once, at its lower-ranked endpoint — recomputed from the
    `oriented` edge frame; vertices whose every edge points inward
    appear with degree 0, so the profile still covers the full vertex
    set of `degrees`."""
    if oneify:
        if oriented is None:
            raise ValueError("oneify=True requires the oriented edge frame")
        outdeg = oriented.groupBy(F.col("src").alias("v")).agg(
            F.count("*").alias("odeg")
        )
        degrees = (
            degrees.select("v")
            .join(outdeg, "v", "left")
            .select("v", F.coalesce("odeg", F.lit(0)).cast("long").alias("degree"))
        )
    total = degrees.count()
    frac = min(1.0, num / max(total, 1))
    degrees.sample(fraction=frac, seed=seed).write.mode("overwrite").csv(path)


def degree_distribution_report(degrees: DataFrame) -> dict:
    """n, total wedges, max degree + degree quantiles (reference
    sample_degrees report, approximate where the reference samples)."""
    row = degrees.agg(
        F.count("*").alias("n"),
        F.max("degree").alias("max_degree"),
        F.sum(F.expr("degree * (degree - 1) / 2").cast("long")).alias("total_wedges"),
    ).collect()[0]
    quantiles = degrees.approxQuantile("degree", [0.5, 0.9, 0.99, 1.0], 0.01)
    return {
        "n": row["n"],
        "max_degree": row["max_degree"],
        "total_wedges": row["total_wedges"],
        "degree_quantiles": dict(zip(["p50", "p90", "p99", "max"], quantiles)),
    }


def write_training_shards(
    docs: DataFrame,
    path: str,
    shard_tokens: int = 1 << 22,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """The pipeline's last mile: write the (filtered) corpus as
    deterministic token-budgeted parquet shards plus a JSON manifest —
    what a pretraining data loader consumes.

    Layout contract = textstats.pack_sequences: documents in doc_id
    order, each assigned the shard its FIRST token falls into
    (shard = exclusive-prefix-token-count DIV shard_tokens). The
    assignment is a pure function of the corpus — identical at any
    parallelism and on re-runs (greedy bin packing is
    partitioning-dependent; this is not). Prefix sums come from the
    distributed two-pass cumsum (ids.attach_cumulative_weight), never
    a single-partition global window.

    Writes `path/` partitioned by shard (partition pruning for a
    loader that reads shard ranges) and `path/_manifest.json` with
    per-shard doc/token counts (the `_` prefix keeps Spark/parquet
    readers from scanning it as data). Returns the manifest dict.

    Driver memory is bounded by #shards (total_tokens/shard_tokens),
    not corpus size."""
    toks = F.size(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).cast("long")
    per = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        toks.alias("n_tokens"),
    )
    from ..operators.ids import attach_cumulative_weight

    caches: list = []
    laid, total_tokens = attach_cumulative_weight(
        per, ["doc_id"], "n_tokens", out_col="start", caches=caches
    )
    sharded = laid.select(
        "doc_id",
        "text",
        "n_tokens",
        F.expr(f"start DIV {int(shard_tokens)}").alias("shard"),
    )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    stats = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("shard")
        .collect()
    )
    for c in caches:
        c.unpersist()
    manifest = {
        "shard_tokens": int(shard_tokens),
        "total_tokens": int(total_tokens),
        "n_docs": int(sum(r["n_docs"] for r in stats)),
        "n_shards": len(stats),
        "shards": [
            {
                "shard": int(r["shard"]),
                "n_docs": int(r["n_docs"]),
                "n_tokens": int(r["n_tokens"]),
            }
            for r in stats
        ],
    }
    with open(f"{path}/_manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
