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
