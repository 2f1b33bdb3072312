"""KMV (k-minimum-values) distinct-cardinality sketch — the
bottom-k estimator, built deterministic so the DuckDB oracle
reproduces it bit-for-bit.

The classic sketch trade: estimate |distinct| from only the k
smallest hash values. With the repo's md5-derived 60-bit hash the
sketch is a pure column expression — no RNG, no sketch state object,
no approx_count_distinct blackbox — so (a) two engines agree exactly,
(b) sketches of PARTITIONS of a dataset merge by taking the k
smallest of the union (the property that makes bottom-k the standard
distributed-cardinality primitive), and (c) the estimate is
reproducible across runs and cluster sizes.

    est = floor((k-1) · 2^60 / h_(k))   (h_(k) = k-th smallest hash)

computed as the IDENTICAL IEEE-double expression on both engines:
(k−1)·2^60 is exact in a double (small mantissa × power of two), the
hash converts with the same nearest-even rounding on both sides, and
the same division + floor of the same doubles is bit-deterministic —
whereas decimal division rounds at engine-specific scales.

Plan: distinct → hash → global bottom-k (TakeOrdered, k rows to the
driver-side sort — never the full value set) → one-row fold. The
exact count rides along for the calibration column; a production
call at 100 TB would drop it (the sketch exists to avoid it) — it is
here because the oracle cell then also certifies the ERROR, not just
the estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .walks import _h64


def kmv_distinct(
    values: DataFrame, column: str, k: int = 256, salt: str = "kmv"
) -> DataFrame:
    """One row: (n_exact, k, kth_hash, est_distinct, err_ppm) for the
    distinct values of `column`. If fewer than k distinct values
    exist, the estimate IS the exact count (the sketch is exact below
    its capacity)."""
    # NULLs are excluded from the cardinality on BOTH sides (the
    # oracle's `||` would null the hash while concat_ws would not —
    # filtering first removes the divergence)
    distinct = (
        values.select(F.col(column).cast("string").alias("val"))
        .filter(F.col("val").isNotNull())
        .distinct()
    )
    h = _h64(F.concat_ws(":", F.lit(salt), F.col("val")))
    hashes = distinct.select(h.alias("h")).orderBy("h").limit(k)
    bottom = hashes.agg(
        F.count(F.lit(1)).alias("n_in_sketch"),
        F.max("h").alias("kth_hash"),
    )
    exact = distinct.agg(F.count(F.lit(1)).alias("n_exact"))
    est = F.when(
        F.col("n_in_sketch") < k, F.col("n_in_sketch").cast("long")
    ).otherwise(
        F.floor(
            F.lit(float(k - 1))
            * F.lit(float(2**60))
            / F.col("kth_hash").cast("double")
        ).cast("long")
    )
    return (
        exact.crossJoin(F.broadcast(bottom))
        .select(
            "n_exact",
            F.lit(k).cast("long").alias("k"),
            F.col("kth_hash"),
            est.alias("est_distinct"),
        )
        .select(
            "n_exact",
            "k",
            "kth_hash",
            "est_distinct",
            F.expr(
                "abs(est_distinct - n_exact) * 1000000 DIV greatest(n_exact, 1)"
            ).alias("err_ppm"),
        )
    )
