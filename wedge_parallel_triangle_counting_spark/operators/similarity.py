"""Similarity search over an embedding column (array<float>).

Three operators:
- `cosine_topk`: brute-force exact top-k neighbors for a query subset —
  broadcast the queries, JVM-side dot products (`zip_with` +
  `aggregate`, whole-stage codegen), ranking window per query.
  O(Q·N) — the correctness baseline, and the right choice when Q is
  small.
- `lsh_bucket_pairs`: axis-sign LSH — bucket = sign bits of 8 fixed
  coordinates; same-bucket candidate pairs filtered by exact cosine.
  Expected candidates N²/2^8 per-bucket-balanced; fully
  SQL-reproducible (the DuckDB oracle mirrors it bit for bit).
- `random_plane_lsh_candidates`: classic random-hyperplane signatures
  via a deterministic md5-seeded plane matrix inside a vectorized
  pandas UDF — the scale path (one matmul per Arrow batch); verified
  differentially against brute force in tests (recall), not by SQL.

Scale notes: brute force is a broadcast nested loop — fine for Q·N up
to ~10^10 ops; beyond that the LSH variants bound candidate counts.
All cosines are computed in float64 after casting the float32 input.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AXIS_BITS = 8
AXIS_STRIDE = 8


def axis_coords(nbits: int = AXIS_BITS, stride: int = AXIS_STRIDE) -> list[int]:
    """1-based coordinates whose sign bits form the bucket id. The
    caller scales `nbits` with the corpus: bucket count 2^nbits should
    grow with N so per-bucket candidates (≈N²/2^nbits) stay bounded —
    e.g. nbits ≈ log2(N) keeps expected candidates ≈ N. Requires
    stride*(nbits-1)+1 <= dim."""
    return [1 + stride * p for p in range(nbits)]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    query_limit: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for vectors with id < query_limit.
    Returns (query_id, vec_id, cos, rank); self-matches excluded;
    ties broken by vec_id ascending."""
    from pyspark.sql import Window

    base = emb.select(
        F.col(id_col).cast("long").alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("nrm", _norm(F.col("v")))
    qs = (
        base.filter(F.col("vec_id") < query_limit)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
    )
    joined = base.crossJoin(F.broadcast(qs)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = (_dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn"))).alias("cos")
    scored = joined.select("query_id", "vec_id", cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round("cos", 6).alias("cos"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def axis_bucket(vec_col, coords: list[int] | None = None):
    """Bucket id from the sign bits of fixed coordinates (1-based)."""
    coords = coords or axis_coords()
    bucket = F.lit(0)
    for p, c in enumerate(coords):
        bucket = bucket + F.when(
            F.element_at(vec_col, c) >= 0, F.lit(1 << p)
        ).otherwise(F.lit(0))
    return bucket.cast("long")


def derive_axis_nbits(n_rows: int, dim: int, stride: int = AXIS_STRIDE) -> int:
    """The docstring scaling rule as code: nbits ≈ log2(N) so per-bucket
    candidates (≈N²/2^nbits) stay ≈linear, clamped to [8, 24] and to
    what the embedding dimension can host (stride·(nbits−1)+1 ≤ dim).
    Integer-exact (bit_length, no float log) so the DuckDB oracle can
    reproduce it bit for bit via length(bin(N−1))."""
    by_n = max(8, (max(n_rows, 1) - 1).bit_length())
    by_dim = (dim - 1) // stride + 1
    return min(24, by_dim, by_n)


def lsh_bucket_pairs(
    emb: DataFrame,
    threshold: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int | None = None,
    stride: int = AXIS_STRIDE,
) -> DataFrame:
    """Candidate pairs sharing an axis-sign bucket, filtered by exact
    cosine >= threshold. Returns (id_a, id_b, cos), id_a < id_b.

    `nbits` sets the bucket space (2^nbits buckets); the default None
    derives it from the corpus (one count+dim agg job): ≈log2(N) so
    the per-bucket self-join stays ≈linear, clamped to [8, 24] and to
    the embedding dimension (see derive_axis_nbits). Pass an int to
    pin it. For web scale prefer `random_plane_lsh_candidates`, whose
    signature bits don't consume embedding coordinates."""
    if nbits is None:
        n_rows, dim = emb.agg(
            F.count(F.lit(1)), F.max(F.size(F.col(vec_col)))
        ).first()
        nbits = derive_axis_nbits(int(n_rows), int(dim), stride)
    base = emb.select(
        F.col(id_col).cast("long").alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn(
        "bucket", axis_bucket(F.col("v"), axis_coords(nbits, stride))
    ).withColumn("nrm", _norm(F.col("v")))
    a = base.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), "bucket",
    )
    b = base.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "bucket",
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def _planes(dim: int, nbits: int, seed: str = "wetric") -> np.ndarray:
    """Deterministic ±1 hyperplane matrix seeded via md5 — no RNG state,
    same matrix on every executor and run."""
    out = np.empty((nbits, dim), dtype=np.float64)
    for p in range(nbits):
        for j in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{j}".encode()).digest()[0]
            out[p, j] = 1.0 if h & 1 else -1.0
    return out


def random_plane_signatures(
    emb: DataFrame,
    nbits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, sig) — random-hyperplane signatures, one matmul per
    Arrow batch inside mapInPandas (the scale path). Pass `dim` when
    known to skip the one-row sniff job."""
    spark = emb.sparkSession
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes_bc = spark.sparkContext.broadcast(_planes(dim, nbits))
    sel = emb.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("v")
    )

    def sign_udf(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = planes_bc.value
        weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf["v"].values).astype(np.float64)
            bits = (mat @ planes.T) >= 0
            sig = bits @ weights
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values, "sig": sig})

    return sel.mapInPandas(sign_udf, schema="vec_id long, sig long")


def random_plane_lsh_candidates(
    emb: DataFrame,
    nbits: int = 32,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Candidate pairs agreeing on at least one signature band
    (banded random-hyperplane LSH). Returns distinct (id_a, id_b).
    Bands are posexploded and matched with ONE (band_idx, band)
    self-join — one shuffle, nothing persisted."""
    sig = random_plane_signatures(emb, nbits, id_col, vec_col, dim=dim)
    rows = nbits // bands
    mask = (1 << rows) - 1
    band_exprs = [
        F.shiftright(F.col("sig"), b * rows).bitwiseAND(F.lit(mask))
        for b in range(bands)
    ]
    banded = sig.select(
        "vec_id", F.posexplode(F.array(*band_exprs)).alias("band_idx", "band")
    )
    x = banded.select(F.col("vec_id").alias("id_a"), "band_idx", "band")
    y = banded.select(F.col("vec_id").alias("id_b"), "band_idx", "band")
    return (
        x.join(y, ["band_idx", "band"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    query_limit: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    num_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine neighbors — the
    classic ANN scale path: a deterministic integer k-means coarse
    quantizer (operators/kmeans.py) partitions the corpus into
    n_clusters lists; each query probes only its `nprobe` nearest
    centroids (exact integer distances, (d, cid) tie-break) and
    brute-forces cosine inside those lists. Same output contract as
    cosine_topk (query_id, vec_id, cos, rank); recall < exact by
    construction — the oracle replays the IVF plan itself, and
    tests measure recall against the exact baseline.

    Scale shape: centroids are a k-row broadcast; the probe is a
    per-query k-row ranking; the candidate join is an equi-join on
    cluster id — the corpus is scanned once and only matching lists
    shuffle. Lists ≈ N/n_clusters vectors; n_clusters scales with N
    (sqrt(N) is the textbook choice), nprobe trades recall for cost."""
    from pyspark.sql import Window

    from .kmeans import kmeans_fit

    assign, cents = kmeans_fit(
        emb, k=n_clusters, num_iters=num_iters, id_col=id_col, vec_col=vec_col
    )

    qdist = F.aggregate(
        F.zip_with(F.col("q"), F.col("cq"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    wprobe = Window.partitionBy("query_id").orderBy("pd", "cid")
    probe = (
        assign.filter(F.col("vec_id") < query_limit)
        .select(F.col("vec_id").alias("query_id"), "q")
        .crossJoin(F.broadcast(cents))
        .select("query_id", "cid", qdist.alias("pd"))
        .withColumn("rn", F.row_number().over(wprobe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("cid").alias("cluster"))
    )

    base = emb.select(
        F.col(id_col).cast("long").alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("nrm", _norm(F.col("v")))
    base = base.join(
        assign.select("vec_id", "cluster"), "vec_id"
    )
    qs = base.filter(F.col("vec_id") < query_limit).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    # probe is (queries × nprobe) rows — broadcast it so the corpus is
    # scanned in place instead of shuffling every list by cluster id
    cands = (
        base.join(F.broadcast(probe), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(qs), "query_id")
    )
    cos = (_dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn"))).alias("cos")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cands.select("query_id", "vec_id", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round("cos", 6).alias("cos"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
