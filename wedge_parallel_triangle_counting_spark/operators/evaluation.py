"""Pipeline-quality evaluation reports: how good are the approximate
operators (LSH dedup candidates, IVF ANN) against their exact ground
truths on the same data.

At 100 TB the approximate paths (banded MinHash LSH, IVF probing) are
the ONLY affordable ones, so the pipeline needs a standing measurement
of what they give up. The standard practice is to run the exact
baseline on a small sampled slice and score the approximate operator's
candidates against it — these operators ARE that scoring step. They are
deliberately one-row / per-query-row reports (the expensive exact side
runs on the evaluation sample, never the full corpus; the caller picks
the sample, e.g. via textstats.stratified_sample).

All scores are exact integer parts-per-million (bigint DIV) so the
DuckDB oracles match bit-for-bit (repo convention: no raw doubles in
certified outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lsh_dedup_eval(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """One-row recall/precision report of the banded MinHash-LSH
    candidate pairs against exact n-gram-Jaccard ground truth at
    `threshold`: (n_truth, n_candidates, n_hits, recall_ppm,
    precision_ppm).

    recall = |truth ∩ candidates| / |truth| — the fraction of real
    near-duplicate pairs the LSH bands surface; precision = the
    fraction of surfaced candidates that are real (the rest cost a
    verification pass downstream). Both in exact ppm.

    Scale shape: the truth side is the exact inverted-index join
    (dedup.ngram_jaccard_pairs, stop-shingle-bounded) — affordable on
    an evaluation sample, not the corpus; the candidate side is the
    production LSH plan itself. The intersection is one equi-join on
    (doc_a, doc_b); the three counts are 1-row aggregates combined by
    broadcast cross-joins (the PageRank dangling-mass shape)."""
    from .dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    truth = ngram_jaccard_pairs(
        docs, n=n, threshold=threshold, max_shingle_freq=max_shingle_freq
    ).select("doc_a", "doc_b")
    cand = minhash_lsh_pairs(docs, n=n)
    hits = truth.join(cand, ["doc_a", "doc_b"])
    t = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    c = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    h = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        t.crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(h))
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            F.expr(
                "CASE WHEN n_truth > 0 THEN n_hits * 1000000 DIV n_truth"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("recall_ppm"),
            F.expr(
                "CASE WHEN n_candidates > 0 THEN n_hits * 1000000 DIV n_candidates"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("precision_ppm"),
        )
    )


def ivf_recall_eval(
    emb: DataFrame,
    k: int = 5,
    query_limit: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """Per-query IVF recall against the exact brute-force cosine top-k:
    (query_id, n_truth, n_hits, recall_ppm), one row per query.

    recall@k is THE serving metric for an ANN index — it tells you what
    the nprobe/n_clusters trade-off costs in retrieved neighbors. The
    truth side is similarity.cosine_topk (exact, broadcast-query
    cross-join — affordable for the bounded query set, which is exactly
    how production recall monitoring samples); the candidate side is
    the production IVF plan with the same (k, query_limit) contract.
    Matching is one left equi-join on (query_id, vec_id) + one per-query
    aggregation; every query keeps a row even at zero hits."""
    from .similarity import cosine_topk, ivf_topk

    truth = cosine_topk(emb, k=k, query_limit=query_limit).select(
        "query_id", "vec_id"
    )
    cand = (
        ivf_topk(
            emb, k=k, query_limit=query_limit, n_clusters=n_clusters, nprobe=nprobe
        )
        .select("query_id", "vec_id", F.lit(1).alias("hit"))
    )
    return (
        truth.join(cand, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
        )
        .select(
            "query_id",
            "n_truth",
            "n_hits",
            F.expr(
                "CASE WHEN n_truth > 0 THEN n_hits * 1000000 DIV n_truth"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("recall_ppm"),
        )
    )


def minhash_estimate_eval(docs: DataFrame, n: int = 3) -> DataFrame:
    """Calibration of the MinHash Jaccard ESTIMATE on every LSH
    candidate pair: (doc_a, doc_b, est_ppm, true_ppm, abs_err_ppm).

    est = agreeing signature components / NUM_HASHES (the unbiased
    MinHash estimator the banding thresholds are derived from); true =
    exact shingle Jaccard of the pair. The report tells you whether
    16 hashes are enough for the corpus's similarity distribution —
    the estimator's stderr ≈ sqrt(j(1−j)/16) is the banding design
    input. All ppm integer DIV, hash-stable.

    Scale shape: the exact side is PAIR-RESTRICTED — the shingle
    intersection join runs only over the LSH candidates (bounded by
    the banding), never a corpus self-join; sizes are the per-doc agg
    the dedup path already needs. This is why the calibration is
    affordable on the full corpus, unlike lsh_dedup_eval's exact-truth
    side which is for evaluation samples."""
    from .dedup import NUM_HASHES, minhash_lsh_pairs, minhash_signatures, shingles

    cand = minhash_lsh_pairs(docs, n=n)
    sig = minhash_signatures(docs, n=n)
    siga = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
    )
    sigb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
    )
    m = None
    for i in range(NUM_HASHES):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        m = term if m is None else m + term
    est = (
        cand.join(siga, "doc_a")
        .join(sigb, "doc_b")
        .select("doc_a", "doc_b", m.cast("long").alias("m"))
    )
    sh = shingles(docs, n=n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(f"m * 1000000 DIV {NUM_HASHES}").alias("est_ppm"),
            F.expr(
                "coalesce(i, 0) * 1000000 DIV (sza + szb - coalesce(i, 0))"
            ).alias("true_ppm"),
        )
        .withColumn("abs_err_ppm", F.abs(F.col("est_ppm") - F.col("true_ppm")))
    )
