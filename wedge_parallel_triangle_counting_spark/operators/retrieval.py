"""BM25-family ranked retrieval over the documents table.

A curation pipeline queries its own corpus constantly — "pull the
top-k documents about X" for eval-set mining, decontamination probes,
topic balancing. At 10^12 documents that is a scoring SCAN, not an
index lookup: tokenize, keep postings for the query terms only
(filter BEFORE the aggregation so the shuffle carries query-term
postings, not the whole vocabulary), score, global top-k.

Scoring is the BM25 shape — tf saturation (k1), document-length
normalization (b) — with one deliberate substitution: the idf factor
is the PRE-LOG Robertson/Sparck-Jones odds

    idf_micro(t) = floor(1e6 * (N - df + 0.5) / (df + 0.5))
                 = ((2*(N - df) + 1) * 1_000_000) DIV (2*df + 1)

kept rational instead of its logarithm. Everything is then EXACT
int64/decimal arithmetic: the score is deterministic, partition-
independent, and bit-identical in any engine — whereas ln() differs
in the last ulp between Java and DuckDB and poisons value-hash
certification (the repo-wide transcendental-free oracle discipline;
see kmv/hll). At deployment the log idf is a per-term scalar lookup
(|query| values computed driver-side), so swapping it in changes no
plan shape. With k1 = 1.2, b = 0.75 the tf factor is the exact
rational

    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  = 22*tf*avgdl / (10*tf*avgdl + 3*avgdl + 9*dl)

(avgdl = total_tokens DIV n_docs, integer). Per-term score =
idf_micro * that, in DECIMAL(38,0) intermediates (the int64 product
overflows past ~10^9 documents), emitted as bigint micro-units.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k (doc_id, n_terms_hit, score_micro) under the rational-idf
    BM25 above; ties broken by doc_id ascending. Documents matching no
    query term never enter the score join."""
    terms = sorted(set(query_terms))
    base = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("toks")
    )
    # corpus stats: one row (n_docs, avgdl) — broadcast to the scorer
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("sum(size(toks)) DIV count(1)").alias("avgdl"),
    )
    # postings for the query terms only: explode is filtered by an
    # array_contains pre-gate so non-matching docs are pruned before
    # the explode; tf = per-(doc, term) occurrence count
    term_arr = F.array(*[F.lit(t) for t in terms])
    hits = (
        base.withColumn("dl", F.size("toks").cast("long"))
        .filter(F.arrays_overlap("toks", term_arr))
        .select("doc_id", "dl", F.explode("toks").alias("t"))
        .filter(F.col("t").isin(list(terms)))
        .groupBy("doc_id", "dl", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df per term from the postings (query-term-sized relation)
    dfreq = hits.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hits.join(F.broadcast(dfreq), "t")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_micro",
            F.expr("((2 * (n_docs - df) + 1) * 1000000) DIV (2 * df + 1)"),
        )
        .withColumn(
            "term_score",
            F.expr(
                "CAST((CAST(idf_micro AS DECIMAL(38,0)) * 22 * tf * avgdl)"
                " DIV (10 * tf * avgdl + 3 * avgdl + 9 * dl) AS BIGINT)"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum("term_score").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(k)
    )
