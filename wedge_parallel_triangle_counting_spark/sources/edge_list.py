"""Edge-list and Matrix Market text readers.

Reference parser: tc.cu:561-685 — whitespace-separated integer pairs,
'%'-comment/header lines skipped, optional 1-indexed normalization
(`-z` flag, tc.cu:599-605), MM size line ignored ("We do not use the
given vertex/edge counts", tc.cu:576-579).

Spark-first: a `spark.read.text` scan + column expressions — the parse
is a regexp split in whole-stage codegen, scaling to any file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import normalize_edges


def _parse_pairs(lines: DataFrame) -> DataFrame:
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.filter(F.trim(F.col("value")).rlike(r"^\d"))  # header/comment skip
        .select(
            parts.getItem(0).cast("long").alias("src"),
            parts.getItem(1).cast("long").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )


def read_edge_list(
    spark: SparkSession, path: str, one_indexed: bool = True
) -> DataFrame:
    """Plain "v w" edge list. The reference assumes 1-indexed unless
    -z (tc.cu:839-843); we mirror that default."""
    return normalize_edges(
        _parse_pairs(spark.read.text(path)), one_indexed=one_indexed
    )


def read_matrix_market(
    spark: SparkSession, path: str, one_indexed: bool = True
) -> DataFrame:
    """Matrix Market: %-comments, then one size line (rows cols nnz),
    then edges. The size line is dropped by position — identified with
    a per-file zipWithIndex over non-comment lines (driver-free)."""
    lines = spark.read.text(path)
    data = lines.filter(~F.col("value").startswith("%")).filter(
        F.trim(F.col("value")) != ""
    )
    # tag rows with a monotonically increasing id and drop the global
    # minimum (the size line is the first non-comment line of the file)
    tagged = data.withColumn("_rid", F.monotonically_increasing_id())
    first = tagged.agg(F.min("_rid")).collect()[0][0]
    body = tagged.filter(F.col("_rid") != first).drop("_rid")
    return normalize_edges(_parse_pairs(body), one_indexed=one_indexed)
