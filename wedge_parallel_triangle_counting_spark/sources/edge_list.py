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
    """Matrix Market: %-comments, then ONE size line (rows cols nnz)
    PER FILE, then edges. A directory/glob of .mtx files therefore has
    one size line per input file; each is identified as the minimum
    monotonically_increasing_id within its own file (ids are ordered
    within a file split) and dropped with a broadcast anti-join —
    never by a single global minimum, which would let the other files'
    size lines parse as bogus edges."""
    lines = spark.read.text(path).withColumn("_file", F.input_file_name())
    data = lines.filter(~F.col("value").startswith("%")).filter(
        F.trim(F.col("value")) != ""
    )
    tagged = data.withColumn("_rid", F.monotonically_increasing_id())
    firsts = tagged.groupBy("_file").agg(F.min("_rid").alias("_rid"))
    body = tagged.join(
        F.broadcast(firsts), ["_file", "_rid"], "left_anti"
    ).drop("_rid", "_file")
    return normalize_edges(_parse_pairs(body), one_indexed=one_indexed)
