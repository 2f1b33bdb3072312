"""Bucketed edge tables: pre-shuffled storage for co-located joins.

The scale story for a graph that is re-analyzed repeatedly (the
10^12-page crawl is ingested once, queried for months): pay the
hash(src) shuffle ONCE at write time. `bucketBy(n, "src")` stores each
file pre-hashed, so every later `groupBy("src")` (degrees, out-degree,
adjacency build) and every equi-join on src starts from a scan whose
output partitioning already satisfies the distribution — Catalyst plans
NO Exchange (asserted by tests/test_plans.py). This is the storage-side
analogue of the engine's in-session trick of reusing one
repartition(src) across the whole prep chain (graph.py), and the
reference's preprocess-once/count-many workflow (tc.cu separates
read_graph+preprocess from the timed kernel for the same reason).

Bucketed writes go through the session catalog (`saveAsTable`) because
bucket metadata lives in the metastore; `path` pins the files to an
explicit location. Sort WITHIN buckets by (src, dst) so downstream
CSR packing needs only the partition-local sort it already does.

On a real deployment the same role is played by an Iceberg table with
a bucket partition transform (`bucket(n, src)`) — the write path here
gates on the catalog format the session provides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_edges_bucketed(
    edges: DataFrame,
    table: str,
    num_buckets: int = 64,
    path: str | None = None,
) -> None:
    """Persist an edge table bucketed + sorted by src.

    One shuffle-free write pass per input partition (bucketBy splits
    rows into bucket files writer-side; no exchange is inserted), then
    every downstream src-keyed aggregation or join reads pre-clustered
    data. `num_buckets` plays the role of the loop/shuffle partition
    count — size it so one bucket of the target graph fits an executor
    core's memory (e.g. 10^13 edges / 2^15 buckets ≈ 300M edges/bucket).
    """
    w = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .write.mode("overwrite")
        .bucketBy(num_buckets, "src")
        .sortBy("src", "dst")
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_edges_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed edge table. The scan's output partitioning is
    HashPartitioning(src, num_buckets) — degrees/adjacency/orientation
    over it need no initial exchange."""
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
