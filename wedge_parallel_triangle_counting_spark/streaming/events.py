"""Windowed event aggregation — batch and streaming twins.

`windowed_counts` is the logical query: per (1-hour window, event_type)
count + value sum. `run_streaming_windowed` executes the SAME logical
query incrementally with Structured Streaming (file source, watermark,
availableNow trigger) — the batch/stream parity is asserted in tests,
which is Spark's core unified-API guarantee.

Streaming state scale: the aggregation state is keyed by
(window, event_type); the 1-hour watermark bounds it — late rows
beyond the watermark are dropped and state for closed windows is
evicted, so state size is O(active windows × types), independent of
stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame) -> DataFrame:
    """(window_start, event_type, n_events, total_value) per 1-hour
    tumbling window."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_streaming_windowed(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Run the windowed aggregation as an incremental stream over the
    parquet files in `events_dir` (Trigger.AvailableNow — process all
    available data, then stop) and return the result collected from a
    memory sink."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    # parquet stores TIMESTAMP_NTZ; watermarks require TIMESTAMP
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    agg = windowed_counts(stream)
    query = (
        agg.writeStream.format("memory")
        .queryName("windowed_events")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table("windowed_events")
