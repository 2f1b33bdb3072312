"""Windowed event aggregation — batch and streaming twins.

`windowed_counts` is the logical query: per (1-hour window, event_type)
count + value sum. `run_streaming_windowed` executes the SAME logical
query incrementally with Structured Streaming (file source, watermark,
availableNow trigger) — the batch/stream parity is asserted in tests,
which is Spark's core unified-API guarantee.

Streaming state scale: the aggregation state is keyed by
(window, event_type). State eviction is OUTPUT-MODE dependent:
- "update"/"append": the watermark closes windows — late rows beyond
  it are dropped and closed-window state is evicted, so state is
  O(active windows × types), independent of stream length; this is
  the production setting for an unbounded stream.
- "complete" (the default here, for the memory-sink parity check):
  Spark must be able to re-emit EVERY window each trigger, so the
  watermark does NOT evict state — state grows with the number of
  distinct windows. Fine for a bounded availableNow replay; not for
  an unbounded stream.
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
    output_mode: str = "complete",
) -> DataFrame:
    """Run the windowed aggregation as an incremental stream over the
    parquet files in `events_dir` (Trigger.AvailableNow — process all
    available data, then stop) and return the result collected from a
    memory sink.

    `output_mode="complete"` (default) re-emits all windows — exact
    batch parity on a bounded replay, but unbounded state (see module
    docstring). Use "update" for watermark-bounded state on unbounded
    streams; the memory sink then receives one row per UPDATED window
    per micro-batch, so the returned table is deduplicated to the last
    emission per (window_start, event_type) — windows still open at
    end-of-input are included, windows closed by the watermark carry
    their final value."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    # parquet stores TIMESTAMP_NTZ; watermarks require TIMESTAMP
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    agg = windowed_counts(stream)
    if output_mode != "update":
        query = (
            agg.writeStream.format("memory")
            .queryName("windowed_events")
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        return spark.table("windowed_events")

    # update mode: "last emission per key" needs an explicit recency
    # stamp — foreachBatch captures the BATCH ID (ADVICE r2: the memory
    # sink's partition order is not a documented proxy for emission
    # order), and each micro-batch is frozen with localCheckpoint
    # before its frame goes out of scope.
    batches: list[DataFrame] = []

    def capture(df: DataFrame, batch_id: int) -> None:
        batches.append(
            df.withColumn("_batch", F.lit(int(batch_id))).localCheckpoint(eager=True)
        )

    query = (
        agg.writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    if not batches:
        return spark.createDataFrame(
            [], "window_start timestamp, event_type string, n_events bigint, total_value double"
        )
    from functools import reduce

    from pyspark.sql import Window

    w_all = reduce(lambda a, b: a.unionByName(b), batches)
    # a key appears at most once per micro-batch, so max batch id IS
    # the last emission — no intra-batch tiebreak needed
    rn = F.row_number().over(
        Window.partitionBy("window_start", "event_type").orderBy(F.desc("_batch"))
    )
    return w_all.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn", "_batch")


def sessionized(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """(user_id, session_start, session_end, n_events, total_value) —
    session windows with an inactivity `gap`: consecutive events of a
    user belong to one session while each arrives strictly before
    previous_ts + gap; session_end = last_ts + gap (Spark
    F.session_window semantics, half-open [start, end)).

    Scale: one shuffle on user_id; state per user is a single open
    session in streaming. The classic web-analytics rollup — the
    DuckDB oracle expresses the same thing as gaps-and-islands
    (lag + running sum of breaks)."""
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def run_streaming_sessionized(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """The same session rollup as an incremental stream (append mode +
    watermark, Trigger.AvailableNow): a session row is emitted exactly
    once, when the watermark passes its end — the production contract
    for unbounded streams (state = open sessions only).

    Append mode means sessions still open against the FINAL watermark
    (max event ts - watermark) are retained as state, not emitted —
    the batch/stream parity statement is therefore: streaming output ==
    batch sessionized() restricted to session_end <= final watermark
    (asserted in tests)."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    agg = sessionized(stream, gap)
    query = (
        agg.writeStream.format("memory")
        .queryName("sessionized_events")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table("sessionized_events")


def funnel(events: DataFrame, stages: tuple[str, ...] = ("view", "click", "purchase")) -> DataFrame:
    """Ordered conversion funnel: a user reaches stage k when they
    have a stage-k event at-or-after their earliest reach of stage
    k-1 (min-ts semantics, ties allowed — identical rule in the
    oracle). Returns one row per stage:
    (stage, stage_name, users, total_lag_us), lag the exact integer
    microseconds from the user's stage-1 time, summed over users —
    the conversion-funnel dataset-card numbers.

    Scale shape: one user_id-keyed min-aggregation per stage, each
    joined co-partitioned on user_id to the previous stage's reach
    times; output cardinality = len(stages)."""
    # parquet NTZ timestamps -> session-zoned for unix_micros (same
    # normalization as streaming/joins.py::attribution_batch)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    reach = (
        events.filter(F.col("event_type") == stages[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .withColumn("tk", F.col("t1"))
    )
    out = None
    for k, st in enumerate(stages, start=1):
        if k > 1:
            reach = (
                events.filter(F.col("event_type") == st)
                .join(reach.select("user_id", "t1", "tk"), "user_id")
                .filter(F.col("ts") >= F.col("tk"))
                .groupBy("user_id", "t1")
                .agg(F.min("ts").alias("tk"))
            )
        stage_row = reach.agg(
            F.count("*").cast("long").alias("users"),
            F.coalesce(
                F.sum(F.unix_micros("tk") - F.unix_micros("t1")), F.lit(0)
            )
            .cast("long")
            .alias("total_lag_us"),
        ).select(
            F.lit(k).cast("long").alias("stage"),
            F.lit(st).alias("stage_name"),
            "users",
            "total_lag_us",
        )
        out = stage_row if out is None else out.unionByName(stage_row)
    return out


def retention_cohorts(events: DataFrame, week_seconds: int = 604_800) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week,
    counted in each later week they were active. Returns
    (cohort_week, week_offset, active_users) — cohort_week the epoch
    week (unix_seconds div 604800) of the user's first event,
    week_offset >= 0 the activity week relative to it. The
    top-left-triangle retention matrix every analytics stack ships.

    Exact integer week arithmetic on both engines (no timezone or
    date-truncation semantics to disagree on). Scale shape: one
    user-keyed min-agg for cohorts + one distinct (user, week)
    activity relation joined co-partitioned on user_id; output
    cardinality = O(weeks^2)."""
    ev = events.select(
        "user_id",
        F.expr(f"unix_seconds(CAST(ts AS TIMESTAMP)) div {week_seconds}").alias(
            "week"
        ),
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            (F.col("week") - F.col("cohort_week")).cast("long").alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("active_users"))
    )
