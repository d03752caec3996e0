"""Event-stream aggregations (events table: event_id, ts, user_id,
event_type, value, props).

``windowed_event_counts`` is the batch form (tumbling windows via
``F.window``); ``streaming_windowed_counts`` is the same logic as a
Structured Streaming query with a watermark for late data — reading a
file-source stream and writing complete windows per micro-batch. Both
share one aggregation definition so batch backfill and the live path
cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _agg(df: DataFrame, window: str) -> DataFrame:
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + value sums per event type (batch)."""
    return _agg(events, window)


def streaming_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Streaming twin: file source -> watermarked windowed agg -> parquet.

    Append mode + watermark: a window is emitted once the watermark
    passes its end, so late events inside the watermark still count and
    each window is written exactly once.
    """
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    agg = _agg(stream.withWatermark("ts", watermark), window)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_windowed_counts_memory(
    spark: SparkSession,
    input_dir: str,
    name: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming twin with a complete-mode memory sink: after an
    availableNow drain, ``spark.table(name)`` holds EXACTLY the batch
    aggregation result (complete mode keeps all window state), which is
    what lets the driver gate hash-compare the streaming path against
    the batch SQL oracle. The append+watermark parquet variant above is
    the production shape (bounded state); this one trades bounded state
    for exact batch equivalence at test scale.
    """
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    agg = _agg(stream.withWatermark("ts", watermark), window)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session ids per user: a new session starts after a >gap quiet
    period (classic window-function sessionization, one shuffle)."""
    from pyspark.sql import Window

    # event_id tie-break keeps ordering deterministic under equal ts;
    # millisecond epochs avoid fractional-second truncation mismatches
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps arrive as TIMESTAMP_NTZ; session tz is UTC so
    # the cast is value-preserving and unix_millis applies
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    gap = ms - F.lag(ms).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_minutes * 60_000), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_seq", F.sum(new_sess).over(w).cast("long")
    ).withColumn(
        "session_id",
        F.concat_ws("-", F.col("user_id").cast("string"), F.col("session_seq").cast("string")),
    )
