"""Stateful streaming sessionization via ``applyInPandasWithState``.

The batch twin is ``pipeline.events.sessionize`` (gap-based window
functions). Here the same gap rule runs as a custom stateful streaming
operator: per-user state carries (last event time, session start,
event count, running session count); an event-time timeout closes a
session once the watermark passes its gap horizon, so each session is
emitted exactly once with its aggregate — the standard shape for
billions of keys because state per key is a handful of scalars and
expiry is watermark-driven.

Emitted sessions match the batch sessionization exactly for every
session whose gap horizon the watermark passed (an availableNow drain
holds back only each user's final open session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
OUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, "
    "session_start timestamp, session_end timestamp"
)
STATE_SCHEMA = "last_us long, start_us long, n long, seq long"


def _session_fn(gap_us: int):
    import pandas as pd

    def fn(key, pdf_iter, state: GroupState):
        user_id = int(key[0])

        def emit(start_us: int, end_us: int, n: int, seq: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_seq": [seq],
                    "n_events": [n],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                }
            )

        if state.hasTimedOut:
            last_us, start_us, n, seq = state.get
            state.remove()
            yield emit(start_us, last_us, n, seq)
            return

        rows = pd.concat(list(pdf_iter))
        us = (rows["ts"].astype("int64") // 1_000).sort_values()
        if state.exists:
            last_us, start_us, n, seq = state.get
        else:
            last_us, start_us, n, seq = None, None, 0, 0
        out = []
        for t in us:
            t = int(t)
            if last_us is None:
                seq += 1
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                out.append(emit(start_us, last_us, n, seq))
                seq += 1
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
        state.update((last_us, start_us, n, seq))
        # close the open session once the watermark passes its gap horizon
        # (timeout API is millisecond-epoch; round up so it never fires early)
        state.setTimeoutTimestamp((last_us + gap_us) // 1000 + 1)
        for pdf in out:
            yield pdf

    return fn


def streaming_sessionize(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
    available_now: bool = True,
):
    """events file stream -> per-user gap sessions, exactly-once emission."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60_000_000),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_session_aggregates(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch twin of the streaming output: one row per session with the
    same (user_id, session_seq, n_events, start, end) aggregate."""
    from pyspark.sql import functions as F

    from searchengine_spark.pipeline.events import sessionize

    s = sessionize(events, gap_minutes=gap_minutes)
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
