"""Structured-Streaming operational monitor.

The reference's only 'streaming' surface is the `/stats` poll endpoint
(`app/main.py:112-133`) over in-memory gauges; the nearest first-class
Spark analogue is a Structured Streaming job over the engine's event
feed: tumbling-window rates per event type with a watermark for late
data, and gap-based sessionization of per-user activity.

Both operators are defined ONCE over a plain DataFrame, so the exact
same logic runs:
- batch   : `event_rate_windows(spark.read.parquet(dir))` — this is the
            oracle-checkable path (`queries()['event_rate_windows']`)
- stream  : `stream_event_rate(spark, dir)` — `readStream` + watermark;
            tests assert the end-of-stream result equals the batch run
            row-for-row (tests/test_streaming.py)

At crawl scale the stream source is the fetch-log append feed from the
lakehouse landing (sources/lakehouse.py); here the driver `events`
table stands in (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
import pyspark.sql.types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

SESSION_GAP_MIN = 30


def event_rate_windows(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window per-type rates (epoch-aligned windows)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def stream_event_rate(
    spark: SparkSession, src_dir: str, window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming variant: file-source readStream + watermark. Caller
    attaches a writeStream sink (memory/console/lakehouse append)."""
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        # watermarks require TIMESTAMP (LTZ); session tz is UTC so the
        # NTZ->LTZ cast is value-preserving
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return event_rate_windows(src.withWatermark("ts", watermark), window)


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    inter-event gap exceeds `gap_min` minutes. Pure window functions
    (lag -> boundary flag -> running sum), no Python; the streaming
    twin is `sessionize_stream` below (`applyInPandasWithState` keyed
    by user with an EVENT-TIME timeout), same session semantics —
    stream==batch is asserted in tests/test_streaming.py."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_min * 60
    # ts may be TIMESTAMP_NTZ (driver parquet) — route through LTZ for
    # the epoch-seconds cast (session tz is pinned to UTC)
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    flagged = events.withColumn(
        "new_session",
        F.when(epoch - F.lag(epoch).over(w) > gap_s, 1).otherwise(0),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_idx").cast("int").alias("session_idx"),
            "session_start", "session_end", "n_events", "sum_value",
        )
    )


SESSION_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_idx", T.IntegerType()),
    T.StructField("session_start", T.TimestampNTZType()),
    T.StructField("session_end", T.TimestampNTZType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])
# open session carried across micro-batches: (idx, start_us, end_us, n, sum)
SESSION_STATE_SCHEMA = T.StructType([
    T.StructField("session_idx", T.IntegerType()),
    T.StructField("start_us", T.LongType()),
    T.StructField("end_us", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

# stream watermark sentinel: rows with this user_id only advance the
# watermark (so open sessions time out and flush); they never sessionize
SESSION_SENTINEL_USER = -1


def sessionize_stream(
    spark: SparkSession, src_dir: str, gap_min: int = SESSION_GAP_MIN
) -> DataFrame:
    """Streaming sessionize twin: ``applyInPandasWithState`` keyed by
    user with a PER-USER EVENT-TIME TIMEOUT.

    The open session is GroupState; a batch's events extend it or — on
    a gap > ``gap_min`` — close it (row emitted) and open the next. The
    state's timeout timestamp is ``session_end + gap``: when the
    watermark passes it, no event can extend the session any more
    (exactly the gap rule), so the timeout callback emits the open
    session and clears state. End-of-stream output therefore equals the
    batch twin when files arrive in event-time order."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_min * 60 * 1_000_000

    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        # event-time timeouts require a watermark; session tz is UTC so
        # the NTZ->LTZ cast is value-preserving
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "0 seconds")
        .select("user_id", "ts", "event_id", "value")
    )

    def _row(user_id, idx, start_us, end_us, n, sv):
        from decimal import ROUND_HALF_UP, Decimal

        # Spark's round() is HALF_UP; Python's round() is banker's —
        # match the batch twin digit for digit
        sv4 = float(
            Decimal(repr(float(sv))).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        return pd.DataFrame({
            "user_id": [user_id],
            "session_idx": [int(idx)],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [int(n)],
            "sum_value": [sv4],
        })

    def serve(key, pdfs, state: GroupState):
        user_id = int(key[0])
        chunks = [p for p in pdfs if len(p)]
        if state.hasTimedOut:
            # watermark passed session_end + gap: nothing can extend the
            # open session — flush it (this IS the per-user timeout)
            if state.exists:
                idx, s, e, n, sv = state.get
                yield _row(user_id, idx, s, e, n, sv)
            state.remove()
            return
        if not chunks or user_id == SESSION_SENTINEL_USER:
            return
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        if state.exists:
            idx, s, e, n, sv = state.get
        else:
            idx, s, e, n, sv = 0, None, None, 0, 0.0
        for ts, value in zip(pdf["ts"], pdf["value"]):
            t_us = int(pd.Timestamp(ts).value // 1_000)
            if s is None:
                s, e, n, sv = t_us, t_us, 1, float(value)
            elif t_us - e > gap_us:
                yield _row(user_id, idx, s, e, n, sv)
                idx += 1
                s, e, n, sv = t_us, t_us, 1, float(value)
            else:
                e, n, sv = t_us, n + 1, sv + float(value)
        state.update((int(idx), int(s), int(e), int(n), float(sv)))
        state.setTimeoutTimestamp(
            max((e + gap_us) // 1_000, state.getCurrentWatermarkMs() + 1)
        )

    return src.groupBy("user_id").applyInPandasWithState(
        serve,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
