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
    twin is `applyInPandasWithState` with a per-user timeout, which
    shares the same session semantics."""
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
