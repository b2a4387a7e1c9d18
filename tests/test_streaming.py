"""Structured-Streaming monitor: the streaming windowed aggregation must
equal its batch twin at end-of-stream (same logic, one definition —
streaming/monitor.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from volltextextraktion_selenium_md_spark.streaming.monitor import (
    event_rate_windows,
    sessionize,
    stream_event_rate,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch(spark, tmp_path):
    # file stream sources need a directory of files arriving over time:
    # split the events table into 4 files -> 4 micro-batches
    src = str(tmp_path / "events_stream")
    spark.read.parquet(f"{SF}/events.parquet").repartition(4).write.parquet(src)

    batch = event_rate_windows(spark.read.parquet(src))
    expected = _rows(batch)

    stream = stream_event_rate(spark, src)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("rates")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = _rows(spark.table("rates"))
    finally:
        q.stop()
    assert got == expected and len(got) > 0


def test_sessionize_properties(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    sess = sessionize(events)
    # every event lands in exactly one session
    assert sess.agg(F.sum("n_events")).first()[0] == events.count()
    # session bounds ordered
    assert sess.filter(F.col("session_end") < F.col("session_start")).count() == 0
    # sessions of one user never overlap (start > previous end, by idx)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_idx")
    bad = sess.withColumn("prev_end", F.lag("session_end").over(w)).filter(
        F.col("prev_end").isNotNull()
        & (F.col("session_start") <= F.col("prev_end"))
    )
    assert bad.count() == 0
