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


def test_sessionize_stream_equals_batch(spark, tmp_path):
    """Sessionize streaming twin (applyInPandasWithState keyed by user,
    EVENT-TIME timeout): sessions closed by a gap emit inline; sessions
    still open at end-of-stream flush via the per-user timeout once the
    watermark passes session_end + gap (driven by a far-future sentinel
    row, as a production feed's next events would). End-of-stream output
    must equal the batch window-function twin."""
    import os
    import time as _t

    import pandas as pd

    from volltextextraktion_selenium_md_spark.streaming.monitor import (
        SESSION_SENTINEL_USER,
        sessionize_stream,
    )

    src = str(tmp_path / "sess_stream")
    events = spark.read.parquet(f"{SF}/events.parquet")
    (
        events.repartitionByRange(4, "ts", "event_id")
        .sortWithinPartitions("ts", "event_id")
        .write.parquet(src)
    )
    # sentinel file: one far-future row that only advances the watermark
    # so every open session's event-time timeout fires
    far = events.agg(F.max("ts")).first()[0] + pd.Timedelta(days=365)
    spark.createDataFrame(
        [(int(1 << 40), far, SESSION_SENTINEL_USER, "sentinel", 0.0, "{}")],
        schema=events.schema,
    ).coalesce(1).write.mode("append").parquet(src)

    # arrival order == event-time order (file source schedules by mtime)
    parts = sorted(f for f in os.listdir(src) if f.startswith("part-"))
    sentinel_part = [
        f for f in parts
        if spark.read.parquet(os.path.join(src, f))
        .filter(F.col("user_id") == SESSION_SENTINEL_USER).count() > 0
    ][0]
    ordered = [f for f in parts if f != sentinel_part] + [sentinel_part]
    now = _t.time()
    for i, f in enumerate(ordered):
        os.utime(os.path.join(src, f), (now + i, now + i))

    expected = {
        (r["user_id"], r["session_idx"]): (
            r["session_start"], r["session_end"], r["n_events"], r["sum_value"]
        )
        for r in sessionize(events).collect()
    }

    stream = sessionize_stream(spark, src)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_idx"]): (
                r["session_start"], r["session_end"], r["n_events"],
                r["sum_value"],
            )
            for r in spark.table("sessions").collect()
        }
    finally:
        q.stop()
    assert set(got) == set(expected) and len(got) > 0
    for k, (gs, ge, gn, gv) in got.items():
        es, ee, en, ev = expected[k]
        assert (gs, ge, gn) == (es, ee, en), k
        # float sums accumulate in different orders batch vs stream —
        # equal to well below the 4-decimal rounding grain
        assert abs(gv - ev) < 1e-3, k


def test_admission_stream_equals_batch(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-(host,
    window) GroupState must carry admitted-slot counts across
    micro-batches — end-of-stream decisions equal the batch rank cut
    when files arrive in event-time order. Small capacity/queue so all
    three outcomes occur at sf0.001."""
    from volltextextraktion_selenium_md_spark.streaming.admission import (
        admission_control,
        admission_control_stream,
    )

    src = str(tmp_path / "adm_stream")
    events = spark.read.parquet(f"{SF}/events.parquet")
    # time-ordered file split: 4 range partitions on ts -> 4 micro-
    # batches arriving in event-time order (file source reads in
    # lexicographic path order after repartitionByRange write)
    (
        events.repartitionByRange(4, "ts", "event_id")
        .sortWithinPartitions("ts", "event_id")
        .write.parquet(src)
    )
    # the file source schedules backlog files by MODIFICATION TIME, and
    # a parallel write finishes parts in arbitrary order — stamp
    # increasing mtimes in path order so arrival order == event-time
    # order (in production the feed appends over time, giving this for
    # free)
    import os
    import time as _t

    parts = sorted(
        f for f in os.listdir(src) if f.startswith("part-")
    )
    now = _t.time()
    for i, f in enumerate(parts):
        os.utime(os.path.join(src, f), (now + i, now + i))

    cap, q = 4, 8
    expected = sorted(
        tuple(r)
        for r in admission_control(
            spark.read.parquet(src), capacity=cap, queue_limit=q
        ).collect()
    )
    decisions = {r[3] for r in expected}
    assert decisions == {"admitted", "queued", "rejected"}  # non-vacuous

    stream = admission_control_stream(spark, src, capacity=cap, queue_limit=q)
    assert stream.isStreaming
    qy = (
        stream.writeStream.format("memory")
        .queryName("admissions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "adm_ck"))
        .start()
    )
    try:
        qy.processAllAvailable()
        got = sorted(tuple(r) for r in spark.table("admissions").collect())
    finally:
        qy.stop()
    assert got == expected and len(got) > 0
