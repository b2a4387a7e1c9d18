"""Streaming admission control — the reference's bounded waiting room
as a custom stateful operator.

The reference guards capacity with a process-global semaphore of
``selenium_max_pool_size`` (8) plus a bounded waiting room of
``max_queue_size`` (50): a request beyond the queue bound is rejected
with 503, a queued request that cannot start in time times out
(``app/main.py:25-91``, ``app/config.py:63-64``). The deterministic
distributed re-expression (same philosophy as the politeness rank cut,
operators/politeness.py): within each (host, window), requests in
(ts, event_id) order are

    rank <= capacity                 -> 'admitted'
    rank <= capacity + queue_limit   -> 'queued'
    else                             -> 'rejected'   (the 503 analogue)

Defined twice over the SAME semantics:
- batch  : one window rank — SQL-expressible, oracle-checked
  (``queries()['admission_control']``).
- stream : ``applyInPandasWithState`` keyed by (host, window) — the
  running admitted-count is GroupState carried across micro-batches, so
  a slot granted in batch k is still occupied in batch k+1. End-of-
  stream output equals the batch twin when arrival order matches event
  time (tests feed time-ordered files; out-of-order arrivals get
  arrival-order slots, which is exactly the reference's behavior — the
  semaphore serves whoever shows up first).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from volltextextraktion_selenium_md_spark.streaming.monitor import EVENT_SCHEMA

# reference capacity semantics (app/main.py:27-28, app/config.py:63)
ADMISSION_CAPACITY = 8
ADMISSION_QUEUE_LIMIT = 50
N_HOSTS = 5           # user_id % N_HOSTS stands in for the request host
ADMISSION_WINDOW = "day"


def _keyed(events: DataFrame) -> DataFrame:
    return events.select(
        "event_id", "ts",
        F.concat(F.lit("host"), (F.col("user_id") % N_HOSTS).cast("string")).alias("host"),
        F.date_trunc(ADMISSION_WINDOW, F.col("ts")).alias("window_start"),
    )


def admission_control(
    events: DataFrame,
    capacity: int = ADMISSION_CAPACITY,
    queue_limit: int = ADMISSION_QUEUE_LIMIT,
) -> DataFrame:
    """Batch twin: one rank per (host, window) in (ts, event_id) order."""
    w = Window.partitionBy("host", "window_start").orderBy("ts", "event_id")
    ranked = _keyed(events).withColumn("rn", F.row_number().over(w))
    return ranked.select(
        "event_id", "host", "window_start",
        F.when(F.col("rn") <= capacity, "admitted")
        .when(F.col("rn") <= capacity + queue_limit, "queued")
        .otherwise("rejected")
        .alias("decision"),
    )


OUT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("host", T.StringType()),
    T.StructField("window_start", T.TimestampNTZType()),
    T.StructField("decision", T.StringType()),
])
STATE_SCHEMA = T.StructType([T.StructField("n_seen", T.LongType())])


def admission_control_stream(
    spark: SparkSession,
    src_dir: str,
    capacity: int = ADMISSION_CAPACITY,
    queue_limit: int = ADMISSION_QUEUE_LIMIT,
) -> DataFrame:
    """Streaming twin: per-(host, window) GroupState counts admissions
    across micro-batches; each batch's rows are served in (ts,
    event_id) order from the running slot position."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    keyed = _keyed(src)

    def serve(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (n_seen,) = state.get if state.exists else (0,)
        import numpy as np

        # a micro-batch may deliver a key's rows as several Arrow
        # chunks — collect them all before ordering, or ranks would be
        # assigned per-chunk
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            rn = n_seen + np.arange(1, len(pdf) + 1)
            decision = np.full(len(pdf), "rejected", dtype=object)
            decision[rn <= capacity + queue_limit] = "queued"
            decision[rn <= capacity] = "admitted"
            n_seen += len(pdf)
            yield pd.DataFrame({
                "event_id": pdf["event_id"].to_numpy(),
                "host": key[0],
                "window_start": pdf["window_start"].to_numpy(),
                "decision": decision,
            })
        state.update((int(n_seen),))

    return keyed.groupBy("host", "window_start").applyInPandasWithState(
        serve,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
