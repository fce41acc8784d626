"""Event-time windowed streaming aggregations with watermark-based
late-data handling.

The reference has no event-time semantics (its "streaming" is chunked
batch); these are the Structured Streaming operators a training-data
ingest pipeline needs: tumbling/sliding window counts over an event
stream with a watermark bounding state and dropping too-late rows, plus a
custom stateful operator (per-user gap sessionization via
``applyInPandasWithState`` with an event-time timeout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    slide: str | None = None,
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) event-time window counts.

    The watermark bounds aggregation state: rows later than
    max(event time) - watermark are dropped, so state per key is finite
    even on an unbounded stream.
    """
    w = (F.window("ts", window, slide) if slide
         else F.window("ts", window))
    return (events
            .withWatermark("ts", watermark)
            .groupBy(w.alias("win"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("total_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "event_type", "n", "total_value"))


def run_windowed_stream(spark: SparkSession, in_path: str, out_path: str,
                        checkpoint: str, window: str = "1 hour",
                        watermark: str = "2 hours"):
    """File-source stream → watermarked window agg → parquet (append mode:
    only windows closed by the watermark are emitted — exactly-once)."""
    events = read_events_stream(spark, in_path)
    agg = windowed_counts(events, window=window, watermark=watermark)
    return (agg.writeStream
            .format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


SESSION_OUT_SCHEMA = ("user_id bigint, session_start timestamp, "
                      "session_end timestamp, n_events bigint, "
                      "value_sum double")
SESSION_STATE_SCHEMA = ("session_start timestamp, last_ts timestamp, "
                        "n bigint, vsum double")


def stateful_sessions(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator: per-user gap sessionization via
    ``applyInPandasWithState`` (the SURVEY's custom-stateful-operator
    device; batch twin = the session_window query `events_sessionize`).

    State per user = the open session (start, last event, count, value
    sum). A batch's events extend or close it: any gap > ``gap_minutes``
    emits the closed session downstream (append mode) and opens a new one.
    The still-open session stays in state across micro-batches — a session
    spanning two input files is emitted ONCE with all its events counted
    (exactly-once through the checkpoint). An event-time timeout set one
    gap past the last event closes idle sessions when the watermark
    passes, so state is bounded on an unbounded stream.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60_000

    def fn(key, pdfs, state: GroupState):
        import pandas as pd
        (user_id,) = key
        gap = pd.Timedelta(minutes=gap_minutes)
        cols = ["user_id", "session_start", "session_end", "n_events",
                "value_sum"]

        if state.hasTimedOut:
            s0, last, n, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, s0, last, int(n), float(vsum))], columns=cols)
            return

        if state.exists:
            s0, last, n, vsum = state.get
            s0, last = pd.Timestamp(s0), pd.Timestamp(last)
        else:
            s0 = last = None
            n, vsum = 0, 0.0

        out = []
        batch = pd.concat(list(pdfs)).sort_values("ts")
        for ts, val in zip(batch["ts"], batch["value"]):
            if last is not None and ts - last > gap:
                out.append((user_id, s0, last, int(n), float(vsum)))
                s0, n, vsum = None, 0, 0.0
            if s0 is None:
                s0 = ts
            last = ts
            n += 1
            vsum += float(val)

        if last is not None:
            state.update((s0.to_pydatetime(), last.to_pydatetime(),
                          int(n), float(vsum)))
            state.setTimeoutTimestamp(
                int(last.to_pydatetime().timestamp() * 1000) + gap_ms)
        yield pd.DataFrame(out, columns=cols)

    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))


def run_session_stream(spark: SparkSession, in_path: str, out_path: str,
                       checkpoint: str, gap_minutes: int = 30):
    """File-source stream → stateful sessionizer → parquet, availableNow."""
    events = read_events_stream(spark, in_path)
    sessions = stateful_sessions(events, gap_minutes=gap_minutes)
    return (sessions.writeStream
            .format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


DOCS_STREAM_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("ingest_ts", T.TimestampType()),
    T.StructField("text", T.StringType()),
])


def stream_exact_dedup(docs: DataFrame, watermark: str = "1 hour",
                       text_col: str = "text",
                       ts_col: str = "ingest_ts") -> DataFrame:
    """Streaming exact deduplication: first-seen doc per content hash wins.

    ``dropDuplicatesWithinWatermark`` on (md5(text)) with a watermark on
    the ingest timestamp — Structured Streaming keeps one state row per
    distinct hash and evicts it once the watermark passes the row's event
    time, so state is bounded on an unbounded ingest stream (an
    exact-dedup ledger over the full history would grow forever; the
    bounded-state trade: re-ingested duplicates separated by more than
    the horizon pass through). Plain ``dropDuplicates`` would NOT bound
    state here: watermark eviction for it applies only when the
    event-time column is part of the dedup key subset, and text_hash is
    not an event-time column — its state would grow forever. Batch twin:
    operators.dedup.exact_duplicates.
    """
    return (docs
            .withColumn("text_hash", F.md5(F.col(text_col)))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["text_hash"]))


def run_dedup_stream(spark: SparkSession, in_path: str, out_path: str,
                     checkpoint: str, watermark: str = "1 hour"):
    """File-source ingest stream → watermarked exact dedup → parquet
    (append; availableNow for incremental batch-over-stream runs)."""
    docs = spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(in_path)
    out = stream_exact_dedup(docs, watermark=watermark)
    return (out.writeStream
            .format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
