"""Event-time windowed streaming aggregations with watermark-based
late-data handling.

The reference has no event-time semantics (its "streaming" is chunked
batch); these are the Structured Streaming operators a training-data
ingest pipeline needs: tumbling/sliding window counts over an event
stream with a watermark bounding state and dropping too-late rows.
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
