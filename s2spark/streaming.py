"""Structured Streaming surface (SURVEY.md §2.10).

The reference is a pure value library with no streaming semantics;
this is the engine-side demo mandated by the survey: tile assignment
is STATELESS (the encode UDF + parent() Column work unchanged on a
stream), and per-tile tumbling-window aggregation uses watermarked
event time — late rows beyond the watermark are dropped by Spark's
standard semantics, no custom state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s2spark import columns as CC
from s2spark.udfs import s2_cell_id

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def geo_events(events: DataFrame) -> DataFrame:
    """derive deterministic lat/lng for the demo (events carry no geo)
    and assign tiles — identical expression tree works for batch and
    stream (the point of the demo)."""
    lat = (F.col("user_id") % F.lit(170) - F.lit(85)
           + F.col("value") / F.lit(1000.0))
    lng = (F.col("event_id") % F.lit(360) - F.lit(180))
    df = events.withColumn("lat", lat).withColumn("lng", lng.cast("double"))
    df = df.withColumn("cell_id", s2_cell_id("lat", "lng"))
    return df.withColumn("tile_id", CC.parent("cell_id", 8)) \
        .withColumn("tile_token", CC.token("tile_id"))


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)


def windowed_tile_counts(events: DataFrame,
                         watermark: str = "30 minutes") -> DataFrame:
    """per-(window, tile) event counts with late-data watermark; works
    on both a batch and a streaming DataFrame."""
    df = geo_events(events)
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return df.groupBy(F.window("ts", "10 minutes").start.alias("win_start"),
                      "tile_token") \
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))


def run_stream_to_memory(spark: SparkSession, events_dir: str,
                         name: str = "tile_counts") -> DataFrame:
    """process all available input (availableNow) into a memory sink;
    returns the sink table."""
    q = windowed_tile_counts(read_events_stream(spark, events_dir)) \
        .writeStream.format("memory").queryName(name) \
        .outputMode("complete").trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.table(name)
