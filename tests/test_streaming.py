"""Streaming smoke tests: flatten on a stream, watermark windowed agg.

Uses the rate source + memory sink (no external systems)."""

import time

import pytest
from pyspark.sql import functions as F

from bamboo_spark.streaming import flatten_stream, windowed_counts


def test_flatten_stream_plan(spark):
    # plan generation on a streaming frame must not require an action
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "10").load()
        .select(
            F.col("timestamp"),
            F.struct(
                F.array(F.col("value"), F.col("value") + 1).alias("xs"),
                (F.col("value") % 2).alias("flag"),
            ).alias("payload"),
        )
    )
    flat = flatten_stream(stream)
    assert flat.isStreaming
    assert set(flat.columns) == {"timestamp", "xs", "flag"}

    q = flat.writeStream.format("memory").queryName("flat_t").outputMode("append").start()
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("select count(*) c from flat_t").collect()[0].c >= 4:
                break
            time.sleep(0.5)
        rows = spark.sql(
            "select flag, count(*) n from flat_t group by flag"
        ).collect()
        assert rows  # exploded rows arrived
    finally:
        q.stop()


def test_windowed_counts_stream(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 3).cast("string").alias("event_type"),
        )
    )
    agg = windowed_counts(stream, window="10 seconds", watermark="30 seconds")
    assert agg.isStreaming
    q = (
        agg.writeStream.format("memory")
        .queryName("win_t")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("select count(*) c from win_t").collect()[0].c >= 1:
                break
            time.sleep(0.5)
        assert spark.sql("select sum(n_events) s from win_t").collect()[0].s >= 1
    finally:
        q.stop()
