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


def test_sessionize_stream_closes_sessions(spark):
    from bamboo_spark.streaming import sessionize_stream

    # synthetic event time: 2 minutes per tick, alternating users →
    # per-user events are 4 min apart, far beyond the 1-min gap, so
    # every event closes the previous session once the watermark
    # (0 s delay, driven by later ticks) passes its timeout.
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "20").load()
        .select(
            F.timestamp_millis(F.col("value") * 120_000).alias("ts"),
            (F.col("value") % 2).alias("user_id"),
        )
    )
    sess = sessionize_stream(stream, gap_ms=60_000, watermark="0 seconds")
    assert sess.isStreaming
    assert set(sess.columns) == {"user_id", "session_start", "session_end", "n_events"}
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_t")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 45
        while time.time() < deadline:
            if spark.sql("select count(*) c from sess_t").collect()[0].c >= 2:
                break
            time.sleep(0.5)
        rows = spark.sql(
            "select user_id, n_events, session_start, session_end from sess_t"
        ).collect()
        assert len(rows) >= 2, "no sessions closed"
        assert {r.user_id for r in rows} <= {0, 1}
        for r in rows:
            assert r.n_events == 1  # 4-min spacing > 1-min gap
            assert r.session_start == r.session_end
    finally:
        q.stop()


def test_dedup_stream_drops_repeats(spark, tmp_path):
    import json, os
    from bamboo_spark.streaming import dedup_stream

    d = str(tmp_path / "in")
    os.makedirs(d)
    B = 100000  # clear of the epoch-0 initial watermark

    def emit(name, rows):
        with open(os.path.join(d, name), "w") as f:
            for ts_s, k in rows:
                f.write(json.dumps({"ts": B + ts_s, "k": k}) + "\n")

    # duplicate keys within one batch AND across batches inside the horizon
    emit("b1.json", [(1, "a"), (2, "a"), (3, "b")])
    stream = (
        spark.readStream.schema("ts long, k string").json(d)
        .select(F.timestamp_seconds("ts").alias("ts"), "k")
    )
    out = dedup_stream(stream, "k", watermark="10 minutes")
    assert out.isStreaming
    q = out.writeStream.format("memory").queryName("dd_t").outputMode("append").start()
    try:
        deadline = time.time() + 40
        while time.time() < deadline:
            if spark.sql("select count(*) c from dd_t").collect()[0].c >= 2:
                break
            time.sleep(0.5)
        emit("b2.json", [(5, "a"), (6, "c")])  # 'a' is a repeat within horizon
        deadline = time.time() + 40
        while time.time() < deadline:
            if spark.sql("select count(*) c from dd_t").collect()[0].c >= 3:
                break
            time.sleep(0.5)
        rows = spark.sql("select k, count(*) n from dd_t group by k").collect()
        got = {r.k: r.n for r in rows}
        assert got == {"a": 1, "b": 1, "c": 1}, got
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
