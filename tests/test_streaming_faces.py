"""Streaming faces vs their batch oracles: sliding windows, session
windows, dedup-within-watermark."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.sources import load_table
from eth_options_data_pipeline_spark.streaming.stream import (
    dedup_symbols_within_watermark,
    session_event_counts,
    sliding_event_counts,
)


def _drain(df, tmp_path, name):
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_sliding_stream_matches_batch(spark, sf_small, tmp_path):
    events = load_table(spark, sf_small, "events")
    events.write.mode("overwrite").parquet(str(tmp_path / "ev"))
    stream = spark.readStream.schema(events.schema).parquet(str(tmp_path / "ev"))
    _drain(sliding_event_counts(stream), tmp_path, "slide")
    got = spark.sql("select * from slide")
    batch = (
        events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w").start.alias("window_start"), "event_type", "cnt")
    )
    assert got.exceptAll(batch).count() == 0
    assert got.count() > 0


def test_session_stream_plausible(spark, sf_small, tmp_path):
    events = load_table(spark, sf_small, "events")
    events.write.mode("overwrite").parquet(str(tmp_path / "ev2"))
    stream = spark.readStream.schema(events.schema).parquet(str(tmp_path / "ev2"))
    _drain(session_event_counts(stream), tmp_path, "sess")
    got = spark.sql("select * from sess")
    assert got.count() > 0
    # session totals cover every event the watermark closed
    assert got.agg(F.sum("n_events")).first()[0] <= events.count()


def test_dedup_within_watermark_keeps_first(spark, tmp_path):
    """One row per symbol, and it is the FIRST-arriving one — the
    documented deviation from W4's batch keep-last (see
    dedup_symbols_within_watermark docstring): correct for verbatim
    re-deliveries; when per-key updates differ, use the keyed stateful
    operator (streaming/stateful.py) or the foreachBatch pipeline."""
    rows = []
    base = dt.datetime(2025, 1, 1, 12, 0)
    for i in range(10):
        # payload differs between duplicates so first-vs-last is visible
        rows.append((f"S{i % 3}", base + dt.timedelta(minutes=i), i))
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, seq int")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "ticks"))
    stream = spark.readStream.schema("symbol string, ts timestamp, seq int").parquet(str(tmp_path / "ticks"))
    _drain(dedup_symbols_within_watermark(stream), tmp_path, "dedup")
    got = spark.sql("select * from dedup")
    assert got.count() == 3
    kept = {r["symbol"]: r["seq"] for r in got.collect()}
    # single input file -> one batch, ordered scan: first occurrence wins
    assert kept == {"S0": 0, "S1": 1, "S2": 2}
