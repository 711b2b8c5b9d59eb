"""Streaming mode (SURVEY §2.10): the reference is a manually-scheduled
micro-batch stream — hourly GitHub-Actions runs, each reading the tail
of the history as state and appending one snapshot. The Structured
Streaming equivalents:

  * trigger cadence        -> trigger(availableNow=True) per drop
  * last-300-row state     -> a compact `latest_snapshot` parquet table
                              maintained by foreachBatch (incremental
                              batch, the recommended form), or keyed
                              streaming state
  * keep-last dedup        -> dropDuplicatesWithinWatermark
  * append-only sheet      -> outputMode('append') partitioned parquet
  * re-run double-append   -> checkpointing makes re-delivery exactly-once

Windowed event-time aggregation over the `events` shape (watermark +
tumbling/sliding/session windows) generalizes the reference to real
event-time feeds; their batch faces are oracle-checked as
sx01/sx02/sx03 in the query corpus.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.snapshot import derive_open_oi_change, latest_per_key
from eth_options_data_pipeline_spark.pipeline import PipelineConfig, snapshot
from eth_options_data_pipeline_spark.schemas import OPTIONS_CHAIN_COLUMNS, TICKER_RAW


def read_ticker_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of landed ticker drops (one JSON file per
    fetch — the streaming face of the reference's hourly REST poll)."""
    return (
        spark.readStream.schema(TICKER_RAW)
        .option("maxFilesPerTrigger", 1)   # one snapshot per micro-batch
        .json(input_dir)
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window aggregate with late-data bound —
    sx01's streaming face. Append-mode-safe (watermarked)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(F.col("w").start.alias("window_start"),
                F.col("w").end.alias("window_end"),
                "event_type", "cnt", "sum_value")
    )


def sliding_event_counts(events: DataFrame, window: str = "2 hours",
                         slide: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Sliding windows — sx03's streaming face."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w").start.alias("window_start"), "event_type", "cnt")
    )


def session_event_counts(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Session windows (30-min inactivity gap) — sx02's streaming face."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w").start.alias("session_start"), "user_id",
                "n_events", "sum_value")
    )


def enrich_with_static(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: enrich a stream against a broadcast static
    dimension (e.g., per-symbol contract metadata). The static side is
    re-read per micro-batch, so slowly-changing dimensions pick up
    updates without restarting the query; broadcast keeps the stream
    side shuffle-free."""
    from pyspark.sql import functions as _F

    return stream.join(_F.broadcast(dim), on=on, how="left")


def dedup_symbols_within_watermark(tickers: DataFrame, ts_col: str = "ts",
                                   watermark: str = "1 hour") -> DataFrame:
    """W4's streaming face: keep one row per SYMBOL with bounded state
    (dropDuplicatesWithinWatermark evicts keys once the watermark
    passes — the stream-safe version of drop_duplicates)."""
    return tickers.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["symbol"])


class StreamingOptionsPipeline:
    """The full reference dataflow as an incremental stream.

    foreachBatch runs the (already-tested) batch pipeline per drop and
    maintains a compact latest-snapshot state table — state is
    O(|symbols|) regardless of history length, which is exactly the
    reference's tail-300 intent done scale-safely (SURVEY §7.4 trap 2).
    Checkpointing gives exactly-once appends (fixing the reference's
    double-append-on-rerun, SURVEY §2.10).
    """

    def __init__(self, config: PipelineConfig, output_dir: str, state_dir: str,
                 as_of_for_batch=None):
        self.config = config
        self.output_dir = output_dir
        self.state_dir = state_dir
        # injectable batch-time policy for deterministic tests
        self.as_of_for_batch = as_of_for_batch or (lambda batch_id: dt.datetime.utcnow())

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        as_of = self.as_of_for_batch(batch_id)
        snap = snapshot(batch_df, self.config, as_of)
        state_path = os.path.join(self.state_dir, "latest_snapshot")
        # existence check, not try/except: a failed read would log a
        # full executor stack trace on every cold start
        prev = spark.read.parquet(state_path) if os.path.isdir(state_path) else None
        if prev is not None:
            snap = derive_open_oi_change(snap, prev)
        out = snap.select(*OPTIONS_CHAIN_COLUMNS)
        out.write.mode("append").partitionBy("Date").parquet(self.output_dir)
        # fold the new snapshot into the compact keyed state
        new_state = out if prev is None else prev.unionByName(out)
        latest = latest_per_key(new_state, keys=("SYMBOL",), order_cols=("Date", "Time"))
        tmp = state_path + ".tmp"
        latest.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(state_path)

    def start(self, tickers: DataFrame, checkpoint_dir: str):
        return (
            tickers.writeStream
            .foreachBatch(self._process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
