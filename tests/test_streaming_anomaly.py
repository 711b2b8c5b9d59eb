"""Streaming rolling z == batch rolling z on the same rows once the
watermark passes them, including rows that arrive out of event-time
order across micro-batches (the case a naive per-batch scorer gets
wrong)."""

from __future__ import annotations

import pytest

# r13 suite-budget trim: stateful-stream tests run their queries
# at 2 shuffle partitions (see conftest.stream_parts)
pytestmark = pytest.mark.usefixtures("stream_parts")

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.anomaly import rolling_zscore
from eth_options_data_pipeline_spark.streaming.anomaly_stream import (
    streaming_rolling_zscore,
)

BASE = dt.datetime(2025, 11, 3, 9, 0)

# (event_id, minute, value, batch): key A gets a flat baseline, a
# LATE-arriving baseline row (id 7, minute 7, lands in batch 2 after
# minute-8/9 rows were seen in batch 1), then a spike; key B stays flat
ROWS = [
    (0, 0, 10.0, 1), (1, 1, 10.2, 1), (2, 2, 9.9, 1), (3, 3, 10.1, 1),
    (4, 4, 10.0, 1), (5, 5, 9.8, 1), (6, 6, 10.2, 1),
    (8, 8, 10.0, 1), (9, 9, 10.1, 1),
    (7, 7, 9.9, 2),                       # late row, inside watermark
    (10, 10, 10.0, 2), (11, 11, 9.95, 2),
    (12, 12, 30.0, 3),                    # spike
    (99, 180, 10.0, 4), (98, 240, 10.0, 5),   # flush sentinels
]


def _write_batches(spark, directory):
    for batch in sorted({b for *_, b in ROWS}):
        pdf = pd.DataFrame(
            [("A", i, BASE + dt.timedelta(minutes=m), v)
             for i, m, v, b in ROWS if b == batch],
            columns=["sym", "event_id", "ts", "value"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append") \
            .parquet(str(directory))


def test_streaming_z_matches_batch(spark, tmp_path):
    _write_batches(spark, tmp_path / "in")
    stream = (
        spark.readStream
        .schema("sym string, event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "in"))
    )
    out = streaming_rolling_zscore(
        stream, key="sym", ts="ts", tiebreak="event_id", value="value",
        lookback=20, min_periods=5, watermark="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("anom_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r.event_id: r.z for r in spark.table("anom_out").collect()}

    bdf = spark.createDataFrame(
        pd.DataFrame([("A", i, BASE + dt.timedelta(minutes=m), v)
                      for i, m, v, _ in ROWS],
                     columns=["user_id", "event_id", "ts", "value"]))
    want = {
        r.event_id: r.z
        for r in rolling_zscore(bdf, lookback=20, min_periods=5,
                                decimals=9).collect()
    }

    # every row except the final sentinel must flush (98 holds the max
    # event time, so the watermark never passes it — inherent to
    # append-final semantics) and agree with the batch score; 99 only
    # flushes via the event-time timeout in the trailing no-data batch
    for eid, wz in want.items():
        if eid == 98:
            continue
        assert eid in got, f"event {eid} never emitted"
        gz = got[eid]
        if wz is None:
            assert gz is None, f"event {eid}: stream {gz}, batch None"
        else:
            assert gz is not None and round(gz, 9) == wz, \
                f"event {eid}: stream {gz}, batch {wz}"

    # the late row (id 7) was scored in event-time position: the spike's
    # baseline includes it, and the spike is the clear outlier
    assert got[12] == max(v for v in got.values() if v is not None)
    assert got[12] > 2.5


def test_streaming_z_survives_restart(spark, tmp_path):
    """Stop the query after the early batches and restart from the
    checkpoint: per-key state (history + pending buffer) must recover
    so the combined output across both runs equals the single-run
    score — the replay/recovery contract of a production monitor."""
    indir, ckpt = tmp_path / "in", str(tmp_path / "ckpt")
    schema = "sym string, event_id long, ts timestamp, value double"

    outdir = str(tmp_path / "out")

    def start():
        # file sink, not memory: the memory sink refuses checkpoint
        # recovery, and recovery is exactly what this test pins
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(indir)))
        out = streaming_rolling_zscore(
            stream, key="sym", ts="ts", tiebreak="event_id",
            value="value", lookback=20, min_periods=5,
            watermark="10 minutes")
        return (out.writeStream.format("parquet")
                .option("path", outdir)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())

    # run 1: only the first two batches exist
    for batch in (1, 2):
        pdf = pd.DataFrame(
            [("A", i, BASE + dt.timedelta(minutes=m), v)
             for i, m, v, b in ROWS if b == batch],
            columns=["sym", "event_id", "ts", "value"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append") \
            .parquet(str(indir))
    q = start(); q.awaitTermination(120)
    got = {r.event_id: r.z for r in spark.read.parquet(outdir).collect()}

    # run 2: the rest arrives, new query restarts from the checkpoint
    for batch in (3, 4, 5):
        pdf = pd.DataFrame(
            [("A", i, BASE + dt.timedelta(minutes=m), v)
             for i, m, v, b in ROWS if b == batch],
            columns=["sym", "event_id", "ts", "value"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append") \
            .parquet(str(indir))
    q = start(); q.awaitTermination(120)
    got = {r.event_id: r.z for r in spark.read.parquet(outdir).collect()}

    bdf = spark.createDataFrame(
        pd.DataFrame([("A", i, BASE + dt.timedelta(minutes=m), v)
                      for i, m, v, _ in ROWS],
                     columns=["user_id", "event_id", "ts", "value"]))
    want = {r.event_id: r.z
            for r in rolling_zscore(bdf, lookback=20, min_periods=5,
                                    decimals=9).collect()}
    for eid, wz in want.items():
        if eid == 98:      # max event time: watermark never passes it
            continue
        assert eid in got, f"event {eid} never emitted after restart"
        gz = got[eid]
        if wz is None:
            assert gz is None
        else:
            assert gz is not None and round(gz, 9) == wz, (eid, gz, wz)


def test_streaming_z_random_arrival_orders(spark, tmp_path):
    """Seeded fuzz: 40 events across two keys arrive in a shuffled
    order over 4 micro-batches; every row the watermark passes must
    score exactly like the batch kernel regardless of arrival order."""
    import random
    rng = random.Random(20260814)
    events = []
    for key, base_val in (("A", 10.0), ("B", 50.0)):
        for i in range(20):
            events.append(
                (key, len(events), BASE + dt.timedelta(minutes=i * 3),
                 base_val + rng.uniform(-1, 1) + (25 if i == 15 else 0)))
    # arrival disorder must stay INSIDE the 15-minute watermark: rows
    # later than the allowed lateness are (correctly) dropped by the
    # engine before they reach the state function. So: contiguous
    # event-time blocks per batch, shuffled within each block, plus one
    # genuinely-late straggler pushed from each block's tail into the
    # next batch (within the delay).
    ordered = sorted(events, key=lambda e: (e[2], e[1]))
    blocks = [ordered[i * 10:(i + 1) * 10] for i in range(4)]
    for b in blocks:
        rng.shuffle(b)
    batches = []
    carry = []
    for b in blocks:
        b = carry + b
        late = max(b, key=lambda e: e[2])       # tail row -> next batch
        b.remove(late)
        carry = [late]
        batches.append(b)
    batches.append(carry)
    # one final far-future row per key so the watermark passes the rest
    flush_t = BASE + dt.timedelta(hours=6)
    sentinels = [("A", 98, flush_t, 10.0), ("B", 99, flush_t, 50.0)]
    batches[-1] += sentinels

    indir = str(tmp_path / "in")
    for batch in batches:
        pdf = pd.DataFrame(batch,
                           columns=["sym", "event_id", "ts", "value"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append") \
            .parquet(indir)
    stream = (spark.readStream
              .schema("sym string, event_id long, ts timestamp, value double")
              .option("maxFilesPerTrigger", 1).parquet(indir))
    out = streaming_rolling_zscore(
        stream, key="sym", ts="ts", tiebreak="event_id", value="value",
        lookback=10, min_periods=4, watermark="15 minutes")
    q = (out.writeStream.format("memory").queryName("anom_fuzz")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r.event_id: r.z for r in spark.table("anom_fuzz").collect()}

    bdf = spark.createDataFrame(
        pd.DataFrame(events + sentinels,
                     columns=["user_id", "event_id", "ts", "value"]))
    want = {r.event_id: r.z
            for r in rolling_zscore(bdf, lookback=10, min_periods=4,
                                    decimals=9).collect()}
    for eid, wz in want.items():
        if eid in (98, 99):   # max event times never flush
            continue
        assert eid in got, f"event {eid} never emitted"
        gz = got[eid]
        if wz is None:
            assert gz is None, (eid, gz)
        else:
            assert gz is not None and round(gz, 9) == wz, (eid, gz, wz)
