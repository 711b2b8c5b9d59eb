"""Streaming corpus ingest == the sequential batch accept_batch loop;
replaying a micro-batch is idempotent; the gate drops junk."""

from __future__ import annotations

import pytest

# r13 suite-budget trim: stateful-stream tests run their queries
# at 2 shuffle partitions (see conftest.stream_parts)
pytestmark = pytest.mark.usefixtures("stream_parts")

import pandas as pd
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.streaming.ingest import (
    StreamingCorpusIngest, quality_gate,
)

BATCH1 = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "one two three four five six seven eight nine ten eleven twelve"),
    (2, "too short"),                                       # gated: < 5 words
    (3, "loop. loop. loop. loop. loop. loop. one more line here."),  # gated: repetition
]
BATCH2 = [
    (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of 0
    (11, "fresh second-drop document with plenty of new words inside it"),
    (12, "fresh second-drop document with plenty of new words inside it"),  # dup of 11
]


def _write_drop(spark, rows, directory):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(str(directory))


def test_gate(spark):
    df = spark.createDataFrame(pd.DataFrame(BATCH1, columns=["doc_id", "text"]))
    kept = {r["doc_id"] for r in quality_gate(df).collect()}
    assert kept == {0, 1}


def test_ingest_stream_matches_sequential_accepts(spark, tmp_path):
    drops = tmp_path / "drops"
    _write_drop(spark, BATCH1, drops)
    _write_drop(spark, BATCH2, drops)

    ingest = StreamingCorpusIngest(str(tmp_path / "accepted"), str(tmp_path / "index"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(str(drops))
    )
    q = ingest.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    got = {r["doc_id"]: r["batch_id"] for r in accepted.collect()}
    # batch1: 0,1 pass gate and are novel; batch2: 10 dups 0, 12 dups 11
    assert set(got) == {0, 1, 11}
    assert got[11] != got[0]  # landed by different micro-batches
    # index covers exactly the accepted docs
    idx = spark.read.parquet(str(tmp_path / "index"))
    assert {r["doc_id"] for r in idx.select("doc_id").distinct().collect()} == {0, 1, 11}

    # restart on the same checkpoint: no new batches, no duplicates
    q2 = ingest.start(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(str(drops)),
        str(tmp_path / "ckpt"))
    q2.awaitTermination(180)
    assert spark.read.parquet(str(tmp_path / "accepted")).count() == 3


def test_replayed_batch_overwrites_not_appends(spark, tmp_path):
    """Simulate a checkpoint-recovery replay: processing the same
    (batch_df, batch_id) twice lands one copy."""
    ingest = StreamingCorpusIngest(str(tmp_path / "accepted"), str(tmp_path / "index"))
    df = spark.createDataFrame(pd.DataFrame(BATCH1, columns=["doc_id", "text"]))
    ingest._process_batch(df, 0)
    first = spark.read.parquet(str(tmp_path / "accepted")).count()
    ingest._process_batch(df, 0)   # replay
    again = spark.read.parquet(str(tmp_path / "accepted")).count()
    assert first == again == 2
    # and the replay didn't self-flag against its own previous output
    ids = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "accepted")).collect()}
    assert ids == {0, 1}
