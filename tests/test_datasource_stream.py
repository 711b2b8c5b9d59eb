"""Streaming face of the eth_tickers DataSource: one snapshot drop per
trigger, offsets checkpointed across runs (the reference's scheduled-
hourly-run model as a first-class stream source)."""

from __future__ import annotations

import pytest

# r13 suite-budget trim: stateful-stream tests run their queries
# at 2 shuffle partitions (see conftest.stream_parts)
pytestmark = pytest.mark.usefixtures("stream_parts")

from eth_options_data_pipeline_spark.sources_datasource import TickerDataSource


def _trigger_once(spark, tmp_path):
    stream = (
        spark.readStream.format("eth_tickers")
        .option("as_of_date", "2025-10-27")
        .option("max_batches", "3")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_reader_offsets_across_triggers(spark, tmp_path):
    spark.dataSource.register(TickerDataSource)
    for _ in range(4):  # 4 triggers; only 3 batches exist
        _trigger_once(spark, tmp_path)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == 3 * 328  # 4 expiries x 41 strikes x {C,P} per drop
    ois = sorted(
        r["oi_contracts"]
        for r in got.where("symbol = 'C-ETH-3200-281025'").collect()
    )
    assert ois == ["3", "4", "5"]  # per-batch OI shift proves distinct drops
