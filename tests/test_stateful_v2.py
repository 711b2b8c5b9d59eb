"""transformWithStateInPandas variant — runs only where the protobuf
dependency exists (gated; the applyInPandasWithState form is the
always-available operator, tested in test_stateful_and_datasource)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from eth_options_data_pipeline_spark.streaming import stateful_v2

AS_OF = dt.datetime(2025, 10, 27, 12, 30)


def test_gate_reports_clearly(spark):
    if stateful_v2.is_available():
        pytest.skip("protobuf present — gate not exercised")
    with pytest.raises(NotImplementedError, match="protobuf"):
        stateful_v2.stateful_open_oi_change_v2(
            spark.readStream.format("rate").load()
        )


@pytest.mark.skipif(not stateful_v2.is_available(), reason="google.protobuf not installed")
def test_v2_matches_v1_semantics(spark, tmp_path):
    for b, (c0, o0) in enumerate([(10.0, 100), (20.0, 200)]):
        ts = AS_OF + dt.timedelta(hours=b)
        pdf = pd.DataFrame(
            [(f"S{i}", ts, c0 + i, o0 + i) for i in range(5)],
            columns=["SYMBOL", "Time", "Close", "OI"],
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(str(tmp_path / "drops"))
    stream = (
        spark.readStream.schema("SYMBOL string, Time timestamp, Close double, OI long")
        .option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "drops"))
    )
    q = (
        stateful_v2.stateful_open_oi_change_v2(stream)
        .writeStream.format("memory").queryName("tws_v2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from tws_v2").collect()
    assert len(rows) == 10
    second = [r for r in rows if r["Time"] == AS_OF + dt.timedelta(hours=1)]
    assert all(r["Open"] == r["Close"] - 10.0 and r["OI_Change"] == 100 for r in second)
