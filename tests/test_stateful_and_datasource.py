"""Custom stateful streaming operator + Python DataSource connector."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.sources_datasource import TickerDataSource
from eth_options_data_pipeline_spark.streaming.stateful import stateful_open_oi_change

AS_OF = dt.datetime(2025, 10, 27, 12, 30)


def test_stateful_open_oi_change_two_batches(spark, tmp_path):
    """Two snapshot drops through applyInPandasWithState == the batch
    lag-replay over the concatenated log."""
    rows = []
    for batch, (close_delta, oi_delta) in enumerate([(0.0, 0), (2.5, 7)]):
        ts = AS_OF + dt.timedelta(hours=batch)
        for i in range(20):
            rows.append((f"SYM{i}", ts, 10.0 + i + close_delta, 100 + i + oi_delta))
    import pandas as pd
    pdf = pd.DataFrame(rows, columns=["SYMBOL", "Time", "Close", "OI"])
    # write one parquet file per batch so maxFilesPerTrigger=1 gives one
    # micro-batch per drop
    for batch in (0, 1):
        ts = AS_OF + dt.timedelta(hours=batch)
        spark.createDataFrame(pdf[pdf.Time == ts]).coalesce(1).write.mode("append").parquet(
            str(tmp_path / "drops")
        )
    stream = (
        spark.readStream.schema("SYMBOL string, Time timestamp, Close double, OI long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "drops"))
    )
    out = stateful_open_oi_change(stream)
    q = (
        out.writeStream.format("memory").queryName("stateful_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from stateful_out")
    assert got.count() == 40
    second = got.where(F.col("Time") == AS_OF + dt.timedelta(hours=1))
    # second batch: Open == first batch Close (10+i), OI_Change == 7
    bad = second.where(
        (F.col("Open") != F.col("Close") - 2.5) | (F.col("OI_Change") != 7)
    ).count()
    assert bad == 0
    first = got.where(F.col("Time") == AS_OF)
    assert first.where((F.col("Open") != 0.0) | (F.col("OI_Change") != 0)).count() == 0


def test_ticker_datasource_roundtrip(spark):
    """The Python DataSource plans partitioned reads and feeds the
    normal pipeline."""
    spark.dataSource.register(TickerDataSource)
    df = (
        spark.read.format("eth_tickers")
        .option("as_of_date", "2025-10-27")
        .option("num_partitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    n = df.count()
    assert n == 4 * 41 * 2  # 4 expiries x 41 strikes x {C,P}
    # feeds the pipeline end-to-end
    from eth_options_data_pipeline_spark.pipeline import HOURLY, run
    out = run(df, None, HOURLY, AS_OF)
    assert out.count() > 0
    assert out.select(F.min("Strike")).first()[0] >= 3200 * 0.93
