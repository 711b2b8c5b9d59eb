"""Stream-static broadcast enrichment (the streaming face of J2's
dimension lookup)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.streaming.stream import enrich_with_static


def test_enrich_with_static_dim(spark, tmp_path):
    rows = [(f"S{i % 3}", dt.datetime(2025, 1, 1, 12, i), float(i)) for i in range(9)]
    spark.createDataFrame(rows, "symbol string, ts timestamp, px double") \
        .coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "ticks"))
    dim = spark.createDataFrame(
        [("S0", "weekly"), ("S1", "monthly")], "symbol string, tenor string"
    )
    stream = spark.readStream.schema("symbol string, ts timestamp, px double") \
        .parquet(str(tmp_path / "ticks"))
    out = enrich_with_static(stream, dim, on="symbol")
    q = (
        out.writeStream.format("memory").queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from enriched")
    assert got.count() == 9
    assert got.where(F.col("symbol") == "S2").where(F.col("tenor").isNull()).count() == 3
    assert got.where(F.col("symbol") == "S0").where(F.col("tenor") == "weekly").count() == 3
