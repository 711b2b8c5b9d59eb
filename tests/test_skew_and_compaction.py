"""Salted-join equivalence on skewed data + partition compaction."""

from __future__ import annotations

import datetime as dt
import glob

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.skew import salted_join
from eth_options_data_pipeline_spark.pipeline import HOURLY, run
from eth_options_data_pipeline_spark.sinks import append_snapshot, compact_partition
from eth_options_data_pipeline_spark.sources import synthetic_tickers

AS_OF = dt.datetime(2025, 10, 27, 12, 30)


def test_salted_join_equals_plain_join(spark):
    # 90% of the large side lands on one hot key
    large = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise((F.col("id") % 50) + 2).alias("k"),
        F.col("id").alias("payload"),
    )
    other = spark.range(1, 60).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    plain = large.join(other, "k")
    salted = salted_join(large, other, on="k", salts=8)
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
    # left join preserves unmatched rows too
    plain_l = large.join(other, "k", "left")
    salted_l = salted_join(large, other, on="k", salts=8, how="left")
    assert plain_l.exceptAll(salted_l).count() == 0
    assert salted_l.exceptAll(plain_l).count() == 0


def test_compact_partition_preserves_rows(spark, tmp_path):
    out = run(synthetic_tickers(spark, AS_OF.date()), None, HOURLY, AS_OF)
    path = str(tmp_path / "chain")
    for _ in range(4):  # four hourly appends -> many small files
        append_snapshot(out, path)
    part = f"Date={AS_OF.date().isoformat()}"
    files_before = glob.glob(f"{path}/{part}/*.parquet")
    before = spark.read.parquet(path).collect()
    n = compact_partition(spark, path, part, target_files=1)
    files_after = glob.glob(f"{path}/{part}/*.parquet")
    after = spark.read.parquet(f"{path}/{part}").collect()
    assert n == len(before) == len(after)
    assert len(files_after) == 1 and len(files_before) >= 4
    assert sorted(map(tuple, (r[:5] for r in before))) == sorted(map(tuple, (r[:5] for r in after)))
