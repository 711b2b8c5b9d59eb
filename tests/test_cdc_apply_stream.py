"""Streaming CDC apply: applying change batches through a stopped-
and-restarted stream equals the one-shot relational merge, and a
replayed batch converges (no double-application)."""

from __future__ import annotations

import pytest

# r13 suite-budget trim: stateful-stream tests run their queries
# at 2 shuffle partitions (see conftest.stream_parts)
pytestmark = pytest.mark.usefixtures("stream_parts")

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.sources import load_table
from eth_options_data_pipeline_spark.streaming.cdc_apply import (
    StreamingCdcApply,
)


def _agg(df):
    return sorted(tuple(r) for r in df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("total")).collect())


def test_cdc_stream_restart_and_replay(spark, sf_small, tmp_path):
    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    base = orders.where(F.col("o_orderkey") % 3 != 0)
    updates = orders.where(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") * 2, 2))

    table = str(tmp_path / "table")
    arrivals = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    base.write.partitionBy("o_orderpriority").parquet(table)
    apply_ = StreamingCdcApply(table, ("o_orderkey",), "o_orderpriority")

    def run():
        changes = (spark.readStream.schema(updates.schema)
                   .option("maxFilesPerTrigger", 1).parquet(arrivals))
        q = apply_.start(changes, ckpt)
        q.awaitTermination(180)

    # batch 0 arrives, stream runs and stops
    (updates.where(F.col("o_orderkey") % 3 == 0).coalesce(1)
     .write.mode("append").parquet(arrivals))
    run()
    # remaining changes arrive, stream restarts from the checkpoint
    for i in (1, 2):
        (updates.where(F.col("o_orderkey") % 3 == i).coalesce(1)
         .write.mode("append").parquet(arrivals))
    run()

    want = _agg(
        base.join(updates, "o_orderkey", "left_anti").unionByName(updates))
    assert _agg(spark.read.parquet(table)) == want

    # replay: re-applying an already-applied batch converges
    apply_._process_batch(updates.where(F.col("o_orderkey") % 3 == 1), 99)
    assert _agg(spark.read.parquet(table)) == want
