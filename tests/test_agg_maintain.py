"""Streaming MV maintenance: served aggregate == from-scratch
recompute, micro-batch replay is idempotent, and compaction preserves
the state exactly."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.incremental_agg import (
    finalize, partial_state,
)
from eth_options_data_pipeline_spark.sources import load_table
from eth_options_data_pipeline_spark.streaming.agg_maintain import (
    StreamingAggMaintenance,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_maintained_equals_recompute_replay_and_compact(
        spark, sf_small, tmp_path):
    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    arrivals = str(tmp_path / "in")
    for i in range(3):
        (orders.where(F.col("o_orderkey") % 3 == i).coalesce(1)
         .write.mode("append").parquet(arrivals))

    maint = StreamingAggMaintenance(
        str(tmp_path / "state"), ["o_orderpriority"], "o_totalprice")
    stream = (spark.readStream.schema(orders.schema)
              .option("maxFilesPerTrigger", 1).parquet(arrivals))
    q = maint.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    want = _rows(finalize(
        partial_state(orders, ["o_orderpriority"], "o_totalprice"),
        ["o_orderpriority"]))
    assert _rows(maint.current(spark)) == want

    # replayed micro-batch (same batch_id) overwrites its own
    # partition — the served aggregate must not double-count
    maint._process_batch(orders.where(F.col("o_orderkey") % 3 == 1), 1)
    assert _rows(maint.current(spark)) == want

    # compaction folds all partitions into one; the aggregate is
    # bit-identical and the read-side merge factor drops to 1
    maint.compact(spark)
    assert _rows(maint.current(spark)) == want
    parts = {p.split("batch_id=")[1].split("/")[0]
             for p in glob.glob(str(tmp_path / "state" / "batch_id=*"))}
    assert parts == {"-1"}
