"""Streaming heavy hitters: with generous capacity the streamed
counts equal exact full-data counts (items tracked from batch 0);
with tiny capacity the guarantee set survives within the documented
undercount bound; a replayed micro-batch converges instead of
double-counting."""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.streaming.topk_stream import (
    StreamingHeavyHitters)

BATCHES = [
    ["hot"] * 30 + ["warm"] * 10 + [f"rare{i}" for i in range(20)],
    ["hot"] * 25 + ["warm"] * 15 + ["late"] * 12 + [f"r2{i}" for i in range(20)],
    ["hot"] * 20 + ["late"] * 18 + ["warm"] * 5 + [f"r3{i}" for i in range(20)],
]


def _run(spark, tmp_path, capacity):
    drops = tmp_path / "drops"
    for rows in BATCHES:
        pdf = pd.DataFrame({"w": rows})
        spark.createDataFrame(pdf).coalesce(1) \
            .write.mode("append").parquet(str(drops))
    hh = StreamingHeavyHitters(str(tmp_path / "state"), "w",
                               capacity=capacity)
    stream = (spark.readStream.schema("w string")
              .option("maxFilesPerTrigger", 1).parquet(str(drops)))
    q = hh.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    return hh


def _exact():
    c = Counter()
    for rows in BATCHES:
        c.update(rows)
    return c


def test_generous_capacity_equals_exact_counts(spark, tmp_path):
    hh = _run(spark, tmp_path, capacity=500)
    exact = _exact()
    got = [(r.w, r.cnt) for r in hh.top_k(spark, 5).collect()]
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == want


def test_tiny_capacity_keeps_guarantee_set(spark, tmp_path):
    hh = _run(spark, tmp_path, capacity=3)
    exact = _exact()
    total = sum(exact.values())
    bound = total / (3 + 1)
    got = {r.w: r.cnt for r in hh.top_k(spark, 10).collect()}
    for w, c in exact.items():
        if c > bound:
            assert w in got
            assert c - bound <= got[w] <= c
    # 'hot' is a candidate in every batch partition: exact
    assert got["hot"] == exact["hot"]


def test_replay_converges(spark, tmp_path):
    hh = _run(spark, tmp_path, capacity=500)
    before = {r.w: r.cnt for r in hh.top_k(spark, 50).collect()}
    # simulate checkpoint-recovery replay of the last micro-batch
    last_batch = spark.createDataFrame(
        pd.DataFrame({"w": BATCHES[-1]}))
    hh._process_batch(last_batch, batch_id=len(BATCHES) - 1)
    after = {r.w: r.cnt for r in hh.top_k(spark, 50).collect()}
    assert after == before
