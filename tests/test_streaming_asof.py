"""Streaming as-of enrichment == the batch as-of join on the same
rows, once the watermark has passed every probe (three-form-consistency
style: the stateful streaming face against operators/asof.py)."""

from __future__ import annotations

import pytest

# r13 suite-budget trim: stateful-stream tests run their queries
# at 2 shuffle partitions (see conftest.stream_parts)
pytestmark = pytest.mark.usefixtures("stream_parts")

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.asof import asof_join
from eth_options_data_pipeline_spark.streaming.asof_stream import streaming_asof_enrich

BASE = dt.datetime(2025, 10, 27, 12, 0)


def _m(minute: int) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minute)


# (symbol, minute, batch) — build value = minute, probe value = 1000 + minute
BUILD = [
    ("A", 0, 1), ("A", 10, 1), ("A", 12, 2), ("A", 20, 2), ("A", 30, 2),
    ("B", 6, 1), ("B", 16, 2), ("B", 26, 2), ("B", 36, 2),
    # flush sentinels: advance the watermark so every probe is emitted
    ("A", 180, 3), ("B", 180, 3), ("A", 240, 4), ("B", 240, 4),
]
PROBE = [
    ("A", 5, 1), ("A", 15, 1), ("A", 25, 2), ("A", 35, 2),
    ("B", 5, 1), ("B", 15, 1), ("B", 25, 2), ("B", 35, 2),
]


def _write_batches(spark, rows, val_base, directory):
    for batch in sorted({b for _, _, b in rows}):
        pdf = pd.DataFrame(
            [(s, _m(m), float(val_base + m)) for s, m, b in rows if b == batch],
            columns=["sym", "ts", "val"],
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(str(directory))


def test_streaming_asof_matches_batch(spark, tmp_path):
    """4 micro-batches (one file per trigger per source); a build row
    arriving a batch late (A@12 in batch 2, between buffered probes
    A@5-emitted and A@15-buffered) must still win A@15's as-of lookup —
    the watermark buffer makes the join late-data-correct, which a
    naive per-batch join is not."""
    _write_batches(spark, BUILD, 0, tmp_path / "build")
    _write_batches(spark, PROBE, 1000, tmp_path / "probe")

    read = lambda d: (
        spark.readStream.schema("sym string, ts timestamp, val double")
        .option("maxFilesPerTrigger", 1).parquet(str(tmp_path / d))
    )
    out = streaming_asof_enrich(
        read("probe"), read("build"),
        key="sym", ts="ts", probe_val="val", build_val="val",
        watermark="10 minutes",
    )
    q = (
        out.writeStream.format("memory").queryName("asof_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("asof_out").orderBy("key", "ts").collect()

    # batch reference over the identical rows
    bdf = spark.createDataFrame(
        pd.DataFrame([("%s" % s, _m(m), float(m)) for s, m, _ in BUILD],
                     columns=["sym", "ts", "bval"]))
    pdf = spark.createDataFrame(
        pd.DataFrame([(s, _m(m), float(1000 + m)) for s, m, _ in PROBE],
                     columns=["sym", "ts", "pval"]))
    want = (
        asof_join(pdf, bdf, on="sym", ts="ts", payload=["bval"])
        .orderBy("sym", "ts").collect()
    )

    assert len(got) == len(PROBE), "every probe row must flush"
    for g, w in zip(got, want):
        assert (g["key"], g["ts"], g["probe_val"], g["asof_val"]) == \
               (w["sym"], w["ts"], w["pval"], w["bval"])

    # the late build row decided A@15 (12, not 10) — make the late-data
    # correctness explicit, not incidental
    a15 = [g for g in got if g["key"] == "A" and g["ts"] == _m(15)][0]
    assert a15["asof_val"] == 12.0
    # probe before any build row -> null
    b5 = [g for g in got if g["key"] == "B" and g["ts"] == _m(5)][0]
    assert b5["asof_val"] is None
