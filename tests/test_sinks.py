"""Sink contract (S2/S3/S4): partitioned append, idempotent overwrite
per run, sink-boundary formatting, history read-back."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.pipeline import HOURLY, run
from eth_options_data_pipeline_spark.sinks import (
    append_snapshot, format_for_export, overwrite_run, read_history,
)
from eth_options_data_pipeline_spark.sources import synthetic_tickers

AS_OF = dt.datetime(2025, 10, 27, 12, 30)


def test_append_and_readback_partitioned(spark, tmp_path):
    out = run(synthetic_tickers(spark, AS_OF.date()), None, HOURLY, AS_OF)
    path = str(tmp_path / "chain")
    append_snapshot(out, path)
    append_snapshot(out, path)  # reference semantics: append twice = 2x rows
    back = read_history(spark, path)
    assert back.count() == 2 * out.count()
    # Date became a partition column -> partition-pruned read works
    pruned = spark.read.parquet(path).where(F.col("Date") == F.lit(AS_OF.date()))
    assert pruned.count() == 2 * out.count()


def test_overwrite_run_is_idempotent(spark, tmp_path):
    out = run(synthetic_tickers(spark, AS_OF.date()), None, HOURLY, AS_OF)
    path = str(tmp_path / "chain")
    overwrite_run(out, path, run_id="2025-10-27T12")
    n1 = spark.read.parquet(path).count()
    overwrite_run(out, path, run_id="2025-10-27T12")  # re-run same id
    assert spark.read.parquet(path).count() == n1     # no double-append
    overwrite_run(out, path, run_id="2025-10-27T13")  # next run adds
    assert spark.read.parquet(path).count() == 2 * n1


def test_format_for_export_strings(spark):
    out = run(synthetic_tickers(spark, AS_OF.date()), None, HOURLY, AS_OF)
    exported = format_for_export(out)
    row = exported.first()
    assert row["Date"] == "2025-10-27"
    assert row["Time"] == "12:30:00"
    assert len(row["Expiry_Date"]) == 10  # yyyy-MM-dd


def test_q29_fold_reinvocation_is_idempotent(spark, sf_small):
    """r14 fold: q29's composition writes slice A overwrite then
    APPENDS slice B to the same partitioned table. A re-invocation in
    the same session (bench reps, sweeps) must produce identical rows
    — the overwrite resets the table, so the append can never
    accumulate across calls."""
    from eth_options_data_pipeline_spark.queries import REGISTRY

    fn = REGISTRY["q29_sink_roundtrip"].fn
    first = sorted(map(tuple, fn(spark, sf_small).collect()))
    second = sorted(map(tuple, fn(spark, sf_small).collect()))
    assert first == second
