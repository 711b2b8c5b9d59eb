"""Rolling z-score detector (operators/anomaly.py): trailing-only
frame, min-periods gate, zero-variance guard, spike detection."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.anomaly import (
    rolling_anomalies, rolling_zscore,
)


def _events(spark, values, user=1):
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(minutes=i), user, float(v))
            for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")


def test_spike_is_flagged_and_baseline_is_not(spark):
    # 12 flat-ish values then a huge spike
    ev = _events(spark, [10.0, 10.1, 9.9, 10.0, 10.2, 9.8, 10.0, 10.1,
                         9.9, 10.0, 10.1, 9.9, 50.0])
    out = rolling_anomalies(ev, threshold=2.5, min_periods=10).collect()
    assert [r.event_id for r in out] == [12]


def test_min_periods_gate(spark):
    # spike at index 5: only 5 trailing points < min_periods=10 -> no z
    ev = _events(spark, [10.0, 10.1, 9.9, 10.0, 10.2, 50.0])
    scored = rolling_zscore(ev, min_periods=10).collect()
    assert all(r.z is None for r in scored)


def test_zero_variance_window_gives_null_z(spark):
    # constant history: variance 0 -> z undefined, never a div-by-zero inf
    ev = _events(spark, [5.0] * 12 + [9.0])
    scored = {r.event_id: r.z for r in rolling_zscore(ev).collect()}
    assert scored[12] is None
    ann = rolling_anomalies(ev).collect()
    assert ann == []


def test_trailing_frame_excludes_current_row(spark):
    # the spike itself must not inflate its own baseline: z computed
    # against the 20 PRECEDING rows only, so a lone spike scores high
    vals = [10.0 + 0.1 * (i % 3) for i in range(20)] + [20.0]
    ev = _events(spark, vals)
    out = rolling_anomalies(ev, threshold=2.5).collect()
    assert [r.event_id for r in out] == [20]


def test_keys_are_independent(spark):
    a = _events(spark, [10.0] * 11 + [10.0], user=1)
    b = _events(spark, [0.0, 100.0] * 6, user=2)
    ev = a.unionByName(b.withColumn("event_id", F.col("event_id") + 100))
    # user 1 constant -> no anomalies; user 2 alternation is its own
    # normal (z magnitude ~1) -> below threshold
    out = rolling_anomalies(ev, threshold=2.5).collect()
    assert out == []
