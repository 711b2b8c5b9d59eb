"""asof_join semantics: inclusive ties, no-match nulls, per-key
independence, and plan shape (no nested-loop join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    probe = spark.createDataFrame(
        [
            (1, "A", _ts("2025-01-01T10:00:00"), 100.0),
            (2, "A", _ts("2025-01-01T12:00:00"), 200.0),
            (3, "B", _ts("2025-01-01T09:00:00"), 300.0),  # before any build
            (4, "C", _ts("2025-01-01T09:00:00"), 400.0),  # key with no build rows
        ],
        "id long, k string, ts timestamp, v double",
    )
    build = spark.createDataFrame(
        [
            ("A", _ts("2025-01-01T10:00:00"), 1.0),   # tie with probe 1 -> included
            ("A", _ts("2025-01-01T11:30:00"), 2.0),
            ("B", _ts("2025-01-01T09:30:00"), 3.0),   # after probe 3 -> excluded
        ],
        "k string, ts timestamp, bv double",
    )
    return probe, build


def test_asof_join_semantics(spark):
    probe, build = _frames(spark)
    out = asof_join(probe, build, on="k", ts="ts", payload=["bv"])
    got = {r["id"]: r["bv"] for r in out.collect()}
    assert got == {
        1: 1.0,    # build at the SAME ts matches (inclusive <=)
        2: 2.0,    # latest of the two earlier builds
        3: None,   # build exists but only later -> no match
        4: None,   # no build rows for the key at all
    }
    # probe columns and row count are preserved
    assert out.count() == probe.count()
    assert set(probe.columns) <= set(out.columns)


def test_asof_join_plan_has_no_nested_loop(spark):
    probe, build = _frames(spark)
    out = asof_join(probe, build, on="k", ts="ts", payload=["bv"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    assert "Window" in plan


def test_asof_equals_lag_replay_on_snapshot_shape(spark):
    """Cross-check against an independent formulation: when probe and
    build are consecutive snapshots of the same keys, as-of(current,
    previous) must equal the direct per-key join (the reference's
    Open-derivation shape)."""
    prev = spark.createDataFrame(
        [("S1", _ts("2025-01-01T10:00:00"), 5.0),
         ("S2", _ts("2025-01-01T10:00:00"), 7.0)],
        "k string, ts timestamp, close double",
    )
    cur = spark.createDataFrame(
        [("S1", _ts("2025-01-01T11:00:00"), 6.0),
         ("S2", _ts("2025-01-01T11:00:00"), 8.0),
         ("S3", _ts("2025-01-01T11:00:00"), 9.0)],
        "k string, ts timestamp, close double",
    )
    via_asof = asof_join(
        cur, prev.select("k", "ts", F.col("close").alias("prev_close")),
        on="k", ts="ts", payload=["prev_close"])
    via_join = cur.join(
        prev.select("k", F.col("close").alias("prev_close")), "k", "left")
    a = {(r["k"]): r["prev_close"] for r in via_asof.collect()}
    b = {(r["k"]): r["prev_close"] for r in via_join.collect()}
    assert a == b == {"S1": 5.0, "S2": 7.0, "S3": None}
