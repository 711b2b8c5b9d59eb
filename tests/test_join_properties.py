"""Property-based checks for the custom join operators: the Spark
implementations must agree with brute-force Python reference
implementations on randomized inputs."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.asof import asof_join
from eth_options_data_pipeline_spark.operators.ranges import point_in_interval_join

BASE = dt.datetime(2025, 1, 1)

KEYS = st.sampled_from(["A", "B", "C"])
TS = st.integers(min_value=0, max_value=500)

PROBES = st.lists(st.tuples(KEYS, TS), min_size=1, max_size=12)
BUILDS = st.lists(st.tuples(KEYS, TS, st.integers(-100, 100)),
                  min_size=0, max_size=12)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(probes=PROBES, builds=BUILDS)
def test_asof_matches_bruteforce(spark, probes, builds):
    # dedupe build per (key, ts) with max value — the operator's
    # documented uniqueness precondition
    dedup: dict[tuple, int] = {}
    for k, ts, v in builds:
        dedup[(k, ts)] = max(dedup.get((k, ts), v), v)
    build_rows = [(k, BASE + dt.timedelta(seconds=ts), float(v))
                  for (k, ts), v in dedup.items()]
    probe_rows = [(i, k, BASE + dt.timedelta(seconds=ts))
                  for i, (k, ts) in enumerate(probes)]

    probe_df = spark.createDataFrame(probe_rows, "id long, k string, ts timestamp")
    build_df = spark.createDataFrame(
        build_rows, "k string, ts timestamp, bv double") if build_rows else \
        spark.createDataFrame([], "k string, ts timestamp, bv double")

    got = {r["id"]: r["bv"]
           for r in asof_join(probe_df, build_df, on="k", ts="ts",
                              payload=["bv"]).collect()}

    want = {}
    for i, (k, ts) in enumerate(probes):
        best = None
        for (bk, bts), v in dedup.items():
            if bk == k and bts <= ts and (best is None or bts > best[0]):
                best = (bts, v)
        want[i] = float(best[1]) if best else None
    assert got == want


INTERVALS = st.lists(
    st.tuples(TS, st.integers(0, 60)), min_size=0, max_size=10)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(points=st.lists(TS, min_size=1, max_size=12), intervals=INTERVALS)
def test_range_join_matches_bruteforce(spark, points, intervals):
    point_rows = [(i, ts) for i, ts in enumerate(points)]
    iv_rows = [(j, s, s + ln) for j, (s, ln) in enumerate(intervals)]
    p = spark.createDataFrame(point_rows, "pid long, pts long")
    iv = spark.createDataFrame(iv_rows, "iid long, s long, e long") \
        if iv_rows else spark.createDataFrame([], "iid long, s long, e long")

    got = sorted((r["pid"], r["iid"]) for r in point_in_interval_join(
        p, iv, "pts", "s", "e", bucket=64).collect())
    want = sorted((i, j) for i, ts in point_rows
                  for j, s, e in iv_rows if s <= ts <= e)
    assert got == want
