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


def test_asof_matches_bruteforce(spark):
    """12 hypothesis examples batched into ONE asof_join: example g's
    keys ride as 'g|K', and as-of semantics are per-key independent,
    so the per-example assertions are identical to running each alone
    at one join cost instead of twelve (suite budget, VERDICT r08
    item 3)."""
    cases = []

    @settings(max_examples=12, deadline=None,
              suppress_health_check=list(HealthCheck),
                        derandomize=True)
    @given(probes=PROBES, builds=BUILDS)
    def collect(probes, builds):
        cases.append((probes, builds))

    collect()
    probe_rows, build_rows, want = [], [], {}
    for g, (probes, builds) in enumerate(cases):
        # dedupe build per (key, ts) with max value — the operator's
        # documented uniqueness precondition
        dedup: dict[tuple, int] = {}
        for k, ts, v in builds:
            dedup[(k, ts)] = max(dedup.get((k, ts), v), v)
        build_rows += [(f"{g}|{k}", BASE + dt.timedelta(seconds=ts), float(v))
                       for (k, ts), v in dedup.items()]
        probe_rows += [(g * 1000 + i, f"{g}|{k}", BASE + dt.timedelta(seconds=ts))
                       for i, (k, ts) in enumerate(probes)]
        for i, (k, ts) in enumerate(probes):
            best = None
            for (bk, bts), v in dedup.items():
                if bk == k and bts <= ts and (best is None or bts > best[0]):
                    best = (bts, v)
            want[g * 1000 + i] = float(best[1]) if best else None

    probe_df = spark.createDataFrame(probe_rows, "id long, k string, ts timestamp")
    build_df = spark.createDataFrame(
        build_rows, "k string, ts timestamp, bv double") if build_rows else \
        spark.createDataFrame([], "k string, ts timestamp, bv double")
    got = {r["id"]: r["bv"]
           for r in asof_join(probe_df, build_df, on="k", ts="ts",
                              payload=["bv"]).collect()}
    assert got == want


INTERVALS = st.lists(
    st.tuples(TS, st.integers(0, 60)), min_size=0, max_size=10)


def test_range_join_matches_bruteforce(spark):
    """12 hypothesis examples batched into ONE range join: example g's
    times shift by g*10000 (ts <= 500, interval length <= 60, so
    shifted examples can never cross-match and the 64-wide buckets
    stay valid), making the per-example assertions identical to
    running each alone at one join cost instead of twelve."""
    cases = []

    @settings(max_examples=12, deadline=None,
              suppress_health_check=list(HealthCheck),
                        derandomize=True)
    @given(points=st.lists(TS, min_size=1, max_size=12), intervals=INTERVALS)
    def collect(points, intervals):
        cases.append((points, intervals))

    collect()
    point_rows, iv_rows, want = [], [], []
    for g, (points, intervals) in enumerate(cases):
        off = g * 10_000
        pr = [(g * 1000 + i, off + ts) for i, ts in enumerate(points)]
        ir = [(g * 1000 + j, off + s, off + s + ln)
              for j, (s, ln) in enumerate(intervals)]
        point_rows += pr
        iv_rows += ir
        want += [(pid, iid) for pid, ts in pr
                 for iid, s, e in ir if s <= ts <= e]

    p = spark.createDataFrame(point_rows, "pid long, pts long")
    iv = spark.createDataFrame(iv_rows, "iid long, s long, e long") \
        if iv_rows else spark.createDataFrame([], "iid long, s long, e long")
    got = sorted((r["pid"], r["iid"]) for r in point_in_interval_join(
        p, iv, "pts", "s", "e", bucket=64).collect())
    assert got == sorted(want)
