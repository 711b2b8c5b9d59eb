"""Deterministic sampling: exact caps, rerun stability, unbiasedness
of the hash order, and cross-engine reproducibility of the selection
(DuckDB computes the identical sample from the same md5 rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.sampling import (
    cap_per_group,
    sample_strata,
)
from eth_options_data_pipeline_spark.sources import load_table
from tests.oracle_harness import duckdb_connection

SF_DIR = "/root/testdata/sf0.001"


def test_cap_per_group_exact_and_stable(spark):
    ev = load_table(spark, SF_DIR, "events")
    capped = cap_per_group(ev, ["event_type"], "event_id", cap=10)
    counts = {r["event_type"]: r["n"] for r in capped.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["event_type"]: r["n"] for r in ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    for k, n in counts.items():
        assert n == min(10, full[k])
    # rerun -> identical ids (deterministic, no rand())
    a = sorted(r["event_id"] for r in capped.select("event_id").collect())
    b = sorted(r["event_id"] for r in cap_per_group(
        ev, ["event_type"], "event_id", cap=10).select("event_id").collect())
    assert a == b
    # different seed -> different sample (it's not just head-of-scan)
    c = sorted(r["event_id"] for r in cap_per_group(
        ev, ["event_type"], "event_id", cap=10, seed="other")
        .select("event_id").collect())
    assert a != c


def test_sample_strata_fractions_and_oracle_parity(spark):
    ev = load_table(spark, SF_DIR, "events")
    fr = {"click": 0.5, "error": 0.0}
    out = sample_strata(ev, "event_type", "event_id", fr, seed="s1")
    got = {r["event_type"]: r["n"] for r in out.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["event_type"]: r["n"] for r in ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "error" not in got                       # fraction 0 drops all
    assert got["view"] == full["view"]              # default 1.0 keeps all
    assert 0.3 * full["click"] < got["click"] < 0.7 * full["click"]

    # the identical selection is computable in DuckDB from the same rule
    con = duckdb_connection(SF_DIR)
    want = sorted(r[0] for r in con.execute("""
        SELECT event_id FROM events
        WHERE CAST(('0x' || substr(md5('s1|' || CAST(event_id AS VARCHAR)), 1, 13)) AS BIGINT)
              / 4503599627370496.0
              < CASE event_type WHEN 'click' THEN 0.5 WHEN 'error' THEN 0.0 ELSE 1.0 END
    """).fetchall())
    assert sorted(r["event_id"] for r in out.select("event_id").collect()) == want
