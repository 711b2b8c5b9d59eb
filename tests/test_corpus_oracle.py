"""Every oracle-backed corpus query must match DuckDB exactly at
sf0.001 (the driver runs the same comparison at sf0.01), plus a
driver-scale sf0.01 sweep over the faces at the freshness-policy
staleness limit and the §2 regression core (see _driver_scale_names —
roughly +2-3 min of wall time over the sf0.001-only suite; set
RUN_SF001_SWEEP=1 for the full registry sf0.01 sweep, ~+5 min)."""

from __future__ import annotations

import os

import pytest

from eth_options_data_pipeline_spark.queries import REGISTRY
from tests.oracle_harness import compare, duckdb_connection

ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.sql is not None)


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb_connection(sf_small)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_small, con, name, all_plans_raw):
    spec = REGISTRY[name]
    # reuse the DataFrame the session-wide compile pass already built
    # (identical object: spec.fn(spark, sf_small)); reconstruct only if
    # that face failed to compile so THIS test shows the real error
    df = all_plans_raw.get(name, (None,))[0]
    if df is None:
        df = spec.fn(spark, sf_small)
    result = compare(df, con, spec.sql)
    assert result["ok"], f"{name}: {result}"


# Only faces WITHOUT oracle SQL need a separate executes-at-all check —
# every oracle-backed face already ran to completion in
# test_oracle_parity above, so re-executing the whole registry doubled the suite's
# face-execution cost for zero extra coverage. Parametrized (not a
# loop) so that the currently-empty set shows up as zero collected
# tests rather than a green test that checked nothing; it self-
# activates the moment a rows-only face is registered.
ROWS_ONLY_QUERIES = sorted(n for n, spec in REGISTRY.items() if spec.sql is None)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_faces_execute(spark, sf_small, name):
    df = REGISTRY[name].fn(spark, sf_small)
    assert df.columns, f"{name} returned no columns"
    df.limit(1).collect()  # plan executes


# Driver-scale sweep: same comparison at sf0.01, the scale the driver's
# CORRECTNESS harness actually runs. The driver only checks the first 50
# names queries() yields (_WINDOW_PRIORITY); between driver rounds the
# faces that most need a driver-scale check are the ones AT the
# freshness-policy limit (post-window staleness >= MAX_STALENESS=2 —
# their last driver row is two rounds back), plus the §2 regression
# core (cheap single-op rows whose reference-parity semantics warrant
# driver-scale coverage every local run, in-window or not). The dx36
# lesson (sketch guarantees that hold at sf0.001 but not above) only
# surfaces at sf0.01. Fresher rotated-out rows (staleness 1) keep
# sf0.001 coverage here plus their recent driver row; RUN_SF001_SWEEP=1
# widens this sweep to ALL rows (tools/verify_driver.py does the same
# plus the fetchall/fetchdf double fetch). Suite-budget rationale:
# VERDICT r06 item 4 (default suite was 17m and growing; this scopes
# the sweep to the stale-or-core ~35 faces instead of all 56
# out-of-window ones).
def _driver_scale_names():
    from eth_options_data_pipeline_spark import queries as qmod
    from eth_options_data_pipeline_spark.queries import window_policy as wp
    if os.environ.get("RUN_SF001_SWEEP"):
        return ORACLE_QUERIES
    # Deliberately the GLOBAL MAX_STALENESS, not the per-class limit:
    # the plain-relational q-faces' demotion to staleness 4 (VERDICT
    # r09 item 3) is justified BY this sweep — once any face is 2+
    # rounds past its driver row it earns the local sf0.01 check,
    # so a q-face waiting out rounds 2..4 stays driver-scale-covered
    # the whole time.
    at_limit = {
        name
        for name, _lr, stale, _inw in wp.age_table(
            list(REGISTRY), qmod._WINDOW_PRIORITY)
        if stale >= wp.MAX_STALENESS
    }
    keep = at_limit | set(qmod.REGRESSION_CORE)
    return [n for n in ORACLE_QUERIES if n in keep]


@pytest.mark.parametrize("name", _driver_scale_names())
def test_oracle_parity_driver_scale(spark, sf_medium, name):
    con = duckdb_connection(sf_medium)
    try:
        spec = REGISTRY[name]
        result = compare(spec.fn(spark, sf_medium), con, spec.sql)
        assert result["ok"], f"{name}: {result}"
    finally:
        con.close()
