"""Every oracle-backed corpus query must match DuckDB exactly at
sf0.001 (the driver runs the same comparison at sf0.01), plus a
driver-scale sf0.01 sweep over the SCALE-SENSITIVE faces at the
freshness-policy staleness limit and the §2 regression core (see
_driver_scale_names — roughly +1-2 min of wall time over the
sf0.001-only suite; set RUN_SF001_SWEEP=1 for the full registry
sf0.01 sweep, ~+5 min).

Coverage delta since r11: plain-relational q-faces no longer enter
the sf0.01 sweep at their staleness limit — an exact-relational plan
has no scale-dependent guarantee to break (the dx36 lesson the sweep
exists for), and each q-face keeps its every-run sf0.001 parity row
plus a driver-scale row at most 4 rounds old."""

from __future__ import annotations

import os
import re

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
    # the sketch/stream/vector faces' demotion windows are justified BY
    # this sweep — once such a face is 2+ rounds past its driver row it
    # earns the local sf0.01 check.
    #
    # Coverage delta (r11 suite-budget trim, VERDICT r10 item 1):
    # plain-relational q-faces are EXCLUDED from the driver-scale
    # sweep even at their staleness limit. Rationale: the dx36 lesson
    # this sweep exists for — guarantees that hold at sf0.001 but
    # break above (sketch saturation, sample sizes, df caps, bucket
    # caps) — cannot bite an exact-relational plan: a q-face computes
    # the same exact SQL at every scale, its sf0.001 parity row (every
    # local run) plus its r<=4-stale driver row at sf0.01 already pin
    # both engines at both scales. Scale-sensitive faces (every dx/
    # qx/vx/cx class, which is where all sketches, caps and samples
    # live) keep the sweep; so does the §2 regression core.
    at_limit = {
        name
        for name, _lr, stale, _inw in wp.age_table(
            list(REGISTRY), qmod._WINDOW_PRIORITY)
        if stale >= wp.MAX_STALENESS and not re.match(r"q\d", name)
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
