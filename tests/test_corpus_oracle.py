"""Every oracle-backed corpus query must match DuckDB exactly at
sf0.001 (the driver runs the same comparison at sf0.01)."""

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
def test_oracle_parity(spark, sf_small, con, name):
    spec = REGISTRY[name]
    result = compare(spec.fn(spark, sf_small), con, spec.sql)
    assert result["ok"], f"{name}: {result}"


def test_all_queries_return_rows_or_valid_empty(spark, sf_small):
    for name, spec in REGISTRY.items():
        df = spec.fn(spark, sf_small)
        assert df.columns, f"{name} returned no columns"
        df.limit(1).collect()  # plan executes


# Driver-scale sweep: same comparison at sf0.01, the scale the driver's
# CORRECTNESS harness actually runs. The driver only checks the first 50
# registered queries, so this is the regression tripwire for the rows
# rotated out of that window. Opt in with RUN_SF001_SWEEP=1 (adds ~7 min)
# or run tools/verify_driver.py, which is the same check plus the
# fetchall/fetchdf double fetch.
@pytest.mark.skipif(not os.environ.get("RUN_SF001_SWEEP"),
                    reason="driver-scale sweep is opt-in (RUN_SF001_SWEEP=1)")
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity_driver_scale(spark, sf_medium, name):
    con = duckdb_connection(sf_medium)
    try:
        spec = REGISTRY[name]
        result = compare(spec.fn(spark, sf_medium), con, spec.sql)
        assert result["ok"], f"{name}: {result}"
    finally:
        con.close()
