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
# names queries() yields (_WINDOW_PRIORITY), so every row OUTSIDE that
# window is checked here at driver scale BY DEFAULT — the dx36 lesson
# (sketch guarantees that hold at sf0.001 but not above) only surfaces
# at sf0.01. RUN_SF001_SWEEP=1 widens the sweep to all rows, including
# the 50 the driver itself checks (tools/verify_driver.py does the same
# plus the fetchall/fetchdf double fetch).
def _driver_scale_names():
    from eth_options_data_pipeline_spark import queries as qmod
    window = set(qmod._WINDOW_PRIORITY)
    if os.environ.get("RUN_SF001_SWEEP"):
        return ORACLE_QUERIES
    return [n for n in ORACLE_QUERIES if n not in window]


@pytest.mark.parametrize("name", _driver_scale_names())
def test_oracle_parity_driver_scale(spark, sf_medium, name):
    con = duckdb_connection(sf_medium)
    try:
        spec = REGISTRY[name]
        result = compare(spec.fn(spark, sf_medium), con, spec.sql)
        assert result["ok"], f"{name}: {result}"
    finally:
        con.close()
