"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``eth_options_data_pipeline_spark``; this file
only adapts the registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from eth_options_data_pipeline_spark import queries as corpus


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference pipeline end-to-end (parse → guard → band → ladder
    semi-join → dedup), run relationally — see
    queries/corpus.py::q21_options_pipeline.
    """
    return corpus.REGISTRY["q21_options_pipeline"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return corpus.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query. As of round 4 every
    registered query has one (probabilistic ops are expressed via
    guarantee-bound booleans or deterministic md5 seeding)."""
    return corpus.oracle_sql()
