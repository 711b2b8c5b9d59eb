"""Local replica of the driver's DuckDB-oracle comparison.

Runs a corpus query through Spark AND its oracle SQL through DuckDB on
the same parquet tables, then compares row count, column names, and an
order-insensitive multiset of values. Stricter than the driver (exact
value equality, not a hash) so mismatches are debuggable locally.
"""

from __future__ import annotations

import math
import os

import duckdb

from eth_options_data_pipeline_spark.schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bool):
        return bool(v)
    return v


def _key(row):
    return tuple(repr(_norm(v)) for v in row)


def compare(spark_df, con, sql: str) -> dict:
    """Returns {'ok': bool, ...diagnostics}.

    The two engine runs overlap: DuckDB executes on a worker thread
    while Spark collects on this one — both release the GIL for the
    heavy part, and the connection is still used by exactly one
    query at a time, so semantics are unchanged and the wall cost of
    a parity check drops to ~max(engine times) instead of their sum."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(lambda: con.execute(sql).fetchdf())
        sdf = spark_df.toPandas()
        ddf = fut.result()

    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    result = {
        "spark_rows": len(sdf), "oracle_rows": len(ddf),
        "spark_cols": s_cols, "oracle_cols": d_cols,
    }
    if s_cols != d_cols:
        result["ok"] = False
        result["why"] = "column-name mismatch"
        return result

    s_rows = sorted(_key(r) for r in sdf[s_cols].itertuples(index=False, name=None))
    d_rows = sorted(_key(r) for r in ddf[d_cols].itertuples(index=False, name=None))
    if len(s_rows) != len(d_rows):
        result["ok"] = False
        result["why"] = "row-count mismatch"
        result["spark_sample"] = s_rows[:3]
        result["oracle_sample"] = d_rows[:3]
        return result
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    result["ok"] = not mismatches
    if mismatches:
        result["why"] = f"{len(mismatches)} value mismatches"
        result["first_mismatch"] = mismatches[0]
    return result
