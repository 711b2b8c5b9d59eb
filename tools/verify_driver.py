"""Driver-contract verification per .claude/skills/verify/SKILL.md.

Simulates the driver: vanilla SparkSession from a non-repo cwd, entry()
smoke, then all oracle-backed queries() at sf0.01 compared against
DuckDB via BOTH fetchdf() and fetchall().
"""
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as m

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF = "/root/testdata/sf0.01"


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, bytes):
        return v
    return str(v)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(norm(r[i])) for i in order) for r in rows)


def print_age_table():
    """Per-face driver-row age from CORRECTNESS_r*.json, so each
    round's window rotation is computed rather than hand-curated
    (VERDICT r06 item 7).  Run with ``--ages`` to print only this."""
    from eth_options_data_pipeline_spark import queries as q
    from eth_options_data_pipeline_spark.queries import window_policy as wp

    registry = list(q.REGISTRY)
    window = q._WINDOW_PRIORITY
    print(wp.format_age_table(registry, window))
    violations = wp.policy_violations(registry, window)
    if violations:
        print("\nPOLICY VIOLATIONS (staleness > per-class limit):")
        for name, lr, stale in violations:
            print(f" - {name}: last driver row r{lr}, would reach age {stale}")
    else:
        print(
            "policy ok: every face within its class staleness limit "
            f"({wp.MAX_STALENESS}; q-faces {wp.Q_FACE_STALENESS})"
        )
    return violations


def main():
    if "--ages" in sys.argv:
        sys.exit(1 if print_age_table() else 0)
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    rows = m.entry(spark).collect()
    print("entry rows:", len(rows))
    assert len(rows) > 0, "entry() produced 0 rows"

    con = duckdb.connect()
    for tname in TABLES:
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{SF}/{tname}.parquet')")

    queries = m.queries()
    oracles = m.oracle_sql()
    bad = []
    for name, fn in queries.items():
        try:
            df = fn(spark, SF)
            scols = df.columns
            srows = df.collect()
        except Exception as e:
            bad.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            # fetchall path
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows_fa = cur.fetchall()
            # fetchdf path
            pdf = con.execute(oracles[name]).fetchdf()
            orows_df = [tuple(x) for x in pdf.itertuples(index=False)]
        except Exception as e:
            bad.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error {e}")
            continue
        if sorted(scols) != sorted(ocols):
            bad.append((name, f"schema {sorted(scols)} vs {sorted(ocols)}"))
            print(f"FAIL {name}: schema mismatch")
            continue
        sk = rows_key(scols, srows)
        ok_fa = sk == rows_key(ocols, orows_fa)
        ok_df = sk == rows_key(ocols, orows_df)
        if ok_fa and ok_df:
            print(f"ok   {name}: {len(srows)} rows (both fetch paths)")
        else:
            bad.append((name, f"value mismatch fetchall={ok_fa} fetchdf={ok_df} rows={len(srows)}/{len(orows_fa)}"))
            print(f"FAIL {name}: fetchall={ok_fa} fetchdf={ok_df} rows={len(srows)}/{len(orows_fa)}")

    print()
    if bad:
        print(f"VERIFY FAILED: {len(bad)} queries")
        for n, why in bad:
            print(" -", n, why)
        sys.exit(1)
    print(f"VERIFY OK: {len(queries)} queries ({len(oracles)} oracle-backed, both fetch paths)")


if __name__ == "__main__":
    main()
