"""Round-16 optimization profiler: per-face construction vs execution
split, job counts, and plan-node census.

For every face (or a named subset):
  * t_construct  — wall time of ``fn(spark, sf_dir)`` (driver-side
    planning plus any eager side work: artifact freezes, counts,
    stream replays);
  * t_exec       — wall time of the noop-sink write (min over reps);
  * jobs_construct / jobs_exec — Spark jobs submitted in each phase
    (high exec job counts at constant data = repeated actions);
  * plan          — counts of Exchange / BroadcastExchange / Sort /
    SortMergeJoin / ShuffledHashJoin / BroadcastHashJoin / window-
    single-partition / Python-eval nodes in the final formatted plan.

Usage: python tools/profile_r16.py [--sf DIR] [--reps N] [--out FILE]
       [face ...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


PLAN_TOKENS = {
    "exchange_hash": r"Exchange hashpartitioning",
    "exchange_rr": r"Exchange RoundRobinPartitioning",
    "exchange_single": r"Exchange SinglePartition",
    "exchange_range": r"Exchange rangepartitioning",
    "bcast_exchange": r"BroadcastExchange",
    "smj": r"SortMergeJoin",
    "shj": r"ShuffledHashJoin",
    "bhj": r"BroadcastHashJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "sort": r"\bSort \[",
    "window": r"\bWindow \[",
    "py_eval": r"BatchEvalPython|ArrowEvalPython",
    "py_map": r"MapInPandas|MapInArrow|FlatMapGroupsInPandas",
    "scan_parquet": r"Scan parquet",
}


def plan_census(df) -> dict:
    try:
        txt = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
    except Exception:
        import io
        import contextlib
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
    return {k: len(re.findall(pat, txt)) for k, pat in PLAN_TOKENS.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("faces", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/profile_r16.json")
    args = ap.parse_args()

    from eth_options_data_pipeline_spark.queries import REGISTRY
    from eth_options_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="profile-r16")
    from pyspark.sql import functions as F
    spark.range(200_000_000).select(F.sum("id")).collect()  # warm JIT
    from eth_options_data_pipeline_spark.sources import load_tables
    for df in load_tables(spark, "/root/testdata/sf0.001").values():
        df.limit(10).collect()

    tracker = spark.sparkContext.statusTracker()

    def njobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    faces = args.faces or sorted(REGISTRY)
    out = {}
    for name in faces:
        fn = REGISTRY[name].fn
        rec = {"t_construct": [], "t_exec": [], "jobs_construct": 0,
               "jobs_exec": 0}
        for i in range(args.reps):
            j0 = njobs()
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            rec["t_construct"].append(round(time.perf_counter() - t0, 4))
            j1 = njobs()
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            rec["t_exec"].append(round(time.perf_counter() - t0, 4))
            if i == args.reps - 1:
                rec["jobs_construct"] = j1 - j0
                rec["jobs_exec"] = njobs() - j1
                rec["plan"] = plan_census(df)
        out[name] = rec
        sys.stderr.write(
            f"{name:<28} cons {min(rec['t_construct']):6.2f} "
            f"exec {min(rec['t_exec']):6.2f} "
            f"jobs {rec['jobs_construct']}+{rec['jobs_exec']}\n")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"n": len(out), "out": args.out}))


if __name__ == "__main__":
    main()
