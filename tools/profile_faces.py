"""Per-face wall-clock + job-count profiler (quiet-box tuning aid).

Times each requested face at a given sf with N reps (min reported,
first rep separately — construction/artifact cost lands there) and
counts the Spark jobs each invocation submits. High job counts at
near-constant data volume usually mean repeated scans/actions — the
qx48 lesson: the testdata's single-row-group files make every extra
scan a serial decode.

Usage: python tools/profile_faces.py [face ...] [--sf DIR] [--reps N]
Defaults: the 12 most expensive faces from BENCH_DETAIL.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("faces", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    from eth_options_data_pipeline_spark.session import get_spark
    import importlib

    entry = importlib.import_module("__spark_entry__")
    qs = entry.queries()
    faces = args.faces
    if not faces:
        detail_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_DETAIL.json")
        with open(detail_path) as f:
            detail = json.load(f)
        faces = [k for k, _ in sorted(detail["queries"].items(),
                                      key=lambda kv: -kv[1])][:args.top]

    spark = get_spark()
    from pyspark.sql import functions as F
    spark.range(200_000_000).select(F.sum("id")).collect()  # warm JIT

    tracker = spark.sparkContext.statusTracker()
    print(f"{'face':<28} {'first':>7} {'min':>7} {'jobs':>5}  runs")
    for name in faces:
        fn = qs[name]
        times, jobs = [], None
        for i in range(args.reps):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.time()
            fn(spark, args.sf).collect()
            times.append(time.time() - t0)
            if i == args.reps - 1:
                j1 = len(tracker.getJobIdsForGroup(None) or [])
                jobs = j1 - j0
        print(f"{name:<28} {times[0]:>7.2f} {min(times[1:] or times):>7.2f}"
              f" {jobs if jobs is not None else '?':>5}  "
              f"{[round(t, 2) for t in times]}")
    spark.stop()


if __name__ == "__main__":
    main()
