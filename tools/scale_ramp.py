#!/usr/bin/env python
"""Scale-ramp measurement (VERDICT r12 item 3): run the heaviest
faces at sf0.1 / sf0.5 / sf1.0 and record time-vs-sf exponents.

The sf0.5/sf1.0 dirs are synthesized from the driver's sf0.1 by
tools/make_ramp.py (key-remapped, content-perturbed replication —
see its docstring for why the dedup/ANN workload keeps its
statistical shape). Each face runs to a noop sink, min of 2 after an
untimed warm; the exponent is the least-squares slope of
log(time) vs log(sf). An exponent ~<= 1.1 means the face scaled
~linearly over the measured decade; >~1.3 flags a super-linear
kernel or a constant that started to bite.

Writes RAMP_r13.json at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eth_options_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from eth_options_data_pipeline_spark.session import get_spark  # noqa: E402

FACES = [
    "dx10_neardup_pairs",
    "dx28_pagerank",
    "dx13_dup_clusters",
    "dx65_sharded_bloom",
    "dx42_semdedup",
    "dx40_leakage_safe_split",
    "cx03_quality_ensemble",
    "qx48_approx_quantiles",
    "sx05_topk_stream",
    "qx28_approx_sketches",
    "cx05_corpus_composition",
]

SFS = [("/root/testdata/sf0.1", 0.1),
       ("/tmp/sframp/sf0.5", 0.5),
       ("/tmp/sframp/sf1.0", 1.0)]


def time_face(spark, name: str, sf_dir: str, runs: int = 2) -> float:
    fn = REGISTRY[name].fn
    # untimed warm (session artifacts/caches built here, as in bench)
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    best = math.inf
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(app_name="scale-ramp")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict = {"sfs": [s for _, s in SFS], "faces": {}}
    for name in FACES:
        times = []
        for sf_dir, sf in SFS:
            t = time_face(spark, name, sf_dir)
            times.append(round(t, 3))
            print(f"{name} sf{sf}: {t:.2f}s", flush=True)
        # least-squares slope of log(t) vs log(sf)
        xs = [math.log(s) for _, s in SFS]
        ys = [math.log(t) for t in times]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        slope = (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
                 / sum((x - mx) ** 2 for x in xs))
        out["faces"][name] = {"times_s": times,
                              "exponent": round(slope, 3)}
        print(f"{name} exponent: {slope:.3f}", flush=True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "RAMP_r13.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
