#!/usr/bin/env python
"""Scale-ramp measurement (VERDICT r12 item 3, extended r14 item 2):
run the heaviest faces at sf0.1 / sf0.5 / sf1.0 — and the steepest
kernels (dx10 LSH candidate pairs, dx42 semdedup, dx65 sharded
bloom) further at sf5 / sf10 — and record time-vs-sf exponents.

The ramp dirs are synthesized from the driver's sf0.1 by
tools/make_ramp.py (key-remapped, content-perturbed replication —
see its docstring for why the dedup/ANN workload keeps its
statistical shape; sf5/sf10 need `python tools/make_ramp.py sf5
sf10` first). Each face runs to a noop sink, min of 2 after an
untimed warm; the exponent is the least-squares slope of log(time)
vs log(sf). An exponent ~<= 1.1 means the face scaled ~linearly over
the measured range; >~1.3 flags a super-linear kernel or a constant
that started to bite. Big-sf faces also record `exponent_to_sf1`
(slope over the first three points) so r14 can check the tail
didn't steepen past the r13-published value.

dx65's registered face pins a FIXED 1.1M-member reference set (2
shards — a blocklist doesn't grow with the corpus), so it can never
exercise a wide shard layout; `bloom16_ramp` is a ramp-only variant
of the same kernels (bloom_layout/build/prune + shuffle confirm)
over an 8.8M-member set that lays out as 16 shards x 2^24 bits —
the "in anger" multi-shard evidence without touching the face.

Writes RAMP_r15.json at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from eth_options_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from eth_options_data_pipeline_spark.session import get_spark  # noqa: E402
from eth_options_data_pipeline_spark.sources import load_table  # noqa: E402
from eth_options_data_pipeline_spark.operators.bloom import (  # noqa: E402
    bloom_build, bloom_layout, bloom_prune)

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

# the steepest r13 exponents (0.58 / 0.47 / 0.36): extend the measured
# decade to sf10 = 100x the bench scale
BIG_FACES = {"dx10_neardup_pairs", "dx42_semdedup", "dx65_sharded_bloom"}

SFS = [("/root/testdata/sf0.1", 0.1),
       ("/tmp/sframp/sf0.5", 0.5),
       ("/tmp/sframp/sf1.0", 1.0)]
SFS_BIG = [("/tmp/sframp/sf5", 5.0),
           ("/tmp/sframp/sf10", 10.0)]

_B16_PER_DOC = 17_600  # 500 ref docs x 17600 = 8.8M members -> 16 shards
_B16_PROBE_AMP = 36
_B16_K = 3


def bloom16_ramp(spark, sf_dir: str):
    """dx65's build/prune/confirm kernels over an 8.8M-member set:
    bloom_layout yields 16 shards x 2^24 bits (asserted), the probe
    side scales with the corpus, and the confirm join is the same
    shuffle-of-survivors plan. Built fresh per call — unlike the
    face, the ramp wants the BUILD inside the warm run too."""
    base = (load_table(spark, sf_dir, "documents")
            .where(F.col("doc_id") < 500).select("doc_id"))
    amp = F.explode(F.sequence(F.lit(0), F.lit(_B16_PER_DOC - 1))).alias("s")
    members = (base.select("doc_id", amp)
               .select(F.concat_ws("-", "doc_id", "s").alias("member")))
    n = 500 * _B16_PER_DOC
    n_shards, m_bits = bloom_layout(n)
    assert n_shards >= 16, (n_shards, m_bits)
    bloom = bloom_build(members, "member", m_bits,
                        k=_B16_K, n_shards=n_shards)
    probe = (load_table(spark, sf_dir, "orders")
             .select("o_orderpriority", "o_orderkey",
                     F.explode(F.sequence(
                         F.lit(0), F.lit(_B16_PROBE_AMP - 1))).alias("s"))
             .select("o_orderpriority",
                     F.concat_ws("-", F.col("o_orderkey") % 1000, "s")
                     .alias("member")))
    survivors = bloom_prune(probe, "member", bloom, m_bits,
                            k=_B16_K, n_shards=n_shards)
    # hint = build side: the FIXED member set, never the corpus-scaled
    # survivors (the dx65 build-side audit, r14)
    hits = survivors.join(members.hint("shuffle_hash"), "member")
    return hits.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_hits"))


def time_run(spark, fn, sf_dir: str, runs: int = 3) -> float:
    # untimed warm (session artifacts/caches built here, as in bench)
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    best = math.inf
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def _slope(sfs, times) -> float:
    xs = [math.log(s) for s in sfs]
    ys = [math.log(t) for t in times]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    return (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
            / sum((x - mx) ** 2 for x in xs))


def measure(spark, name: str, fn, sfs_dirs) -> dict:
    times, sfs = [], []
    for sf_dir, sf in sfs_dirs:
        t = time_run(spark, fn, sf_dir)
        times.append(round(t, 3))
        sfs.append(sf)
        print(f"{name} sf{sf}: {t:.2f}s", flush=True)
    row = {"sfs": sfs, "times_s": times,
           "exponent": round(_slope(sfs, times), 3)}
    if len(sfs) > 3:
        row["exponent_to_sf1"] = round(_slope(sfs[:3], times[:3]), 3)
    print(f"{name} exponent: {row['exponent']:.3f}", flush=True)
    return row


def main() -> None:
    # r15: the ramp runs at the bench's own default memory (8g). The
    # r14 ramp needed 24g because dx10's verify join built its hash
    # relations over a FIXED 32 partitions, so per-task build memory
    # grew with the corpus ('Can't acquire 67108864 bytes to build
    # hash relation' at sf10). That lever is now a RULE in the
    # operator (sources.partitions_for_bytes — both verify-join inputs
    # repartition to a byte-scaled count, VERDICT r14 item 3), so the
    # sf10 leg must clear WITHOUT scaling driver memory — running at
    # the default is itself the regression check.
    spark = get_spark(app_name="scale-ramp")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # host-state honesty (the bench.py convention): the ramp's
    # exponents are within-run ratios, so STEADY contention mostly
    # cancels, but bursts skew individual points — record the probes
    # at both ends so a reader can judge the run like a bench record.
    from bench import calibration_probe
    cal_start = calibration_probe(spark)
    out: dict = {"faces": {}, "config": {
        "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "runs_per_sf": 3,
        "note": "r15: default (bench) memory throughout — the dx10 "
                "partitions_for_bytes rule replaced the r14 24g lever",
    }}
    for name in FACES:
        sfs_dirs = SFS + (SFS_BIG if name in BIG_FACES else [])
        out["faces"][name] = measure(
            spark, name, REGISTRY[name].fn, sfs_dirs)
    out["faces"]["bloom16_ramp"] = measure(
        spark, "bloom16_ramp", bloom16_ramp, SFS + SFS_BIG)
    out["calibration"] = {"start": cal_start,
                          "end": calibration_probe(spark)}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "RAMP_r15.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
