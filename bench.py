#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query is executed to completion with a noop sink (full compute,
no driver-side result transfer) — the same work profile a cluster job
would have.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eth_options_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from eth_options_data_pipeline_spark.session import get_spark  # noqa: E402


# Faces whose DataFrame CONSTRUCTION performs bounded eager side work
# (scratch sink writes, micro-batch stream replays, per-batch state
# checkpoints) before the timed noop write even starts. Their bench
# numbers measure that I/O churn plus the query — fine at face scale
# (3 bounded batches each), but round-over-round deltas on them are
# sink/scheduler noise, not plan regressions, so they carry an explicit
# tag in BENCH_DETAIL.json for anyone diffing rounds.
CONSTRUCTION_HEAVY = {
    "q29_sink_roundtrip",      # overwrite + APPEND scratch writes +
                               # read-back (r14: q17's legs folded in)
    "qx46_merge_upsert",       # copy-on-write MERGE into scratch table
    "qx47_compact_roundtrip",  # compaction rewrite + roundtrip read
    "qx51_textfmt_roundtrip",  # JSONL + CSV scratch writes + read-back
    "sx05_topk_stream",        # 3 micro-batch replays + candidates ckpt
    "sx06_stream_dedup",       # 3 micro-batch replays into scratch
    "sx07_agg_maintain_stream",  # availableNow stream + state landings
    "sx08_cdc_apply_stream",   # availableNow stream + per-batch MERGE
}


# Nominal quiet-box timings for the calibration probes (measured r11).
# The probes are constant work, so their drift IS host drift: any bench
# whose probe readings sit well above these carries host inflation in
# every per-face number, and cross-round adjudications should cite the
# probe ratio instead of prose (VERDICT r10 item 2).
_CAL_SPIN_NOMINAL_S = 0.80   # 20M-iteration single-core python loop
_CAL_SPARK_NOMINAL_S = 0.20  # sum over spark.range(200M) on local[32]
                             # (re-pinned r12 after the probe gained a
                             # full-size warmup: quiet-box readings
                             # span 0.10-0.21s, so the nominal sits at
                             # the band's top — a 1.4x trip now means
                             # >= 0.28s, genuinely slowed, while quiet
                             # jitter stays ~<=1.05x. The old 0.25 was
                             # measured with JVM spin-up folded in.
                             # The python spin stays the sensitive
                             # instrument for r10/r11-style slowdowns.
_CAL_SHUFFLE_NOMINAL_S = 1.47  # full round-robin shuffle of 32M longs
                             # (64-way exchange) + sum, min of 3, on
                             # local[32]. Added late r12 after a
                             # regeneration where BOTH compute probes
                             # read <= 1.0x while 124 untouched faces
                             # drifted +8.5% median (+12% total): host
                             # drift on the shuffle/memory-bandwidth
                             # path is invisible to compute-only
                             # probes, and most faces are
                             # exchange-bound. PROVENANCE (re-pinned
                             # r13 from MEASUREMENT — VERDICT r12 item
                             # 2 / ADVICE r12): 18 probe repeats
                             # across three sessions in windows whose
                             # compute probes read quiet (py spin
                             # 0.63-0.70, range <= 1.09x) floor at
                             # 1.464-1.475 s with ~1% jitter on the
                             # min-of-3 — the old 1.35 was a linear
                             # back-extrapolation from two degraded
                             # box states and sat ~9% under the real
                             # quiet capacity. Against the measured
                             # nominal, the r12 driver readings
                             # (1.632/1.667 s -> 1.11/1.13x) line up
                             # ~1:1 with the +12.4% median face drift
                             # observed that round, so the trip sits
                             # at 1.10x: above quiet jitter, below
                             # any double-digit corpus inflation.
                             # vs_nominal remains ADVISORY for
                             # cross-box comparisons — two runs
                             # compare best by their own recorded raw
                             # probe readings (probe-to-probe), which
                             # need no nominal at all.
_CAL_SHUFFLE_TRIP = 1.10


def calibration_probe(spark) -> dict:
    """Constant-work host-speed sample: single-core python spin +
    a fixed all-core Spark range aggregation. Run at bench start AND
    end; the pair turns 'the box was slow' into a number."""
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    py_spin = time.perf_counter() - t0
    # warm the probe at FULL size untimed: a 1M-row warmup compiles
    # the expression but the first 200M all-core job of a fresh
    # session still pays thread-pool/JIT spin-up, which read as a
    # phantom 1.4-1.7x "host inflation" at bench START on boxes whose
    # end probe and python spin were both nominal (observed r12). The
    # probe's job is host speed, not JVM warmup.
    spark.range(200_000_000).selectExpr("sum(id * 2 + 1)").collect()
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * 2 + 1)").collect()
    spark_range = time.perf_counter() - t0
    # shuffle-path probe: a fixed full exchange (round-robin
    # repartition of 8M longs, 64-way) + sum. The compute probes above
    # miss host drift on the shuffle/memory-bandwidth path — observed
    # r12: both read <= 1.0x nominal while every exchange-bound face
    # drifted ~+10%. Warm once untimed (same rationale as the range
    # probe); a single shuffle timing is noisy (~±25% run-to-run even
    # on one box state), so time 3 and take the MIN — the capacity
    # statistic, stable where a mean would smear scheduler jitter.
    # 32M rows (not smaller): an 8M shuffle's run-to-run spread was
    # ~60% on one box state, 32M's ~18% — the bigger fixed job
    # amortizes scheduler quantization.
    spark.range(32_000_000).repartition(64).selectExpr("sum(id)").collect()
    shuffle_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(32_000_000).repartition(64).selectExpr(
            "sum(id)").collect()
        shuffle_runs.append(time.perf_counter() - t0)
    spark_shuffle = min(shuffle_runs)
    return {"py_spin_s": round(py_spin, 3),
            "spark_range_s": round(spark_range, 3),
            "spark_shuffle_s": round(spark_shuffle, 3),
            "py_spin_vs_nominal": round(py_spin / _CAL_SPIN_NOMINAL_S, 2),
            "spark_vs_nominal": round(spark_range / _CAL_SPARK_NOMINAL_S, 2),
            "shuffle_vs_nominal": round(
                spark_shuffle / _CAL_SHUFFLE_NOMINAL_S, 2)}


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="engine-bench")

    # Warm the JVM/codegen/parquet/Arrow paths outside the timed region
    # (sf0.001 reads are ~1k rows; they initialize the readers without
    # meaningfully pre-caching sf0.1 data).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from eth_options_data_pipeline_spark.sources import load_tables
    for df in load_tables(spark, "/root/testdata/sf0.001").values():
        df.limit(10).collect()

    cal_start = calibration_probe(spark)

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    runs: dict[str, list[float]] = {name: [] for name in REGISTRY}
    # run-major order (full corpus n_runs times, not each query n_runs
    # times back-to-back) so per-query repeats don't ride each other's
    # freshly-warmed caches
    for _ in range(n_runs):
        for name in sorted(REGISTRY):
            fn = REGISTRY[name].fn
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            runs[name].append(time.perf_counter() - t0)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    # headline per-query number = median (robust to one-off GC/JIT
    # stalls); min and run config go to the sidecar file so the stdout
    # line stays well under the harness's 2000-char stdout-tail capture
    # (a longer line gets truncated mid-JSON and recorded unparsed)
    timings = {name: round(median(ts), 3) for name, ts in runs.items()}
    total = round(sum(timings.values()), 3)
    cal_end = calibration_probe(spark)
    # drift rule (replaces the r10 prose adjudication): a bench run is
    # HOST-INFLATED if either probe reads >= 1.4x nominal at start or
    # end; cross-round per-face comparisons against an inflated run
    # must normalize by the probe ratio or be discarded.
    # the shuffle probe trips at a tight 1.10x against the MEASURED
    # quiet nominal (see _CAL_SHUFFLE_NOMINAL_S provenance): quiet
    # min-of-3 jitter is ~1%, and against the measured 1.47 s the
    # probe excursion tracks exchange-bound face drift ~1:1 (r12
    # driver: probe 1.11-1.13x <-> +12.4% median face drift), so a
    # modest probe excursion already means double-digit corpus
    # inflation.
    inflated = max(cal_start["py_spin_vs_nominal"],
                   cal_end["py_spin_vs_nominal"],
                   cal_start["spark_vs_nominal"],
                   cal_end["spark_vs_nominal"]) >= 1.4 or max(
                   cal_start["shuffle_vs_nominal"],
                   cal_end["shuffle_vs_nominal"]) >= _CAL_SHUFFLE_TRIP
    detail = {
        "metric": "corpus_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_min": {name: round(min(ts), 4) for name, ts in runs.items()},
        "construction_heavy": sorted(CONSTRUCTION_HEAVY & set(timings)),
        "calibration": {
            "start": cal_start,
            "end": cal_end,
            "nominal": {"py_spin_s": _CAL_SPIN_NOMINAL_S,
                        "spark_range_s": _CAL_SPARK_NOMINAL_S,
                        "spark_shuffle_s": _CAL_SHUFFLE_NOMINAL_S},
            "host_inflated": inflated,
            "rule": ("compute probe >= 1.4x nominal OR shuffle probe "
                     f">= {_CAL_SHUFFLE_TRIP}x nominal at start or "
                     "end => per-face numbers carry host inflation; "
                     "normalize by the probe ratio before cross-round "
                     "comparison. The shuffle nominal is MEASURED "
                     "(r13, 18 quiet-window repeats floor at "
                     "1.464-1.475 s), no longer the r12 "
                     "extrapolation. For exchange-bound faces the "
                     "shuffle probe is the relevant normalizer (r12: "
                     "compute probes <= 1.0x while every "
                     "exchange-bound face drifted ~+10%); across "
                     "boxes prefer probe-to-probe raw readings over "
                     "vs_nominal"),
        },
        "notes": {
            "_scale_ramp": (
                "r15 (VERDICT r14 items 2-3): the 11 heaviest faces "
                "RUN at sf0.5/sf1.0 and the three steepest kernels "
                "at sf5/sf10 (100x the bench scale), ALL at the "
                "bench's own default 8g — the r14 24g lever is gone "
                "(dx10's verify join now scales partitions with "
                "source bytes via sources.partitions_for_bytes / "
                "tx.verify_join, shared by dx13/dx40). Log-log "
                "exponents (RAMP_r15.json): dx10 0.705 (sf10 95.8s "
                "at 8g — r14 OOMed at 8g, needed 24g for 76.5s), "
                "dx65 0.625, bloom16 0.427, dx42 0.256 at PAPER-RULE "
                "k uncapped (IVF-assisted numpy assignment, sf10 "
                "8.8s vs the r14 max_k-capped 32.8s/0.532), dx40 "
                "0.26, cx05 0.26, dx13 0.21, qx48 0.20, cx03 0.19, "
                "qx28 0.14, sx05 0.13, dx28 0.01. No super-linear "
                "kernel, no memory wall; start probe busy (2.62x "
                "shuffle), end quiet (0.97x) — within-run ratios."
            ),
            "_environment": (
                "r10: the same box measured the identical 119-face code "
                "at 121.97 s (morning), 141.4 s and 162.2 s (afternoon) "
                "with zero code change on the shared faces; isolated "
                "re-timings of untouched faces (dx42 3.8 s vs 2.17, "
                "dx10 4.0 vs 3.18, q14 2.06 vs 1.91) confirm a "
                "host-level slowdown invisible to guest /proc/stat "
                "(no steal, 99.9% idle). Cross-round per-face deltas "
                "are only meaningful against same-session siblings."
            ),
            "dx10_neardup_pairs": (
                "r06-r09 local-median history 3.29/3.74/3.59/3.35 s "
                "with no code change — tracked shared-host load, not "
                "plan regressions; the drift watch CLOSED in r09 "
                "(VERDICT r09). Reopen only if a quiet-box median "
                "exceeds 4.0 s AND same-session siblings hold their "
                "r09 levels (see _environment)."
            ),
            "_r12_adjudication": (
                "VERDICT r11 item 1 CLOSED with a quiet-box run: this "
                "regeneration reads host_inflated FALSE (py probes "
                "1.14/1.00x, spark 1.39/1.12x). The three r11 ~1.5x "
                "movers adjudicate as box-baseline artifacts, not "
                "regressions: against the r10 SAME-BOX quiet detail "
                "(7cd0520) dx27_url_dedup is 0.93x and "
                "dx21_contamination 0.90x — both FASTER than their "
                "r10 quiet medians; the 1.015/1.208 figures the r11 "
                "VERDICT cited came from the r10 driver box, where "
                "those two faces read unusually low relative to the "
                "117-face corpus median (1.05 now vs that run). dx62 "
                "retired to operator level. dx65's remaining median "
                "is crowded-session pressure: its serving path "
                "isolates at ~1.4 s post-freeze (the build run is "
                "discarded by the median)."
            ),
            "_r12_late_drift_and_shuffle_probe": (
                "A same-round regeneration (after the qx48 selection "
                "rework and the qx53 face landed) read 157.7 s / 126 "
                "faces while BOTH compute probes sat <= 1.0x nominal: "
                "the 124 untouched faces moved +8.5% median (+12% "
                "total, p10 0.94 / p90 1.33) — uniform, "
                "code-independent, concentrated in exchange-bound "
                "faces (dx10 3.46 -> 5.06 on zero code change). "
                "Adjudication: host drift on the shuffle/memory-"
                "bandwidth path, a blind spot of the compute-only "
                "probe pair — which prompted the third calibration "
                "probe (spark_shuffle_s: fixed 32M-row 64-way "
                "exchange, min of 3). A SECOND regeneration hours "
                "later read +20.6% median on untouched faces with "
                "the probe at 1.59 s; the initially extrapolated "
                "quiet nominal (~1.35 s) was re-pinned r13 from "
                "direct measurement to 1.47 s (quiet-window floor "
                "1.464-1.475 s over 18 repeats), with the trip at "
                "1.10x; prefer probe-to-probe ratios across "
                "BENCH_DETAIL generations. Both degraded records "
                "were discarded; the committed record (139.63 s/125, "
                "host quiet by every instrument) remains "
                "authoritative, plus isolated quiet-box timings for "
                "what changed since: qx48 2.97 -> 2.15 s (selection "
                "rework), qx53 1.8 s, qx54 0.8 s, vx04 2.10 -> 0.62, "
                "vx06 2.09 -> 0.87 (index freezes), dx13 3.7 -> 2.7, "
                "dx40 3.0 -> 2.4 (one-action component rounds), and "
                "0.1-0.2 s off each dim-loading face (tiny-dim "
                "spread floor)."
            ),
        },
        "sf": sf_from_dir(sf_dir),
        "config": {
            "master": spark.sparkContext.master,
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
            "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
            "n_queries": len(timings),
            "n_runs": n_runs,
            "aggregation": "median_per_query",
            "plan_notes": "PLANS.md (plan-shape assertions: tests/test_plans.py)",
        },
    }
    # a regeneration must not clobber curated notes (VERDICT r15 item
    # 3: a driver-time run erased the committed `_r15_registry_delta`
    # annotation): carry over any notes key the new run does not
    # itself write
    here = os.path.dirname(os.path.abspath(__file__))
    out_path = os.path.join(here, "BENCH_DETAIL.json")
    try:
        with open(out_path) as f:
            prev_notes = json.load(f).get("notes", {})
        for key, val in prev_notes.items():
            detail["notes"].setdefault(key, val)
    except Exception:
        pass  # no previous record (or unreadable): nothing to carry
    # advisory probe-normalized total: the raw total divided by the
    # mean start/end shuffle-probe ratio (clamped at 1.0 — a faster-
    # than-nominal box is not "deflated"). ADVISORY ONLY: for
    # cross-round comparisons prefer probe-to-probe raw readings; this
    # exists so an inflated run self-adjudicates inside its own file.
    shuffle_ratio = max(
        1.0, (cal_start["shuffle_vs_nominal"]
              + cal_end["shuffle_vs_nominal"]) / 2)
    detail["advisory_normalized_total"] = round(total / shuffle_ratio, 3)
    detail["advisory_normalized_rule"] = (
        "raw total / mean(start,end shuffle_vs_nominal), clamped >= 1; "
        "advisory only — exchange-bound faces track the shuffle probe "
        "~1:1 (r12 evidence), compute-bound faces less, so this "
        "UNDER-corrects mixed workloads on a shuffle-slow host")
    with open(out_path, "w") as f:
        json.dump(detail, f, indent=1)

    # headline fields (value/total/n_queries/sf) FIRST so a truncated
    # tail still yields them even if the queries dict is cut mid-way
    line = json.dumps({
        "metric": "corpus_total_runtime",
        "value": total,
        "unit": "sec",
        "total": total,
        "n_queries": len(timings),
        "sf": sf_from_dir(sf_dir),
        "queries": timings,
    }, separators=(",", ":"))
    if len(line) > 1900:  # belt-and-braces: never exceed the capture
        line = json.dumps({
            "metric": "corpus_total_runtime",
            "value": total,
            "unit": "sec",
            "total": total,
            "n_queries": len(timings),
            "sf": sf_from_dir(sf_dir),
            "queries": {"detail": "BENCH_DETAIL.json"},
        }, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
