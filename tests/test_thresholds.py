"""Quantile gate: exact window face vs a Python replica, and the
approx scale path vs the exact face (agreement near the target rate,
no window in the scale plan)."""

from __future__ import annotations

import random

from eth_options_data_pipeline_spark.operators import thresholds

KEEP = 0.3


def make_rows(n_per_group: int = 200, seed: int = 5):
    rng = random.Random(seed)
    rows = []
    i = 0
    for g in ["web", "code", "books"]:
        for _ in range(n_per_group):
            rows.append((i, g, round(rng.uniform(0, 100), 6)))
            i += 1
    return rows


def ref_exact(rows, keep_frac):
    kept = set()
    for g in {r[1] for r in rows}:
        grp = sorted([r for r in rows if r[1] == g], key=lambda r: r[2])
        n = len(grp)
        for rank, r in enumerate(grp):   # percent_rank = rank/(n-1)
            if rank / (n - 1) >= 1.0 - keep_frac:
                kept.add(r[0])
    return kept


def test_exact_face_matches_replica(spark):
    rows = make_rows()
    df = spark.createDataFrame(rows, "doc_id long, domain string, score double")
    got = {r["doc_id"] for r in
           thresholds.quantile_gate_exact(df, "domain", "score", KEEP).collect()}
    assert got == ref_exact(rows, KEEP)


def test_scale_path_agrees_with_exact(spark):
    rows = make_rows()
    df = spark.createDataFrame(rows, "doc_id long, domain string, score double")
    exact = {r["doc_id"] for r in
             thresholds.quantile_gate_exact(df, "domain", "score", KEEP).collect()}
    approx = {r["doc_id"] for r in
              thresholds.quantile_gate(df, "domain", "score", KEEP).collect()}
    # both target the same per-group rate; definitions may differ by a
    # rank or two at the boundary, never more
    assert len(exact.symmetric_difference(approx)) <= 6
    # per-group kept counts hit the target rate within 2 ranks
    for g, n in [("web", 200), ("code", 200), ("books", 200)]:
        kept_g = sum(1 for r in rows if r[0] in approx and r[1] == g)
        assert abs(kept_g - KEEP * n) <= 2


def test_scale_plan_has_no_window(spark):
    df = spark.createDataFrame(make_rows(), "doc_id long, domain string, score double")
    plan = (thresholds.quantile_gate(df, "domain", "score", KEEP)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
