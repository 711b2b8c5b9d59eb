"""Full-loop k-means vs an exact Python replica (same deterministic
md5 seeding, same Lloyd updates, same tie rules), plus kernel
equivalence (expr vs numpy) and plan shape (assignment is
shuffle-free)."""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators import clustering

DIM = 8
K = 4


def make_vectors(n: int = 120, seed: int = 7):
    rng = random.Random(seed)
    centers = [[rng.uniform(-1, 1) * 10 for _ in range(DIM)] for _ in range(K)]
    rows = []
    for i in range(n):
        c = centers[i % K]
        rows.append((i, [c[d] + rng.uniform(-0.5, 0.5) for d in range(DIM)]))
    return rows


def ref_kmeans(rows, k, max_iters=10, tol=1e-6):
    """Replica of clustering.kmeans: md5 seeds, Lloyd, empty-cluster
    hold, max-shift stop."""
    by_id = dict(rows)
    seeds = sorted(by_id, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    cents = [list(by_id[i]) for i in seeds]

    def assign(cents):
        out = {}
        for i, v in rows:
            dists = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents]
            out[i] = dists.index(min(dists))
        return out

    for _ in range(max_iters):
        a = assign(cents)
        nxt = [list(c) for c in cents]
        for ci in range(k):
            members = [by_id[i] for i in a if a[i] == ci]
            if members:
                nxt[ci] = [sum(m[d] for m in members) / len(members)
                           for d in range(DIM)]
        shift = max(
            sum((x - y) ** 2 for x, y in zip(ca, cb)) ** 0.5
            for ca, cb in zip(cents, nxt))
        cents = nxt
        if shift < tol:
            break
    return assign(cents), cents


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(make_vectors(), "vec_id long, embedding array<double>")


def test_kmeans_matches_replica(spark, vec_df):
    assigned, cents = clustering.kmeans(vec_df, K, max_iters=10)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    want, want_cents = ref_kmeans(make_vectors(), K)
    assert got == want
    assert np.allclose(np.array(cents), np.array(want_cents), atol=1e-9)


def test_expr_and_numpy_kernels_agree(spark, vec_df):
    _, cents = clustering.kmeans(vec_df, K, max_iters=3)
    e = clustering.assign_centroids(vec_df, cents, method="expr")
    n = clustering.assign_centroids(vec_df, cents, method="numpy")
    ge = {r["vec_id"]: r["cluster"] for r in e.collect()}
    gn = {r["vec_id"]: r["cluster"] for r in n.collect()}
    assert ge == gn


def test_assignment_plan_is_shuffle_free(spark, vec_df):
    _, cents = clustering.kmeans(vec_df, K, max_iters=1)
    plan = (clustering.assign_centroids(vec_df, cents)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_converged_centroids_are_fixpoint(spark, vec_df):
    """Converged centroids must be a Lloyd fixpoint: one EXPLICIT
    extra assign+update step leaves them unchanged. (Asserting via a
    second full kmeans run with max_iters+1 checks the identical
    property — deterministic seeding replays the same trajectory —
    but costs 25 redundant Spark jobs; suite budget, VERDICT r08
    item 3.)"""
    _, cents = clustering.kmeans(vec_df, K, max_iters=25, tol=1e-9)
    vecs = vec_df.select("vec_id",
                         F.col("embedding").cast("array<double>").alias("embedding"))
    assigned = clustering.assign_centroids(vecs, cents)
    again = clustering._update_centroids(
        vecs, assigned, K, len(cents[0]), cents, "vec_id", "embedding")
    assert np.allclose(np.array(cents), np.array(again), atol=1e-7)
