"""SemDeDup vs an exact replica of the keep-farthest-from-centroid
pairwise rule, on planted semantic duplicates."""

from __future__ import annotations

import random

import numpy as np

from eth_options_data_pipeline_spark.operators.semdedup import semdedup
from tests.test_clustering import ref_kmeans

DIM = 8
K = 3
THRESHOLD = 0.999


def make_docs():
    """3 well-separated direction groups; within each, some docs are
    tiny perturbations of a shared base (semantic duplicates) and some
    point elsewhere in the same neighborhood (non-duplicates)."""
    rng = random.Random(11)
    rows = []
    i = 0
    for g in range(K):
        base = [rng.uniform(-1, 1) * 10 for _ in range(DIM)]
        for dup in range(4):          # near-identical copies of base
            rows.append((i, [b * (1 + rng.uniform(-1e-4, 1e-4)) for b in base]))
            i += 1
        for _ in range(4):            # same region, different direction
            rows.append((i, [b + rng.uniform(-3, 3) for b in base]))
            i += 1
    return rows


def ref_semdedup(rows, k, threshold):
    assign, cents = ref_kmeans(rows, k, max_iters=5)

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    sim = {i: cos(v, cents[assign[i]]) for i, v in rows}
    by_id = dict(rows)
    keep = {}
    for i, _ in rows:
        lost = any(
            assign[j] == assign[i]
            and (sim[j], j) < (sim[i], i)
            and cos(by_id[i], by_id[j]) >= threshold
            for j, _ in rows if j != i)
        keep[i] = not lost
    return keep


def test_semdedup_matches_replica(spark):
    rows = make_docs()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(df, K, threshold=THRESHOLD, max_iters=5)
    got = {r["vec_id"]: r["keep"] for r in out.collect()}
    want = ref_semdedup(rows, K, THRESHOLD)
    assert got == want
    # the planted duplicates actually exercised the prune path
    assert sum(1 for v in got.values() if not v) >= K  # >=1 pruned per group
    assert sum(got.values()) >= K * 4                  # non-dups survive


def test_semdedup_on_real_embeddings(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    out = semdedup(emb, k=4, threshold=0.999, max_iters=2)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert all(r["keep"] is not None for r in rows)
