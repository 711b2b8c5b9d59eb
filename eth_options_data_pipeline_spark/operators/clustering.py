"""Iterative k-means over an embedding column — the full Lloyd loop
that vx04's single refinement step previews (reference has no ANN /
clustering surface; this extends the north-star training-data toolkit:
SemDeDup, IVF index builds, and curriculum bucketing all sit on it).

Scale shape (100 TB): centroids are a k x dim literal broadcast into
every task — the corpus never self-joins and never shuffles for the
ASSIGN step. The UPDATE step is one map-side-combinable groupBy over
k groups (dim avg columns, partial aggregation collapses each
partition to <= k rows before the exchange). Per iteration exactly one
job runs (collect the k new centroids); lineage stays flat because
each round re-plans from the base scan with new literals — no
checkpoint needed, unlike edge-contraction loops (components.py).

Two assignment kernels, tested identical (tests/test_clustering.py):

* ``method="expr"`` — per-centroid squared-L2 folds via zip_with /
  aggregate, argmin via array_min over (dist, idx) structs. Pure JVM
  expressions, deterministic, engine-independent (oracle-checkable).
  Spark HOFs are CodegenFallback (interpreted per element), so this
  pays k * dim interpreted ops per row — fine for moderate k.
* ``method="numpy"`` — Arrow-batched mapInPandas; one BLAS matmul per
  batch against the broadcast centroid matrix. The 100 TB hot path
  for large k * dim.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dlit(v: float) -> str:
    """Exact SQL double literal: repr() is the shortest string that
    round-trips to the same double, and the D suffix keeps the parser
    from reading it as DECIMAL."""
    return repr(float(v)) + "D"


def _sq_l2(vec: Column, cent: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, one fold."""
    c = F.array(*[F.lit(float(v)) for v in cent])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def assign_centroids(df: DataFrame, centroids: list[list[float]],
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     method: str = "expr") -> DataFrame:
    """(id, cluster) — nearest centroid per row, ties to the lowest
    cluster index. No shuffle: centroids ride into the tasks as
    literals (expr) or a closure-captured ndarray (numpy)."""
    if method == "expr":
        # ONE parsed expression instead of k Py4J-built fold subtrees:
        # the k x dim centroid bank is a nested array literal and the
        # squared-L2 fold appears once inside the transform lambda, so
        # driver construction is a single expr() parse (the k-subtree
        # Column composition paid ~2 Py4J round trips per literal —
        # 0.5 s at k*dim = 640 — and made the analyzer walk k copies
        # of the fold on every downstream action). Float-op order is
        # IDENTICAL: per centroid the same zip_with/(x-y)*(x-y) fold
        # accumulated left-to-right from 0.0, argmin via array_min
        # over (d, i) structs with ties to the lowest index.
        bank = ", ".join(
            "array(" + ", ".join(_dlit(v) for v in c) + ")"
            for c in centroids)
        cluster = F.expr(
            f"array_min(transform(array({bank}), (c, i) -> named_struct("
            f"'d', aggregate(zip_with(`{vec_col}`, c, "
            f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x), "
            f"'i', i))).i")
        return df.select(F.col(id_col), cluster.alias("cluster"))
    if method == "numpy":
        import numpy as np
        import pandas as pd

        cent = np.asarray(centroids, dtype=np.float64)
        cent_sq = (cent * cent).sum(axis=1)

        def part(batches: Iterable["pd.DataFrame"]):
            # nested closure: cloudpickled by value, so the driver
            # process needs no importable repo on sys.path
            for pdf in batches:
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; the x^2 term
                # is constant per row and cannot flip the argmin
                d = cent_sq[None, :] - 2.0 * (x @ cent.T)
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    "cluster": d.argmin(axis=1).astype("int32"),
                })
        out_schema = f"{id_col} long, cluster int"
        return df.select(id_col, vec_col).mapInPandas(part, out_schema)
    raise ValueError(f"unknown method {method!r}")


def _seed_centroids(df: DataFrame, k: int, id_col: str,
                    vec_col: str) -> list[list[float]]:
    """Deterministic seeds: the k rows with the smallest md5(id) —
    a seeded uniform draw reproducible in any engine."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k).collect()
    )
    return [[float(v) for v in r[vec_col]] for r in rows]


def _update_centroids(df: DataFrame, assigned: DataFrame, k: int,
                      dim: int, prev: list[list[float]], id_col: str,
                      vec_col: str,
                      round_to: int | None = None) -> list[list[float]]:
    """Element-wise mean per cluster: dim avg columns, map-side
    partial aggregation, <= k rows reach the driver. ``round_to``
    rounds each mean to that many decimals — the only float op in the
    loop whose partial-aggregation accumulation order is engine- and
    partitioning-dependent, so rounding it makes the whole clustering
    bit-reproducible across engines (the vx04 oracle technique)."""
    rows = (
        df.join(assigned, id_col)
        .groupBy("cluster")
        .agg(*[F.avg(F.col(vec_col)[i]).alias(f"m{i}") for i in range(dim)])
        .collect()
    )
    nxt = [list(c) for c in prev]          # empty cluster keeps its seat
    for r in rows:
        nxt[r["cluster"]] = [float(r[f"m{i}"]) for i in range(dim)]
    if round_to is not None:
        nxt = [[round(v, round_to) for v in c] for c in nxt]
    return nxt


def kmeans(df: DataFrame, k: int, id_col: str = "vec_id",
           vec_col: str = "embedding", max_iters: int = 10,
           tol: float = 1e-6, method: str = "expr",
           round_to: int | None = None,
           ) -> tuple[DataFrame, list[list[float]]]:
    """Full Lloyd loop. Returns (assignments (id, cluster), centroids).

    Stops when the max centroid shift (L2) drops below ``tol`` or
    after ``max_iters``. The returned assignment DataFrame is lazy
    and replans from the base scan with the final centroids.
    """
    vecs = df.select(F.col(id_col),
                     F.col(vec_col).cast("array<double>").alias(vec_col))
    # dim comes from the seed rows — no separate first() job
    cents = _seed_centroids(vecs, k, id_col, vec_col)
    if not cents:
        return assign_centroids(vecs, [[0.0]], id_col, vec_col), []
    dim = len(cents[0])
    for _ in range(max_iters):
        assigned = assign_centroids(vecs, cents, id_col, vec_col, method)
        nxt = _update_centroids(vecs, assigned, k, dim, cents,
                                id_col, vec_col, round_to=round_to)
        shift = max(
            math.sqrt(sum((a - b) ** 2 for a, b in zip(ca, cb)))
            for ca, cb in zip(cents, nxt)
        )
        cents = nxt
        if shift < tol:
            break
    return assign_centroids(vecs, cents, id_col, vec_col, method), cents


def seed_fingerprint(cents: list[list[float]]) -> str:
    """Stable digest of a centroid set (logging / regression tests)."""
    payload = ";".join(",".join(f"{v:.9f}" for v in c) for c in cents)
    return hashlib.md5(payload.encode()).hexdigest()
