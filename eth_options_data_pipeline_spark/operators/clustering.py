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
* ``method="numpy"`` — Arrow-batched mapInPandas; squared-L2 matrices
  accumulated DIM BY DIM (``_fold_dists_np``) in the exact operation
  order of the expr kernel's fold, so distances — and therefore every
  assignment, including ties — are BIT-IDENTICAL across the two
  kernels and the DuckDB oracle's relational replay. That exactness
  deliberately trades away the classic ||c||^2 - 2 x.c BLAS matmul
  (whose reassociated sums differ in final ulps and can flip argmin
  ties): the dim loop is still vectorized C over (rows x members)
  panels, ~memory-bandwidth speed, 50-100x the interpreted HOF fold.
  The 100 TB hot path for large k * dim — the SemDeDup paper itself
  assigns with faiss (native SIMD), not a SQL engine.
"""

from __future__ import annotations

import hashlib
import json
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


def ivf_anchor_slots(k: int) -> list[int]:
    """Anchor centroid POSITIONS for two-level (IVF-assisted)
    assignment: every ``step``-th fine centroid, ``step = ceil(k /
    ceil(sqrt(k)))`` — <= ceil(sqrt(k)) anchors, chosen by index so
    any engine can re-derive them from the centroid table alone
    (``WHERE cluster % step = 0``; seed order is already a uniform
    md5 draw, so index-striding is an unbiased sample). Slot i =
    position // step."""
    c = math.ceil(math.sqrt(k))
    step = -(-k // c)
    return list(range(0, k, step))


def ivf_members(centroids: list[list[float]],
                slots: list[int]) -> list[int]:
    """Per fine centroid: its anchor SLOT (nearest anchor by
    (squared-L2, slot), the same left-to-right fold and tie rule the
    row-assignment kernels use). Driver-side — k x sqrt(k) scalar
    folds over lists already collected for the literal bank."""
    out = []
    for cv in centroids:
        best = None
        for s_idx, pos in enumerate(slots):
            a = centroids[pos]
            d = 0.0
            for x, y in zip(cv, a):
                t = x - y
                d += t * t
            if best is None or (d, s_idx) < best:
                best = (d, s_idx)
        out.append(best[1])
    return out


def assign_centroids(df: DataFrame, centroids: list[list[float]],
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     method: str = "expr",
                     coarse_nprobe: int | None = None) -> DataFrame:
    """(id, cluster) — nearest centroid per row, ties to the lowest
    cluster index. No shuffle: centroids ride into the tasks as
    literals (expr) or a closure-captured ndarray (numpy).

    ``coarse_nprobe`` switches both kernels to two-level IVF-assisted
    assignment (the faiss move the SemDeDup paper itself makes instead
    of brute force): rank the <= ceil(sqrt(k)) anchor centroids
    (ivf_anchor_slots), probe the ``nprobe`` nearest anchors, and take
    the argmin over only THEIR member centroids — O(sqrt(k) * nprobe)
    distance folds per row instead of O(k), which is what keeps the
    paper rule k = ceil(n / target) from making assignment quadratic
    in n (r14 ramp finding). The probe is approximate (the true
    nearest centroid can live in an unprobed cell — bounded recall
    trade, the LSH_BUCKET_CAP family) but DETERMINISTIC and
    engine-replayable: anchors are index-strided, members and probes
    rank by (squared-L2, index), so an oracle can replay the exact
    assignment relationally. With nprobe >= the anchor count it
    degenerates to exact brute force."""
    if coarse_nprobe is not None:
        if len(centroids) > BANK_MAX_K:
            # size-decided regime switch (r16, VERDICT r15 item 2):
            # past the measured literal-bank ceiling the member bank
            # becomes a RELATION joined on the probed slot — no
            # k-sized plan literal, no O(k*sqrt(k)) driver loop.
            # Supersedes the kernel choice: the numpy kernel's
            # closure-captured ndarray and member map carry the same
            # ceiling. Bit-identical assignments (tested).
            cent_df = df.sparkSession.createDataFrame(
                [(i, [float(v) for v in c]) for i, c in enumerate(centroids)],
                "cluster int, cvec array<double>")
            return assign_centroids_table(
                df, cent_df, len(centroids), coarse_nprobe,
                id_col=id_col, vec_col=vec_col)
        return _assign_ivf(df, centroids, id_col, vec_col, method,
                           coarse_nprobe)
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
        fold = _fold_dists_np   # closure cell -> pickled by value

        def part(batches: Iterable["pd.DataFrame"]):
            # nested closure: cloudpickled by value, so the driver
            # process needs no importable repo on sys.path
            for pdf in batches:
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                # bit-identical to the expr fold (see _fold_dists_np);
                # argmin's first-occurrence rule = ties to lowest index
                d = fold(np, x, cent)
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    "cluster": d.argmin(axis=1).astype("int32"),
                })
        out_schema = f"{id_col} long, cluster int"
        return df.select(id_col, vec_col).mapInPandas(part, out_schema)
    raise ValueError(f"unknown method {method!r}")


def _fold_dists_factory():
    """Returns the numpy distance-panel kernel as a NESTED function:
    its ``<locals>`` qualname forces cloudpickle to serialize it BY
    VALUE into the mapInPandas closures, so a vanilla driver session
    whose workers cannot import this repo (the driver contract — cwd
    is not the repo, no PYTHONPATH) still runs it. A module-level def
    would pickle by reference and raise ModuleNotFoundError on the
    workers (caught by tools/verify_driver.py, r15)."""
    def _fold_dists_np(np, x, cents):
        """(rows x members) squared-L2 panel accumulated DIM BY DIM —
        ``acc += (x_d - c_d)^2`` for d ascending from acc = 0.0 — the
        exact IEEE-754 operation sequence of the expr kernel's
        ``aggregate(zip_with(...), 0.0, +)`` fold, so every distance
        is bit-identical to the JVM fold and to the oracle's replay
        (a reassociated ||c||^2 - 2 x.c matmul differs in final ulps
        and can flip argmin TIES). Each elementwise op is vectorized
        C over the panel; cost is memory-bandwidth, not interpreter,
        so it keeps the ~100x win over per-element HOF evaluation."""
        acc = np.zeros((x.shape[0], cents.shape[0]))
        for d in range(cents.shape[1]):
            t = x[:, d, None] - cents[None, :, d]
            acc += t * t
        return acc
    return _fold_dists_np


_fold_dists_np = _fold_dists_factory()


def _fold_sq(vec: Column, cent: Column) -> Column:
    """Squared L2 between two array columns as the SAME left-to-right
    fold the parsed expr kernel runs (zip_with diff-square, aggregate
    from 0.0) — Column-API HOFs build identical Catalyst nodes, so the
    float-op order is bit-identical across the kernels."""
    return F.aggregate(
        F.zip_with(vec, cent, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def _assign_ivf(df: DataFrame, centroids: list[list[float]],
                id_col: str, vec_col: str, method: str,
                nprobe: int) -> DataFrame:
    """Two-level assignment (see assign_centroids). Per row: rank the
    anchor bank by (fold-L2, slot), probe the nprobe nearest slots,
    argmin (fold-L2, cluster) over their member centroids only.

    Shuffle-free like the brute kernels: the anchor bank and the
    slot-grouped member banks ride into tasks as DATA, not expression
    trees — ``from_json`` over ONE string literal per bank, which
    ConstantFolding collapses to a single array Literal at optimize
    time (verified: the optimized plan holds no from_json). Measured
    at k=1024 x dim=64: per-element ``F.lit`` composition costs 46 s
    of Py4J round trips and a parsed ``array(array(...))`` expr
    string costs ~5 s of analysis PER ACTION (65k tree nodes); the
    JSON bank constructs in ~0.01 s and folds in well under a second,
    so driver cost stays O(1) expression nodes at the paper-rule k of
    a web-scale corpus. Float fidelity is exact: json emits the
    shortest round-trip repr and Jackson's double parse is correctly
    rounded, so the folded Literal is bit-identical to the Python
    values."""
    k = len(centroids)
    slots = ivf_anchor_slots(k)
    memb = ivf_members(centroids, slots)
    nprobe = min(nprobe, len(slots))
    if method == "numpy":
        import numpy as np
        import pandas as pd

        cent = np.asarray(centroids, dtype=np.float64)
        anchors_np = cent[slots]
        memb_idx = [np.array([j for j in range(k) if memb[j] == s],
                             dtype=np.int64) for s in range(len(slots))]
        n_slots = len(slots)
        np_nprobe = nprobe
        fold = _fold_dists_np   # closure cell -> pickled by value

        def part(batches):
            for pdf in batches:
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                # bit-identical to the expr kernel's anchor folds
                da = fold(np, x, anchors_np)
                # stable argsort: equal distances tie to the lower slot
                probe = np.argsort(da, axis=1, kind="stable")[:, :np_nprobe]
                best_d = np.full(len(x), np.inf)
                best_j = np.full(len(x), k, dtype=np.int64)
                for s in range(n_slots):
                    js = memb_idx[s]
                    mask = (probe == s).any(axis=1)
                    if js.size == 0 or not mask.any():
                        continue
                    xm = x[mask]
                    d = fold(np, xm, cent[js])
                    loc = d.argmin(axis=1)   # js ascending: ties -> low j
                    dmin = d[np.arange(len(xm)), loc]
                    jmin = js[loc]
                    idx = np.where(mask)[0]
                    upd = (dmin < best_d[idx]) | (
                        (dmin == best_d[idx]) & (jmin < best_j[idx]))
                    best_d[idx] = np.where(upd, dmin, best_d[idx])
                    best_j[idx] = np.where(upd, jmin, best_j[idx])
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    "cluster": best_j.astype("int32"),
                })
        out_schema = f"{id_col} long, cluster int"
        return df.select(id_col, vec_col).mapInPandas(part, out_schema)
    if method != "expr":
        raise ValueError(f"unknown method {method!r}")
    def _bank(nested, dtype: str) -> Column:
        # one string literal -> ConstantFolding -> one array Literal
        return F.from_json(F.lit(json.dumps(nested)), dtype)

    abank = _bank([[float(v) for v in centroids[p]] for p in slots],
                  "array<array<double>>")
    # A slot is empty only when its anchor duplicates a lower-indexed
    # anchor (members tie to the lower slot). Pad it with its own
    # anchor: result-neutral — probing the empty slot implies the
    # twin holder slot (same distance, lower index) was probed first,
    # so the padded candidate is already in the set — and it keeps
    # the nested literals uniformly non-empty for type inference.
    memb_lists = [[j for j in range(k) if memb[j] == s] or [slots[s]]
                  for s in range(len(slots))]
    memb_j = _bank(memb_lists, "array<array<int>>")
    memb_c = _bank([[[float(v) for v in centroids[j]] for j in js]
                    for js in memb_lists],
                   "array<array<array<double>>>")
    vec = F.col(vec_col)
    probed = F.slice(
        F.array_sort(F.transform(
            abank,
            lambda a, i: F.struct(_fold_sq(vec, a).alias("d"),
                                  i.alias("i")))),
        1, nprobe)
    # the probed-slot array is the transform INPUT below — evaluated
    # once per row, never per member element
    cand_j = F.flatten(F.transform(
        probed, lambda p: F.element_at(memb_j, p["i"] + F.lit(1))))
    cand_c = F.flatten(F.transform(
        probed, lambda p: F.element_at(memb_c, p["i"] + F.lit(1))))
    cluster = F.array_min(F.zip_with(
        cand_c, cand_j,
        lambda c, j: F.struct(_fold_sq(vec, c).alias("d"),
                              j.alias("j"))))["j"]
    return df.select(F.col(id_col), cluster.cast("int").alias("cluster"))


# Literal-bank k ceiling (measured r16 at dim=64 on the bench box):
#   k=1024  -> bank 0.7 MB,  construct 0.8 s,  ~1.3-2.4 s per action
#   k=4096  -> bank 2.7 MB,  construct 1.6 s,  ~3-12 s per action
#   k=16384 -> bank 10.9 MB, construct 10.1 s, ~12-14 s per action
# Construction is the O(k*sqrt(k)) driver-side ivf_members loop;
# per-action cost is re-analyzing (and constant-folding) the JSON bank
# literal. Past this ceiling assignment switches to the TABLE regime
# below: members as a (slot, cluster, cvec) relation joined on the
# probed slot — the vx07/sx12 cell-keyed-join machinery, whose driver
# cost is O(sqrt(k)) (the anchor bank) regardless of k. The remaining
# giant-k ceiling is the Lloyd loop itself (centroids as a driver
# list); a caller at true web-scale k keeps centroids as a
# parquet-backed table end-to-end and calls assign_centroids_table
# directly (documented in OPTIMIZATION_r16.md).
BANK_MAX_K = 4096


def assign_centroids_table(df: DataFrame, cent_df: DataFrame, k: int,
                           nprobe: int, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Two-level IVF-assisted assignment with the member bank as a
    RELATION instead of a plan literal — the giant-k regime
    (VERDICT r15 item 2). ``cent_df`` is (cluster int, cvec
    array<double>) with cluster ids 0..k-1 (kmeans' output layout, or
    a frozen artifact table at web scale).

    Bit-identical to ``_assign_ivf``: the anchor bank is the same
    index-strided slot set (bounded at ceil(sqrt(k)) rows — the ONLY
    thing collected); member→anchor assignment runs DISTRIBUTED over
    the centroid table with the same (fold-L2, slot) rule the
    driver-side ``ivf_members`` loop uses; rows rank anchors with the
    same fold and probe the same ``nprobe`` slots; the final argmin is
    a min(struct(d, cluster)) grouped by row id — the same (d, j)
    order ``array_min`` applies. Tested equal on duplicate-anchor and
    tie cases (tests/test_clustering.py).

    Plan shape: probed slots explode to ``nprobe`` rows per input row,
    join the member relation ON the slot key (at scale: the member
    table is partitioned by slot → list pruning at the scan, the vx07
    ADC-join shape), then one map-side-combinable min per row id.
    Driver cost is O(sqrt(k)); no k-sized literal ever enters a plan.
    """
    slots = ivf_anchor_slots(k)
    step = slots[1] if len(slots) > 1 else k  # stride between anchors
    nprobe = min(nprobe, len(slots))
    anchors = (cent_df.where(F.col("cluster") % step == 0)
               .select((F.col("cluster") / step).cast("int").alias("slot"),
                       F.col("cvec").alias("avec")))
    # the anchor bank is the bounded side (<= ceil(sqrt(k)) rows):
    # collect it once into a JSON bank literal, exactly as _assign_ivf
    # does — shortest-round-trip reprs keep the doubles bit-identical
    arows = sorted((r["slot"], [float(v) for v in r["avec"]])
                   for r in anchors.collect())
    abank = F.from_json(
        F.lit(json.dumps([v for _, v in arows])), "array<array<double>>")
    # member -> anchor slot, DISTRIBUTED over the centroid relation
    # (replaces the O(k*sqrt(k)) driver loop): same fold, same
    # (d, slot) tie rule
    slot_of = F.array_min(F.transform(
        abank,
        lambda a, i: F.struct(_fold_sq(F.col("cvec"), a).alias("d"),
                              i.alias("i"))))["i"]
    members = cent_df.select(slot_of.alias("slot"), "cluster", "cvec")
    vec = F.col(vec_col)
    probed = F.slice(
        F.array_sort(F.transform(
            abank,
            lambda a, i: F.struct(_fold_sq(vec, a).alias("d"),
                                  i.alias("i")))),
        1, nprobe)
    rows = df.select(
        F.col(id_col), vec,
        F.explode(F.transform(probed, lambda p: p["i"])).alias("slot"))
    cand = rows.join(members, "slot")
    scored = cand.select(
        id_col,
        F.struct(_fold_sq(vec, F.col("cvec")).alias("d"),
                 F.col("cluster").cast("int").alias("j")).alias("s"))
    return (scored.groupBy(id_col)
            .agg(F.min("s").alias("m"))
            .select(F.col(id_col), F.col("m.j").alias("cluster")))


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
           coarse_nprobe: int | None = None,
           ) -> tuple[DataFrame, list[list[float]]]:
    """Full Lloyd loop. Returns (assignments (id, cluster), centroids).

    Stops when the max centroid shift (L2) drops below ``tol`` or
    after ``max_iters``. The returned assignment DataFrame is lazy
    and replans from the base scan with the final centroids.
    ``coarse_nprobe`` runs every assignment pass (loop and final)
    through the two-level IVF-assisted kernel — see assign_centroids.
    """
    vecs = df.select(F.col(id_col),
                     F.col(vec_col).cast("array<double>").alias(vec_col))
    # dim comes from the seed rows — no separate first() job
    cents = _seed_centroids(vecs, k, id_col, vec_col)
    if not cents:
        return assign_centroids(vecs, [[0.0]], id_col, vec_col), []
    dim = len(cents[0])
    for _ in range(max_iters):
        assigned = assign_centroids(vecs, cents, id_col, vec_col, method,
                                    coarse_nprobe=coarse_nprobe)
        nxt = _update_centroids(vecs, assigned, k, dim, cents,
                                id_col, vec_col, round_to=round_to)
        shift = max(
            math.sqrt(sum((a - b) ** 2 for a, b in zip(ca, cb)))
            for ca, cb in zip(cents, nxt)
        )
        cents = nxt
        if shift < tol:
            break
    return assign_centroids(vecs, cents, id_col, vec_col, method,
                            coarse_nprobe=coarse_nprobe), cents


def seed_fingerprint(cents: list[list[float]]) -> str:
    """Stable digest of a centroid set (logging / regression tests)."""
    payload = ";".join(",".join(f"{v:.9f}" for v in c) for c in cents)
    return hashlib.md5(payload.encode()).hexdigest()
