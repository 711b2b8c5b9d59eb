"""Closed-form per-group ordinary least squares via sufficient
statistics.

The training-pipeline need: fit thousands of tiny trend models (drift
per feature, rate-of-change per entity, calibration slope per source)
over a 100 TB fact table WITHOUT an iterative solver. Simple linear
regression has a closed form in five sums — n, Sx, Sy, Sxy, Sxx — and
every one of them is a plain map-side-combinable aggregate. The whole
fit is therefore ONE pass over the data: partials combine per
partition, the single exchange carries five numbers per group, and the
slope/intercept arithmetic runs on the handful of grouped rows. No
gradient steps, no caching, no driver-side data.

Determinism contract (the oracle-face convention): the inputs are
integer-valued columns (the face scales floats to fixed-point BEFORE
summing), so all five sums are EXACT int64 arithmetic — no float
accumulation order. The closed-form division then runs on exact
scalars with an expression tree mirrored verbatim in the DuckDB
oracle, so both engines produce bit-identical doubles.

Overflow envelope: int64 sums hold while n * max|x*y| < 2^63; the
quadratic cross-terms (n*Sxy, Sy*Sxx, ...) are evaluated in DOUBLE
(cast the first factor) so they never wrap even when the sums are
large. At trillion-row-per-group scale, swap the sums to
decimal(38,0) — same plan shape, Spark sums decimals natively.

No counterpart in the reference (row-oriented options pipeline,
main.py:43-351); standard OLS sufficient-statistics identity.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_ols(df: DataFrame, keys: Sequence[str], x: str,
              y: str) -> DataFrame:
    """Per-group simple linear regression of integer ``y`` on integer
    ``x``.

    Returns one row per group: the five exact sufficient statistics
    (n, sx, sy, sxy, sxx, syy — all int64) plus ``slope``,
    ``intercept`` and ``r2`` computed from them in double arithmetic.
    Callers round/scale the outputs; the statistics columns let a test
    (or an incremental maintainer, operators/incremental_agg.py)
    verify merge(partial(A), partial(B)) == fit(A ∪ B) exactly.
    """
    xc = F.col(x).cast("long")
    yc = F.col(y).cast("long")
    stats = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xc).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum(xc * yc).alias("sxy"),
        F.sum(xc * xc).alias("sxx"),
        F.sum(yc * yc).alias("syy"),
    )
    # quadratic cross-terms in double: cast the FIRST factor only, so
    # the oracle SQL can mirror the tree operation-for-operation
    nd = F.col("n").cast("double")
    slope_num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    denom = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    icpt_num = (F.col("sy").cast("double") * F.col("sxx")
                - F.col("sx").cast("double") * F.col("sxy"))
    denom_y = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    # try_divide: a zero-variance group (all x equal / all y equal)
    # yields NULL, not an ANSI DIVIDE_BY_ZERO failure of the whole job
    return stats.select(
        *keys, "n", "sx", "sy", "sxy", "sxx", "syy",
        F.try_divide(slope_num, denom).alias("slope"),
        F.try_divide(icpt_num, denom).alias("intercept"),
        F.try_divide(slope_num * slope_num, denom * denom_y).alias("r2"),
    )
