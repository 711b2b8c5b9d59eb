"""Rolling z-score anomaly detection over a keyed numeric stream —
the data-quality outlier gate (flag telemetry values that sit far
outside their key's trailing distribution before they poison a
training aggregate).

Exactness technique: the rolling mean/variance come from integer
sums. Values are fixed to cents (``round(value * 100)`` as BIGINT), so
the three frame aggregates — count, sum, sum-of-squares — are exact
integers in ANY accumulation order; the only floats are the final
mean/variance/z expressions, written in the same shape on both
engines and rounded before comparison. This sidesteps the usual
cross-engine ``stddev`` drift (partial-aggregation order) entirely.

Scale shape: one shuffle on the key, one per-key ordered frame (ROWS
BETWEEN k PRECEDING AND 1 PRECEDING — strictly the PAST, so the score
is a true one-sided detector usable in replay and in Structured
Streaming foreachBatch). No global sort, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore(events: DataFrame, key_col: str = "user_id",
                   ts_col: str = "ts", value_col: str = "value",
                   tiebreak_col: str = "event_id",
                   lookback: int = 20, min_periods: int = 10,
                   decimals: int = 6) -> DataFrame:
    """Per-row z-score of ``value`` against the key's trailing
    ``lookback`` observations (excluding the current row). Rows whose
    trailing window holds fewer than ``min_periods`` points, or whose
    trailing variance is zero, get a NULL z (undefined, not zero).
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    frame = (Window.partitionBy(key_col)
             .orderBy(ts_col, tiebreak_col)
             .rowsBetween(-lookback, -1))
    cnt = F.count(F.lit(1)).over(frame)
    s1 = F.sum(cents).over(frame)
    s2 = F.sum(cents * cents).over(frame)
    mean = s1 / cnt
    var = s2 / cnt - mean * mean
    sd = F.when(var > 0, F.sqrt(var))
    z = F.when(cnt >= min_periods, (cents - mean) / sd)
    return events.select(
        tiebreak_col, key_col,
        F.round(z, decimals).alias("z"),
    )


def rolling_anomalies(events: DataFrame, threshold: float = 2.5,
                      **kwargs) -> DataFrame:
    """Rows whose trailing z-score magnitude is >= ``threshold``
    (compared on the rounded z, so the cut is engine-independent)."""
    scored = rolling_zscore(events, **kwargs)
    return scored.where(F.abs(F.col("z")) >= threshold)
