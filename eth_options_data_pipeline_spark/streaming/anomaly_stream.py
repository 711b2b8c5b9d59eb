"""Streaming rolling z-score anomaly detection: the stateful twin of
operators/anomaly.py rolling_zscore, with watermark-final emission.

A trailing-window score needs its key's history in EVENT-TIME order;
a stream arrives in arrival order. The stateful formulation mirrors
streaming/asof_stream.py: rows buffer in per-key state until the
event-time watermark passes them — only then is "no earlier row can
still arrive" guaranteed — and are then scored in (ts, tiebreak)
order against the key's trailing history before being appended to it.

State per key is O(lookback + late-window depth): the finalized
history is capped at ``lookback`` integer cents values, and the
pending buffer holds only rows inside the watermark delay. The state
store shards by the groupBy hash exactly like the batch shuffle.

Pending rows must flush even if their key never receives another
record: each update registers an EVENT-TIME TIMEOUT at the earliest
pending timestamp, so the engine re-invokes the key (including in the
trailing no-data micro-batch) once the watermark passes it — without
this, a key's final rows would buffer forever.

Exactness: history values are integer cents (the batch kernel's
technique), so the trailing sums are exact; the float mean/var/z
expressions replicate the batch kernel's operation order, so a
replayed stream emits bit-identical scores to the batch operator
(pinned in tests/test_streaming_anomaly.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from math import floor, sqrt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
    TimestampType,
)

STATE_SCHEMA = StructType([
    StructField("hist", ArrayType(LongType())),      # trailing cents, event order
    StructField("pts", ArrayType(LongType())),       # pending epoch-ms
    StructField("ptb", ArrayType(LongType())),       # pending tiebreaks
    StructField("pc", ArrayType(LongType())),        # pending cents
])

OUTPUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("z", DoubleType()),                  # null: undefined
])


def streaming_rolling_zscore(events: DataFrame, key: str, ts: str,
                             tiebreak: str, value: str,
                             lookback: int = 20, min_periods: int = 10,
                             watermark: str = "10 minutes") -> DataFrame:
    """Score a STREAMING DataFrame with the trailing z of each row
    against its key's previous ``lookback`` values. Rows emit once the
    watermark passes their event time (append-final); z is null while
    the history is shorter than ``min_periods`` or has zero variance.
    """
    tagged = events.select(
        F.col(key).cast("string").alias("key"), F.col(ts).alias("ts"),
        F.col(tiebreak).cast("long").alias("tb"),
        F.col(value).cast("double").alias("val"),
    ).withWatermark("ts", watermark)

    # nested so cloudpickle ships it by value (workers don't need the
    # package on sys.path)
    def update(k, pdf_iter: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (key_value,) = k
        if state.exists:
            hist, pts_, ptb, pc = (list(x) for x in state.get)
        else:
            hist, pts_, ptb, pc = [], [], [], []

        for pdf in pdf_iter:
            ms = pdf["ts"].astype("datetime64[ms]").astype("int64")
            for t, tb, v in zip(ms, pdf["tb"], pdf["val"]):
                pts_.append(int(t))
                ptb.append(int(tb))
                # HALF_UP (away from zero), matching the batch
                # kernel's F.round exactly — Python's round() is
                # half-EVEN and diverges on exact half-cents like
                # 0.125*100
                cents = float(v) * 100
                pc.append(int(floor(abs(cents) + 0.5))
                          * (1 if cents >= 0 else -1))

        wm = state.getCurrentWatermarkMs()
        out_t, out_tb, out_z, pend = [], [], [], []
        for t, tb, c in sorted(zip(pts_, ptb, pc)):
            if t > wm:
                pend.append((t, tb, c))
                continue
            z = None
            n = len(hist)
            if n >= min_periods:
                s1 = sum(hist)                       # exact int sums
                s2 = sum(x * x for x in hist)
                mean = s1 / n
                var = s2 / n - mean * mean           # batch kernel's op order
                if var > 0:
                    z = (c - mean) / sqrt(var)
            out_t.append(t)
            out_tb.append(tb)
            out_z.append(z)
            hist.append(c)
            if len(hist) > lookback:
                del hist[0]

        state.update((hist, [p[0] for p in pend], [p[1] for p in pend],
                      [p[2] for p in pend]))
        if pend:
            # re-invoke this key once the watermark passes the earliest
            # pending row (must be strictly beyond the current wm)
            state.setTimeoutTimestamp(max(pend[0][0], wm + 1))

        if out_t:
            yield pd.DataFrame({
                "key": key_value,
                "event_id": pd.Series(out_tb, dtype="int64"),
                "ts": pd.to_datetime(pd.Series(out_t), unit="ms"),
                "z": pd.Series(out_z, dtype="float64"),
            })

    return tagged.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
