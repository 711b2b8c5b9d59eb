"""Custom keyed stateful streaming operator: Open / OI_Change via
per-SYMBOL state (SURVEY §2.10 — the reference's last-300-row read-back
is a bounded keyed state store in disguise).

This is the applyInPandasWithState form: state holds (last_close,
last_oi) per SYMBOL — O(1) per key, no history scan at all. The
foreachBatch form (stream.py) and the batch lag-replay
(operators/snapshot.py) compute the same quantities; tests cross-check
all three.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

STATE_SCHEMA = StructType([
    StructField("last_close", DoubleType()),
    StructField("last_oi", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("SYMBOL", StringType()),
    StructField("Time", TimestampType()),
    StructField("Close", DoubleType()),
    StructField("OI", LongType()),
    StructField("Open", DoubleType()),
    StructField("OI_Change", LongType()),
])


def stateful_open_oi_change(snapshots: DataFrame) -> DataFrame:
    """Streaming DataFrame (SYMBOL, Time, Close, OI) -> per-row
    Open/OI_Change with per-SYMBOL state. State never exceeds the live
    symbol universe; at 1000 executors the state store shards by the
    same hash as the groupBy."""

    # nested so cloudpickle ships it by value — Python workers need not
    # have this package on sys.path
    def update(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        """Per-key update: derive Open/OI_Change for every row of this
        micro-batch (in Time order), then fold the newest row into
        state (reference main.py:290-308: miss -> 0 defaults)."""
        (symbol,) = key
        if state.exists:
            last_close, last_oi = state.get
        else:
            last_close, last_oi = None, None

        for pdf in pdf_iter:
            pdf = pdf.sort_values("Time")
            opens, changes = [], []
            for close, oi in zip(pdf["Close"], pdf["OI"]):
                opens.append(last_close if last_close is not None else 0.0)
                changes.append(int(oi - last_oi) if last_oi is not None else 0)
                last_close, last_oi = float(close), int(oi)
            yield pd.DataFrame({
                "SYMBOL": symbol,
                "Time": pdf["Time"],
                "Close": pdf["Close"],
                "OI": pdf["OI"],
                "Open": pd.Series(opens, dtype="float64", index=pdf.index),
                "OI_Change": pd.Series(changes, dtype="int64", index=pdf.index),
            })

        state.update((last_close, last_oi))

    return (
        snapshots.groupBy("SYMBOL")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
