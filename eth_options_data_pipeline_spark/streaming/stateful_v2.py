"""transformWithStateInPandas variant of the Open/OI_Change operator —
the Spark 4 StatefulProcessor API (typed ValueState, timer support,
RocksDB-backed at scale). Functionally identical to stateful.py's
applyInPandasWithState form; both exist because the newer API is the
forward path while the older one remains the broadly-deployed one.

ENVIRONMENT GATE: the transformWithState protocol requires
``google.protobuf``, which is not installed in this container (no pip
allowed). ``is_available()`` probes for it; the production operator is
stateful.py's applyInPandasWithState form, which has no such
dependency and is fully tested.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor, StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

OUTPUT_SCHEMA = StructType([
    StructField("SYMBOL", StringType()),
    StructField("Time", TimestampType()),
    StructField("Close", DoubleType()),
    StructField("OI", LongType()),
    StructField("Open", DoubleType()),
    StructField("OI_Change", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("last_close", DoubleType()),
    StructField("last_oi", LongType()),
])

# The StatefulProcessor instance is cloudpickled to Python workers that
# may not have this package on sys.path (see verify SKILL gotchas);
# by-value registration makes the pickle self-contained.
try:
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


class OpenOiProcessor(StatefulProcessor):
    """Per-SYMBOL ValueState (last_close, last_oi); reference
    main.py:290-308 semantics (miss -> 0 defaults)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("last", STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        if self._state.exists():
            last_close, last_oi = self._state.get()
        else:
            last_close, last_oi = None, None
        for pdf in rows:
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
        if last_close is not None:
            self._state.update((last_close, last_oi))

    def close(self) -> None:
        pass


def is_available() -> bool:
    """True iff the runtime can execute transformWithStateInPandas."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def stateful_open_oi_change_v2(snapshots: DataFrame) -> DataFrame:
    if not is_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf, which is "
            "not installed here; use stateful.stateful_open_oi_change"
        )
    return (
        snapshots.groupBy("SYMBOL")
        .transformWithStateInPandas(
            OpenOiProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
