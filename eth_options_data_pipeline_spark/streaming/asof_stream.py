"""Streaming as-of enrichment: pair every probe-stream row with the
most recent build-stream row (build.ts <= probe.ts, same key), under
event-time watermarks.

The batch operator (operators/asof.py) is one union + ordered window.
A stream can't sort globally, so the streaming face is the stateful
formulation: union the two tagged streams, group by key, and keep a
small per-key buffer in the state store —

  * build rows accumulate in a per-key ordered buffer;
  * probe rows wait in the buffer until the event-time watermark
    passes them — only then is "no earlier build row can still
    arrive" guaranteed, so the join result is final;
  * on emission each probe row binary-searches the build buffer for
    the latest entry at-or-before its timestamp (inclusive, matching
    the batch operator's ``b.ts <= a.ts``);
  * the build buffer is pruned to the newest entry at-or-before the
    watermark plus everything after it — exactly the rows a future
    probe can still reference. State per key is O(late-window depth),
    not O(stream length).

Scale shape: the state store shards by the groupBy hash across
executors exactly like the batch shuffle; per-key state is bounded by
the watermark delay x arrival rate. This mirrors how Flink implements
temporal/as-of joins (keyed state + event-time timers) re-expressed on
Spark's applyInPandasWithState.

Emission is watermark-driven: rows inside the final watermark window
stay buffered until a later batch advances the watermark (streams are
unbounded; tests flush with a sentinel batch).
"""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
    TimestampType,
)

STATE_SCHEMA = StructType([
    StructField("bts", ArrayType(LongType())),       # build epoch-ms, sorted
    StructField("bval", ArrayType(DoubleType())),
    StructField("pts", ArrayType(LongType())),       # buffered probe epoch-ms
    StructField("pval", ArrayType(DoubleType())),
])

OUTPUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("ts", TimestampType()),
    StructField("probe_val", DoubleType()),
    StructField("asof_val", DoubleType()),           # null: no build row yet
])


def streaming_asof_enrich(probe: DataFrame, build: DataFrame,
                          key: str, ts: str, probe_val: str, build_val: str,
                          watermark: str = "10 minutes") -> DataFrame:
    """Left as-of join of two STREAMING DataFrames.

    probe rows (key, ts, probe_val) are emitted once the watermark
    passes their event time, carrying ``asof_val`` = the build stream's
    value as of that moment (null if the key has no earlier build row).
    Results are append-mode final: late build rows beyond ``watermark``
    are dropped by the watermark, never retracted against.
    """
    tagged = (
        probe.select(
            F.col(key).alias("key"), F.col(ts).alias("ts"),
            F.col(probe_val).cast("double").alias("pv"),
            F.lit(None).cast("double").alias("bv"),
            F.lit(1).alias("tag"))
        .unionByName(build.select(
            F.col(key).alias("key"), F.col(ts).alias("ts"),
            F.lit(None).cast("double").alias("pv"),
            F.col(build_val).cast("double").alias("bv"),
            F.lit(0).alias("tag")))
        .withWatermark("ts", watermark)
    )

    # nested so cloudpickle ships it by value (workers don't need the
    # package on sys.path)
    def update(k, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (key_value,) = k
        if state.exists:
            bts, bval, pts, pval = (list(x) for x in state.get)
        else:
            bts, bval, pts, pval = [], [], [], []

        for pdf in pdf_iter:
            ms = (pdf["ts"].astype("datetime64[ms]").astype("int64"))
            for t, pv, bv, tag in zip(ms, pdf["pv"], pdf["bv"], pdf["tag"]):
                if tag == 0:
                    bts.append(int(t)); bval.append(float(bv))
                else:
                    pts.append(int(t)); pval.append(float(pv))

        order = sorted(range(len(bts)), key=bts.__getitem__)
        bts = [bts[i] for i in order]
        bval = [bval[i] for i in order]

        wm = state.getCurrentWatermarkMs()
        out_ts, out_pv, out_av, keep_ts, keep_pv = [], [], [], [], []
        for t, pv in sorted(zip(pts, pval)):
            if t <= wm:
                j = bisect_right(bts, t) - 1   # latest build <= t (inclusive)
                out_ts.append(t)
                out_pv.append(pv)
                out_av.append(bval[j] if j >= 0 else None)
            else:
                keep_ts.append(t); keep_pv.append(pv)

        # prune: newest build at-or-before the watermark + all after it
        cut = max(bisect_right(bts, wm) - 1, 0)
        state.update((bts[cut:], bval[cut:], keep_ts, keep_pv))

        if out_ts:
            yield pd.DataFrame({
                "key": key_value,
                "ts": pd.to_datetime(pd.Series(out_ts), unit="ms"),
                "probe_val": pd.Series(out_pv, dtype="float64"),
                "asof_val": pd.Series(out_av, dtype="float64"),
            })

    return tagged.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
